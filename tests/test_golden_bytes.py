"""Byte-for-byte golden tests for the three FLO-2D renders.

Each test emulates the CURRENT reference generator's exact string
assembly (cited per test) in plain Python over fixture data recovered
from the reference's sample outputs (`res/flo2d_150_v2/*.DAT` — the
samples themselves are legacy-format and provably not reproducible by
the reference's own current code: different column widths, trailing
spaces, different K cells), then asserts the engine's plan + ordered
sink produce IDENTICAL bytes. This pins fixed-width rendering, block
order, head/tail splicing, and the no-trailing-newline contract of
``write_to_file`` (``'\\n'.join``).
"""

import os
from datetime import datetime, timedelta

import pytest

REF = "/root/reference"
RES = f"{REF}/res/flo2d_150_v2"
T0 = datetime(2024, 1, 1, 0, 0, 0)


def _h(hours: float) -> datetime:
    return T0 + timedelta(hours=hours)


@pytest.mark.skipif(not os.path.isdir(RES), reason="reference res/ not present")
def test_inflow_bytes_match_reference_writer(spark, tmp_path):
    """input/inflow/gen_150_v2_inflow.py:101-112: three literal header
    lines, then ``'H' + ('%.1f' % hours).rjust(16) + ('%.1f' %
    value).rjust(16)`` from the SECOND sample on, joined with newlines
    (write_to_file:39-41 — no trailing newline)."""
    from curw_flo2d_data_manager_spark.plans.inflow import inflow_lines
    from curw_flo2d_data_manager_spark.sinks.ordered_text import write_ordered_text

    series = []  # (hours, value) recovered from the sample's H rows
    for line in open(f"{RES}/INFLOW.DAT"):
        p = line.split()
        if p and p[0] == "H" and p[1] != "0.0":
            series.append((float(p[1]), float(p[2])))
    assert len(series) == 117

    expected = [
        "0" + "37814".rjust(16),
        "C" + "0".rjust(16) + "37814".rjust(16),
        "H" + "0".rjust(16) + "0".rjust(16),
    ]
    for h, v in series:
        expected.append("H" + ("%.1f" % h).rjust(16) + ("%.1f" % v).rjust(16))
    expected_bytes = "\n".join(expected).encode()

    ts = spark.createDataFrame(
        [(T0, 0.0)] + [(_h(h), v) for h, v in series],
        "time timestamp, value double",
    )
    out = str(tmp_path / "INFLOW.DAT")
    write_ordered_text(
        inflow_lines(ts, "flo2d_150_v2"),
        out,
        sort_cols=["block_rank", "intra_rank"],
        final_newline=False,
    )
    assert open(out, "rb").read() == expected_bytes


@pytest.mark.skipif(not os.path.isdir(RES), reason="reference res/ not present")
def test_outflow_bytes_match_reference_writer(spark, tmp_path):
    """input/outflow/gen_outflow.py:217-260 (prepare_outflow_150_v2):
    four literal K rows, then per boundary node an N row plus
    ``'S' + ('%.3f' % hours).rjust(16) + ('%.3f' % value).rjust(16)``
    rows (:108-112), '\\n'.join'd, then ``'\\n' + tail_150_v2.txt``
    appended verbatim (append_file_to_file:49-52)."""
    from curw_flo2d_data_manager_spark.plans.outflow import outflow_lines
    from curw_flo2d_data_manager_spark.sinks.ordered_text import write_ordered_text

    # recover the four per-node tide series from the sample's S blocks
    n_cells = (330, 462, 546, 1282)
    blocks: list[list[float]] = []
    for line in open(f"{RES}/OUTFLOW.DAT"):
        p = line.split()
        if p and p[0] == "N":
            blocks.append([])
        elif p and p[0] == "S" and blocks:
            blocks[-1].append(float(p[2]))
    assert [len(b) for b in blocks] == [121] * 4

    tail = open(f"{REF}/input/outflow/tail_150_v2.txt").read()
    expected = ["K" + str(c).rjust(16) for c in (268, 391, 464, 1174)]
    for cell, vals in zip(n_cells, blocks):
        expected.append("N" + str(cell).rjust(16) + "1".rjust(16))
        for k, v in enumerate(vals):
            expected.append(
                "S" + ("%.3f" % float(k)).rjust(16) + ("%.3f" % v).rjust(16)
            )
    expected_bytes = ("\n".join(expected) + "\n" + tail).encode()

    rows = [
        (cell, _h(k), v)
        for cell, vals in zip(n_cells, blocks)
        for k, v in enumerate(vals)
    ]
    tide = spark.createDataFrame(rows, "node int, time timestamp, value double")
    out = str(tmp_path / "OUTFLOW.DAT")
    write_ordered_text(
        outflow_lines(tide, "flo2d_150_v2"),
        out,
        sort_cols=["block_rank", "intra_rank"],
        footer_lines=tail.split("\n"),
        final_newline=False,
    )
    assert open(out, "rb").read() == expected_bytes


@pytest.mark.skipif(not os.path.isdir(RES), reason="reference res/ not present")
def test_chan_bytes_match_reference_writer(spark, tmp_path):
    """input/chan/gen_chan.py:131-191: verbatim head asset, then per
    body-template pair ``cell.ljust(6) + default.rjust(6)`` (the
    no-observation branch :163-166), then '\\n' + verbatim tail asset.
    Uses the reference's real 150_v2 head (945 lines), body (19
    pairs), and tail assets."""
    from curw_flo2d_data_manager_spark.plans.chan import chan_lines
    from curw_flo2d_data_manager_spark.sinks.ordered_text import write_ordered_text

    head = open(f"{REF}/input/chan/chan_150_v2_head.dat").read()
    tail = open(f"{REF}/input/chan/chan_150_v2_tail.dat").read()
    body = [
        ln for ln in open(f"{REF}/input/chan/chan_150_v2_body.dat").read().split("\n")
        if ln.strip()
    ]

    processed = []
    for i in range(0, len(body) - 1, 2):
        up, upd = body[i].split()[0], body[i].split()[1]
        dn, dnd = body[i + 1].split()[0], body[i + 1].split()[1]
        processed.append(up.ljust(6) + str(upd).rjust(6))
        processed.append(dn.ljust(6) + str(dnd).rjust(6))
    expected_bytes = (head + "\n" + "\n".join(processed) + "\n" + tail).encode()

    pairs = spark.createDataFrame(
        [
            (i // 2, body[i].split()[0], body[i].split()[1],
             body[i + 1].split()[0], body[i + 1].split()[1])
            for i in range(0, len(body) - 1, 2)
        ],
        "pair_idx long, up_cell string, up_default string, "
        "dwn_cell string, dwn_default string",
    )
    ics = spark.createDataFrame(
        [], "grid_id string, up_obs_id string, dwn_obs_id string"
    )
    obs = spark.createDataFrame([], "id string, time timestamp, value double")
    out = str(tmp_path / "CHAN.DAT")
    write_ordered_text(
        chan_lines(pairs, ics, obs, "flo2d_150_v2", "2024-01-01 00:00:00"),
        out,
        sort_cols=["block_rank", "intra_rank"],
        header_lines=head.split("\n"),
        footer_lines=tail.split("\n"),
        final_newline=False,
    )
    assert open(out, "rb").read() == expected_bytes


def test_rain_bytes_match_reference_writer(spark, tmp_path):
    """input/rain/gen_rain.py:179-191: R rows are
    ``'R              ' + ('%.3f' % hours).ljust(14) + ('%.3f' %
    cumulative_fraction) + ' '`` under the two header lines, joined
    with newlines (no trailing newline)."""
    from curw_flo2d_data_manager_spark.plans.rain import rain_lines
    from curw_flo2d_data_manager_spark.sinks.ordered_text import write_ordered_text

    start, end = "2024-01-01 00:00:00", "2024-01-01 02:00:00"
    # 15-min-grid-aligned positive series: resample is the identity
    vals = [0.0, 1.25, 0.5, 3.75, 0.0, 2.0, 0.125, 1.0, 0.375]
    ts = spark.createDataFrame(
        [(T0 + timedelta(minutes=15 * i), v) for i, v in enumerate(vals)],
        "time timestamp, value double",
    )

    total = sum(vals)
    expected = [" 0             0 ",
                " %.3f         5             0             0 " % total]
    cum = 0.0
    for i, v in enumerate(vals):
        cum += v
        hours = 15 * i / 60.0
        frac = cum / total if total else 0.0
        expected.append(
            "R              " + ("%.3f" % hours).ljust(14) + ("%.3f" % frac) + " "
        )
    expected_bytes = "\n".join(expected).encode()

    out = str(tmp_path / "RAIN.DAT")
    write_ordered_text(
        rain_lines(spark, ts, "flo2d_150_v2", start, end),
        out,
        sort_cols=["block_rank", "intra_rank"],
        final_newline=False,
    )
    assert open(out, "rb").read() == expected_bytes


def test_raincell_bytes_match_reference_writer(spark, tmp_path):
    """input/raincell/gen_raincell.py:126-141: header
    ``'{timestep} {length} {start} {end}\\n'`` then per timestep the
    ``'{cell} {%.3f corrected}'`` rows followed by one blank separator
    element, '\\n'-joined (so the file ends in exactly one newline)."""
    from curw_flo2d_data_manager_spark.plans.models import MODELS
    from curw_flo2d_data_manager_spark.plans.raincell import raincell_lines
    from curw_flo2d_data_manager_spark.sinks.ordered_text import write_ordered_text

    start, end = "2024-01-01 00:00:00", "2024-01-01 01:00:00"
    spec = MODELS["flo2d_150_v2"]
    cells = [11, 12, 13]
    rows = []
    for s_idx in range(4):  # 00:15 .. 01:00
        t = T0 + timedelta(minutes=15 * (s_idx + 1))
        for c in cells:
            rows.append((c, t, 0.25 * s_idx + 0.001 * c))
    rain = spark.createDataFrame(rows, "cell_id int, time timestamp, value double")

    expected = f"{spec.timestep_min} 4 {start} {end}\n"
    blocks = []
    for s_idx in range(4):
        t = T0 + timedelta(minutes=15 * (s_idx + 1))
        for c in cells:
            v = 0.25 * s_idx + 0.001 * c + spec.water_supply
            blocks.append(f"{c} " + "%.3f" % v)
        blocks.append("")
    expected_bytes = (expected + "\n".join(blocks)).encode()

    out = str(tmp_path / "RAINCELL.DAT")
    write_ordered_text(
        raincell_lines(spark, rain, "flo2d_150_v2", start, end),
        out,
        sort_cols=["block_rank", "intra_rank"],
        final_newline=False,
    )
    assert open(out, "rb").read() == expected_bytes

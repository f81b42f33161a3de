"""End-to-end FLO-2D pipeline plan tests (SURVEY §5 plan — golden-style
semantics pinned from the reference generator code)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.plans import (
    chan_lines,
    extract_hychan_forecast,
    inflow_lines,
    outflow_lines,
    rain_lines,
    raincell_lines,
)


def _lines(df):
    return [r.line for r in df.orderBy("block_rank", "intra_rank").collect()]


def _ts(spark, rows, schema="time timestamp, value double"):
    return spark.createDataFrame(
        [(datetime.fromisoformat(t), v) for t, v in rows], schema
    )


# ---------------------------------------------------------------- inflow
def test_inflow_150_v2_header_and_rows(spark):
    ts = _ts(
        spark,
        [
            ("2024-01-01 00:00:00", 5.0),
            ("2024-01-01 01:00:00", 1.593),
            ("2024-01-01 02:00:00", 10.626),
        ],
    )
    lines = _lines(inflow_lines(ts, "flo2d_150_v2"))
    # header constants: gen_150_v2_inflow.py:102-104
    assert lines[0] == "0" + "37814".rjust(16)
    assert lines[1] == "C" + "0".rjust(16) + "37814".rjust(16)
    assert lines[2] == "H" + "0".rjust(16) + "0".rjust(16)
    # first sample is only the elapsed-hours origin (i starts at 1)
    assert lines[3] == "H" + "1.0".rjust(16) + "1.6".rjust(16)
    assert lines[4] == "H" + "2.0".rjust(16) + "10.6".rjust(16)
    assert len(lines) == 5


def test_inflow_250_reservoir_rows_default_wl(spark):
    ts = _ts(spark, [("2024-01-01 00:00:00", 1.0), ("2024-01-01 01:00:00", 2.0)])
    lines = _lines(inflow_lines(ts, "flo2d_250"))
    assert lines[0] == "0" + "0".rjust(16)
    assert lines[1] == "C" + "0".rjust(16) + "8655".rjust(16)
    # default obs water level 0.5 (gen_250_inflow.py:113-114), str() render
    assert lines[-2] == "R" + "2265".rjust(16) + "0.5".rjust(16)
    assert lines[-1] == "R" + "3559".rjust(16) + "6.6".rjust(16)


def test_inflow_250_explicit_wl(spark):
    ts = _ts(spark, [("2024-01-01 00:00:00", 1.0), ("2024-01-01 01:00:00", 2.0)])
    lines = _lines(inflow_lines(ts, "flo2d_250", obs_wl=1.25))
    assert lines[-2] == "R" + "2265".rjust(16) + "1.25".rjust(16)


# ------------------------------------------------------------------ rain
def test_rain_lines_15min_resample_and_fraction(spark):
    # 5-min samples over 30 min; 15-min right-closed buckets:
    # (00:00) -> 00:00 bucket; (00:05,00:10,00:15) -> 00:15; (00:20,00:25,00:30) -> 00:30
    rows = [
        ("2024-01-01 00:00:00", 1.0),
        ("2024-01-01 00:05:00", 1.0),
        ("2024-01-01 00:10:00", 2.0),
        ("2024-01-01 00:15:00", 3.0),
        ("2024-01-01 00:20:00", 1.0),
        ("2024-01-01 00:25:00", 1.0),
        ("2024-01-01 00:30:00", 2.0),
    ]
    ts = _ts(spark, rows)
    lines = _lines(
        rain_lines(spark, ts, "flo2d_150", "2024-01-01 00:00:00", "2024-01-01 00:30:00")
    )
    assert lines[0] == " 0             0 "
    # total = 11.0
    assert lines[1] == " 11.000         5             0             0 "
    # buckets: 00:00 -> 1 (frac 1/11), 00:15 -> 6 (7/11), 00:30 -> 4 (11/11)
    assert lines[2] == "R              " + "0.000".ljust(14) + "0.091 "
    assert lines[3] == "R              " + "0.250".ljust(14) + "0.636 "
    assert lines[4] == "R              " + "0.500".ljust(14) + "1.000 "


def test_rain_lines_zero_total_guard(spark):
    ts = _ts(spark, [("2024-01-01 00:05:00", -1.0)])
    lines = _lines(
        rain_lines(spark, ts, "flo2d_250", "2024-01-01 00:00:00", "2024-01-01 00:10:00")
    )
    # negative -> NULL after (no-op) resample; total 0 -> fraction 0.000
    assert lines[1].startswith(" 0.000")
    assert lines[2] == "R              " + "0.083".ljust(14) + "0.000 "


def test_rain_lines_flo2d_10_no_resample(spark):
    """flo2d_10 models take the timestep-5 branch — 5-min samples pass
    through unresampled (reference: gen_rain.py:155-163)."""
    rows = [
        ("2024-01-01 00:00:00", 1.0),
        ("2024-01-01 00:05:00", 1.0),
        ("2024-01-01 00:10:00", 2.0),
    ]
    ts = _ts(spark, rows)
    lines = _lines(
        rain_lines(spark, ts, "flo2d_10_Blomandl", "2024-01-01 00:00:00",
                   "2024-01-01 00:10:00")
    )
    assert lines[1] == " 4.000         5             0             0 "
    # three R rows, one per 5-min sample — no 15-min collapse
    assert lines[2] == "R              " + "0.000".ljust(14) + "0.250 "
    assert lines[3] == "R              " + "0.083".ljust(14) + "0.500 "
    assert lines[4] == "R              " + "0.167".ljust(14) + "1.000 "


def test_get_model_spec_flo2d_10_family():
    from curw_flo2d_data_manager_spark.plans.models import get_model_spec

    spec = get_model_spec("flo2d_10_GrgDSlva_MW")
    assert spec.timestep_min == 5
    assert spec.rain_resample_min is None
    assert get_model_spec("flo2d_150").rain_resample_min == 15
    import pytest

    with pytest.raises(KeyError):
        get_model_spec("flo2d_11_nope")


def test_read_grid_csv_flo2d_10_format(spark, tmp_path):
    """flo2d_10 grid CSVs carry a different header spelling
    (``Grid Id,X coordinates,Y coordnates`` — res/grids/flo2d_10/
    *.csv) and projected-meter coordinates; the explicit schema reads
    them positionally, header row skipped."""
    from curw_flo2d_data_manager_spark.plans.init_dims import read_grid_csv

    p = tmp_path / "flo2d_10_Blomandl.csv"
    p.write_text(
        "Grid Id,X coordinates,Y coordnates\n"
        "1,399500,493733\n"
        "2,399500.5,493743.25\n"
    )
    got = read_grid_csv(spark, str(p)).orderBy("Grid_ID").collect()
    assert [(r.Grid_ID, r.X, r.Y) for r in got] == [
        (1, 399500.0, 493733.0),
        (2, 399500.5, 493743.25),
    ]


# -------------------------------------------------------------- raincell
def test_raincell_blocks_and_water_supply(spark):
    rows = []
    for minute, cells in ((5, (1, 2)), (10, (1, 2))):
        for c in cells:
            rows.append((datetime(2024, 1, 1, 0, minute), c, float(c)))
    rain = spark.createDataFrame(rows, "time timestamp, cell_id int, value double")
    lines = _lines(
        raincell_lines(
            spark, rain, "flo2d_250", "2024-01-01 00:00:00", "2024-01-01 00:10:00"
        )
    )
    assert lines[0] == "5 2 2024-01-01 00:00:00 2024-01-01 00:10:00"
    ws = 1.0 / 288
    assert lines[1] == f"1 {1 + ws:.3f}"
    assert lines[2] == f"2 {2 + ws:.3f}"
    assert lines[3] == ""  # block separator
    assert lines[4] == f"1 {1 + ws:.3f}"
    assert lines[6] == ""
    assert len(lines) == 7


def test_raincell_window_is_left_open(spark):
    # the reference loop starts at start+step: a row AT start is excluded
    rain = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0), 1, 9.0), (datetime(2024, 1, 1, 0, 5), 1, 1.0)],
        "time timestamp, cell_id int, value double",
    )
    lines = _lines(
        raincell_lines(
            spark, rain, "flo2d_250", "2024-01-01 00:00:00", "2024-01-01 00:05:00"
        )
    )
    assert len(lines) == 3  # header + one cell row + separator
    assert lines[1].startswith("1 1.")


# --------------------------------------------------------------- outflow
def test_outflow_order_sentinel_and_origin(spark):
    rows = [
        # node 330: sentinel first row still seeds the elapsed origin
        (330, datetime(2024, 1, 1, 0, 0), -99999.0),
        (330, datetime(2024, 1, 1, 1, 0), 0.5),
        (462, datetime(2024, 1, 1, 0, 0), 1.25),
    ]
    tide = spark.createDataFrame(rows, "node int, time timestamp, value double")
    lines = _lines(outflow_lines(tide, "flo2d_150_v2"))
    assert lines[0] == "K" + "268".rjust(16)
    assert lines[3] == "K" + "1174".rjust(16)
    assert lines[4] == "N" + "330".rjust(16) + "1".rjust(16)
    # sentinel row dropped, but hours measured from its (earlier) time
    assert lines[5] == "S" + "1.000".rjust(16) + "0.500".rjust(16)
    assert lines[6] == "N" + "462".rjust(16) + "1".rjust(16)
    assert lines[7] == "S" + "0.000".rjust(16) + "1.250".rjust(16)
    # nodes without data still emit their N row
    assert lines[8] == "N" + "546".rjust(16) + "1".rjust(16)
    assert lines[9] == "N" + "1282".rjust(16) + "1".rjust(16)


# ------------------------------------------------------------------ chan
def test_chan_four_branches(spark):
    pairs = spark.createDataFrame(
        [
            (0, "10", "1.1", "11", "1.2"),  # both ids present, both obs
            (1, "20", "2.1", "21", "2.2"),  # dwn id missing, up obs -> both up_wl
            (2, "30", "3.1", "31", "3.2"),  # dwn id missing, no obs -> defaults
            (3, "40", "4.1", "41", "4.2"),  # both ids, no obs -> own defaults
        ],
        "pair_idx long, up_cell string, up_default string, dwn_cell string, dwn_default string",
    )
    ics = spark.createDataFrame(
        [
            ("m_10_11", "a", "b"),
            ("m_20_21", "c", None),
            ("m_30_31", "d", None),
            ("m_40_41", "e", "f"),
        ],
        "grid_id string, up_obs_id string, dwn_obs_id string",
    )
    obs = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 0, 30), 7.5),
            ("b", datetime(2024, 1, 1, 1, 0), 8.5),
            ("c", datetime(2024, 1, 1, 0, 15), 9.5),
            # d: no rows in window; e/f: outside the 2h window
            ("e", datetime(2024, 1, 1, 5, 0), 1.0),
        ],
        "id string, time timestamp, value double",
    )
    lines = _lines(chan_lines(pairs, ics, obs, "m", "2024-01-01 00:00:00"))
    assert lines[0] == "10".ljust(6) + "7.5".rjust(6)
    assert lines[1] == "11".ljust(6) + "8.5".rjust(6)
    assert lines[2] == "20".ljust(6) + "9.5".rjust(6)
    assert lines[3] == "21".ljust(6) + "9.5".rjust(6)  # up WL propagates down
    assert lines[4] == "30".ljust(6) + "3.1".rjust(6)
    assert lines[5] == "31".ljust(6) + "3.2".rjust(6)
    assert lines[6] == "40".ljust(6) + "4.1".rjust(6)
    assert lines[7] == "41".ljust(6) + "4.2".rjust(6)


# --------------------------------------------------------------- extract
def test_extract_forecast_payload(spark):
    parsed = spark.createDataFrame(
        [
            ("330", datetime(2024, 1, 1, 0, 0), 12.5),
            ("330", datetime(2024, 1, 1, 0, 15), 12.6),
            ("999", datetime(2024, 1, 1, 0, 15), 1.0),  # unmapped element
        ],
        "element_no string, time timestamp, value double",
    )
    stations = spark.createDataFrame(
        [("330", 7, 6.9, 79.8)],
        "element_no string, station_id long, latitude double, longitude double",
    )
    out = extract_hychan_forecast(
        parsed,
        stations,
        sim_tag="daily_run",
        source_model="flo2d_150_v2",
        variable="WaterLevel",
        unit="m",
        fgt="2024-01-01 06:00:00",
        extract_cut="2024-01-01 00:15:00",
    ).collect()
    assert len(out) == 1  # horizon filter + unmapped element dropped
    row = out[0]
    assert row.station_id == 7 and row.value == 12.6
    assert len(row.tms_id) == 64  # sha2-256 hex
    # determinism: same metadata -> same id
    out2 = extract_hychan_forecast(
        parsed, stations, "daily_run", "flo2d_150_v2", "WaterLevel", "m",
        "2024-01-01 06:00:00", extract_cut="2024-01-01 00:15:00",
    ).collect()
    assert out2[0].tms_id == row.tms_id


# ------------------------------------------------------------- init dims
def test_init_dims_stations_and_idempotence(spark, tmp_path):
    from curw_flo2d_data_manager_spark.plans.init_dims import (
        read_grid_csv,
        register_dims,
        stations_from_cell_maps,
    )

    grid_csv = tmp_path / "grid.csv"
    grid_csv.write_text(
        "Grid_ID,X,Y\n1,79.847581,6.909617\n2,79.850000,6.910000\n3,79.852500,6.912345\n"
    )
    grid = read_grid_csv(spark, str(grid_csv))
    stations = stations_from_cell_maps(
        spark, grid,
        channel_map={"1": "N'Street River", "3": "Wellawatta"},
        flood_map={"2": "Plain"},
        model_tag="flo2d_150_v2",
    )
    rows = {r.name: r for r in stations.collect()}
    assert rows["1_N'Street River"].latitude == "6.909617"
    assert rows["1_N'Street River"].longitude == "79.847581"
    assert rows["2_Plain"].description == "flo2d_150_v2_flood_plain_cell_map_element"
    assert len(rows) == 3

    src = spark.createDataFrame(
        [("FLO2D", "150_v2", '{"CHANNEL_CELL_MAP": {}}')],
        "model string, version string, parameters string",
    )
    empty_src = src.limit(0)
    empty_sta = stations.limit(0)
    merged_src, merged_sta = register_dims(empty_src, empty_sta, src, stations)
    assert merged_src.count() == 1 and merged_sta.count() == 3
    # idempotence: re-register on top of the merged state
    again_src, again_sta = register_dims(merged_src, merged_sta, src, stations)
    assert again_src.count() == 1 and again_sta.count() == 3


def test_update_run_dates_create_then_extend(spark):
    """Reference update_start_date parity (extract_water_level.py:
    213-214): start_date is pinned at series CREATION and never moves;
    fgt advances to the max seen, even across out-of-order backfills
    (round-5 verdict item 3)."""
    from curw_flo2d_data_manager_spark.plans.extract import update_run_dates

    def payload(rows):
        return spark.createDataFrame(rows, "tms_id string, fgt string").withColumn(
            "fgt", F.col("fgt").cast("timestamp")
        )

    t0, t1, t2 = "2024-01-01 00:00:00", "2024-01-05 00:00:00", "2024-01-03 00:00:00"
    dim = update_run_dates(None, payload([("a", t0), ("b", t0)]))
    got = {r["tms_id"]: r for r in dim.collect()}
    assert str(got["a"]["start_date"]) == t0 and str(got["a"]["fgt"]) == t0

    # run 2 extends b, creates c; a untouched but must survive
    dim = update_run_dates(dim, payload([("b", t1), ("c", t1)]))
    got = {r["tms_id"]: r for r in dim.collect()}
    assert set(got) == {"a", "b", "c"}
    assert str(got["a"]["start_date"]) == t0 and str(got["a"]["fgt"]) == t0
    assert str(got["b"]["start_date"]) == t0 and str(got["b"]["fgt"]) == t1
    assert str(got["c"]["start_date"]) == t1 and str(got["c"]["fgt"]) == t1

    # out-of-order backfill (older fgt) advances NOTHING
    dim = update_run_dates(dim, payload([("b", t2), ("c", t2)]))
    got = {r["tms_id"]: r for r in dim.collect()}
    assert str(got["b"]["start_date"]) == t0 and str(got["b"]["fgt"]) == t1
    assert str(got["c"]["start_date"]) == t1 and str(got["c"]["fgt"]) == t1


def test_update_run_dates_last_write_matches_reference(spark):
    """fgt_mode='last_write' reproduces the reference's plain UPDATE
    (extract_water_level.py:216-217): an out-of-order backfill
    REGRESSES fgt for the series it touches, start_date still pinned;
    series absent from the run keep their stored fgt."""
    from curw_flo2d_data_manager_spark.plans.extract import update_run_dates

    def payload(rows):
        return spark.createDataFrame(rows, "tms_id string, fgt string").withColumn(
            "fgt", F.col("fgt").cast("timestamp")
        )

    t0, t1, t2 = "2024-01-01 00:00:00", "2024-01-05 00:00:00", "2024-01-03 00:00:00"
    dim = update_run_dates(None, payload([("a", t1), ("b", t1)]))
    dim = update_run_dates(dim, payload([("b", t2)]), fgt_mode="last_write")
    got = {r["tms_id"]: r for r in dim.collect()}
    assert str(got["b"]["fgt"]) == t2  # regressed, as the reference would
    assert str(got["b"]["start_date"]) == t1  # creation stamp untouched
    assert str(got["a"]["fgt"]) == t1  # untouched series keeps stored fgt

    import pytest as _pytest

    with _pytest.raises(ValueError):
        update_run_dates(dim, payload([("a", t0)]), fgt_mode="nonsense")


def test_update_run_dates_upgrades_legacy_fgt_only_dim(spark):
    """A pre-start-date dim (tms_id, fgt) adopts its stored fgt as the
    creation stamp instead of failing or nulling out."""
    from curw_flo2d_data_manager_spark.plans.extract import update_run_dates

    legacy = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00")], "tms_id string, fgt string"
    ).withColumn("fgt", F.col("fgt").cast("timestamp"))
    new = spark.createDataFrame(
        [("a", "2024-01-02 00:00:00")], "tms_id string, fgt string"
    ).withColumn("fgt", F.col("fgt").cast("timestamp"))
    got = {r["tms_id"]: r for r in update_run_dates(legacy, new).collect()}
    assert str(got["a"]["start_date"]) == "2024-01-01 00:00:00"
    assert str(got["a"]["fgt"]) == "2024-01-02 00:00:00"

"""Exponentially weighted moving average (EWMA) per series.

EWMA is the one classic timeseries smoother this engine cannot express
as a native window/aggregate: the recurrence

    e_0 = x_0;    e_t = alpha * x_t + (1 - alpha) * e_{t-1}

carries unbounded multiplicative state, and the closed-form rewrite
(two cumulative sums of ``x_t * (1-alpha)**-t``) overflows doubles
after ~700 steps at alpha=0.3 — so this is a deliberate use of the
SURVEY §2.12 carve-out: an Arrow-batched ``applyInPandas`` whose
parallel unit is the series key. Each group is sorted and folded
sequentially (the recurrence is inherently serial PER SERIES; series
are independent, so the 100-TB shape is one shuffle on the key and
perfect across-series parallelism — identical to despike/interpolate).

Determinism contract (mirrors the DuckDB recursive-CTE oracle in
``queries.w_ewma``): rows order by (``order_cols``); NULL values do
not enter the recursion — the previous smoothed value carries over
the gap and the NULL row reports a NULL EWMA; the fold computes
literally ``alpha * x + (1.0 - alpha) * e`` in IEEE doubles, so the
value stream is bit-identical to any engine evaluating the same
expression.

MEMORY LIMIT (single-series length): ``applyInPandas`` materializes
one whole group per Arrow batch, so a SINGLE series must fit in one
executor's memory — roughly 10⁸ rows (a few GB as float64 plus the
pass-through columns). Corpus size is unbounded (series stream
through independently); only per-key length is capped. For series
past that, split the fold into bounded segments: within a segment
the EWMA is an affine function of the carry-in
(``e_out = (1-a)^n · e_in + B`` with ``B`` a local fold), so segment
summaries compose left-to-right in a tiny per-key scan and each
segment re-folds with its known carry-in — two bounded passes.
That path is deliberately NOT the default because the regrouped
arithmetic is no longer bit-identical to the sequential fold, which
would break the cross-engine determinism contract above. See
SCALING.md §EWMA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str = "value",
    alpha: float = 0.3,
    out_col: str = "value_ewma",
    segment_rows: int | None = None,
) -> DataFrame:
    """Append ``out_col``: the per-key EWMA of ``value_col`` along
    ``order_cols``. Input columns pass through unchanged.

    ``segment_rows`` (opt-in, SCALING.md §EWMA) switches to the
    segmented fold for series longer than one executor's memory:
    per-key rows split into bounded segments, each segment summarized
    as the affine map ``e_out = (1-a)^m · e_in + B``, summaries
    composed left-to-right in a tiny per-key scan, then each segment
    re-folds with its known carry-in — two bounded Arrow passes, no
    whole-series materialization. The regrouped arithmetic is no
    longer bit-identical to the sequential fold (last-ulp drift), so
    it is NOT the default; the determinism contract above holds only
    for ``segment_rows=None``.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"need 0 < alpha <= 1, got {alpha}")
    if not key_cols or not order_cols:
        raise ValueError("key_cols and order_cols must be non-empty")
    if segment_rows is not None:
        if segment_rows < 2:
            raise ValueError(f"need segment_rows >= 2, got {segment_rows}")
        return _ewma_segmented(
            df, key_cols, order_cols, value_col, float(alpha), out_col,
            int(segment_rows),
        )
    import pandas as pd  # noqa: F401  (applyInPandas contract)

    from pyspark.sql.types import DoubleType, StructField, StructType

    # copy: StructType.add mutates in place, corrupting df's cached schema
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    a = float(alpha)

    def _smooth(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype="float64", na_value=float("nan"))
        out = [None] * len(vals)
        e = None
        for i, x in enumerate(vals):
            if x != x:  # NaN (source NULL): carry state, emit NULL
                continue
            x = float(x)
            e = x if e is None else a * x + (1.0 - a) * e
            out[i] = e
        pdf[out_col] = pd.Series(out, index=pdf.index, dtype="object").astype(
            "float64"
        )
        return pdf

    return df.groupBy(*[F.col(k) for k in key_cols]).applyInPandas(
        _smooth, schema=schema
    )


def _ewma_segmented(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    a: float,
    out_col: str,
    segment_rows: int,
) -> DataFrame:
    """Segmented EWMA (the SCALING.md §EWMA two-pass rewrite).

    Within a segment holding non-null values x_1..x_m, the recurrence
    e ← a·x + (1−a)·e is the affine map e_out = (1−a)^m · e_in + B
    with B the same fold started from 0 — positive, DECAYING powers
    only (the global closed form needs (1−a)^(−t), which overflows
    doubles after ~700 steps; bounding the exponent to the segment
    and keeping it positive underflows harmlessly instead). A segment
    that contains the series' FIRST non-null uses the e_0 = x_0
    initialization, captured as a second fold B_first.

    Shape: one per-key sort (row_number, running frame — spillable,
    streaming) → per-(key, segment) summary groups (bounded by
    ``segment_rows``) → per-key compose over the tiny summary relation
    (n_segments rows/key) → carry-in joined back → per-segment
    re-fold. Every Arrow group is ≤ segment_rows; series length is
    unbounded.
    """
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    # key fields in KEY_COLS order — _summarize fills values from the
    # groupBy key tuple, which is in key_cols order; deriving kf from
    # schema order silently swapped key columns whenever the caller's
    # key_cols order differed from the schema (round-9 review finding:
    # reversed keys returned zero rows through the carry join)
    kf = [df.schema[k] for k in key_cols]
    rn = F.row_number().over(
        Window.partitionBy(*key_cols).orderBy(*order_cols)
    )
    seg_df = df.withColumn(
        "_seg", ((rn - F.lit(1)) / F.lit(segment_rows)).cast("long")
    )

    sum_schema = StructType(
        kf
        + [
            StructField("_seg", LongType()),
            StructField("_m", LongType()),
            StructField("_b", DoubleType()),
            StructField("_bf", DoubleType()),
        ]
    )

    def _fold(vals, e):
        for x in vals:
            if x != x:  # NaN (source NULL): state carries over
                continue
            x = float(x)
            e = x if e is None else a * x + (1.0 - a) * e
        return e

    def _summarize(keys, pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype="float64", na_value=float("nan"))
        m = int((vals == vals).sum())
        b = _fold(vals, 0.0) if m else 0.0
        bf = _fold(vals, None)  # None if m == 0
        return pd.DataFrame(
            [list(keys[:-1]) + [keys[-1], m, b, bf]],
            columns=[f.name for f in kf] + ["_seg", "_m", "_b", "_bf"],
        )

    summaries = seg_df.groupBy(*key_cols, "_seg").applyInPandas(
        _summarize, schema=sum_schema
    )

    carry_schema = StructType(
        kf
        + [
            StructField("_seg", LongType()),
            StructField("_ein", DoubleType()),
            StructField("_started", BooleanType()),
        ]
    )

    def _compose(pdf):
        # one group per series key: key columns are constant here
        pdf = pdf.sort_values("_seg", kind="mergesort")
        keyvals = [pdf[f.name].iloc[0] for f in kf]
        segs = pdf["_seg"].to_numpy()
        ms = pdf["_m"].to_numpy()
        bs = pdf["_b"].to_numpy(dtype="float64")
        bfs = pdf["_bf"].to_numpy(dtype="float64", na_value=float("nan"))
        carry = None
        rows = []
        for i in range(len(segs)):
            rows.append(
                keyvals + [int(segs[i]), carry, carry is not None]
            )
            if carry is None:
                carry = float(bfs[i]) if ms[i] else None
            elif ms[i]:
                carry = (1.0 - a) ** int(ms[i]) * carry + float(bs[i])
        return pd.DataFrame(
            rows, columns=[f.name for f in kf] + ["_seg", "_ein", "_started"]
        )

    carries = summaries.groupBy(*key_cols).applyInPandas(
        _compose, schema=carry_schema
    )

    # NULL-SAFE key equality: the plain equi-join dropped every row
    # whose key contains NULL (the default whole-series path keeps
    # them — groupBy treats NULL as a group)
    sd = seg_df.alias("s")
    cr = carries.alias("c")
    cond = sd["_seg"] == cr["_seg"]
    for kcol in key_cols:
        cond = cond & sd[kcol].eqNullSafe(cr[kcol])
    joined = sd.join(cr, cond).select(
        *[sd[c] for c in seg_df.columns], cr["_ein"], cr["_started"]
    )
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def _refold(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        e = float(pdf["_ein"].iloc[0]) if bool(pdf["_started"].iloc[0]) else None
        vals = pdf[value_col].to_numpy(dtype="float64", na_value=float("nan"))
        out = [None] * len(vals)
        for i, x in enumerate(vals):
            if x != x:
                continue
            x = float(x)
            e = x if e is None else a * x + (1.0 - a) * e
            out[i] = e
        pdf = pdf.drop(columns=["_seg", "_ein", "_started"])
        pdf[out_col] = pd.Series(out, index=pdf.index, dtype="object").astype(
            "float64"
        )
        return pdf

    return joined.groupBy(*key_cols, "_seg").applyInPandas(
        _refold, schema=out_schema
    )


def moving_median(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window: int = 5,
) -> Column | DataFrame:
    """Exact trailing moving median over the last ``window`` rows per
    key — the robust smoother next to :func:`ewma` (outliers shift a
    mean; a median ignores them until they are the majority).

    Spark has no framed ``median`` window function (analysis error),
    so the frame is materialized with ``collect_list`` over a BOUNDED
    trailing row frame — at most ``window`` elements per row, sorted
    with ``array_sort`` and picked positionally. The middle pick rule
    is spelled with basic ops only ((lo + hi) / 2.0 for even counts —
    NOT percentile-style ``lo + (hi-lo)·f``, whose last ulp differs),
    so a SQL oracle using the same list-window construction is
    bit-identical.

    Scale: one key-partitioned sort window with an O(window) frame per
    row; no global sort, no unbounded frame (the round-8 quadratic
    rowsBetween trap does not apply to bounded trailing frames).

    NULL handling caveat: Spark's collect_list SKIPS NULLs while
    DuckDB's list() KEEPS them — filter NULL values out upstream
    before any cross-engine comparison (the gating query does).

    Returns the input plus ``moving_median``.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.array_sort(F.collect_list(F.col(value_col)).over(w))
    n = F.size(arr)
    # 1-based picks: odd n → lo == hi == the middle ((m+m)/2.0 == m
    # exactly in IEEE); even n → the two central elements averaged.
    lo = F.element_at(arr, F.floor((n + F.lit(1)) / F.lit(2)).cast("int"))
    hi = F.element_at(arr, F.floor(n / F.lit(2)).cast("int") + F.lit(1))
    med = (lo + hi) / F.lit(2.0)
    return df.withColumn("moving_median", med)

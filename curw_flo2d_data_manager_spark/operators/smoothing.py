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


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str = "value",
    alpha: float = 0.3,
    out_col: str = "value_ewma",
) -> DataFrame:
    """Append ``out_col``: the per-key EWMA of ``value_col`` along
    ``order_cols``. Input columns pass through unchanged."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"need 0 < alpha <= 1, got {alpha}")
    if not key_cols or not order_cols:
        raise ValueError("key_cols and order_cols must be non-empty")
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

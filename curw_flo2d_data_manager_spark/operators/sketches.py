"""Count-Min sketch over a distributed token stream.

The sketch-family sibling of the HLL distinct counts, Misra-Gries heavy
hitters, and Bloom blocklist already in the engine (reference parity
n/a — the LLM-pipeline extension family): a fixed d×w counter matrix
whose per-cell sums are partial-aggregable, so the WHOLE sketch build is
one map-side-combined aggregation producing d·w rows no matter how many
tokens (10¹¹-token corpora reduce to the same few-KB state — the point
of a sketch). Estimates are read back with the standard min-over-rows
rule and carry the one-sided guarantee est ≥ exact (Cormode &
Muthukrishnan, 2005).

Hashes are md5-prefix based (deterministic, engine-portable — the same
construction the sampling/bucketing family uses) so a SQL oracle can
rebuild the identical sketch; counters are integers, so cross-engine
agreement is exact, not float-rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cm_bucket(term, row: int, width: int):
    """Row-``row`` bucket for a term: md5 prefix of ``term|row`` mod
    width. Independent-enough rows come from salting the digest input
    with the row index."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(term, F.lit(f"|{row}"))), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        % width
    )


def countmin_build(
    tokens: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the d×w sketch from a token stream (one row per token
    occurrence), or — with ``weight_col`` — from a pre-aggregated
    (term, count) relation, which yields the IDENTICAL sketch (cell
    counts are sums over tokens, and summing per-term first commutes)
    while hashing each DISTINCT term once instead of once per
    occurrence. Returns (row, bucket, cnt) — at most depth·width rows.

    The stack of per-row bucket columns rides ONE explode (d rows per
    input row) into ONE hash aggregation; Catalyst's partial
    aggregation keeps the shuffle at d·w rows per map partition."""
    term = F.col(term_col)
    pairs = tokens.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _cm_bucket(term, r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("rb"),
        *([F.col(weight_col).alias("_w")] if weight_col else []),
    )
    agg = (
        F.sum("_w").cast("long") if weight_col else F.count(F.lit(1))
    ).alias("cnt")
    return pairs.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(agg)


def countmin_estimate(
    terms: DataFrame,
    sketch: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each term in ``terms``: min over the
    d row counters. The sketch is d·w rows — broadcast by size — so the
    probe is a broadcast equi-join per row, never a shuffle of the
    probed relation.

    Cells the build never touched are ABSENT from the sketch relation
    (they hold an implicit 0), so the probe joins LEFT and coalesces —
    a never-seen term estimates 0 (the correct CM answer) instead of
    silently vanishing from the output, and a term whose cells are
    only partially present takes the true min including the zeros."""
    term = F.col(term_col)
    probes = terms.select(
        term_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _cm_bucket(term, r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("rb"),
    ).select(term_col, F.col("rb.row").alias("row"),
             F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(term_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
            .alias("cm_estimate")
        )
    )

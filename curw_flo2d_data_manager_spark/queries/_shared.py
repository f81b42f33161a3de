"""Query registry: every implemented operator as a (Spark query,
DuckDB oracle SQL) pair over the driver's synthetic tables.

This is the engine's correctness surface (driver contract in
``__spark_entry__.py``): each entry exercises one operator family from
SURVEY §2 (or a beyond-parity training-data operator) against the
TPC-H-ish tables at an arbitrary scale factor. Column names are
aliased identically on both sides; floating aggregates are rounded on
both sides so value-hash comparison is robust to summation order.

Registry shape: ``name -> (spark_fn, oracle_sql | None)``; oracle None
means the operator is not SQL-expressible (hash-seeded LSH and the
like) and gets the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.exactmath import (
    ln_ratio_det_sql as _ln_ratio_det_sql,
)
from curw_flo2d_data_manager_spark.operators.cumulative import cumulative_fraction
from curw_flo2d_data_manager_spark.operators.components import (
    cluster_assign,
    connected_components,
)
from curw_flo2d_data_manager_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    passage_dedup,
    simhash_near_pairs,
)
from curw_flo2d_data_manager_spark.operators.gapfill import gap_fill_cross
from curw_flo2d_data_manager_spark.operators.parallelism import ensure_min_partitions
from curw_flo2d_data_manager_spark.operators.nearest import nearest_neighbor_join
from curw_flo2d_data_manager_spark.operators.resample import resample_sum
from curw_flo2d_data_manager_spark.operators.similarity import (
    cosine_dedup_pairs,
    cosine_topk,
    cross_corpus_decontam_pairs,
)
from curw_flo2d_data_manager_spark.operators.spine import spine_align
from curw_flo2d_data_manager_spark.operators.textstats import (
    LANG_MARKERS,
    domain_mixture,
    fingerprint,
    lang_id,
    normalize_text,
    punctuation_ratio,
    quality_score,
    regex_token_count,
    stopword_ratio,
    tfidf_top_terms,
    unigram_logprob,
    whitespace_token_count,
    words,
)
from curw_flo2d_data_manager_spark.functions.ids import series_hash_id
from curw_flo2d_data_manager_spark.functions.timeutil import right_closed_bucket
from curw_flo2d_data_manager_spark.operators.multimodal import decode_image_meta
from curw_flo2d_data_manager_spark.operators.similarity import ivf_topk
from curw_flo2d_data_manager_spark.plans.outflow import outflow_lines
from curw_flo2d_data_manager_spark.plans.rain import nearest_gauge_grid_ids, rain_lines
from curw_flo2d_data_manager_spark.plans.raincell import raincell_lines


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in ("documents", "embeddings"):
        # Small single-file inputs otherwise scan on one core; the
        # guard is a no-op on properly-split big inputs.
        df = ensure_min_partitions(df)
    return df


def _events(
    spark: SparkSession, sf_dir: str, start: str | None = None, end: str | None = None
) -> DataFrame:
    """events scan, adaptive to the two physical ``ts`` layouts the
    driver has shipped:

    * INT64 TIMESTAMP(NANOS) — rejected by the vectorized parquet
      reader; read nanos as long, filter on the raw long (those
      predicates push down to row-group min/max pruning — the
      difference between scanning a day and scanning 100 TB), then
      convert to a microsecond timestamp (truncation matches DuckDB's
      ns→us cast).
    * native TIMESTAMP/TIMESTAMP_NTZ (current testdata) — filter with
      literals cast to the column's own type (pushes down directly),
      then normalize NTZ → session-TZ timestamp; the session TZ is
      pinned UTC (session.py), so wall-clock values are identical to
      the nanos path and to DuckDB's naive-timestamp oracle reads.

    Both branches keep the public contract: ``ts`` comes back as a
    plain TimestampType with the same wall-clock values, and the
    optional [start, end+1s) bound lands on the scan, never on a
    derived column.
    """
    from datetime import datetime, timezone

    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType

    if isinstance(ts_type, LongType):  # legacy INT64(NANOS) layout

        def _ns(t: str) -> int:
            dt = datetime.fromisoformat(t).replace(tzinfo=timezone.utc)
            return int(dt.timestamp()) * 1_000_000_000

        if start is not None:
            df = df.filter(F.col("ts") >= F.lit(_ns(start)))
        if end is not None:
            df = df.filter(F.col("ts") < F.lit(_ns(end)) + F.lit(1_000_000_000))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))

    # native timestamp layout: compare in the column's own type so the
    # predicate stays on the scan column (no cast over ts = pushdown)
    if start is not None:
        df = df.filter(F.col("ts") >= F.lit(start).cast(ts_type))
    if end is not None:
        df = df.filter(
            F.col("ts") < F.lit(end).cast(ts_type) + F.expr("INTERVAL 1 SECOND")
        )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))



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


# =====================================================================
# Parity queries — TPC-H-style analytics (scan/filter/join/agg/window)
# =====================================================================

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the flagship scan+aggregate (A1/A3, F1)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                            AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                       AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)                            AS avg_qty,
       ROUND(AVG(l_discount), 4)                            AS avg_disc,
       COUNT(*)                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + agg + top-k (J2/O2)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        # no broadcast hint on customer: it grows with SF — AQE picks
        # broadcast at small scale and shuffled hash/SMJ at 100 TB
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join through two dimension chains."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        # supplier/customer scale with SF (no hint — AQE decides);
        # nation/region are constant-size → always broadcast
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight filter + single agg (F1, A3)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 25)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
"""


def q4_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join with
    a non-equi conjunct (late-shipped lineitems per order priority)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q18_having_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped sum, re-joined to the
    parent relation, global top-k."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


Q18_SQL = """
SELECT o_orderkey, o_orderdate, ROUND(o_totalprice, 2) AS o_totalprice,
       ROUND(total_qty, 2) AS total_qty
FROM orders
JOIN (
    SELECT l_orderkey, SUM(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
) b ON o_orderkey = b.l_orderkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


def f9_get_or_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: get-or-create as a left-anti insert — which (event_type,
    user_id) series keys are NOT yet registered in the 'run' dimension
    (simulated as the keys seen before 2024-01-05)."""
    ev = _t(spark, sf_dir, "events")
    existing = (
        _events(spark, sf_dir, end="2024-01-05 00:00:00")
        .filter(F.col("ts") < F.lit("2024-01-05 00:00:00").cast("timestamp"))
        .select("event_type", "user_id")
        .distinct()
    )
    all_keys = ev.select("event_type", "user_id").distinct()
    to_create = all_keys.join(existing, ["event_type", "user_id"], "left_anti")
    return to_create.select(
        "event_type",
        "user_id",
        series_hash_id(F.lit("daily_run"), "event_type", "user_id").alias("tms_id"),
    ).orderBy("event_type", "user_id")


F9_SQL = """
WITH ev AS (SELECT event_type, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
existing AS (SELECT DISTINCT event_type, user_id FROM ev WHERE ts < TIMESTAMP '2024-01-05 00:00:00'),
all_keys AS (SELECT DISTINCT event_type, user_id FROM ev)
SELECT event_type, user_id,
       sha256('daily_run' || ':' || event_type || ':' || CAST(user_id AS VARCHAR)) AS tms_id
FROM all_keys
ANTI JOIN existing USING (event_type, user_id)
ORDER BY event_type, user_id
"""


def k7_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7: deterministic MERGE on the parquet backend — re-price every
    10th order (+1.0), upsert into the orders relation, aggregate the
    merged state per status (keyed replace, last-writer-wins)."""
    from curw_flo2d_data_manager_spark.sinks.upsert import merge_upsert

    orders = _t(spark, sf_dir, "orders")
    incoming = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    merged = merge_upsert(orders, incoming, keys=["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


K7_SQL = """
WITH incoming AS (
    SELECT * REPLACE (o_totalprice + 1.0 AS o_totalprice)
    FROM orders WHERE o_orderkey % 10 = 0
),
merged AS (
    SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM incoming)
    UNION ALL
    SELECT * FROM incoming
)
SELECT o_orderstatus, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def k8_run_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8: run-provenance upsert (reference ``insert_run_metadata``,
    output/extract_water_level.py:589-591) — one (source, variable,
    sim_tag) record per simulated run carrying fgt + a JSON metadata
    blob + template path. A week-1 extraction seeds the table; a
    re-run over the full range replaces only the re-extracted sims
    (click/view); one literal record exercises the single-row API."""
    from curw_flo2d_data_manager_spark.plans.extract import (
        insert_run_metadata,
        run_metadata_record,
    )

    ev = _events(spark, sf_dir)

    def _records(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("event_type").alias("sim_tag")).agg(
            F.date_trunc("second", F.max("ts")).alias("fgt"),
            F.concat(
                F.lit('{"n_events":'), F.count(F.lit(1)).cast("string"), F.lit("}")
            ).alias("metadata"),
        ).select(
            F.lit(1).cast("long").alias("source_id"),
            F.lit(2).cast("long").alias("variable_id"),
            "sim_tag",
            "fgt",
            "metadata",
            F.lit(None).cast("string").alias("template_path"),
        )

    existing = _records(
        ev.filter(F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
    )
    rerun = _records(ev.filter(F.col("event_type").isin("click", "view")))
    merged = insert_run_metadata(existing, rerun)
    manual = run_metadata_record(
        spark,
        source_id=99,
        variable_id=1,
        sim_tag="manual_run",
        fgt="2024-02-01 00:00:00",
        metadata={"cells": 1152, "model": "flo2d_250"},
        template_path="/templates/flo2d_250",
    )
    return insert_run_metadata(merged, manual).orderBy(
        "source_id", "variable_id", "sim_tag"
    )


K8_SQL = """
WITH ev AS (
    SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
existing AS (
    SELECT CAST(1 AS BIGINT) AS source_id, CAST(2 AS BIGINT) AS variable_id,
           event_type AS sim_tag,
           date_trunc('second', MAX(ts)) AS fgt,
           '{"n_events":' || COUNT(*) || '}' AS metadata,
           CAST(NULL AS VARCHAR) AS template_path
    FROM ev WHERE ts < TIMESTAMP '2024-01-08'
    GROUP BY event_type
),
rerun AS (
    SELECT CAST(1 AS BIGINT) AS source_id, CAST(2 AS BIGINT) AS variable_id,
           event_type AS sim_tag,
           date_trunc('second', MAX(ts)) AS fgt,
           '{"n_events":' || COUNT(*) || '}' AS metadata,
           CAST(NULL AS VARCHAR) AS template_path
    FROM ev WHERE event_type IN ('click', 'view')
    GROUP BY event_type
),
merged AS (
    SELECT * FROM existing e
    WHERE NOT EXISTS (SELECT 1 FROM rerun r
                      WHERE r.source_id = e.source_id
                        AND r.variable_id = e.variable_id
                        AND r.sim_tag = e.sim_tag)
    UNION ALL
    SELECT * FROM rerun
    UNION ALL
    SELECT CAST(99 AS BIGINT), CAST(1 AS BIGINT), 'manual_run',
           TIMESTAMP '2024-02-01 00:00:00',
           '{"cells":1152,"model":"flo2d_250"}', '/templates/flo2d_250'
)
SELECT * FROM merged ORDER BY source_id, variable_id, sim_tag
"""


def k8_start_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 companion: run-dim date maintenance across three simulated
    extraction runs (reference ``update_start_date``,
    output/extract_water_level.py:213-214 + ``update_latest_fgt``,
    :216-217). Series = (event_type, user_id mod 97); run 1 covers
    week 1 (creating 476 of 485 series), run 2 covers everything
    (9 series created late must get run 2's fgt as start_date), run 3
    is an OUT-OF-ORDER backfill whose older fgt must advance nothing.
    start_date is pinned at creation; fgt is the max seen."""
    from curw_flo2d_data_manager_spark.plans.extract import update_run_dates

    ev = _events(spark, sf_dir)

    def payload(df: DataFrame, fgt: str) -> DataFrame:
        return df.select(
            F.concat_ws(
                "_", "event_type", (F.col("user_id") % 97).cast("string")
            ).alias("tms_id"),
            F.lit(fgt).cast("timestamp").alias("fgt"),
        )

    cut = lambda d: ev.filter(F.col("ts") < F.lit(d).cast("timestamp"))  # noqa: E731
    dim = update_run_dates(None, payload(cut("2024-01-08"), "2024-01-08 00:00:00"))
    dim = update_run_dates(dim, payload(ev, "2024-01-31 00:00:00"))
    dim = update_run_dates(
        dim, payload(cut("2024-01-20"), "2024-01-15 00:00:00")
    )
    return dim.orderBy("tms_id")


K8_START_SQL = """
WITH ev AS (
    SELECT event_type || '_' || CAST(user_id % 97 AS VARCHAR) AS tms_id,
           CAST(ts AS TIMESTAMP) AS ts
    FROM events
),
run1 AS (SELECT tms_id, MIN(TIMESTAMP '2024-01-08 00:00:00') AS fgt_min,
                MAX(TIMESTAMP '2024-01-08 00:00:00') AS fgt_max
         FROM ev WHERE ts < TIMESTAMP '2024-01-08' GROUP BY tms_id),
run2 AS (SELECT tms_id, MIN(TIMESTAMP '2024-01-31 00:00:00') AS fgt_min,
                MAX(TIMESTAMP '2024-01-31 00:00:00') AS fgt_max
         FROM ev GROUP BY tms_id),
run3 AS (SELECT tms_id, MIN(TIMESTAMP '2024-01-15 00:00:00') AS fgt_min,
                MAX(TIMESTAMP '2024-01-15 00:00:00') AS fgt_max
         FROM ev WHERE ts < TIMESTAMP '2024-01-20' GROUP BY tms_id),
d1 AS (SELECT tms_id, fgt_min AS start_date, fgt_max AS fgt FROM run1),
d2 AS (
    SELECT COALESCE(d.tms_id, i.tms_id) AS tms_id,
           COALESCE(d.start_date, i.fgt_min) AS start_date,
           GREATEST(COALESCE(d.fgt, i.fgt_max), COALESCE(i.fgt_max, d.fgt)) AS fgt
    FROM d1 d FULL OUTER JOIN run2 i ON d.tms_id = i.tms_id
),
d3 AS (
    SELECT COALESCE(d.tms_id, i.tms_id) AS tms_id,
           COALESCE(d.start_date, i.fgt_min) AS start_date,
           GREATEST(COALESCE(d.fgt, i.fgt_max), COALESCE(i.fgt_max, d.fgt)) AS fgt
    FROM d2 d FULL OUTER JOIN run3 i ON d.tms_id = i.tms_id
)
SELECT tms_id, start_date, fgt FROM d3 ORDER BY tms_id
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-aggregate subquery — lineitems
    below 20% of their part's average quantity (decorrelates to a
    per-part aggregate join)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    avg_qty = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty._pk)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q17_SQL = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly, COUNT(*) AS n_rows
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < (
      SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


def a_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (free Spark capability beyond the
    reference's flat aggregations — SURVEY §2.5 note)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


A_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def a_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (two-phase distinct-expand plan)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


A_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram statistics: top-50 word bigrams by document
    frequency — the explode-shuffle-heavy corpus analysis shape (at
    100 TB this is the canonical map-side-combine aggregation)."""
    docs = _t(spark, sf_dir, "documents")
    w = words("text")
    bigrams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
        )
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .filter(F.col("bigram").contains(" "))  # drop 1-word degenerates
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "bigram")
        .limit(50)
    )


TEXT_BIGRAMS_SQL = """
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
grams AS (
    SELECT DISTINCT doc_id, g.gram
    FROM w, LATERAL (
        SELECT unnest(CASE WHEN len(words) >= 2
                 THEN list_transform(range(1, len(words)), i -> array_to_string(words[i:i+1], ' '))
                 ELSE [] END) AS gram
    ) g
    WHERE g.gram LIKE '% %'
)
SELECT gram AS bigram, COUNT(*) AS doc_freq
FROM grams
GROUP BY gram
ORDER BY doc_freq DESC, bigram
LIMIT 50
"""


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: deterministic synthetic PII
    (email / phone / IPv4 / URL noise) is appended to every document,
    redacted with the engine-portable regex chain, and gated on the
    sha256 of the redacted text plus per-kind placeholder counts —
    DuckDB replays the identical construction + RE2-compatible
    patterns, so a single divergent replacement breaks the hash."""
    from curw_flo2d_data_manager_spark.operators.textstats import redact_pii

    docs = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 071-2345678 via 192.168."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".1"),
    )
    red = redact_pii(aug)
    count = lambda marker: (  # noqa: E731
        (F.length(red) - F.length(F.replace(red, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("long")
    return (
        docs.select(
            "doc_id",
            F.sha2(red, 256).alias("redacted_sha"),
            count("[EMAIL]").alias("n_emails"),
            count("[PHONE]").alias("n_phones"),
            count("[IP]").alias("n_ips"),
        )
        .orderBy("doc_id")
    )


def _text_pii_sql() -> str:
    """Build the DuckDB oracle from PII_PATTERNS itself — one source
    of truth for the engine-portable regexes (round-3 advice: a
    hand-copied SQL twin of the patterns can drift, e.g. the r2
    explicit-whitespace-class phone fix was only half-applied). The
    patterns use Java∩RE2 syntax and contain no single quotes, so they
    interpolate into standard SQL string literals verbatim."""
    from curw_flo2d_data_manager_spark.operators.textstats import PII_PATTERNS

    red = "t"
    for pat, repl in PII_PATTERNS.values():  # same order as redact_pii
        red = f"regexp_replace({red},\n               '{pat}', '{repl}', 'g')"
    counts = ",\n       ".join(
        f"CAST((length(r) - length(replace(r, '{repl}', ''))) / {len(repl)}"
        f" AS BIGINT) AS n_{kind}s"
        for kind, (_, repl) in (
            ("email", PII_PATTERNS["email"]),
            ("phone", PII_PATTERNS["phone"]),
            ("ip", PII_PATTERNS["ipv4"]),
        )
    )
    return f"""
WITH aug AS (
    SELECT doc_id,
           text || ' contact user' || doc_id || '@example.com or 071-2345678 via 192.168.'
                || (doc_id % 256) || '.1' AS t
    FROM documents
),
red AS (
    SELECT doc_id,
           {red} AS r
    FROM aug
)
SELECT doc_id, sha256(r) AS redacted_sha,
       {counts}
FROM red
ORDER BY doc_id
"""


TEXT_PII_SQL = _text_pii_sql()


def text_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + domain rollup: synthetic deterministic links
    appended per document, extracted with regexp_extract_all, exploded
    to registrable domains, counted per domain (the link-density /
    crawl-lineage shape)."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        extract_urls,
        url_domain,
    )

    docs = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" see https://site"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".org/p/"), F.col("doc_id").cast("string"),
        F.lit(" and http://mirror"), (F.col("doc_id") % 3).cast("string"),
        F.lit(".example.net/x"),
    )
    return (
        docs.select("doc_id", F.explode(extract_urls(aug)).alias("url"))
        .select(url_domain("url").alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_links"))
        .orderBy("domain")
    )


TEXT_URL_SQL = r"""
WITH aug AS (
    SELECT doc_id,
           text || ' see https://site' || (doc_id % 7) || '.org/p/' || doc_id
                || ' and http://mirror' || (doc_id % 3) || '.example.net/x' AS t
    FROM documents
),
urls AS (
    SELECT unnest(regexp_extract_all(t, 'https?://[^\s"''<>]+')) AS url FROM aug
)
SELECT lower(regexp_extract(url, 'https?://([^/:\s]+)', 1)) AS domain,
       COUNT(*) AS n_links
FROM urls
GROUP BY domain
ORDER BY domain
"""


def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids via the explode/aggregate shape
    (shuffle volume = labels × dims, independent of corpus size).
    Synthetic labels = vec_id % 5; DuckDB recomputes the same
    element-wise means.

    Output is posexploded to scalar ``(label, pos, comp)`` rows rather
    than an ``array<double>`` column: the driver gate canonicalizes
    results via pandas ``sort_values``, which cannot factorize list
    cells (round-4 ``err``). ``vector_mean`` itself still returns the
    assembled centroid array for library callers."""
    from curw_flo2d_data_manager_spark.operators.similarity import vector_mean

    emb = _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 5).alias("label"), "embedding"
    )
    out = vector_mean(emb, ["label"])
    return (
        out.select("label", F.posexplode("centroid").alias("pos", "comp"))
        .select("label", "pos", F.round("comp", 6).alias("comp"))
        .orderBy("label", "pos")
    )


SIM_CENTROID_SQL = """
WITH e AS (
    SELECT vec_id % 5 AS label,
           unnest(list_transform(range(1, len(embedding) + 1),
                  i -> {'pos': i - 1, 'comp': CAST(embedding[i] AS DOUBLE)})) AS pc
    FROM embeddings
)
SELECT label, pc.pos AS pos, ROUND(AVG(pc.comp), 6) AS comp
FROM e
GROUP BY label, pc.pos
ORDER BY label, pos
"""


def text_repetition_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition + quality gates per document: duplicate
    line/word fractions and the AND of the published-rule bounds
    (word count, mean word length, symbol ratio, repetition) — the
    keep/drop decision of a web-corpus curation pass, as one pure
    Column scan."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        duplicate_line_fraction,
        duplicate_word_fraction,
        gopher_quality_flags,
    )

    docs = _t(spark, sf_dir, "documents")
    flags = gopher_quality_flags("text")
    keep = (
        F.col("flags.word_count_ok")
        & F.col("flags.mean_word_len_ok")
        & F.col("flags.symbol_ratio_ok")
        & F.col("flags.dup_lines_ok")
        & F.col("flags.dup_words_ok")
    )
    return (
        docs.withColumn("flags", flags)
        .select(
            "doc_id",
            F.round(duplicate_line_fraction("text"), 6).alias("dup_line_frac"),
            F.round(duplicate_word_fraction("text"), 6).alias("dup_word_frac"),
            keep.alias("keep"),
        )
        .orderBy("doc_id")
    )


TEXT_REPETITION_SQL = r"""
WITH base AS (
    SELECT doc_id, text,
           list_filter(list_transform(string_split(text, chr(10)), s -> trim(s)),
                       s -> s != '') AS lines,
           CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')) = ''
                THEN []::VARCHAR[]
                ELSE string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')), '\s+')
           END AS w
    FROM documents
),
m AS (
    SELECT doc_id,
           CASE WHEN len(lines) <= 1 THEN 0.0
                ELSE (len(lines) - len(list_distinct(lines))) / len(lines) END AS dlf,
           CASE WHEN len(w) <= 1 THEN 0.0
                ELSE (len(w) - len(list_distinct(w))) / len(w) END AS dwf,
           len(w) AS n_words,
           list_sum(list_transform(w, x -> length(x)))
               / greatest(len(w), 1) AS mwl,
           len(regexp_extract_all(text, '[#@/\\{}<>|~^]'))
               / greatest(len(w), 1) AS sym_ratio
    FROM base
)
SELECT doc_id, ROUND(dlf, 6) AS dup_line_frac, ROUND(dwf, 6) AS dup_word_frac,
       (n_words BETWEEN 50 AND 100000)
       AND (mwl BETWEEN 3.0 AND 10.0)
       AND (sym_ratio < 0.1)
       AND (dlf < 0.3) AND (dwf < 0.6) AS keep
FROM m
ORDER BY doc_id
"""


def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward, inclusive): each purchase event gets the
    user's most recent login value — checked against DuckDB's native
    ASOF JOIN. The engine form is a union + per-key fill-down window
    (one shuffle, no range join)."""
    from curw_flo2d_data_manager_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir, end="2024-01-08 00:00:00").filter(
        (F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"))
        & (F.col("user_id") < 30)
    )
    base = ev.select(
        "user_id",
        F.date_trunc("second", "ts").alias("time"),
        "event_type",
        "event_id",
        F.round("value", 4).alias("value"),
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "user_id", "time", "event_id"
    )
    logins = base.filter(F.col("event_type") == "signup").select(
        "user_id", "time", "value"
    )
    out = asof_join(purchases, logins, on="time", by=["user_id"])
    return out.select(
        "user_id",
        "event_id",
        F.col("value_right").alias("login_value"),
        F.col("time_right").alias("login_time"),
    ).orderBy("user_id", "event_id")


J_ASOF_SQL = """
WITH base AS (
    SELECT user_id, date_trunc('second', CAST(ts AS TIMESTAMP)) AS time,
           event_type, event_id, ROUND(value, 4) AS value
    FROM events
    WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08 00:00:00' AND user_id < 30
),
purchases AS (SELECT user_id, time, event_id FROM base WHERE event_type = 'purchase'),
logins AS (SELECT user_id, time, value FROM base WHERE event_type = 'signup')
SELECT p.user_id, p.event_id, l.value AS login_value, l.time AS login_time
FROM purchases p
ASOF LEFT JOIN logins l ON p.user_id = l.user_id AND p.time >= l.time
ORDER BY p.user_id, p.event_id
"""


def j_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: count the user's events inside each of their
    login sessions (login time + 2 h window) — an equi-join on time
    buckets + exact BETWEEN, never a nested-loop range join."""
    from curw_flo2d_data_manager_spark.operators.rangejoin import point_in_interval_join

    base = _events(spark, sf_dir, end="2024-01-08 00:00:00").filter(
        (F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"))
        & (F.col("user_id") < 20)
    ).select("user_id", F.date_trunc("second", "ts").alias("time"), "event_type", "event_id")
    sessions = base.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("session_id"),
        F.col("time").alias("start"),
        (F.col("time") + F.expr("INTERVAL 2 HOURS")).alias("end"),
    )
    joined = point_in_interval_join(
        base.select("user_id", "time", "event_id"),
        sessions,
        by=["user_id"],
        bucket_seconds=3600,
    )
    return (
        joined.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id", "session_id")
    )


J_RANGE_SQL = """
WITH base AS (
    SELECT user_id, date_trunc('second', CAST(ts AS TIMESTAMP)) AS time,
           event_type, event_id
    FROM events
    WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-08 00:00:00' AND user_id < 20
),
sessions AS (
    SELECT user_id, event_id AS session_id, time AS s, time + INTERVAL 2 HOUR AS e
    FROM base WHERE event_type = 'signup'
)
SELECT b.user_id, s.session_id, COUNT(*) AS n_events
FROM base b JOIN sessions s
  ON b.user_id = s.user_id AND b.time BETWEEN s.s AND s.e
GROUP BY b.user_id, s.session_id
ORDER BY b.user_id, s.session_id
"""


# =====================================================================
# S-rows: store scans re-expressed on the events table
# =====================================================================

def s1_series_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/F1/F2/O1: one series (user) in a time window, ordered."""
    ev = _events(spark, sf_dir, "2024-01-05 00:00:00", "2024-01-20 00:00:00")
    return (
        ev.filter(
            (F.col("user_id") == 5)
            & F.col("ts").between(
                F.lit("2024-01-05 00:00:00").cast("timestamp"),
                F.lit("2024-01-20 00:00:00").cast("timestamp"),
            )
        )
        .select("event_id", "ts", "event_type", F.round("value", 4).alias("value"))
        .orderBy("ts")
    )


S1_SQL = """
SELECT event_id, ts, event_type, ROUND(value, 4) AS value
FROM events
WHERE user_id = 5
  AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
ORDER BY ts
"""


def s3_first_value_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/A6/O3: earliest value per series in a window via min_by —
    partial-aggregable, no sort (reference: getWL + fetchone)."""
    ev = _events(spark, sf_dir, start="2024-01-10 00:00:00")
    return (
        ev.filter(F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(
            F.round(F.min_by("value", "ts"), 4).alias("first_value"),
            F.min("ts").alias("first_ts"),
        )
        .orderBy("user_id")
    )


S3_SQL = """
SELECT user_id,
       ROUND(arg_min(value, ts), 4) AS first_value,
       MIN(ts) AS first_ts
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
GROUP BY user_id
ORDER BY user_id
"""


def s6_max_end_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/A1: latest available timestamp per series family."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.max("ts").alias("ts_end")).orderBy("event_type")


S6_SQL = """
SELECT event_type, MAX(ts) AS ts_end FROM events GROUP BY event_type ORDER BY event_type
"""


def s2_grid_scan_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/X9: the raincell derivation — whole-range grid scan as ONE
    join+filter plan (vs the reference's per-timestep stored-proc loop),
    plus the water-supply constant add (+1/288)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1996-06-30").cast("timestamp"),
            )
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_shipdate").alias("time"), F.col("p_partkey").alias("cell_id"))
        .agg(F.round(F.sum(F.col("l_quantity") + F.lit(1.0) / 288), 4).alias("value"))
        .orderBy("time", "cell_id")
    )


S2_SQL = """
SELECT l_shipdate AS time, p_partkey AS cell_id,
       ROUND(SUM(l_quantity + 1.0/288), 4) AS value
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 10
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-06-30'
GROUP BY 1, 2
ORDER BY 1, 2
"""


def s4_nearest_gauge_rain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 + J6 + K4: the flo2d_10 rain path end-to-end — config point →
    nearest gauge (rank-1 broadcast theta join) → ``rainfall_{id}_{name}
    _MDPA`` grid-id format → series resolution → RAIN.DAT render with
    the flo2d_10 spec (5-min grid, NO resample).

    Reference: input/rain/gen_rain.py:119-135 (getNearestWeatherStation
    + grid-id format + get_timeseries_id), :155-163 (flo2d_10 takes the
    timestep-5 branch, so no resample), :306-314 (config-point entry).
    The station dim is derived deterministically from ``nation`` so the
    DuckDB oracle recomputes the same nearest-station pick, grid-id
    string, and full render."""
    nation = _t(spark, sf_dir, "nation")
    stations = nation.select(
        F.col("n_nationkey").alias("station_id"),
        F.col("n_name").alias("name"),
        (F.lit(6.5) + F.col("n_nationkey") * F.lit(0.05)).alias("latitude"),
        (F.lit(79.5) + (F.col("n_nationkey") % 5) * F.lit(0.1)).alias("longitude"),
    )
    grid_ids = nearest_gauge_grid_ids(spark, stations, 6.93, 79.86)
    # synthetic run dim: each station's grid id resolves to one user
    # cohort (user_id ≡ station_id mod 25) — id resolution is a
    # broadcast join, not a driver round-trip
    run = stations.select(
        F.format_string("rainfall_%d_%s_MDPA", "station_id", "name").alias("grid_id"),
        F.col("station_id").alias("sid"),
    )
    cohort = run.join(F.broadcast(grid_ids), "grid_id").select("sid")
    ev = _events(spark, sf_dir, end="2024-01-20 00:00:00").filter(
        F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp")
    )
    series = (
        ev.join(F.broadcast(cohort), ev.user_id % 25 == F.col("sid"))
        .groupBy(
            F.timestamp_seconds(
                F.floor(F.col("ts").cast("double") / 300).cast("long") * 300
            ).alias("time")
        )
        .agg((F.round(F.sum("value"), 6) - 100.0).alias("value"))
    )
    lines = rain_lines(
        spark, series, "flo2d_10_Blomandl", "2024-01-02 00:00:00", "2024-01-20 00:00:00"
    )
    return (
        lines.crossJoin(F.broadcast(grid_ids))
        .select("grid_id", "block_rank", "intra_rank", "line")
        .orderBy("block_rank", "intra_rank")
    )


S4_SQL = """
WITH stations AS (
    SELECT n_nationkey AS station_id, n_name AS name,
           6.5 + n_nationkey * CAST(0.05 AS DOUBLE) AS latitude,
           79.5 + (n_nationkey % 5) * CAST(0.1 AS DOUBLE) AS longitude
    FROM nation
),
nearest AS (
    SELECT station_id, name,
           printf('rainfall_%d_%s_MDPA', station_id, name) AS grid_id
    FROM stations
    ORDER BY (latitude - 6.93) * (latitude - 6.93)
             + (longitude - 79.86) * (longitude - 79.86),
             station_id, name, latitude, longitude
    LIMIT 1
),
ev AS (
    SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events
    WHERE user_id % 25 = (SELECT station_id FROM nearest)
      AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20 00:00:00'
),
series AS (
    SELECT make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000) AS time,
           ROUND(SUM(value), 6) - 100.0 AS value
    FROM ev GROUP BY 1
),
spine AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-02 00:00:00',
                                        TIMESTAMP '2024-01-20 00:00:00',
                                        INTERVAL 5 MINUTE)) AS time),
aligned AS (SELECT s.time, se.value FROM spine s JOIN series se USING (time)),
cleaned AS (SELECT time, CASE WHEN value < 0 THEN NULL ELSE value END AS value FROM aligned),
tot AS (SELECT COALESCE(SUM(value), 0.0) AS t FROM cleaned),
cum AS (
    SELECT time, SUM(value) OVER (ORDER BY time ROWS UNBOUNDED PRECEDING) AS cum_value
    FROM cleaned
)
SELECT (SELECT grid_id FROM nearest) AS grid_id, 0 AS block_rank,
       CAST(0 AS BIGINT) AS intra_rank, ' 0             0 ' AS line
UNION ALL
SELECT (SELECT grid_id FROM nearest), 0, 1,
       printf(' %.3f         5             0             0 ',
              CAST(ROUND(CAST(CAST(t AS VARCHAR) AS DECIMAL(30,12)), 3) AS DOUBLE))
FROM tot
UNION ALL
SELECT (SELECT grid_id FROM nearest), 1, CAST(epoch(time) AS BIGINT),
       'R              '
       || rpad(printf('%.3f', CAST(ROUND(CAST(CAST((epoch(time) - epoch(TIMESTAMP '2024-01-02 00:00:00')) / 3600.0 AS VARCHAR) AS DECIMAL(30,12)), 3) AS DOUBLE)), 14, ' ')
       || printf('%.3f', CAST(ROUND(CAST(CAST(CASE WHEN (SELECT t FROM tot) = 0 THEN 0.0 ELSE COALESCE(cum_value / (SELECT t FROM tot), 0.0) END AS VARCHAR) AS DECIMAL(30,12)), 3) AS DOUBLE))
       || ' '
FROM cum
"""


# =====================================================================
# J-rows: joins
# =====================================================================

def j1_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/X8: dense hourly spine left-joined to hourly event sums —
    gaps surface as NULLs."""
    ev = _events(spark, sf_dir, "2024-01-02 00:00:00", "2024-01-02 23:59:59")
    hourly = ev.filter(
        F.col("ts").between(
            F.lit("2024-01-02 00:00:00").cast("timestamp"),
            F.lit("2024-01-02 23:59:59").cast("timestamp"),
        )
    ).groupBy(F.date_trunc("hour", "ts").alias("time")).agg(
        F.round(F.sum("value"), 4).alias("value"), F.count(F.lit(1)).alias("n")
    )
    return spine_align(
        spark, hourly, "2024-01-02 00:00:00", "2024-01-02 23:00:00", 60
    ).orderBy("time")


J1_SQL = """
SELECT s.time, h.value, h.n
FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-02 00:00:00',
                                    TIMESTAMP '2024-01-02 23:00:00',
                                    INTERVAL 1 HOUR)) AS time) s
LEFT JOIN (
    SELECT date_trunc('hour', ts) AS time, ROUND(SUM(value), 4) AS value, COUNT(*) AS n
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-02 00:00:00' AND TIMESTAMP '2024-01-02 23:59:59'
    GROUP BY 1
) h USING (time)
ORDER BY s.time
"""


def j2_dim_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3: broadcast dimension-chain lookup (station-map analogue)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("r_name", "n_name")
    )


J2_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def j5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/F3: left-semi membership filter (CHANNEL_CELL_MAP analogue)."""
    li = _t(spark, sf_dir, "lineitem")
    keys = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        li.join(F.broadcast(keys), li.l_partkey == keys.p_partkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy("l_returnflag")
    )


J5_SQL = """
SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def j8_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/F7: (day × event_type) cross grid, −999 sentinel at the
    boundary (TIMDEP gap-fill analogue)."""
    ev = _events(spark, sf_dir, end="2024-01-08 00:00:00").filter(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    )
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("time"), "event_type"
    ).agg(F.round(F.sum("value"), 4).alias("value"))
    types = _t(spark, sf_dir, "events").select("event_type").distinct()
    return (
        gap_fill_cross(daily, types, time_col="time", key_cols=["event_type"], fill=-999.0)
        .orderBy("time", "event_type")
    )


J8_SQL = """
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS time, event_type, ROUND(SUM(value), 4) AS value
    FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
    GROUP BY 1, 2
)
SELECT t.time, k.event_type, COALESCE(d.value, -999.0) AS value
FROM (SELECT DISTINCT time FROM daily) t
CROSS JOIN (SELECT DISTINCT event_type FROM events) k
LEFT JOIN daily d ON d.time = t.time AND d.event_type = k.event_type
ORDER BY t.time, k.event_type
"""


def j6_nearest_rank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/J6/W4: rank-1 nearest neighbor by a distance expression —
    for each part type, the part whose retail price is closest to 1500."""
    part = _t(spark, sf_dir, "part")
    part2 = part.select("p_partkey", "p_type", "p_retailprice")
    w = Window.partitionBy("p_type").orderBy(
        F.abs(F.col("p_retailprice") - 1500.0), "p_partkey"
    )
    return (
        part2.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("p_type", "p_partkey", F.round("p_retailprice", 2).alias("p_retailprice"))
        .orderBy("p_type")
    )


J6_SQL = """
SELECT p_type, p_partkey, ROUND(p_retailprice, 2) AS p_retailprice
FROM (
    SELECT p_type, p_partkey, p_retailprice,
           ROW_NUMBER() OVER (PARTITION BY p_type
                              ORDER BY ABS(p_retailprice - 1500.0), p_partkey) AS rk
    FROM part
) WHERE rk = 1
ORDER BY p_type
"""


# =====================================================================
# A/W rows: aggregation + windows
# =====================================================================

def a2_resample_right_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: 15-min right-labeled right-closed resample-sum (pandas
    parity semantics) over one day of events."""
    ev = _events(spark, sf_dir, end="2024-01-03 00:00:00").filter(
        F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    out = resample_sum(ev.select(F.col("ts").alias("time"), "value"), 15)
    return out.select("time", F.round("value", 4).alias("value")).orderBy("time")


A2_SQL = """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT make_timestamp(CAST(ceil(epoch(ts) / 900) * 900 AS BIGINT) * 1000000) AS time,
       ROUND(SUM(value), 4) AS value
FROM ev
WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
GROUP BY 1
ORDER BY 1
"""


def a_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascading rollup: 15-min and hourly right-closed
    sums in one plan, the hourly level aggregated FROM the 15-min level
    (lossless since 60 % 15 == 0) — oracle recomputes both from raw."""
    from curw_flo2d_data_manager_spark.operators.rollup_cascade import rollup_cascade

    ev = _events(spark, sf_dir, end="2024-01-04 00:00:00").filter(
        F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp")
    )
    out = rollup_cascade(
        ev.select(F.col("ts").alias("time"), "value"), [15, 60]
    )
    return out.select(
        "level_minutes", "time", F.round("value", 4).alias("value")
    ).orderBy("level_minutes", "time")


A_CASCADE_SQL = """
WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events
            WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-04 00:00:00')
SELECT 15 AS level_minutes,
       make_timestamp(CAST(ceil(epoch(ts) / 900) * 900 AS BIGINT) * 1000000) AS time,
       ROUND(SUM(value), 4) AS value
FROM ev GROUP BY 2
UNION ALL
SELECT 60,
       make_timestamp(CAST(ceil(epoch(ts) / 3600) * 3600 AS BIGINT) * 1000000),
       ROUND(SUM(value), 4)
FROM ev GROUP BY 2
ORDER BY level_minutes, time
"""


def a4_cumulative_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4/W1: per-series running sum + fraction-of-total with the
    total==0 guard (RAIN.DAT cumulative normalization)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    out = cumulative_fraction(
        ev.select("user_id", F.col("ts").alias("time"), "event_id", "value"),
        time_col="event_id",  # unique per row → deterministic order
        group_cols=["user_id"],
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("cum_value", 4).alias("cum_value"),
        F.round("cum_fraction", 6).alias("cum_fraction"),
    ).orderBy("user_id", "event_id")


A4_SQL = """
SELECT user_id, event_id,
       ROUND(SUM(value) OVER w, 4) AS cum_value,
       ROUND(CASE WHEN SUM(value) OVER (PARTITION BY user_id) = 0 THEN 0.0
                  ELSE (SUM(value) OVER w) / (SUM(value) OVER (PARTITION BY user_id))
             END, 6) AS cum_fraction
FROM events
WHERE user_id < 5
WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING)
ORDER BY user_id, event_id
"""


def w2_elapsed_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: elapsed hours since each series' first sample."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 3)
    w = Window.partitionBy("user_id")
    return (
        ev.withColumn("t0", F.min("ts").over(w))
        .select(
            "user_id",
            "event_id",
            F.round(
                (F.col("ts").cast("double") - F.col("t0").cast("double")) / 3600.0, 6
            ).alias("elapsed_hours"),
        )
        .orderBy("user_id", "event_id")
    )


W2_SQL = """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT user_id, event_id,
       ROUND((epoch(ts) - MIN(epoch(ts)) OVER (PARTITION BY user_id)) / 3600.0, 6)
           AS elapsed_hours
FROM ev
WHERE user_id < 3
ORDER BY user_id, event_id
"""


def w3_fill_down(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: last-non-null propagation in event order — each event carries
    the value of its user's most recent 'login' event (section-header
    fill-down idiom from the HYCHAN parser)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    marked = ev.withColumn(
        "login_value", F.when(F.col("event_type") == "signup", F.col("value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marked.withColumn("last_login_value", F.last("login_value", ignorenulls=True).over(w))
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.round("last_login_value", 4).alias("last_login_value"),
        )
        .orderBy("user_id", "event_id")
    )


W3_SQL = """
SELECT user_id, event_id, event_type,
       ROUND(last_value(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING), 4)
           AS last_login_value
FROM events
WHERE user_id < 5
ORDER BY user_id, event_id
"""


# =====================================================================
# F/X/K/U rows: scalar functions, sentinels, rendering
# =====================================================================

def f6_sentinel_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5/F6: sentinel filtering + conditional NULL-ing + cast guard:
    values above 195 are treated as a gap sentinel (dropped), values
    below 5 NULL-ed (negative-rewrite analogue)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value") <= 195.0)
        .withColumn("clean_value", F.when(F.col("value") < 5.0, None).otherwise(F.col("value")))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("clean_value").alias("n_clean"),
            F.round(F.avg("clean_value"), 4).alias("avg_clean"),
        )
        .orderBy("event_type")
    )


F6_SQL = """
SELECT event_type,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN value >= 5.0 THEN value END) AS n_clean,
       ROUND(AVG(CASE WHEN value >= 5.0 THEN value END), 4) AS avg_clean
FROM events
WHERE value <= 195.0
GROUP BY event_type
ORDER BY event_type
"""


def x4_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4/S11: regex/JSON extraction from the props blob + aggregate."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.regexp_extract("props", r'"k":\s*(\d+)', 1).try_cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_k"),
        )
        .orderBy("event_type")
    )


X4_SQL = """
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k, COUNT(k) AS n_k
FROM (
    SELECT event_type,
           TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k
    FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


def x11_series_hash_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: content-addressed series ids (sha256 over metadata tuple)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    return ev.select(
        "event_type",
        "user_id",
        series_hash_id(F.lit("daily_run"), "event_type", "user_id").alias("tms_id"),
    ).orderBy("event_type", "user_id")


X11_SQL = """
SELECT DISTINCT event_type, user_id,
       sha256('daily_run' || ':' || event_type || ':' || CAST(user_id AS VARCHAR)) AS tms_id
FROM events
ORDER BY event_type, user_id
"""


def k1_fixed_width_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/X1/U1/O2: INFLOW.DAT-style ordered fixed-width rendering —
    header block ∪ data block with explicit (block_rank, intra_rank)
    sort keys, the engine's ordered-text-sink row shape."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") == 1)
    w = Window.partitionBy(F.lit(1))
    data = (
        ev.withColumn("t0", F.min("ts").over(w))
        .select(
            F.lit(1).alias("block_rank"),
            F.col("event_id").alias("intra_rank"),
            F.format_string(
                "H%16.1f%16.1f",
                F.round((F.col("ts").cast("double") - F.col("t0").cast("double")) / 3600.0, 1),
                F.round(F.col("value"), 1),
            ).alias("line"),
        )
    )
    header = spark.createDataFrame(
        [(0, 0, "C               0           41550"), (0, 1, "CONSTANT INFLOW")],
        "block_rank int, intra_rank long, line string",
    )
    return header.unionByName(data).orderBy("block_rank", "intra_rank")


K1_SQL = """
SELECT * FROM (
    SELECT 0 AS block_rank, 0 AS intra_rank, 'C               0           41550' AS line
    UNION ALL
    SELECT 0, 1, 'CONSTANT INFLOW'
    UNION ALL
    SELECT 1 AS block_rank, event_id AS intra_rank,
           printf('H%16.1f%16.1f',
                  CAST(ROUND(CAST(CAST((epoch(CAST(ts AS TIMESTAMP)) - MIN(epoch(CAST(ts AS TIMESTAMP))) OVER ()) / 3600.0 AS VARCHAR) AS DECIMAL(30,12)), 1) AS DOUBLE),
                  CAST(ROUND(CAST(CAST(value AS VARCHAR) AS DECIMAL(30,12)), 1) AS DOUBLE)) AS line
    FROM events WHERE user_id = 1
)
ORDER BY block_rank, intra_rank
"""


def k3_raincell_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3/S2/X9: the full RAINCELL.DAT pipeline over an events-derived
    hourly grid — header, per-step cell blocks with the water-supply
    correction, blank separators — as ONE plan (the reference looped a
    stored-proc call per timestep, gen_raincell.py:129-142)."""
    ev = _t(spark, sf_dir, "events")
    grid = ev.groupBy(
        F.date_trunc("hour", "ts").alias("time"), F.col("user_id").alias("cell_id")
    ).agg(F.round(F.sum("value"), 6).alias("value"))
    return raincell_lines(
        spark, grid, "flo2d_250", "2024-01-02 00:00:00", "2024-01-04 00:00:00"
    ).orderBy("block_rank", "intra_rank")


K3_SQL = """
WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
grid AS (
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS time, user_id AS cell_id,
           ROUND(SUM(value), 6) AS v
    FROM ev GROUP BY 1, 2
),
win AS (
    SELECT *, CAST((epoch(time) - epoch(TIMESTAMP '2024-01-02 00:00:00')) / 60 / 5 AS BIGINT) AS s
    FROM grid
    WHERE time > TIMESTAMP '2024-01-02 00:00:00' AND time <= TIMESTAMP '2024-01-04 00:00:00'
)
SELECT 0 AS block_rank, CAST(0 AS BIGINT) AS intra_rank,
       '5 576 2024-01-02 00:00:00 2024-01-04 00:00:00' AS line
UNION ALL
SELECT 1, s * 4294967296 + cell_id, printf('%d %.3f', cell_id, CAST(ROUND(CAST(CAST(v + 1.0/288 AS VARCHAR) AS DECIMAL(30,12)), 3) AS DOUBLE)) FROM win
UNION ALL
SELECT 1, s * 4294967296 + 4294967295, ''
FROM (SELECT unnest(range(1, 577)) AS s)
"""


def k2_outflow_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/J7/F4: the full OUTFLOW.DAT pipeline — K/N/S blocks for the
    flo2d_150_v2 boundary nodes, with the −99999 gap sentinel dropped
    after the elapsed-hours origin is captured."""
    ev = _events(spark, sf_dir, end="2024-01-03 00:00:00").filter(
        (F.col("user_id") < 4) & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
    )
    node = F.element_at(
        F.array(F.lit(330), F.lit(462), F.lit(546), F.lit(1282)),
        (F.col("user_id") + 1).cast("int"),
    )
    tide = ev.select(
        node.alias("node"),
        # whole-second times: unix_timestamp truncates sub-seconds,
        # duckdb epoch() keeps them — align the two up front
        F.date_trunc("second", "ts").alias("time"),
        F.when(F.col("value") > 195.0, F.lit(-99999.0))
        .otherwise(F.round("value", 4))
        .alias("value"),
    )
    return outflow_lines(tide, "flo2d_150_v2").orderBy("block_rank", "intra_rank")


K2_SQL = """
WITH tide AS (
    SELECT CASE user_id WHEN 0 THEN 330 WHEN 1 THEN 462 WHEN 2 THEN 546 ELSE 1282 END AS node,
           date_trunc('second', CAST(ts AS TIMESTAMP)) AS time,
           CASE WHEN value > 195.0 THEN -99999.0 ELSE ROUND(value, 4) END AS value
    FROM events
    WHERE user_id < 4 AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00'
),
org AS (SELECT node, MIN(time) AS t0 FROM tide GROUP BY node),
consts(block_rank, intra_rank, line) AS (VALUES
    (0, 0, 'K' || lpad('268', 16, ' ')),
    (0, 1, 'K' || lpad('391', 16, ' ')),
    (0, 2, 'K' || lpad('464', 16, ' ')),
    (0, 3, 'K' || lpad('1174', 16, ' ')),
    (1, 0, 'N' || lpad('330', 16, ' ') || lpad('1', 16, ' ')),
    (2, 0, 'N' || lpad('462', 16, ' ') || lpad('1', 16, ' ')),
    (3, 0, 'N' || lpad('546', 16, ' ') || lpad('1', 16, ' ')),
    (4, 0, 'N' || lpad('1282', 16, ' ') || lpad('1', 16, ' ')))
SELECT block_rank, CAST(intra_rank AS BIGINT) AS intra_rank, line FROM consts
UNION ALL
SELECT CASE node WHEN 330 THEN 1 WHEN 462 THEN 2 WHEN 546 THEN 3 ELSE 4 END,
       CAST(epoch(time) + 1 AS BIGINT),
       printf('S%16.3f%16.3f', CAST(ROUND(CAST(CAST((epoch(time) - epoch(t0)) / 3600.0 AS VARCHAR) AS DECIMAL(30,12)), 3) AS DOUBLE), CAST(ROUND(CAST(CAST(value AS VARCHAR) AS DECIMAL(30,12)), 3) AS DOUBLE))
FROM tide JOIN org USING (node)
WHERE CAST(value AS INT) != -99999
"""


def k4_rain_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 + J1/A2/F6/A3/A4/W1: the full RAIN.DAT pipeline — 5-min
    spine align, right-closed 15-min resample, post-resample negative
    nulling, cumulative-fraction normalization, fixed-width render."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") == 1)
    series = ev.groupBy(
        F.timestamp_seconds(
            F.floor(F.col("ts").cast("double") / 300).cast("long") * 300
        ).alias("time")
    ).agg((F.round(F.sum("value"), 6) - 100.0).alias("value"))
    return rain_lines(
        spark, series, "flo2d_150", "2024-01-02 00:00:00", "2024-01-10 00:00:00"
    ).orderBy("block_rank", "intra_rank")


K4_SQL = """
WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events WHERE user_id = 1),
series AS (
    SELECT make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000) AS time,
           ROUND(SUM(value), 6) - 100.0 AS value
    FROM ev GROUP BY 1
),
spine AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-02 00:00:00',
                                        TIMESTAMP '2024-01-10 00:00:00',
                                        INTERVAL 5 MINUTE)) AS time),
aligned AS (SELECT s.time, se.value FROM spine s JOIN series se USING (time)),
resampled AS (
    SELECT make_timestamp(CAST(ceil(epoch(time) / 900) * 900 AS BIGINT) * 1000000) AS time,
           SUM(value) AS value
    FROM aligned GROUP BY 1
),
cleaned AS (SELECT time, CASE WHEN value < 0 THEN NULL ELSE value END AS value FROM resampled),
tot AS (SELECT COALESCE(SUM(value), 0.0) AS t FROM cleaned),
cum AS (
    SELECT time, SUM(value) OVER (ORDER BY time ROWS UNBOUNDED PRECEDING) AS cum_value
    FROM cleaned
)
SELECT 0 AS block_rank, CAST(0 AS BIGINT) AS intra_rank, ' 0             0 ' AS line
UNION ALL
SELECT 0, 1, printf(' %.3f         5             0             0 ', CAST(ROUND(CAST(CAST(t AS VARCHAR) AS DECIMAL(30,12)), 3) AS DOUBLE)) FROM tot
UNION ALL
SELECT 1, CAST(epoch(time) AS BIGINT),
       'R              '
       || rpad(printf('%.3f', CAST(ROUND(CAST(CAST((epoch(time) - epoch(TIMESTAMP '2024-01-02 00:00:00')) / 3600.0 AS VARCHAR) AS DECIMAL(30,12)), 3) AS DOUBLE)), 14, ' ')
       || printf('%.3f', CAST(ROUND(CAST(CAST(CASE WHEN (SELECT t FROM tot) = 0 THEN 0.0 ELSE COALESCE(cum_value / (SELECT t FROM tot), 0.0) END AS VARCHAR) AS DECIMAL(30,12)), 3) AS DOUBLE))
       || ' '
FROM cum
"""


def sim_ivf_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a planted full oracle: the corpus carries one
    verbatim copy of every vector (same coordinates → same KMeans
    cell, cosine exactly 1). For each of 50 query vectors the probed
    buckets MUST contain both the vector itself (rank 1, id
    tie-break) and its planted copy (rank 2) — a broken index build,
    cell assignment, probe selection, or ranking drops one of them
    and breaks the hash match. The recall-vs-exact floor for
    non-trivial neighbors is pinned in tests/test_operators_core.py."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(planted)
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(corpus, queries, k=2, n_clusters=8, nprobe=2)
    return out.select(
        "query_id", "corpus_id", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


SIM_IVF_SQL = """
SELECT vec_id AS query_id, vec_id AS corpus_id,
       CAST(1.0 AS DOUBLE) AS cosine, 1 AS rank
FROM embeddings WHERE vec_id < 50
UNION ALL
SELECT vec_id, vec_id + 1000000, CAST(1.0 AS DOUBLE), 2
FROM embeddings WHERE vec_id < 50
ORDER BY query_id, rank
"""


def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode stage: Arrow-batched mapInPandas over opaque
    binary content. The codec stand-in is deterministic (byte length,
    sha256, mean byte value as fake luma), so DuckDB can recompute
    every output column from the same bytes — a FULL oracle over the
    Python batch plumbing (Arrow round-trip, schema, null handling).
    The ``decoded`` health flag (False = stand-in produced the output;
    this sandbox has no codec, so it is False on every row) is part of
    the hashed result, pinning the fallback-visibility contract."""
    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    return decode_image_meta(media).orderBy("media_id")


MM_DECODE_SQL = """
WITH b AS (
    SELECT doc_id AS media_id, text, encode(text) AS bb FROM documents
)
SELECT media_id,
       CAST(CASE WHEN text IS NULL THEN 0
                 ELSE octet_length(bb) END AS BIGINT) AS n_bytes,
       sha256(text) AS content_sha,
       CAST(CASE WHEN text IS NULL OR octet_length(bb) = 0 THEN 0
                 ELSE list_sum(list_transform(range(0, octet_length(bb)),
                          i -> CAST('0x' || substring(hex(bb), 2*i+1, 2) AS INT)))
                      // octet_length(bb) END AS BIGINT) AS fake_mean_luma,
       FALSE AS decoded
FROM b
ORDER BY media_id
"""


def p1_hychan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/W3/F5/X3: the HYCHAN.OUT section parser under the oracle
    gate — render a HYCHAN-shaped file from events (one section per
    user, one numeric row per event), parse it back with the real
    line-window parser, and let DuckDB recompute the expected relation
    (including the pinned trailing-section semantics: sections shorter
    than the FIRST section drop, longer ones truncate)."""
    import tempfile

    ev = (
        _events(spark, sf_dir, end="2024-01-06 00:00:00")
        .filter((F.col("user_id") < 6) & (F.col("ts") < F.lit("2024-01-06 00:00:00").cast("timestamp")))
        .select("user_id", "ts", "value")
    )
    rows = ev.orderBy("user_id", "ts").collect()  # small bounded slice
    path = tempfile.mktemp(prefix="hychan_", suffix=".txt")
    with open(path, "w") as f:
        last_uid, rn = None, 0
        for r in rows:
            if r.user_id != last_uid:
                f.write(
                    f"     CHANNEL HYDROGRAPH FOR ELEMENT NO:   {r.user_id + 1000}\n"
                )
                f.write("   TIME      ELEV\n")
                last_uid, rn = r.user_id, 0
            f.write(f"   {rn * 0.25:.2f}    {r.value:.3f}\n")
            rn += 1

    from curw_flo2d_data_manager_spark.sources.hychan import parse_hychan

    out = parse_hychan(spark, path, base_time="2024-01-01 00:00:00")
    return out.select(
        "element_no", "time", F.round("value", 3).alias("value")
    ).orderBy("element_no", "time")


P1_SQL = """
WITH ev AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    WHERE user_id < 6 AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-06 00:00:00'
),
numbered AS (
    SELECT user_id + 1000 AS element,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS rn,
           ROUND(value, 3) AS value,
           COUNT(*) OVER (PARTITION BY user_id) AS sec_len
    FROM ev
),
c0 AS (SELECT sec_len AS series_length FROM numbered ORDER BY element LIMIT 1)
SELECT CAST(element AS VARCHAR) AS element_no,
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 SECOND * CAST(rn * 0.25 * 3600 AS BIGINT) AS time,
       value
FROM numbered, c0
WHERE sec_len >= series_length AND rn < series_length
ORDER BY element_no, time
"""


def p2_timdep_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/J8: the TIMDEP.OUT block parser under the oracle gate —
    render a TIMDEP-shaped file from events (one block per hour, one
    cell row per user seen that hour), parse it back, and let DuckDB
    recompute the expected densified relation (every known cell × every
    block, NULL where the block lacks the cell)."""
    import tempfile

    ev = (
        _events(spark, sf_dir, end="2024-01-03 00:00:00")
        .filter((F.col("user_id") < 8) & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp")))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "user_id")
        .agg(F.round(F.sum("value"), 3).alias("v"))
    )
    rows = ev.orderBy("hour", "user_id").collect()  # small bounded slice
    base = rows[0].hour if rows else None
    path = tempfile.mktemp(prefix="timdep_", suffix=".txt")
    with open(path, "w") as f:
        last_hour = None
        for r in rows:
            if r.hour != last_hour:
                hours = (r.hour - base).total_seconds() / 3600.0
                f.write(f"   {hours:.2f}\n")
                last_hour = r.hour
            # cell row: col 1 = cell id, col 6 = value (TIMDEP shape)
            f.write(f"  {r.user_id + 500}  0  0  0  0  {r.v:.3f}\n")

    from curw_flo2d_data_manager_spark.sources.timdep import parse_timdep

    cells = spark.createDataFrame(
        [(str(u + 500),) for u in range(8)], "cell_id string"
    )
    out = parse_timdep(
        spark, path, base_time=base.strftime("%Y-%m-%d %H:%M:%S"), cells=cells
    )
    return out.select(
        "cell_id", "time", F.round("value", 3).alias("value")
    ).orderBy("cell_id", "time")


P2_SQL = """
WITH ev AS (
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour,
           user_id + 500 AS cell, ROUND(SUM(value), 3) AS v
    FROM events
    WHERE user_id < 8 AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00'
    GROUP BY 1, 2
),
blocks AS (SELECT DISTINCT hour FROM ev),
cells AS (SELECT unnest(range(500, 508)) AS cell)
SELECT CAST(c.cell AS VARCHAR) AS cell_id, b.hour AS time, e.v AS value
FROM blocks b CROSS JOIN cells c
LEFT JOIN ev e ON e.hour = b.hour AND e.cell = c.cell
ORDER BY cell_id, time
"""


def k5_chan_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5/S7/J4/F7: the CHAN.DAT body pipeline — body pairs ⋈
    initial-conditions ⋈ first-observed-value with the reference's
    exact 4-branch default fallback, rendered ljust/rjust(6)."""
    from curw_flo2d_data_manager_spark.plans.chan import chan_lines

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 20)
    pairs = part.select(
        F.col("p_partkey").cast("long").alias("pair_idx"),
        (F.col("p_partkey") * 2).cast("string").alias("up_cell"),
        F.col("p_size").cast("string").alias("up_default"),
        (F.col("p_partkey") * 2 + 1).cast("string").alias("dwn_cell"),
        (F.col("p_size") + 1).cast("string").alias("dwn_default"),
    )
    ics = part.select(
        F.concat_ws(
            "_", F.lit("m"), (F.col("p_partkey") * 2).cast("string"),
            (F.col("p_partkey") * 2 + 1).cast("string"),
        ).alias("grid_id"),
        F.when(F.col("p_partkey") % 3 != 0, (F.col("p_partkey") % 10).cast("string"))
        .alias("up_obs_id"),
        F.when(F.col("p_partkey") % 2 != 0, ((F.col("p_partkey") + 1) % 10).cast("string"))
        .alias("dwn_obs_id"),
    )
    obs = (
        _events(spark, sf_dir, "2024-01-02 00:00:00", "2024-01-02 02:00:00")
        .filter(F.col("user_id") < 10)
        .select(
            F.col("user_id").cast("string").alias("id"),
            F.col("ts").alias("time"),
            F.round("value", 2).alias("value"),
        )
    )
    return chan_lines(pairs, ics, obs, "m", "2024-01-02 00:00:00").orderBy(
        "block_rank", "intra_rank"
    )


K5_SQL = """
WITH pairs AS (
    SELECT p_partkey AS pair_idx,
           CAST(p_partkey * 2 AS VARCHAR) AS up_cell,
           CAST(p_size AS VARCHAR) AS up_default,
           CAST(p_partkey * 2 + 1 AS VARCHAR) AS dwn_cell,
           CAST(p_size + 1 AS VARCHAR) AS dwn_default,
           CASE WHEN p_partkey % 3 != 0 THEN CAST(p_partkey % 10 AS VARCHAR) END AS up_obs_id,
           CASE WHEN p_partkey % 2 != 0 THEN CAST((p_partkey + 1) % 10 AS VARCHAR) END AS dwn_obs_id
    FROM part WHERE p_partkey <= 20
),
fv AS (
    SELECT CAST(user_id AS VARCHAR) AS id, arg_min(ROUND(value, 2), ts) AS wl
    FROM events
    WHERE user_id < 10
      AND CAST(ts AS TIMESTAMP) BETWEEN TIMESTAMP '2024-01-02 00:00:00'
                                    AND TIMESTAMP '2024-01-02 02:00:00'
    GROUP BY 1
),
resolved AS (
    SELECT p.*, u.wl AS up_wl, d.wl AS dwn_wl
    FROM pairs p
    LEFT JOIN fv u ON p.up_obs_id = u.id
    LEFT JOIN fv d ON p.dwn_obs_id = d.id
),
rendered AS (
    SELECT pair_idx,
           CASE WHEN up_wl IS NOT NULL THEN CAST(up_wl AS VARCHAR) ELSE up_default END AS up_out,
           CASE WHEN dwn_obs_id IS NULL THEN
                    CASE WHEN up_wl IS NOT NULL THEN CAST(up_wl AS VARCHAR) ELSE dwn_default END
                WHEN dwn_wl IS NOT NULL THEN CAST(dwn_wl AS VARCHAR)
                ELSE dwn_default END AS dwn_out,
           up_cell, dwn_cell
    FROM resolved
)
SELECT 1 AS block_rank, CAST(pair_idx * 2 AS BIGINT) AS intra_rank,
       rpad(up_cell, 6, ' ') || lpad(up_out, 6, ' ') AS line
FROM rendered
UNION ALL
SELECT 1, CAST(pair_idx * 2 + 1 AS BIGINT),
       rpad(dwn_cell, 6, ' ') || lpad(dwn_out, 6, ' ')
FROM rendered
"""


def _run_replay_stream(
    spark, src: str, build, name_prefix: str, mode: str, schema=None
) -> str:
    """Run ``build(read_series_stream(src))`` into a memory sink and
    tear the replay dir down afterwards.

    The memory sink materializes results driver-side, so the parquet
    replay source and the query's checkpoint (placed under ``src`` so
    one rmtree catches both) can be removed as soon as the query stops
    — previously every correctness run leaked a ``stream_*_src_`` dir
    plus checkpoint state in /tmp (round-2 advice). Returns the memory
    table name."""
    import os
    import shutil
    import uuid

    from curw_flo2d_data_manager_spark.streaming import read_series_stream

    name = name_prefix + uuid.uuid4().hex[:8]
    kwargs = {"schema": schema} if schema is not None else {}
    try:
        q = (
            build(read_series_stream(spark, src, **kwargs))
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(src, "_chk"))
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return name


def stream_resample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming A2: one day of events replayed through a file-source
    stream → watermarked right-closed resample — results must equal the
    batch/DuckDB answer bucket-for-bucket (same grid expression)."""
    import tempfile

    ev = _events(spark, sf_dir, end="2024-01-03 00:00:00").filter(
        F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    src = tempfile.mkdtemp(prefix="stream_src_")
    ev.select(
        F.lit("events").alias("id"), F.col("ts").alias("time"), "value"
    ).coalesce(1).write.mode("overwrite").parquet(src)  # one file → one
    # micro-batch → exactly one (final) update row per bucket in the sink

    from curw_flo2d_data_manager_spark.streaming import streaming_resample_sum

    name = _run_replay_stream(
        spark, src, lambda s: streaming_resample_sum(s, 15),
        "stream_resample_", "update",
    )
    return spark.table(name).select(
        "time", F.round("value", 4).alias("value")
    ).orderBy("time")


# identical to the batch A2 oracle over the same slice — the streaming
# path must not change the answer
STREAM_A2_SQL = A2_SQL


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: one day of events is written to
    the stream source TRIPLED (an at-least-once ingest), replayed
    through ``dropDuplicatesWithinWatermark`` keyed on the event id,
    and must come out exactly once per event — DuckDB's DISTINCT over
    the same slice is the oracle."""
    import tempfile

    ev = _events(spark, sf_dir, end="2024-01-02 00:00:00").filter(
        F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp")
    )
    rows = ev.select(
        F.col("event_id").cast("string").alias("id"),
        F.col("ts").alias("time"),
        "value",
    )
    tripled = rows.unionAll(rows).unionAll(rows)
    src = tempfile.mkdtemp(prefix="stream_dedup_src_")
    tripled.coalesce(1).write.mode("overwrite").parquet(src)

    from curw_flo2d_data_manager_spark.streaming import streaming_dedup

    name = _run_replay_stream(
        spark, src, lambda s: streaming_dedup(s, ["id"]),
        "stream_dedup_", "append",
    )
    return (
        spark.table(name)
        .select(
            F.col("id").cast("long").alias("event_id"),
            "time",
            F.round("value", 4).alias("value"),
        )
        .orderBy("event_id")
    )


STREAM_DEDUP_SQL = """
SELECT DISTINCT event_id, CAST(ts AS TIMESTAMP) AS time,
       ROUND(value, 4) AS value
FROM events
WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-02 00:00:00'
ORDER BY event_id
"""


def stream_cumsum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming A4: the applyInPandasWithState running total replayed
    over a file stream must equal the batch window cumsum. Rows are
    keyed by a unique synthetic event-time (from event_id) so the
    in-state sort order is deterministic."""
    import tempfile

    ev = (
        _events(spark, sf_dir, end="2024-01-10 00:00:00")
        .filter(
            (F.col("user_id") < 20)
            & (F.col("ts") < F.lit("2024-01-10 00:00:00").cast("timestamp"))
        )
        .select(
            F.col("user_id").cast("string").alias("id"),
            F.timestamp_micros(F.col("event_id")).alias("time"),
            F.round("value", 4).alias("value"),
        )
    )
    src = tempfile.mkdtemp(prefix="stream_cum_src_")
    ev.coalesce(1).write.mode("overwrite").parquet(src)  # one micro-batch

    from curw_flo2d_data_manager_spark.streaming import streaming_cumulative_sum

    name = _run_replay_stream(
        spark, src, streaming_cumulative_sum, "stream_cumsum_", "append"
    )
    return (
        spark.table(name)
        .select(
            "id",
            F.unix_micros("time").alias("event_id"),
            F.round("cum_value", 4).alias("cum_value"),
        )
        .orderBy("id", "event_id")
    )


STREAM_CUMSUM_SQL = """
SELECT CAST(user_id AS VARCHAR) AS id, event_id,
       ROUND(SUM(ROUND(value, 4)) OVER (PARTITION BY user_id ORDER BY event_id
                                        ROWS UNBOUNDED PRECEDING), 4) AS cum_value
FROM events
WHERE user_id < 20 AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-10 00:00:00'
ORDER BY id, event_id
"""


def stream_session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows: two days of per-user events replayed
    through a file stream → watermarked ``session_window`` sum. The
    streamed (watermark-closed, append-mode) sessions must match the
    batch gap-sessionization oracle (a gap of exactly 30 min starts a
    new session on both paths)."""
    import tempfile

    ev = _events(spark, sf_dir, end="2024-01-03 00:00:00").filter(
        F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    src = tempfile.mkdtemp(prefix="stream_sess_src_")
    rows = ev.select(
        F.col("user_id").cast("string").alias("id"),
        F.col("ts").alias("time"),
        "value",
    )
    # Session aggregation only supports APPEND output (sessions emit
    # once the watermark proves they can't grow). A sentinel event per
    # key, one day past the slice, pushes the watermark beyond every
    # real session; the sentinels' own sessions stay open and unemitted.
    sentinels = rows.select("id").distinct().select(
        "id",
        F.lit("2024-01-04 00:00:00").cast("timestamp").alias("time"),
        F.lit(0.0).alias("value"),
    )
    rows.unionByName(sentinels).coalesce(1).write.mode("overwrite").parquet(src)

    from curw_flo2d_data_manager_spark.streaming import streaming_session_sum

    name = _run_replay_stream(
        spark, src,
        lambda s: streaming_session_sum(s, gap="30 minutes", group_cols=["id"]),
        "stream_sess_", "append",
    )
    return (
        spark.table(name)
        .filter(
            F.col("session_start")
            < F.lit("2024-01-03 00:00:00").cast("timestamp")
        )
        .select(
            F.col("id").cast("long").alias("user_id"),
            "session_start",
            "n_events",
            F.round("value", 4).alias("session_value"),
        )
        .orderBy("user_id", "session_start")
    )


STREAM_SESSION_SQL = """
WITH ev AS (
  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts
  FROM events
  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00'),
lagged AS (
  SELECT user_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM ev),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1
              ELSE 0 END AS is_new
  FROM lagged),
sessioned AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS session_value
FROM sessioned
GROUP BY user_id, session_seq
ORDER BY user_id, session_start
"""


def o2_ordered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3: deterministic global order + limit."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "o_orderdate")
        .limit(25)
    )


O2_SQL = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


# =====================================================================
# Beyond-parity: dedup / similarity / text analysis / multimodal
# =====================================================================

def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest (hash-groupBy)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        exact_dedup(docs, ["text"], "doc_id")
        .select("key_hash", "kept_id", "n_dups")
        .orderBy("kept_id")
    )


DEDUP_EXACT_SQL = """
SELECT sha256(text) AS key_hash, MIN(doc_id) AS kept_id, COUNT(*) AS n_dups
FROM documents
GROUP BY sha256(text)
ORDER BY kept_id
"""


def dedup_fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint dedup: sha256 of the sorted distinct normalized
    word set — groups word-order-permuted near-duplicates."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", fingerprint("text"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("kept_id"), F.count(F.lit(1)).alias("n_dups"))
        .orderBy("kept_id")
    )


DEDUP_FP_SQL = """
SELECT sha256(array_to_string(list_sort(list_distinct(
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+')
       )), ' ')) AS fp,
       MIN(doc_id) AS kept_id, COUNT(*) AS n_dups
FROM documents
GROUP BY 1
ORDER BY kept_id
"""


def dedup_winnowing_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing fingerprints (k=5 char-grams, window=4):
    per-document fingerprint-set stats — count + min/max selected
    hash — hash-checking the whole rolling-hash → windowed-min →
    distinct pipeline against a DuckDB recomputation. The operator's
    guarantee (docs sharing a ≥ k+w-1 substring share a fingerprint)
    is pinned separately in tests with planted near-copies."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        with_winnow_fingerprints,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        with_winnow_fingerprints(docs, "text", "fps", k=5, window=4)
        .select(
            "doc_id",
            F.size("fps").alias("n_fps"),
            F.element_at("fps", 1).alias("fp_min"),
            F.element_at("fps", -1).alias("fp_max"),
        )
        .orderBy("doc_id")
    )


DEDUP_WINNOW_SQL = r"""
WITH g AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')) AS norm
    FROM documents
),
h AS (
    SELECT doc_id,
           list_transform(
               range(1, greatest(length(norm) - 5 + 1, 0) + 1),
               i -> CAST(('0x' || substring(md5(substring(norm, i, 5)), 1, 8)) AS BIGINT)
           ) AS hashes
    FROM g
),
sel AS (
    SELECT doc_id,
           CASE WHEN len(hashes) - 4 + 1 >= 1 THEN
                list_sort(list_distinct(list_transform(
                    range(1, len(hashes) - 4 + 2),
                    j -> list_aggregate(hashes[j:j+3], 'min'))))
                WHEN len(hashes) > 0 THEN [list_aggregate(hashes, 'min')]
                ELSE CAST([] AS BIGINT[]) END AS fps
    FROM h
)
SELECT doc_id, len(fps) AS n_fps, fps[1] AS fp_min, fps[-1] AS fp_max
FROM sel
ORDER BY doc_id
"""


def dedup_winnow_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-copy pair detection over documents: pairs
    sharing ≥ 3 selected fingerprints — catches shared PASSAGES that
    whole-document signatures dilute. k=16 char-grams (MOSS-scale
    noise floor: k=5 marks ~every doc pair related on this corpus;
    k=16/w=8/min_shared=3 keeps 174 of 124,750 possible pairs at
    sf0.01). FULL oracle: DuckDB recomputes the fingerprint sets and
    the self-join exactly."""
    from curw_flo2d_data_manager_spark.operators.dedup import winnow_pairs

    docs = _t(spark, sf_dir, "documents")
    return (
        winnow_pairs(docs, "doc_id", k=16, window=8, min_shared=3)
        .orderBy("id_a", "id_b")
    )


DEDUP_WINNOW_PAIRS_SQL = r"""
WITH g AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')) AS norm
    FROM documents
),
h AS (
    SELECT doc_id,
           list_transform(
               range(1, greatest(length(norm) - 16 + 1, 0) + 1),
               i -> CAST(('0x' || substring(md5(substring(norm, i, 16)), 1, 8)) AS BIGINT)
           ) AS hashes
    FROM g
),
sel AS (
    SELECT doc_id,
           CASE WHEN len(hashes) - 8 + 1 >= 1 THEN
                list_distinct(list_transform(
                    range(1, len(hashes) - 8 + 2),
                    j -> list_aggregate(hashes[j:j+7], 'min')))
                WHEN len(hashes) > 0 THEN [list_aggregate(hashes, 'min')]
                ELSE CAST([] AS BIGINT[]) END AS fps
    FROM h
),
fp AS (SELECT doc_id, unnest(fps) AS fp FROM sel)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fps
FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
ORDER BY id_a, id_b
"""


def dedup_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination gate: every 50th document plays the
    held-out benchmark; training documents sharing any word 3-gram
    with it are flagged with their distinct-overlap count (the
    eval-leakage guard of pre-training pipelines, n kept small because
    the synthetic docs are short)."""
    from curw_flo2d_data_manager_spark.operators.dedup import (
        ngram_contamination,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return (
        ngram_contamination(train, bench, "doc_id", "text", n=3)
        .orderBy("train_id")
    )


DEDUP_CONTAM_SQL = """
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS w
    FROM documents
),
g AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(w) >= 3
                THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
                ELSE [array_to_string(w, ' ')] END) AS grams
    FROM w
),
bg AS (SELECT DISTINCT unnest(grams) AS gm FROM g WHERE doc_id % 50 = 0),
tg AS (SELECT doc_id, unnest(grams) AS gm FROM g WHERE doc_id % 50 <> 0)
SELECT tg.doc_id AS train_id, COUNT(DISTINCT gm) AS n_hits
FROM tg JOIN bg USING (gm)
GROUP BY 1
ORDER BY train_id
"""


def dedup_ngram_jaccard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise 3-gram Jaccard within same-source blocks."""
    docs = _t(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(docs, "doc_id", "text", block_col="source", n=3, threshold=0.01)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


DEDUP_JACCARD_SQL = """
WITH sh AS (
    SELECT doc_id, source,
           list_distinct(CASE WHEN len(w) >= 3
                THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
                ELSE [array_to_string(w, ' ')] END) AS grams
    FROM (
        SELECT doc_id, source,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS w
        FROM documents
    )
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.01
ORDER BY id_a, id_b
"""


def dedup_minhash_lsh_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with a FULL oracle: plant one verbatim copy of every
    document (identical shingle set → identical signature → every band
    collides), run banded LSH + exact-Jaccard verify at threshold 1.0.
    The true jaccard-1 pair set is exactly {pairs with identical
    shingle sets} — all planted pairs plus any organic identical-text
    groups — which DuckDB reproduces by grouping on the sorted
    shingle-set fingerprint. A missed band bucket, a broken signature,
    or a verify bug each breaks the hash match. Copies are planted for
    every 4th document (the oracle recomputes the exact pair set for
    any planted subset), and the gate runs 16 hashes × 4 bands — the
    identical-set guarantee is signature-width independent, so the
    narrower signature only cuts cold codegen + scan cost; operator
    defaults stay 32×8 for organic-similarity recall."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    return (
        minhash_lsh_pairs(
            corpus, "doc_id", "text", num_hashes=16, bands=4, jaccard_threshold=1.0
        )
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    )


DEDUP_MINHASH_SQL = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 4 = 0
),
sh AS (
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE [array_to_string(w, ' ')] END)), chr(31)) AS key
    FROM (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS w
        FROM corpus
    )
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM sh a JOIN sh b ON a.key = b.key AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
"""


def dedup_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding with a planted-recall oracle (the sim_lsh_pairs
    construction): every document gets one verbatim copy — identical
    word multiset → identical 64-bit signature → all four 16-bit bands
    collide → Hamming 0. The query keeps only original↔own-copy pairs
    (organic near-dup pairs are hash-dependent and engine-specific),
    so the oracle is exactly one row per planted document (every 4th;
    losing ANY planted pair — a banding or popcount bug — breaks the
    hash match)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    return (
        simhash_near_pairs(corpus, "doc_id", "text", max_hamming=0)
        .filter(F.col("id_b") == F.col("id_a") + 1_000_000)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


DEDUP_SIMHASH_SQL = """
SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, 0 AS hamming
FROM documents WHERE doc_id % 4 = 0
ORDER BY id_a, id_b
"""


def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: first 5 vectors as queries over the
    full corpus (the exact ANN baseline)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, queries, k=10)
    return out.select(
        "query_id", "corpus_id", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


SIM_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
    SELECT q.query_id, e.vec_id AS corpus_id,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS cosine
    FROM embeddings e CROSS JOIN q
),
ranked AS (
    SELECT query_id, corpus_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank
    FROM scored
)
SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


def sim_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs by cosine threshold within label
    blocks (embedding-cosine near-dup operator)."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        cosine_dedup_pairs(emb, threshold=0.3, block_col="label")
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


SIM_DEDUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.3
ORDER BY id_a, id_b
"""


def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace words + BPE-ish regex tokens."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            whitespace_token_count("text").alias("n_words"),
            regex_token_count("text").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


TEXT_TOKENS_SQL = """
SELECT doc_id,
       CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) = ''
            THEN 0
            ELSE len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+'))
       END AS n_words,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens
FROM documents
ORDER BY doc_id
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics per doc: punctuation + stopword ratios."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(punctuation_ratio("text"), 6).alias("punct_ratio"),
        F.round(stopword_ratio("text"), 6).alias("stopword_ratio"),
    ).orderBy("doc_id")


TEXT_QUALITY_SQL = """
SELECT doc_id,
       ROUND(CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
             / greatest(length(text), 1), 6) AS punct_ratio,
       ROUND(CAST(len(list_filter(
                 string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+'),
                 x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x)
             )) AS DOUBLE)
             / greatest(CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) = ''
                             THEN 0
                             ELSE len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+'))
                        END, 1), 6) AS stopword_ratio
FROM documents
ORDER BY doc_id
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the labeled lang column: confusion
    counts per (lang, pred_lang)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("_w", words("text"))
        .withColumn("pred_lang", lang_id(F.col("_w"), tokenized=True))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


def _lang_score_sql(lang: str) -> str:
    markers = ",".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        "len(list_filter(string_split_regex(trim(regexp_replace(lower(text), "
        "'[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+'), "
        f"x -> list_contains([{markers}], x)))"
    )


def _text_lang_sql() -> str:
    """Generate the oracle from LANG_MARKERS itself (single source of
    truth, like the PII patterns): score columns and the
    first-max-wins CASE are emitted in dict order, matching
    lang_id's strictly-greater tie-break exactly."""
    langs = list(LANG_MARKERS)
    scores = ",\n           ".join(
        f"{_lang_score_sql(lang)} AS s_{lang}" for lang in langs
    )
    gmax = f"greatest({', '.join(f's_{lang}' for lang in langs)})"
    case = "\n                ".join(
        f"WHEN s_{lang} = {gmax} THEN '{lang}'" for lang in langs[:-1]
    )
    return f"""
WITH scored AS (
    SELECT lang,
           {scores}
    FROM documents
),
pred AS (
    SELECT lang,
           CASE WHEN {gmax} = 0 THEN 'unknown'
                {case}
                ELSE '{langs[-1]}' END AS pred_lang
    FROM scored
)
SELECT lang, pred_lang, COUNT(*) AS n
FROM pred
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
"""


TEXT_LANG_SQL = _text_lang_sql()


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata scan: opaque binary column (utf8 bytes of
    text stand in for a media blob) → byte length + content digest,
    computed without any Python decode."""
    docs = _t(spark, sf_dir, "documents")
    bin_col = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.length(bin_col).cast("long").alias("n_bytes"),
        F.sha2(bin_col, 256).alias("content_sha"),
    ).orderBy("doc_id")


MM_BINARY_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS content_sha
FROM documents
ORDER BY doc_id
"""


# =====================================================================
# Analytics breadth — further TPC-H shapes, window frames, pivot,
# percentiles, sessionization (engine extensions beyond the
# reference's own surface; SURVEY §2.5 note + §7 step 8)
# =====================================================================

def q2_min_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape adapted to the trimmed schema (no partsupp):
    for each LARGE mid-size part, the minimum-acctbal supplier that
    shipped it. The correlated scalar-min subquery decorrelates to a
    groupBy + join-back — Catalyst broadcasts the tiny aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    supp = _t(spark, sf_dir, "supplier")
    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal")
        .distinct()
    )
    min_bal = shipped.groupBy("p_partkey").agg(F.min("s_acctbal").alias("mb"))
    return (
        shipped.join(F.broadcast(min_bal), "p_partkey")
        .filter(F.col("s_acctbal") == F.col("mb"))
        .select(
            "p_partkey", "p_brand", "s_name", F.round("mb", 2).alias("min_bal")
        )
        .orderBy("p_partkey", "s_name")
    )


Q2_SQL = """
WITH shipped AS (
  SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name, s_acctbal
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE')
SELECT p_partkey, p_brand, s_name, ROUND(s_acctbal, 2) AS min_bal
FROM shipped s1
WHERE s_acctbal = (SELECT min(s2.s_acctbal) FROM shipped s2
                   WHERE s2.p_partkey = s1.p_partkey)
ORDER BY p_partkey, s_name
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between two nation pairs by ship year
    (two aliased broadcast dim joins on one fact scan)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20
    (fact-fact join + broadcast dims + ordered LIMIT)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q12_priority_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape adapted (no l_shipmode column): conditional
    CASE-WHEN counts of high/low order priorities per ship year."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


Q12_SQL = """
SELECT year(l_shipdate) AS ship_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY ship_year
ORDER BY ship_year
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: count-of-counts distribution over a left outer
    join (customers with zero orders must appear as c_count = 0)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregate
    over a join, one scalar output row."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-06-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-06-01'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier with max 3-month revenue (aggregate →
    scalar-max selection, expressed as a rank-1 window)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_rev"
            )
        )
    )
    w = Window.orderBy(F.desc("total_rev"), "l_suppkey")
    top = rev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        top.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.round("total_rev", 2).alias("total_rev")
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, ROUND(total_rev, 2) AS total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
QUALIFY ROW_NUMBER() OVER (ORDER BY total_rev DESC, l_suppkey) = 1
ORDER BY s_suppkey
"""


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape adapted (no partsupp): distinct suppliers per
    part attribute class, excluding negative-balance suppliers via a
    broadcast anti-join (NOT IN without the NULL trap)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    clauses — exercises OR-predicate pushdown through a join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(clause).agg(
        F.round(
            F.coalesce(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                F.lit(0.0),
            ),
            2,
        ).alias("revenue")
    )


Q19_SQL = """
SELECT ROUND(COALESCE(SUM(l_extendedprice * (1 - l_discount)), 0.0), 2)
       AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders (scalar-avg subquery + anti-join), grouped by segment."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — a 6-table star join
    (lineitem→orders→customer→nation→region + part + supplier→nation)
    with a conditional-share aggregate per order year. All dims
    broadcast; the only shuffle is the final year rollup."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nat_c = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    nat_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat_c), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat_s), F.col("s_nationkey") == F.col("sn_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        # exact decimal sums (order-independent), then one double
        # division — both engines divide identical doubles
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol)
                    .otherwise(0.0)
                    .cast("decimal(30,6)")
                ).cast("double")
                / F.sum(vol.cast("decimal(30,6)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       ROUND(CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
                                THEN l_extendedprice * (1 - l_discount)
                                ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(30,6))) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape adapted (no partsupp, so profit = discounted
    revenue): per supplier-nation per order-year revenue on parts whose
    name matches a pattern — pattern filter pushed to the broadcast
    part dim, year derived from the orders join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        # decimal sum: double addition is order-dependent and Spark's
        # partial-agg combine order is not deterministic — a borderline
        # cent (observed: one group off by 0.01 vs DuckDB) would flake
        # the hash gate. Per-row double→decimal cast is identical on
        # both engines; decimal addition is exact.
        .agg(
            F.round(F.sum(vol.cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2)
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


def q11_important_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape adapted (no partsupp, value = discounted
    revenue): parts whose revenue exceeds 1.2× the average per-part
    revenue — the scalar subquery becomes a 1-row broadcast cross
    join, so the threshold rides to every task without a collect.
    The comparison is cross-multiplied over exact decimal sums
    (value·n·10 > total·12): no division, no double rounding, so a
    borderline part can't flip between engines or runs."""
    li = _t(spark, sf_dir, "lineitem")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(vol).alias("value_dec"))
    total = per_part.agg(
        F.sum("value_dec").alias("tot"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec") * F.col("n_parts") * 10 > F.col("tot") * 12
        )
        .select(
            "l_partkey",
            F.round("value_dec", 2).cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


Q11_SQL = """
WITH pv AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS value_dec
    FROM lineitem
    GROUP BY l_partkey
)
SELECT l_partkey, CAST(ROUND(value_dec, 2) AS DOUBLE) AS value
FROM pv
WHERE value_dec * (SELECT COUNT(*) FROM pv) * 10 > (SELECT SUM(value_dec) FROM pv) * 12
ORDER BY value DESC, l_partkey
"""


def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape adapted (no partsupp): suppliers who shipped
    more than a threshold quantity of pattern-matched parts in one
    year — an aggregated subquery driving a semi-join into the
    supplier dim (threshold 300 ≈ the median per-supplier quantity,
    so the semi-join is genuinely selective)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    heavy = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        # decimal sum so a supplier exactly at the threshold can't
        # flip with double addition order
        .agg(F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("qty"))
        .filter(F.col("qty") > 300.0)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > 300.0
)
ORDER BY s_suppkey
"""


def q21_exclusive_failures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted (no commit/receipt dates, so 'failed
    delivery' = returnflag R): suppliers with a returned lineitem in a
    multi-supplier order where NO other supplier in that order also
    returned — the Q21 EXISTS (another supplier shipped) + NOT EXISTS
    (another supplier failed) correlated self-join pair, expressed as
    a semi-join then an anti-join on the deduplicated
    (order, supplier) relation."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    failed = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = pairs.select(
        F.col("l_orderkey").alias("o_orderkey2"),
        F.col("l_suppkey").alias("o_suppkey2"),
    )
    failed_others = failed.select(
        F.col("l_orderkey").alias("f_orderkey2"),
        F.col("l_suppkey").alias("f_suppkey2"),
    )
    cand = failed.join(
        others,
        (F.col("l_orderkey") == F.col("o_orderkey2"))
        & (F.col("l_suppkey") != F.col("o_suppkey2")),
        "left_semi",
    ).join(
        failed_others,
        (F.col("l_orderkey") == F.col("f_orderkey2"))
        & (F.col("l_suppkey") != F.col("f_suppkey2")),
        "left_anti",
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        cand.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
failed AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
           WHERE l_returnflag = 'R'),
cand AS (
    SELECT f.l_orderkey, f.l_suppkey
    FROM failed f
    WHERE EXISTS (SELECT 1 FROM pairs p
                  WHERE p.l_orderkey = f.l_orderkey
                    AND p.l_suppkey <> f.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM failed f2
                      WHERE f2.l_orderkey = f.l_orderkey
                        AND f2.l_suppkey <> f.l_suppkey)
)
SELECT s_name, COUNT(*) AS numwait
FROM cand JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def w_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-bounded sliding window: 4-row moving average of event
    values per user (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), with a
    unique-id tiebreak so lag/frame order is deterministic."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("mov_avg"),
    ).orderBy("event_id")


W_MOVAVG_SQL = """
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
             4) AS mov_avg
FROM events
ORDER BY event_id
"""


def w_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (batch twin of session_window): 30-min
    inactivity gap per user, aggregated to per-session stats."""
    from curw_flo2d_data_manager_spark.operators.sessionize import sessionize

    ev = _events(spark, sf_dir)
    sess = sessionize(
        ev,
        ts_col="ts",
        key_cols=["user_id"],
        gap_seconds=1800.0,
        tiebreak_cols=["event_id"],
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


W_SESSION_SQL = """
WITH lagged AS (
  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
         LAG(CAST(ts AS TIMESTAMP)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1
              ELSE 0 END AS is_new
  FROM lagged),
sessioned AS (
  SELECT user_id, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_seq
  FROM flagged)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS session_value
FROM sessioned
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def a_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping levels in
    one pass (map-side partials expand grouping-set rows — one
    shuffle, not four scans). Quantity sums are integer-valued so the
    cross-engine hash is exact."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


A_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) of quantity per
    return flag — Spark ``percentile`` and DuckDB ``quantile_cont``
    share the (n-1)·p linear-interpolation definition."""
    li = _t(spark, sf_dir, "lineitem")

    def pct(p: float, name: str):
        return F.round(F.expr(f"percentile(l_quantity, {p})"), 6).alias(name)

    return (
        li.groupBy("l_returnflag")
        .agg(pct(0.25, "p25"), pct(0.5, "p50"), pct(0.75, "p75"), pct(0.9, "p90"))
        .orderBy("l_returnflag")
    )


A_PCT_SQL = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
       ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75,
       ROUND(quantile_cont(l_quantity, 0.90), 6) AS p90
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def x_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long → wide: per-user value sums by event type. The pivot
    value list is given explicitly so Spark skips the extra distinct
    job (mandatory at 100 TB — never let pivot scan for its columns)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.round(F.sum("value"), 4))
        .orderBy("user_id")
    )


X_PIVOT_SQL = """
SELECT user_id,
       ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
       ROUND(SUM(CASE WHEN event_type = 'error' THEN value END), 4) AS error,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 4)
           AS purchase,
       ROUND(SUM(CASE WHEN event_type = 'signup' THEN value END), 4) AS signup,
       ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 4) AS view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def a_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` in batch mode (same gap-merge
    semantics the streaming path uses): 30-min inactivity sessions per
    user. Boundary: a gap of exactly 30 min starts a NEW session
    (windows are half-open, so touching windows don't merge)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


A_SESSION_WINDOW_SQL = """
WITH lagged AS (
  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
         LAG(CAST(ts AS TIMESTAMP)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1
              ELSE 0 END AS is_new
  FROM lagged),
sessioned AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS session_value
FROM sessioned
GROUP BY user_id, session_seq
ORDER BY user_id, session_start
"""


def u2_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations: first-two-days purchasers
    who also signed up vs those who didn't, tagged into one relation
    (windowed so both branches verify non-empty sets)."""
    ev = _events(spark, sf_dir, end="2024-01-02 23:59:59").filter(
        F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id")
    both = purchasers.intersect(signups).select(
        F.lit("both").alias("tag"), "user_id"
    )
    only_p = purchasers.subtract(signups).select(
        F.lit("only_purchase").alias("tag"), "user_id"
    )
    return both.unionByName(only_p).orderBy("tag", "user_id")


U2_SET_SQL = """
WITH ev AS (SELECT user_id, event_type FROM events
            WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00')
SELECT 'both' AS tag, user_id FROM (
  SELECT user_id FROM ev WHERE event_type = 'purchase'
  INTERSECT
  SELECT user_id FROM ev WHERE event_type = 'signup')
UNION ALL
SELECT 'only_purchase' AS tag, user_id FROM (
  SELECT user_id FROM ev WHERE event_type = 'purchase'
  EXCEPT
  SELECT user_id FROM ev WHERE event_type = 'signup')
ORDER BY tag, user_id
"""


def x_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long unpivot (melt) of lineitem measures for a keyed
    subset — the inverse of the pivot operator."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 997 == 0
    )
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "val",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "measure",
            F.round("val", 4).alias("val"),
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


X_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, measure, ROUND(val, 4) AS val
FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
         l_quantity AS val FROM lineitem WHERE l_orderkey % 997 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
  FROM lineitem WHERE l_orderkey % 997 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
  FROM lineitem WHERE l_orderkey % 997 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
  FROM lineitem WHERE l_orderkey % 997 = 0)
ORDER BY l_orderkey, l_linenumber, measure
"""


def dedup_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal latest-version dedup (the engine's `latest fgt`
    semantics — reference `update_latest_fgt`,
    output/extract_water_level.py:216-217): keep the newest event per
    (user, type) with a unique-id tiebreak, via rank-1 window."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.round("value", 4).alias("latest_value"),
        )
        .orderBy("user_id", "event_type")
    )


DEDUP_LATEST_SQL = """
SELECT user_id, event_type, event_id, ROUND(value, 4) AS latest_value
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id, event_type
"""


def a_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type, with a
    tolerance-band oracle: the HLL sketch value is engine-specific, so
    the certified output is the EXACT distinct count plus an integer
    flag asserting the estimate landed within ±5% of it (rsd 0.01 →
    well inside the band). The DuckDB oracle recomputes the exact
    count and asserts the same flag, turning the accuracy contract
    (previously pinned only in tests/test_plan_quality.py) into a
    hash-checked entry."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).cast("int").alias("within_5pct"),
        )
        .orderBy("event_type")
    )


A_APPROX_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       1 AS within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def a_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles (percentile_approx,
    accuracy=10000) per event type, tolerance-band certified like
    a_approx_distinct: the sketch value is engine-specific, so the
    output is the EXACT continuous percentile plus a flag asserting
    the estimate landed within 5% of the value range — wide enough to
    absorb the sketch's element-vs-interpolated definition gap on
    small groups, tight enough that a broken sketch fails; the
    accuracy contract itself is what hash-matches."""
    ev = _events(spark, sf_dir)
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95], 10000).alias("_ap"),
        F.expr("percentile(value, array(0.5, 0.95))").alias("_ex"),
        (F.max("value") - F.min("value")).alias("_span"),
    )
    return approx.select(
        "event_type",
        F.round(F.element_at("_ex", 1), 4).alias("exact_p50"),
        F.round(F.element_at("_ex", 2), 4).alias("exact_p95"),
        (
            (
                F.abs(F.element_at("_ap", 1) - F.element_at("_ex", 1))
                <= 0.05 * F.col("_span")
            )
            & (
                F.abs(F.element_at("_ap", 2) - F.element_at("_ex", 2))
                <= 0.05 * F.col("_span")
            )
        ).cast("int").alias("within_5pct_of_range"),
    ).orderBy("event_type")


A_APPROX_PCT_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS exact_p50,
       ROUND(quantile_cont(value, 0.95), 4) AS exact_p95,
       1 AS within_5pct_of_range
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def sim_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-dup search with a FULL oracle: plant one
    scaled copy of every embedding (cosine exactly 1 with its source;
    identical sign bits → every band matches), run banded LSH + exact
    cosine verify at 0.999. The true ≥0.999 pair set is exactly the
    planted pairs (max original-pair cosine is ≈0.5), so any missed
    candidate or verify bug breaks the hash match."""
    from curw_flo2d_data_manager_spark.operators.similarity import (
        hyperplane_lsh_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 1.2).alias(
            "embedding"
        ),
    )
    corpus = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).unionByName(planted)
    pairs = hyperplane_lsh_pairs(corpus, cosine_threshold=0.999)
    return pairs.select("id_a", "id_b").orderBy("id_a", "id_b")


SIM_LSH_SQL = """
SELECT vec_id AS id_a, vec_id + 1000000 AS id_b
FROM embeddings
ORDER BY id_a, id_b
"""


def f_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% document sample by content-hash bucket —
    reproducible across runs AND engines (md5 hex compared
    lexicographically; `df.sample` can guarantee neither)."""
    from curw_flo2d_data_manager_spark.operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return (
        hash_sample(docs, ["doc_id"], 0.10, salt="r1")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


F_SAMPLE_SQL = """
SELECT doc_id, source, n_chars
FROM documents
WHERE substr(md5(concat(CAST(doc_id AS VARCHAR), 'r1')), 1, 8) < '19999999'
ORDER BY doc_id
"""


def f_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: keep every 'wiki' document,
    20% of 'web', 50% of everything else — the downsample-the-crawl /
    keep-the-curated shape of corpus construction."""
    from curw_flo2d_data_manager_spark.operators.sampling import (
        stratified_hash_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    out = stratified_hash_sample(
        docs,
        ["doc_id"],
        "source",
        {"wiki": 1.0, "web": 0.2},
        default_fraction=0.5,
        salt="r1",
    )
    return (
        out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


F_STRAT_SQL = """
SELECT source, COUNT(*) AS n_kept
FROM documents
WHERE substr(md5(concat(CAST(doc_id AS VARCHAR), 'r1')), 1, 8)
      < CASE source WHEN 'wiki' THEN 'g'
                    WHEN 'web' THEN '33333333'
                    ELSE '80000000' END
GROUP BY source
ORDER BY source
"""


def f_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Efraimidis–Spirakis weighted sample (A-Res): top
    100 documents by u^(1/w), u from the content hash, w = n_chars —
    longer documents proportionally more likely. The selected id set
    is engine-reproducible, so DuckDB recomputes the identical
    sample."""
    from curw_flo2d_data_manager_spark.operators.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    return (
        weighted_sample(docs, ["doc_id"], "n_chars", 100, salt="r4")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


F_WEIGHTED_SQL = """
SELECT doc_id, n_chars
FROM (
    SELECT doc_id, n_chars,
           pow((CAST(('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), 'r4')), 1, 8))
                     AS BIGINT) + 0.5) / 4294967296.0,
               1.0 / CAST(n_chars AS DOUBLE)) AS ares_key
    FROM documents
    WHERE n_chars > 0
    ORDER BY ares_key DESC, doc_id
    LIMIT 100
)
ORDER BY doc_id
"""


def f_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sequence packing of documents into
    2048-token bins (whitespace token counts, docs truncated at 512):
    per-bin fill stats. The parallel-prefix cumsum is recomputed by
    DuckDB as a plain window cumsum — identical bins prove the
    two-phase decomposition equals the sequential semantics."""
    from curw_flo2d_data_manager_spark.operators.packing import (
        bin_stats,
        pack_sequences,
    )
    from curw_flo2d_data_manager_spark.operators.textstats import (
        whitespace_token_count,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", whitespace_token_count("text").alias("n_ws")
    )
    packed = pack_sequences(
        docs, "doc_id", "n_ws", budget=2048, truncate_to=512
    )
    return bin_stats(packed, 2048).orderBy("bin_id")


F_PACK_SQL = """
WITH toks AS (
    SELECT doc_id,
           least(CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) = ''
                      THEN 0
                      ELSE len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+'))
                 END, 512) AS n_tokens
    FROM documents
),
pos AS (
    SELECT doc_id, n_tokens,
           COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
    FROM toks
)
SELECT CAST(start // 2048 AS BIGINT) AS bin_id,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       COUNT(*) AS n_docs,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / 2048, 4) AS utilization
FROM pos
GROUP BY 1
ORDER BY bin_id
"""


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a duplicate-pair graph (the step that
    turns LSH/SimHash/winnowing PAIRS into per-cluster canonical ids).

    The pair stream is built deterministically from documents so the
    oracle can replay it: chain links (d, d+1) for d%10<3 give 4-node
    paths, merge links (d, d+50) for d%25=0 stitch every 50th chain
    into one long component — multi-hop transitive closure that a
    single join cannot produce. Labels via alternating large-star /
    small-star contraction (operators/components.py); the oracle is a
    DuckDB recursive CTE propagating min-reachable-id to fixpoint.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    b = docs.select(F.col("doc_id").alias("dst_id"))
    chain = (
        docs.filter(F.col("doc_id") % 10 < 3)
        .join(b, F.col("dst_id") == F.col("doc_id") + 1)
        .select(F.col("doc_id").alias("id_a"), F.col("dst_id").alias("id_b"))
    )
    merge = (
        docs.filter(F.col("doc_id") % 25 == 0)
        .join(b, F.col("dst_id") == F.col("doc_id") + 50)
        .select(F.col("doc_id").alias("id_a"), F.col("dst_id").alias("id_b"))
    )
    pairs = chain.unionByName(merge)
    return connected_components(pairs).orderBy("id")


DEDUP_COMPONENTS_SQL = """
WITH RECURSIVE
e AS (
    SELECT a.doc_id AS src, b.doc_id AS dst
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE a.doc_id % 10 < 3
    UNION ALL
    SELECT a.doc_id, b.doc_id
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 50
    WHERE a.doc_id % 25 = 0
),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
reach(id, lab) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT s.dst, r.lab FROM reach r JOIN sym s ON s.src = r.id
)
SELECT id, MIN(lab) AS component
FROM reach GROUP BY id ORDER BY id
"""


def dedup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup with planted copies: every 4th
    document gets a verbatim copy (doc_id + 1,000,000); first-
    occurrence-wins means every copy passage must be dropped and every
    original kept (organic 8-word collisions don't exist in this
    corpus, so the oracle is exact). Output is the per-document
    retention summary a pipeline would filter on.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    p = passage_dedup(corpus, "doc_id", "text", passage_words=8)
    return (
        p.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept_passages"),
            F.sum(F.when(F.col("keep"), F.col("n_words")).otherwise(0)).alias(
                "kept_words"
            ),
        )
        .orderBy("doc_id")
    )


DEDUP_PASSAGES_SQL = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 4 = 0
),
w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM corpus
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
p AS (
    SELECT doc_id, i AS pos,
           md5(array_to_string(words[((i-1)*8+1):(i*8)], ' ')) AS passage_hash,
           len(words[((i-1)*8+1):(i*8)]) AS n_words
    FROM w, UNNEST(range(1, CAST(ceil(len(words)/8.0) AS BIGINT) + 1)) AS t(i)
),
ranked AS (
    SELECT doc_id, pos, n_words,
           ROW_NUMBER() OVER (PARTITION BY passage_hash ORDER BY doc_id, pos) AS rk
    FROM p
)
SELECT doc_id,
       COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_passages,
       CAST(SUM(CASE WHEN rk = 1 THEN n_words ELSE 0 END) AS BIGINT) AS kept_words
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed tf-idf
    (rounded before ranking so the order is float-robust)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_top_terms(docs, "doc_id", "text", k=3).orderBy("doc_id", "rank")


TEXT_TFIDF_SQL = """
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
tok AS (SELECT doc_id, unnest(words) AS term FROM w),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM w),
scored AS (
    SELECT t.doc_id, t.term, t.tf, d.df,
           ROUND(t.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)), 6) AS tfidf
    FROM tf t JOIN df d USING (term) CROSS JOIN n
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
    FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank
FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
"""


def text_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture plan per (lang, source): doc/token counts,
    token share, and the alpha=0.7 temperature-scaled sampling weight
    (small domains upweighted, the standard multilingual rebalance)."""
    docs = _t(spark, sf_dir, "documents")
    return domain_mixture(docs, ["lang", "source"], "text", alpha=0.7).orderBy(
        "lang", "source"
    )


TEXT_MIXTURE_SQL = """
WITH per AS (
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) = ''
                         THEN 0
                         ELSE len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+'))
                    END) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang, source
),
shared AS (
    SELECT *, CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS share_raw
    FROM per
)
SELECT lang, source, n_docs, n_tokens,
       ROUND(share_raw, 6) AS token_share,
       ROUND(POW(share_raw, 0.7) / SUM(POW(share_raw, 0.7)) OVER (), 6) AS sample_weight
FROM shared
ORDER BY lang, source
"""


def dedup_cluster_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END dedup pipeline: MinHash+LSH pairs → connected
    components → keep-one-per-cluster decision. This is the composition
    a real corpus dedup run executes; each stage is separately gated
    (`dedup_minhash_lsh`, `dedup_components`) and this entry gates the
    composition itself.

    Planted clusters: every 5th document gets TWO verbatim copies
    (sizes 3) and every 7th ONE copy (size 2; doc_id%35 gets both →
    size 4). At jaccard_threshold=1.0 the true pair set is exactly
    {identical shingle sets}, identity is transitive, so the connected
    components ARE the equality classes — which DuckDB reproduces by
    grouping on the sorted-shingle-set fingerprint. Output per corpus
    member: its canonical cluster id, cluster size, and the keep flag
    (survivor = smallest id in cluster).
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = (
        docs.unionByName(
            docs.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
            )
        )
    )
    pairs = minhash_lsh_pairs(
        corpus, "doc_id", "text", num_hashes=16, bands=4, jaccard_threshold=1.0
    ).select("id_a", "id_b")
    return (
        cluster_assign(corpus, pairs, "doc_id")
        .select("doc_id", "component", "cluster_size", "keep")
        .orderBy("doc_id")
    )


DEDUP_CLUSTER_SQL = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 7 = 0
),
sh AS (
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE [array_to_string(w, ' ')] END)), chr(31)) AS key
    FROM (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS w
        FROM corpus
    )
)
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY key) AS component,
       COUNT(*) OVER (PARTITION BY key) AS cluster_size,
       doc_id = MIN(doc_id) OVER (PARTITION BY key) AS keep
FROM sh
ORDER BY doc_id
"""


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style in-corpus LM quality signal: per-doc average
    add-one-smoothed unigram log-probability (rounded to 4 so the
    value never hinges on float summation order)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_logprob(docs, "doc_id", "text").orderBy("doc_id")


TEXT_UNIGRAM_SQL = """
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
tok AS (SELECT doc_id, unnest(words) AS term FROM w),
uni AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT SUM(cnt) AS n_tok, COUNT(*) AS vocab FROM uni),
scored AS (
    SELECT t.doc_id,
           ln((u.cnt + 1.0) / (tot.n_tok + tot.vocab)) AS lp
    FROM tok t JOIN uni u USING (term) CROSS JOIN tot
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       ROUND(AVG(lp), 4) AS avg_logprob
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-corpus bigram-LM quality signal (one rung up from
    text_unigram_logprob toward KenLM filters): per-doc tf-weighted
    average of add-one-smoothed conditional bigram log-probability."""
    from curw_flo2d_data_manager_spark.operators.textstats import bigram_logprob

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_logprob(docs, "doc_id", "text").orderBy("doc_id")


TEXT_BIGRAM_SQL = """
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
tok AS (
    SELECT doc_id,
           unnest(words[1:len(words)-1]) AS w1,
           unnest(words[2:len(words)]) AS w2
    FROM w WHERE len(words) >= 2
),
tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3),
cb AS (SELECT w1, w2, SUM(tf) AS cb FROM tf GROUP BY 1, 2),
cw AS (SELECT w1, SUM(cb) AS cw FROM cb GROUP BY 1),
v AS (SELECT COUNT(*) AS vocab FROM cw),
scored AS (
    SELECT t.doc_id, t.tf,
           ln((c.cb + 1.0) / (x.cw + v.vocab)) AS lp
    FROM tf t JOIN cb c USING (w1, w2) JOIN cw x USING (w1) CROSS JOIN v
)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       ROUND(SUM(tf * lp) / SUM(tf), 4) AS avg_logprob
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def text_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided training-mix plan against a 100k-token budget:
    oversized domains get keep_fraction < 1, undersized ones get
    epochs > 1 — DuckDB re-derives the whole plan from the mixture
    weights."""
    from curw_flo2d_data_manager_spark.operators.textstats import epoch_plan

    docs = _t(spark, sf_dir, "documents")
    return epoch_plan(
        docs, ["lang", "source"], "text", target_tokens=100_000, alpha=0.7
    ).orderBy("lang", "source")


TEXT_EPOCH_SQL = """
WITH per AS (
    SELECT lang, source,
           CAST(SUM(CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) = ''
                         THEN 0
                         ELSE len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+'))
                    END) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang, source
),
shared AS (
    SELECT *, CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS share_raw
    FROM per
),
planned AS (
    SELECT lang, source, n_tokens,
           ROUND(POW(share_raw, 0.7) / SUM(POW(share_raw, 0.7)) OVER (), 6)
               * 100000.0 AS desired
    FROM shared
)
SELECT lang, source, n_tokens,
       CAST(ROUND(desired) AS BIGINT) AS target_domain_tokens,
       CASE WHEN n_tokens > 0
            THEN ROUND(LEAST(1.0, desired / n_tokens), 6) ELSE 1.0
       END AS keep_fraction,
       CASE WHEN n_tokens > 0
            THEN ROUND(GREATEST(1.0, desired / n_tokens), 4) ELSE 1.0
       END AS epochs
FROM planned
ORDER BY lang, source
"""


def text_frequent_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over the corpus token stream (terms with ≥0.2%
    of all tokens) via Misra-Gries candidates + an exact verification
    pass — the sketch only decides candidacy, so the certified output
    is exactly DuckDB's groupBy + threshold filter."""
    from curw_flo2d_data_manager_spark.operators.textstats import frequent_terms

    docs = _t(spark, sf_dir, "documents").select("text")
    return frequent_terms(docs, "text", min_share=0.002).orderBy("term")


TEXT_FREQ_SQL = """
WITH tok AS (
    SELECT unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+')) AS term
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
tot AS (SELECT COUNT(*) AS n_tok FROM tok)
SELECT term, COUNT(*) AS cnt
FROM tok CROSS JOIN tot
GROUP BY term, tot.n_tok
HAVING COUNT(*) * 500 >= tot.n_tok
ORDER BY term
"""


def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window document chunking (32 words, 8 overlap) — the
    pre-packing step. The oracle re-derives every chunk's word slice
    and sha via DuckDB list slicing, so boundaries, overlap, and the
    at-least-one-chunk rule are all hash-checked."""
    from curw_flo2d_data_manager_spark.operators.textstats import chunk_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        chunk_documents(docs, "doc_id", "text", chunk_words=32, overlap=8)
        .select(
            "doc_id",
            "chunk_idx",
            "n_words",
            F.sha2("chunk_text", 256).alias("chunk_sha"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


TEXT_CHUNK_SQL = """
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
n AS (
    SELECT doc_id, words,
           CAST(greatest(1, ceil((len(words) - 8) / 24.0)) AS INT) AS n_chunks
    FROM w
),
chunks AS (
    SELECT doc_id,
           CAST(k AS INT) AS chunk_idx,
           words[k * 24 + 1 : k * 24 + 32] AS cw
    FROM n, LATERAL (SELECT unnest(range(0, n_chunks)) AS k)
)
SELECT doc_id, chunk_idx,
       CAST(len(cw) AS INT) AS n_words,
       sha256(array_to_string(cw, ' ')) AS chunk_sha
FROM chunks
ORDER BY doc_id, chunk_idx
"""


def f_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic leak-free train/val/test assignment over the
    documents table: 0.8/0.1/0.1 by md5 bucket of doc_id — the oracle
    re-derives every row's split independently from the same hash."""
    from curw_flo2d_data_manager_spark.operators.sampling import split_assign

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return split_assign(
        docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
    ).orderBy("doc_id")


F_SPLIT_SQL = """
SELECT doc_id, lang,
       CASE WHEN b < 'cccccccc' THEN 'train'
            WHEN b < 'e6666666' THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id, lang,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS b
    FROM documents
)
ORDER BY doc_id
"""


def f_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction end-to-end: temperature-scaled domain
    weights → per-domain keep fractions against a 50k-token budget →
    deterministic md5-bucket row selection; summarized per domain so
    the oracle checks the exact kept set (counts + token sums)."""
    from curw_flo2d_data_manager_spark.operators.sampling import mixture_resample

    docs = _t(spark, sf_dir, "documents")
    kept = mixture_resample(
        docs, ["lang", "source"], ["doc_id"], "text",
        target_tokens=50_000, alpha=0.7,
    )
    return (
        kept.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum(whitespace_token_count("text")).alias("kept_tokens"),
        )
        .orderBy("lang", "source")
    )


F_MIXTURE_SQL = """
WITH per AS (
    SELECT lang, source,
           CAST(SUM(CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) = ''
                         THEN 0
                         ELSE len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+'))
                    END) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang, source
),
shared AS (
    SELECT *, CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS share_raw
    FROM per
),
rates AS (
    SELECT lang, source,
           LEAST(1.0, ROUND(POW(share_raw, 0.7) / SUM(POW(share_raw, 0.7)) OVER (), 6)
                      * 50000.0 / n_tokens) AS kf
    FROM shared
),
kept AS (
    SELECT d.doc_id, d.lang, d.source,
           CASE WHEN trim(regexp_replace(lower(d.text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) = ''
                THEN 0
                ELSE len(string_split_regex(trim(regexp_replace(lower(d.text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+'))
           END AS n_tok
    FROM documents d JOIN rates r USING (lang, source)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
          CASE WHEN r.kf >= 1.0 THEN 'g'
               ELSE lpad(lower(hex(CAST(FLOOR(r.kf * 4294967296) AS BIGINT))), 8, '0')
          END
)
SELECT lang, source, COUNT(*) AS kept_docs, CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
FROM kept GROUP BY lang, source ORDER BY lang, source
"""


def f_materialize_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical training mix from the epoch plan against a 30k-token
    budget: oversized domains appear once for an md5-selected subset,
    undersized domains repeat ⌊epochs⌋ times plus an md5-selected
    fractional pass, every row stamped with its epoch — DuckDB
    re-derives the full (doc_id, epoch) multiset."""
    from curw_flo2d_data_manager_spark.operators.sampling import (
        materialize_mixture,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        materialize_mixture(
            docs, ["lang", "source"], ["doc_id"], "text",
            target_tokens=30_000, alpha=0.7,
        )
        .select("doc_id", "lang", "source", "epoch")
        .orderBy("doc_id", "epoch")
    )


F_MATERIALIZE_SQL = """
WITH per AS (
    SELECT lang, source,
           CAST(SUM(CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) = ''
                         THEN 0
                         ELSE len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+'))
                    END) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang, source
),
shared AS (
    SELECT *, CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS share_raw
    FROM per
),
plan AS (
    SELECT lang, source, n_tokens,
           ROUND(POW(share_raw, 0.7) / SUM(POW(share_raw, 0.7)) OVER (), 6)
               * 30000.0 AS desired
    FROM shared
),
rates AS (
    SELECT lang, source,
           CASE WHEN n_tokens > 0
                THEN ROUND(LEAST(1.0, desired / n_tokens), 6) ELSE 1.0
           END AS kf,
           CASE WHEN n_tokens > 0
                THEN ROUND(GREATEST(1.0, desired / n_tokens), 4) ELSE 1.0
           END AS ep
    FROM plan
),
copies AS (
    SELECT d.doc_id, d.lang, d.source,
           CASE WHEN r.kf < 1.0 THEN
                    CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
                              lpad(lower(hex(CAST(FLOOR(r.kf * 4294967296) AS BIGINT))), 8, '0')
                         THEN 1 ELSE 0 END
                ELSE CAST(FLOOR(r.ep) AS INT) +
                    CASE WHEN r.ep - FLOOR(r.ep) > 0
                              AND substr(md5(CAST(d.doc_id AS VARCHAR) || ':epoch'), 1, 8) <
                                  lpad(lower(hex(CAST(FLOOR((r.ep - FLOOR(r.ep)) * 4294967296) AS BIGINT))), 8, '0')
                         THEN 1 ELSE 0 END
           END AS n_copies
    FROM documents d JOIN rates r USING (lang, source)
)
SELECT doc_id, lang, source, CAST(e AS INT) AS epoch
FROM copies, LATERAL (SELECT unnest(range(1, n_copies + 1)) AS e)
ORDER BY doc_id, epoch
"""


def stream_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup over file arrival: wave 1 is the
    documents table, wave 2 re-sends every 3rd document under a new id
    (+1,000,000) plus genuinely new synthetic docs (+2,000,000). The
    ledger must drop every re-sent duplicate across waves and admit
    the new docs; the oracle is the batch first-occurrence-per-
    normalized-text rule over both waves."""
    import tempfile

    from curw_flo2d_data_manager_spark.streaming.ingest import corpus_dedup_stream

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    wave2 = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat(F.lit("brand new content "), F.col("doc_id").cast("string")).alias(
                "text"
            ),
        )
    )
    watch = tempfile.mkdtemp(prefix="stream_corpus_src_")
    out = tempfile.mkdtemp(prefix="stream_corpus_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_corpus_ckpt_")
    docs.coalesce(1).write.parquet(f"{watch}/wave1")

    q1 = corpus_dedup_stream(
        spark, f"{watch}/*", out, "doc_id long, text string",
        checkpoint=ckpt, available_now=True,
    )
    q1.awaitTermination(300)
    q1.stop()
    wave2.coalesce(1).write.parquet(f"{watch}/wave2")
    q2 = corpus_dedup_stream(
        spark, f"{watch}/*", out, "doc_id long, text string",
        checkpoint=ckpt, available_now=True,
    )
    q2.awaitTermination(300)
    q2.stop()
    return (
        spark.read.parquet(f"{out}/docs")
        .select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha"))
        .orderBy("doc_id")
    )


STREAM_CORPUS_SQL = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id + 2000000, 'brand new content ' || CAST(doc_id AS VARCHAR)
    FROM documents WHERE doc_id % 7 = 0
),
keyed AS (
    SELECT doc_id, text,
           trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) AS norm
    FROM corpus
)
SELECT doc_id, sha256(text) AS text_sha
FROM keyed
WHERE doc_id = (SELECT MIN(doc_id) FROM keyed k2 WHERE k2.norm = keyed.norm)
ORDER BY doc_id
"""


def stream_corpus_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gated streaming ingest over two file-arrival waves
    (documents split by doc_id parity): the union of the accepted and
    dead-letter sinks must reproduce the BATCH gate decision
    (n_words >= 5 AND punct_ratio <= 0.2) for every document — the
    oracle recomputes both signals and the routing directly."""
    import tempfile

    from curw_flo2d_data_manager_spark.streaming.ingest import (
        corpus_quality_stream,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    watch = tempfile.mkdtemp(prefix="stream_quality_src_")
    out = tempfile.mkdtemp(prefix="stream_quality_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_quality_ckpt_")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        f"{watch}/wave1"
    )
    for _ in range(2):  # second pass picks up wave2
        q = corpus_quality_stream(
            spark, f"{watch}/*", out, "doc_id long, text string",
            min_words=5, max_punct_ratio=0.2,
            checkpoint=ckpt, available_now=True,
        )
        q.awaitTermination(300)
        q.stop()
        docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
            "ignore"
        ).parquet(f"{watch}/wave2")
    accepted = spark.read.parquet(f"{out}/accepted").select(
        "doc_id", F.lit(True).alias("accepted")
    )
    rejected = spark.read.parquet(f"{out}/rejected").select(
        "doc_id",
        F.lit(False).alias("accepted"),
        "n_words",
        "punct_ratio",
    )
    return (
        accepted.withColumn("n_words", F.lit(None).cast("long"))
        .withColumn("punct_ratio", F.lit(None).cast("double"))
        .unionByName(rejected)
        .orderBy("doc_id")
    )


STREAM_QUALITY_SQL = """
WITH scored AS (
    SELECT doc_id,
           CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) = ''
                THEN 0
                ELSE len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+'))
           END AS n_words,
           ROUND(CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
                 / greatest(length(text), 1), 6) AS punct_ratio
    FROM documents
)
SELECT doc_id,
       (n_words >= 5 AND punct_ratio <= 0.2) AS accepted,
       CASE WHEN n_words >= 5 AND punct_ratio <= 0.2
            THEN NULL ELSE CAST(n_words AS BIGINT) END AS n_words,
       CASE WHEN n_words >= 5 AND punct_ratio <= 0.2
            THEN NULL ELSE punct_ratio END AS punct_ratio
FROM scored
ORDER BY doc_id
"""


def stream_corpus_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup dedup over two file-arrival waves with the
    signature ledger: wave 2 re-sends every 3rd document with trailing
    punctuation noise (normalizes to the SAME shingle set → identical
    MinHash signature → dropped against history deterministically)
    plus genuinely new docs. At threshold=1.0 'near-dup' means
    identical shingle set exactly, so DuckDB reproduces the survivor
    set as first-occurrence-per-shingle-set-key."""
    import tempfile

    from curw_flo2d_data_manager_spark.streaming.ingest import (
        corpus_neardup_stream,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    wave2 = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" !!!")).alias("text"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat(
                F.lit("brand new near content "), F.col("doc_id").cast("string")
            ).alias("text"),
        )
    )
    watch = tempfile.mkdtemp(prefix="stream_neardup_src_")
    out = tempfile.mkdtemp(prefix="stream_neardup_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_neardup_ckpt_")
    docs.coalesce(1).write.parquet(f"{watch}/wave1")
    for _ in range(2):
        q = corpus_neardup_stream(
            spark, f"{watch}/*", out, "doc_id long, text string",
            threshold=1.0, checkpoint=ckpt, available_now=True,
        )
        q.awaitTermination(300)
        q.stop()
        wave2.coalesce(1).write.mode("ignore").parquet(f"{watch}/wave2")
    return (
        spark.read.parquet(f"{out}/docs")
        .select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha"))
        .orderBy("doc_id")
    )


STREAM_NEARDUP_SQL = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text || ' !!!' FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id + 2000000, 'brand new near content ' || CAST(doc_id AS VARCHAR)
    FROM documents WHERE doc_id % 7 = 0
),
-- NOTE every oracle's normalization class uses RE2's \\x{ffff}
-- upper bound: the Java-style backslash-uffff spelling is not an RE2
-- escape (the whole class silently matched NOTHING in DuckDB — only
-- harmless while the corpus charset is bare lowercase ASCII), and
-- this query's planted '!' noise is what exposed it.
sh AS (
    SELECT doc_id, text,
           array_to_string(list_sort(list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE [array_to_string(w, ' ')] END)), chr(31)) AS key
    FROM (
        SELECT doc_id, text,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS w
        FROM corpus
    )
)
SELECT doc_id, sha256(text) AS text_sha
FROM sh
WHERE doc_id = (SELECT MIN(doc_id) FROM sh s2 WHERE s2.key = sh.key)
ORDER BY doc_id
"""


def sim_cross_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination with a planted-recall
    oracle: the eval set is every 10th train vector scaled ×2 (same
    direction → identical hyperplane signature → collides in EVERY
    band → cosine exactly 1 after rounding). The query keeps only
    planted train↔own-copy pairs (organic ≥0.95 cross pairs are
    banding-dependent), so losing ANY planted pair — a signature,
    banding, or verify bug — breaks the hash match."""
    emb = _t(spark, sf_dir, "embeddings")
    evals = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 500_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0).cast("float")).alias(
            "embedding"
        ),
    )
    return (
        cross_corpus_decontam_pairs(emb, evals, cosine_threshold=0.95)
        .filter(F.col("eval_id") == F.col("train_id") + 500_000)
        .select("train_id", "eval_id", F.round("cosine", 6).alias("cosine"))
        .orderBy("train_id")
    )


SIM_CROSS_SQL = """
SELECT vec_id AS train_id, vec_id + 500000 AS eval_id, CAST(1.0 AS DOUBLE) AS cosine
FROM embeddings WHERE vec_id % 10 = 0
ORDER BY train_id
"""


def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup with a fixed 8-centroid one-hot
    codebook (axis-aligned unit vectors → cluster = argmax of the
    first 8 embedding components, so BOTH engines derive the
    assignment from raw component comparisons, no arithmetic drift):
    every 10th vector gets a ×2-scaled planted copy (cosine exactly 1,
    same cluster); the copy must be dropped, everything else kept.
    DuckDB re-derives clusters, within-cluster pairs, and the greedy
    smallest-id-wins keep set independently."""
    from curw_flo2d_data_manager_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    corpus = emb.unionByName(copies)
    dim = 64
    centroids = [
        [1.0 if j == i else 0.0 for j in range(dim)] for i in range(8)
    ]
    return semantic_dedup(corpus, centroids, threshold=0.9).orderBy("vec_id")


SIM_SEMDEDUP_SQL = """
WITH corpus AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000,
           CAST(CAST(list_transform(embedding, x -> x * 2) AS FLOAT[]) AS DOUBLE[])
    FROM embeddings WHERE vec_id % 10 = 0
),
assigned AS (
    SELECT vec_id, emb,
           list_indexof(emb[1:8], list_aggregate(emb[1:8], 'max')) - 1 AS cluster
    FROM corpus
),
dropped AS (
    SELECT DISTINCT b.vec_id
    FROM assigned a JOIN assigned b
      ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.emb, b.emb) >= 0.9
)
SELECT a.vec_id, a.cluster, d.vec_id IS NULL AS keep
FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
ORDER BY a.vec_id
"""


def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN graph construction blocked by label (the IVF-cluster stand-
    in): every vector's 5 nearest same-block neighbors as directed
    edges — the input to graph clustering and kNN-LM retrieval."""
    from curw_flo2d_data_manager_spark.operators.similarity import knn_graph

    emb = _t(spark, sf_dir, "embeddings")
    out = knn_graph(emb, k=5, block_col="label")
    return out.select(
        "src", "dst", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("src", "rank")


SIM_KNN_SQL = """
WITH scored AS (
    SELECT a.vec_id AS src, b.vec_id AS dst,
           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id <> b.vec_id
),
ranked AS (
    SELECT src, dst, cosine,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rank
    FROM scored
)
SELECT src, dst, ROUND(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 5
ORDER BY src, rank
"""


def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): per-doc average
    log-ratio of the target-domain (lang='en') unigram LM to the raw-
    corpus LM, both add-one smoothed over the shared vocabulary — the
    score that importance-resamples pretraining data toward a target
    distribution."""
    from curw_flo2d_data_manager_spark.operators.textstats import dsir_log_ratio

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", (F.col("lang") == "en").alias("is_tgt")
    )
    return dsir_log_ratio(docs, "doc_id", "is_tgt").orderBy("doc_id")


TEXT_DSIR_SQL = """
WITH w AS (
    SELECT doc_id, lang = 'en' AS tgt,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
tok AS (SELECT doc_id, tgt, unnest(words) AS term FROM w),
tf AS (SELECT doc_id, tgt, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3),
lm AS (
    SELECT term, SUM(tf) AS c_raw,
           SUM(CASE WHEN tgt THEN tf ELSE 0 END) AS c_tgt
    FROM tf GROUP BY 1
),
tot AS (SELECT SUM(c_raw) AS n_raw, SUM(c_tgt) AS n_tgt, COUNT(*) AS vocab FROM lm),
scored AS (
    SELECT t.doc_id, t.tf,
           ln((l.c_tgt + 1.0) / (tot.n_tgt + tot.vocab))
         - ln((l.c_raw + 1.0) / (tot.n_raw + tot.vocab)) AS lr
    FROM tf t JOIN lm l USING (term) CROSS JOIN tot
)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       ROUND(SUM(tf * lr) / SUM(tf), 4) + 0.0 AS avg_logratio
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def f_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assembly: documents bucketed by n_chars
    edges, sharded by an md5-derived hash for window parallelism, and
    counted off into deterministic fixed-size batches — the dynamic-
    batching step that bounds per-batch padding waste."""
    from curw_flo2d_data_manager_spark.operators.packing import (
        length_bucketed_batches,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return length_bucketed_batches(
        docs, "doc_id", "n_chars",
        batch_size=16, boundaries=[120, 160, 200], n_shards=2,
    ).orderBy("doc_id")


F_LENBUCKET_SQL = """
WITH base AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS length,
           (CASE WHEN n_chars >= 120 THEN 1 ELSE 0 END
          + CASE WHEN n_chars >= 160 THEN 1 ELSE 0 END
          + CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS bucket,
           md5(CAST(doc_id AS VARCHAR)) AS ord_key
    FROM documents
),
sharded AS (
    SELECT *, CAST(concat('0x', substring(ord_key, 1, 8)) AS BIGINT) % 2 AS shard
    FROM base
),
seq AS (
    SELECT doc_id, length, bucket, shard,
           ROW_NUMBER() OVER (PARTITION BY bucket, shard ORDER BY ord_key, doc_id) - 1 AS rn
    FROM sharded
)
SELECT doc_id, length, bucket, shard,
       rn // 16 AS batch_idx, rn % 16 AS batch_pos
FROM seq ORDER BY doc_id
"""


def f_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (anti-host-domination): keep at most 10
    docs per source, best-first by (n_chars DESC, doc_id) — the
    row_number <= cap pattern rides Spark's InferWindowGroupLimit so
    a skewed domain never ships more than cap rows per map partition
    into its reducer. Run annotated (keep_only=False) so the oracle
    certifies every rank, not just the survivor set."""
    from curw_flo2d_data_manager_spark.operators.sampling import domain_cap

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = domain_cap(
        docs, ["source"], [F.col("n_chars").desc(), F.col("doc_id")],
        cap=10, keep_only=False,
    )
    return out.select("doc_id", "source", "domain_rank", "over_cap").orderBy(
        "doc_id"
    )


F_DOMAIN_CAP_SQL = """
SELECT doc_id, source,
       ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
           AS domain_rank,
       ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
           > 10 AS over_cap
FROM documents
ORDER BY doc_id
"""


def f_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quantile normalization of a quality score (n_chars
    as the stand-in signal): the cross-source calibration that makes
    one global keep-threshold select the same quantile of every
    domain regardless of raw score scale — percent_rank within
    source, ties sharing a rank."""
    from curw_flo2d_data_manager_spark.operators.sampling import (
        quantile_normalize,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = quantile_normalize(docs, ["source"], "n_chars")
    return out.select(
        "doc_id", "source", F.round("score_norm", 9).alias("score_norm")
    ).orderBy("doc_id")


F_QUANTILE_NORM_SQL = """
SELECT doc_id, source,
       ROUND(PERCENT_RANK() OVER (PARTITION BY source ORDER BY n_chars), 9)
           AS score_norm
FROM documents
ORDER BY doc_id
"""


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document (fixed
    a-z/0-9/space alphabet + OTHER bucket) — the gibberish/encoded-
    blob quality signal, computed as a ZERO-shuffle projection
    (length-difference counts, no per-character explode). The oracle
    re-derives it by the OPPOSITE method — character unnest +
    group-count — so agreement certifies the length-diff algebra."""
    from curw_flo2d_data_manager_spark.operators.textstats import char_entropy

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id", F.round(char_entropy("text"), 6).alias("char_entropy")
    ).orderBy("doc_id")


TEXT_ENTROPY_SQL = """
WITH e AS (
    SELECT doc_id, lower(text) AS t FROM documents
),
ch AS (
    SELECT doc_id,
           CASE WHEN strpos('abcdefghijklmnopqrstuvwxyz0123456789 ', c) > 0
                THEN c ELSE chr(1) END AS cls
    FROM (SELECT doc_id, unnest(string_split(t, '')) AS c
          FROM e WHERE length(t) > 0)
),
cnt AS (
    SELECT doc_id, cls, COUNT(*)::DOUBLE AS n
    FROM ch GROUP BY doc_id, cls
),
tot AS (SELECT doc_id, SUM(n) AS total FROM cnt GROUP BY doc_id),
ent AS (
    SELECT cnt.doc_id,
           -SUM((n / total) * log2(n / total)) AS h
    FROM cnt JOIN tot USING (doc_id)
    GROUP BY cnt.doc_id
)
SELECT e.doc_id,
       ROUND(CASE WHEN length(e.t) > 0 THEN ent.h END, 6) AS char_entropy
FROM e LEFT JOIN ent USING (doc_id)
ORDER BY e.doc_id
"""


def dedup_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered blocklist anti-join: drop every document
    whose exact text fingerprint appears in the src0 'already-trained'
    shard, keeping the corpus scan shuffle-free (map-side broadcast
    bit-words + exact verify on the candidate sliver). The tiny
    m_bits forces real false positives through the verify phase, so
    the oracle certifies the exactness guarantee, not a lucky hash."""
    from curw_flo2d_data_manager_spark.operators.dedup import (
        bloom_blocklist_filter,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "lang", "source", F.md5("text").alias("fp"))
    blocklist = docs.filter(F.col("source") == "src0").select(
        F.md5("text").alias("fp")
    )
    out = bloom_blocklist_filter(corpus, blocklist, "fp", m_bits=4096, k=3)
    return out.select("doc_id", "lang", "source").orderBy("doc_id")


DEDUP_BLOOM_SQL = """
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE NOT EXISTS (
    SELECT 1 FROM documents b
    WHERE b.source = 'src0' AND md5(b.text) = md5(d.text)
)
ORDER BY d.doc_id
"""


def _pq_codebooks(
    m: int = 4, ksub: int = 4, dsub: int = 16, seed: int = 12345
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks shared by the Spark query and the
    generated SQL oracle: LCG-driven values rounded to 6 decimals so
    the literals parse to the SAME double in every engine."""
    x = seed

    def nxt() -> float:
        nonlocal x
        x = (1103515245 * x + 12345) % (1 << 31)
        return round(x / (1 << 31) * 0.6 - 0.3, 6)

    return [
        [[nxt() for _ in range(dsub)] for _ in range(ksub)] for _ in range(m)
    ]


PQ_CODEBOOKS = _pq_codebooks()


def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization end-to-end (Jégou et al. 2011): assign
    every embedding its packed PQ code (4 subspaces x 4 sub-centroids
    over 16 dims — 64-dim float vector → 1 byte) and rank the corpus
    for 3 query vectors by asymmetric distance (ADC). The oracle
    re-derives every code argmin AND every ADC sum from the same
    literal codebook, so both halves of the operator are value-gated."""
    from curw_flo2d_data_manager_spark.operators.similarity import pq_adc_topk

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_adc_topk(emb, qs, PQ_CODEBOOKS, k=5)
    return out.select(
        "query_id", "corpus_id", F.round("adc", 6).alias("adc"), "rank"
    ).orderBy("query_id", "rank")


def _pq_sql() -> str:
    """Generate the DuckDB oracle for ``sim_pq_adc`` from the SAME
    codebook constant: explicit left-associated 16-term sums mirror
    Spark's sequential aggregate fold, so distances are bit-identical;
    argmin ties resolve to the first (smallest) index on both sides."""
    cbs = PQ_CODEBOOKS
    m, ksub, dsub = len(cbs), len(cbs[0]), len(cbs[0][0])

    def dist(vexpr: str, i: int, cent: list[float]) -> str:
        s = i * dsub
        return " + ".join(
            f"({vexpr}[{s + j + 1}] - ({cent[j]!r}))"
            f"*({vexpr}[{s + j + 1}] - ({cent[j]!r}))"
            for j in range(dsub)
        )

    dl_cols = ",\n           ".join(
        "list_value("
        + ", ".join(dist("v", i, cbs[i][c]) for c in range(ksub))
        + f") AS dl{i}"
        for i in range(m)
    )
    code_cols = ", ".join(
        f"list_position(dl{i}, list_min(dl{i})) - 1 AS k{i}" for i in range(m)
    )
    adc = " + ".join(
        "(CASE k%d %s END)"
        % (
            i,
            " ".join(
                f"WHEN {c} THEN ({dist('qv', i, cbs[i][c])})"
                for c in range(ksub)
            ),
        )
        for i in range(m)
    )
    return f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 3),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
dists AS (
    SELECT vec_id,
           {dl_cols}
    FROM c
),
codes AS (SELECT vec_id, {code_cols} FROM dists),
pairs AS (
    SELECT q.query_id, codes.vec_id AS corpus_id, {adc} AS adc
    FROM codes CROSS JOIN q
),
ranked AS (
    SELECT query_id, corpus_id, adc,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc, corpus_id) AS rank
    FROM pairs
)
SELECT query_id, corpus_id, ROUND(adc, 6) AS adc, rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


SIM_PQ_SQL = _pq_sql()


def sim_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search end-to-end: ADC over the packed codes selects 20
    candidates per query, exact cosine reranks them to the top-5 —
    the standard IVF-PQ recipe's refine step. The oracle re-derives
    the ADC candidate set from the shared codebook and reranks with
    DuckDB's cosine, so candidate selection AND the exact refine are
    both value-gated."""
    from curw_flo2d_data_manager_spark.operators.similarity import (
        pq_adc_rerank_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_adc_rerank_topk(emb, qs, PQ_CODEBOOKS, k=5, candidate_mult=4)
    return out.select(
        "query_id", "corpus_id", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


def _pq_rerank_sql() -> str:
    """Oracle for ``sim_pq_rerank``: the generated ADC ranking
    truncated at 20 candidates, joined back to the vectors and
    reranked by list_cosine_similarity."""
    adc = _pq_sql()
    # reuse the generated ADC SQL up to the ranked CTE, then rerank
    head = adc[: adc.index("SELECT query_id, corpus_id, ROUND(adc, 6)")]
    return (
        head.rstrip()
        + """,
cands AS (SELECT query_id, corpus_id FROM ranked WHERE rank <= 20),
rr AS (
    SELECT cands.query_id, cands.corpus_id,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                  CAST(qe.embedding AS DOUBLE[])) AS cosine
    FROM cands
    JOIN embeddings e ON e.vec_id = cands.corpus_id
    JOIN embeddings qe ON qe.vec_id = cands.query_id
),
rr_ranked AS (
    SELECT query_id, corpus_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank
    FROM rr
)
SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rank
FROM rr_ranked WHERE rank <= 5
ORDER BY query_id, rank
"""
    )


SIM_PQ_RERANK_SQL = _pq_rerank_sql()


def stream_corpus_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist-decontaminating streaming ingest over two file-arrival
    waves (documents split by doc_id parity) against a static
    blocklist (the src0 shard's text fingerprints): the union of the
    accepted and blocked sinks must reproduce the batch anti-join
    decision for every document — the oracle recomputes md5-level
    membership directly."""
    import tempfile

    from curw_flo2d_data_manager_spark.streaming.ingest import (
        corpus_decontam_stream,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    blocklist = docs.filter(F.col("source") == "src0").select("text")
    watch = tempfile.mkdtemp(prefix="stream_decontam_src_")
    out = tempfile.mkdtemp(prefix="stream_decontam_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_decontam_ckpt_")
    feed = docs.select("doc_id", "text")
    feed.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        f"{watch}/wave1"
    )
    for _ in range(2):  # second pass picks up wave2
        q = corpus_decontam_stream(
            spark, f"{watch}/*", out, "doc_id long, text string",
            blocklist, m_bits=4096, k=3,
            checkpoint=ckpt, available_now=True,
        )
        q.awaitTermination(300)
        q.stop()
        feed.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
            "ignore"
        ).parquet(f"{watch}/wave2")
    accepted = spark.read.parquet(f"{out}/accepted").select(
        "doc_id", F.lit(True).alias("accepted")
    )
    blocked = spark.read.parquet(f"{out}/blocked").select(
        "doc_id", F.lit(False).alias("accepted")
    )
    return accepted.unionByName(blocked).orderBy("doc_id")


STREAM_DECONTAM_SQL = """
SELECT d.doc_id,
       NOT EXISTS (
           SELECT 1 FROM documents b
           WHERE b.source = 'src0' AND md5(b.text) = md5(d.text)
       ) AS accepted
FROM documents d
ORDER BY d.doc_id
"""


def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document under the in-corpus unigram LM, then split into
    head/middle/tail terciles by exact continuous thresholds —
    broadcast cuts, no corpus-wide sort. The standard quality-tiering
    step before mixture construction."""
    from curw_flo2d_data_manager_spark.operators.caching import (
        cache_mark,
        release_caches_since,
    )
    from curw_flo2d_data_manager_spark.operators.textstats import (
        logprob_buckets,
        unigram_logprob,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mark = cache_mark()
    try:
        scored = unigram_logprob(docs, "doc_id")
        out = logprob_buckets(scored).select(
            "doc_id", "avg_logprob", "bucket"
        ).orderBy("doc_id")
        out = out.localCheckpoint(eager=True)  # materialize before release
    finally:
        release_caches_since(mark)
    return out


TEXT_CCNET_SQL = """
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
tok AS (SELECT doc_id, unnest(words) AS term FROM w),
uni AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT SUM(cnt) AS n_tok, COUNT(*) AS vocab FROM uni),
scored AS (
    SELECT t.doc_id, ln((u.cnt + 1.0) / (tot.n_tok + tot.vocab)) AS lp
    FROM tok t JOIN uni u USING (term) CROSS JOIN tot
),
doc AS (
    SELECT doc_id, ROUND(AVG(lp), 4) AS avg_logprob
    FROM scored GROUP BY doc_id
),
cuts AS (
    SELECT quantile_cont(avg_logprob, 1.0/3.0) AS t1,
           quantile_cont(avg_logprob, 2.0/3.0) AS t2
    FROM doc
)
SELECT doc_id, avg_logprob,
       CASE WHEN avg_logprob <= t1 THEN 'tail'
            WHEN avg_logprob <= t2 THEN 'middle'
            ELSE 'head' END AS bucket
FROM doc CROSS JOIN cuts
ORDER BY doc_id
"""


def _classifier_weights(dim: int = 64, seed: int = 424242) -> list[float]:
    """Deterministic stand-in classifier weights (LCG, 6-decimal
    literals) shared by the Spark query and the generated oracle — in
    production these come from an offline-trained quality model."""
    x = seed
    out = []
    for _ in range(dim):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(round(x / (1 << 31) * 4.0 - 2.0, 6))
    return out


CLASSIFIER_WEIGHTS = _classifier_weights()


def text_hash_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear classifier scoring: per-doc
    sigmoid of the mean hashed-bag-of-words weight under a provided
    (offline-trained) weight vector — the quality-classifier filter
    shape of public pretraining pipelines, md5-bucketed so any engine
    re-derives the same features."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        hash_classifier_score,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return hash_classifier_score(
        docs, "doc_id", CLASSIFIER_WEIGHTS, bias=0.25
    ).orderBy("doc_id")


def _classifier_sql(bias: float = 0.25, order: bool = True) -> str:
    vals = ", ".join(
        f"({i}, {w!r})" for i, w in enumerate(CLASSIFIER_WEIGHTS)
    )
    tail = " ORDER BY doc_id" if order else ""
    return f"""
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{{ffff}}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{{ffff}}-]+', ' ', 'g')) != ''
),
tok AS (SELECT doc_id, unnest(words) AS term FROM w),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
wt(bucket, wgt) AS (VALUES {vals}),
joined AS (
    SELECT tf.doc_id, tf.tf, wt.wgt
    FROM tf JOIN wt
      ON CAST(concat('0x', substring(md5(tf.term), 1, 8)) AS BIGINT) % 64 = wt.bucket
)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       ROUND(1.0 / (1.0 + exp(-({bias!r} + SUM(tf * wgt) / SUM(tf)))), 6) AS score
FROM joined GROUP BY doc_id{tail}
"""


TEXT_CLASSIFIER_SQL = _classifier_sql()


def sim_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF-PQ retrieval stack (partition-pruned probe → ADC
    over packed codes → exact rerank) with the planted full oracle of
    `sim_ivf_topk`: every vector has a verbatim copy, so each of 50
    queries MUST return itself at rank 1 and its copy at rank 2 with
    cosine exactly 1 — a broken cell assignment, code, ADC ranking, or
    rerank drops one of them and breaks the hash match.

    ``candidate_mult`` is saturated past the probed-cell population so
    the gate certifies the probe+ADC+rerank COMPOSITION exactly (the
    synthetic corpus collapses many vectors onto identical PQ codes,
    making a selective ADC cut tie-broken and data-dependent); the ADC
    cut's selectivity is separately value-certified by `sim_pq_adc` /
    `sim_pq_rerank` and recall-certified at 1M vectors by
    `tools/bench_pq_scale.py`."""
    from curw_flo2d_data_manager_spark.operators.similarity import (
        build_ivf_index,
        ivfpq_query,
    )

    from curw_flo2d_data_manager_spark.operators.caching import persist_tracked

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    assigned, centers = build_ivf_index(corpus, n_clusters=8)
    # materialize the assignment once (the batch recipe persists it
    # partitionBy(cluster); lazily it is recomputed/recompiled in all
    # three of ivfpq_query's join branches — measured 16.6 s → 3.1 s)
    assigned = persist_tracked(assigned)
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_query(
        assigned, centers, queries, PQ_CODEBOOKS,
        k=2, nprobe=2, candidate_mult=1000,
    )
    return out.select(
        "query_id", "corpus_id", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


SIM_IVFPQ_SQL = """
SELECT vec_id AS query_id, vec_id AS corpus_id,
       CAST(1.0 AS DOUBLE) AS cosine, 1 AS rank
FROM embeddings WHERE vec_id < 50
UNION ALL
SELECT vec_id, vec_id + 1000000, CAST(1.0 AS DOUBLE), 2
FROM embeddings WHERE vec_id < 50
ORDER BY query_id, rank
"""


def dedup_span_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict boilerplate removal end-to-end: cut every repeated
    8-gram span from every document and reassemble the survivors —
    sha-checked text per doc plus the cut-token budget, one row per
    input document (fully-cut docs come back empty, not absent)."""
    from curw_flo2d_data_manager_spark.operators.dedup import (
        remove_repeated_spans,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = remove_repeated_spans(docs, "doc_id", k=8)
    return out.select(
        "doc_id", F.sha2("text", 256).alias("text_sha"), "n_tokens_cut"
    ).orderBy("doc_id")


DEDUP_SPAN_REBUILD_SQL = r"""
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')), '\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')) != ''
),
g AS (
    SELECT doc_id, i - 1 AS pos,
           CAST(('0x' || substring(md5(array_to_string(words[i:i+7], ' ')), 1, 8)) AS BIGINT) AS gh
    FROM (SELECT doc_id, words, unnest(range(1, len(words) - 6)) AS i
          FROM w WHERE len(words) >= 8)
),
dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
marked AS (SELECT DISTINCT doc_id, pos FROM g JOIN dup USING (gh)),
islands AS (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM marked
),
spans AS (
    SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
    FROM islands GROUP BY doc_id, grp
),
cutpos AS (
    SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS pos FROM spans
),
toks AS (
    SELECT doc_id, unnest(words) AS tok,
           unnest(range(0, len(words))) AS pos
    FROM w
),
keep AS (
    SELECT t.doc_id, t.tok, t.pos
    FROM toks t LEFT JOIN cutpos c ON t.doc_id = c.doc_id AND t.pos = c.pos
    WHERE c.pos IS NULL
),
rebuilt AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
    FROM keep GROUP BY doc_id
),
cutn AS (
    SELECT doc_id, CAST(SUM(e - s + 1) AS BIGINT) AS n FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       sha256(COALESCE(r.text, '')) AS text_sha,
       COALESCE(cutn.n, 0) AS n_tokens_cut
FROM documents d
LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
LEFT JOIN cutn ON d.doc_id = cutn.doc_id
ORDER BY d.doc_id
"""


def dedup_contam_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination: the src0 shard plays the
    benchmark; every maximal run of training-doc positions whose
    8-gram appears in it surfaces as a cut-ready span — the surgical
    alternative to dropping whole contaminated documents. The oracle
    re-derives benchmark gram membership and the island merge."""
    from curw_flo2d_data_manager_spark.operators.dedup import (
        contamination_spans,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    corpus = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    benchmark = docs.filter(F.col("source") == "src0").select("text")
    return contamination_spans(corpus, benchmark, "doc_id", k=8).orderBy(
        "doc_id", "span_start"
    )


DEDUP_CONTAM_SPANS_SQL = r"""
WITH w AS (
    SELECT doc_id, source,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')), '\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')) != ''
),
bg AS (
    SELECT DISTINCT
           CAST(('0x' || substring(md5(array_to_string(words[i:i+7], ' ')), 1, 8)) AS BIGINT) AS gh
    FROM (SELECT words, unnest(range(1, len(words) - 6)) AS i
          FROM w WHERE source = 'src0' AND len(words) >= 8)
),
cg AS (
    SELECT doc_id, i - 1 AS pos,
           CAST(('0x' || substring(md5(array_to_string(words[i:i+7], ' ')), 1, 8)) AS BIGINT) AS gh
    FROM (SELECT doc_id, words, unnest(range(1, len(words) - 6)) AS i
          FROM w WHERE source <> 'src0' AND len(words) >= 8)
),
marked AS (SELECT DISTINCT doc_id, pos FROM cg JOIN bg USING (gh)),
islands AS (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM marked
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + 7 AS span_end,
       MAX(pos) + 7 - MIN(pos) + 1 AS span_tokens
FROM islands GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""


def w_hampel_despike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel-filter despiking over the events series (per event_type,
    ordered by ts): rolling median + MAD over a 5-row frame, spikes
    flagged at 5 MADs and replaced by the rolling median — the robust
    generalization of the reference's fixed sentinel cleaning (F6).
    The oracle re-derives every frame, both medians, and the flag via
    an explicit neighbor self-join."""
    from curw_flo2d_data_manager_spark.operators.despike import hampel_despike

    ev = _events(spark, sf_dir).select("event_id", "event_type", "ts", "value")
    out = hampel_despike(
        ev, ["event_type"], ["ts", "event_id"], "value",
        half_window=2, n_mad=5.0,
    )
    return out.select(
        "event_id",
        F.round("rolling_median", 6).alias("rolling_median"),
        F.round("rolling_mad", 6).alias("rolling_mad"),
        "is_spike",
        F.round("value_clean", 6).alias("value_clean"),
    ).orderBy("event_id")


W_HAMPEL_SQL = """
WITH e AS (
    SELECT event_id, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
    FROM events
),
n AS (
    SELECT a.event_type, a.rn, b.value AS nv
    FROM e a JOIN e b
      ON a.event_type = b.event_type AND b.rn BETWEEN a.rn - 2 AND a.rn + 2
),
m AS (
    SELECT event_type, rn, quantile_cont(nv, 0.5) AS med
    FROM n GROUP BY event_type, rn
),
d AS (
    SELECT n.event_type, n.rn, quantile_cont(abs(n.nv - m.med), 0.5) AS mad
    FROM n JOIN m USING (event_type, rn)
    GROUP BY n.event_type, n.rn
)
SELECT e.event_id,
       ROUND(m.med, 6) AS rolling_median,
       ROUND(d.mad, 6) AS rolling_mad,
       abs(e.value - m.med) > 5.0 * d.mad AS is_spike,
       ROUND(CASE WHEN abs(e.value - m.med) > 5.0 * d.mad
                  THEN m.med ELSE e.value END, 6) AS value_clean
FROM e JOIN m USING (event_type, rn) JOIN d USING (event_type, rn)
ORDER BY e.event_id
"""


def w_hampel_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel despiking keyed by user_id — the HIGH-CARDINALITY
    window-op variant (1500 keys at sf0.1 vs event_type's 5): the
    sf-scaled events table has only 5 event types, so the event_type-
    keyed query measures 5-partition parallelism; this one pins the
    per-key window cost at realistic series cardinality (round-7
    verdict item 5)."""
    from curw_flo2d_data_manager_spark.operators.despike import hampel_despike

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    out = hampel_despike(
        ev, ["user_id"], ["ts", "event_id"], "value",
        half_window=2, n_mad=5.0,
    )
    return out.select(
        "event_id",
        F.round("rolling_median", 6).alias("rolling_median"),
        "is_spike",
        F.round("value_clean", 6).alias("value_clean"),
    ).orderBy("event_id")


W_HAMPEL_USER_SQL = """
WITH e AS (
    SELECT event_id, user_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
),
n AS (
    SELECT a.user_id, a.rn, b.value AS nv
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 2 AND a.rn + 2
),
m AS (
    SELECT user_id, rn, quantile_cont(nv, 0.5) AS med
    FROM n GROUP BY user_id, rn
),
d AS (
    SELECT n.user_id, n.rn, quantile_cont(abs(n.nv - m.med), 0.5) AS mad
    FROM n JOIN m USING (user_id, rn)
    GROUP BY n.user_id, n.rn
)
SELECT e.event_id,
       ROUND(m.med, 6) AS rolling_median,
       abs(e.value - m.med) > 5.0 * d.mad AS is_spike,
       ROUND(CASE WHEN abs(e.value - m.med) > 5.0 * d.mad
                  THEN m.med ELSE e.value END, 6) AS value_clean
FROM e JOIN m USING (user_id, rn) JOIN d USING (user_id, rn)
ORDER BY e.event_id
"""


def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level maximal repeated spans (Lee et al. 2021 exact-
    substring dedup at 8-gram granularity): every maximal run of
    positions whose 8-token gram occurs twice+ corpus-wide, as
    (doc, start, end) spans — the oracle re-derives every gram hash,
    the duplicate-gram set, and the gaps-and-islands merge."""
    from curw_flo2d_data_manager_spark.operators.dedup import repeated_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return repeated_spans(docs, "doc_id", k=8).orderBy(
        "doc_id", "span_start"
    )


DEDUP_SPANS_SQL = r"""
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')), '\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')) != ''
),
g AS (
    SELECT doc_id, i - 1 AS pos,
           CAST(('0x' || substring(md5(array_to_string(words[i:i+7], ' ')), 1, 8)) AS BIGINT) AS gh
    FROM (SELECT doc_id, words, unnest(range(1, len(words) - 6)) AS i
          FROM w WHERE len(words) >= 8)
),
dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
marked AS (SELECT DISTINCT doc_id, pos FROM g JOIN dup USING (gh)),
islands AS (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM marked
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + 7 AS span_end,
       MAX(pos) + 7 - MIN(pos) + 1 AS span_tokens
FROM islands GROUP BY doc_id, grp
ORDER BY doc_id, span_start
"""


def w_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation of gauge gaps (every 7th
    event blanked as the deterministic stand-in for sentinel-cleaned
    readings, F6): per event_type, each NULL is filled proportionally
    between its bracketing real observations by epoch-seconds
    fraction; leading/trailing gaps stay NULL."""
    from curw_flo2d_data_manager_spark.operators.interpolate import (
        linear_interpolate,
    )

    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    out = linear_interpolate(
        ev, ["event_type"], "ts", "value", tiebreak_cols=["event_id"]
    )
    return out.select(
        "event_id",
        "was_gap",
        F.round("value_interp", 6).alias("value_interp"),
    ).orderBy("event_id")


W_INTERP_SQL = """
WITH e AS (
    SELECT event_id, event_type, epoch(ts) AS t,
           CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
    FROM events
),
b AS (
    SELECT event_id, t, v,
           LAST_VALUE(v IGNORE NULLS) OVER pw AS pv,
           LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER pw AS pt,
           FIRST_VALUE(v IGNORE NULLS) OVER fw AS nv,
           FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER fw AS nt
    FROM e
    WINDOW
        pw AS (PARTITION BY event_type ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        fw AS (PARTITION BY event_type ORDER BY t, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id,
       v IS NULL AS was_gap,
       ROUND(CASE WHEN v IS NOT NULL THEN v
                  ELSE pv + (nv - pv) * ((t - pt) / NULLIF(nt - pt, 0))
             END, 6) AS value_interp
FROM b ORDER BY event_id
"""


def w_interp_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation keyed by user_id — the HIGH-CARDINALITY
    variant of ``w_linear_interp`` (1500 keys at sf0.1 vs
    event_type's 5), pinning the per-key window cost at realistic
    series cardinality (round-7 verdict item 5). Every 7th event
    blanked, same bracket semantics."""
    from curw_flo2d_data_manager_spark.operators.interpolate import (
        linear_interpolate,
    )

    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    out = linear_interpolate(
        ev, ["user_id"], "ts", "value", tiebreak_cols=["event_id"]
    )
    return out.select(
        "event_id",
        "was_gap",
        F.round("value_interp", 6).alias("value_interp"),
    ).orderBy("event_id")


W_INTERP_USER_SQL = """
WITH e AS (
    SELECT event_id, user_id, epoch(ts) AS t,
           CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
    FROM events
),
b AS (
    SELECT event_id, t, v,
           LAST_VALUE(v IGNORE NULLS) OVER pw AS pv,
           LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER pw AS pt,
           FIRST_VALUE(v IGNORE NULLS) OVER fw AS nv,
           FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER fw AS nt
    FROM e
    WINDOW
        pw AS (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        fw AS (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id,
       v IS NULL AS was_gap,
       ROUND(CASE WHEN v IS NOT NULL THEN v
                  ELSE pv + (nv - pv) * ((t - pt) / NULLIF(nt - pt, 0))
             END, 6) AS value_interp
FROM b ORDER BY event_id
"""


def w_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal climatology + anomaly: mean value per (event_type,
    hour-of-day) over the whole series (cells under 3 observations
    yield NULL), and each observation's departure from its cell mean —
    the hydrological baseline the reference's gauge jobs imply."""
    from curw_flo2d_data_manager_spark.operators.seasonal import (
        seasonal_baseline,
    )

    ev = _events(spark, sf_dir).select("event_id", "event_type", "ts", "value")
    out = seasonal_baseline(
        ev, ["event_type"], F.hour("ts"), "value", min_obs=3
    )
    return out.select(
        "event_id",
        F.col("_period").alias("hod"),
        F.round("clim_mean", 6).alias("clim_mean"),
        "clim_n",
        F.round("anomaly", 6).alias("anomaly"),
    ).orderBy("event_id")


W_SEASONAL_SQL = """
WITH e AS (
    SELECT event_id, event_type, EXTRACT(hour FROM ts) AS hod, value
    FROM events
),
c AS (
    SELECT event_type, hod, AVG(value) AS m, COUNT(value) AS n
    FROM e GROUP BY 1, 2
)
SELECT e.event_id, e.hod,
       ROUND(CASE WHEN c.n >= 3 THEN c.m END, 6) AS clim_mean,
       c.n AS clim_n,
       ROUND(e.value - CASE WHEN c.n >= 3 THEN c.m END, 6) AS anomaly
FROM e JOIN c USING (event_type, hod)
ORDER BY e.event_id
"""


def sim_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the label-blocked 5-NN graph (damping
    0.85, 5 power iterations from the uniform start): the retrieval-
    authority score of every vector — the oracle re-derives the edge
    set and unrolls all five iterations as chained aggregating CTEs.
    The graph has no dangling nodes (every vector with a same-label
    neighbor has out-degree >= 1), so the operator's dangling term
    contributes exactly 0.0."""
    from curw_flo2d_data_manager_spark.operators.pagerank import pagerank
    from curw_flo2d_data_manager_spark.operators.similarity import knn_graph

    emb = _t(spark, sf_dir, "embeddings")
    edges = knn_graph(emb, k=5, block_col="label")
    pr = pagerank(edges, damping=0.85, iters=5)
    return pr.select(
        F.col("node").alias("vec_id"), F.round("rank", 9).alias("rank")
    ).orderBy("vec_id")


_PR_ITER = """
r{i} AS (
    SELECT n.node, (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c.s, 0.0) AS rank
    FROM nodes n CROSS JOIN nn
    LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank / od.deg) AS s
        FROM edges e
        JOIN r{prev} r ON e.src = r.node
        JOIN od ON e.src = od.src
        GROUP BY e.dst
    ) c ON n.node = c.node
)"""

SIM_PAGERANK_SQL = (
    """
WITH scored AS (
    SELECT a.vec_id AS src, b.vec_id AS dst,
           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id <> b.vec_id
),
ranked AS (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rk
    FROM scored
),
edges AS (SELECT src, dst FROM ranked WHERE rk <= 5),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
od AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),"""
    + ",".join(_PR_ITER.format(i=i, prev=i - 1) for i in range(1, 6))
    + """
SELECT node AS vec_id, ROUND(rank, 9) AS rank FROM r5 ORDER BY vec_id
"""
)


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval (k1=1.2, b=0.75): the 20 highest-scoring
    documents for the query bag {spark, join, window, vector} — the
    oracle re-derives document lengths, idf, and every per-term score
    from the same tokenization."""
    from curw_flo2d_data_manager_spark.operators.textstats import bm25_topk

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(
        docs, "doc_id", ["spark", "join", "window", "vector"], k=20
    ).orderBy("rank")


TEXT_BM25_SQL = r"""
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')), '\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\x80-\x{ffff}-]+', ' ', 'g')) != ''
),
tok AS (SELECT doc_id, unnest(words) AS term FROM w),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tok
    WHERE term IN ('spark', 'join', 'window', 'vector')
    GROUP BY 1, 2
),
dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
s AS (
    SELECT tf.doc_id,
           SUM(
               ln(1.0 + (st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
               * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))
           ) AS sc,
           COUNT(*) AS n_terms_hit
    FROM tf JOIN dfr USING (term) JOIN dl USING (doc_id) CROSS JOIN st
    GROUP BY 1
),
rk AS (
    SELECT doc_id, ROUND(sc, 6) AS score, n_terms_hit,
           ROW_NUMBER() OVER (ORDER BY ROUND(sc, 6) DESC, doc_id) AS rank
    FROM s
)
SELECT doc_id, score, n_terms_hit, rank FROM rk
WHERE rank <= 20 ORDER BY rank
"""


def w_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type EWMA (alpha=0.3) of the value series along
    (ts, event_id) — the inherently-serial-per-series recurrence run
    through the Arrow applyInPandas carve-out, replayed exactly by a
    DuckDB recursive CTE (the fold is `a*x + (1.0-a)*e` in doubles on
    both engines; CAST(0.3 AS DOUBLE) is bit-identical to the Python
    literal)."""
    from curw_flo2d_data_manager_spark.operators.smoothing import ewma

    ev = _events(spark, sf_dir).select("event_id", "event_type", "ts", "value")
    out = ewma(ev, ["event_type"], ["ts", "event_id"], "value", alpha=0.3)
    return out.select(
        "event_id", F.round("value_ewma", 6).alias("value_ewma")
    ).orderBy("event_id")


W_EWMA_SQL = """
WITH RECURSIVE seq AS (
    SELECT event_type, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
    FROM events WHERE value IS NOT NULL
),
rec AS (
    SELECT event_type, event_id, rn, value AS e FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.event_type, s.event_id, s.rn,
           CAST(0.3 AS DOUBLE) * s.value
           + (1.0::DOUBLE - CAST(0.3 AS DOUBLE)) * r.e
    FROM seq s JOIN rec r ON s.event_type = r.event_type AND s.rn = r.rn + 1
)
SELECT e.event_id, ROUND(r.e, 6) AS value_ewma
FROM events e LEFT JOIN rec r USING (event_id)
ORDER BY e.event_id
"""


def sim_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 5 iterations, deterministic
    hash init) over the embeddings corpus — per-vector final cluster
    and rounded squared distance. The oracle replays the ENTIRE fit as
    unrolled CTEs: the same (md5, id) init draw, five rounds of
    rounded-distance argmin assignment + rounded per-dimension means
    (empty clusters keeping their previous centroid), then the final
    consistency assignment against the post-update centroids — so
    (cluster, d2) always refers to the centroid matrix kmeans_fit
    returns."""
    from curw_flo2d_data_manager_spark.operators.kmeans import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    out, _ = kmeans_fit(emb, k=8, iters=5)
    return out.orderBy("vec_id")


def _kmeans_oracle_sql(k: int = 8, iters: int = 5, dim: int = 64) -> str:
    parts = [
        f"""
WITH pts AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c0 AS (
  SELECT rn - 1 AS cluster, list_transform(v, x -> ROUND(x, 4)) AS c
  FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM pts)
  WHERE rn <= {k}
)"""
    ]
    # iters mean-update rounds, then one extra assignment-only round
    # (i == iters+1) mirroring kmeans_fit's final consistency pass
    for i in range(1, iters + 2):
        p = i - 1
        parts.append(
            f""",
d{i} AS (
  SELECT p.vec_id, c.cluster,
         ROUND(list_sum(list_transform(range(1, {dim} + 1),
               t -> (p.v[t] - c.c[t]) * (p.v[t] - c.c[t]))), 2) AS d2
  FROM pts p CROSS JOIN c{p} c
),
a{i} AS (
  SELECT vec_id, cluster, d2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rk
    FROM d{i}
  ) WHERE rk = 1
)"""
        )
        if i <= iters:
            parts.append(
                f""",
c{i} AS (
  SELECT pc.cluster, COALESCE(nc.c, pc.c) AS c
  FROM c{p} pc LEFT JOIN (
    SELECT cluster, list(m ORDER BY pos) AS c FROM (
      SELECT a.cluster, t.i AS pos, ROUND(AVG(p.v[t.i]), 4) AS m
      FROM a{i} a JOIN pts p USING (vec_id), UNNEST(range(1, {dim} + 1)) AS t(i)
      GROUP BY 1, 2
    ) GROUP BY 1
  ) nc USING (cluster)
)"""
            )
    parts.append(
        f"\nSELECT vec_id, cluster, d2 FROM a{iters + 1} ORDER BY vec_id"
    )
    return "".join(parts)


SIM_KMEANS_SQL = _kmeans_oracle_sql()


def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join: maintenance-style windows
    derived from even-user events against forecast-style windows from
    odd-user events (each [ts, ts + 1..5 min]), matched per
    event_type — the bucketed equi-join + first-overlapping-bucket
    dedup vs DuckDB's plain range-predicate join."""
    from curw_flo2d_data_manager_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    ev = _events(spark, sf_dir)
    t = F.col("ts").cast("double")
    base = ev.select(
        "event_type",
        "event_id",
        "user_id",
        t.alias("start"),
        (t + ((F.col("event_id") % 5) + 1) * 60.0).alias("end"),
    )
    a = base.filter(F.col("user_id") % 2 == 0).drop("user_id")
    b = base.filter(F.col("user_id") % 2 == 1).drop("user_id")
    out = interval_overlap_join(
        a, b, "start", "end", by=["event_type"], bucket_seconds=600
    )
    return out.select(
        "event_type",
        F.col("event_id_a").alias("id_a"),
        F.col("event_id_b").alias("id_b"),
        F.round("overlap_seconds", 6).alias("overlap_seconds"),
    ).orderBy("id_a", "id_b")


J_OVERLAP_SQL = """
WITH iv AS (
    SELECT event_type, event_id, user_id, epoch(ts) AS s,
           epoch(ts) + ((event_id % 5) + 1) * 60.0 AS e
    FROM events
)
SELECT a.event_type, a.event_id AS id_a, b.event_id AS id_b,
       ROUND(LEAST(a.e, b.e) - GREATEST(a.s, b.s), 6) AS overlap_seconds
FROM iv a JOIN iv b
  ON a.event_type = b.event_type
 AND a.s <= b.e AND b.s <= a.e
WHERE a.user_id % 2 = 0 AND b.user_id % 2 = 1
ORDER BY id_a, id_b
"""


def w_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type [p05, p95] winsorization of the value series:
    exact continuous percentiles (quantile_cont semantics), values
    clamped into the band, clip flags — the capping counterpart of
    Hampel replacement."""
    from curw_flo2d_data_manager_spark.operators.despike import winsorize

    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    out = winsorize(ev, ["event_type"], "value", lower=0.05, upper=0.95)
    return out.select(
        "event_id",
        F.round("p_lo", 6).alias("p_lo"),
        F.round("p_hi", 6).alias("p_hi"),
        F.round("value_wins", 6).alias("value_wins"),
        "is_clipped",
    ).orderBy("event_id")


W_WINSOR_SQL = """
WITH q AS (
    SELECT event_type,
           quantile_cont(value, 0.05) AS lo,
           quantile_cont(value, 0.95) AS hi
    FROM events GROUP BY 1
)
SELECT e.event_id,
       ROUND(q.lo, 6) AS p_lo,
       ROUND(q.hi, 6) AS p_hi,
       ROUND(CASE WHEN e.value IS NULL THEN NULL
                  ELSE LEAST(GREATEST(e.value, q.lo), q.hi) END, 6)
           AS value_wins,
       (e.value < q.lo OR e.value > q.hi) AS is_clipped
FROM events e JOIN q USING (event_type)
ORDER BY e.event_id
"""


# =====================================================================
# Registry
# =====================================================================

def w_peaks_over_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POT extreme extraction per user series: exceedances of 150
    declustered with a 1-hour runs rule, one peak row per cluster —
    the partial-duration-series shape a flood office derives from the
    reference's extracted gauge series (SURVEY §2.7 extension)."""
    from curw_flo2d_data_manager_spark.operators.extremes import (
        peaks_over_threshold,
    )

    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    out = peaks_over_threshold(
        ev,
        value_col="value",
        ts_col="ts",
        key_cols=["user_id"],
        threshold=150.0,
        min_gap_seconds=3600.0,
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "cluster_seq",
        "peak_ts",
        "peak_event_id",
        F.round("peak_value", 4).alias("peak_value"),
        "cluster_size",
        F.round("excess", 4).alias("excess"),
    ).orderBy("user_id", "cluster_seq")


W_POT_SQL = """
WITH exceed AS (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
    FROM events WHERE value > 150.0
),
lagged AS (
    SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS prev_ts
    FROM exceed
),
clustered AS (
    SELECT user_id, event_id, ts, value,
           CAST(SUM(CASE WHEN prev_ts IS NULL
                           OR epoch(ts) - epoch(prev_ts) > 3600.0
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cluster_seq
    FROM lagged
),
ranked AS (
    SELECT user_id, cluster_seq, ts, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, cluster_seq
                              ORDER BY value DESC, ts, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY user_id, cluster_seq)
             AS cluster_size
    FROM clustered
)
SELECT user_id, cluster_seq, ts AS peak_ts, event_id AS peak_event_id,
       ROUND(value, 4) AS peak_value, cluster_size,
       ROUND(value - 150.0, 4) AS excess
FROM ranked WHERE rn = 1
ORDER BY user_id, cluster_seq
"""


def w_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift statistic per user series via the exact
    prefix-scan identity (operators/extremes.py) — running-frame
    windows only, no serial recurrence, no UDF."""
    from curw_flo2d_data_manager_spark.operators.extremes import cusum_drift

    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    out = cusum_drift(
        ev,
        value_col="value",
        ts_col="ts",
        key_cols=["user_id"],
        target=50.0,
        slack=10.0,
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("cusum_pos", 4).alias("cusum_pos"),
        F.round("cusum_neg", 4).alias("cusum_neg"),
    ).orderBy("event_id")


W_CUSUM_SQL = """
WITH pref AS (
    SELECT user_id, event_id, ts,
           SUM(value - 50.0 - 10.0) OVER w AS p,
           SUM(value - 50.0 + 10.0) OVER w AS n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)
)
SELECT event_id, user_id,
       ROUND(p - LEAST(0.0, MIN(p) OVER w2), 4) AS cusum_pos,
       ROUND(GREATEST(0.0, MAX(n) OVER w2) - n, 4) AS cusum_neg
FROM pref
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING)
ORDER BY event_id
"""


def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-keyed exact dedup: case / punctuation /
    whitespace variants of the same prose collapse to one group
    (deterministic per-doc reformatting noise is planted so the
    normalizer has real work — raw-byte md5 dedup would miss every
    planted variant pair)."""
    from curw_flo2d_data_manager_spark.operators.dedup import exact_dedup
    from curw_flo2d_data_manager_spark.operators.textstats import (
        normalize_for_dedup,
    )

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    variant = (
        F.when(m == 1, F.upper(F.col("text")))
        .when(
            m == 2,
            F.concat(
                F.lit("  "),
                F.regexp_replace(F.col("text"), " ", ",  "),
                F.lit("!!"),
            ),
        )
        .otherwise(F.col("text"))
    )
    corpus = docs.select("doc_id", F.col("text")).unionAll(
        docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            variant.alias("text"),
        )
    )
    normd = corpus.select(
        "doc_id", normalize_for_dedup(F.col("text")).alias("norm")
    )
    out = exact_dedup(normd, ["norm"], "doc_id")
    return out.select("key_hash", "kept_id", "n_dups").orderBy("kept_id")


DEDUP_NORM_SQL = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id,
           CASE WHEN doc_id % 3 = 1 THEN upper(text)
                WHEN doc_id % 3 = 2
                  THEN '  ' || regexp_replace(text, ' ', ',  ', 'g') || '!!'
                ELSE text END AS text
    FROM documents
),
n AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
    FROM corpus
)
SELECT sha256(norm) AS key_hash, MIN(doc_id) AS kept_id,
       COUNT(*) AS n_dups
FROM n GROUP BY norm ORDER BY kept_id
"""


def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-level URL dedup: synthetic per-doc URLs carrying the
    full zoo of crawl noise (http/https, www, trailing slash,
    tracking params, param order) are canonicalized
    (operators/textstats.canonicalize_url) and grouped — the
    dedup-by-resource step that runs before any content hash at
    crawl scale."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        canonicalize_url,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(d % 5 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("site"), (d % 3).cast("string"),
        F.lit(".org/p/"), (d % 10).cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            d % 4 == 0,
            F.concat(F.lit("?utm_source=feed&id="), (d % 2).cast("string")),
        )
        .when(
            d % 4 == 1,
            F.concat(F.lit("?id="), (d % 2).cast("string"),
                     F.lit("&utm_campaign=x")),
        )
        .when(d % 4 == 2, F.concat(F.lit("?id="), (d % 2).cast("string")))
        .otherwise(F.concat(F.lit("?fbclid=abc"), d.cast("string"))),
    )
    return (
        docs.select("doc_id", canonicalize_url(url).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("canonical_url")
    )


DEDUP_URL_SQL = """
WITH u AS (
    SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) ||
           (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END) ||
           'site' || (doc_id % 3) || '.org/p/' || (doc_id % 10) ||
           (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
           (CASE WHEN doc_id % 4 = 0
                   THEN '?utm_source=feed&id=' || (doc_id % 2)
                 WHEN doc_id % 4 = 1
                   THEN '?id=' || (doc_id % 2) || '&utm_campaign=x'
                 WHEN doc_id % 4 = 2 THEN '?id=' || (doc_id % 2)
                 ELSE '?fbclid=abc' || doc_id END) AS url
    FROM documents
),
s1 AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
               lower(trim(url)), '^https?://', ''), '^www\\.', ''),
               '#.*$', '') AS u
    FROM u
),
parts AS (
    SELECT doc_id,
           regexp_replace(split_part(u, '?', 1), '/+$', '') AS base,
           CASE WHEN position('?' IN u) > 0
                THEN substr(u, position('?' IN u) + 1) ELSE '' END AS q
    FROM s1
),
canon AS (
    SELECT doc_id, base,
           list_sort(list_filter(string_split(q, '&'),
               p -> p <> '' AND NOT regexp_matches(
                   p, '^(utm_[a-z0-9]+|fbclid|gclid|ref)='))) AS ps
    FROM parts
)
SELECT CASE WHEN len(ps) > 0
            THEN base || '?' || array_to_string(ps, '&')
            ELSE base END AS canonical_url,
       MIN(doc_id) AS first_doc, COUNT(*) AS n_docs
FROM canon GROUP BY 1 ORDER BY canonical_url
"""


def a_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values per event_type over the
    GLOBAL [min, max] (bins comparable across groups) — two
    partial-agg passes, final shuffle cardinality = |groups| × bins
    regardless of row count."""
    from curw_flo2d_data_manager_spark.operators.histogram import (
        equi_width_histogram,
    )

    ev = _events(spark, sf_dir)
    out = equi_width_histogram(ev, "value", ["event_type"], bins=10)
    return out.select(
        "event_type",
        "bin",
        F.round("bin_lo", 6).alias("bin_lo"),
        "n",
    ).orderBy("event_type", "bin")


A_HISTOGRAM_SQL = """
WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
binned AS (
    SELECT event_type,
           CASE WHEN hi = lo THEN 0
                ELSE LEAST(9, CAST(FLOOR((value - lo) / ((hi - lo) / 10.0))
                                   AS BIGINT)) END AS bin,
           lo, hi
    FROM events, b WHERE value IS NOT NULL
)
SELECT event_type, bin,
       ROUND(lo + bin * ((hi - lo) / 10.0), 6) AS bin_lo,
       COUNT(*) AS n
FROM binned GROUP BY event_type, bin, lo, hi
ORDER BY event_type, bin
"""


def j_radius_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big×big spatial radius join via fixed-grid bucketing
    (operators/spatial.py): customers vs suppliers on deterministic
    derived coordinates, all pairs within radius 1.5 — the scale
    generalization of the reference's nearest-station broadcast
    (grids.py cell→gauge mappings) when neither side broadcasts.
    The oracle is DuckDB's PLAIN cross-join distance predicate, so
    the grid decomposition itself is value-certified."""
    from curw_flo2d_data_manager_spark.operators.spatial import (
        radius_grid_join,
    )

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 97) / 7.0).alias("x"),
        ((F.col("c_custkey") % 89) / 7.0).alias("y"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") % 97) / 7.0 + 0.3).alias("x"),
        ((F.col("s_suppkey") % 89) / 7.0 + 0.3).alias("y"),
    )
    out = radius_grid_join(cust, supp, radius=1.5)
    return out.select(
        "c_custkey",
        "s_suppkey",
        F.round("dist", 6).alias("dist"),
    ).orderBy("c_custkey", "s_suppkey")


J_RADIUS_SQL = """
WITH c AS (SELECT c_custkey, (c_custkey % 97) / 7.0 AS xc,
                  (c_custkey % 89) / 7.0 AS yc FROM customer),
s AS (SELECT s_suppkey, (s_suppkey % 97) / 7.0 + 0.3 AS xs,
             (s_suppkey % 89) / 7.0 + 0.3 AS ys FROM supplier)
SELECT c_custkey, s_suppkey,
       ROUND(sqrt((xc - xs) * (xc - xs) + (yc - ys) * (yc - ys)), 6)
         AS dist
FROM c, s
WHERE (xc - xs) * (xc - xs) + (yc - ys) * (yc - ys) <= 1.5 * 1.5
ORDER BY c_custkey, s_suppkey
"""


def sim_sq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar-quantized ANN (SQ8): per-dimension [min,max]
    trained in one scalar-aggregate pass, codes = clamped bin index,
    ADC by bin-midpoint reconstruction, two-stage top-k ranking
    (InferWindowGroupLimit). The oracle re-derives the bounds, every
    code, and every ADC sum with the same left-associated arithmetic
    — both halves of the quantizer are value-gated."""
    from curw_flo2d_data_manager_spark.operators.similarity import (
        sq_adc_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sq_adc_topk(emb, qs, k=5)
    return out.select(
        "query_id", "corpus_id", F.round("adc", 6).alias("adc"), "rank"
    ).orderBy("query_id", "rank")


def _sq_sql(dim: int = 64, k: int = 5) -> str:
    """Generate the DuckDB oracle for ``sim_sq_adc``: bounds via the
    same MIN/MAX aggregates, codes via the same clamp, ADC as an
    explicit left-associated term chain mirroring Spark's sequential
    aggregate fold — bit-identical doubles, so ranks match exactly."""
    los = ", ".join(f"MIN(v[{j}])" for j in range(1, dim + 1))
    steps = ", ".join(
        f"(MAX(v[{j}]) - MIN(v[{j}])) / 256.0" for j in range(1, dim + 1)
    )
    code_items = ", ".join(
        f"CASE WHEN step[{j}] = 0 THEN 0 ELSE "
        f"LEAST(255, GREATEST(0, CAST(FLOOR((v[{j}] - lo[{j}]) / step[{j}])"
        f" AS INTEGER))) END"
        for j in range(1, dim + 1)
    )
    adc = "0.0" + "".join(
        f" + ((qv[{j}] - (lo[{j}] + (code[{j}] + 0.5) * step[{j}])) * "
        f"(qv[{j}] - (lo[{j}] + (code[{j}] + 0.5) * step[{j}])))"
        for j in range(1, dim + 1)
    )
    return f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT [{los}] AS lo, [{steps}] AS step FROM c),
codes AS (
    SELECT vec_id, [{code_items}] AS code
    FROM c CROSS JOIN b
),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 3),
pairs AS (
    SELECT q.query_id, codes.vec_id AS corpus_id, {adc} AS adc
    FROM codes CROSS JOIN b CROSS JOIN q
),
ranked AS (
    SELECT query_id, corpus_id, adc,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc, corpus_id) AS rank
    FROM pairs
)
SELECT query_id, corpus_id, ROUND(adc, 6) AS adc, rank
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


SIM_SQ_SQL = _sq_sql()


def stream_pot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming peaks-over-threshold: two days of per-user events
    replayed through a file stream; exceedances of 150 cluster in
    1-hour session windows (the runs-declustering gap), each
    watermark-closed cluster emitting its peak. Must match the batch
    POT oracle (gap of exactly 1 h starts a new cluster on both
    paths — session_window's [start, end) convention)."""
    import tempfile

    ev = _events(spark, sf_dir, end="2024-01-03 00:00:00").filter(
        F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    src = tempfile.mkdtemp(prefix="stream_pot_src_")
    rows = ev.select(
        F.col("user_id").cast("string").alias("id"),
        F.col("ts").alias("time"),
        "value",
    )
    # sentinel exceedance per key, a day past the slice: advances the
    # watermark beyond every real cluster so append mode emits them;
    # the sentinels' own clusters stay open and unemitted
    sentinels = rows.select("id").distinct().select(
        "id",
        F.lit("2024-01-04 00:00:00").cast("timestamp").alias("time"),
        F.lit(9999.0).alias("value"),
    )
    rows.unionByName(sentinels).coalesce(1).write.mode("overwrite").parquet(src)

    from curw_flo2d_data_manager_spark.streaming import streaming_pot

    name = _run_replay_stream(
        spark, src,
        lambda s: streaming_pot(
            s, threshold=150.0, gap="1 hour", group_cols=["id"]
        ),
        "stream_pot_", "append",
    )
    return (
        spark.table(name)
        .filter(
            F.col("cluster_start")
            < F.lit("2024-01-03 00:00:00").cast("timestamp")
        )
        .select(
            F.col("id").cast("long").alias("user_id"),
            "cluster_start",
            "n_exceed",
            F.round("peak_value", 4).alias("peak_value"),
        )
        .orderBy("user_id", "cluster_start")
    )


STREAM_POT_SQL = """
WITH exceed AS (
  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts
  FROM events
  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00'
    AND value > 150.0),
lagged AS (
  SELECT user_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_ts
  FROM exceed),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) >= 3600 THEN 1
              ELSE 0 END AS is_new
  FROM lagged),
clustered AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS cluster_seq
  FROM flagged)
SELECT user_id, MIN(ts) AS cluster_start, COUNT(*) AS n_exceed,
       ROUND(MAX(value), 4) AS peak_value
FROM clustered
GROUP BY user_id, cluster_seq
ORDER BY user_id, cluster_start
"""


def w_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series rate of rise (the flash-flood alert primitive the
    reference's water-level series feed downstream): value delta over
    time delta per hour via lag, surge flag above a threshold.
    Simultaneous-timestamp pairs yield NULL rate (no division by
    zero), matching SQL NULLIF semantics."""
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    dv = F.col("value") - F.lag("value").over(w)
    rate = F.when(dt > 0, dv / dt * 3600.0)
    return (
        ev.withColumn("rate_per_hour", rate)
        .select(
            "event_id",
            "user_id",
            F.round("rate_per_hour", 4).alias("rate_per_hour"),
            (F.col("rate_per_hour") > 200.0).alias("is_surge"),
        )
        .orderBy("event_id")
    )


W_RATE_SQL = """
WITH lagged AS (
  SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts,
         LAG(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts,
         LAG(value) OVER w AS prev_v
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
r AS (
  SELECT event_id, user_id,
         CASE WHEN epoch(ts) - epoch(prev_ts) > 0
              THEN (value - prev_v) / (epoch(ts) - epoch(prev_ts)) * 3600.0
              END AS rate_per_hour
  FROM lagged
)
SELECT event_id, user_id, ROUND(rate_per_hour, 4) AS rate_per_hour,
       rate_per_hour > 200.0 AS is_surge
FROM r ORDER BY event_id
"""


def x_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): per user,
    the earliest time of each step AFTER the previous step completed
    and within a 6-hour conversion window of it, then conversion
    counts per reached depth. Three conditional-min
    aggregates with broadcast joins back — no per-user event
    materialization, so the shape holds when one user has 10⁹
    events."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(t1), "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (
                F.col("ts").cast("double")
                <= F.col("t1").cast("double") + 21600.0
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(t2), "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (
                F.col("ts").cast("double")
                <= F.col("t2").cast("double") + 21600.0
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    depth = (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("t2").isNotNull().cast("int")
                + F.col("t3").isNotNull().cast("int")
            ).alias("depth"),
        )
    )
    return (
        depth.groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("depth")
    )


X_FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > t1.t1
    AND epoch(CAST(e.ts AS TIMESTAMP)) <= epoch(t1.t1) + 21600.0
  GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > t2.t2
    AND epoch(CAST(e.ts AS TIMESTAMP)) <= epoch(t2.t2) + 21600.0
  GROUP BY e.user_id),
depth AS (
  SELECT t1.user_id,
         1 + CASE WHEN t2.user_id IS NULL THEN 0 ELSE 1 END
           + CASE WHEN t3.user_id IS NULL THEN 0 ELSE 1 END AS depth
  FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
          LEFT JOIN t3 ON t1.user_id = t3.user_id)
SELECT depth, COUNT(*) AS n_users FROM depth
GROUP BY depth ORDER BY depth
"""


def f_zscore_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source z-score calibration of a document-length signal —
    the parametric sibling of f_quantile_norm: one partial aggregate
    to |sources| rows broadcast back; the corpus never shuffles."""
    from curw_flo2d_data_manager_spark.operators.sampling import (
        zscore_normalize,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("score")
    )
    out = zscore_normalize(docs, ["source"], "score")
    return out.select(
        "doc_id", "source", F.round("score_z", 6).alias("score_z")
    ).orderBy("doc_id")


F_ZSCORE_SQL = """
WITH stats AS (
    SELECT source, AVG(CAST(n_chars AS DOUBLE)) AS mu,
           STDDEV_POP(CAST(n_chars AS DOUBLE)) AS sigma
    FROM documents GROUP BY source
)
SELECT d.doc_id, d.source,
       ROUND(CASE WHEN s.sigma > 0
                  THEN (CAST(d.n_chars AS DOUBLE) - s.mu) / s.sigma
                  END, 6) AS score_z
FROM documents d JOIN stats s ON d.source = s.source
ORDER BY d.doc_id
"""


def f_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source median/MAD calibration of the document-length
    signal — the outlier-resistant sibling of f_zscore_norm (one
    10 MB page in a small domain drags μ/σ arbitrarily; median/MAD
    has a 50% breakdown point). Two partial aggregates broadcast
    back; the corpus never shuffles."""
    from curw_flo2d_data_manager_spark.operators.sampling import (
        robust_scale,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("score")
    )
    out = robust_scale(docs, ["source"], "score")
    return out.select(
        "doc_id",
        "source",
        F.round("score_robust", 6).alias("score_robust"),
    ).orderBy("doc_id")


F_ROBUST_SQL = """
WITH med AS (
    SELECT source, MEDIAN(CAST(n_chars AS DOUBLE)) AS med
    FROM documents GROUP BY source
),
mad AS (
    SELECT d.source,
           MEDIAN(ABS(CAST(d.n_chars AS DOUBLE) - m.med)) AS mad
    FROM documents d JOIN med m USING (source)
    GROUP BY d.source
)
SELECT d.doc_id, d.source,
       ROUND(CASE WHEN a.mad > 0
                  THEN (CAST(d.n_chars AS DOUBLE) - m.med) / a.mad
                  END, 6) AS score_robust
FROM documents d
JOIN med m USING (source)
JOIN mad a USING (source)
ORDER BY d.doc_id
"""


def a_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: events grouped by the 5-value
    ``event_type`` key — exactly the hot-key shape where one reducer
    per key straggles at 100 TB. ``salted_sum`` fans each key over 16
    deterministic salts (partial agg on (key, salt), final agg on
    key); the result must equal a direct GROUP BY, which IS the
    oracle. Sums rounded to 2 (double summation order differs between
    the two-phase tree and DuckDB's serial fold)."""
    from curw_flo2d_data_manager_spark.operators.skew import salted_sum

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "value", "event_id", "user_id"
    )
    out = salted_sum(
        ev,
        ["event_type"],
        {"value": "sum", "event_id": "count", "user_id": "max"},
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.round("value", 2).alias("sum_value"),
        F.col("event_id").alias("n_events"),
        F.col("user_id").alias("max_user"),
    ).orderBy("event_type")


A_SALTED_SQL = """
SELECT event_type,
       ROUND(SUM(value), 2) AS sum_value,
       COUNT(event_id)      AS n_events,
       MAX(user_id)         AS max_user
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def j_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe hot-key join: every event joins its type's average
    (a 5-row dimension — the degenerate-cardinality case where ALL
    probe rows share 5 join keys). ``salted_join`` replicates the dim
    8× and joins on (key, salt) so each hot key spreads over 8
    reducers; results must equal the plain equi-join, which IS the
    oracle."""
    from curw_flo2d_data_manager_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    joined = salted_join(ev, dim, ["event_type"], n_salts=8)
    return joined.select(
        "event_id",
        "event_type",
        F.round(F.col("value") - F.col("type_avg"), 6).alias("delta"),
    ).orderBy("event_id")


J_SALTED_SQL = """
WITH dim AS (
    SELECT event_type, AVG(value) AS type_avg
    FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       ROUND(e.value - d.type_avg, 6) AS delta
FROM events e JOIN dim d USING (event_type)
ORDER BY e.event_id
"""


def x_zorder_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) index over (value, user_id): the write-time
    layout key that makes parquet row-group min/max stats prune range
    scans on EITHER column. One stats pass normalizes each column
    onto [0, 2^16), then the quantized bits interleave into one long
    — a pure codegen expression, no shuffle until the layout sort.
    The oracle replays the identical affine quantization (TRUNC
    matches Spark's toward-zero long cast) and bit interleave in
    DuckDB arithmetic."""
    from curw_flo2d_data_manager_spark.operators.zorder import zorder_index

    ev = _t(spark, sf_dir, "events").select("event_id", "value", "user_id")
    row = ev.agg(
        F.min(F.col("value").cast("double")).alias("lo_v"),
        F.max(F.col("value").cast("double")).alias("hi_v"),
        F.min(F.col("user_id").cast("double")).alias("lo_u"),
        F.max(F.col("user_id").cast("double")).alias("hi_u"),
    ).collect()[0]
    z = zorder_index(
        ["value", "user_id"],
        [row["lo_v"], row["lo_u"]],
        [row["hi_v"], row["hi_u"]],
        bits=16,
    )
    return (
        ev.select("event_id", z.alias("zval"))
        .orderBy("zval", "event_id")
    )


def _zorder_oracle_sql(bits: int = 16) -> str:
    """DuckDB replica of operators/zorder.py::zorder_index over
    (value, user_id): affine-quantize each column onto [0, 2^bits)
    with the same left-associated double arithmetic and toward-zero
    truncation, clamp, NULL→0, then interleave bit b of column i to
    position b*2+i."""
    top = (1 << bits) - 1
    quant = (
        "COALESCE(LEAST({top}, GREATEST(0, CAST(TRUNC("
        "(CAST(e.{col} AS DOUBLE) - s.lo_{s}) / (s.hi_{s} - s.lo_{s})"
        " * {top}.0) AS BIGINT))), 0)"
    )
    terms = []
    for b in range(bits):
        for i, q in enumerate(("qv", "qu")):
            # full-term parens: DuckDB gives << LOWER precedence than
            # +, so unparenthesized terms joined with + would chain
            # the shifts
            terms.append(f"((({q} >> {b}) & 1) << {b * 2 + i})")
    interleave = "\n         + ".join(terms)
    return f"""
WITH stats AS (
    SELECT MIN(CAST(value AS DOUBLE))   AS lo_v,
           MAX(CAST(value AS DOUBLE))   AS hi_v,
           MIN(CAST(user_id AS DOUBLE)) AS lo_u,
           MAX(CAST(user_id AS DOUBLE)) AS hi_u
    FROM events
),
q AS (
    SELECT e.event_id,
           {quant.format(top=top, col="value", s="v")} AS qv,
           {quant.format(top=top, col="user_id", s="u")} AS qu
    FROM events e CROSS JOIN stats s
)
SELECT event_id,
       ({interleave}) AS zval
FROM q
ORDER BY zval, event_id
"""


X_ZORDER_SQL = _zorder_oracle_sql()


def stream_hot_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hot-term detection: documents replayed through a
    file stream with synthetic hourly event times (doc_id mod 48 →
    48 one-hour windows over two days); tokens counted per
    (window, term) and a window's heavy hitters (n ≥ 5) emit when the
    watermark closes it. A far-future sentinel doc advances the
    watermark past every real window so append mode emits them all;
    results must equal the batch GROUP BY, which IS the oracle."""
    import tempfile

    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    rows = docs.select(
        (
            base
            + F.make_interval(
                hours=(F.col("doc_id") % 48).cast("int")
            )
        ).alias("time"),
        "text",
    )
    sentinel = spark.range(1).select(
        F.lit("2024-01-10 00:00:00").cast("timestamp").alias("time"),
        F.lit("sentinel").alias("text"),
    )
    src = tempfile.mkdtemp(prefix="stream_hot_src_")
    rows.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(src)

    from curw_flo2d_data_manager_spark.streaming import streaming_hot_terms

    schema = StructType(
        [
            StructField("time", TimestampType(), True),
            StructField("text", StringType(), True),
        ]
    )
    name = _run_replay_stream(
        spark,
        src,
        lambda s: streaming_hot_terms(s, min_count=5, window="1 hour"),
        "stream_hot_",
        "append",
        schema=schema,
    )
    return (
        spark.table(name)
        .filter(
            F.col("window_start")
            < F.lit("2024-01-03 00:00:00").cast("timestamp")
        )
        .select("window_start", "term", "n")
        .orderBy("window_start", "term")
    )


STREAM_HOT_SQL = """
WITH toks AS (
    SELECT TIMESTAMP '2024-01-01 00:00:00'
               + (doc_id % 48) * INTERVAL 1 HOUR AS window_start,
           UNNEST(string_split_regex(
               trim(regexp_replace(lower(text),
                    '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')),
               '\\s+')) AS term
    FROM documents
)
SELECT window_start, term, COUNT(*) AS n
FROM toks
WHERE term <> ''
GROUP BY window_start, term
HAVING COUNT(*) >= 5
ORDER BY window_start, term
"""


def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf rank-frequency slope — natural text ≈ −1,
    templated/synthetic domains drift off it. Term counts collapse
    the corpus to per-source vocabulary before any shuffle; the rank
    window runs over vocab rows only; regr_slope is a partial-
    aggregable least-squares fold. Ranks tie-break by term so both
    engines fit identical points."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        zipf_slope,
    )

    docs = _t(spark, sf_dir, "documents").select("source", "text")
    return zipf_slope(docs, ["source"], min_count=2).orderBy("source")


TEXT_ZIPF_SQL = """
WITH toks AS (
    SELECT source,
           UNNEST(string_split_regex(
               trim(regexp_replace(lower(text),
                    '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')),
               '\\s+')) AS term
    FROM documents
),
counts AS (
    SELECT source, term, COUNT(*) AS n
    FROM toks WHERE term <> ''
    GROUP BY source, term
    HAVING COUNT(*) >= 2
),
ranked AS (
    SELECT source, n,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n DESC, term) AS rank
    FROM counts
)
SELECT source,
       ROUND(REGR_SLOPE(LN(n), LN(rank)), 6) AS zipf_slope,
       COUNT(*) AS vocab
FROM ranked
GROUP BY source
ORDER BY source
"""


def a_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-binned) histogram of l_extendedprice in 8
    bins — the selectivity-stats layout: one exact percentile
    aggregate for the 7 edges, broadcast back, bin assignment as a
    codegen fold (Σ 1[v > edge]), final shuffle cardinality = bins."""
    from curw_flo2d_data_manager_spark.operators.histogram import (
        equi_depth_histogram,
    )

    li = _t(spark, sf_dir, "lineitem")
    out = equi_depth_histogram(li, "l_extendedprice", bins=8)
    return out.select(
        "bin",
        "n",
        F.round("lo", 4).alias("lo"),
        F.round("hi", 4).alias("hi"),
    ).orderBy("bin")


A_EQUIDEPTH_SQL = """
WITH e AS (
    SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE),
                         [0.125, 0.25, 0.375, 0.5,
                          0.625, 0.75, 0.875]) AS edges
    FROM lineitem WHERE l_extendedprice IS NOT NULL
),
binned AS (
    SELECT CAST(l_extendedprice AS DOUBLE) AS v,
           len(list_filter(e.edges,
                           x -> CAST(l_extendedprice AS DOUBLE) > x))
               AS bin
    FROM lineitem CROSS JOIN e
    WHERE l_extendedprice IS NOT NULL
)
SELECT bin, COUNT(*) AS n,
       ROUND(MIN(v), 4) AS lo, ROUND(MAX(v), 4) AS hi
FROM binned
GROUP BY bin
ORDER BY bin
"""


def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval: cosine top-20 candidates per query
    re-ranked greedily to 5 by λ·rel − (1−λ)·max-sim-to-selected.
    Operates on the result relation (5 queries × 20 candidates), the
    corpus never re-enters; every greedy round advances ALL queries in
    parallel via a max(struct) argmax, no per-query Python. Scores
    round to 9 decimals before every argmax so the greedy trace is
    float-robust and the DuckDB oracle replays it exactly (the 1−λ
    constant is emitted as repr(1.0 − λ) so both engines multiply by
    the same IEEE double)."""
    from curw_flo2d_data_manager_spark.operators.similarity import (
        mmr_rerank,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = cosine_topk(emb, queries, k=20)
    cands = topk.join(
        emb.select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").alias("vec"),
        ),
        "corpus_id",
    )
    out = mmr_rerank(cands, k=5, lam=0.7, rel_col="cosine")
    return out.select(
        "query_id",
        "corpus_id",
        "mmr_rank",
        F.round("mmr_score", 6).alias("mmr_score"),
    ).orderBy("query_id", "mmr_rank")


def _mmr_oracle_sql(
    k: int = 5, lam: float = 0.7, n_cand: int = 20, round_to: int = 9
) -> str:
    """DuckDB replica of operators/similarity.py::mmr_rerank over the
    cosine top-20 candidate relation: identical rounding points,
    identical tiebreaks, greedy rounds unrolled as CTEs."""
    l1, l2 = repr(lam), repr(1.0 - lam)
    sql = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv
    FROM embeddings WHERE vec_id < 5
),
scored AS (
    SELECT q.query_id, e.vec_id AS corpus_id, e.embedding AS cv,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                  CAST(q.qv AS DOUBLE[])) AS cos_raw
    FROM embeddings e CROSS JOIN q
),
cand AS (
    SELECT query_id, corpus_id, cv, ROUND(cos_raw, {round_to}) AS rel
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, corpus_id)
            <= {n_cand}
),
sims AS (
    SELECT a.query_id, a.corpus_id AS id_a, b.corpus_id AS id_b,
           ROUND(list_cosine_similarity(CAST(a.cv AS DOUBLE[]),
                                        CAST(b.cv AS DOUBLE[])),
                 {round_to}) AS sim
    FROM cand a JOIN cand b
      ON a.query_id = b.query_id AND a.corpus_id <> b.corpus_id
),
sel1 AS (
    SELECT query_id, corpus_id, rel AS mmr_score, 1 AS mmr_rank
    FROM cand
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rel DESC, corpus_id) = 1
)"""
    for i in range(2, k + 1):
        prev = f"sel{i - 1}"
        sql += f""",
s{i} AS (
    SELECT query_id, corpus_id, score AS mmr_score, {i} AS mmr_rank
    FROM (
        SELECT c.query_id, c.corpus_id,
               ROUND({l1} * c.rel - {l2} * MAX(m.sim),
                     {round_to}) AS score
        FROM cand c
        JOIN sims m ON m.query_id = c.query_id AND m.id_a = c.corpus_id
        JOIN {prev} s ON s.query_id = m.query_id
                     AND s.corpus_id = m.id_b
        WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                          WHERE x.query_id = c.query_id
                            AND x.corpus_id = c.corpus_id)
        GROUP BY c.query_id, c.corpus_id, c.rel
    )
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, corpus_id) = 1
),
sel{i} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM s{i})"""
    return sql + f"""
SELECT query_id, corpus_id, mmr_rank, ROUND(mmr_score, 6) AS mmr_score
FROM sel{k}
ORDER BY query_id, mmr_rank
"""


SIM_MMR_SQL = _mmr_oracle_sql()


def w_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-1 autocorrelation of event values — the
    persistence/whiteness signal (≈0 for independent readings, →1 for
    sticky sensors, <0 for alternating artifacts; the cheap test for
    'is this series worth a seasonal model'). One key shuffle: the lag
    window and the corr aggregate share the same (user_id) exchange;
    corr is a partial-aggregable moments fold, so no per-key
    materialization anywhere."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.withColumn("prev", F.lag("value").over(w))
    return (
        lagged.groupBy("user_id")
        .agg(
            F.round(F.corr("value", "prev"), 6).alias("lag1_corr"),
            F.count("prev").alias("n_pairs"),
        )
        .orderBy("user_id")
    )


W_AUTOCORR_SQL = """
WITH lagged AS (
    SELECT user_id, value,
           LAG(value) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS prev
    FROM events
)
SELECT user_id,
       ROUND(CORR(value, prev), 6) AS lag1_corr,
       COUNT(prev) AS n_pairs
FROM lagged
GROUP BY user_id
ORDER BY user_id
"""


def w_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of event values over time (least-squares
    slope per hour + intercept) — the direction-and-rate drift signal
    next to w_autocorr's persistence and w_cusum_drift's changepoint.
    Pure partial-aggregable moments folds (regr_slope/regr_intercept),
    one key shuffle, no window at all."""
    x = (
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).cast(
            "double"
        )
        / 3600.0
    )
    return (
        _events(spark, sf_dir)
        .select("user_id", x.alias("x"), "value")
        .groupBy("user_id")
        .agg(
            F.round(F.regr_slope(F.col("value"), F.col("x")), 6).alias(
                "slope_per_hour"
            ),
            F.round(
                F.regr_intercept(F.col("value"), F.col("x")), 4
            ).alias("intercept"),
            F.count("value").alias("n_obs"),
        )
        .orderBy("user_id")
    )


W_TREND_SQL = """
SELECT user_id,
       ROUND(REGR_SLOPE(value, epoch(date_trunc('second', ts)) / 3600.0),
             6) AS slope_per_hour,
       ROUND(REGR_INTERCEPT(value,
                            epoch(date_trunc('second', ts)) / 3600.0),
             4) AS intercept,
       COUNT(value) AS n_obs
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def text_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate-line stripping (lines in ≥ 25
    distinct docs = site furniture): per-doc cleaned-text md5 +
    removal census. The synthetic docs are single-line, so the gate
    plants the crawl artifact deterministically — every page gains a
    universal footer and a per-source banner (both recur across ≥ 25
    docs → stripped; the body line survives unless its text itself
    recurs that widely). The anti join ships 8-byte line hashes; the
    one corpus shuffle is the ordered reassembly."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        strip_boilerplate_lines,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("copyright footer all rights reserved"),
            F.concat(F.lit("section "), F.col("source")),
        ).alias("text"),
    )
    out = strip_boilerplate_lines(
        docs, "doc_id", min_doc_freq=25
    )
    return out.select(
        "doc_id",
        F.md5("text_clean").alias("clean_md5"),
        "n_lines",
        "n_removed",
    ).orderBy("doc_id")


TEXT_BOILERPLATE_SQL = """
WITH arrs AS (
    SELECT doc_id,
           string_split(
               text || chr(10) ||
               'copyright footer all rights reserved' || chr(10) ||
               'section ' || source,
               chr(10)) AS arr
    FROM documents
),
lines AS (
    SELECT doc_id,
           UNNEST(generate_series(1, len(arr))) AS pos,
           UNNEST(arr) AS line,
           trim(UNNEST(arr)) AS t
    FROM arrs
),
boiler AS (
    SELECT t FROM (
        SELECT DISTINCT doc_id, t FROM lines WHERE t <> ''
    ) GROUP BY t HAVING COUNT(*) >= 25
),
kept AS (
    SELECT l.doc_id, l.pos, l.line
    FROM lines l
    WHERE NOT EXISTS (SELECT 1 FROM boiler b WHERE b.t = l.t)
),
rebuilt AS (
    SELECT doc_id,
           COALESCE(string_agg(line, chr(10) ORDER BY pos), '')
               AS text_clean,
           COUNT(*) AS n_kept
    FROM kept GROUP BY doc_id
),
totals AS (
    SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id
)
SELECT t.doc_id, md5(COALESCE(r.text_clean, '')) AS clean_md5,
       t.n_lines, t.n_lines - COALESCE(r.n_kept, 0) AS n_removed
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
ORDER BY t.doc_id
"""


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (|A∩B|/|A| ≥ 0.8 on distinct
    token sets) via rare-token blocking — the quote/subset duplicates
    Jaccard-based dedup misses. Candidates = each doc's 3 globally
    rarest tokens against the inverted index (volume Σ df(rare),
    never n²); exact intersection counts only on candidates. Full
    containment is guaranteed-recall; partial is heuristic (a miss
    needs every rare token in the dropped fraction)."""
    from curw_flo2d_data_manager_spark.operators.dedup import (
        containment_pairs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = containment_pairs(
        docs, "doc_id", threshold=0.8, min_tokens=5, n_rare=3
    )
    # templated corpora make the raw pair relation huge (144k pairs at
    # sf0.01); the gate certifies the per-doc containment SUMMARY —
    # every pair still flows through the aggregate
    return (
        pairs.groupBy("id_small")
        .agg(
            F.count(F.lit(1)).alias("n_containers"),
            F.max("containment").alias("max_containment"),
            F.min("id_big").alias("first_container"),
        )
        .orderBy("id_small")
    )


DEDUP_CONTAINMENT_SQL = """
WITH toks AS (
    SELECT DISTINCT doc_id AS doc, t.token
    FROM documents,
         LATERAL (
             SELECT UNNEST(string_split_regex(
                 trim(regexp_replace(lower(text),
                      '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')),
                 '\\s+')) AS token
         ) t
    WHERE t.token <> ''
),
sizes AS (
    SELECT doc, COUNT(*) AS n_tok FROM toks GROUP BY doc
),
eligible AS (SELECT doc, n_tok FROM sizes WHERE n_tok >= 5),
toks_e AS (SELECT t.* FROM toks t JOIN eligible e USING (doc)),
dfreq AS (SELECT token, COUNT(*) AS df FROM toks_e GROUP BY token),
rare AS (
    SELECT doc AS id_small, token FROM (
        SELECT t.doc, t.token, d.df,
               ROW_NUMBER() OVER (PARTITION BY t.doc
                                  ORDER BY d.df ASC, t.token ASC) AS r
        FROM toks_e t JOIN dfreq d USING (token)
    ) WHERE r <= 3 AND df <= 1000
),
cand AS (
    SELECT DISTINCT r.id_small, t.doc AS id_big
    FROM rare r JOIN toks_e t USING (token)
    WHERE r.id_small <> t.doc
),
inter AS (
    SELECT c.id_small, c.id_big, COUNT(*) AS n_inter
    FROM cand c
    JOIN toks_e a ON a.doc = c.id_small
    JOIN toks_e b ON b.doc = c.id_big AND b.token = a.token
    GROUP BY c.id_small, c.id_big
)
, pairs AS (
    SELECT i.id_small, i.id_big,
           ROUND(i.n_inter * 1.0 / e.n_tok, 6) AS containment
    FROM inter i JOIN eligible e ON e.doc = i.id_small
    WHERE i.n_inter * 1.0 / e.n_tok >= 0.8
)
SELECT id_small, COUNT(*) AS n_containers,
       MAX(containment) AS max_containment,
       MIN(id_big) AS first_container
FROM pairs
GROUP BY id_small
ORDER BY id_small
"""


def sim_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion of two geometrically different rankers
    over the same queries — cosine top-20 and (unnormalized) L2
    top-20 — into one calibration-free hybrid top-10:
    ``Σ 1/(60 + rank)`` with absent-candidate terms 0. Fusion joins
    run on the bounded RESULT relations (5 queries × 20 rows each);
    the corpus appears only inside the two rankers."""
    from curw_flo2d_data_manager_spark.operators.similarity import (
        dot,
        rrf_fuse,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cos = cosine_topk(emb, queries, k=20).select(
        "query_id", "corpus_id", "rank"
    )
    c = emb.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("_cv"),
    )
    q = queries.select("query_id", F.col("embedding").alias("_qv"))
    l2sq = F.aggregate(
        F.zip_with(
            F.col("_cv"),
            F.col("_qv"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wl2 = Window.partitionBy("query_id").orderBy(
        F.asc("l2sq"), F.asc("corpus_id")
    )
    l2 = (
        c.crossJoin(F.broadcast(q))
        .withColumn("l2sq", l2sq)
        .withColumn("rank", F.row_number().over(wl2))
        .filter(F.col("rank") <= 20)
        .select("query_id", "corpus_id", "rank")
    )
    return rrf_fuse([cos, l2], k_const=60, topk=10).orderBy(
        "query_id", "rrf_rank"
    )


SIM_RRF_SQL = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv
    FROM embeddings WHERE vec_id < 5
),
cos AS (
    SELECT query_id, corpus_id, rnk AS rank FROM (
        SELECT q.query_id, e.vec_id AS corpus_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qv AS DOUBLE[])) DESC,
                   e.vec_id) AS rnk
        FROM embeddings e CROSS JOIN q
    ) WHERE rnk <= 20
),
l2 AS (
    SELECT query_id, corpus_id, rnk AS rank FROM (
        SELECT q.query_id, e.vec_id AS corpus_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_distance(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qv AS DOUBLE[])) ASC,
                   e.vec_id) AS rnk
        FROM embeddings e CROSS JOIN q
    ) WHERE rnk <= 20
),
fused AS (
    SELECT COALESCE(c.query_id, l.query_id) AS query_id,
           COALESCE(c.corpus_id, l.corpus_id) AS corpus_id,
           ROUND(COALESCE(1.0 / (60.0 + c.rank), 0)
                 + COALESCE(1.0 / (60.0 + l.rank), 0), 9) AS rrf_score
    FROM cos c FULL OUTER JOIN l2 l
      ON c.query_id = l.query_id AND c.corpus_id = l.corpus_id
)
SELECT query_id, corpus_id, rrf_rank, rrf_score FROM (
    SELECT query_id, corpus_id, rrf_score,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY rrf_score DESC, corpus_id)
               AS rrf_rank
    FROM fused
) WHERE rrf_rank <= 10
ORDER BY query_id, rrf_rank
"""


def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form CUBE/ROLLUP
    specialize: exactly the three asked-for levels ((returnflag),
    (linestatus), ()) in ONE pass (map-side Expand emits one row per
    requested set — 3 here, vs CUBE's 4 — then a single shuffle).
    GROUPING() flags disambiguate real NULLs from subtotal rows."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag) AS g_rf,
               GROUPING(l_linestatus) AS g_ls,
               COUNT(*) AS n,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
        """
    )


A_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_rf,
       GROUPING(l_linestatus) AS g_ls,
       COUNT(*) AS n,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
"""


def a_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness: per-day distinct actives and the 7-day
    ROLLING distinct — the rolling-distinct shape no window frame can
    express (distinct doesn't decompose over frames). Each user-day
    contributes itself to the 7 window-end days it belongs to (a
    bounded ×7 explode of the DISTINCT user-day relation, never raw
    events), then one count_distinct per window-end day; day cost is
    7× the user-day relation regardless of event volume."""
    ev = _events(spark, sf_dir)
    ud = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = ud.groupBy("day").agg(
        F.count_distinct("user_id").alias("dau")
    )
    wau = (
        ud.withColumn(
            "win_day",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ),
        )
        .groupBy("win_day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau["day"] == wau["win_day"])
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


A_ROLLING_SQL = """
WITH ud AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
dau AS (
    SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day
),
wau AS (
    SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
    FROM (SELECT DISTINCT day FROM ud) d
    JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
)
SELECT day, dau, wau, ROUND(dau * 1.0 / wau, 6) AS stickiness
FROM dau JOIN wau USING (day)
ORDER BY day
"""


def j_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted co-occurrence graph construction: suppliers appearing
    in the same order become an edge weighted by shared-order count —
    the bipartite→unipartite projection that FEEDS the graph family
    (connected components, LPA, PageRank all consume edges built this
    way). Declarative self-equi-join on the container key; the
    per-container quadratic blowup is bounded by container size
    (suppliers per order ≲ 7 here) and hot containers are the AQE
    skew-join case. Keeps pairs sharing ≥ 2 orders to bound the edge
    relation — the same support-threshold lever as frequent-itemset
    mining."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).distinct()
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s_b")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("s_a") < F.col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(F.count(F.lit(1)).alias("n_shared_orders"))
        .filter(F.col("n_shared_orders") >= 2)
        .orderBy("s_a", "s_b")
    )


J_COOCCUR_SQL = """
WITH li AS (
    SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
)
SELECT a.s AS s_a, b.s AS s_b, COUNT(*) AS n_shared_orders
FROM li a JOIN li b ON a.ok = b.ok AND a.s < b.s
GROUP BY a.s, b.s
HAVING COUNT(*) >= 2
ORDER BY s_a, s_b
"""


def x_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort triangle: users cohorted by first-activity
    day, each cell counting distinct users still active ``age_days``
    later — the classic product-analytics shape the funnel/session
    queries don't cover. Two partial-aggregable reductions (first day
    per user, distinct activity days) meet in ONE user-keyed equi-join
    — no window, no broadcast assumption on the user dimension (at
    10⁹ users both sides shuffle on the same key)."""
    ev = _events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    active = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .withColumn("age_days", F.datediff("day", "cohort_day"))
        .groupBy("cohort_day", "age_days")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "age_days")
    )


X_RETENTION_SQL = """
WITH firsts AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
    FROM events GROUP BY user_id
),
active AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT f.cohort_day,
       a.day - f.cohort_day AS age_days,
       COUNT(DISTINCT a.user_id) AS active_users
FROM active a JOIN firsts f USING (user_id)
GROUP BY f.cohort_day, age_days
ORDER BY cohort_day, age_days
"""


def x_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row numbering of events by (ts, event_id) WITHOUT the
    single-partition window — range exchange + bounded per-partition
    offsets + local numbering (operators/rownum.py). The naive
    ROW_NUMBER() OVER (ORDER BY ...) moves every row into ONE task;
    this plan has no SinglePartition exchange (plan-gated) yet matches
    it row-for-row because (ts, event_id) is a total order."""
    from curw_flo2d_data_manager_spark.operators.rownum import (
        global_row_number,
    )

    ev = _events(spark, sf_dir).select("event_id", "ts", "value")
    out = global_row_number(ev, ["ts", "event_id"])
    return out.select("row_num", "event_id").orderBy("row_num")


X_ROWNUM_SQL = """
SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id) AS row_num,
       event_id
FROM events
ORDER BY row_num
"""


def sim_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (3 rounds, smallest-label
    tiebreak) over the order↔supplier bipartite graph from lineitem
    (node ids disjoint by parity: 2·orderkey vs 2·suppkey+1).
    Deterministic by construction — the DuckDB oracle unrolls the
    same three rounds as CTEs. Per round: one edge shuffle with
    map-side partial counts, then a partial-aggregable
    max(struct(cnt, −label)) argmax — no rank window, so hub
    suppliers' count rows never sort in one task."""
    from curw_flo2d_data_manager_spark.operators.components import (
        label_propagation,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 2).alias("id_a"),
        (F.col("l_suppkey") * 2 + 1).alias("id_b"),
    )
    return label_propagation(li, n_iters=3).orderBy("id")


def _label_prop_oracle_sql(n_iters: int = 3) -> str:
    """DuckDB replica of operators/components.py::label_propagation
    over the lineitem bipartite graph: symmetrized distinct edges,
    self-labels, then ``n_iters`` unrolled rounds of neighbor-label
    counts with (count DESC, label ASC) argmax."""
    sql = """
WITH pairs AS (
    SELECT DISTINCT 2 * l_orderkey AS u, 2 * l_suppkey + 1 AS v
    FROM lineitem
),
edges AS (
    SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs
),
l0 AS (SELECT DISTINCT u AS id, u AS label FROM edges)"""
    for i in range(1, n_iters + 1):
        sql += f""",
c{i} AS (
    SELECT e.u AS id, l.label, COUNT(*) AS cnt
    FROM edges e JOIN l{i - 1} l ON e.v = l.id
    GROUP BY e.u, l.label
),
l{i} AS (
    SELECT id, label FROM c{i}
    QUALIFY ROW_NUMBER() OVER (PARTITION BY id
                               ORDER BY cnt DESC, label ASC) = 1
)"""
    return sql + f"\nSELECT id, label FROM l{n_iters} ORDER BY id\n"


SIM_LABEL_PROP_SQL = _label_prop_oracle_sql()


def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance entity resolution over part names: the
    record-linkage primitive ("Acme Corp" vs "Acme Corp.") exact and
    shingle dedup can't express. The quadratic refine runs on the
    DISTINCT-name relation (2000 parts → 64 names at sf0.01) behind a
    first-token block — the two decisions that keep fuzzy matching
    alive at catalog scale. Group sizes ride along so matches weight
    back to row counts without a second scan."""
    from curw_flo2d_data_manager_spark.operators.dedup import (
        fuzzy_name_pairs,
    )

    part = _t(spark, sf_dir, "part").select("p_name")
    return fuzzy_name_pairs(part, "p_name", max_dist=3).orderBy(
        "name_a", "name_b"
    )


DEDUP_FUZZY_SQL = """
WITH names AS (
    SELECT p_name AS name, COUNT(*) AS n_rows,
           split_part(p_name, ' ', 1) AS blk
    FROM part GROUP BY p_name
)
SELECT a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name) AS dist,
       a.n_rows AS n_a, b.n_rows AS n_b
FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 3
ORDER BY name_a, name_b
"""


def a_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile of lineitem's four numeric measures:
    null counts, exact distinct cardinalities, ranges, means — one
    aggregate job over one scan, unpivoted to a row per column (the
    ingest-health relation drift checks diff). Exact multi-column
    COUNT(DISTINCT) plans an Expand (|cols|x map-side rows before the
    partial agg); profile_columns(exact_distinct=False) is the
    HLL-based 100-TB path."""
    from curw_flo2d_data_manager_spark.operators.profile import (
        profile_columns,
    )

    li = _t(spark, sf_dir, "lineitem")
    return profile_columns(
        li, ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    ).orderBy("col_name")


A_PROFILE_SQL = """
SELECT col_name, n_rows, n_null, n_distinct, min_v, max_v, avg_v
FROM (
    SELECT 'l_discount' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_discount) AS n_null,
           COUNT(DISTINCT l_discount) AS n_distinct,
           ROUND(MIN(CAST(l_discount AS DOUBLE)), 4) AS min_v,
           ROUND(MAX(CAST(l_discount AS DOUBLE)), 4) AS max_v,
           ROUND(AVG(CAST(l_discount AS DOUBLE)), 4) AS avg_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*),
           COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           ROUND(MIN(CAST(l_extendedprice AS DOUBLE)), 4),
           ROUND(MAX(CAST(l_extendedprice AS DOUBLE)), 4),
           ROUND(AVG(CAST(l_extendedprice AS DOUBLE)), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity', COUNT(*),
           COUNT(*) - COUNT(l_quantity),
           COUNT(DISTINCT l_quantity),
           ROUND(MIN(CAST(l_quantity AS DOUBLE)), 4),
           ROUND(MAX(CAST(l_quantity AS DOUBLE)), 4),
           ROUND(AVG(CAST(l_quantity AS DOUBLE)), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*),
           COUNT(*) - COUNT(l_tax),
           COUNT(DISTINCT l_tax),
           ROUND(MIN(CAST(l_tax AS DOUBLE)), 4),
           ROUND(MAX(CAST(l_tax AS DOUBLE)), 4),
           ROUND(AVG(CAST(l_tax AS DOUBLE)), 4)
    FROM lineitem
)
ORDER BY col_name
"""


def dedup_suffix_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuation-page detection: doc A's trailing 8-gram equals
    doc B's leading 8-gram (the crawl artifact where one page's tail
    repeats as the next page's header). Planted continuations — each
    long doc gets a partner whose text starts with the doc's last 8
    words — must all pair up. Equi-join on the literal gram string
    (exact, no verify pass); boilerplate hot grams are the skew case
    (AQE skew-join / bucket caps, as with MinHash bands)."""
    from curw_flo2d_data_manager_spark.operators.dedup import (
        suffix_prefix_pairs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    from curw_flo2d_data_manager_spark.operators.textstats import words

    w = words(F.col("text"))
    cont = docs.filter(F.size(w) >= 16).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(
            F.concat_ws(" ", F.slice(w, -8, 8)),
            F.lit(" continued part "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    corpus = docs.unionByName(cont)
    out = suffix_prefix_pairs(corpus, id_col="doc_id", text_col="text", k=8)
    return out.select("prev_id", "next_id").orderBy("prev_id", "next_id")


DEDUP_SUFFIX_SQL = """
WITH base AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS w
    FROM documents
),
cont AS (
    SELECT doc_id + 2000000 AS doc_id,
           list_concat(w[len(w)-7:len(w)],
               list_concat(['continued', 'part'],
                           [CAST(doc_id AS VARCHAR)])) AS w
    FROM base WHERE len(w) >= 16
),
corpus AS (
    SELECT doc_id, w FROM base UNION ALL SELECT doc_id, w FROM cont
),
eligible AS (SELECT doc_id, w FROM corpus WHERE len(w) >= 8),
tails AS (
    SELECT doc_id AS prev_id,
           array_to_string(w[len(w)-7:len(w)], ' ') AS gram
    FROM eligible
),
heads AS (
    SELECT doc_id AS next_id, array_to_string(w[1:8], ' ') AS gram
    FROM eligible
)
SELECT prev_id, next_id
FROM tails JOIN heads USING (gram)
WHERE prev_id <> next_id
ORDER BY prev_id, next_id
"""


def stream_cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM: the four-scalar-state applyInPandasWithState
    drift statistic replayed over a file stream must equal the batch
    prefix-scan identity (w_cusum_drift's SQL) row for row. Keyed by
    the unique synthetic event-time trick of stream_cumsum_events so
    the in-state sort is deterministic."""
    import tempfile

    ev = (
        _events(spark, sf_dir, end="2024-01-10 00:00:00")
        .filter(
            (F.col("user_id") < 20)
            & (F.col("ts") < F.lit("2024-01-10 00:00:00").cast("timestamp"))
        )
        .select(
            F.col("user_id").cast("string").alias("id"),
            F.timestamp_micros(F.col("event_id")).alias("time"),
            F.round("value", 4).alias("value"),
        )
    )
    src = tempfile.mkdtemp(prefix="stream_cusum_src_")
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    from curw_flo2d_data_manager_spark.streaming import streaming_cusum

    name = _run_replay_stream(
        spark, src,
        lambda s: streaming_cusum(s, target=50.0, slack=10.0),
        "stream_cusum2_", "append",
    )
    return (
        spark.table(name)
        .select(
            "id",
            F.unix_micros("time").alias("event_id"),
            F.round("cusum_pos", 4).alias("cusum_pos"),
            F.round("cusum_neg", 4).alias("cusum_neg"),
        )
        .orderBy("id", "event_id")
    )


STREAM_CUSUM2_SQL = """
WITH pref AS (
    SELECT CAST(user_id AS VARCHAR) AS id, event_id,
           SUM(ROUND(value, 4) - 50.0 - 10.0) OVER w AS p,
           SUM(ROUND(value, 4) - 50.0 + 10.0) OVER w AS n
    FROM events
    WHERE user_id < 20
      AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-10 00:00:00'
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS UNBOUNDED PRECEDING)
)
SELECT id, event_id,
       ROUND(p - LEAST(0.0, MIN(p) OVER w2), 4) AS cusum_pos,
       ROUND(GREATEST(0.0, MAX(n) OVER w2) - n, 4) AS cusum_neg
FROM pref
WINDOW w2 AS (PARTITION BY id ORDER BY event_id
              ROWS UNBOUNDED PRECEDING)
ORDER BY id, event_id
"""


def sim_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs sparse tf-idf cosine via inverted-index self-join
    (Bayardo et al., WWW'07) — the text-side similarity search that
    complements the dense-embedding ANN stack: candidate pairs exist
    only through shared word-3-gram terms, never a corpus cross join.
    Weights are fixed-point BIGINTs so dot products and norms are
    exact integer sums (engine summation order can't flip the hash);
    see operators/textstats.py::sparse_cosine_pairs for the scale
    levers (stopword df cap, hapax-free join side)."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        sparse_cosine_pairs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # prefix_filter off HERE: at min_sim 0.5 over this templated
    # corpus the Bayardo bound prunes almost nothing, so the filtered
    # path's candidate+verify joins just re-pay the full index join
    # (~2x; measured 4.9 -> 8.3 s at sf0.1). The prefix path is the
    # high-threshold / huge-corpus lever — proved exact with a 38x
    # candidate cut on the 1M-doc smoke (tools/bench_apss_scale.py).
    return sparse_cosine_pairs(
        docs, "doc_id", "text", min_sim=0.5, max_df_frac=0.02, ngram=3,
        prefix_filter=False,
    ).orderBy("id_a", "id_b")


SIM_SPARSE_COSINE_SQL = """
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
g AS (
    SELECT doc_id, array_to_string(words[i:i+2], ' ') AS term
    FROM w, UNNEST(generate_series(1, greatest(len(words) - 2, 1))) AS t(i)
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM g GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM w),
wt AS (
    SELECT t.doc_id, t.term, d.df,
           CAST(ROUND(CAST(t.tf AS DOUBLE)
                      * {LN_RATIO_NDF}
                      * 10000.0)
                AS BIGINT) AS wgt
    FROM tf t JOIN dfq d USING (term) CROSS JOIN n
    WHERE d.df <= n.n_docs * 0.02
),
norms AS (SELECT doc_id, SUM(wgt * wgt) AS norm2 FROM wt GROUP BY 1),
dots AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           COUNT(*) AS n_shared_terms, SUM(a.wgt * b.wgt) AS dot
    FROM wt a JOIN wt b ON a.term = b.term AND a.doc_id < b.doc_id
    WHERE a.df >= 2
    GROUP BY 1, 2
),
scored AS (
    SELECT id_a, id_b, n_shared_terms,
           ROUND(dot / (sqrt(CAST(na.norm2 AS DOUBLE))
                        * sqrt(CAST(nb.norm2 AS DOUBLE))), 6) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = dots.id_a
    JOIN norms nb ON nb.doc_id = dots.id_b
)
SELECT * FROM scored WHERE cosine >= 0.5
ORDER BY id_a, id_b
"""

# The idf weight must be bit-identical across engines BEFORE the
# fixed-point round (round-10 advice): splice in the deterministic
# basic-ops log, the exact SQL twin of the Spark-side expression in
# operators/textstats.py::sparse_cosine_pairs.
SIM_SPARSE_COSINE_SQL = SIM_SPARSE_COSINE_SQL.replace(
    "{LN_RATIO_NDF}", _ln_ratio_det_sql("n.n_docs + 1", "d.df + 1")
)


def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build over word bigrams: per-term df / corpus tf
    and the top-3 postings by (tf desc, doc asc) — the IR-index
    construction stage behind the BM25/tf-idf retrieval queries. The
    per-term top-k is a row_number() <= k window, so the physical plan
    carries Spark's map-side WindowGroupLimit (plan-gated)."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        inverted_index,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return inverted_index(
        docs, "doc_id", "text", k=3, min_df=5, ngram=2
    ).orderBy("term", "rank")


TEXT_INVERTED_SQL = """
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
g AS (
    SELECT doc_id, array_to_string(words[i:i+1], ' ') AS term
    FROM w, UNNEST(generate_series(1, greatest(len(words) - 1, 1))) AS t(i)
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM g GROUP BY 1, 2),
stats AS (
    SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS corpus_tf
    FROM tf GROUP BY 1 HAVING COUNT(*) >= 5
),
ranked AS (
    SELECT term, doc_id, tf,
           ROW_NUMBER() OVER (PARTITION BY term
                              ORDER BY tf DESC, doc_id) AS rank
    FROM tf
    WHERE term IN (SELECT term FROM stats)
)
SELECT r.term, s.df, s.corpus_tf, r.doc_id, r.tf, r.rank
FROM ranked r JOIN stats s USING (term)
WHERE r.rank <= 3
ORDER BY term, rank
"""


def _part_cooccur_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part co-occurrence edge relation shared by the graph-family
    queries (g_triangle_count, g_kcore): parts sharing an order in the
    first two ship-years, built by per-container array expansion — ONE
    groupBy shuffle of the raw rows, pairs generated in-plan from each
    order's sorted part set (measured 1.8× faster than the equivalent
    self-join at sf0.1, same 103k-edge output; per-container quadratic
    cost is bounded by order width either way)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_partkey")
    )
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    return (
        arr.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ps"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("ps"), i + F.lit(2), F.size(F.col("ps"))
                            ),
                            lambda y: F.struct(
                                x.alias("p_a"), y.alias("p_b")
                            ),
                        ),
                    )
                )
            ).alias("pr")
        )
        .select("pr.p_a", "pr.p_b")
        .distinct()
    )


def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the part co-occurrence graph
    (parts sharing an order become an edge — 1.2M edges / 20k nodes /
    max degree ~220 at sf0.1, a genuinely sparse graph, unlike the
    supplier projection which saturates complete): the degree-oriented
    node-iterator — wedges enumerated only at each triangle's
    lowest-(degree, id) corner, closed against the canonical edge set —
    which caps wedge volume at O(|E|^1.5) on any degree distribution
    (operators/triangles.py). The oracle counts the same triangles by
    direct 3-way self-join, fine at oracle scale and quadratic-degree-
    blowup at real scale; both count every triangle corner exactly
    once."""
    from curw_flo2d_data_manager_spark.operators.triangles import (
        triangle_counts,
    )

    # first two ship-years: 103k edges / 41k triangles at sf0.1 — a
    # substantial sparse graph whose wedge volume stays in the
    # per-query bench budget (the unbounded 1.2M-edge projection
    # generates 41M wedges — that shape is proven separately by
    # tools/bench_triangle_scale.py's planted graph)
    edges = _part_cooccur_edges(spark, sf_dir)
    return triangle_counts(edges, "p_a", "p_b").orderBy("node")


G_TRIANGLE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1997-01-01'),
e AS (
    SELECT DISTINCT a.p AS sa, b.p AS sb
    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
),
tri AS (
    SELECT e1.sa AS x, e1.sb AS y, e2.sb AS z
    FROM e e1
    JOIN e e2 ON e2.sa = e1.sa AND e2.sb > e1.sb
    JOIN e e3 ON e3.sa = e1.sb AND e3.sb = e2.sb
),
corners AS (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
)
SELECT node, COUNT(*) AS n_triangles
FROM corners GROUP BY node ORDER BY node
"""


def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch build + point queries: the 4×256 counter
    matrix is ONE partial-aggregable shuffle of (row, bucket) pairs —
    corpus-size-independent state, the sketch-family guarantee — and
    the 20 exact-top terms are probed back with min-over-rows. Every
    estimate must satisfy the CM one-sided bound est ≥ exact, and both
    engines rebuild the identical sketch from the shared md5 hash
    construction (operators/sketches.py)."""
    from curw_flo2d_data_manager_spark.operators.sketches import (
        countmin_build,
        countmin_estimate,
    )
    from curw_flo2d_data_manager_spark.operators.textstats import words

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(words("text")).alias("term"))
    sketch = countmin_build(toks, "term", depth=4, width=256)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_n"))
    from pyspark.sql import Window

    top = (
        exact.withColumn(
            "_r",
            F.row_number().over(
                Window.orderBy(F.desc("exact_n"), F.asc("term"))
            ),
        )
        .filter(F.col("_r") <= 20)
        .drop("_r")
    )
    est = countmin_estimate(top.select("term"), sketch, "term",
                            depth=4, width=256)
    return (
        top.join(est, "term")
        .select("term", "exact_n", "cm_estimate",
                (F.col("cm_estimate") >= F.col("exact_n")).alias("bound_ok"))
        .orderBy(F.desc("exact_n"), "term")
    )


SKETCH_COUNTMIN_SQL = """
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
tok AS (SELECT unnest(words) AS term FROM w),
exact AS (SELECT term, COUNT(*) AS exact_n FROM tok GROUP BY 1),
top AS (
    SELECT term, exact_n FROM exact
    ORDER BY exact_n DESC, term LIMIT 20
),
cells AS (
    SELECT t.r,
           CAST(('0x' || substring(md5(tok.term || '|' || t.r), 1, 8))
                AS BIGINT) % 256 AS bucket,
           COUNT(*) AS cnt
    FROM tok CROSS JOIN UNNEST([0, 1, 2, 3]) AS t(r)
    GROUP BY 1, 2
),
est AS (
    SELECT top.term, top.exact_n, MIN(c.cnt) AS cm_estimate
    FROM top
    CROSS JOIN UNNEST([0, 1, 2, 3]) AS t(r)
    JOIN cells c
      ON c.r = t.r
     AND c.bucket = CAST(('0x' || substring(md5(top.term || '|' || t.r), 1, 8))
                         AS BIGINT) % 256
    GROUP BY 1, 2
)
SELECT term, exact_n, cm_estimate, cm_estimate >= exact_n AS bound_ok
FROM est
ORDER BY exact_n DESC, term
"""


def stream_join_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (view→purchase attribution): one
    month of events replayed through a file stream, split into a view
    stream and a purchase stream, inner-joined per user with a closed
    30-minute window. Must equal the batch self-join oracle pair for
    pair — the Structured Streaming shape (two watermarked sides,
    equi-key + time-range state bounds) the other streams don't
    exercise."""
    import tempfile

    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "purchase")
    )
    src = tempfile.mkdtemp(prefix="stream_attrib_src_")
    ev.select(
        F.col("user_id").cast("string").alias("id"),
        F.col("ts").alias("time"),
        "event_type",
        "event_id",
    ).coalesce(1).write.mode("overwrite").parquet(src)

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from curw_flo2d_data_manager_spark.streaming import (
        streaming_attribution_join,
    )

    schema = StructType([
        StructField("id", StringType()),
        StructField("time", TimestampType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
    ])
    # A stream-stream join keeps FOUR state stores per shuffle
    # partition; at the session's default parallelism that's 128 store
    # instances (dir creation + per-batch commit files each) for a
    # 40k-row replay — pure fixed overhead. State parallelism is sized
    # to the stream's key cardinality, not the batch session's CPU
    # count (measured 13 s → ~5 s at sf0.1). The conf is read at query
    # start, so scoping it around the replay is safe and restored.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        name = _run_replay_stream(
            spark, src,
            lambda s: streaming_attribution_join(
                s, "view", "purchase", gap="30 minutes", watermark="2 hours"
            ),
            "stream_attrib_", "append", schema=schema,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return (
        spark.table(name)
        .select(
            F.col("id").cast("long").alias("user_id"),
            F.col("left_id").alias("view_id"),
            F.col("right_id").alias("purchase_id"),
            (F.unix_micros("right_time") - F.unix_micros("left_time"))
            .alias("gap_us"),
        )
        .orderBy("user_id", "view_id", "purchase_id")
    )


STREAM_ATTRIB_SQL = """
SELECT v.user_id AS user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP))
         AS gap_us
FROM events v
JOIN events p
  ON p.user_id = v.user_id
 AND v.event_type = 'view'
 AND p.event_type = 'purchase'
 AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
 AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP)
     + INTERVAL 30 MINUTE
ORDER BY v.user_id, view_id, purchase_id
"""


def g_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core of the part co-occurrence graph via 6 synchronous
    peeling rounds (operators/components.py::k_core) — the density
    filter that isolates the cohesive region of dedup-pair and
    co-occurrence graphs before community detection. 6 rounds is past
    the measured peel depth at every test SF (≤ 3), and the peel is
    idempotent after convergence, so the fixed round budget computes
    the exact core while keeping the oracle an unrolled-CTE replica
    (the label_propagation pattern)."""
    from curw_flo2d_data_manager_spark.operators.components import k_core

    edges = _part_cooccur_edges(spark, sf_dir)
    return k_core(edges, k=4, n_rounds=6, src="p_a", dst="p_b").orderBy(
        "node"
    )


def _gen_kcore_sql(k: int, rounds: int) -> str:
    """Unrolled-CTE DuckDB replica of k_core over the part
    co-occurrence graph — generated from the SAME (k, rounds)
    constants the Spark query passes, so the two cannot drift."""
    parts = ["""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1997-01-01'),
e0 AS MATERIALIZED (SELECT DISTINCT a.p AS sa, b.p AS sb
       FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p)"""]
    for r in range(rounds):
        parts.append(f""",
k{r} AS MATERIALIZED (SELECT node FROM (
    SELECT node, COUNT(*) AS d FROM
      (SELECT sa AS node FROM e{r} UNION ALL SELECT sb FROM e{r}) u{r}
    GROUP BY node) d{r} WHERE d >= {k}),
e{r + 1} AS MATERIALIZED (SELECT sa, sb FROM e{r}
             WHERE sa IN (SELECT node FROM k{r})
               AND sb IN (SELECT node FROM k{r}))""")
    parts.append(f"""
SELECT node, COUNT(*) AS degree FROM
  (SELECT sa AS node FROM e{rounds} UNION ALL SELECT sb FROM e{rounds}) uf
GROUP BY node HAVING COUNT(*) >= {k}
ORDER BY node""")
    return "".join(parts)


G_KCORE_SQL = _gen_kcore_sql(k=4, rounds=6)


def sim_bq_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN (the 1-bit rung of the PQ/SQ/BQ
    quantization ladder): 64-dim vectors collapse to one sign-bit
    BIGINT, Hamming (popcount of xor) ranks a 50-candidate short list
    per query, exact cosine reranks to top-10. The brute-force stage
    scans 8-byte codes instead of 512-byte vectors — the ~64×
    scan-shrink that makes code-space search viable at 10⁹ vectors
    (operators/similarity.py::bq_hamming_topk)."""
    from curw_flo2d_data_manager_spark.operators.similarity import (
        bq_hamming_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = bq_hamming_topk(emb, queries, k=10, candidate_mult=5, dim=64)
    return out.select(
        "query_id", "corpus_id", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


SIM_BQ_SQL = """
WITH codes AS (
    SELECT vec_id,
           bit_or(CASE WHEN e > 0 THEN
               (CASE WHEN i = 64 THEN -9223372036854775808
                     ELSE (1::BIGINT << (i - 1)) END)
           ELSE 0 END) AS code
    FROM (SELECT vec_id, UNNEST(embedding) AS e,
                 UNNEST(generate_series(1, len(embedding))) AS i
          FROM embeddings)
    GROUP BY vec_id
),
q AS (SELECT vec_id AS query_id, code AS qcode FROM codes WHERE vec_id < 5),
ham AS (
    SELECT q.query_id, c.vec_id AS corpus_id,
           bit_count(xor(c.code, q.qcode)) AS hamming
    FROM codes c CROSS JOIN q
),
cand AS (
    SELECT query_id, corpus_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY hamming, corpus_id) AS crk
        FROM ham) t
    WHERE crk <= 50
),
scored AS (
    SELECT cand.query_id, cand.corpus_id,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                  CAST(qe.embedding AS DOUBLE[])) AS cosine
    FROM cand
    JOIN embeddings e ON e.vec_id = cand.corpus_id
    JOIN embeddings qe ON qe.vec_id = cand.query_id
),
ranked AS (
    SELECT query_id, corpus_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, corpus_id) AS rank
    FROM scored
)
SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


def g_clustering_coef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — 2·T(v) / (deg(v)·
    (deg(v)−1)) over the part co-occurrence graph: the per-node
    community-density signal triangle counts exist to feed. One extra
    degree aggregation + broadcastable join on top of
    operators/triangles.py; nodes of degree < 2 have no defined
    coefficient and are omitted, triangle-free nodes report 0."""
    from curw_flo2d_data_manager_spark.operators.triangles import (
        triangle_counts,
    )

    edges = _part_cooccur_edges(spark, sf_dir)
    tri = triangle_counts(edges, "p_a", "p_b")
    deg = (
        edges.select(F.col("p_a").alias("node"))
        .unionAll(edges.select(F.col("p_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= 2)
    )
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.round(
                F.coalesce("n_triangles", F.lit(0))
                * 2.0
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                6,
            ).alias("coefficient"),
        )
        .orderBy("node")
    )


G_CLUSTERING_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1997-01-01'),
e AS MATERIALIZED (
    SELECT DISTINCT a.p AS sa, b.p AS sb
    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
),
tri AS (
    SELECT e1.sa AS x, e1.sb AS y, e2.sb AS z
    FROM e e1
    JOIN e e2 ON e2.sa = e1.sa AND e2.sb > e1.sb
    JOIN e e3 ON e3.sa = e1.sb AND e3.sb = e2.sb
),
corners AS (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
),
tcounts AS (SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node),
deg AS (
    SELECT node, COUNT(*) AS degree FROM
      (SELECT sa AS node FROM e UNION ALL SELECT sb FROM e) u
    GROUP BY node HAVING COUNT(*) >= 2
)
SELECT d.node, d.degree,
       COALESCE(t.n_triangles, 0) AS n_triangles,
       ROUND(COALESCE(t.n_triangles, 0) * 2.0
             / (d.degree * (d.degree - 1)), 6) AS coefficient
FROM deg d LEFT JOIN tcounts t USING (node)
ORDER BY node
"""


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability per source: words/sentence and
    vowel-group syllables/word folded into the classic 206.835 −
    1.015·(w/s) − 84.6·(syl/w) score — the cheap fluency gate next to
    the punctuation/stopword quality signals. Pure regexp-count
    expressions (JVM-side, ride the scan), aggregated per source with
    partial aggregation; per-doc scores never shuffle."""
    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))
        ).alias("_s"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0)
            )
        ).alias("_syl"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), F.lit(0)
            )
        ).alias("_w"),
    ).select(
        "source",
        "_w",
        "_syl",
        F.greatest(F.col("_s"), F.lit(1)).alias("_sent"),
    ).filter(F.col("_w") > 0)
    per_doc = per_doc.withColumn(
        "_score",
        F.lit(206.835)
        - F.lit(1.015) * (F.col("_w") / F.col("_sent"))
        - F.lit(84.6) * (F.col("_syl") / F.col("_w")),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("_score"), 4).alias("avg_flesch"),
            F.round(F.avg(F.col("_w") / F.col("_sent")), 4).alias(
                "avg_words_per_sentence"
            ),
            F.round(F.avg(F.col("_syl") / F.col("_w")), 4).alias(
                "avg_syllables_per_word"
            ),
        )
        .orderBy("source")
    )


TEXT_READABILITY_SQL = """
WITH per_doc AS (
    SELECT source,
           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
           len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl,
           greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sent
    FROM documents
),
scored AS (
    SELECT source, w, syl, sent,
           206.835 - 1.015 * (CAST(w AS DOUBLE) / sent)
                   - 84.6 * (CAST(syl AS DOUBLE) / w) AS score
    FROM per_doc WHERE w > 0
)
SELECT source, COUNT(*) AS n_docs,
       ROUND(AVG(score), 4) AS avg_flesch,
       ROUND(AVG(CAST(w AS DOUBLE) / sent), 4) AS avg_words_per_sentence,
       ROUND(AVG(CAST(syl AS DOUBLE) / w), 4) AS avg_syllables_per_word
FROM scored
GROUP BY source
ORDER BY source
"""


def x_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next type | previous type), the session-behavior
    fingerprint next to funnels and sessionization. One per-user lag
    window (the (user, ts, id) sort is the only shuffle of the raw
    events) then a 25-row aggregate; probabilities are exact-count
    ratios rounded AFTER the divide, so both engines rank identical
    integer counts."""
    ev = _events(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("_tot"))
    return (
        counts.join(totals, "prev_type")
        .select(
            "prev_type",
            "event_type",
            "n",
            F.round(F.col("n") / F.col("_tot"), 6).alias("p"),
        )
        .orderBy("prev_type", "event_type")
    )


X_TRANSITIONS_SQL = """
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
),
counts AS (
    SELECT prev_type, event_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6)
         AS p
FROM counts
ORDER BY prev_type, event_type
"""


def g_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED PageRank over the supplier co-occurrence graph
    (edge weight = shared-order count), computed in exact integer
    fixed-point (operators/pagerank.py::pagerank_fixed_point): float
    PageRank's Σ rank·w/deg accumulates in shuffle order and drifts in
    the last ulps — over this graph's hundreds-of-edge nodes no
    rounding scheme makes a float oracle safe, so the recurrence
    itself is made exact (BIGINT multiply / integer-divide / sum,
    associative and engine-independent). rank_fp = rank·10¹²."""
    from curw_flo2d_data_manager_spark.operators.pagerank import (
        pagerank_fixed_point,
    )

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # per-container array expansion (the g_triangle_count edge-build
    # shape) with the pair OCCURRENCES kept — the groupBy then counts
    # shared orders as the edge weight
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("ss")
    )
    pairs = (
        arr.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ss"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("ss"), i + F.lit(2), F.size(F.col("ss"))
                            ),
                            lambda y: F.struct(
                                x.alias("s_a"), y.alias("s_b")
                            ),
                        ),
                    )
                )
            ).alias("pr")
        )
        .select("pr.s_a", "pr.s_b")
        .groupBy("s_a", "s_b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
    )
    edges = pairs.select(
        F.col("s_a").alias("src"), F.col("s_b").alias("dst"), "w"
    ).unionByName(
        pairs.select(
            F.col("s_b").alias("src"), F.col("s_a").alias("dst"), "w"
        )
    )
    pr = pagerank_fixed_point(edges, weight_col="w", iters=5)
    return pr.select(
        F.col("node").alias("supplier"), "rank_fp"
    ).orderBy("supplier")


def _gen_wpr_sql(iters: int, scale: int = 10**12,
                 d_num: int = 17, d_den: int = 20) -> str:
    """Unrolled-CTE DuckDB replica of pagerank_fixed_point over the
    supplier co-occurrence graph — generated from the SAME constants
    the Spark query passes. Integer fixed-point makes every iteration
    exact, so the final BIGINT ranks compare with NO rounding."""
    parts = ["""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem),
pairs AS (
    SELECT a.s AS sa, b.s AS sb, COUNT(*) AS w
    FROM li a JOIN li b ON a.ok = b.ok AND a.s < b.s
    GROUP BY a.s, b.s HAVING COUNT(*) >= 2),
edges AS MATERIALIZED (
    SELECT sa AS src, sb AS dst, w FROM pairs
    UNION ALL SELECT sb, sa, w FROM pairs),
nodes AS MATERIALIZED (
    SELECT DISTINCT node FROM
      (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) u),
nn AS (SELECT COUNT(*) AS n FROM nodes),
od AS MATERIALIZED (SELECT src, SUM(w) AS degw FROM edges GROUP BY src),"""]
    parts.append(f"""
r0 AS MATERIALIZED (SELECT node, {scale} // nn.n AS rank_fp
                    FROM nodes CROSS JOIN nn)""")
    for i in range(1, iters + 1):
        parts.append(f""",
r{i} AS MATERIALIZED (
    SELECT n.node,
           ({(d_den - d_num) * scale} // ({d_den} * nn.n))
           + ({d_num} * COALESCE(c.s, 0)) // {d_den} AS rank_fp
    FROM nodes n CROSS JOIN nn
    LEFT JOIN (
        SELECT e.dst AS node, SUM((r.rank_fp * e.w) // od.degw) AS s
        FROM edges e
        JOIN r{i - 1} r ON e.src = r.node
        JOIN od ON e.src = od.src
        GROUP BY e.dst
    ) c ON n.node = c.node)""")
    parts.append(f"""
SELECT node AS supplier, CAST(rank_fp AS BIGINT) AS rank_fp
FROM r{iters} ORDER BY supplier""")
    return "".join(parts)


G_WPR_SQL = _gen_wpr_sql(iters=5)


def ml_train_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the hashed linear quality classifier (the learn step for
    the fixed-weight hash_classifier_score): 3 full-batch GD epochs on
    a hard-sigmoid linear probe predicting lang='en', in EXACT integer
    fixed-point (operators/mltrain.py) — float GD cannot be oracled
    cross-engine (shuffle-order gradient sums, last-ulp libm exp), so
    the recurrence itself is integer multiply / truncating-divide /
    clamp, and the final weights compare as exact BIGINTs with NO
    rounding."""
    from curw_flo2d_data_manager_spark.operators.mltrain import (
        train_linear_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    w = train_linear_classifier(
        docs,
        label=(F.col("lang") == "en").cast("int"),
        n_buckets=16,
        iters=3,
    )
    return w.orderBy("bucket")


def _gen_mltrain_sql(n_buckets: int, iters: int,
                     scale: int = 10**8, lr_den: int = 4) -> str:
    """Unrolled-CTE DuckDB replica of train_linear_classifier —
    generated from the SAME constants the Spark query passes. Every
    CTE is MATERIALIZED (each iteration references the previous
    weights and the feature relation repeatedly)."""
    half = scale // 2
    parts = [f"""WITH toks AS (
    SELECT doc_id,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{{ffff}}-]+', ' ', 'g')), '\\s+')) AS term
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{{ffff}}-]+', ' ', 'g')) != ''
),
x AS MATERIALIZED (
    SELECT doc_id, y,
           CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT)
             % {n_buckets} AS bucket,
           COUNT(*) AS x
    FROM toks GROUP BY 1, 2, 3
),
nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM x),
w0 AS MATERIALIZED (
    SELECT UNNEST(generate_series(0, {n_buckets - 1})) AS bucket,
           0::BIGINT AS w_fp
)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
m{i} AS MATERIALIZED (
    SELECT x.doc_id, x.y, SUM(x.x * w.w_fp) AS m_fp
    FROM x JOIN w{i - 1} w USING (bucket)
    GROUP BY x.doc_id, x.y
),
e{i} AS MATERIALIZED (
    SELECT doc_id,
           least(greatest(m_fp // 4 + {half}, 0), {scale})
             - y * {scale} AS err_fp
    FROM m{i}
),
w{i} AS MATERIALIZED (
    SELECT w.bucket,
           CAST(w.w_fp - COALESCE(g.g, 0) // ({lr_den} * nn.n) AS BIGINT)
             AS w_fp
    FROM w{i - 1} w
    LEFT JOIN (
        SELECT x.bucket, SUM(e.err_fp * x.x) AS g
        FROM x JOIN e{i} e USING (doc_id)
        GROUP BY x.bucket
    ) g ON g.bucket = w.bucket
    CROSS JOIN nn)""")
    parts.append(f"""
SELECT bucket, w_fp FROM w{iters} ORDER BY bucket""")
    return "".join(parts)


ML_TRAIN_SQL = _gen_mltrain_sql(n_buckets=16, iters=3)


def ml_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC of the hashed quality classifier against the
    lang='en' label — Mann-Whitney with tie handling, computed from
    per-score-group counts: AUC = Σ_s pos(s)·(neg_below(s) +
    ½·neg(s)) / (P·N). The numerator is carried doubled
    (``auc_num2``) so it is an EXACT integer on both engines; the one
    float divide happens at the end.

    Scale shape: the corpus reduces to per-distinct-score (pos, neg)
    counts FIRST (partial-aggregable; cardinality bounded by the
    score's 6-decimal rounding at ≤ 2·10⁶ rows no matter the corpus),
    so the global-order window runs over that bounded relation — never
    a corpus-wide SinglePartition sort (the x_global_rownum lesson)."""
    from curw_flo2d_data_manager_spark.operators.mltrain import auc_exact
    from curw_flo2d_data_manager_spark.operators.textstats import (
        hash_classifier_score,
    )

    docs = _t(spark, sf_dir, "documents")
    scored = hash_classifier_score(
        docs, "doc_id", CLASSIFIER_WEIGHTS
    ).join(
        docs.select(
            "doc_id", (F.col("lang") == "en").cast("long").alias("y")
        ),
        "doc_id",
    )
    return auc_exact(scored, "score", "y")


_ML_AUC_TEMPLATE = """
WITH scored AS (
    SELECT s.score, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
    FROM (@SCORE_SQL@) s JOIN documents d USING (doc_id)
),
g AS (
    SELECT score, SUM(y) AS pos, SUM(1 - y) AS neg
    FROM scored GROUP BY score
),
terms AS (
    SELECT pos, neg,
           COALESCE(SUM(neg) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cumneg
    FROM g
)
SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(neg) AS BIGINT) AS n_neg,
       CAST(SUM(pos * (2 * cumneg + neg)) AS BIGINT) AS auc_num2,
       ROUND(SUM(pos * (2 * cumneg + neg))
             / (2.0 * SUM(pos) * SUM(neg)), 6) AS auc
FROM terms
"""


def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the hashed quality classifier vs the
    lang='en' label: scores bucketed into 10 equal-width bins, each
    bin reporting count, mean score, and observed positive rate — the
    standard calibration check before a score gates a corpus. Exact
    cross-engine arithmetic: the 6-decimal-rounded scores become
    BIGINTs (score·10⁶), so bin sums are exact integers and each mean
    is ONE correctly-rounded divide."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        hash_classifier_score,
    )

    docs = _t(spark, sf_dir, "documents")
    scored = hash_classifier_score(
        docs, "doc_id", CLASSIFIER_WEIGHTS
    ).join(
        docs.select(
            "doc_id", (F.col("lang") == "en").cast("long").alias("y")
        ),
        "doc_id",
    )
    si = F.round(F.col("score") * 1e6).cast("long")
    return (
        scored.select(
            F.least(F.floor(F.col("score") * 10), F.lit(9))
            .cast("int")
            .alias("bin"),
            si.alias("_si"),
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("_si") / (F.count(F.lit(1)) * F.lit(1e6)), 6)
            .alias("mean_score"),
            F.round(F.sum("y") / F.count(F.lit(1)), 6).alias("frac_pos"),
        )
        .orderBy("bin")
    )


_ML_CALIBRATION_TEMPLATE = """
WITH scored AS (
    SELECT s.score, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
    FROM (@SCORE_SQL@) s JOIN documents d USING (doc_id)
)
SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
       COUNT(*) AS n,
       ROUND(SUM(CAST(ROUND(score * 1e6) AS BIGINT))
             / (COUNT(*) * 1e6), 6) AS mean_score,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS frac_pos
FROM scored
GROUP BY 1
ORDER BY bin
"""

ML_AUC_SQL = _ML_AUC_TEMPLATE.replace(
    "@SCORE_SQL@", _classifier_sql(bias=0.0, order=False)
)
ML_CALIBRATION_SQL = _ML_CALIBRATION_TEMPLATE.replace(
    "@SCORE_SQL@", _classifier_sql(bias=0.0, order=False)
)


def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 of the hashed quality
    classifier thresholded at 0.5 against the lang='en' label — the
    last member of the eval family (AUC ranks, calibration checks
    probabilities, this checks the operating point). Counts are one
    partial-aggregable pass; the three ratios are single divides of
    exact integers (NULL when undefined, not inf/nan)."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        hash_classifier_score,
    )

    docs = _t(spark, sf_dir, "documents")
    scored = hash_classifier_score(
        docs, "doc_id", CLASSIFIER_WEIGHTS
    ).join(
        docs.select(
            "doc_id", (F.col("lang") == "en").cast("long").alias("y")
        ),
        "doc_id",
    )
    pred = (F.col("score") >= 0.5).cast("long")
    agg = scored.agg(
        F.sum(pred * F.col("y")).alias("tp"),
        F.sum(pred * (1 - F.col("y"))).alias("fp"),
        F.sum((1 - pred) * F.col("y")).alias("fn"),
        F.sum((1 - pred) * (1 - F.col("y"))).alias("tn"),
    )
    prec_den = F.col("tp") + F.col("fp")
    rec_den = F.col("tp") + F.col("fn")
    return agg.select(
        "tp", "fp", "fn", "tn",
        F.when(prec_den > 0,
               F.round(F.col("tp") / prec_den, 6)).alias("precision"),
        F.when(rec_den > 0,
               F.round(F.col("tp") / rec_den, 6)).alias("recall"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            F.round(
                2 * F.col("tp")
                / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
                6,
            ),
        ).alias("f1"),
    )


_ML_CONFUSION_TEMPLATE = """
WITH scored AS (
    SELECT s.score, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
    FROM (@SCORE_SQL@) s JOIN documents d USING (doc_id)
),
c AS (
    SELECT
        CAST(SUM(CASE WHEN score >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN score >= 0.5 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN score < 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN score < 0.5 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM scored
)
SELECT tp, fp, fn, tn,
       CASE WHEN tp + fp > 0
            THEN ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
       CASE WHEN tp + fn > 0
            THEN ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6)
       END AS f1
FROM c
"""

ML_CONFUSION_SQL = _ML_CONFUSION_TEMPLATE.replace(
    "@SCORE_SQL@", _classifier_sql(bias=0.0, order=False)
)


def sim_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-point Gram matrix over the embeddings (the PCA /
    whitening aggregation): upper-triangle Σ x_i·x_j as exact BIGINTs
    — map-side expansion collapses to 2,080 rows per partition before
    the exchange, so the shuffle is matrix-sized at any corpus size
    (operators/similarity.py::gram_matrix_fixed_point)."""
    from curw_flo2d_data_manager_spark.operators.similarity import (
        gram_matrix_fixed_point,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return gram_matrix_fixed_point(emb, "embedding", dim=64).orderBy(
        "i", "j"
    )


SIM_GRAM_SQL = """
WITH e AS (
    SELECT list_transform(CAST(embedding AS DOUBLE[]),
                          x -> CAST(ROUND(x * 10000) AS BIGINT)) AS ei
    FROM embeddings WHERE embedding IS NOT NULL
)
SELECT t1.i, t2.j, CAST(SUM(e.ei[t1.i + 1] * e.ei[t2.j + 1]) AS BIGINT)
         AS gram
FROM e
CROSS JOIN (SELECT UNNEST(generate_series(0, 63)) AS i) t1
CROSS JOIN (SELECT UNNEST(generate_series(0, 63)) AS j) t2
WHERE t2.j >= t1.i
GROUP BY t1.i, t2.j
ORDER BY i, j
"""


def stream_join_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anti-join semantics via a LEFT OUTER stream-stream
    join: views with NO same-user purchase inside the closed 30-minute
    window. Unlike the inner form (matches emit on arrival), a
    null-extended row can only emit once the WATERMARK has passed the
    view's whole match window — the replay appends one far-future
    sentinel per side to push the event-time clock past every real
    row, the same trick the POT/session streams use. Must equal the
    batch NOT EXISTS oracle row for row."""
    import tempfile

    cut = "2024-01-06 00:00:00"
    ev = _events(spark, sf_dir, end=cut).filter(
        F.col("event_type").isin("view", "purchase")
        & (F.col("ts") < F.lit(cut).cast("timestamp"))
    )
    rows = ev.select(
        F.col("user_id").cast("string").alias("id"),
        F.col("ts").alias("time"),
        "event_type",
        "event_id",
    )
    # distinct sentinel keys so the two sentinels can't match each
    # other — both windows stay open past the replay and are filtered
    sentinels = spark.createDataFrame(
        [
            ("sentinel_v", "view", -1),
            ("sentinel_p", "purchase", -2),
        ],
        "id string, event_type string, event_id long",
    ).select(
        "id",
        F.lit("2024-01-10 00:00:00").cast("timestamp").alias("time"),
        "event_type",
        "event_id",
    )
    src = tempfile.mkdtemp(prefix="stream_unmatched_src_")
    rows.unionByName(sentinels.select(rows.columns)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from curw_flo2d_data_manager_spark.streaming import (
        streaming_attribution_join,
    )

    schema = StructType([
        StructField("id", StringType()),
        StructField("time", TimestampType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
    ])
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        name = _run_replay_stream(
            spark, src,
            lambda s: streaming_attribution_join(
                s, "view", "purchase", gap="30 minutes",
                watermark="10 minutes", how="left_outer",
            ),
            "stream_unmatched_", "append", schema=schema,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return (
        spark.table(name)
        .filter(
            F.col("right_id").isNull()
            & ~F.col("id").startswith("sentinel")
        )
        .select(
            F.col("id").cast("long").alias("user_id"),
            F.col("left_id").alias("view_id"),
        )
        .orderBy("user_id", "view_id")
    )


STREAM_UNMATCHED_SQL = """
SELECT v.user_id AS user_id, v.event_id AS view_id
FROM events v
WHERE v.event_type = 'view'
  AND CAST(v.ts AS TIMESTAMP) < TIMESTAMP '2024-01-06 00:00:00'
  AND NOT EXISTS (
    SELECT 1 FROM events p
    WHERE p.user_id = v.user_id
      AND p.event_type = 'purchase'
      AND CAST(p.ts AS TIMESTAMP) < TIMESTAMP '2024-01-06 00:00:00'
      AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
      AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP)
          + INTERVAL 30 MINUTE
  )
ORDER BY user_id, view_id
"""


def a_exact_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact mode (most frequent l_quantity with min-value
    tie-break) — the hot-group-safe argmax: a (group, value) count
    then ``max(struct(cnt, -value))``, both partial-aggregable, no
    rank window anywhere (operators/exactstats.py::group_mode)."""
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        group_mode,
    )

    li = _t(spark, sf_dir, "lineitem")
    return group_mode(
        li, ["l_returnflag", "l_linestatus"], "l_quantity"
    ).orderBy("l_returnflag", "l_linestatus")


A_MODE_SQL = """
WITH c AS (
    SELECT l_returnflag, l_linestatus, l_quantity, COUNT(*) AS cnt
    FROM lineitem GROUP BY 1, 2, 3
),
r AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_returnflag, l_linestatus
        ORDER BY cnt DESC, l_quantity ASC) AS rn
    FROM c
)
SELECT l_returnflag, l_linestatus, l_quantity AS mode_value,
       cnt AS mode_count
FROM r WHERE rn = 1
ORDER BY l_returnflag, l_linestatus
"""


def a_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower weighted median of l_quantity weighted by revenue
    (fixed-point cents, so cumulative/total sums are exact BIGINTs) —
    the interpolation-free pick rule 2·cum ≥ tot on a per-distinct-
    value pre-aggregation (operators/exactstats.py::weighted_median:
    the window runs over ≤50 distinct quantities per flag, never the
    raw rows)."""
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        weighted_median,
    )

    li = _t(spark, sf_dir, "lineitem")
    w_fp = F.round(F.col("l_extendedprice") * 100).cast("long")
    return weighted_median(
        li, ["l_returnflag"], "l_quantity", w_fp
    ).orderBy("l_returnflag")


A_WMEDIAN_SQL = """
WITH agg AS (
    SELECT l_returnflag, l_quantity,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS w_fp
    FROM lineitem GROUP BY 1, 2
),
cum AS (
    SELECT l_returnflag, l_quantity,
           SUM(w_fp) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                           ROWS UNBOUNDED PRECEDING) AS cum_w,
           SUM(w_fp) OVER (PARTITION BY l_returnflag) AS tot_w
    FROM agg
)
SELECT l_returnflag, MIN(l_quantity) AS weighted_median,
       CAST(MAX(tot_w) AS BIGINT) AS total_weight_fp
FROM cum WHERE 2 * cum_w >= tot_w
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def a_moments_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact skewness/kurtosis per return flag from integer raw power
    sums Σx..Σx⁴ (l_quantity is integer-valued) — the moments are
    assembled from the exact BIGINTs with one fixed basic-ops
    sequence, so the unrounded doubles hash-match the oracle bit for
    bit (operators/exactstats.py::moments_fixed)."""
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        moments_fixed,
    )

    li = _t(spark, sf_dir, "lineitem")
    return moments_fixed(
        li, ["l_returnflag"], F.col("l_quantity")
    ).orderBy("l_returnflag")


A_MOMENTS_SQL = """
WITH s AS (
    SELECT l_returnflag, COUNT(*) AS n,
           SUM(CAST(l_quantity AS BIGINT)) AS s1,
           SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
           SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
               * CAST(l_quantity AS BIGINT)) AS s3,
           SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
               * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
    FROM lineitem GROUP BY 1
),
d AS (
    SELECT l_returnflag, n,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
           CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
           CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4
    FROM s
),
m AS (
    SELECT l_returnflag, n, mean,
           e2 - mean * mean AS m2,
           e3 - 3.0 * mean * e2 + 2.0 * mean * mean * mean AS m3,
           e4 - 4.0 * mean * e3 + 6.0 * mean * mean * e2
              - 3.0 * mean * mean * mean * mean AS m4
    FROM d
)
SELECT l_returnflag, n, mean, m2,
       CASE WHEN m2 > 0 THEN m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) END
           AS skewness,
       CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 END AS kurtosis
FROM m ORDER BY l_returnflag
"""


def ml_linreg_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact closed-form linear regression of revenue cents on
    quantity per return flag (normal equations over BIGINT sufficient
    statistics, DECIMAL(38) cross products, one fixed divide
    sequence) — the fixed-point counterpart of w_trend_slope's float
    regr_slope (operators/mltrain.py::linreg_normal_exact); the
    unrounded slope/intercept/corr doubles hash-match the oracle."""
    from curw_flo2d_data_manager_spark.operators.mltrain import (
        linreg_normal_exact,
    )

    li = _t(spark, sf_dir, "lineitem")
    return linreg_normal_exact(
        li,
        ["l_returnflag"],
        F.col("l_quantity"),
        F.round(F.col("l_extendedprice") * 100).cast("long"),
    ).orderBy("l_returnflag")


ML_LINREG_SQL = """
WITH s AS (
    SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sx,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS HUGEINT) AS sy,
           CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                AS HUGEINT) AS sxx,
           CAST(SUM(CAST(l_quantity AS BIGINT)
                    * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS HUGEINT) AS sxy,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS HUGEINT) AS syy
    FROM lineitem GROUP BY 1
),
m AS (
    SELECT l_returnflag, n,
           n * sxy - sx * sy AS num,
           n * sxx - sx * sx AS den,
           n * syy - sy * sy AS deny,
           sx, sy
    FROM s
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CASE WHEN CAST(den AS DOUBLE) > 0
            THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS slope_fp,
       CASE WHEN CAST(den AS DOUBLE) > 0
            THEN (CAST(sy AS DOUBLE)
                  - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
       END AS intercept_fp,
       CASE WHEN CAST(den AS DOUBLE) > 0 AND CAST(deny AS DOUBLE) > 0
            THEN CAST(num AS DOUBLE)
                 / (sqrt(CAST(den AS DOUBLE)) * sqrt(CAST(deny AS DOUBLE)))
       END AS corr
FROM m ORDER BY l_returnflag
"""


def ml_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between click and
    error event-value distributions — the drift/shift detector next to
    ml_auc_exact's ranking view, carried as an integer numerator so
    max and argmax are engine-exact
    (operators/mltrain.py::ks_statistic_exact)."""
    from curw_flo2d_data_manager_spark.operators.mltrain import (
        ks_statistic_exact,
    )

    ev = (
        _events(spark, sf_dir)
        .filter(
            F.col("event_type").isin("click", "error")
            & F.col("value").isNotNull()
        )
        .select(
            F.col("value").alias("score"),
            (F.col("event_type") == "click").cast("int").alias("y"),
        )
    )
    return ks_statistic_exact(ev, "score", "y")


ML_KS_SQL = """
WITH g AS (
    SELECT value AS score,
           SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS pos,
           SUM(CASE WHEN event_type = 'click' THEN 0 ELSE 1 END) AS neg
    FROM events
    WHERE event_type IN ('click', 'error') AND value IS NOT NULL
    GROUP BY value
),
c AS (
    SELECT score,
           SUM(pos) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS cpos,
           SUM(neg) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) AS cneg,
           SUM(pos) OVER () AS n_pos,
           SUM(neg) OVER () AS n_neg
    FROM g
)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(ABS(cpos * n_neg - cneg * n_pos) AS BIGINT) AS ks_num,
       ROUND(CAST(ABS(cpos * n_neg - cneg * n_pos) AS DOUBLE)
             / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6)
           AS ks_stat,
       score AS ks_at_score
FROM c ORDER BY ks_num DESC, score ASC LIMIT 1
"""


def _gain_sql(rank_expr: str) -> str:
    """SQL twin of mltrain.ndcg_at_k's fixed-point DCG gain
    round(10⁶·LN2/ln(rank+1)) — deterministic basic-ops log, explicit
    DOUBLE casts so neither engine routes a constant through DECIMAL
    arithmetic."""
    lnr = _ln_ratio_det_sql(f"({rank_expr}) + 1", "1")
    return (
        "CAST(ROUND(CAST(1000000.0 AS DOUBLE)"
        f" * CAST(0.6931471805599453 AS DOUBLE) / {lnr}) AS BIGINT)"
    )


def ml_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the brute-force cosine retrieval run with
    label-match binary relevance — retrieval-quality eval for the ANN
    stack, with the per-position 1/log₂ discount frozen to
    fixed-point BIGINT gains via the deterministic basic-ops log so
    DCG/IDCG are exact integer sums
    (operators/mltrain.py::ndcg_at_k)."""
    from curw_flo2d_data_manager_spark.operators.mltrain import ndcg_at_k

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding",
        F.col("label").alias("qlabel"),
    )
    run = cosine_topk(emb, q.select("query_id", "embedding"), k=10)
    rel = (
        run.join(F.broadcast(q.select("query_id", "qlabel")), "query_id")
        .join(
            emb.select(
                F.col("vec_id").alias("corpus_id"),
                F.col("label").alias("clabel"),
            ),
            "corpus_id",
        )
        .withColumn(
            "rel", (F.col("qlabel") == F.col("clabel")).cast("int")
        )
    )
    return ndcg_at_k(rel, "query_id", "rank", "rel", k=10).orderBy(
        "query_id"
    )


ML_NDCG_SQL = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
    FROM embeddings WHERE vec_id < 20
),
scored AS (
    SELECT q.query_id, q.qlabel, e.vec_id AS corpus_id, e.label AS clabel,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                  CAST(q.qv AS DOUBLE[])) AS cosine
    FROM embeddings e CROSS JOIN q
),
ranked AS (
    SELECT query_id, qlabel, corpus_id, clabel,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, corpus_id) AS rank
    FROM scored
),
run AS (
    SELECT query_id,
           CASE WHEN qlabel = clabel THEN 1 ELSE 0 END AS rel, rank
    FROM ranked WHERE rank <= 10
),
perq AS (
    SELECT query_id, CAST(SUM(rel) AS BIGINT) AS n_rel,
           CAST(SUM(rel * {GAIN_RANK}) AS BIGINT) AS dcg_fp
    FROM run GROUP BY 1
),
ideal AS (
    SELECT query_id, n_rel, dcg_fp,
           CASE WHEN n_rel > 0 THEN (
               SELECT CAST(SUM({GAIN_I}) AS BIGINT)
               FROM UNNEST(generate_series(1,
                    CAST(LEAST(n_rel, 10) AS BIGINT))) AS t(i)
           ) END AS idcg_fp
    FROM perq
)
SELECT query_id, n_rel, dcg_fp, idcg_fp,
       CASE WHEN n_rel > 0
            THEN ROUND(CAST(dcg_fp AS DOUBLE) / CAST(idcg_fp AS DOUBLE), 6)
       END AS ndcg
FROM ideal ORDER BY query_id
"""
ML_NDCG_SQL = ML_NDCG_SQL.replace("{GAIN_RANK}", _gain_sql("rank")).replace(
    "{GAIN_I}", _gain_sql("i")
)


def g_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 predicted missing edges of the part co-occurrence graph
    by resource-allocation index (exact fixed-point Σ floor(10⁶/deg w)
    over shared neighbors), with common-neighbor count and
    neighborhood Jaccard — wedge enumeration keyed on the shared
    neighbor, repartition-pinned against AQE's input-sized coalescing
    (operators/linkpredict.py::link_prediction_scores)."""
    from curw_flo2d_data_manager_spark.operators.linkpredict import (
        link_prediction_scores,
    )

    edges = _part_cooccur_edges(spark, sf_dir)
    scores = link_prediction_scores(edges, "p_a", "p_b")
    return scores.orderBy(
        F.desc("ra_fp"), "node_a", "node_b"
    ).limit(100)


G_LINKPRED_SQL = """
WITH li AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01'
),
e AS MATERIALIZED (
    SELECT DISTINCT a.p AS a, b.p AS b
    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
),
adj AS MATERIALIZED (
    SELECT a AS w, b AS n FROM e UNION ALL SELECT b, a FROM e
),
deg AS MATERIALIZED (SELECT w, COUNT(*) AS deg FROM adj GROUP BY w),
wd AS MATERIALIZED (
    SELECT adj.w, adj.n,
           CAST(FLOOR(CAST(1000000.0 AS DOUBLE) / deg.deg) AS BIGINT) AS ra_w
    FROM adj JOIN deg ON adj.w = deg.w
),
pairs AS MATERIALIZED (
    SELECT a1.n AS u, a2.n AS v, COUNT(*) AS common,
           CAST(SUM(a1.ra_w) AS BIGINT) AS ra_fp
    FROM wd a1 JOIN wd a2 ON a1.w = a2.w AND a1.n < a2.n
    GROUP BY 1, 2
),
nonadj AS (
    SELECT p.* FROM pairs p
    WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = p.u AND e.b = p.v)
),
scored AS (
    SELECT u AS node_a, v AS node_b, common, ra_fp,
           ROUND(CAST(common AS DOUBLE)
                 / CAST(du.deg + dv.deg - common AS DOUBLE), 6) AS jaccard
    FROM nonadj
    JOIN deg du ON du.w = nonadj.u
    JOIN deg dv ON dv.w = nonadj.v
)
SELECT * FROM scored ORDER BY ra_fp DESC, node_a, node_b LIMIT 100
"""


def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 word-bigram collocations by pointwise mutual
    information, every log the deterministic basic-ops ln so the PMI
    doubles are bit-identical cross-engine and the ordering is frozen
    through round(pmi·10⁶) BIGINTs
    (operators/textstats.py::pmi_bigrams)."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        pmi_bigrams,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return pmi_bigrams(docs, "doc_id", "text", min_count=5, k=50)


TEXT_PMI_SQL = """
WITH w AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')), '\\s+') AS words
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9\\x80-\\x{ffff}-]+', ' ', 'g')) != ''
),
uni AS MATERIALIZED (
    SELECT word, COUNT(*) AS c
    FROM w, UNNEST(words) AS t(word) GROUP BY 1
),
nu AS (SELECT SUM(c) AS n_uni FROM uni),
g AS (
    SELECT array_to_string(words[i:i+1], ' ') AS term
    FROM w, UNNEST(generate_series(1, greatest(len(words) - 1, 1))) AS t(i)
),
bi0 AS MATERIALIZED (
    SELECT term, COUNT(*) AS c_xy FROM g
    WHERE len(string_split(term, ' ')) = 2
    GROUP BY 1
),
nb AS (SELECT SUM(c_xy) AS n_bi FROM bi0),
j AS (
    SELECT b.term, b.c_xy, u1.c AS c_x, u2.c AS c_y, nu.n_uni, nb.n_bi
    FROM bi0 b
    JOIN uni u1 ON u1.word = string_split(b.term, ' ')[1]
    JOIN uni u2 ON u2.word = string_split(b.term, ' ')[2]
    CROSS JOIN nu CROSS JOIN nb
    WHERE b.c_xy >= 5
),
scored AS (
    SELECT term, c_xy, c_x, c_y,
           CAST(ROUND((((({LN_CXY} + 2.0 * {LN_NU}) - {LN_NB}) - {LN_CX})
                       - {LN_CY}) * CAST(1000000.0 AS DOUBLE))
                AS BIGINT) AS pmi_fp
    FROM j
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY pmi_fp DESC, term ASC) AS rank
    FROM scored
)
SELECT term, c_xy, c_x, c_y, pmi_fp, rank
FROM ranked WHERE rank <= 50
"""
TEXT_PMI_SQL = (
    TEXT_PMI_SQL.replace("{LN_CXY}", _ln_ratio_det_sql("c_xy", "1"))
    .replace("{LN_NU}", _ln_ratio_det_sql("n_uni", "1"))
    .replace("{LN_NB}", _ln_ratio_det_sql("n_bi", "1"))
    .replace("{LN_CX}", _ln_ratio_det_sql("c_x", "1"))
    .replace("{LN_CY}", _ln_ratio_det_sql("c_y", "1"))
)


def w_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing 5-row moving median of event values per user —
    the robust smoother next to w_moving_avg/w_ewma, materialized as
    a bounded collect_list frame because Spark has no framed median
    window function; the (lo+hi)/2.0 middle rule keeps the doubles
    bit-identical to the oracle's identical list construction
    (operators/smoothing.py::moving_median)."""
    from curw_flo2d_data_manager_spark.operators.smoothing import (
        moving_median,
    )

    ev = (
        _events(spark, sf_dir)
        .filter((F.col("user_id") < 10) & F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    out = moving_median(ev, ["user_id"], ["ts", "event_id"], "value", 5)
    return out.select("user_id", "event_id", "moving_median").orderBy(
        "user_id", "event_id"
    )


W_MOVMED_SQL = """
WITH f AS (
    SELECT user_id, event_id,
           list_sort(list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS arr
    FROM events
    WHERE user_id < 10 AND value IS NOT NULL
)
SELECT user_id, event_id,
       (arr[CAST(FLOOR((len(arr) + 1) / 2) AS INT)]
        + arr[CAST(FLOOR(len(arr) / 2) AS INT) + 1]) / 2.0
           AS moving_median
FROM f ORDER BY user_id, event_id
"""


def j_point_in_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment join — customers as (acctbal, custkey-band) points
    inside supplier-derived rectangles — via the one-home-bucket grid
    trick: rectangles explode to the x-buckets they span, points keep
    one bucket, equi-join then exact BETWEEN refine; no cartesian, no
    dedup needed (operators/spatial.py::point_in_rect_join)."""
    from curw_flo2d_data_manager_spark.operators.spatial import (
        point_in_rect_join,
    )

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("px"),
        (F.col("c_custkey") % 1000).cast("double").alias("py"),
    )
    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - F.lit(100.0)).alias("x_lo"),
        (F.col("s_acctbal") + F.lit(100.0)).alias("x_hi"),
        (F.col("s_nationkey") * 40).cast("double").alias("y_lo"),
        ((F.col("s_nationkey") * 40).cast("double") + F.lit(100.0)).alias(
            "y_hi"
        ),
    )
    out = point_in_rect_join(cust, sup, bucket_width=100.0)
    return out.select("s_suppkey", "c_custkey").orderBy(
        "s_suppkey", "c_custkey"
    )


J_RECT_SQL = """
WITH p AS (
    SELECT c_custkey, c_acctbal AS px,
           CAST(c_custkey % 1000 AS DOUBLE) AS py,
           CAST(FLOOR(c_acctbal / 100.0) AS BIGINT) AS bx
    FROM customer
),
r AS (
    SELECT s_suppkey,
           s_acctbal - 100.0 AS x_lo, s_acctbal + 100.0 AS x_hi,
           CAST(s_nationkey * 40 AS DOUBLE) AS y_lo,
           CAST(s_nationkey * 40 AS DOUBLE) + 100.0 AS y_hi
    FROM supplier
),
rb AS (
    SELECT r.*, t.bx
    FROM r, UNNEST(generate_series(CAST(FLOOR(x_lo / 100.0) AS BIGINT),
                                   CAST(FLOOR(x_hi / 100.0) AS BIGINT)))
         AS t(bx)
)
SELECT s_suppkey, c_custkey
FROM p JOIN rb USING (bx)
WHERE px BETWEEN x_lo AND x_hi AND py BETWEEN y_lo AND y_hi
ORDER BY s_suppkey, c_custkey
"""


def mm_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform video frame-sampling plan (which frame indices and
    timestamps the decode stage grabs) over synthetic per-asset
    duration/fps metadata — all exact integer division, the
    SQL-checkable scheduling half of the multimodal video path
    (operators/multimodal.py::frame_sample_plan; the decode half is
    the stand-in-codec mapInPandas in sample_frames)."""
    from curw_flo2d_data_manager_spark.operators.multimodal import (
        frame_sample_plan,
    )

    docs = _t(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        (F.lit(1000) + (F.col("doc_id") % 97) * 750)
        .cast("long")
        .alias("duration_ms"),
        (F.lit(2400) + (F.col("doc_id") % 3) * 600)
        .cast("long")
        .alias("fps_x100"),
    )
    return frame_sample_plan(assets, "asset_id", k=8).orderBy(
        "asset_id", "frame_idx"
    )


MM_FRAMEPLAN_SQL = """
WITH a AS (
    SELECT doc_id AS asset_id,
           1000 + (doc_id % 97) * 750 AS duration_ms,
           2400 + (doc_id % 3) * 600 AS fps_x100
    FROM documents
),
t AS (
    SELECT asset_id, fps_x100,
           (duration_ms * fps_x100) // 100000 AS total_frames
    FROM a WHERE (duration_ms * fps_x100) // 100000 > 0
),
f AS (
    SELECT DISTINCT asset_id, fps_x100, total_frames,
           (s.i * total_frames) // LEAST(8, total_frames) AS frame_idx
    FROM t, UNNEST(generate_series(0,
             CAST(LEAST(8, total_frames) - 1 AS BIGINT))) AS s(i)
)
SELECT asset_id, total_frames, frame_idx,
       (frame_idx * 100000) // fps_x100 AS ts_ms
FROM f ORDER BY asset_id, frame_idx
"""


def g_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distances over the part co-occurrence
    graph (seeds = nodes ≡ 0 mod 97): synchronous frontier relaxation,
    4 rounds, integer min-distances — deterministic on any
    partitioning, so the unrolled-CTE oracle replays it exactly
    (operators/components.py::bfs_hops)."""
    from curw_flo2d_data_manager_spark.operators.components import (
        bfs_hops,
    )

    edges = _part_cooccur_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("p_a").alias("id"))
        .unionAll(edges.select(F.col("p_b").alias("id")))
        .distinct()
        .filter(F.col("id") % 97 == 0)
    )
    return bfs_hops(
        edges, nodes, n_rounds=4, src="p_a", dst="p_b"
    ).orderBy("node")


G_BFS_SQL = """
WITH li AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01'
),
e AS MATERIALIZED (
    SELECT DISTINCT a.p AS a, b.p AS b
    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
),
adj AS MATERIALIZED (
    SELECT a AS node, b AS nb FROM e UNION ALL SELECT b, a FROM e
),
d0 AS MATERIALIZED (
    SELECT DISTINCT node, 0 AS dist
    FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
    WHERE node % 97 = 0
),
d1 AS MATERIALIZED (
    SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d0
        UNION ALL
        SELECT adj.nb AS node, d0.dist + 1 AS dist
        FROM adj JOIN d0 ON adj.node = d0.node
    ) GROUP BY node
),
d2 AS MATERIALIZED (
    SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d1
        UNION ALL
        SELECT adj.nb AS node, d1.dist + 1 AS dist
        FROM adj JOIN d1 ON adj.node = d1.node
    ) GROUP BY node
),
d3 AS MATERIALIZED (
    SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d2
        UNION ALL
        SELECT adj.nb AS node, d2.dist + 1 AS dist
        FROM adj JOIN d2 ON adj.node = d2.node
    ) GROUP BY node
),
d4 AS MATERIALIZED (
    SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d3
        UNION ALL
        SELECT adj.nb AS node, d3.dist + 1 AS dist
        FROM adj JOIN d3 ON adj.node = d3.node
    ) GROUP BY node
)
SELECT node, dist FROM d4 ORDER BY node
"""


def x_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: per user, the first view and the first purchase
    at-or-after it, with the exact microsecond delta — the
    time-dimension companion of x_funnel_steps' step counts. Two
    partial-aggregable reductions (first-view per user, then min
    qualifying purchase) — no window, no per-user sort."""
    ev = _events(spark, sf_dir)
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    return (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_purchase"))
        .select(
            "user_id",
            "first_view",
            "first_purchase",
            (
                F.unix_micros("first_purchase")
                - F.unix_micros("first_view")
            ).alias("delta_us"),
        )
        .orderBy("user_id")
    )


X_CONVERT_SQL = """
WITH fv AS (
    SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_view
    FROM events WHERE event_type = 'view' GROUP BY 1
)
SELECT f.user_id, f.first_view,
       MIN(CAST(p.ts AS TIMESTAMP)) AS first_purchase,
       epoch_us(MIN(CAST(p.ts AS TIMESTAMP))) - epoch_us(f.first_view)
           AS delta_us
FROM fv f
JOIN events p ON p.user_id = f.user_id AND p.event_type = 'purchase'
             AND CAST(p.ts AS TIMESTAMP) >= f.first_view
GROUP BY f.user_id, f.first_view
ORDER BY f.user_id
"""


def stream_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT distinct users per 6-hour tumbling window —
    chained stateful operators (watermark-evicted dedup feeding a
    windowed count; streaming/ingest.streaming_windowed_distinct), the
    one Structured Streaming shape the other streams don't cover.
    Far-future sentinel rows flush the last real window on the finite
    replay and are filtered out below; DuckDB's batch COUNT(DISTINCT)
    per bucket is the oracle."""
    import tempfile

    end = "2024-01-03 00:00:00"
    ev = _events(spark, sf_dir, end=end).filter(
        F.col("ts") < F.lit(end).cast("timestamp")
    )
    rows = ev.select(
        F.col("user_id").cast("string").alias("id"),
        F.col("ts").alias("time"),
        "value",
    )
    sentinel = spark.createDataFrame(
        [("zz_sentinel", "2024-06-01 00:00:00", 0.0)],
        "id string, time string, value double",
    ).select("id", F.col("time").cast("timestamp").alias("time"), "value")
    src = tempfile.mkdtemp(prefix="stream_wdist_src_")
    rows.unionByName(sentinel).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    from curw_flo2d_data_manager_spark.streaming import (
        streaming_windowed_distinct,
    )

    # two chained stateful operators keep state stores PER shuffle
    # partition, and the count is frozen into the checkpoint at first
    # start — scope it to the handful of 6-hour windows in the replay
    # (the round-10 stream-join lesson; measured 16.4 s → ~7 s)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        name = _run_replay_stream(
            spark, src,
            lambda s: streaming_windowed_distinct(s, "6 hours", "1 hour"),
            "stream_wdist_", "append",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return (
        spark.table(name)
        .filter(
            F.col("wstart_s")
            < F.unix_timestamp(F.lit(end).cast("timestamp"))
        )
        .select("wstart_s", "n_ids")
        .orderBy("wstart_s")
    )


STREAM_WDIST_SQL = """
SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 21600) * 21600
            AS BIGINT) AS wstart_s,
       COUNT(DISTINCT user_id) AS n_ids
FROM events
WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00'
GROUP BY 1 ORDER BY 1
"""


def ml_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic between click and error event
    values (fixed-point cents) — the significance test beside
    ml_ks_statistic's distribution distance: one conditional-aggregate
    pass, exact BIGINT sufficient statistics, unrounded doubles
    hash-matched against the oracle's identical expression tree
    (operators/exactstats.py::welch_ttest)."""
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        welch_ttest,
    )

    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "error")
        & F.col("value").isNotNull()
    )
    return welch_ttest(
        ev,
        F.round(F.col("value") * 100).cast("long"),
        (F.col("event_type") == "click").cast("int"),
    )


ML_TTEST_SQL = """
WITH s AS (
    SELECT
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN event_type = 'click'
                 THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
             AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN event_type = 'click'
                 THEN CAST(ROUND(value * 100) AS BIGINT)
                      * CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
             AS BIGINT) AS q1,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             AS BIGINT) AS n0,
        CAST(SUM(CASE WHEN event_type = 'error'
                 THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
             AS BIGINT) AS s0,
        CAST(SUM(CASE WHEN event_type = 'error'
                 THEN CAST(ROUND(value * 100) AS BIGINT)
                      * CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
             AS BIGINT) AS q0
    FROM events
    WHERE event_type IN ('click', 'error') AND value IS NOT NULL
),
d AS (
    SELECT n1, n0,
           CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
           CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
           (CAST(q1 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
           (CAST(q0 AS DOUBLE)
            - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
              / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0) AS v0
    FROM s
),
e AS (
    SELECT n1, n0, m1, m0, v1, v0,
           v1 / CAST(n1 AS DOUBLE) + v0 / CAST(n0 AS DOUBLE) AS se2
    FROM d
)
SELECT n1, n0, m1 AS mean1, m0 AS mean0,
       CASE WHEN n1 >= 2 AND n0 >= 2 AND se2 > 0
            THEN (m1 - m0) / sqrt(se2) END AS t_stat,
       CASE WHEN n1 >= 2 AND n0 >= 2 AND se2 > 0
            THEN (se2 * se2) /
                 ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
                      / (CAST(n1 AS DOUBLE) - 1.0)
                  + (v0 / CAST(n0 AS DOUBLE)) * (v0 / CAST(n0 AS DOUBLE))
                      / (CAST(n0 AS DOUBLE) - 1.0))
       END AS welch_df
FROM e
"""


def ml_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test of event_type × user
    bucket — the categorical-association check beside the t-test's
    means: per-cell (O−E)²/E terms frozen to fixed-point BIGINTs so
    the cell sum is exact in any visit order
    (operators/exactstats.py::chi_square_fixed)."""
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        chi_square_fixed,
    )

    ev = _events(spark, sf_dir)
    return chi_square_fixed(
        ev, F.col("event_type"), F.col("user_id") % 4
    )


ML_CHISQ_SQL = """
WITH cell AS (
    SELECT event_type AS r, user_id % 4 AS c, COUNT(*) AS o
    FROM events GROUP BY 1, 2
),
rowm AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rt FROM cell GROUP BY 1),
colm AS (SELECT c, CAST(SUM(o) AS BIGINT) AS ct FROM cell GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cell),
terms AS (
    SELECT tot.n, cell.r, cell.c,
           CAST(ROUND((CAST(cell.o AS DOUBLE)
                       - CAST(rowm.rt AS DOUBLE) * CAST(colm.ct AS DOUBLE)
                         / CAST(tot.n AS DOUBLE))
                      * (CAST(cell.o AS DOUBLE)
                         - CAST(rowm.rt AS DOUBLE) * CAST(colm.ct AS DOUBLE)
                           / CAST(tot.n AS DOUBLE))
                      / (CAST(rowm.rt AS DOUBLE) * CAST(colm.ct AS DOUBLE)
                         / CAST(tot.n AS DOUBLE))
                      * CAST(1000000.0 AS DOUBLE))
                AS BIGINT) AS term_fp
    FROM cell
    JOIN rowm ON rowm.r = cell.r
    JOIN colm ON colm.c = cell.c
    CROSS JOIN tot
)
SELECT n, COUNT(DISTINCT r) AS n_rows, COUNT(DISTINCT c) AS n_cols,
       (COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1) AS dof,
       CAST(SUM(term_fp) AS BIGINT) AS chi2_fp,
       CAST(CAST(SUM(term_fp) AS BIGINT) AS DOUBLE)
           / CAST(1000000.0 AS DOUBLE) AS chi2
FROM terms GROUP BY n
"""


def ml_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; user bucket) in nats — the
    dependence strength the chi-square only tests for: every cell log
    via the deterministic basic-ops ln with an explicit sign, frozen
    to per-cell BIGINTs so the sum is exact in any visit order
    (operators/exactstats.py::mutual_info_fixed)."""
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        mutual_info_fixed,
    )

    ev = _events(spark, sf_dir)
    return mutual_info_fixed(
        ev, F.col("event_type"), F.col("user_id") % 8
    )


ML_MI_SQL = """
WITH cell AS (
    SELECT event_type AS x, user_id % 8 AS y, COUNT(*) AS cxy
    FROM events GROUP BY 1, 2
),
xm AS (SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx FROM cell GROUP BY 1),
ym AS (SELECT y, CAST(SUM(cxy) AS BIGINT) AS cy FROM cell GROUP BY 1),
tot AS (SELECT CAST(SUM(cxy) AS BIGINT) AS n FROM cell),
terms AS (
    SELECT tot.n,
           cell.cxy * (CASE WHEN cell.cxy * tot.n >= xm.cx * ym.cy
                THEN CAST(ROUND({LN_POS} * CAST(1000000.0 AS DOUBLE))
                          AS BIGINT)
                ELSE -CAST(ROUND({LN_NEG} * CAST(1000000.0 AS DOUBLE))
                           AS BIGINT)
           END) AS term_fp
    FROM cell
    JOIN xm ON xm.x = cell.x
    JOIN ym ON ym.y = cell.y
    CROSS JOIN tot
)
SELECT n, COUNT(*) AS n_cells,
       CAST(SUM(term_fp) AS BIGINT) AS mi_fp,
       CAST(CAST(SUM(term_fp) AS BIGINT) AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(1000000.0 AS DOUBLE)) AS mi_nats
FROM terms GROUP BY n
"""
ML_MI_SQL = ML_MI_SQL.replace(
    "{LN_POS}", _ln_ratio_det_sql("cell.cxy * tot.n", "xm.cx * ym.cy")
).replace(
    "{LN_NEG}", _ln_ratio_det_sql("xm.cx * ym.cy", "cell.cxy * tot.n")
)


# Registry order is CONTRACTUAL: the external correctness driver
# verifies only the FIRST 50 entries. Window policy (amended in round
# 11 per the round-10 advice, which caught the S-family gates rotating
# out while this comment still demanded full family coverage):
# positions 1-50 hold, in priority order, (a) never-driver-certified
# additions, (b) queries over operator code touched this round,
# (c) one gate per SURVEY §2 family whose latest certification is
# older than round N-2 — a fully re-certified family MAY rotate out
# entirely while its certification is recent, (d) the oldest-certified
# entries. Rotated-out entries remain covered by the per-round local
# full sweep (tools/check_correctness.py, all entries, sf0.01).
# tests/test_registry_window.py pins the realized window.
DRIVER_WINDOW = 50

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # ---- round-11 driver window (positions 1-50; pinned by
    # tests/test_registry_window.py). Rotation policy (amended per the
    # round-10 advice): (a) never-driver-certified additions first,
    # (b) queries whose OPERATOR CODE changed this round (the
    # deterministic-idf rewrite, the bq NULL-query filter, the k_core
    # early-exit), (c) one gate per SURVEY §2 family whose last
    # certification would otherwise age past the rotation horizon
    # (S/P/O/U this round — a family may rotate out of the window
    # only while its gates hold a RECENT certification, r>=N-2),
    # (d) the entries with the OLDEST certification (the r5 cohort).
    # Everything displaced stays verified by the local full sweep
    # (tools/check_correctness.py) each round.
    # ---- round-11 additions (never driver-certified)
    "ml_ttest_welch": (ml_ttest_welch, ML_TTEST_SQL),
    "ml_chi_square": (ml_chi_square, ML_CHISQ_SQL),
    "ml_mutual_info": (ml_mutual_info, ML_MI_SQL),
    "g_bfs_hops": (g_bfs_hops, G_BFS_SQL),
    "x_time_to_convert": (x_time_to_convert, X_CONVERT_SQL),
    "stream_window_distinct": (stream_window_distinct, STREAM_WDIST_SQL),
    "a_exact_mode": (a_exact_mode, A_MODE_SQL),
    "a_weighted_median": (a_weighted_median, A_WMEDIAN_SQL),
    "a_moments_fixed": (a_moments_fixed, A_MOMENTS_SQL),
    "ml_linreg_normal": (ml_linreg_normal, ML_LINREG_SQL),
    "ml_ks_statistic": (ml_ks_statistic, ML_KS_SQL),
    "ml_ndcg": (ml_ndcg, ML_NDCG_SQL),
    "g_link_predict": (g_link_predict, G_LINKPRED_SQL),
    "text_pmi_bigrams": (text_pmi_bigrams, TEXT_PMI_SQL),
    "w_moving_median": (w_moving_median, W_MOVMED_SQL),
    "j_point_in_rect": (j_point_in_rect, J_RECT_SQL),
    "mm_frame_plan": (mm_frame_plan, MM_FRAMEPLAN_SQL),
    # ---- operator code touched this round
    "sim_sparse_cosine": (sim_sparse_cosine, SIM_SPARSE_COSINE_SQL),
    "sim_bq_hamming": (sim_bq_hamming, SIM_BQ_SQL),
    "g_kcore": (g_kcore, G_KCORE_SQL),
    # ---- family gates restored (S/P/O/U; round-10 advice)
    "s2_grid_scan_correction": (s2_grid_scan_correction, S2_SQL),
    "s6_max_end_time": (s6_max_end_time, S6_SQL),
    "p1_hychan_roundtrip": (p1_hychan_roundtrip, P1_SQL),
    "o2_ordered_topk": (o2_ordered_topk, O2_SQL),
    "u2_set_ops": (u2_set_ops, U2_SET_SQL),
    # ---- oldest-certified cohort (last green r5)
    "j_asof_join": (j_asof_join, J_ASOF_SQL),
    "a2_resample_right_closed": (a2_resample_right_closed, A2_SQL),
    "a4_cumulative_fraction": (a4_cumulative_fraction, A4_SQL),
    "w3_fill_down": (w3_fill_down, W3_SQL),
    "w_sessionize_events": (w_sessionize_events, W_SESSION_SQL),
    "q12_priority_case": (q12_priority_case, Q12_SQL),
    "x4_json_extract": (x4_json_extract, X4_SQL),
    "k3_raincell_render": (k3_raincell_render, K3_SQL),
    "k5_chan_render": (k5_chan_render, K5_SQL),
    "k8_run_metadata": (k8_run_metadata, K8_SQL),
    "f9_get_or_create": (f9_get_or_create, F9_SQL),
    "j1_calendar_spine": (j1_calendar_spine, J1_SQL),
    "j2_dim_enrichment": (j2_dim_enrichment, J2_SQL),
    "stream_cumsum_events": (stream_cumsum_events, STREAM_CUMSUM_SQL),
    "stream_session_events": (stream_session_events, STREAM_SESSION_SQL),
    "dedup_exact": (dedup_exact_docs, DEDUP_EXACT_SQL),
    "sim_cosine_topk": (sim_cosine_topk, SIM_TOPK_SQL),
    "sim_lsh_pairs": (sim_lsh_pairs, SIM_LSH_SQL),
    "text_token_counts": (text_token_counts, TEXT_TOKENS_SQL),
    "text_quality": (text_quality, TEXT_QUALITY_SQL),
    "w_moving_avg": (w_moving_avg, W_MOVAVG_SQL),
    "x_unpivot_lineitem": (x_unpivot_lineitem, X_UNPIVOT_SQL),
    "a_cube_counts": (a_cube_counts, A_CUBE_SQL),
    "a_percentiles": (a_percentiles, A_PCT_SQL),
    "k7_merge_upsert": (k7_merge_upsert, K7_SQL),
    # ---- past the window: re-verified via local full sweeps
    "q13_order_distribution": (q13_order_distribution, Q13_SQL),
    "q7_nation_volume": (q7_nation_volume, Q7_SQL),
    "q2_min_supplier": (q2_min_supplier, Q2_SQL),
    "dedup_simhash": (dedup_simhash_docs, DEDUP_SIMHASH_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh_docs, DEDUP_MINHASH_SQL),
    "sim_ivf_topk": (sim_ivf_topk_docs, SIM_IVF_SQL),
    "text_inverted_index": (text_inverted_index, TEXT_INVERTED_SQL),
    "g_triangle_count": (g_triangle_count, G_TRIANGLE_SQL),
    "sketch_countmin": (sketch_countmin, SKETCH_COUNTMIN_SQL),
    "stream_join_attrib": (stream_join_attrib, STREAM_ATTRIB_SQL),
    "stream_join_unmatched": (stream_join_unmatched, STREAM_UNMATCHED_SQL),
    "g_clustering_coef": (g_clustering_coef, G_CLUSTERING_SQL),
    "g_pagerank_weighted": (g_pagerank_weighted, G_WPR_SQL),
    "ml_train_classifier": (ml_train_classifier, ML_TRAIN_SQL),
    "ml_auc_exact": (ml_auc_exact, ML_AUC_SQL),
    "ml_calibration_bins": (ml_calibration_bins, ML_CALIBRATION_SQL),
    "ml_confusion_matrix": (ml_confusion_matrix, ML_CONFUSION_SQL),
    "sim_gram_matrix": (sim_gram_matrix, SIM_GRAM_SQL),
    "text_readability": (text_readability, TEXT_READABILITY_SQL),
    "x_event_transitions": (x_event_transitions, X_TRANSITIONS_SQL),
    "a_salted_sum": (a_salted_sum, A_SALTED_SQL),
    "stream_hot_terms": (stream_hot_terms, STREAM_HOT_SQL),
    "dedup_fuzzy_names": (dedup_fuzzy_names, DEDUP_FUZZY_SQL),
    "a_profile_columns": (a_profile_columns, A_PROFILE_SQL),
    "text_zipf_slope": (text_zipf_slope, TEXT_ZIPF_SQL),
    "sim_label_prop": (sim_label_prop, SIM_LABEL_PROP_SQL),
    "w_autocorr": (w_autocorr, W_AUTOCORR_SQL),
    "sim_mmr_rerank": (sim_mmr_rerank, SIM_MMR_SQL),
    "a_histogram_equidepth": (a_histogram_equidepth, A_EQUIDEPTH_SQL),
    "w_trend_slope": (w_trend_slope, W_TREND_SQL),
    "x_global_rownum": (x_global_rownum, X_ROWNUM_SQL),
    "x_retention_cohorts": (x_retention_cohorts, X_RETENTION_SQL),
    "j_cooccurrence_pairs": (j_cooccurrence_pairs, J_COOCCUR_SQL),
    "a_rolling_actives": (a_rolling_actives, A_ROLLING_SQL),
    "a_grouping_sets": (a_grouping_sets, A_GROUPING_SETS_SQL),
    "sim_rank_fusion": (sim_rank_fusion, SIM_RRF_SQL),
    "dedup_containment": (dedup_containment, DEDUP_CONTAINMENT_SQL),
    "text_strip_boilerplate": (text_strip_boilerplate, TEXT_BOILERPLATE_SQL),
    "j_salted_join": (j_salted_join, J_SALTED_SQL),
    "x_zorder_index": (x_zorder_index, X_ZORDER_SQL),
    "f_robust_scale": (f_robust_scale, F_ROBUST_SQL),
    "w_peaks_over_threshold": (w_peaks_over_threshold, W_POT_SQL),
    "w_cusum_drift": (w_cusum_drift, W_CUSUM_SQL),
    "dedup_normalized": (dedup_normalized, DEDUP_NORM_SQL),
    "dedup_url_canonical": (dedup_url_canonical, DEDUP_URL_SQL),
    "a_histogram": (a_histogram, A_HISTOGRAM_SQL),
    "j_radius_grid": (j_radius_grid, J_RADIUS_SQL),
    "sim_sq_adc": (sim_sq_adc, SIM_SQ_SQL),
    "stream_pot_events": (stream_pot_events, STREAM_POT_SQL),
    "w_rate_of_change": (w_rate_of_change, W_RATE_SQL),
    "x_funnel_steps": (x_funnel_steps, X_FUNNEL_SQL),
    "f_zscore_norm": (f_zscore_norm, F_ZSCORE_SQL),
    "dedup_suffix_prefix": (dedup_suffix_prefix, DEDUP_SUFFIX_SQL),
    "stream_cusum_drift": (stream_cusum_events, STREAM_CUSUM2_SQL),
    "w_interp_user": (w_interp_user, W_INTERP_USER_SQL),
    "w_hampel_user": (w_hampel_user, W_HAMPEL_USER_SQL),
    "f_domain_cap": (f_domain_cap, F_DOMAIN_CAP_SQL),
    "f_quantile_norm": (f_quantile_norm, F_QUANTILE_NORM_SQL),
    "text_char_entropy": (text_char_entropy, TEXT_ENTROPY_SQL),
    "w_linear_interp": (w_linear_interp, W_INTERP_SQL),
    "sim_kmeans": (sim_kmeans, SIM_KMEANS_SQL),
    "sim_pq_adc": (sim_pq_adc, SIM_PQ_SQL),
    "sim_pq_rerank": (sim_pq_rerank, SIM_PQ_RERANK_SQL),
    "sim_ivfpq": (sim_ivfpq, SIM_IVFPQ_SQL),
    "j_interval_overlap": (j_interval_overlap, J_OVERLAP_SQL),
    "j_range_join": (j_range_join, J_RANGE_SQL),
    "j6_nearest_rank1": (j6_nearest_rank1, J6_SQL),
    "j8_gap_fill": (j8_gap_fill, J8_SQL),
    "q16_supplier_cnt": (q16_supplier_cnt, Q16_SQL),
    "q17_small_quantity": (q17_small_quantity, Q17_SQL),
    "q22_idle_customers": (q22_idle_customers, Q22_SQL),
    "dedup_components": (dedup_components, DEDUP_COMPONENTS_SQL),
    "dedup_passages": (dedup_passages, DEDUP_PASSAGES_SQL),
    "text_bigram_logprob": (text_bigram_logprob, TEXT_BIGRAM_SQL),
    "f_split_assign": (f_split_assign, F_SPLIT_SQL),
    "sim_semantic_dedup": (sim_semantic_dedup, SIM_SEMDEDUP_SQL),
    "stream_corpus_quality": (stream_corpus_quality, STREAM_QUALITY_SQL),
    "a_approx_percentiles": (a_approx_percentiles, A_APPROX_PCT_SQL),
    "text_chunk_documents": (text_chunk_documents, TEXT_CHUNK_SQL),
    "text_frequent_terms": (text_frequent_terms, TEXT_FREQ_SQL),
    "text_epoch_plan": (text_epoch_plan, TEXT_EPOCH_SQL),
    "stream_corpus_neardup": (stream_corpus_neardup, STREAM_NEARDUP_SQL),
    "f_materialize_mixture": (f_materialize_mixture, F_MATERIALIZE_SQL),
    "sim_knn_graph": (sim_knn_graph, SIM_KNN_SQL),
    "text_dsir_weights": (text_dsir_weights, TEXT_DSIR_SQL),
    "f_length_buckets": (f_length_buckets, F_LENBUCKET_SQL),
    "dedup_bloom_filter": (dedup_bloom_filter, DEDUP_BLOOM_SQL),
    "stream_corpus_decontam": (stream_corpus_decontam, STREAM_DECONTAM_SQL),
    "text_ccnet_buckets": (text_ccnet_buckets, TEXT_CCNET_SQL),
    "text_hash_classifier": (text_hash_classifier, TEXT_CLASSIFIER_SQL),
    "dedup_repeated_spans": (dedup_repeated_spans, DEDUP_SPANS_SQL),
    "dedup_span_rebuild": (dedup_span_rebuild, DEDUP_SPAN_REBUILD_SQL),
    "w_hampel_despike": (w_hampel_despike, W_HAMPEL_SQL),
    "dedup_contam_spans": (dedup_contam_spans, DEDUP_CONTAM_SPANS_SQL),
    "w_seasonal_baseline": (w_seasonal_baseline, W_SEASONAL_SQL),
    "sim_pagerank": (sim_pagerank, SIM_PAGERANK_SQL),
    "text_bm25_topk": (text_bm25_topk, TEXT_BM25_SQL),
    "w_winsorize": (w_winsorize, W_WINSOR_SQL),
    "w_ewma": (w_ewma, W_EWMA_SQL),
    "k8_start_date": (k8_start_date, K8_START_SQL),
    "sim_cosine_dedup": (sim_cosine_dedup, SIM_DEDUP_SQL),
    "sim_label_centroids": (sim_label_centroids, SIM_CENTROID_SQL),
    "s1_series_range_scan": (s1_series_range_scan, S1_SQL),
    "p2_timdep_roundtrip": (p2_timdep_roundtrip, P2_SQL),
    "mm_binary_meta": (mm_binary_meta, MM_BINARY_SQL),
    "k2_outflow_render": (k2_outflow_render, K2_SQL),
    "stream_resample_events": (stream_resample_events, STREAM_A2_SQL),
    "dedup_winnowing": (dedup_winnowing_docs, DEDUP_WINNOW_SQL),
    "dedup_winnow_pairs": (dedup_winnow_pairs_docs, DEDUP_WINNOW_PAIRS_SQL),
    "f_weighted_sample": (f_weighted_sample, F_WEIGHTED_SQL),
    "f_pack_sequences": (f_pack_sequences, F_PACK_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q11_important_share": (q11_important_share, Q11_SQL),
    "q20_heavy_suppliers": (q20_heavy_suppliers, Q20_SQL),
    "q21_exclusive_failures": (q21_exclusive_failures, Q21_SQL),
    "text_tfidf_terms": (text_tfidf_terms, TEXT_TFIDF_SQL),
    "text_domain_mixture": (text_domain_mixture, TEXT_MIXTURE_SQL),
    "dedup_cluster_filter": (dedup_cluster_filter, DEDUP_CLUSTER_SQL),
    "text_unigram_logprob": (text_unigram_logprob, TEXT_UNIGRAM_SQL),
    "f_mixture_resample": (f_mixture_resample, F_MIXTURE_SQL),
    "stream_corpus_dedup": (stream_corpus_dedup, STREAM_CORPUS_SQL),
    "sim_cross_decontam": (sim_cross_decontam, SIM_CROSS_SQL),
    "dedup_contamination": (dedup_contamination, DEDUP_CONTAM_SQL),
    "mm_decode_meta": (mm_decode_meta, MM_DECODE_SQL),
    "dedup_latest_version": (dedup_latest_version, DEDUP_LATEST_SQL),
    "text_url_extract": (text_url_extract, TEXT_URL_SQL),
    "stream_dedup_events": (stream_dedup_events, STREAM_DEDUP_SQL),
    "text_repetition_gates": (text_repetition_gates, TEXT_REPETITION_SQL),
    "f_hash_sample": (f_hash_sample, F_SAMPLE_SQL),
    "f_stratified_sample": (f_stratified_sample, F_STRAT_SQL),
    "a_rollup_cascade": (a_rollup_cascade, A_CASCADE_SQL),
    "a_session_window_native": (a_session_window_native, A_SESSION_WINDOW_SQL),
    "x_pivot_event_types": (x_pivot_event_types, X_PIVOT_SQL),
    "a_rollup_totals": (a_rollup_totals, A_ROLLUP_SQL),
    "a_distinct_counts": (a_distinct_counts, A_DISTINCT_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier": (q5_local_supplier, Q5_SQL),
    "q6_revenue_change": (q6_revenue_change, Q6_SQL),
    "q4_exists_semi": (q4_exists_semi, Q4_SQL),
    "q18_having_topk": (q18_having_topk, Q18_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q14_promo_share": (q14_promo_share, Q14_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q19_disjunctive": (q19_disjunctive, Q19_SQL),
    "s3_first_value_lookup": (s3_first_value_lookup, S3_SQL),
    "k1_fixed_width_render": (k1_fixed_width_render, K1_SQL),
    "f6_sentinel_cleaning": (f6_sentinel_cleaning, F6_SQL),
    "j5_semi_join": (j5_semi_join, J5_SQL),
    "w2_elapsed_hours": (w2_elapsed_hours, W2_SQL),
    "x11_series_hash_id": (x11_series_hash_id, X11_SQL),
    "dedup_fingerprint": (dedup_fingerprint_docs, DEDUP_FP_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard_docs, DEDUP_JACCARD_SQL),
    "text_lang_id": (text_lang_id, TEXT_LANG_SQL),
    "text_top_bigrams": (text_top_bigrams, TEXT_BIGRAMS_SQL),
    "text_pii_redact": (text_pii_redact, TEXT_PII_SQL),
    "s4_nearest_gauge_rain": (s4_nearest_gauge_rain, S4_SQL),
    "k4_rain_render": (k4_rain_render, K4_SQL),
    "a_approx_distinct": (a_approx_distinct, A_APPROX_SQL),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}

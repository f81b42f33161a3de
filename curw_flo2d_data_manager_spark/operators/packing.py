"""Sequence packing for training-data pipelines.

LLM pre-training consumes documents as fixed-token-budget training
sequences; packing many short documents into one sequence (instead of
padding each to the context length) is the standard throughput
optimization. True best-fit packing is inherently sequential, so the
scalable form used here is GREEDY CONTIGUOUS packing over a
deterministic document order: cumulative token position → bin index =
floor(exclusive_prefix / budget). A document straddling a budget
boundary stays in the bin where it started, so a bin can overflow by
at most one document's tokens, and the straddler eats into the next
bin's range — every non-last bin therefore carries at least
``budget - max_doc_tokens`` tokens (cap the per-document count with
``truncate_to`` to bound both effects).

Scale: the cumulative position uses the standard two-phase parallel
prefix (per-partition local cumsum + broadcast carry of per-partition
totals) — same decomposition as ``sources.line_text.filldown_headers``
— NOT a single global window, so packing 10 B documents keeps full
scan parallelism. The deterministic order is (order_col, id) so
re-runs bin identically.  Since round 13 the partition LABEL is
derived from the data itself (driver-sampled boundaries baked into a
comparison expression) rather than ``spark_partition_id()`` after a
range exchange — the two prefix traversals re-execute the labeling,
and physical partition ids are not stable across re-executions once
column pruning splits the exchange (see the inline comment for the
measured failure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _session_shuffle_partitions(spark) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating platforms
    where the conf holds a non-numeric value (e.g. ``'auto'`` under
    AQE-managed partitioning) — falls back to the scheduler's default
    parallelism; the value only influences label balance, never
    correctness."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except ValueError:
        return int(spark.sparkContext.defaultParallelism) or 200


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    order_col: str | None = None,
    truncate_to: int | None = None,
    max_label_parts: int = 64,
    label_col: str | None = None,
) -> DataFrame:
    """Assign each document a packing ``bin_id`` and its token offset
    within the bin.

    Returns the input columns plus ``n_tokens`` (possibly truncated),
    ``bin_id`` (long, 0-based) and ``bin_offset`` (long — the
    document's exclusive token start within the global stream;
    ``bin_offset - bin_id * budget`` is its offset inside the bin).

    ``order_col`` defaults to ``id_col`` (deterministic); pass e.g. a
    quality score to pack curriculum-style. ``truncate_to`` caps each
    document's token count first (None = no cap; a single document
    longer than ``budget`` then overflows its bin, as in real
    pipelines where such docs are chunked upstream).

    ``max_label_parts`` caps the prefix-decomposition label count
    INDEPENDENTLY of ``spark.sql.shuffle.partitions`` (round-13 nit:
    the per-row label expression is O(labels) struct compares, so a
    2,000-partition session must not pay 2,000 terms per row — labels
    need balance, not a 1:1 partition mapping; 64 labels keep the
    carry broadcast at 64 rows and the per-row cost bounded while
    still spreading the two window phases).

    Rows whose ``order_col``/``id_col`` are NULL are packed FIRST
    (label 0; NULLs sort first in Spark ascending order) — the
    boundary sample skips them, and the label comparison coalesces
    their incomparable struct keys to 0, so they are never dropped.
    """
    order = order_col or id_col
    tokens = F.col(token_col).cast("long")
    if truncate_to is not None:
        tokens = F.least(tokens, F.lit(int(truncate_to)))
    # The prefix decomposition needs every row labeled with an
    # order-monotone partition id that means THE SAME THING in both
    # traversals below (local prefix + per-partition totals).
    #
    # `spark_partition_id()` after repartitionByRange is NOT that
    # (round-13 fix, caught by the 10M-doc composed-pipeline smoke:
    # 247,098 bins where the closed form says 250,000, varying run to
    # run): column pruning gives the two traversals DIFFERENT range
    # exchanges (different output sets ⇒ not canonically equal ⇒
    # ReuseExchange does not fire), each exchange samples its OWN
    # boundaries (RangePartitioner seeds by RDD id), and on irregular
    # inputs the boundaries diverge — the same row then carries
    # different labels in the two traversals and the carry join
    # assigns wrong bins.  Uniform unit-test inputs sampled identical
    # boundaries by luck, which is why this only surfaced at scale.
    #
    # The label is therefore derived from the DATA: one bounded
    # deterministic sample of (order, id) is collected ONCE driver-
    # side, its quantiles become literal boundaries, and every row's
    # label is the count of boundaries ≤ (order, id) — a pure
    # expression that evaluates identically in every traversal, no
    # matter how AQE lays out the physical partitions.  Boundary
    # quality affects only balance, never correctness; ties on the
    # order key are split by id, so even a single hot order value
    # spreads across labels.
    n_parts = max(
        1,
        min(
            _session_shuffle_partitions(df.sparkSession),
            int(max_label_parts),
        ),
    )
    order_c, id_c = F.col(order), F.col(id_col)
    n_rows = df.count()
    boundaries: list = []
    if n_rows > n_parts:
        step = max(1, n_rows // (n_parts * 32))
        # NULL order/id rows are excluded from the sample (a NULL in
        # the driver-side sorted() would raise TypeError); label
        # monotonicity does not depend on which points are sampled,
        # and NULL-keyed rows coalesce to label 0 below.
        sample = sorted(
            (r["_o"], r["_i"])
            for r in df.select(order_c.alias("_o"), id_c.alias("_i"))
            .filter(
                order_c.isNotNull()
                & id_c.isNotNull()
                & (F.pmod(F.xxhash64(id_c), F.lit(step)) == 0)
            )
            .collect()
        )
        if len(sample) > n_parts:
            stride = len(sample) // n_parts
            boundaries = [
                sample[k * stride] for k in range(1, n_parts)
            ]
    if boundaries:
        # plain comparison chain, NOT a higher-order filter over a
        # literal array: a lambda capturing outer attributes trips
        # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND under column pruning
        # through the window/aggregate branches (observed Spark 4.1);
        # at ≤ n_parts-1 ≤ 63 terms the flat sum is small anyway.
        # coalesce(…, 0): a NULL order/id makes the struct compare
        # NULL — those rows must keep label 0 (NULLs sort first), not
        # a NULL label that an equi-join on _pid would silently drop.
        row_key = F.struct(order_c.alias("o"), id_c.alias("i"))
        lbl = sum(
            F.coalesce(
                (
                    row_key
                    >= F.struct(F.lit(o).alias("o"), F.lit(i).alias("i"))
                ).cast("int"),
                F.lit(0),
            )
            for o, i in boundaries
        )
    else:
        lbl = F.lit(0)
    base = (
        df.withColumn("_pid", lbl)
        .repartition(n_parts, F.col("_pid"))
        .withColumn("n_tokens", tokens)
    )

    # phase 1: local exclusive prefix inside each partition
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy(order, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "_local_prefix", F.coalesce(F.sum("n_tokens").over(w_loc), F.lit(0))
    )

    # phase 2: carry = total tokens of all earlier partitions
    # (partition count rows — broadcast back)
    totals = base.groupBy("_pid").agg(F.sum("n_tokens").alias("_ptotal"))
    w_carry = (
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = totals.withColumn(
        "_carry", F.coalesce(F.sum("_ptotal").over(w_carry), F.lit(0))
    ).select("_pid", "_carry")

    out = local.join(F.broadcast(carry), "_pid")
    start = F.col("_local_prefix") + F.col("_carry")
    out = (
        out.withColumn("bin_id", F.floor(start / F.lit(int(budget))))
        .withColumn("bin_offset", start)
    )
    if label_col is not None:
        # diagnostics/tests: expose the internal prefix label so the
        # max_label_parts bound is observable
        out = out.withColumn(label_col, F.col("_pid"))
    return out.drop("_pid", "_local_prefix", "_carry")


def bin_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Packing efficiency rollup: per-bin token fill and utilization
    (tokens/budget; the straddling document makes >1.0 possible)."""
    return (
        packed.groupBy("bin_id")
        .agg(
            F.sum("n_tokens").alias("bin_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumn(
            "utilization",
            F.round(F.col("bin_tokens") / F.lit(int(budget)), 4),
        )
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    len_col: str,
    batch_size: int,
    boundaries: list[int] | None = None,
    n_shards: int = 1,
) -> DataFrame:
    """Length-bucketed batch assembly: group documents of similar
    length into fixed-size training batches so a batch's padding waste
    is bounded by its bucket's length spread (the standard dynamic-
    batching trick for variable-length sequence training).

    ``boundaries`` are ascending upper-exclusive bucket edges; a row
    with length ``L`` lands in ``bucket = #{b : b <= L}`` (so edges
    [16, 64, 256] make 4 buckets: <16, 16-63, 64-255, >=256). Within a
    bucket, rows are sharded by the first 8 hex digits of ``md5(id)``
    taken as an integer mod ``n_shards`` (hash-uniform AND re-derivable
    in any engine) and ordered by ``(md5(id), id)`` — fully
    deterministic, re-runs batch identically; ``batch_idx`` counts off
    ``batch_size`` rows per (bucket, shard). The trailing batch of
    each (bucket, shard) may be short.

    Scale shape: the only wide operation is the per-(bucket, shard)
    row_number window. Buckets are FEW (a dozen edges) — a naive
    per-bucket window would funnel a 100-TB corpus through a dozen
    reducers, so the shard key exists precisely to restore
    parallelism: batches never cross shards, every (bucket, shard)
    partition is ~rows/(buckets·shards), and shard count scales with
    the cluster, not the data. ``n_shards=1`` reproduces the
    single-stream order for small corpora and oracle checks.

    Returns (id, length, bucket, shard, batch_idx, batch_pos) with
    batch_pos 0-based inside the batch.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size {batch_size} < 1")
    if n_shards < 1:
        raise ValueError(f"n_shards {n_shards} < 1")
    # None -> default edges; an explicit [] means a single bucket
    edges = sorted([32, 128, 512, 2048] if boundaries is None else boundaries)
    length = F.col(len_col).cast("long")
    if edges:
        bucket = F.size(
            F.filter(
                F.array(*[F.lit(int(b)) for b in edges]), lambda b: b <= length
            )
        )
    else:
        bucket = F.lit(0)
    sid = F.col(id_col).cast("string")
    out = df.select(
        F.col(id_col),
        length.alias("length"),
        bucket.alias("bucket"),
        F.md5(sid).alias("_ord"),
    ).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("_ord", 1, 8), 16, 10).cast("long"),
            F.lit(int(n_shards)),
        ),
    )
    w = Window.partitionBy("bucket", "shard").orderBy("_ord", id_col)
    seq = F.row_number().over(w) - 1
    return (
        out.withColumn("batch_idx", F.floor(seq / F.lit(int(batch_size))))
        .withColumn("batch_pos", seq % F.lit(int(batch_size)))
        .drop("_ord")
    )

"""Neighborhood-overlap link prediction over an undirected graph.

The prediction sibling of ``triangles.py`` (reference parity n/a —
the LLM-pipeline graph extension family): for every NON-adjacent node
pair reachable through at least one shared neighbor, score how likely
the missing edge is by the classic neighborhood-overlap indices —
common-neighbor count, Jaccard similarity of the neighborhoods, and
the resource-allocation index Σ_{w ∈ N(u)∩N(v)} 1/deg(w)
(Zhou/Lü/Zhang 2009; Liben-Nowell & Kleinberg 2003). These are the
"suggest an edge" primitives behind related-item panels and
duplicate-entity candidate generation on co-occurrence graphs.

Exactness contract: common/degree/union counts are integers; the RA
weight is frozen to fixed point as floor(scale/deg(w)) — floor of one
correctly-rounded IEEE divide, bit-identical cross-engine — so the RA
sum is an exact BIGINT; Jaccard needs one correctly-rounded divide of
exact integers at the end. A SQL oracle replays all of it.

Scale shape: wedges are enumerated from each shared neighbor w (one
self-join keyed on w), so a pair is produced once per common neighbor
and collapses in a partial-aggregable (u, v) groupBy. The wedge join
EXPANDS Σ deg(w)² over its input and AQE sizes shuffles from INPUT
bytes — both arms are pinned with an explicit repartition (the
triangles.py lesson). Hub blowup is bounded by ``max_wedge_degree``:
neighbors with degree above it contribute negligible RA weight and
quadratic wedges — the standard degree-cap applied by large-scale
implementations (drop w, not the pair). Adjacent pairs are removed
with one left-anti join against the canonical edge relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    ra_scale: int = 1_000_000,
    max_wedge_degree: int | None = None,
) -> DataFrame:
    """Score non-adjacent node pairs by neighborhood overlap.

    Returns (node_a, node_b, common, ra_fp, jaccard) with
    node_a < node_b: shared-neighbor count, resource-allocation index
    in ``ra_scale`` fixed-point units, and neighborhood Jaccard
    rounded to 6 decimals. Pairs already joined by an edge are
    excluded; pairs with no shared neighbor never materialize.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # symmetrize via ONE generator (the pagerank pattern): a union's
    # two branches each scan the checkpointed edge set separately;
    # identical directed-edge multiset from one traversal
    adj = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("w"), F.col("b").alias("n")),
                F.struct(F.col("b").alias("w"), F.col("a").alias("n")),
            )
        ).alias("p")
    ).select("p.w", "p.n")
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    # floor(scale/deg): one correctly-rounded divide + floor — the
    # deterministic fixed-point RA weight (exact BIGINT summand)
    wdeg = adj.join(deg, "w").withColumn(
        "ra_w",
        F.floor(F.lit(float(ra_scale)) / F.col("deg")).cast("long"),
    )
    if max_wedge_degree is not None:
        wdeg = wdeg.filter(F.col("deg") <= max_wedge_degree)
    n_parts = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    arm1 = wdeg.select("w", F.col("n").alias("u"), "ra_w")
    arm2 = wdeg.select("w", F.col("n").alias("v"))
    pairs = (
        arm1.repartition(n_parts, "w")
        .join(arm2.repartition(n_parts, "w"), "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum("ra_w").alias("ra_fp"),
        )
    )
    non_adj = pairs.join(
        e,
        (pairs["u"] == e["a"]) & (pairs["v"] == e["b"]),
        "left_anti",
    )
    du = deg.select(F.col("w").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("w").alias("v"), F.col("deg").alias("deg_v"))
    return (
        non_adj.join(du, "u")
        .join(dv, "v")
        .select(
            F.col("u").alias("node_a"),
            F.col("v").alias("node_b"),
            "common",
            "ra_fp",
            F.round(
                F.col("common").cast("double")
                / (
                    F.col("deg_u") + F.col("deg_v") - F.col("common")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )

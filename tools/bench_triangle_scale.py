"""Scale smoke for triangle_counts: millions of edges with EXACT
planted truth, generated distributed via spark.range (no driver edge
list).

Graph = C disjoint cliques of size S, chained: one bridge edge links
the max node of clique i to the min node of clique i+1. A clique-S
node sits in exactly C(S-1, 2) triangles; bridge edges add NONE (the
two endpoints share no neighbor — their cliques are otherwise
disjoint), so the truth is exact for every node and the gate is
mismatches == 0 over ALL nodes. The chain also stops the graph from
being embarrassingly disconnected — wedge enumeration must still
reject every cross-clique wedge at the closure join.

Degree skew probe: pass hub_spokes > 0 to attach that many fresh
degree-1 spoke nodes to node 0 — a celebrity node whose raw degree
dwarfs everyone's. Degree orientation must point every spoke edge INTO
the hub (spokes have lower degree), so the hub generates no wedges
from them and the planted truth is unchanged — the O(|E|^1.5) bound's
whole point.

Prints one JSON line. Usage:
python tools/bench_triangle_scale.py [n_cliques] [clique_size] [hub_spokes]
(defaults 160_000 6 100_000 -> 2.4M clique edges + 160k bridges +
100k hub spokes over ~1.06M nodes; per-node truth C(5,2) = 10)
"""

from __future__ import annotations

import itertools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.operators.triangles import triangle_counts
from curw_flo2d_data_manager_spark.session import get_spark


def main() -> None:
    n_cliques = int(sys.argv[1]) if len(sys.argv) > 1 else 160_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    hub_spokes = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    assert size >= 3 and n_cliques >= 2

    spark = get_spark(app_name="bench_triangle_scale")
    spark.sparkContext.setLogLevel("ERROR")

    pairs = list(itertools.combinations(range(size), 2))
    i_arr = F.array(*[F.lit(i) for i, _ in pairs])
    j_arr = F.array(*[F.lit(j) for _, j in pairs])
    n_pairs = len(pairs)
    clique = (F.col("id") / n_pairs).cast("long") * size
    p = (F.col("id") % n_pairs + 1).cast("int")
    clique_edges = spark.range(n_cliques * n_pairs).select(
        (clique + F.element_at(i_arr, p)).alias("src"),
        (clique + F.element_at(j_arr, p)).alias("dst"),
    )
    # bridge: clique i's max node (i*S + S-1) -> clique i+1's min node
    bridges = spark.range(n_cliques - 1).select(
        (F.col("id") * size + (size - 1)).alias("src"),
        ((F.col("id") + 1) * size).alias("dst"),
    )
    n_nodes = n_cliques * size
    # hub spokes: fresh node ids attached to node 0
    spokes = spark.range(hub_spokes).select(
        F.lit(0).cast("long").alias("src"),
        (F.col("id") + n_nodes).alias("dst"),
    )
    edges = clique_edges.unionByName(bridges).unionByName(spokes)
    n_edges = n_cliques * n_pairs + (n_cliques - 1) + hub_spokes

    per_node = math.comb(size - 1, 2)
    t0 = time.time()
    counts = triangle_counts(edges)
    # exact gate: every clique node shows per_node, nothing else shows
    agg = counts.agg(
        F.count(F.lit(1)).alias("nodes_with_triangles"),
        F.sum(F.when(F.col("n_triangles") != per_node, 1).otherwise(0))
        .alias("mismatches"),
        F.sum("n_triangles").alias("corner_total"),
    ).collect()[0]
    elapsed = time.time() - t0

    expect_total = n_cliques * size * per_node
    ok = (
        agg["mismatches"] == 0
        and agg["nodes_with_triangles"] == n_nodes
        and agg["corner_total"] == expect_total
    )
    print(json.dumps({
        "metric": "triangle_scale",
        "n_cliques": n_cliques,
        "clique_size": size,
        "hub_spokes": hub_spokes,
        "n_edges": n_edges,
        "n_nodes_in_triangles": agg["nodes_with_triangles"],
        "mismatches": int(agg["mismatches"]),
        "corner_total": int(agg["corner_total"]),
        "expected_corner_total": expect_total,
        "elapsed_sec": round(elapsed, 2),
        "edges_per_sec": int(n_edges / elapsed),
        "exact": bool(ok),
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

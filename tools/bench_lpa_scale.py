"""Scale smoke for label_propagation: millions of edges with EXACT
planted truth, generated distributed via spark.range (no driver edge
list).

Graph = C disjoint cliques of size S. Deterministic synchronous LPA
with the smallest-label tiebreak converges on a clique in exactly two
rounds to the clique's MINIMUM node id (round 1: every neighbor label
is distinct, ties resolve to the smallest — all nodes except the min
adopt it, the min node adopts the second-smallest; round 2: the
majority label is the min for every node, including the min node
itself whose neighbors all carry it). So after n_iters >= 2 every
node's label must equal ``S * floor(node / S)`` — any deviation is an
implementation bug, and the gate is mismatches == 0 over ALL nodes.

Prints one JSON line. Usage:
python tools/bench_lpa_scale.py [n_cliques] [clique_size] [iters]
(defaults 44_000 10 3 → ~1.98M undirected pair rows, 440k nodes)
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.operators.components import (
    label_propagation,
)
from curw_flo2d_data_manager_spark.session import get_spark


def main() -> None:
    n_cliques = int(sys.argv[1]) if len(sys.argv) > 1 else 44_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    assert size >= 4 and iters >= 2, "truth argument needs S>=4, iters>=2"

    spark = get_spark(app_name="bench_lpa_scale")
    spark.sparkContext.setLogLevel("ERROR")

    pairs = list(itertools.combinations(range(size), 2))
    i_arr = F.array(*[F.lit(i) for i, _ in pairs])
    j_arr = F.array(*[F.lit(j) for _, j in pairs])
    n_pairs = len(pairs)
    clique = (F.col("id") / n_pairs).cast("long") * size
    p = (F.col("id") % n_pairs + 1).cast("int")  # element_at is 1-based
    edges = spark.range(n_cliques * n_pairs).select(
        (clique + F.element_at(i_arr, p)).alias("id_a"),
        (clique + F.element_at(j_arr, p)).alias("id_b"),
    )

    t0 = time.time()
    labels = label_propagation(edges, n_iters=iters)
    agg = labels.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(
            F.when(
                F.col("label")
                != (F.col("id") / size).cast("long") * size,
                1,
            ).otherwise(0)
        ).alias("mismatches"),
        F.count_distinct("label").alias("n_communities"),
    ).collect()[0]
    lpa_s = time.time() - t0

    exact = (
        agg["n_nodes"] == n_cliques * size
        and agg["mismatches"] == 0
        and agg["n_communities"] == n_cliques
    )
    print(
        json.dumps(
            {
                "metric": "lpa_scale",
                "edges": n_cliques * n_pairs,
                "nodes": n_cliques * size,
                "cliques": n_cliques,
                "iters": iters,
                "exact": bool(exact),
                "mismatches": int(agg["mismatches"]),
                "communities": int(agg["n_communities"]),
                "sec": round(lpa_s, 2),
                "unit": "sec",
            }
        )
    )


if __name__ == "__main__":
    main()

"""Plan audit: render every registry query's physical plan at a given
sf and flag scale red-flags — cartesian products, non-broadcast nested
loop joins, row-at-a-time Python eval, and unusually deep exchange
counts. Usage: python tools/audit_plans.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from curw_flo2d_data_manager_spark import queries as q
from curw_flo2d_data_manager_spark.session import get_spark

RED_FLAGS = {
    "CartesianProduct": "cartesian product (unbounded n^2)",
    "BatchEvalPython": "row-at-a-time Python UDF",
}

# BroadcastNestedLoopJoin is fine iff the broadcast side is provably
# tiny (spine/gapfill grids, query batches); flag only for review.
WATCH = ["BroadcastNestedLoopJoin", "SortMergeJoin"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2:]
    spark = get_spark(app_name="audit_plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    bad = []
    for name, fn in q.queries().items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        if name.startswith("stream_"):
            continue  # streaming gates execute on build; audited via batch twins
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover
            print(f"ERR   {name}: {e}")
            bad.append(name)
            continue
        flags = [msg for marker, msg in RED_FLAGS.items() if marker in plan]
        watch = [m for m in WATCH if m in plan]
        n_exch = plan.count("Exchange")
        status = "FLAG" if flags else "ok"
        if flags:
            bad.append(name)
        print(
            f"{status:5} {name}: exchanges={n_exch}"
            + (f" red={flags}" if flags else "")
            + (f" watch={watch}" if watch else "")
        )
    print()
    if bad:
        print(f"{len(bad)} flagged: {bad}")
        sys.exit(1)
    print("no red flags")


if __name__ == "__main__":
    main()

"""Plan audit: render every registry query's physical plan at a given
sf and flag scale red-flags — cartesian products, non-broadcast nested
loop joins, row-at-a-time Python eval, quadratic window frames, and
unusually deep exchange counts.
Usage: python tools/audit_plans.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from curw_flo2d_data_manager_spark import queries as q
from curw_flo2d_data_manager_spark.session import get_spark

RED_FLAGS = {
    "CartesianProduct": "cartesian product (unbounded n^2)",
    "BatchEvalPython": "row-at-a-time Python UDF",
}

# A window frame whose UPPER bound is unboundedfollowing with a MOVING
# lower bound (currentrow / offset) is NOT incremental: Spark re-scans
# from the current row to the partition end for EVERY row — O(n²) per
# key (w_linear_interp measured 80 s → 1.5 s after rewriting to a
# descending running frame, round-8). A whole-partition frame
# (unboundedpreceding → unboundedfollowing) is computed once and is
# fine — only the moving-lower-bound case flags.
_UF_FRAME = re.compile(
    r"specifiedwindowframe\((?:Row|Range)Frame, ([a-z$()\-0-9]+), "
    r"unboundedfollowing"
)


def quadratic_frames(plan: str) -> list[str]:
    return [
        f"quadratic window frame ({lower} -> unboundedfollowing)"
        for lower in _UF_FRAME.findall(plan)
        if lower != "unboundedpreceding$()"
    ]

# BroadcastNestedLoopJoin is fine iff the broadcast side is provably
# tiny (spine/gapfill grids, query batches); flag only for review.
WATCH = ["BroadcastNestedLoopJoin", "SortMergeJoin"]

# A non-equi join becomes a nested-loop join whose broadcast side must
# be small; above this estimated size it is a red flag, not a watch
# item (round-4 verdict item 8).
BNLJ_SIZE_THRESHOLD = 32 * 1024 * 1024


def _children(node) -> list:
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def bnlj_risks(df, threshold: int = BNLJ_SIZE_THRESHOLD) -> list[str]:
    """Walk the optimized logical plan for joins with no equality in
    their condition (these execute as nested-loop joins) and return a
    description for each whose SMALLER side's estimated size exceeds
    ``threshold`` — i.e. nothing is safely broadcastable and the join
    degenerates toward n*m work at scale."""
    out = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        stack.extend(_children(node))
        if node.getClass().getSimpleName() != "Join":
            continue
        # an explicit F.broadcast() hint is the author asserting the
        # side is tiny — those sites are reviewed by hand (spine,
        # gapfill cells, query batches); logical size estimates for
        # them are meaningless (cross-join stats multiply children)
        if "strategy=broadcast" in node.hint().toString():
            continue
        cond = node.condition()
        cond_str = cond.toString() if cond.isDefined() else ""
        if "=" in cond_str:  # covers =, <=>, >=, <= (range joins keep
            continue  # a bounded band; the pure-inequality case below)
        sides = [int(str(c.stats().sizeInBytes())) for c in _children(node)]
        if sides and min(sides) > threshold:
            out.append(
                f"non-equi join, min side ~{min(sides) // (1024 * 1024)} MiB "
                f"(cond: {cond_str[:80] or 'none'})"
            )
    return out


# Round-15 auditor rule (round-14 verdict item 8): a join whose build
# arm is an AGGREGATE over the SAME leaf relations as the probe arm is
# the "model-counts join-back" shape — when the aggregate's grouping
# key equals the join key, the aggregate is usually expressible as a
# window sum on the probe arm's own exchange (the r14 tfidf/LM-scorer
# rewrites), saving the build arm's whole re-scan + the join.  Sites
# audited and deliberately KEPT (window form measured slower or
# not expressible) are allowlisted with the recorded reason.
AGG_SELFJOIN_ALLOW = {
    # norms arm aggregates ALL weighted terms while postings filter
    # df>=2 — not window-expressible (OPTIMIZATION_r14.md item 32)
    "sim_sparse_cosine",
    "sim_sparse_cosine_prefix",
    # rank-window WindowGroupLimit Partial must survive; full-frame
    # window aggregates collapse it (rejected A/B 7, r14)
    "text_inverted_index",
    # join arms aggregate DIFFERENT domains than the join key's own
    # partition (unigram stream / domain×term grid — r14 item 32)
    "text_pmi_bigrams",
    "text_js_divergence",
}


def _leaf_ids(node) -> frozenset:
    """Identifiers of the base relations under a logical node."""
    leaves = node.collectLeaves()
    out = []
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        s = leaf.toString()
        # normalize: first line carries the relation/path
        out.append(s.splitlines()[0][:200])
    return frozenset(out)


def _skip_unary(node):
    """Descend through Project/Filter wrappers."""
    while node.getClass().getSimpleName() in ("Project", "Filter"):
        node = _children(node)[0]
    return node


def agg_selfjoin_candidates(df) -> list[str]:
    out = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        stack.extend(_children(node))
        if node.getClass().getSimpleName() != "Join":
            continue
        cond = node.condition()
        if not cond.isDefined() or "=" not in cond.toString():
            continue
        kids = _children(node)
        if len(kids) != 2:
            continue
        shapes = [_skip_unary(k).getClass().getSimpleName() for k in kids]
        if "Aggregate" not in shapes:
            continue
        ids = [_leaf_ids(k) for k in kids]
        if not ids[0] or ids[0] != ids[1]:
            continue
        agg_side = kids[shapes.index("Aggregate")]
        out.append(
            "aggregate-build self-join (window-sum candidate): "
            f"agg side {_skip_unary(agg_side).toString().splitlines()[0][:120]}"
        )
    return out


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
        flags.extend(quadratic_frames(plan))
        if "BroadcastNestedLoopJoin" in plan:
            flags.extend(bnlj_risks(df))
        if name not in AGG_SELFJOIN_ALLOW:
            flags.extend(agg_selfjoin_candidates(df))
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

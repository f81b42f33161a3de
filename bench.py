"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced to full execution with a count-style action
(``df.write.format("noop")`` when available, else ``count()``); timing
excludes session startup but includes planning + execution.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from curw_flo2d_data_manager_spark import queries as q
from curw_flo2d_data_manager_spark.operators.caching import release_caches
from curw_flo2d_data_manager_spark.session import get_spark

# Headline set: one per operator family — TPC-H-style analytics, the
# raincell whole-range derivation, spine/gap joins, resample + window
# pipelines, and the training-data operators (dedup/similarity/text).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue_change",
    "q10_returned_items",
    "q13_order_distribution",
    "s1_series_range_scan",
    "s2_grid_scan_correction",
    "s3_first_value_lookup",
    "j1_calendar_spine",
    "j2_dim_enrichment",
    "j5_semi_join",
    "j8_gap_fill",
    "a2_resample_right_closed",
    "a4_cumulative_fraction",
    "w3_fill_down",
    "w_sessionize_events",
    "x_pivot_event_types",
    "x11_series_hash_id",
    "k2_outflow_render",
    "k3_raincell_render",
    "k4_rain_render",
    "o2_ordered_topk",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_token_counts",
    "text_quality",
    "text_lang_id",
]


def _run(df) -> int:
    try:
        df.write.format("noop").mode("overwrite").save()
        return -1
    except Exception:
        return df.count()


_TICK = os.sysconf("SC_CLK_TCK")


def _cpu_seconds() -> float:
    """Total CPU seconds (utime+stime+cutime+cstime) of this process
    and every live descendant — the local-mode JVM plus its pyspark
    daemons/workers.  CPU time is the load-robust counterpart of wall
    time: scheduler queueing under ambient load inflates wall but not
    CPU (measured on this box: +23% wall vs +3% CPU under a 10-thread
    ambient load).  Reading /proc directly keeps the measurement
    scoped to OUR process tree, unlike cgroup counters which would
    include co-tenant load."""
    me = os.getpid()
    procs: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as fh:
                raw = fh.read().decode("ascii", "replace")
        except OSError:
            continue
        # comm can contain spaces/parens: split after the LAST ')'
        rest = raw[raw.rindex(")") + 2:].split()
        ppid = int(rest[1])
        ticks = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        procs[int(d)] = (ppid, ticks)
    total = 0
    seen: set[int] = set()
    frontier = {me}
    while frontier:
        for pid in frontier:
            if pid in procs and pid not in seen:
                total += procs[pid][1]
                seen.add(pid)
        frontier = {
            pid
            for pid, (ppid, _) in procs.items()
            if ppid in seen and pid not in seen
        }
    return total / _TICK


# Calibration probes (round-10 verdict item 1; protocol rebuilt in
# round 13 per the round-12 verdict: the old single pre-pass
# min-of-3 could not see load landing DURING the query passes, so
# BENCH_r12 recorded a phantom 12% regression).
#
# Two probes, BOTH run before and after every pass (extras and
# headline) so no load window between probes goes unseen:
# * the SERIAL probe (single-partition codegen aggregate) measures
#   momentary single-thread machine speed — its run-wide MIN
#   (probe_s) is the cross-round machine-speed rescale;
# * the PARALLEL probe (same aggregate, 32 partitions) saturates the
#   box, so it detects ambient load that a 1-thread probe reads
#   right through (the round-12 blindness: +13% query inflation with
#   a flat serial probe).
#
# A pass is TRUSTED when both bracketing probe pairs read quiet
# (within TRUST_FACTOR of reference).  value_normalized = (sum of
# per-query mins over trusted passes) × PROBE_REF_S / probe_s; when
# NO pass is trusted the run falls back to all passes and sets
# "loaded_window": true — an explicit machine-readable flag instead
# of a forensically un-pickable number.
#
# Why trust + reject rather than rescale by a probe ratio: the
# round-13 A/B measured the three candidate estimators under a
# sustained 10-thread ambient load on this 32-core box — wall +8%,
# serial probe ±0%, saturating parallel probe +34%, process-tree CPU
# seconds −15% (intra-JVM contention burn DROPS when fewer tasks run
# concurrently, at identical wall).  Load sensitivity differs per
# resource shape, so no probe ratio can rescale a loaded pass onto
# the quiet scale; what probes CAN do reliably is certify a pass as
# quiet.  Min-of-passes + trusted-pass selection recovers the quiet
# number whenever any pass lands in a quiet window (the realistic
# bursty co-tenant case — r12's own probes varied 1.6× across three
# samples); sustained whole-run load gets the honest flag.
PROBE_REF_S = 0.65
_PROBE_EXPECT = 19999186012603  # sum(pmod(xxhash64(id),1000003)), 40M rows
PROBE_PAR_REF_S = 0.70
_PROBE_PAR_EXPECT = 560012413488450  # same sum, 1.12B rows
# Trust thresholds (measured separation on this box: quiet headline
# brackets read ≤0.99× the parallel reference, the sustained-10-loop
# load ≥1.23× — so 1.15 splits them with margin; the serial probe is
# noisier relative to its 0.65 anchor, 1.25 keeps quiet windows in).
TRUST_FACTOR = 1.25       # serial probe ≤ 1.25× reference
TRUST_FACTOR_PAR = 1.15   # parallel probe ≤ 1.15× reference


def _probe(spark) -> float:
    t0 = time.monotonic()
    row = (
        spark.range(0, 40_000_000, 1, 1)
        .selectExpr("sum(pmod(xxhash64(id), 1000003)) as h", "avg(id % 97) as a")
        .collect()
    )
    dt = round(time.monotonic() - t0, 3)
    if row[0][0] != _PROBE_EXPECT:  # pragma: no cover - engine defect
        raise AssertionError(f"probe hash mismatch: {row[0][0]}")
    return dt


def _probe_par(spark) -> float:
    t0 = time.monotonic()
    row = (
        spark.range(0, 1_120_000_000, 1, 32)
        .selectExpr("sum(pmod(xxhash64(id), 1000003)) as h")
        .collect()
    )
    dt = round(time.monotonic() - t0, 3)
    if row[0][0] != _PROBE_PAR_EXPECT:  # pragma: no cover - engine defect
        raise AssertionError(f"parallel probe hash mismatch: {row[0][0]}")
    return dt


def _timed(fn, spark, sf_dir) -> tuple[float, float]:
    """Time one query (wall AND process-tree CPU) to full
    materialization, then release any operator-tracked caches
    (minhash signatures, passage explodes, unigram tf) so NOTHING
    leaks into the next query's measurement — round-5 verdict item 2:
    without this, 70+ queries of accumulated persisted relations
    inflated the late-session numbers ~6x."""
    c0 = _cpu_seconds()
    t0 = time.monotonic()
    _run(fn(spark, sf_dir))
    dt = round(time.monotonic() - t0, 3)
    dc = round(_cpu_seconds() - c0, 3)
    release_caches()
    return dt, dc


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()

    # Warm shared machinery once (parquet reader, shuffle, hash-agg,
    # noop sink) so per-query numbers measure each plan, not
    # first-touch JIT of common infrastructure.
    warm = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .count()
    )
    _run(warm)

    # One throwaway probe each to JIT codegen, then a serial+parallel
    # probe pair at EVERY checkpoint: before the extras, after each
    # extras pass, and after each headline pass — so every pass is
    # bracketed on both sides (the round-13 load-robust protocol —
    # see the probe definitions above).  probe_s stays the serial MIN
    # for cross-round continuity.
    _probe(spark)
    _probe_par(spark)
    # second parallel warmup: the first post-JIT parallel probe still
    # reads ~15% high (measured 0.811 vs the 0.805 trust limit — a
    # cold first checkpoint spuriously untrusts extras pass A)
    _probe_par(spark)

    probes: list[float] = []
    par_probes: list[float] = []

    def _checkpoint() -> None:
        probes.append(_probe(spark))
        par_probes.append(_probe_par(spark))

    _checkpoint()

    # Multi-pass protocol (round-2 verdict item 6; fixed 2 passes →
    # adaptive 3..6 passes in round 13): pass totals were STILL
    # descending ~5%/pass at pass 3 (codegen/JIT warmup), and how far
    # down that curve a run got dominated run-to-run spread (measured
    # 15.5-17.1 s across four quiet runs at the same HEAD).  The
    # headline now keeps running passes until a TRUSTED pass stops
    # improving on the best total by >2% (min 3, max 6 passes), so
    # every run reports the converged plateau.  Extras run a fixed 2
    # passes (they are secondary metrics; 114 gates × extra passes
    # would dominate the bench budget).
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    max_passes = max(passes, 6)
    extras_passes = min(passes, 2)

    # Non-headline extras (round-5 additions): run FIRST — before the
    # headline passes, at minimum session pollution — and with the
    # same paired-pass min protocol, so extras are comparable
    # run-to-run (round-5 verdict item 6: measured last, they read
    # session-position noise, not plan cost). Reported under their own
    # keys so the headline total stays comparable across rounds.
    # dedup_components / dedup_cluster_filter include their
    # connected-components contraction rounds by construction.
    EXTRA = [
        "dedup_components",
        "dedup_passages",
        "dedup_cluster_filter",
        "text_tfidf_terms",
        "text_domain_mixture",
        "text_unigram_logprob",
        "f_mixture_resample",
        # round-6 additions
        "text_bigram_logprob",
        "f_split_assign",
        "sim_semantic_dedup",
        "text_chunk_documents",
        "a_approx_percentiles",
        "text_frequent_terms",
        "text_epoch_plan",
        "f_materialize_mixture",
        # round-7 additions
        "sim_knn_graph",
        "text_dsir_weights",
        "f_length_buckets",
        "dedup_bloom_filter",
        "sim_pq_adc",
        "sim_pq_rerank",
        "text_ccnet_buckets",
        "text_hash_classifier",
        "sim_ivfpq",
        "dedup_repeated_spans",
        "dedup_span_rebuild",
        "w_hampel_despike",
        "dedup_contam_spans",
        "w_linear_interp",
        "w_seasonal_baseline",
        "sim_pagerank",
        "text_bm25_topk",
        "j_interval_overlap",
        "w_winsorize",
        # round-8 additions: high-cardinality-key window variants
        # (1500 user_id keys at sf0.1 vs event_type's 5) so per-key
        # window costs are measured at realistic series cardinality
        "w_interp_user",
        "w_hampel_user",
        "f_domain_cap",
        "f_quantile_norm",
        "text_char_entropy",
        "w_peaks_over_threshold",
        "w_cusum_drift",
        "dedup_normalized",
        "dedup_url_canonical",
        "a_histogram",
        "j_radius_grid",
        "sim_sq_adc",
        "w_rate_of_change",
        "x_funnel_steps",
        "f_zscore_norm",
        "dedup_suffix_prefix",
        "a_salted_sum",
        "j_salted_join",
        "x_zorder_index",
        "f_robust_scale",
        "dedup_fuzzy_names",
        "a_profile_columns",
        "text_zipf_slope",
        "sim_label_prop",
        "w_autocorr",
        "sim_mmr_rerank",
        "a_histogram_equidepth",
        "w_trend_slope",
        "x_global_rownum",
        "x_retention_cohorts",
        "j_cooccurrence_pairs",
        "a_rolling_actives",
        "a_grouping_sets",
        "sim_rank_fusion",
        "dedup_containment",
        "text_strip_boilerplate",
        # round-10 additions: sparse ApSS, IR-index build, graph
        # triangles, CM sketch, stream-stream interval join
        "sim_sparse_cosine",
        "text_inverted_index",
        "g_triangle_count",
        "sketch_countmin",
        "stream_join_attrib",
        "stream_join_unmatched",
        "g_kcore",
        "sim_bq_hamming",
        "g_clustering_coef",
        "text_readability",
        "x_event_transitions",
        "g_pagerank_weighted",
        "ml_train_classifier",
        "ml_auc_exact",
        "ml_calibration_bins",
        "ml_confusion_matrix",
        "sim_gram_matrix",
        # round-11 additions: exact stats (mode / weighted median /
        # moments / normal-equation regression / KS), retrieval NDCG,
        # link prediction, PMI collocations, moving median,
        # rectangle-containment join, frame-sampling plan
        "a_exact_mode",
        "a_weighted_median",
        "a_moments_fixed",
        "ml_linreg_normal",
        "ml_ks_statistic",
        "ml_ndcg",
        "g_link_predict",
        "text_pmi_bigrams",
        "w_moving_median",
        "j_point_in_rect",
        "mm_frame_plan",
        "g_bfs_hops",
        "ml_ttest_welch",
        "ml_chi_square",
        "ml_mutual_info",
        "x_time_to_convert",
        # round-12 additions: BPE subword token budgeting, HTML strip
        "text_bpe_tokens",
        "text_strip_html",
        "stream_window_distinct",
        # late round-11 additions: retrieval eval, HITS, rank stats,
        # domain JSD, the Bayardo-prefix ApSS gate
        "ml_mrr",
        "ml_map",
        "g_hits",
        "ml_spearman",
        "ml_mann_whitney",
        "text_js_divergence",
        "sim_sparse_cosine_prefix",
        "a_gini_orders",
        # round-13 addition: packing's partition labeling was
        # rewritten (data-derived boundaries) -- time its gate when
        # the code changes and in the rotation thereafter
        "f_pack_sequences",
        # round-14 additions: the four growth gates over this round's
        # operator rewrites (lang regexp_count, hashed shingles,
        # NULL-order packing, markup fast paths)
        "text_lang_scores",
        "dedup_shingle_hashes",
        "f_pack_null_order",
        "text_strip_clean",
    ]
    # Tiered extras (round-11 verdict item 3): the extras list grew
    # past 110 gates and re-ran IN FULL every round (~160 s) whether
    # or not the gated code changed — the full ORACLE sweep (all
    # entries, every round) is the correctness backstop, so the bench
    # only needs timings for (1) gates whose operator code changed
    # this round (CHANGED_THIS_ROUND, maintained per round) and
    # (2) a deterministic rotating third of the rest, keyed by
    # md5(name) so each gate's bucket is stable and the rotation
    # index advances with the BENCH_r*.json the driver writes each
    # round — every gate gets a fresh timing at least every 3 rounds.
    # SPARK_GRAFT_BENCH_FULL_EXTRAS=1 restores the full list.
    CHANGED_THIS_ROUND = [
        # round 14
        "text_lang_id",          # regexp_count lang scores
        "text_lang_scores",      # new: raw multiplicities gate
        "dedup_minhash_lsh",     # hashed shingles
        "dedup_shingle_hashes",  # new: shingle-cardinality gate
        "dedup_cluster_filter",  # composite over the hashed path
        "f_pack_sequences",      # label cap + NULL-order handling
        "f_pack_null_order",     # new: nullable-order packing gate
        "text_strip_html",       # lazy '<'/'&' gates + bounded amp
        "text_strip_clean",      # new: fast-path byte-identity gate
        "sim_sparse_cosine_prefix",  # r13 <8 s combined bar — now
        "sim_sparse_cosine",         # judged on the normalized figure
        # round-14 late-session optimization targets
        "sim_sq_adc",            # SQL-string expression build
        "g_pagerank_weighted",   # single-pass edge symmetrization
        "a_histogram_equidepth",  # parallel order-statistics edges
        "text_pmi_bigrams",      # single-tokenize shared counts
        "text_js_divergence",    # cc derived from cd, one tokenize
        "dedup_cluster_filter",  # single-generator planted corpus
        "sim_semantic_dedup",    # single-generator planted corpus
        "sim_ivfpq",             # single-generator planted corpus
        "dedup_passages",        # single-generator planted corpus
        "dedup_suffix_prefix",   # single-generator planted corpus
        # round-14 resumed-session optimization targets
        "text_frequent_terms",   # exact hash-bucket candidates, no Python
        "sketch_countmin",       # sketch from exact counts, TakeOrdered
        "text_bm25_topk",        # per-document tf/dl projection
        "g_kcore",               # single-scan degree explode
        "stream_join_attrib",    # replay state parallelism 8 -> 4
        "text_tfidf_terms",      # window df + rlike N, single tokenize
        "g_triangle_count",      # single-scan degree explode
        "g_clustering_coef",     # single-generator degree pass
        "g_bfs_hops",            # single-generator seed nodes
        "g_link_predict",        # single-generator adjacency
        "dedup_normalized",      # single-generator planted corpus
        "stream_dedup_events",   # single-generator tripled replay input
        "ml_auc_exact",          # keep_cols label pass-through
        "ml_calibration_bins",   # keep_cols label pass-through
        "ml_confusion_matrix",   # keep_cols label pass-through
        "dedup_components",      # single-scan node set
        "text_chunk_documents",  # in-expression empty-doc drop
        "text_bigram_logprob",   # pre-filter removed + window model counts
        "text_unigram_logprob",  # window model counts
        "text_dsir_weights",     # window model counts
        "text_ccnet_buckets",    # window model counts (via unigram scorer)
        "dedup_bloom_filter",    # persisted fingerprint projection
        "text_strip_boilerplate",  # row-expression line totals
        # also touched this round but not listed here: text_quality /
        # text_lang_id / dedup_minhash_lsh (HEADLINE queries — timed
        # on every run already) and stream_corpus_quality /
        # stream_corpus_neardup (replay-machinery noise dominates a
        # wall-clock gate; the every-round FULL oracle sweep is their
        # regression backstop).
    ]
    import hashlib

    n_bench = len(glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
    rotation = n_bench % 3
    if os.environ.get("SPARK_GRAFT_BENCH_FULL_EXTRAS"):
        extra_sel = list(EXTRA)
    else:
        extra_sel = [
            name
            for name in EXTRA
            if name in CHANGED_THIS_ROUND
            or int(hashlib.md5(name.encode()).hexdigest(), 16) % 3
            == rotation
        ]
        for name in CHANGED_THIS_ROUND:
            if name not in extra_sel and name in EXTRA:
                extra_sel.append(name)
    tiers = {
        "rotation": rotation,
        "changed": [n for n in CHANGED_THIS_ROUND if n in extra_sel],
        "ran": len(extra_sel),
        "skipped": len(EXTRA) - len(extra_sel),
    }
    def _bracket_trusted(lo: int, hi: int) -> bool:
        """Both checkpoints around a pass read quiet (see the probe
        block above) — shared by the extras and headline tiers."""
        return (
            max(probes[lo], probes[hi]) <= TRUST_FACTOR * PROBE_REF_S
            and max(par_probes[lo], par_probes[hi])
            <= TRUST_FACTOR_PAR * PROBE_PAR_REF_S
        )

    # Extras now get the SAME trusted-pass protocol as the headline
    # (round-13 verdict item 5: a sub-second extras bar evaluated on a
    # fixed-2-pass raw number flips with ambient noise — the r13 ApSS
    # bar read 5.90 s on the builder's quiet window and 8.01 s on the
    # driver's).  Extras pass i runs between checkpoints i and i+1;
    # if NO extras pass is quiet-bracketed, up to TWO extra passes are
    # added before falling back (extras_loaded_window: true) — the
    # round-14 driver run saw 0 trusted extras passes with the old
    # single-retry budget, which left no extras gate with a
    # driver-verified delta (round-14 verdict item 3).
    extra_runs: list[dict[str, float]] = []
    extra_cpu_runs: list[dict[str, float]] = []
    while True:
        wall: dict[str, float] = {}
        cpu: dict[str, float] = {}
        for name in extra_sel:
            if name in registry:
                wall[name], cpu[name] = _timed(registry[name], spark, sf_dir)
        extra_runs.append(wall)
        extra_cpu_runs.append(cpu)
        _checkpoint()
        done = len(extra_runs)
        if done < extras_passes:
            continue
        if done >= extras_passes + 2:
            break
        any_trusted = any(_bracket_trusted(i, i + 1) for i in range(done))
        if not any_trusted:
            continue  # one retry pass hunting a quiet bracket
        # same JIT-convergence rule as the headline: a sub-second
        # per-gate bar must be read off a converged figure, so take
        # one more pass while the last one still improved the best
        # prior total by >2%
        totals = [sum(r.values()) for r in extra_runs]
        if totals[-1] > 0.98 * min(totals[:-1]):
            break
    extra = {
        name: min(r[name] for r in extra_runs) for name in extra_runs[0]
    }
    extra_cpu = {
        name: min(r[name] for r in extra_cpu_runs)
        for name in extra_cpu_runs[0]
    }
    # extras pass i ran between checkpoints i and i+1; normalize by
    # the WORST adjacent serial probe (most-loaded bracket)
    extra_norm = [
        round(
            sum(r.values())
            * PROBE_REF_S
            / max(probes[i], probes[i + 1]),
            3,
        )
        for i, r in enumerate(extra_runs)
    ]

    runs: list[dict[str, float]] = []
    cpu_runs: list[dict[str, float]] = []
    hl_base = len(probes) - 1  # checkpoint preceding headline pass 0
    for i in range(max_passes):
        wall = {}
        cpu = {}
        for name in HEADLINE:
            wall[name], cpu[name] = _timed(registry[name], spark, sf_dir)
        runs.append(wall)
        cpu_runs.append(cpu)
        _checkpoint()
        # adaptive convergence: once the minimum pass count is in,
        # stop when this pass (quiet-bracketed) failed to improve the
        # best total by more than 2% -- every run then reports the
        # same JIT-converged plateau instead of a random point on the
        # warmup curve
        if i + 1 >= passes:
            totals = [sum(r.values()) for r in runs]
            quiet_bracket = (
                max(probes[-2], probes[-1]) <= TRUST_FACTOR * PROBE_REF_S
                and max(par_probes[-2], par_probes[-1])
                <= TRUST_FACTOR_PAR * PROBE_PAR_REF_S
            )
            if quiet_bracket and totals[-1] > 0.98 * min(totals[:-1]):
                break
    probe_s = min(probes)
    # headline pass i ran between checkpoints hl_base+i and
    # hl_base+i+1; per-pass rescale by the WORST adjacent serial
    # probe (diagnostic detail — value_normalized uses the
    # trusted-pass protocol below)
    norm_passes = [
        round(
            sum(r.values())
            * PROBE_REF_S
            / max(probes[hl_base + i], probes[hl_base + i + 1]),
            3,
        )
        for i, r in enumerate(runs)
    ]

    def _pass_trusted(i: int) -> bool:
        return _bracket_trusted(hl_base + i, hl_base + i + 1)

    trusted = [i for i in range(len(runs)) if _pass_trusted(i)]
    loaded_window = not trusted
    sel = trusted or list(range(len(runs)))

    timings = runs[0]
    total = round(sum(timings.values()), 3)
    qmin = {name: min(r[name] for r in runs) for name in HEADLINE}
    # Compact final line (round-3 verdict item 4): the driver records
    # only the tail of stdout, so the printed line carries totals +
    # per-query MIN only — small enough that truncation can't eat the
    # leading keys. The full paired-run detail (every pass's per-query
    # timings) goes to BENCH_local.json next to this script.
    # ``value`` is the MIN-of-passes total (round-4 verdict: a reader
    # keying on the first field must see the load-independent number,
    # not the cold pass-A total); the per-pass totals follow for
    # cross-round comparison against the old pass-A-valued rounds.
    total_min = round(sum(qmin.values()), 3)
    value = total_min if len(runs) > 1 else total
    qmin_cpu = {name: min(r[name] for r in cpu_runs) for name in HEADLINE}
    value_cpu = round(sum(qmin_cpu.values()), 3)
    # Trusted-pass estimator (see the probe block above): per-query
    # mins over quiet-bracketed passes only, rescaled once by the
    # run-wide serial probe min (cross-round machine-speed anchor).
    value_trusted = round(
        sum(min(runs[i][name] for i in sel) for name in HEADLINE), 3
    )
    out = {
        "metric": "headline_queries_total",
        "value": value,
        "unit": "sec",
        "queries": qmin,  # per-query min across passes
        "sf": sf,
        # Ambient-load normalization (round-13 protocol — rationale
        # and the measured estimator A/B live at the probe block
        # above and in BASELINE.md).  value_normalized = per-query
        # mins over TRUSTED (quiet-bracketed) passes × probe_ref_s /
        # probe_s; "loaded_window": true means no pass had a quiet
        # bracket and the number is best-effort.  value_cpu (sum of
        # per-query min process-tree CPU seconds) is the work-based
        # diagnostic: immune to queueing, sensitive to intra-JVM
        # contention (±15%), so it cross-checks but does not define
        # the headline.
        "probe_s": probe_s,
        "probe_ref_s": PROBE_REF_S,
        "value_normalized": round(value_trusted * PROBE_REF_S / probe_s, 3),
        "loaded_window": loaded_window,
        "trusted_passes": len(trusted),
        "value_cpu": value_cpu,
        "norm_passes": norm_passes,
        "probes": probes,  # serial, chronological (one per checkpoint)
        "probes_par": par_probes,  # parallel, chronological
        "probe_par_ref_s": PROBE_PAR_REF_S,
    }
    if len(runs) > 1:
        out["value_pass_a"] = total  # the rounds-1-3-comparable total
        out["value_pass_b"] = round(sum(runs[1].values()), 3)
    # Round-9 fix (round-8 verdict item 1): the driver captures only the
    # LAST 2,000 bytes of stdout, and the ~145-entry extra_queries dict
    # pushed the printed line to ~8.6 KB, so BENCH_r08.json recorded
    # parsed:null. The printed line now carries the 31 headline queries
    # (~1 KB, spec-required) plus extra_total only; the full per-extra
    # timings live in BENCH_local.json.
    # Extras trusted-pass selection (round-13 verdict item 5): same
    # estimator as the headline — per-gate mins over quiet-bracketed
    # extras passes, rescaled once by the run-wide serial probe min.
    # Sub-second per-gate bars (ApSS <8 s combined) are evaluated on
    # these normalized per-gate figures, not the raw fixed-pass mins.
    extras_trusted = [
        i for i in range(len(extra_runs)) if _bracket_trusted(i, i + 1)
    ]
    extras_loaded_window = not extras_trusted
    esel = extras_trusted or list(range(len(extra_runs)))
    extra_norm_gates = {
        name: round(
            min(extra_runs[i][name] for i in esel) * PROBE_REF_S / probe_s,
            3,
        )
        for name in (extra_runs[0] if extra_runs else {})
    }
    if extra:
        out["extra_total"] = round(sum(extra.values()), 3)
        out["extra_total_normalized"] = min(extra_norm)
        out["extra_total_trusted_normalized"] = round(
            sum(extra_norm_gates.values()), 3
        )
        out["extras_loaded_window"] = extras_loaded_window
        out["extras_trusted_passes"] = len(extras_trusted)
        # load-robust comparison basis (round-14 verdict item 3): the
        # sum of per-gate min process-tree CPU seconds — immune to
        # scheduler queueing, so extras stay comparable round-over-
        # round even when every wall pass lands on a loaded window
        # (per-gate detail in BENCH_local.json extra_queries_cpu)
        out["extra_total_cpu"] = round(sum(extra_cpu.values()), 3)
        # tier note (round-11 verdict item 3): which extras ran this
        # bench — changed-code gates + the rotating third; kept short
        # so the printed line stays within the driver's tail capture.
        out["tiers"] = {
            "rotation": tiers["rotation"],
            "ran": tiers["ran"],
            "skipped": tiers["skipped"],
        }
    full = dict(out)
    full["extra_norm_passes"] = extra_norm
    full["extra_queries_normalized"] = extra_norm_gates
    full["queries_cpu"] = qmin_cpu
    full["extra_queries_cpu"] = extra_cpu
    if extra:
        full["extra_queries"] = extra
    full["passes"] = [
        {"pass": chr(ord("A") + i), "total": round(sum(r.values()), 3), "queries": r}
        for i, r in enumerate(runs)
    ]
    full["extra_passes"] = [
        {"pass": chr(ord("A") + i), "total": round(sum(r.values()), 3), "queries": r}
        for i, r in enumerate(extra_runs)
    ]
    full["tiers"] = tiers  # full detail incl. the changed-gate list
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"
    )
    with open(local_path, "w") as fh:
        json.dump(full, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

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


# Calibration probe (round-10 verdict item 1): a fixed CPU-bound
# single-partition codegen aggregate whose wall time depends only on
# this machine's momentary CPU availability — no I/O, no shuffle, no
# Python. Its measured time lets a reader normalize the headline
# against ambient machine load, which polluted the round-over-round
# signal in rounds 8-10 (r10 read +10.8% vs r9 with zero plan
# changes). PROBE_REF_S is the steady-state warm probe on the build
# machine (median of repeated runs, 2026-08-16); value_normalized =
# value * PROBE_REF_S / probe_s is the headline this run WOULD have
# measured at reference machine speed.
PROBE_REF_S = 0.65
_PROBE_EXPECT = 19999186012603  # sum(pmod(xxhash64(id),1000003)), 40M rows


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


def _timed(fn, spark, sf_dir) -> float:
    """Time one query to full materialization, then release any
    operator-tracked caches (minhash signatures, passage explodes,
    unigram tf) so NOTHING leaks into the next query's measurement —
    round-5 verdict item 2: without this, 70+ queries of accumulated
    persisted relations inflated the late-session numbers ~6x."""
    t0 = time.monotonic()
    _run(fn(spark, sf_dir))
    dt = round(time.monotonic() - t0, 3)
    release_caches()
    return dt


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

    # One throwaway probe to JIT its codegen, then a measured probe
    # before the extras and one before EACH headline pass; probe_s is
    # the MIN (the least-loaded moment — matching the min-of-passes
    # protocol the headline itself uses).
    _probe(spark)
    probes = [_probe(spark)]

    # Paired A-B protocol (round-2 verdict item 6): every query runs
    # twice back-to-back in the same session. Pass A is the headline
    # (same single-pass protocol as rounds 1-2, so cross-round ratios
    # stay comparable); pass B + the per-query min let a reader
    # separate ambient machine load (A≫B or B≫A, min stable) from a
    # real plan regression (both passes slow).
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))

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
        "text_bpe_tokens",       # new operator (operators/bpe.py)
        "text_strip_html",       # new operator (operators/markup.py)
        "sim_sparse_cosine_prefix",  # rounding slack + md5 half-slice
        "sim_sparse_cosine",     # shares sparse_cosine_pairs
        "g_hits",                # n>scale guard / literal start vector
        "text_domain_mixture",   # token_count_col parameter
        "text_epoch_plan",       # token_count_col parameter
        "a_gini_orders",         # distinct-value-window gini rewrite
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
    extra_runs: list[dict[str, float]] = []
    for _ in range(passes):
        extra_runs.append(
            {
                name: _timed(registry[name], spark, sf_dir)
                for name in extra_sel
                if name in registry
            }
        )
    extra = {
        name: min(r[name] for r in extra_runs) for name in extra_runs[0]
    }

    runs: list[dict[str, float]] = []
    for _ in range(passes):
        probes.append(_probe(spark))
        runs.append(
            {name: _timed(registry[name], spark, sf_dir) for name in HEADLINE}
        )
    probe_s = min(probes)

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
    out = {
        "metric": "headline_queries_total",
        "value": value,
        "unit": "sec",
        "queries": qmin,  # per-query min across passes
        "sf": sf,
        # Ambient-load calibration: probe_s is this run's best time for
        # the fixed CPU probe; value_normalized rescales the headline
        # to reference machine speed (PROBE_REF_S). Compare
        # value_normalized across rounds, value within a round.
        "probe_s": probe_s,
        "probe_ref_s": PROBE_REF_S,
        "value_normalized": round(value * PROBE_REF_S / probe_s, 3),
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
    if extra:
        out["extra_total"] = round(sum(extra.values()), 3)
        # tier note (round-11 verdict item 3): which extras ran this
        # bench — changed-code gates + the rotating third; kept short
        # so the printed line stays within the driver's tail capture.
        out["tiers"] = {
            "rotation": tiers["rotation"],
            "ran": tiers["ran"],
            "skipped": tiers["skipped"],
        }
    full = dict(out)
    full["probes"] = probes
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

"""The external correctness driver verifies only the first
``DRIVER_WINDOW`` (50) registry entries. The window ROTATES each round
under the policy documented at the REGISTRY definition (amended in
round 11 per the round-10 advice): never-certified additions, then
queries over operator code touched this round, then one gate per
SURVEY §2 family whose last certification is older than round N-2
(a family may rotate out entirely only while recently certified),
then the oldest-certified cohort. Rotated-out entries are re-verified
every round by ``tools/check_correctness.py`` full sweeps.

This test pins the round-13 window so a registry edit can never
silently drop an intended gate: REQUIRED_IN_WINDOW must be edited in
lockstep with any registry reorder."""

from curw_flo2d_data_manager_spark.queries import DRIVER_WINDOW, REGISTRY

# Round-13 window: keys must sit at registry position < DRIVER_WINDOW.
REQUIRED_IN_WINDOW = {
    # (b) operator code touched in round 13 (growth frozen at ZERO new
    # queries — the round finishes the driver-certification drain):
    # markup numeric character references + tag-start regex fixes,
    # BPE pandas-encoder horizon parity, the ApSS md5 quarter-slice
    # gate and its full-corpus twin
    "text_strip_html", "text_bpe_tokens",
    "sim_sparse_cosine_prefix", "sim_sparse_cosine",
    # (d) the ENTIRE remaining r6-certified cohort (20 — the queue the
    # round-12 registry comment named "first in line for r13")
    "q18_having_topk", "q10_returned_items", "q14_promo_share",
    "q15_top_supplier", "q19_disjunctive", "s3_first_value_lookup",
    "k1_fixed_width_render", "f6_sentinel_cleaning", "j5_semi_join",
    "w2_elapsed_hours", "x11_series_hash_id", "dedup_fingerprint",
    "dedup_ngram_jaccard", "text_lang_id", "text_top_bigrams",
    "text_pii_redact", "s4_nearest_gauge_rain", "k4_rain_render",
    "a_approx_distinct", "q4_exists_semi",
    # (d) the 26 oldest r7-certified entries; w_ewma leads because its
    # oracle was rewritten this round (blocked exact fold replay).
    # The 16 r7 entries left for the r14 window: sim_pagerank,
    # sim_semantic_dedup, stream_corpus_decontam, stream_corpus_quality,
    # stream_resample_events, text_bigram_logprob, text_bm25_topk,
    # text_ccnet_buckets, text_chunk_documents, text_dsir_weights,
    # text_epoch_plan, text_frequent_terms, text_hash_classifier,
    # w_hampel_despike, w_seasonal_baseline, w_winsorize.
    "w_ewma", "a_approx_percentiles", "dedup_bloom_filter",
    "dedup_contam_spans", "dedup_repeated_spans", "dedup_span_rebuild",
    "dedup_winnow_pairs", "dedup_winnowing", "f_length_buckets",
    "f_materialize_mixture", "f_pack_sequences", "f_split_assign",
    "f_weighted_sample", "k2_outflow_render", "k8_start_date",
    "mm_binary_meta", "p2_timdep_roundtrip", "q11_important_share",
    "q20_heavy_suppliers", "q21_exclusive_failures", "q8_market_share",
    "q9_product_profit", "s1_series_range_scan", "sim_cosine_dedup",
    "sim_knn_graph", "sim_label_centroids", }


def test_every_required_gate_is_inside_driver_window():
    order = list(REGISTRY)
    positions = {name: i for i, name in enumerate(order)}
    missing = REQUIRED_IN_WINDOW - set(order)
    assert not missing, f"registry lost gates: {sorted(missing)}"
    outside = sorted(
        name for name in REQUIRED_IN_WINDOW if positions[name] >= DRIVER_WINDOW
    )
    assert not outside, (
        f"gates past driver window ({DRIVER_WINDOW}): {outside}"
    )


def test_window_is_exactly_filled():
    # All 50 slots are spent on intended gates — no accidental filler
    # ahead of a gate.
    assert len(REQUIRED_IN_WINDOW) == DRIVER_WINDOW
    assert list(REGISTRY)[:DRIVER_WINDOW] == [
        n for n in REGISTRY if n in REQUIRED_IN_WINDOW
    ]


def test_every_entry_has_an_oracle_except_documented():
    # a_approx_distinct gained its tolerance-band oracle in round 3 —
    # nothing in the registry is rows-only any more.
    rows_only = [name for name, (_, sql) in REGISTRY.items() if sql is None]
    assert rows_only == []

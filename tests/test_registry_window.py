"""The external correctness driver verifies only the first
``DRIVER_WINDOW`` (50) registry entries. The window ROTATES each round
under the policy documented at the REGISTRY definition (amended in
round 11 per the round-10 advice): never-certified additions, then
queries over operator code touched this round, then one gate per
SURVEY §2 family whose last certification is older than round N-2
(a family may rotate out entirely only while recently certified),
then the oldest-certified cohort. Rotated-out entries are re-verified
every round by ``tools/check_correctness.py`` full sweeps.

This test pins the round-12 window so a registry edit can never
silently drop an intended gate: REQUIRED_IN_WINDOW must be edited in
lockstep with any registry reorder."""

from curw_flo2d_data_manager_spark.queries import DRIVER_WINDOW, REGISTRY

# Round-12 window: keys must sit at registry position < DRIVER_WINDOW.
REQUIRED_IN_WINDOW = {
    # (a) the two round-12 additions (growth frozen to drain the
    # driver-certification backlog — round-11 verdict item 1)
    "text_bpe_tokens", "text_strip_html",
    # (b) operator code touched in round 12: ApSS prefix
    # rounding-slack + md5 half-slice gate, HITS n>scale guard,
    # streaming ledger existence probe, gini distinct-value-window
    # rewrite (mid-round — displaces q4_exists_semi to the r13 queue)
    "sim_sparse_cosine_prefix", "sim_sparse_cosine", "g_hits",
    "stream_corpus_neardup", "a_gini_orders",
    # (d) the oldest-certified cohort: the full r5 window cohort ...
    "sim_lsh_pairs", "text_token_counts", "text_quality", "w_moving_avg",
    "x_unpivot_lineitem", "a_cube_counts", "a_percentiles",
    "k7_merge_upsert", "q13_order_distribution", "q7_nation_volume",
    "q2_min_supplier", "dedup_simhash", "dedup_minhash_lsh",
    "sim_ivf_topk", "q16_supplier_cnt", "q17_small_quantity",
    "q22_idle_customers",
    # ... plus the 27 oldest r6 entries (remaining 19 r6 entries —
    # q18_having_topk, q10_returned_items, q14_promo_share,
    # q15_top_supplier, q19_disjunctive, s3_first_value_lookup,
    # k1_fixed_width_render, f6_sentinel_cleaning, j5_semi_join,
    # w2_elapsed_hours, x11_series_hash_id, dedup_fingerprint,
    # dedup_ngram_jaccard, text_lang_id, text_top_bigrams,
    # text_pii_redact, s4_nearest_gauge_rain, k4_rain_render,
    # a_approx_distinct, and q4_exists_semi (displaced mid-round
    # by the a_gini_orders touched-code gate) — are first in line
    # for round 13).
    # Everything rotated out (the r10/r11 window cohorts) holds a
    # FRESH r10/r11 certification; no (c) family slots are needed
    # because every SURVEY family holds an r11 certification.
    "dedup_components", "dedup_passages", "text_tfidf_terms",
    "text_domain_mixture", "dedup_cluster_filter", "text_unigram_logprob",
    "f_mixture_resample", "stream_corpus_dedup", "sim_cross_decontam",
    "dedup_contamination", "mm_decode_meta", "dedup_latest_version",
    "text_url_extract", "stream_dedup_events", "text_repetition_gates",
    "f_hash_sample", "f_stratified_sample", "a_rollup_cascade",
    "a_session_window_native", "x_pivot_event_types", "a_rollup_totals",
    "a_distinct_counts", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier", "q6_revenue_change", }


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

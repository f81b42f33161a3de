"""The external correctness driver verifies only the first
``DRIVER_WINDOW`` (50) registry entries. The window ROTATES each round
(round-2 verdict, next-round item 5): entries touched this round or
never driver-certified take priority, then the entries whose last
certification is oldest; untouched previously-green gates rotate out
and are re-verified via ``tools/check_correctness.py``.

This test pins the round-6 window so a registry edit can never
silently drop an intended gate: REQUIRED_IN_WINDOW must be edited in
lockstep with any registry reorder."""

from curw_flo2d_data_manager_spark.queries import DRIVER_WINDOW, REGISTRY

# Round-6 window: keys must sit at registry position < DRIVER_WINDOW.
REQUIRED_IN_WINDOW = {
    # the nine round-5 additions, never driver-certified (round-5
    # verdict item 1 — local-green at sf0.001 + sf0.01 since round 5)
    "dedup_components", "dedup_passages", "text_tfidf_terms",
    "text_domain_mixture", "dedup_cluster_filter", "text_unigram_logprob",
    "f_mixture_resample", "stream_corpus_dedup", "sim_cross_decontam",
    # gates over code touched in round 6 (update_start_date parity,
    # the ngram_contamination broadcast-size guard, the multimodal
    # encoder hook)
    "k8_start_date", "dedup_contamination", "mm_decode_meta",
    # last certified in round 4 — the 38 oldest certifications (the 6
    # left over, each green in >=3 windows, rotate in next round)
    "dedup_latest_version", "text_url_extract", "stream_dedup_events",
    "text_repetition_gates", "f_hash_sample", "f_stratified_sample",
    "a_rollup_cascade", "a_session_window_native", "x_pivot_event_types",
    "a_rollup_totals", "a_distinct_counts", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier", "q6_revenue_change",
    "q4_exists_semi", "q18_having_topk", "q10_returned_items",
    "q14_promo_share", "q15_top_supplier", "q19_disjunctive",
    "s3_first_value_lookup", "k1_fixed_width_render",
    "f6_sentinel_cleaning", "j5_semi_join", "w2_elapsed_hours",
    "o2_ordered_topk", "u2_set_ops", "x11_series_hash_id",
    "dedup_fingerprint", "dedup_ngram_jaccard", "sim_cosine_dedup",
    "text_lang_id", "text_top_bigrams", "text_pii_redact",
    "s4_nearest_gauge_rain", "k4_rain_render", "a_approx_distinct",
}


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

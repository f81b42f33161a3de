"""The external correctness driver verifies only the first
``DRIVER_WINDOW`` (50) registry entries. The window ROTATES each round
(round-2 verdict, next-round item 5): entries touched this round or
never driver-certified take priority, then the entries whose last
certification is oldest; untouched previously-green gates rotate out
and are re-verified via ``tools/check_correctness.py``.

This test pins the round-4 window so a registry edit can never
silently drop an intended gate: REQUIRED_IN_WINDOW must be edited in
lockstep with any registry reorder."""

from curw_flo2d_data_manager_spark.queries import DRIVER_WINDOW, REGISTRY

# Round-4 window: keys must sit at registry position < DRIVER_WINDOW.
REQUIRED_IN_WINDOW = {
    # never driver-certified across r1-r3 (round-3 verdict item 1 + the
    # fifth one the verdict missed, dedup_latest_version)
    "dedup_latest_version", "text_url_extract", "stream_dedup_events",
    "text_repetition_gates", "sim_label_centroids",
    # last certified in round 1 (oldest certifications — all 17)
    "f_hash_sample", "f_stratified_sample", "a_rollup_cascade",
    "a_session_window_native", "x_pivot_event_types", "a_rollup_totals",
    "a_distinct_counts", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier", "q6_revenue_change", "q4_exists_semi",
    "q18_having_topk", "q10_returned_items", "q14_promo_share",
    "q15_top_supplier", "q19_disjunctive",
    # last certified in round 2 (all 13 rotated out for round 3)
    "s3_first_value_lookup", "k1_fixed_width_render",
    "f6_sentinel_cleaning", "j5_semi_join", "w2_elapsed_hours",
    "o2_ordered_topk", "u2_set_ops", "x11_series_hash_id",
    "dedup_fingerprint", "dedup_ngram_jaccard", "sim_cosine_dedup",
    "text_lang_id", "text_top_bigrams",
    # touched this round
    "p1_hychan_roundtrip", "p2_timdep_roundtrip",
    "mm_binary_meta", "mm_decode_meta", "text_pii_redact",
    # core keepers
    "s1_series_range_scan", "s4_nearest_gauge_rain",
    "k2_outflow_render", "k4_rain_render", "k7_merge_upsert",
    "dedup_minhash_lsh", "dedup_simhash", "sim_ivf_topk",
    "stream_resample_events", "a_approx_distinct",
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

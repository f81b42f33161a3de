"""The external correctness driver verifies only the first
``DRIVER_WINDOW`` (50) registry entries. The window ROTATES each round
(round-2 verdict, next-round item 5): entries touched this round or
never driver-certified take priority, then the entries whose last
certification is oldest; untouched previously-green gates rotate out
and are re-verified via ``tools/check_correctness.py``.

This test pins the round-7 window so a registry edit can never
silently drop an intended gate: REQUIRED_IN_WINDOW must be edited in
lockstep with any registry reorder."""

from curw_flo2d_data_manager_spark.queries import DRIVER_WINDOW, REGISTRY

# Round-7 window: keys must sit at registry position < DRIVER_WINDOW.
REQUIRED_IN_WINDOW = {
    # the ten round-6 additions, never driver-certified (local-green
    # at sf0.001 + sf0.01 since round 6)
    "text_bigram_logprob", "f_split_assign", "sim_semantic_dedup",
    "stream_corpus_quality", "a_approx_percentiles", "text_chunk_documents",
    "text_frequent_terms", "text_epoch_plan", "stream_corpus_neardup",
    "f_materialize_mixture",
    # the twenty round-7 additions
    "sim_knn_graph", "text_dsir_weights", "f_length_buckets",
    "dedup_bloom_filter", "sim_pq_adc", "sim_pq_rerank",
    "stream_corpus_decontam", "text_ccnet_buckets",
    "text_hash_classifier", "sim_ivfpq", "dedup_repeated_spans",
    "dedup_span_rebuild", "w_hampel_despike", "dedup_contam_spans",
    "w_linear_interp", "w_seasonal_baseline", "sim_pagerank",
    "text_bm25_topk", "j_interval_overlap", "w_winsorize",
    # gates over code touched in round 7 (update_run_dates fgt_mode,
    # try_divide in the cosine pair path, centroid_assign zero-norm
    # sentinel, frequent_terms exact threshold — the latter is already
    # above as a round-6 addition)
    "k8_start_date", "sim_cosine_dedup", "sim_label_centroids",
    # oldest certifications (round 4)
    "s1_series_range_scan", "p1_hychan_roundtrip", "p2_timdep_roundtrip",
    "mm_binary_meta", "k2_outflow_render", "stream_resample_events",
    # round-5 certifications — the oldest 11 of the remaining 48
    # (the others rotate in round 8 together with the round-6 set)
    "dedup_winnowing", "dedup_winnow_pairs", "f_weighted_sample",
    "f_pack_sequences", "q8_market_share", "q9_product_profit",
    "q11_important_share", "q20_heavy_suppliers", "q21_exclusive_failures",
    "s2_grid_scan_correction", "s6_max_end_time",
    # (x4_json_extract, q12_priority_case, w_sessionize_events,
    # a4_cumulative_fraction, w3_fill_down, a2_resample_right_closed,
    # j_range_join, j_asof_join, j8_gap_fill, j6_nearest_rank1,
    # k8_run_metadata, f9_get_or_create, j1_calendar_spine,
    # j2_dim_enrichment, k3_raincell_render, and k5_chan_render — all
    # certified r5 — yielded their slots to the twenty round-7 gates;
    # rotate back in round 8)
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

"""The external correctness driver verifies only the first
``DRIVER_WINDOW`` (50) registry entries. This test pins the invariant
that every SURVEY §2 operator family and every LLM-data family has a
gating query inside that window, so a registry edit can never silently
drop parity coverage again (round-1 verdict, next-round item 9)."""

from curw_flo2d_data_manager_spark.queries import DRIVER_WINDOW, REGISTRY

# One gate per family; keys must sit at registry position < DRIVER_WINDOW.
REQUIRED_IN_WINDOW = {
    # store scans
    "s1_series_range_scan", "s2_grid_scan_correction",
    "s3_first_value_lookup", "s6_max_end_time",
    # parsers
    "p1_hychan_roundtrip", "p2_timdep_roundtrip",
    # renders + sinks
    "k1_fixed_width_render", "k2_outflow_render", "k3_raincell_render",
    "k4_rain_render", "k5_chan_render", "k7_merge_upsert",
    "k8_run_metadata",
    # filters
    "f6_sentinel_cleaning", "f9_get_or_create",
    # joins
    "j1_calendar_spine", "j2_dim_enrichment", "j5_semi_join",
    "j6_nearest_rank1", "j8_gap_fill", "j_asof_join", "j_range_join",
    # aggregation + windows (incl. round-1 hash-fix retests)
    "a2_resample_right_closed", "a4_cumulative_fraction",
    "w2_elapsed_hours", "w3_fill_down", "w_sessionize_events",
    "q12_priority_case",
    # order / sets / scalar functions
    "o2_ordered_topk", "u2_set_ops", "x4_json_extract",
    "x11_series_hash_id",
    # streaming
    "stream_resample_events", "stream_cumsum_events",
    "stream_session_events",
    # dedup
    "dedup_exact", "dedup_fingerprint", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash",
    # similarity
    "sim_cosine_topk", "sim_ivf_topk", "sim_cosine_dedup",
    "sim_lsh_pairs",
    # text
    "text_token_counts", "text_quality", "text_lang_id",
    "text_top_bigrams",
    # multimodal
    "mm_binary_meta", "mm_decode_meta",
}


def test_every_family_gate_is_inside_driver_window():
    order = list(REGISTRY)
    positions = {name: i for i, name in enumerate(order)}
    missing = REQUIRED_IN_WINDOW - set(order)
    assert not missing, f"registry lost gates: {sorted(missing)}"
    outside = sorted(
        name for name in REQUIRED_IN_WINDOW if positions[name] >= DRIVER_WINDOW
    )
    assert not outside, (
        f"family gates past driver window ({DRIVER_WINDOW}): {outside}"
    )


def test_window_is_exactly_filled():
    # All 50 slots are spent on family gates — no accidental filler
    # ahead of a gate.
    assert len(REQUIRED_IN_WINDOW) == DRIVER_WINDOW
    assert list(REGISTRY)[:DRIVER_WINDOW] == [
        n for n in REGISTRY if n in REQUIRED_IN_WINDOW
    ]

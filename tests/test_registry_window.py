"""The external correctness driver verifies only the first
``DRIVER_WINDOW`` (50) registry entries. The window ROTATES each round
(round-2 verdict, next-round item 5): entries touched this round or
never driver-certified take priority; untouched previously-green gates
rotate out and are re-verified via ``tools/check_correctness.py``.

This test pins the round-3 window so a registry edit can never
silently drop an intended gate: REQUIRED_IN_WINDOW must be edited in
lockstep with any registry reorder."""

from curw_flo2d_data_manager_spark.queries import DRIVER_WINDOW, REGISTRY

# Round-3 window: keys must sit at registry position < DRIVER_WINDOW.
REQUIRED_IN_WINDOW = {
    # store scans (s3 rotated out, green r01+r02)
    "s1_series_range_scan", "s2_grid_scan_correction",
    "s4_nearest_gauge_rain", "s6_max_end_time",
    # parsers (p1 touched this round: per-section splits)
    "p1_hychan_roundtrip", "p2_timdep_roundtrip",
    # renders + sinks
    "k2_outflow_render", "k3_raincell_render", "k4_rain_render",
    "k5_chan_render", "k7_merge_upsert", "k8_run_metadata",
    # filters
    "f9_get_or_create",
    # joins
    "j1_calendar_spine", "j2_dim_enrichment", "j6_nearest_rank1",
    "j8_gap_fill", "j_asof_join", "j_range_join",
    # aggregation + windows
    "a2_resample_right_closed", "a4_cumulative_fraction",
    "w3_fill_down", "w_sessionize_events", "q12_priority_case",
    "x4_json_extract",
    # streaming
    "stream_resample_events", "stream_cumsum_events",
    "stream_session_events",
    # dedup (minhash touched this round: bucket-cap default)
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    # similarity
    "sim_cosine_topk", "sim_ivf_topk", "sim_lsh_pairs",
    # text (pii regex touched this round)
    "text_token_counts", "text_quality", "text_pii_redact",
    # multimodal
    "mm_binary_meta", "mm_decode_meta",
    # newly-oracled this round
    "a_approx_distinct",
    # round-1 breadth rotated back in for re-certification
    "w_moving_avg", "x_unpivot_lineitem", "a_cube_counts",
    "a_percentiles", "q2_min_supplier", "q7_nation_volume",
    "q13_order_distribution", "q16_supplier_cnt",
    "q17_small_quantity", "q22_idle_customers",
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

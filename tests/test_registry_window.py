"""The external correctness driver verifies only the first
``DRIVER_WINDOW`` (50) registry entries. The window ROTATES each round
(round-2 verdict, next-round item 5): entries touched this round or
never driver-certified take priority, then the entries whose last
certification is oldest; untouched previously-green gates rotate out
and are re-verified via ``tools/check_correctness.py``.

This test pins the round-5 window so a registry edit can never
silently drop an intended gate: REQUIRED_IN_WINDOW must be edited in
lockstep with any registry reorder."""

from curw_flo2d_data_manager_spark.queries import DRIVER_WINDOW, REGISTRY

# Round-5 window: keys must sit at registry position < DRIVER_WINDOW.
REQUIRED_IN_WINDOW = {
    # never driver-certified across r1-r4 (round-4 verdict items 1+3:
    # the reshaped sim_label_centroids + the 10 post-freeze r4
    # additions)
    "sim_label_centroids", "dedup_winnowing", "dedup_winnow_pairs",
    "f_weighted_sample", "f_pack_sequences", "dedup_contamination",
    "q8_market_share", "q9_product_profit", "q11_important_share",
    "q20_heavy_suppliers", "q21_exclusive_failures",
    # last certified in round 3 (the oldest certifications — all 35)
    "s2_grid_scan_correction", "s6_max_end_time", "k3_raincell_render",
    "k5_chan_render", "k8_run_metadata", "f9_get_or_create",
    "j1_calendar_spine", "j2_dim_enrichment", "j6_nearest_rank1",
    "j8_gap_fill", "j_asof_join", "j_range_join",
    "a2_resample_right_closed", "a4_cumulative_fraction", "w3_fill_down",
    "w_sessionize_events", "q12_priority_case", "x4_json_extract",
    "stream_cumsum_events", "stream_session_events", "dedup_exact",
    "sim_cosine_topk", "sim_lsh_pairs", "text_token_counts",
    "text_quality", "w_moving_avg", "x_unpivot_lineitem",
    "a_cube_counts", "a_percentiles", "q2_min_supplier",
    "q7_nation_volume", "q13_order_distribution", "q16_supplier_cnt",
    "q17_small_quantity", "q22_idle_customers",
    # gates over code touched this round (IVF sample-trained quantizer,
    # dedup tracked caches, simhash regression watch, upsert
    # identifier validation)
    "sim_ivf_topk", "dedup_minhash_lsh", "dedup_simhash",
    "k7_merge_upsert",
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

"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Nothing here calls ``ray.init`` / ``ray.shutdown`` — only ``bench.py``
and the pytest session fixture own a Ray session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001-scale input: deterministic pages corpus
    -> lang filter -> address extraction -> cleanse/standardize -> broadcast
    cell-indexed matcher -> 11-column reference output."""
    import ray.data as rd

    from geocoding_toolbox_ray.config import PipelineConfig
    from geocoding_toolbox_ray.pipelines.geocode import geocode_pages
    from geocoding_toolbox_ray.sources.pages import pages_table

    pages = rd.from_arrow(pages_table(2000))
    return geocode_pages(pages, PipelineConfig(concurrency=4, batch_size=2048))


def _pages_count_for(sf_dir: str) -> int:
    """Deterministic pages-corpus size proportional to the sf (2 pages per
    orders row, read from parquet metadata only)."""
    import pyarrow.parquet as pq

    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    return int(n_orders) * 2


def _geocode_pages_query(sf_dir: str):
    """Flagship pages -> extract -> match, projected to the 11-column
    reference HEADER (the engine also carries url/warc_ts passthrough;
    primary_key embeds the url, so the oracle hash loses nothing).
    Oracle: ``oracle.geocode_pages_sql`` regenerates the page text in SQL
    from the same constants and scans it with the identical RE2 pattern."""
    import ray.data as rd

    from geocoding_toolbox_ray.config import HEADER, PipelineConfig
    from geocoding_toolbox_ray.pipelines.geocode import geocode_pages
    from geocoding_toolbox_ray.sources.pages import generate_pages_dataset

    pages = generate_pages_dataset(_pages_count_for(sf_dir))
    return geocode_pages(pages, PipelineConfig()).select_columns(list(HEADER))


def _geocode_pages_dedup_query(sf_dir: str):
    """Web-scale N1 composition: pages -> extract -> geocode each DISTINCT
    (street, zone) once -> hash-join back to every candidate row.  Same
    11-column output (and oracle) as geocode_pages — the right trade when
    millions of pages cite the same addresses."""
    from geocoding_toolbox_ray.config import HEADER, PipelineConfig
    from geocoding_toolbox_ray.pipelines.geocode import geocode_candidates_dedup
    from geocoding_toolbox_ray.sources.pages import generate_pages_dataset
    from geocoding_toolbox_ray.stages.extract import extract_candidates, filter_lang

    cfg = PipelineConfig()
    pages = generate_pages_dataset(_pages_count_for(sf_dir))
    candidates = pages.map_batches(
        lambda b: extract_candidates(filter_lang(b)),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    return geocode_candidates_dedup(candidates, cfg).select_columns(list(HEADER))


def _curate_pages_query(sf_dir: str):
    from geocoding_toolbox_ray.pipelines.curate import curate_pages
    from geocoding_toolbox_ray.sources.pages import generate_pages_dataset

    pages = generate_pages_dataset(_pages_count_for(sf_dir))
    return curate_pages(pages)


# ----------------------------------------------------------------------
# Registry ordering.  The driver verifies the FIRST 50 entries of
# ``queries()`` against ``oracle_sql()`` each round, so the order below
# IS the verification schedule (round-3 verdict #1): rotate a window of
# never-hash-verified oracle-backed queries to the front each round
# until all 175 have a green driver row.  Every oracle-backed name must
# precede every rows-only name.

# Round-4 window: 2 anchors (geocode_orders, counters_report) + 48
# oracle-backed queries with no hash-verified CORRECTNESS row in r01-r03.
_WINDOW_R4 = [
    "geocode_orders",
    "counters_report",
    "geocode_orders_highways",
    "minhash_dup_pairs",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "geocode_pages",
    "geocode_pages_dedup",
    "curate_pages",
    "curate_then_pack",
    "pagerank_suppliers",
    "knn_graph",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "token_heavy_hitters",
    "token_cooccurrence",
    "orders_price_rank",
    "ngram_novelty",
    "shared_passage_pairs",
    "pages_domain_cap",
    "pages_host_reputation",
    "geocode_pages_tile_counts",
    "pages_html_extract_verify",
    "token_count_documents_jsonl",
    "supplier_triangles",
    "supplier_bfs_distance",
    "customer_nation_bbox",
    "raster_focal_sum",
    "points_in_bbox_pruned",
    "events_recent_pruned",
    "orders_upsert",
    "events_dedup_hourly",
    "name_typo_pairs",
    "orders_table_checksum",
    "events_hourly_median",
    "event_transitions",
    "user_retention_cohorts",
    "orders_trend_by_priority",
    "events_melt",
    "fk_integrity_audit",
    "lineitem_weighted_median",
    "cell_week_distinct_orders",
    "customer_latest_order",
    "rolling_active_users",
    "order_od_matrix",
    "tfidf_search_topk",
    "repetition_signals_documents",
    "feature_hash_documents",
    "embedding_centroids",
]

# Remaining never-hash-verified backlog — the round-5 rotation queue
# (keep these immediately after the window so the next rotation is a
# simple list swap).
_BACKLOG = [
    "revenue_longest_rise",
    "nation_top3_share",
    "nation_brand_weighted_jaccard",
    "geohash_prefix_rollup",
    "documents_dedup_keep_longest",
    "near_threshold_pairs",
    "lang_confusion_matrix",
    "cosupply_edge_churn",
    "supplier_kcore",
    "tile_anomalies",
    "nation_revenue_hhi",
    "road_segment_load",
    "supplier_portfolio_jaccard",
    "orders_price_drift_deciles",
    "events_ohlc_6h",
    "parts_discovery_curve",
    "events_hour_weekday_heatmap",
    "doc_top_tokens",
    "segment_nation_contingency",
    "orders_benford_digits",
    "customer_revenue_pareto",
    "tile_quadkey_lineitem",
    "partkey_f2_moment",
    "user_burst_peak",
    "documents_ipc_roundtrip",
    "docs_with_all_tokens",
    "tile_choropleth_classes",
    "session_stats",
    "radius_pair_distance_histogram",
    "prefix_count_share",
    "events_value_percentrank_by_type",
    "split_leakage_pairs",
    "dedup_cluster_size_histogram",
    "embedding_dim_stats",
    "orders_daily_autocorr",
    "lineitem_price_mad",
    "supplier_clustering_coeff",
    "custkey_prefix_rollup",
    "orders_winsorized_total",
    "orders_price_minmax_scaled",
    "zorder_encode_lineitem",
    "orders_daily_open_count",
    "order_brand_list",
    "nation_trade_balance",
    "nation_point_diameter",
    "part_min_cost_supplier",
    "embedding_covariance",
    "basket_brand_pairs",
    "orders_record_highs",
    "events_value_trend_slope",
    "orders_equidepth_bins",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q15_top_supplier",
    "q17_small_quantity",
    # round-4 TPC-H-shaped wave (new, oracle-checked; first in line for
    # the round-5 window)
    "q4_order_priority",
    "q10_returned_revenue",
    "q12_late_lines",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q16_brand_supplier_count",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_idle_customers",
    # round-4 spatial geometry wave (new, oracle-checked)
    "parcel_area_by_grid",
    "points_outside_parcels",
    "parcel_cell_coverage",
    "events_moving_sum",
    "media_dedup_report",
    "orders_skyline",
    "snap_points_to_roads",
    "user_event_gini",
    "pages_boilerplate_strip",
    "token_cms_topk",
    "sequence_packing",
    "sequence_packing_shuffled",
    "document_chunks",
    "streaming_watermark",
    "weighted_sample_orders",
    "orders_range_join",
    "orders_price_percentiles",
    "bpe_pair_counts",
    "order_lineitem_revenue",
    "order_lineitem_revenue_bcast",
    "events_resample_ffill",
    "orders_price_ntile",
    "customer_running_total",
    "orders_interorder_gap",
    "lineitem_moments",
    "user_mode_event_type",
    "orders_validation_report",
    "revenue_rollup",
    "order_fulfillment_left",
    "order_fulfillment_left_shuffle",
    "user_event_pivot",
    "view_purchase_funnel",
    "orders_price_histogram",
    "orders_above_customer_avg",
    "customers_per_region",
    "training_mixture",
    "user_journeys",
    "customers_with_orders",
    "orders_without_lineitems_anti",
    "revenue_cube",
    "delta_new_documents",
    "orders_price_outliers",
    "order_route_l1",
    "tile_cover_lineitem",
    "events_props_extract",
    "orders_profile",
    "orders_keyset_page",
    "key_skew_report",
    "repeat_customers_intersect",
    "documents_store_compaction",
    "part_brand_target_encoding",
    "events_daily_dense",
    "doc_sentence_stats",
    "orders_top_prices_with_ties",
    "user_time_weighted_value",
    "customer_order_streaks",
    "nation_revenue_share",
    "parcel_proximity_pairs",
    "user_cusum_alarm",
    "embedding_norm_quantized",
    "events_top2_gap",
    "orders_quarterly_revenue",
    "lineitem_ship_delay_histogram",
]

# Already hash-verified in r01-r03 (green driver row exists).
_VERIFIED = [
    "geocode_orders_dedup",
    "cleanse_street_documents",
    "cleanse_zone_orders",
    "pip_join",
    "knn_join",
    "knn_topk_join",
    "points_within_radius",
    "parcel_zonal_stats",
    "reverse_geocode_lineitem",
    "q6_forecast_revenue",
    "nation_trade_coverage",
    "customer_status_full_join",
    "cell_encode_lineitem",
    "geohash_lineitem",
    "url_canonicalize",
    "events_decayed_value",
    "parcel_tile_cover",
    "spatial_cell_join",
    "quality_lr_score",
    "supplier_degree_histogram",
    "doc_type_token_ratio",
    "documents_sink_roundtrip",
    "key_uniqueness_audit",
    "customer_coverage_days",
    "address_point_density",
    "tile_assign_lineitem",
    "tile_counts",
    "tile_counts_salted",
    "tile_pyramid",
    "distinct_orders_per_returnflag",
    "distinct_orders_per_returnflag_salted",
    "geocode_orders_centerlines",
    "geocode_orders_wgs84",
    "geocode_pobox",
    "geocode_orders_units",
    "geocode_join_orders",
    "orders_without_lineitems",
    "cell_skew_topk",
    "sample_orders",
    "stratified_sample_events",
    "tile_raster_sparse",
    "top_tiles_sorted",
    "distinct_event_types",
    "token_count_documents",
    "bpe_token_count_documents",
    "lang_id_documents",
    "quality_documents",
    "doc_fingerprint",
    "doc_rolling_fp",
    "dedup_exact",
    "quality_filter_documents",
    "documents_deduped",
    "documents_near_deduped",
    "curated_documents",
    "token_histogram",
    "contamination_flags",
    "redact_documents",
    "split_assignment",
    "doc_length_percentiles",
    "media_features",
    "media_frames",
    "ann_topk_quantized",
    "streaming_user_state",
    "events_window",
    "events_sliding_window",
    "events_asof_join",
    "sessionize",
    "q1_pricing_summary",
    "top_customers",
    "value_band_join",
    "top_orders_per_customer",
]

# Approximate / iterative ops without a SQL twin (rows-only check; each
# pinned against ground truth in pytest) — MUST stay last.
_ROWS_ONLY = [
    "ann_topk_cosine",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_ivf_kmeans",
    "ann_topk_ivf_pruned",
    "ann_recall",
    "embedding_dup_pairs",
    "approx_distinct_users",
    "bpe_learn_merges",
    "bpe_encode_tokens",
]


def queries() -> dict[str, Callable[[str], Any]]:
    from geocoding_toolbox_ray import queries as q

    local = {
        "geocode_pages": _geocode_pages_query,
        "geocode_pages_dedup": _geocode_pages_dedup_query,
        "curate_pages": _curate_pages_query,
    }
    order = _WINDOW_R4 + _BACKLOG + _VERIFIED + _ROWS_ONLY
    assert len(order) == len(set(order)), "duplicate registry name"
    return {n: local.get(n) or getattr(q, n) for n in order}


def oracle_sql() -> dict[str, str]:
    from geocoding_toolbox_ray import oracle

    return {
        "geocode_orders": oracle.geocode_orders_sql(),
        "geocode_orders_dedup": oracle.geocode_orders_sql(),
        "counters_report": oracle.counters_sql(),
        "cleanse_street_documents": oracle.cleanse_street_documents_sql(),
        "cleanse_zone_orders": oracle.cleanse_zone_orders_sql(),
        "pip_join": oracle.pip_join_sql(),
        "knn_join": oracle.knn_join_sql(),
        "knn_topk_join": oracle.knn_topk_join_sql(),
        "points_within_radius": oracle.points_within_radius_sql(),
        "parcel_zonal_stats": oracle.parcel_zonal_stats_sql(),
        "reverse_geocode_lineitem": oracle.reverse_geocode_lineitem_sql(),
        "q6_forecast_revenue": oracle.q6_forecast_revenue_sql(),
        "nation_trade_coverage": oracle.nation_trade_coverage_sql(),
        "customer_status_full_join": oracle.customer_status_full_join_sql(),
        "cell_encode_lineitem": oracle.cell_encode_lineitem_sql(),
        "geohash_lineitem": oracle.geohash_lineitem_sql(),
        "url_canonicalize": oracle.url_canonicalize_sql(),
        "events_decayed_value": oracle.events_decayed_value_sql(),
        "parcel_tile_cover": oracle.parcel_tile_cover_sql(),
        "spatial_cell_join": oracle.spatial_cell_join_sql(),
        "quality_lr_score": oracle.quality_lr_score_sql(),
        "supplier_degree_histogram": oracle.supplier_degree_histogram_sql(),
        "doc_type_token_ratio": oracle.doc_type_token_ratio_sql(),
        "documents_sink_roundtrip": oracle.documents_sink_roundtrip_sql(),
        "key_uniqueness_audit": oracle.key_uniqueness_audit_sql(),
        "customer_coverage_days": oracle.customer_coverage_days_sql(),
        "address_point_density": oracle.address_point_density_sql(),
        "tile_assign_lineitem": oracle.tile_assign_lineitem_sql(),
        "tile_counts": oracle.tile_counts_sql(),
        "tile_counts_salted": oracle.tile_counts_sql(),
        "tile_pyramid": oracle.tile_pyramid_sql(),
        "distinct_orders_per_returnflag": oracle.distinct_orders_per_returnflag_sql(),
        "distinct_orders_per_returnflag_salted": oracle.distinct_orders_per_returnflag_sql(),
        "geocode_orders_centerlines": oracle.geocode_orders_centerlines_sql(),
        "geocode_orders_wgs84": oracle.geocode_orders_wgs84_sql(),
        "geocode_pobox": oracle.geocode_pobox_sql(),
        "geocode_orders_units": oracle.geocode_orders_units_sql(),
        "geocode_orders_highways": oracle.geocode_orders_highways_sql(),
        "q4_order_priority": oracle.q4_order_priority_sql(),
        "revenue_longest_rise": oracle.revenue_longest_rise_sql(),
        "nation_top3_share": oracle.nation_top3_share_sql(),
        "nation_brand_weighted_jaccard": oracle.nation_brand_weighted_jaccard_sql(),
        "geohash_prefix_rollup": oracle.geohash_prefix_rollup_sql(),
        "documents_dedup_keep_longest": oracle.documents_dedup_keep_longest_sql(),
        "near_threshold_pairs": oracle.near_threshold_pairs_sql(),
        "lang_confusion_matrix": oracle.lang_confusion_matrix_sql(),
        "cosupply_edge_churn": oracle.cosupply_edge_churn_sql(),
        "supplier_kcore": oracle.supplier_kcore_sql(),
        "tile_anomalies": oracle.tile_anomalies_sql(),
        "nation_revenue_hhi": oracle.nation_revenue_hhi_sql(),
        "road_segment_load": oracle.road_segment_load_sql(),
        "supplier_portfolio_jaccard": oracle.supplier_portfolio_jaccard_sql(),
        "orders_price_drift_deciles": oracle.orders_price_drift_deciles_sql(),
        "events_ohlc_6h": oracle.events_ohlc_6h_sql(),
        "parts_discovery_curve": oracle.parts_discovery_curve_sql(),
        "events_hour_weekday_heatmap": oracle.events_hour_weekday_heatmap_sql(),
        "doc_top_tokens": oracle.doc_top_tokens_sql(),
        "segment_nation_contingency": oracle.segment_nation_contingency_sql(),
        "orders_benford_digits": oracle.orders_benford_digits_sql(),
        "customer_revenue_pareto": oracle.customer_revenue_pareto_sql(),
        "tile_quadkey_lineitem": oracle.tile_quadkey_lineitem_sql(),
        "partkey_f2_moment": oracle.partkey_f2_moment_sql(),
        "user_burst_peak": oracle.user_burst_peak_sql(),
        "documents_ipc_roundtrip": oracle.documents_ipc_roundtrip_sql(),
        "docs_with_all_tokens": oracle.docs_with_all_tokens_sql(),
        "tile_choropleth_classes": oracle.tile_choropleth_classes_sql(),
        "session_stats": oracle.session_stats_sql(),
        "radius_pair_distance_histogram": oracle.radius_pair_distance_histogram_sql(),
        "prefix_count_share": oracle.prefix_count_share_sql(),
        "events_value_percentrank_by_type": oracle.events_value_percentrank_by_type_sql(),
        "split_leakage_pairs": oracle.split_leakage_pairs_sql(),
        "dedup_cluster_size_histogram": oracle.dedup_cluster_size_histogram_sql(),
        "embedding_dim_stats": oracle.embedding_dim_stats_sql(),
        "orders_daily_autocorr": oracle.orders_daily_autocorr_sql(),
        "lineitem_price_mad": oracle.lineitem_price_mad_sql(),
        "supplier_clustering_coeff": oracle.supplier_clustering_coeff_sql(),
        "custkey_prefix_rollup": oracle.custkey_prefix_rollup_sql(),
        "orders_winsorized_total": oracle.orders_winsorized_total_sql(),
        "orders_price_minmax_scaled": oracle.orders_price_minmax_scaled_sql(),
        "zorder_encode_lineitem": oracle.zorder_encode_lineitem_sql(),
        "orders_daily_open_count": oracle.orders_daily_open_count_sql(),
        "order_brand_list": oracle.order_brand_list_sql(),
        "nation_trade_balance": oracle.nation_trade_balance_sql(),
        "nation_point_diameter": oracle.nation_point_diameter_sql(),
        "part_min_cost_supplier": oracle.part_min_cost_supplier_sql(),
        "embedding_covariance": oracle.embedding_covariance_sql(),
        "basket_brand_pairs": oracle.basket_brand_pairs_sql(),
        "orders_record_highs": oracle.orders_record_highs_sql(),
        "events_value_trend_slope": oracle.events_value_trend_slope_sql(),
        "orders_equidepth_bins": oracle.orders_equidepth_bins_sql(),
        "q7_volume_shipping": oracle.q7_volume_shipping_sql(),
        "q8_market_share": oracle.q8_market_share_sql(),
        "q9_product_profit": oracle.q9_product_profit_sql(),
        "q15_top_supplier": oracle.q15_top_supplier_sql(),
        "q17_small_quantity": oracle.q17_small_quantity_sql(),
        "q10_returned_revenue": oracle.q10_returned_revenue_sql(),
        "q12_late_lines": oracle.q12_late_lines_sql(),
        "q13_customer_distribution": oracle.q13_customer_distribution_sql(),
        "q14_promo_revenue": oracle.q14_promo_revenue_sql(),
        "q16_brand_supplier_count": oracle.q16_brand_supplier_count_sql(),
        "q18_large_orders": oracle.q18_large_orders_sql(),
        "q19_disjunctive_revenue": oracle.q19_disjunctive_revenue_sql(),
        "q22_idle_customers": oracle.q22_idle_customers_sql(),
        "parcel_area_by_grid": oracle.parcel_area_by_grid_sql(),
        "points_outside_parcels": oracle.points_outside_parcels_sql(),
        "parcel_cell_coverage": oracle.parcel_cell_coverage_sql(),
        "events_moving_sum": oracle.events_moving_sum_sql(),
        "media_dedup_report": oracle.media_dedup_report_sql(),
        "orders_skyline": oracle.orders_skyline_sql(),
        "snap_points_to_roads": oracle.snap_points_to_roads_sql(),
        "user_event_gini": oracle.user_event_gini_sql(),
        "geocode_join_orders": oracle.geocode_join_orders_sql(),
        "orders_without_lineitems": oracle.orders_without_lineitems_sql(),
        "cell_skew_topk": oracle.cell_skew_topk_sql(),
        "sample_orders": oracle.sample_orders_sql(),
        "stratified_sample_events": oracle.stratified_sample_events_sql(),
        "tile_raster_sparse": oracle.tile_raster_sparse_sql(),
        "top_tiles_sorted": oracle.top_tiles_sorted_sql(),
        "distinct_event_types": oracle.distinct_event_types_sql(),
        "token_count_documents": oracle.token_count_documents_sql(),
        "bpe_token_count_documents": oracle.bpe_token_count_documents_sql(),
        "lang_id_documents": oracle.lang_id_documents_sql(),
        "quality_documents": oracle.quality_documents_sql(),
        "doc_fingerprint": oracle.doc_fingerprint_sql(),
        "doc_rolling_fp": oracle.doc_rolling_fp_sql(),
        "dedup_exact": oracle.dedup_exact_sql(),
        "quality_filter_documents": oracle.quality_filter_documents_sql(),
        "documents_deduped": oracle.documents_deduped_sql(),
        "documents_near_deduped": oracle.documents_near_deduped_sql(),
        "curated_documents": oracle.curated_documents_sql(),
        "token_histogram": oracle.token_histogram_sql(),
        "token_cms_topk": oracle.token_cms_topk_sql(),
        "sequence_packing": oracle.sequence_packing_sql(),
        "sequence_packing_shuffled": oracle.sequence_packing_shuffled_sql(),
        "document_chunks": oracle.document_chunks_sql(),
        "contamination_flags": oracle.contamination_flags_sql(),
        "redact_documents": oracle.redact_documents_sql(),
        "split_assignment": oracle.split_assignment_sql(),
        "doc_length_percentiles": oracle.doc_length_percentiles_sql(),
        "media_features": oracle.media_features_sql(),
        "media_frames": oracle.media_frames_sql(),
        "ann_topk_quantized": oracle.ann_topk_quantized_sql(),
        "streaming_user_state": oracle.streaming_user_state_sql(),
        "streaming_watermark": oracle.streaming_watermark_sql(),
        "events_window": oracle.events_window_sql(),
        "events_sliding_window": oracle.events_sliding_window_sql(),
        "events_asof_join": oracle.events_asof_join_sql(),
        "sessionize": oracle.sessionize_sql(),
        "q1_pricing_summary": oracle.q1_pricing_summary_sql(),
        "top_customers": oracle.top_customers_sql(),
        "value_band_join": oracle.value_band_join_sql(),
        "top_orders_per_customer": oracle.top_orders_per_customer_sql(),
        "ngram_jaccard_pairs": oracle.ngram_jaccard_exact_pairs_sql(),
        "ngram_novelty": oracle.ngram_novelty_sql(),
        "shared_passage_pairs": oracle.shared_passage_pairs_sql(),
        "minhash_dup_pairs": oracle.minhash_dup_pairs_sql(),
        "simhash_dup_pairs": oracle.simhash_dup_pairs_sql(),
        "dedup_clusters": oracle.dedup_clusters_sql(),
        "geocode_pages": oracle.geocode_pages_sql(),
        "geocode_pages_dedup": oracle.geocode_pages_sql(),
        "curate_pages": oracle.curate_pages_sql(),
        "pages_domain_cap": oracle.pages_domain_cap_sql(),
        "pages_host_reputation": oracle.pages_host_reputation_sql(),
        "bpe_pair_counts": oracle.bpe_pair_counts_sql(),
        "pagerank_suppliers": oracle.pagerank_suppliers_sql(),
        "repetition_signals_documents": oracle.repetition_signals_documents_sql(),
        "feature_hash_documents": oracle.feature_hash_documents_sql(),
        "tfidf_search_topk": oracle.tfidf_search_topk_sql(),
        "order_lineitem_revenue": oracle.order_lineitem_revenue_sql(),
        "order_lineitem_revenue_bcast": oracle.order_lineitem_revenue_sql(),
        "events_resample_ffill": oracle.events_resample_ffill_sql(),
        "q3_shipping_priority": oracle.q3_shipping_priority_sql(),
        "orders_price_ntile": oracle.orders_price_ntile_sql(),
        "customer_running_total": oracle.customer_running_total_sql(),
        "orders_interorder_gap": oracle.orders_interorder_gap_sql(),
        "lineitem_moments": oracle.lineitem_moments_sql(),
        "user_mode_event_type": oracle.user_mode_event_type_sql(),
        "pages_boilerplate_strip": oracle.pages_boilerplate_strip_sql(),
        "embedding_centroids": oracle.embedding_centroids_sql(),
        "orders_validation_report": oracle.orders_validation_report_sql(),
        "revenue_rollup": oracle.revenue_rollup_sql(),
        "order_fulfillment_left": oracle.order_fulfillment_left_sql(),
        "order_fulfillment_left_shuffle": oracle.order_fulfillment_left_sql(),
        "user_event_pivot": oracle.user_event_pivot_sql(),
        "view_purchase_funnel": oracle.view_purchase_funnel_sql(),
        "orders_price_histogram": oracle.orders_price_histogram_sql(),
        "orders_above_customer_avg": oracle.orders_above_customer_avg_sql(),
        "customers_per_region": oracle.customers_per_region_sql(),
        "weighted_sample_orders": oracle.weighted_sample_orders_sql(),
        "orders_range_join": oracle.orders_range_join_sql(),
        "orders_price_percentiles": oracle.orders_price_percentiles_sql(),
        "knn_graph": oracle.knn_graph_sql(),
        "training_mixture": oracle.training_mixture_sql(),
        "user_journeys": oracle.user_journeys_sql(),
        "customers_with_orders": oracle.customers_with_orders_sql(),
        "orders_without_lineitems_anti": oracle.orders_without_lineitems_sql(),
        "revenue_cube": oracle.revenue_cube_sql(),
        "token_heavy_hitters": oracle.token_heavy_hitters_sql(),
        "delta_new_documents": oracle.delta_new_documents_sql(),
        "orders_price_outliers": oracle.orders_price_outliers_sql(),
        "order_route_l1": oracle.order_route_l1_sql(),
        "tile_cover_lineitem": oracle.tile_cover_lineitem_sql(),
        "events_props_extract": oracle.events_props_extract_sql(),
        "orders_profile": oracle.orders_profile_sql(),
        "events_recent_pruned": oracle.events_recent_pruned_sql(),
        "orders_upsert": oracle.orders_upsert_sql(),
        "events_dedup_hourly": oracle.events_dedup_hourly_sql(),
        "token_cooccurrence": oracle.token_cooccurrence_sql(),
        "name_typo_pairs": oracle.name_typo_pairs_sql(),
        "orders_price_rank": oracle.orders_price_rank_sql(),
        "supplier_triangles": oracle.supplier_triangles_sql(),
        "orders_table_checksum": oracle.orders_table_checksum_sql(),
        "events_hourly_median": oracle.events_hourly_median_sql(),
        "event_transitions": oracle.event_transitions_sql(),
        "geocode_pages_tile_counts": oracle.geocode_pages_tile_counts_sql(),
        "token_count_documents_jsonl": oracle.token_count_documents_sql(),
        "pages_html_extract_verify": oracle.pages_html_extract_verify_sql(),
        "user_retention_cohorts": oracle.user_retention_cohorts_sql(),
        "orders_trend_by_priority": oracle.orders_trend_by_priority_sql(),
        "q5_nation_revenue": oracle.q5_nation_revenue_sql(),
        "customer_nation_bbox": oracle.customer_nation_bbox_sql(),
        "events_melt": oracle.events_melt_sql(),
        "orders_keyset_page": oracle.orders_keyset_page_sql(),
        "fk_integrity_audit": oracle.fk_integrity_audit_sql(),
        "lineitem_weighted_median": oracle.lineitem_weighted_median_sql(),
        "key_skew_report": oracle.key_skew_report_sql(),
        "cell_week_distinct_orders": oracle.cell_week_distinct_orders_sql(),
        "raster_focal_sum": oracle.raster_focal_sum_sql(),
        "customer_latest_order": oracle.customer_latest_order_sql(),
        "repeat_customers_intersect": oracle.repeat_customers_intersect_sql(),
        "rolling_active_users": oracle.rolling_active_users_sql(),
        "order_od_matrix": oracle.order_od_matrix_sql(),
        "supplier_bfs_distance": oracle.supplier_bfs_distance_sql(),
        "documents_store_compaction": oracle.documents_store_compaction_sql(),
        "part_brand_target_encoding": oracle.part_brand_target_encoding_sql(),
        "events_daily_dense": oracle.events_daily_dense_sql(),
        "doc_sentence_stats": oracle.doc_sentence_stats_sql(),
        "orders_top_prices_with_ties": oracle.orders_top_prices_with_ties_sql(),
        "user_time_weighted_value": oracle.user_time_weighted_value_sql(),
        "curate_then_pack": oracle.curate_then_pack_sql(),
        "points_in_bbox_pruned": oracle.points_in_bbox_pruned_sql(),
        "customer_order_streaks": oracle.customer_order_streaks_sql(),
        "nation_revenue_share": oracle.nation_revenue_share_sql(),
        "parcel_proximity_pairs": oracle.parcel_proximity_pairs_sql(),
        "user_cusum_alarm": oracle.user_cusum_alarm_sql(),
        "embedding_norm_quantized": oracle.embedding_norm_quantized_sql(),
        "events_top2_gap": oracle.events_top2_gap_sql(),
        "orders_quarterly_revenue": oracle.orders_quarterly_revenue_sql(),
        "lineitem_ship_delay_histogram": oracle.lineitem_ship_delay_histogram_sql(),
    }

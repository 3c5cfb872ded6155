"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here calls
``ray.init`` / ``ray.shutdown``.  ``queries()`` exposes each implemented
operator/pipeline from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB
re-derivation over the same sf tables (see ``planetiler_ray.oracle``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: pages -> extract -> geoparse -> PIP +
    kNN joins -> zoom expansion -> tile-keyed shuffle -> per-tile MVT
    assembly.  Returns the assembled-tile summary Dataset."""
    from planetiler_ray.pipelines import flagship

    return flagship.tile_summary_ds(SF_SMOKE, zooms=[0, 2, 4, 6, 8, 10, 12, 14])


def queries() -> dict[str, Callable[[str], Any]]:
    from planetiler_ray.pipelines import training, webgeo

    return {
        # web-geo / tiling core
        "pages_meta": webgeo.q_pages_meta,
        "geoparse": webgeo.q_geoparse,
        "tile_counts": webgeo.q_tile_counts,
        "tile_counts_buffered": webgeo.q_tile_counts_buffered,
        "labelgrid_counts": webgeo.q_labelgrid_counts,
        "tile_size_budget": webgeo.q_tile_size_budget,
        "shard_plan": webgeo.q_shard_plan,
        "cell_counts": webgeo.q_cell_counts,
        "raster_regions": webgeo.q_raster_regions,
        "dbscan_census": webgeo.q_dbscan_census,
        "zone_diameter": webgeo.q_zone_diameter,
        "line_of_sight": webgeo.q_line_of_sight,
        "flow_accumulation": webgeo.q_flow_accumulation,
        "watershed_labels": webgeo.q_watershed_labels,
        "ridge_cells": webgeo.q_ridge_cells,
        "basin_depth": webgeo.q_basin_depth,
        "zonal_stats": webgeo.q_zonal_stats,
        "quadkey_counts": webgeo.q_quadkey_counts,
        "tile_pyramid": webgeo.q_tile_pyramid,
        "morton_cover": webgeo.q_morton_cover,
        "url_lcp": webgeo.q_url_lcp,
        "geohash_counts": webgeo.q_geohash_counts,
        "contour_census": webgeo.q_contour_census,
        "box_join": webgeo.q_box_join,
        "convex_hull": webgeo.q_convex_hull,
        "spatial_autocorr": webgeo.q_spatial_autocorr,
        "st_cube": webgeo.q_st_cube,
        "tile_skew": webgeo.q_tile_skew,
        "admin_top_terms": webgeo.q_admin_top_terms,
        "raster_distance": webgeo.q_raster_distance,
        "hex_smooth": webgeo.q_hex_smooth,
        "pip_join": webgeo.q_pip,
        "pip_complex": webgeo.q_pip_complex,
        "doc_geo_extent": webgeo.q_doc_geo_extent,
        "extent_area": webgeo.q_extent_area,
        "admin_centroid": webgeo.q_admin_centroid,
        "rasterize_polygons": webgeo.q_rasterize_polygons,
        "pip_nearest": webgeo.q_pip_nearest,
        "knn_join": webgeo.q_knn,
        "radius_join": webgeo.q_radius_join,
        "co_mentions": webgeo.q_co_mentions,
        "prefix_filter": webgeo.q_prefix_filter,
        "url_parse": webgeo.q_url_parse,
        "url_canon_dedup": webgeo.q_url_canon_dedup,
        "warc_pages": webgeo.q_warc_pages,
        "geoparquet_roundtrip": webgeo.q_geoparquet_roundtrip,
        "shapefile_src": webgeo.q_shapefile_src,
        "geopackage_src": webgeo.q_geopackage_src,
        "geojson_src": webgeo.q_geojson_src,
        "polygon_fill": webgeo.q_polygon_fill,
        "cluster_assign": training.q_cluster_assign,
        "ivf_exact": training.q_ivf_exact,
        "ivf_recall": training.q_ivf_recall,
        "knn_classify": training.q_knn_classify,
        "mutual_nn": training.q_mutual_nn,
        "doc_vector_join": training.q_doc_vector_join,
        "domain_stats": webgeo.q_domain_stats,
        "domain_cap": webgeo.q_domain_cap,
        # dedup suite
        "exact_dedup": training.q_exact_dedup,
        "jaccard_pairs": training.q_jaccard_pairs,
        "jaccard_rare": training.q_jaccard_rare,
        "ngram_jaccard": training.q_ngram_jaccard,
        "containment_pairs": training.q_containment_pairs,
        "edit_distance": training.q_edit_distance,
        "corpus_clean": training.q_corpus_clean,
        "minhash_lsh": training.q_minhash_lsh,
        "simhash": training.q_simhash,
        "minhash_planted": training.q_minhash_planted,
        "simhash_planted": training.q_simhash_planted,
        "embedding_neardup": training.q_embedding_neardup,
        "neardup_planted": training.q_neardup_planted,
        "pq_planted": training.q_pq_planted,
        "dedup_components": training.q_dedup_components,
        # similarity search
        "ann_brute": training.q_ann_brute,
        "ann_ivf": training.q_ann_ivf,
        "ann_pq": training.q_ann_pq,
        # text analysis
        "text_stats": training.q_text_stats,
        "quality": training.q_quality,
        "fingerprint": training.q_fingerprint,
        "doc_repetition": training.q_doc_repetition,
        "tfidf_topk": training.q_tfidf_topk,
        "langid": training.q_langid,
        "pii_scrub": training.q_pii_scrub,
        "line_dedup": training.q_line_dedup,
        "decontaminate": training.q_decontaminate,
        "pack_sequences": training.q_pack_sequences,
        "vocab_topk": training.q_vocab_topk,
        "unigram_surprisal": training.q_unigram_surprisal,
        "bigram_surprisal": training.q_bigram_surprisal,
        "keyword_topk": training.q_keyword_topk,
        "bpe_pairs": training.q_bpe_pairs,
        "dup_spans": training.q_dup_spans,
        "quantiles_by_lang": training.q_quantiles_by_lang,
        "hll_users": training.q_hll_users,
        "cms_counts": training.q_cms_counts,
        "bloom_probe": training.q_bloom_probe,
        "expr_classify": training.q_expr_classify,
        "weighted_sample": training.q_weighted_sample,
        "pagerank": training.q_pagerank,
        "pagerank_bucketed": training.q_pagerank_bucketed,
        "triangles": training.q_triangles,
        "triangles_bucketed": training.q_triangles_bucketed,
        "kcore": training.q_kcore,
        "kcore_bucketed": training.q_kcore_bucketed,
        "bfs_reach": training.q_bfs_reach,
        "bfs_reach_bucketed": training.q_bfs_reach_bucketed,
        "sssp_bounded": training.q_sssp_bounded,
        "sssp_bucketed": training.q_sssp_bucketed,
        "translit_names": training.q_translit_names,
        "retention": training.q_retention,
        "bigram_stats": training.q_bigram_stats,
        "rare_bigrams": training.q_rare_bigrams,
        "canonical_docs": training.q_canonical_docs,
        "corpus_diff": training.q_corpus_diff,
        "tile_invalidate": training.q_tile_invalidate,
        "tile_diff": training.q_tile_diff,
        "late_data": training.q_late_data,
        "dsir_weights": training.q_dsir_weights,
        "gopher_rules": training.q_gopher_rules,
        "ccnet_buckets": training.q_ccnet_buckets,
        "bearing_octants": training.q_bearing_octants,
        "tile_compact": training.q_tile_compact,
        "delta_dedup": training.q_delta_dedup,
        "funnel": training.q_funnel,
        "window_ohlc": training.q_window_ohlc,
        "pareto_front": training.q_pareto_front,
        "mad_outliers": training.q_mad_outliers,
        "range_join": training.q_range_join,
        "source_median_dev": training.q_source_median_dev,
        # multimodal plumbing
        "media_features": training.q_media_features,
        "media_phash": training.q_media_phash,
        "table_profile": training.q_table_profile,
        "dataset_split": training.q_dataset_split,
        "chunk_documents": training.q_chunk_documents,
        "media_stats": training.q_media_stats,
        "media_frames": training.q_media_frames,
        # stream-shaped ops
        "window": training.q_window,
        "decay_score": training.q_decay_score,
        "trend_slope": training.q_trend_slope,
        "burst_hours": training.q_burst_hours,
        "rolling_active": training.q_rolling_active,
        "active_seconds": training.q_active_seconds,
        "ivm_counts": training.q_ivm_counts,
        "reshard_moves": training.q_reshard_moves,
        "vocab_growth": training.q_vocab_growth,
        "readability": training.q_readability,
        "sliding_window": training.q_sliding_window,
        "median_by_type": training.q_median_by_type,
        "sessionize": training.q_sessionize,
        "inter_event_gaps": training.q_inter_event_gaps,
        "max_streak": training.q_max_streak,
        "kanon_audit": training.q_kanon_audit,
        "next_token": training.q_next_token,
        "vocab_coverage": training.q_vocab_coverage,
        "corpus_checksum": training.q_corpus_checksum,
        "running_total": training.q_running_total,
        "event_seq": training.q_event_seq,
        "pivot_counts": training.q_pivot_counts,
        "rank_in_type": training.q_rank_in_type,
        "pctl_by_type": training.q_pctl_by_type,
        "interval_join": training.q_interval_join,
        "hourly_active": training.q_hourly_active,
        "latest_per_user": training.q_latest_per_user,
        "asof_join": training.q_asof,
        "topk_events": training.q_topk_events,
        "topk_per_group": training.q_topk_per_group,
        # plain wide aggregate / relational ops
        "lineitem_agg": training.q_lineitem_agg,
        "tpch_q3": training.q_tpch_q3,
        "tpch_q5": training.q_tpch_q5,
        "quantize_embed": training.q_quantize_embed,
        "proportional_sample": training.q_proportional_sample,
        "fastss_pairs": training.q_fastss_pairs,
        "mixture_sample": training.q_mixture_sample,
        "langid_confusion": training.q_langid_confusion,
        "langs_above_median": training.q_langs_above_median,
        "rare_postings": training.q_rare_postings,
        "split_leakage": training.q_split_leakage,
        "dedup_by_source": training.q_dedup_by_source,
        "cube_counts": training.q_cube_counts,
        "window_deltas": training.q_window_deltas,
        "partitioned_roundtrip": training.q_partitioned_roundtrip,
        "lang_overlap": training.q_lang_overlap,
        "length_hist_sim": training.q_length_hist_sim,
        "ks_drift": training.q_ks_drift,
        "chi2_cells": training.q_chi2_cells,
        "cusum_alert": training.q_cusum_alert,
        "source_centroid": training.q_source_centroid,
        "event_transitions": training.q_event_transitions,
        "peak_concurrency": training.q_peak_concurrency,
        "benford_census": training.q_benford_census,
        "embed_dim_stats": training.q_embed_dim_stats,
        "ab_assign": training.q_ab_assign,
        "tpch_q6": training.q_tpch_q6,
        "tpch_q12": training.q_tpch_q12,
        "tpch_q18": training.q_tpch_q18,
        "tpch_q10": training.q_tpch_q10,
        "tpch_q7": training.q_tpch_q7,
        "tpch_q19": training.q_tpch_q19,
        "tpch_q22": training.q_tpch_q22,
        "rollup_counts": training.q_rollup_counts,
        "melt_stats": training.q_melt_stats,
        "lang_head_concat": training.q_lang_head_concat,
        "qty_disc_corr": training.q_qty_disc_corr,
        "modal_source": training.q_modal_source,
        "props_stats": training.q_props_stats,
        "lone_returner": training.q_lone_returner,
        "tpch_q14": training.q_tpch_q14,
        "tpch_q4": training.q_tpch_q4,
        "tpch_q13": training.q_tpch_q13,
        "tpch_q15": training.q_tpch_q15,
        "tpch_q17": training.q_tpch_q17,
        "tpch_q8": training.q_tpch_q8,
        "kmeans_lloyd": training.q_kmeans_lloyd,
        "semdedup": training.q_semdedup,
        "tpch_q2": _q_tpch_q2,
        "tpch_q9": _q_tpch_q9,
        "tpch_q11": _q_tpch_q11,
        "tpch_q16": _q_tpch_q16,
        "tpch_q20": _q_tpch_q20,
        "left_join_audit": training.q_left_join_audit,
        "anti_join": training.q_anti_join,
        "distinct_langs": training.q_distinct_langs,
        "semi_join": training.q_semi_join,
        "hash_sample": training.q_hash_sample,
        "stratified_sample": training.q_stratified_sample,
        # OSM-style two-pass source: way ⋈ node shuffle join + assembly
        "way_assembly": _q_way_assembly,
        "route_mileage": _q_route_mileage,
        "haversine_mileage": _q_haversine_mileage,
        "segment_crossings": _q_segment_crossings,
        "map_match": _q_map_match,
        "vw_simplify": _q_vw_simplify,
        "rect_union_area": _q_rect_union_area,
        "node_degree_census": _q_node_degree_census,
        "overlay_area": _q_overlay_area,
        "relation_assembly": _q_relation_assembly,
        "super_relations": _q_super_relations,
        "way_split": _q_way_split,
        "chaikin_smooth": _q_chaikin_smooth,
        "ring_orientation": _q_ring_orientation,
        # real .osm.pbf source: hand-rolled codec -> parallel blob decode
        "pbf_way_assembly": _q_pbf_way_assembly,
        "pbf_node_tags": _q_pbf_node_tags,
        "pbf_relation_members": _q_pbf_relation_members,
        # no-code YAML profile pipeline (rows-only: MVT tiles)
        "yaml_tiles": _q_yaml_tiles,
        # line layer: assembled ways -> sliced -> per-tile merged lines
        "route_tiles": _q_route_tiles,
        # oracle-expressible core of the route path: render length gate
        "route_zoom_gate": _q_route_zoom_gate,
        # FULL tile path (gate->simplify->slice->shuffle->merge) on an
        # integer-slack corpus: (z,x,y,n_features) exactly SQL-mirrored
        "route_tiles_exact": _q_route_tiles_exact,
        # REAL line_tiles slicing kernel, exact integer SAT oracle
        "line_cover": _q_line_cover,
        # archive statistics (tilestats analogue)
        "zoom_summary": _q_zoom_summary,
        "tile_weights": _q_tile_weights,
        "top_tiles": _q_top_tiles,
        "layer_zoom_stats": _q_layer_zoom_stats,
    }


def _q_tpch_q2(sf_dir: str):
    from planetiler_ray.pipelines import partsupp

    return partsupp.q_tpch_q2(sf_dir)


def _q_tpch_q9(sf_dir: str):
    from planetiler_ray.pipelines import partsupp

    return partsupp.q_tpch_q9(sf_dir)


def _q_tpch_q11(sf_dir: str):
    from planetiler_ray.pipelines import partsupp

    return partsupp.q_tpch_q11(sf_dir)


def _q_tpch_q16(sf_dir: str):
    from planetiler_ray.pipelines import partsupp

    return partsupp.q_tpch_q16(sf_dir)


def _q_tpch_q20(sf_dir: str):
    from planetiler_ray.pipelines import partsupp

    return partsupp.q_tpch_q20(sf_dir)


def _q_chaikin_smooth(sf_dir: str):
    """Two REAL Chaikin smoothing rounds over every assembled way on raw
    integer-mdeg coords — dyadic-exact, so vertex counts and 1/16-mdeg
    checksums have a bitwise SQL twin (unrolled 3p+q lag algebra)."""
    from planetiler_ray.pipelines import osm

    return osm.chaikin_checksum_ds(sf_dir)


def _q_route_tiles(sf_dir: str):
    from planetiler_ray.pipelines import routes

    return routes.route_tiles_ds(sf_dir, zooms=[0, 4, 8]).select_columns(
        ["tile_id", "z", "tile_x", "tile_y", "n_features", "n_bytes"]
    )


def _q_route_tiles_exact(sf_dir: str):
    """The full line-tile assembly path over a constructed exact corpus —
    closes the route path's last rows-only gap (see
    routes.route_tiles_exact_ds for the slack-by-construction design)."""
    from planetiler_ray.pipelines import routes

    return routes.route_tiles_exact_ds(sf_dir)


def _sql_convex_hull():
    from planetiler_ray.pipelines import routes

    return routes.sql_convex_hull()


def _sql_route_tiles_exact():
    from planetiler_ray.pipelines import routes

    return routes.sql_route_tiles_exact()


def _q_route_zoom_gate(sf_dir: str):
    from planetiler_ray.pipelines import routes

    return routes.route_zoom_gate_ds(sf_dir)


def _q_line_cover(sf_dir: str):
    """Per-zoom tile-coverage census of every assembled way through the
    REAL stripe-slicing kernel (geo/clip.line_tiles) on a half-offset
    snapped grid — the line-slice count, exactly mirrored in SQL by an
    integer segment-vs-box SAT test (see routes.sql_line_cover)."""
    from planetiler_ray.pipelines import routes

    return routes.line_cover_ds(sf_dir)


def _q_zoom_summary(sf_dir: str):
    """Archive stats (tilestats analogue) over the ASSEMBLED places layer —
    reduced to the oracle-expressible deterministic core (z, n_tiles,
    n_features); byte statistics stay available via stats.zoom_summary on
    the full flagship build (encode-dependent, not SQL-mirrorable)."""
    from planetiler_ray.pipelines import flagship, stats
    from planetiler_ray.pipelines.profile import TilingProfile, flagship_profile

    full = flagship_profile()
    places_only = TilingProfile(name="places-only", description="stats twin")
    places_only.add(full.layers["places"])
    rows = flagship.point_rows_ds(sf_dir, zooms=[2, 6])
    tiles = flagship.assemble_tiles(rows, places_only, n_buckets=64)
    return stats.zoom_summary(tiles)[["z", "n_tiles", "n_features"]]


def _q_tile_weights(sf_dir: str):
    """Traffic-weighted archive stats (TileWeights / weighted-average
    TilesetSummaryStatistics analogue) over the same places-only build as
    zoom_summary: deterministic synthetic per-tile traffic weight, exact
    int64 per-zoom sums (weight normalizer + weighted feature numerator)."""
    from planetiler_ray.pipelines import flagship, stats
    from planetiler_ray.pipelines.profile import TilingProfile, flagship_profile

    full = flagship_profile()
    places_only = TilingProfile(name="places-only", description="stats twin")
    places_only.add(full.layers["places"])
    rows = flagship.point_rows_ds(sf_dir, zooms=[2, 6])
    tiles = flagship.assemble_tiles(rows, places_only, n_buckets=64)
    return stats.tile_weights_summary(tiles)


def _q_layer_zoom_stats(sf_dir: str):
    """Per (layer, z) archive stats across two DIFFERENT layer families —
    the reference's per-layer summary (LayerAttrStats / tilestats "layers"
    block) at the query level: the places point layer (labelgrid top-k
    chain) and the admin fill-polygon layer (polygon-slicing fill path),
    each already oracle-pinned, reported in one layer-tagged table.
    Both inputs are per-zoom aggregates (tiny); the heavy lifting happens
    in the underlying distributed chains."""
    import pandas as pd

    from planetiler_ray.pipelines import flagship, stats, webgeo
    from planetiler_ray.pipelines.profile import TilingProfile, flagship_profile

    full = flagship_profile()
    places_only = TilingProfile(name="places-only", description="stats twin")
    places_only.add(full.layers["places"])
    rows = flagship.point_rows_ds(sf_dir, zooms=[2, 6])
    tiles = flagship.assemble_tiles(rows, places_only, n_buckets=64)
    a = stats.zoom_summary(tiles)[["z", "n_tiles", "n_features"]].rename(
        columns={"n_features": "n_units"})
    a.insert(0, "layer", "places")
    b = webgeo.q_polygon_fill(sf_dir).to_pandas()[
        ["z", "n_tiles", "n_fill"]].rename(columns={"n_fill": "n_units"})
    b.insert(0, "layer", "admin_fill")
    out = pd.concat([a, b], ignore_index=True)
    out["n_units"] = out["n_units"].astype("int64")
    return out.sort_values(["layer", "z"], ignore_index=True)


def _q_top_tiles(sf_dir: str):
    """Hot-tile report (TopOsmTiles analogue): top-20 tiles of the
    places-only build by the synthetic traffic weight — per-batch partial
    top-k under a total tie-break order, tiny final sort (never a global
    sort of the tile table)."""
    from planetiler_ray.pipelines import flagship, stats
    from planetiler_ray.pipelines.profile import TilingProfile, flagship_profile

    full = flagship_profile()
    places_only = TilingProfile(name="places-only", description="stats twin")
    places_only.add(full.layers["places"])
    rows = flagship.point_rows_ds(sf_dir, zooms=[2, 6])
    tiles = flagship.assemble_tiles(rows, places_only, n_buckets=64)
    return stats.top_weighted_tiles(tiles)


def _q_ring_orientation(sf_dir: str):
    """Integer-shoelace winding audit over cyclically-closed assembled
    ways (Planetiler's outer-CCW/hole-CW ring invariant) — one reduceat
    per bucket, exact int64 twin."""
    from planetiler_ray.pipelines import osm

    return osm.ring_orientation_ds(sf_dir)


def _sql_ring_orientation() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_ring_orientation()


def _sql_chaikin_checksum() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_chaikin_checksum()


def _sql_line_cover() -> str:
    from planetiler_ray.pipelines import routes

    return routes.sql_line_cover()


def _sql_route_zoom_gate() -> str:
    from planetiler_ray.pipelines import routes

    return routes.sql_route_zoom_gate()


def _sql_way_assembly() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_way_assembly()


def _sql_relation_assembly() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_relation_assembly()


def _sql_super_relations() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_super_relations()


def _q_overlay_area(sf_dir: str):
    """Vector overlay join: exact integer bbox∩admin-rect areas per zone
    (see osm.overlay_area for the no-join bbox + broadcast-grid design)."""
    from planetiler_ray.pipelines import osm

    return osm.overlay_area(sf_dir)


def _sql_overlay_area():
    from planetiler_ray.pipelines import osm

    return osm.sql_overlay_area()


def _q_route_mileage(sf_dir: str):
    from planetiler_ray.pipelines import osm

    return osm.route_mileage(sf_dir)


def _q_haversine_mileage(sf_dir: str):
    """Great-circle road-meters per admin zone (WithGeometry.lengthMeters
    parity): the way⋈node join + per-bucket haversine with the trig chain
    mirrored operand-for-operand in the SQL twin (floor per segment keeps
    every aggregate integer-exact)."""
    from planetiler_ray.pipelines import osm

    return osm.haversine_mileage(sf_dir)


def _q_segment_crossings(sf_dir: str):
    """Planar-overlay line-line crossing join (ST_Crosses): strict integer
    orientation tests over grid-cell-bucketed local way segments."""
    from planetiler_ray.pipelines import osm

    return osm.segment_crossings(sf_dir)


def _sql_segment_crossings() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_segment_crossings()


def _q_node_degree_census(sf_dir: str):
    """OSM QA node-degree histogram (orphans at 0, intersection candidates
    at >= 2) — one big node groupby, bounded histogram merge."""
    from planetiler_ray.pipelines import osm

    return osm.node_degree_census(sf_dir)


def _sql_node_degree_census() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_node_degree_census()


def _q_rect_union_area(sf_dir: str):
    """Klee's 2-D measure: exact union area of the overlapping relation
    rectangles via slab decomposition + per-slab compressed 2-D difference
    arrays; SQL twin sweeps globally — decomposition-independent result."""
    from planetiler_ray.pipelines import osm

    return osm.rect_union_area(sf_dir)


def _sql_rect_union_area() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_rect_union_area()


def _q_vw_simplify(sf_dir: str):
    """One parallel Visvalingam-Whyatt round per assembled way — exact
    integer doubled-triangle-area census (VisvalingamWhyatt.java parity)."""
    from planetiler_ray.pipelines import osm

    return osm.vw_simplify_census(sf_dir)


def _sql_vw_simplify() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_vw_simplify_census()


def _q_map_match(sf_dir: str):
    """GPS map matching: nearest-road-segment join within a search radius
    (clamped-projection distance, exact cell-cover candidate join)."""
    from planetiler_ray.pipelines import osm

    return osm.map_match(sf_dir)


def _sql_map_match() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_map_match()


def _sql_bearing_octants() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_bearing_octants()


def _sql_haversine_mileage() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_haversine_mileage()


def _sql_route_mileage() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_route_mileage()


def _q_way_assembly(sf_dir: str):
    from planetiler_ray.pipelines import osm

    return osm.assemble_ways(sf_dir)


def _q_relation_assembly(sf_dir: str):
    from planetiler_ray.pipelines import osm

    return osm.assemble_relations(sf_dir)


def _q_super_relations(sf_dir: str):
    from planetiler_ray.pipelines import osm

    return osm.super_relation_memberships(sf_dir)


def _q_way_split(sf_dir: str):
    from planetiler_ray.pipelines import osm

    return osm.split_ways_summary(sf_dir)


def _q_pbf_way_assembly(sf_dir: str):
    from planetiler_ray.pipelines import osm

    return osm.q_pbf_way_assembly(sf_dir)


def _q_pbf_node_tags(sf_dir: str):
    from planetiler_ray.pipelines import osm

    return osm.q_pbf_node_tags(sf_dir)


def _q_pbf_relation_members(sf_dir: str):
    from planetiler_ray.pipelines import osm

    return osm.q_pbf_relation_members(sf_dir)


def _sql_way_split() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_way_split()


def _sql_pbf_node_tags() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_pbf_node_tags()


def _sql_pbf_relation_members() -> str:
    from planetiler_ray.pipelines import osm

    return osm.sql_pbf_relation_members()


def _q_yaml_tiles(sf_dir: str):
    """No-code YAML pipeline, reduced to the oracle-expressible core
    (tile_id + per-tile kept-feature count; n_bytes is encode-dependent
    and stays available on the full Dataset)."""
    from planetiler_ray.pipelines import yamlprofile as Y

    return Y.build_yaml_tiles(sf_dir, Y.SAMPLE_SCHEMA, zooms=[2, 6]).select_columns(
        ["tile_id", "z", "tile_x", "tile_y", "n_features"]
    )


def oracle_sql() -> dict[str, str]:
    from planetiler_ray import oracle

    return {
        "pages_meta": oracle.sql_pages_meta(),
        "geoparse": oracle.sql_mentions(),
        "tile_counts": oracle.sql_tile_counts(),
        "tile_counts_buffered": oracle.sql_tile_counts_buffered(),
        "labelgrid_counts": oracle.sql_labelgrid_counts(),
        "tile_size_budget": oracle.sql_tile_size_budget(),
        "shard_plan": oracle.sql_shard_plan(),
        "cell_counts": oracle.sql_cell_counts(),
        "raster_regions": oracle.sql_raster_regions(),
        "dbscan_census": oracle.sql_dbscan_census(),
        "zone_diameter": oracle.sql_zone_diameter(),
        "line_of_sight": oracle.sql_line_of_sight(),
        "flow_accumulation": oracle.sql_flow_accumulation(),
        "watershed_labels": oracle.sql_watershed_labels(),
        "ridge_cells": oracle.sql_ridge_cells(),
        "basin_depth": oracle.sql_basin_depth(),
        "zonal_stats": oracle.sql_zonal_stats(),
        "quadkey_counts": oracle.sql_quadkey_counts(),
        "tile_pyramid": oracle.sql_tile_pyramid(),
        "morton_cover": oracle.sql_morton_cover(),
        "url_lcp": oracle.sql_url_lcp(),
        "geohash_counts": oracle.sql_geohash_counts(),
        "contour_census": oracle.sql_contour_census(),
        "box_join": oracle.sql_box_join(),
        "convex_hull": _sql_convex_hull(),
        "spatial_autocorr": oracle.sql_spatial_autocorr(),
        "st_cube": oracle.sql_st_cube(),
        "tile_skew": oracle.sql_tile_skew(),
        "admin_top_terms": oracle.sql_admin_top_terms(),
        "raster_distance": oracle.sql_raster_distance(),
        "hex_smooth": oracle.sql_hex_smooth(),
        "pip_join": oracle.sql_admin_join(),
        "pip_complex": oracle.sql_pip_complex(),
        "doc_geo_extent": oracle.sql_doc_geo_extent(),
        "extent_area": oracle.sql_extent_area(),
        "admin_centroid": oracle.sql_admin_centroid(),
        "rasterize_polygons": oracle.sql_rasterize_polygons(),
        "pip_nearest": oracle.sql_pip_nearest(),
        "knn_join": oracle.sql_knn(),
        "radius_join": oracle.sql_radius_join(),
        "co_mentions": oracle.sql_co_mentions(),
        "prefix_filter": oracle.sql_prefix_filter(),
        "url_parse": oracle.sql_url_parse(),
        "url_canon_dedup": oracle.sql_url_canon_dedup(),
        "warc_pages": oracle.sql_pages_meta(),
        "geoparquet_roundtrip": oracle.sql_mentions(),
        "shapefile_src": oracle.sql_gis_reader_admin(),
        "geopackage_src": oracle.sql_gis_reader_admin(),
        "geojson_src": oracle.sql_gis_reader_admin(),
        "cluster_assign": oracle.sql_cluster_assign(),
        "ivf_exact": oracle.sql_ivf_exact(),
        "ivf_recall": oracle.sql_ivf_recall(),
        "knn_classify": oracle.sql_knn_classify(),
        "mutual_nn": oracle.sql_mutual_nn(),
        "doc_vector_join": oracle.sql_doc_vector_join(),
        "domain_stats": oracle.sql_domain_stats(),
        "domain_cap": oracle.sql_domain_cap(),
        "exact_dedup": oracle.sql_exact_dedup(),
        "jaccard_pairs": oracle.sql_jaccard_pairs(),
        "jaccard_rare": oracle.sql_jaccard_rare(),
        "ngram_jaccard": oracle.sql_ngram_jaccard(),
        "containment_pairs": oracle.sql_containment_pairs(),
        "corpus_clean": oracle.sql_corpus_clean(),
        "ann_brute": oracle.sql_ann_brute(),
        "neardup_planted": oracle.sql_neardup_planted(),
        "pq_planted": oracle.sql_pq_planted(),
        "text_stats": oracle.sql_text_stats(),
        "quality": oracle.sql_quality(),
        "fingerprint": oracle.sql_fingerprint(),
        "doc_repetition": oracle.sql_doc_repetition(),
        "tfidf_topk": oracle.sql_tfidf_topk(),
        "pii_scrub": oracle.sql_pii_scrub(),
        "line_dedup": oracle.sql_line_dedup(),
        "decontaminate": oracle.sql_decontaminate(),
        "pack_sequences": oracle.sql_pack_sequences(),
        "vocab_topk": oracle.sql_vocab_topk(),
        "unigram_surprisal": oracle.sql_unigram_surprisal(),
        "keyword_topk": oracle.sql_keyword_topk(),
        "bpe_pairs": oracle.sql_bpe_pairs(),
        "dup_spans": oracle.sql_dup_spans(),
        "quantiles_by_lang": oracle.sql_quantiles_by_lang(),
        "hll_users": oracle.sql_hll_users(),
        "weighted_sample": oracle.sql_weighted_sample(),
        "pagerank": oracle.sql_pagerank(),
        "pagerank_bucketed": oracle.sql_pagerank(),
        "triangles": oracle.sql_triangles(),
        "triangles_bucketed": oracle.sql_triangles(),
        "kcore": oracle.sql_kcore(),
        "kcore_bucketed": oracle.sql_kcore(),
        "cms_counts": oracle.sql_cms_counts(),
        "pareto_front": oracle.sql_pareto_front(),
        "bloom_probe": oracle.sql_bloom_probe(),
        "expr_classify": oracle.sql_expr_classify(),
        "chaikin_smooth": _sql_chaikin_checksum(),
        "ring_orientation": _sql_ring_orientation(),
        "tpch_q6": oracle.sql_tpch_q6(),
        "tpch_q12": oracle.sql_tpch_q12(),
        "tpch_q18": oracle.sql_tpch_q18(),
        "tpch_q10": oracle.sql_tpch_q10(),
        "tpch_q7": oracle.sql_tpch_q7(),
        "tpch_q19": oracle.sql_tpch_q19(),
        "tpch_q22": oracle.sql_tpch_q22(),
        "rollup_counts": oracle.sql_rollup_counts(),
        "melt_stats": oracle.sql_melt_stats(),
        "lang_head_concat": oracle.sql_lang_head_concat(),
        "qty_disc_corr": oracle.sql_qty_disc_corr(),
        "modal_source": oracle.sql_modal_source(),
        "props_stats": oracle.sql_props_stats(),
        "lone_returner": oracle.sql_lone_returner(),
        "tpch_q14": oracle.sql_tpch_q14(),
        "tpch_q4": oracle.sql_tpch_q4(),
        "tpch_q13": oracle.sql_tpch_q13(),
        "tpch_q15": oracle.sql_tpch_q15(),
        "tpch_q17": oracle.sql_tpch_q17(),
        "tpch_q8": oracle.sql_tpch_q8(),
        "kmeans_lloyd": oracle.sql_kmeans_lloyd(),
        "semdedup": oracle.sql_semdedup(),
        "tpch_q2": oracle.sql_tpch_q2(),
        "tpch_q9": oracle.sql_tpch_q9(),
        "tpch_q11": oracle.sql_tpch_q11(),
        "tpch_q16": oracle.sql_tpch_q16(),
        "tpch_q20": oracle.sql_tpch_q20(),
        "edit_distance": oracle.sql_edit_distance(),
        "topk_per_group": oracle.sql_topk_per_group(),
        "bigram_surprisal": oracle.sql_bigram_surprisal(),
        "bfs_reach": oracle.sql_bfs_reach(),
        "bfs_reach_bucketed": oracle.sql_bfs_reach(),
        "sssp_bounded": oracle.sql_sssp_bounded(),
        "sssp_bucketed": oracle.sql_sssp_bounded(),
        "translit_names": oracle.sql_translit_names(),
        "retention": oracle.sql_retention(),
        "bigram_stats": oracle.sql_bigram_stats(),
        "rare_bigrams": oracle.sql_rare_bigrams(),
        "canonical_docs": oracle.sql_canonical_docs(),
        "corpus_diff": oracle.sql_corpus_diff(),
        "tile_invalidate": oracle.sql_tile_invalidate(),
        "tile_diff": oracle.sql_tile_diff(),
        "late_data": oracle.sql_late_data(),
        "dsir_weights": oracle.sql_dsir_weights(),
        "gopher_rules": oracle.sql_gopher_rules(),
        "ccnet_buckets": oracle.sql_ccnet_buckets(),
        "bearing_octants": _sql_bearing_octants(),
        "tile_compact": oracle.sql_tile_compact(),
        "delta_dedup": oracle.sql_delta_dedup(),
        "funnel": oracle.sql_funnel(),
        "window_ohlc": oracle.sql_window_ohlc(),
        "mad_outliers": oracle.sql_mad_outliers(),
        "range_join": oracle.sql_range_join(),
        "table_profile": oracle.sql_table_profile(),
        "dataset_split": oracle.sql_dataset_split(),
        "chunk_documents": oracle.sql_chunk_documents(),
        "source_median_dev": oracle.sql_source_median_dev(),
        "window": oracle.sql_window(),
        "decay_score": oracle.sql_decay_score(),
        "trend_slope": oracle.sql_trend_slope(),
        "burst_hours": oracle.sql_burst_hours(),
        "rolling_active": oracle.sql_rolling_active(),
        "active_seconds": oracle.sql_active_seconds(),
        "ivm_counts": oracle.sql_ivm_counts(),
        "reshard_moves": oracle.sql_reshard_moves(),
        "vocab_growth": oracle.sql_vocab_growth(),
        "readability": oracle.sql_readability(),
        "sliding_window": oracle.sql_sliding_window(),
        "median_by_type": oracle.sql_median_by_type(),
        "sessionize": oracle.sql_sessionize(),
        "inter_event_gaps": oracle.sql_inter_event_gaps(),
        "max_streak": oracle.sql_max_streak(),
        "kanon_audit": oracle.sql_kanon_audit(),
        "next_token": oracle.sql_next_token(),
        "vocab_coverage": oracle.sql_vocab_coverage(),
        "corpus_checksum": oracle.sql_corpus_checksum(),
        "running_total": oracle.sql_running_total(),
        "event_seq": oracle.sql_event_seq(),
        "pivot_counts": oracle.sql_pivot_counts(),
        "rank_in_type": oracle.sql_rank_in_type(),
        "pctl_by_type": oracle.sql_pctl_by_type(),
        "interval_join": oracle.sql_interval_join(),
        "hourly_active": oracle.sql_hourly_active(),
        "latest_per_user": oracle.sql_latest_per_user(),
        "asof_join": oracle.sql_asof(),
        "topk_events": oracle.sql_topk_events(),
        "lineitem_agg": oracle.sql_lineitem_agg(),
        "tpch_q3": oracle.sql_tpch_q3(),
        "tpch_q5": oracle.sql_tpch_q5(),
        "quantize_embed": oracle.sql_quantize_embed(),
        "proportional_sample": oracle.sql_proportional_sample(),
        "fastss_pairs": oracle.sql_fastss_pairs(),
        "mixture_sample": oracle.sql_mixture_sample(),
        "langid_confusion": oracle.sql_langid_confusion(),
        "langs_above_median": oracle.sql_langs_above_median(),
        "rare_postings": oracle.sql_rare_postings(),
        "split_leakage": oracle.sql_split_leakage(),
        "dedup_by_source": oracle.sql_dedup_by_source(),
        "cube_counts": oracle.sql_cube_counts(),
        "window_deltas": oracle.sql_window_deltas(),
        "partitioned_roundtrip": oracle.sql_partitioned_roundtrip(),
        "lang_overlap": oracle.sql_lang_overlap(),
        "length_hist_sim": oracle.sql_length_hist_sim(),
        "ks_drift": oracle.sql_ks_drift(),
        "chi2_cells": oracle.sql_chi2_cells(),
        "cusum_alert": oracle.sql_cusum_alert(),
        "source_centroid": oracle.sql_source_centroid(),
        "event_transitions": oracle.sql_event_transitions(),
        "peak_concurrency": oracle.sql_peak_concurrency(),
        "benford_census": oracle.sql_benford_census(),
        "embed_dim_stats": oracle.sql_embed_dim_stats(),
        "ab_assign": oracle.sql_ab_assign(),
        "left_join_audit": oracle.sql_left_join_audit(),
        "anti_join": oracle.sql_anti_join(),
        "distinct_langs": oracle.sql_distinct_langs(),
        "semi_join": oracle.sql_semi_join(),
        "hash_sample": oracle.sql_hash_sample(),
        "stratified_sample": (
            "WITH h AS (SELECT event_id, event_type,"
            " (event_id * 2654435761) % 4294967296 AS hv FROM events),"
            " r AS (SELECT *, row_number() OVER (PARTITION BY event_type"
            " ORDER BY hv, event_id) AS rn FROM h)"
            " SELECT event_id, event_type, CAST(hv AS BIGINT) AS hv"
            " FROM r WHERE rn <= 20"
        ),
        "media_frames": oracle.sql_media_frames(),
        "media_stats": oracle.sql_media_stats(),
        "zoom_summary": oracle.sql_zoom_summary(),
        "tile_weights": oracle.sql_tile_weights(),
        "top_tiles": oracle.sql_top_tiles(),
        "layer_zoom_stats": oracle.sql_layer_zoom_stats(),
        "yaml_tiles": oracle.sql_yaml_tiles(),
        "route_zoom_gate": _sql_route_zoom_gate(),
        "route_tiles_exact": _sql_route_tiles_exact(),
        "polygon_fill": oracle.sql_polygon_fill(),
        "line_cover": _sql_line_cover(),
        "minhash_planted": "SELECT doc_id * 2 AS a, doc_id * 2 + 1 AS b FROM documents",
        "simhash_planted": (
            "SELECT doc_id * 2 AS a, doc_id * 2 + 1 AS b,"
            " CAST(0 AS BIGINT) AS hamming FROM documents"
        ),
        "dedup_components": (
            "WITH e AS (SELECT doc_id - 1 AS a, doc_id AS b"
            " FROM documents WHERE doc_id % 7 <> 0),"
            " n AS (SELECT a AS node FROM e UNION SELECT b FROM e)"
            " SELECT node, node - (node % 7) AS comp FROM n"
        ),
        "way_assembly": _sql_way_assembly(),
        "route_mileage": _sql_route_mileage(),
        "haversine_mileage": _sql_haversine_mileage(),
        "segment_crossings": _sql_segment_crossings(),
        "map_match": _sql_map_match(),
        "vw_simplify": _sql_vw_simplify(),
        "rect_union_area": _sql_rect_union_area(),
        "node_degree_census": _sql_node_degree_census(),
        "overlay_area": _sql_overlay_area(),
        "relation_assembly": _sql_relation_assembly(),
        "super_relations": _sql_super_relations(),
        "way_split": _sql_way_split(),
        "pbf_way_assembly": _sql_way_assembly(),  # identical world via pbf
        "pbf_node_tags": _sql_pbf_node_tags(),
        "pbf_relation_members": _sql_pbf_relation_members(),
        "langid": oracle.sql_langid(),
        # rows-only (probabilistic / approximate / stubbed):
        #   minhash_lsh, simhash, embedding_neardup, ann_ivf, media_features
        #   (each approximate op has an exact planted-oracle twin;
        #    media decode is a documented stub), plus route_tiles
        #   (line-slice coverage; deterministic core covered by
        #   route_zoom_gate)
    }

"""Public API façade: the operator surface a reference user programs
against, re-exported lazily from the implementing modules.

    from time_series_spark_spark import forecast, asof_join, exact_dedup
    fc = forecast(df, keys=["store"], ds_col="ds", y_col="y", horizon=30)

Lazy (PEP 562 ``__getattr__``) so importing the package costs nothing —
submodules load on first attribute access, and query-registry modules
(which register 200+ queries on import) are NOT pulled in by the API
path.
"""

from __future__ import annotations

# name -> implementing module (under this package)
_API = {
    # session
    "get_spark": "session",
    # io
    "load": "sources.io",
    # forecasting (the reference's core surface)
    "forecast": "operators.forecast",
    "backtest": "operators.forecast",
    "daily_series": "operators.forecast",
    "holt_winters": "operators.forecast",
    "model_selection": "operators.forecast",
    "conformal_forecast": "operators.forecast",
    # time-series operators
    "resample": "operators.timeseries",
    "densify": "operators.timeseries",
    "ffill": "operators.timeseries",
    "bfill": "operators.timeseries",
    "interpolate_linear": "operators.timeseries",
    "asof_join": "operators.timeseries",
    "range_join_trailing": "operators.timeseries",
    "session_summary": "operators.timeseries",
    "time_split": "operators.timeseries",
    "ewma": "operators.timeseries",
    "rollup_cascade": "operators.timeseries",
    "change_points": "operators.timeseries",
    "sessionize": "operators.timeseries",
    "trailing_distinct": "operators.timeseries",
    # continuous analytics
    "ohlc": "operators.analytics",
    "time_weighted_avg": "operators.analytics",
    "counter_increase": "operators.analytics",
    "streaks": "operators.analytics",
    "rolling_corr": "operators.analytics",
    "retention_cohorts": "operators.analytics",
    "funnel": "operators.analytics",
    "lttb": "operators.analytics",
    "seasonal_decompose": "operators.analytics",
    "theil_sen_trend": "operators.analytics",
    "markov_attribution": "operators.analytics",
    # time-series mining
    "m4_downsample": "operators.tsmining",
    "paa_sax": "operators.tsmining",
    "sax_words": "operators.tsmining",
    "lead_lag_corr": "operators.tsmining",
    "dtw_topk": "operators.tsmining",
    "matrix_profile": "operators.tsmining",
    "kalman_smooth": "operators.tsmining",
    "kleinberg_bursts": "operators.tsmining",
    "series_vectors": "operators.tsmining",
    "dominant_periods": "operators.tsmining",
    "cluster_series_shapes": "operators.tsmining",
    # LLM-data pipeline
    "exact_dedup": "operators.llm",
    "ngram_jaccard_pairs": "operators.llm",
    "minhash_lsh_pairs": "operators.llm",
    "simhash_near_pairs": "operators.llm",
    "cosine_topk": "operators.llm",
    "srp_lsh_topk": "operators.llm",
    "ivf_topk": "operators.llm",
    "sq8_topk": "operators.llm",
    "pq_topk": "operators.llm",
    "text_metrics": "operators.llm",
    "rake_keywords": "operators.llm",
    "bpe_train": "operators.llm",
    "bpe_apply_merges": "operators.llm",
    "ppmi_cooccurrence": "operators.llm",
    "ppmi_svd_vectors": "operators.llm",
    "embedding_pca": "operators.llm",
    "project_embeddings": "operators.llm",
    "save_pq_codebooks": "operators.llm",
    "load_pq_codebooks": "operators.llm",
    "save_bpe_merges": "operators.llm",
    "load_bpe_merges": "operators.llm",
    # graph
    "connected_components": "operators.graph",
    "pagerank": "operators.graph",
    "triangle_stats": "operators.graph",
    "bfs_hops": "operators.graph",
    "k_core": "operators.graph",
    # geospatial
    "haversine_km": "operators.geo",
    "hash_point": "operators.geo",
    "grid_radius_join": "operators.geo",
    "grid_radius_join_two": "operators.geo",
    "nearest_neighbor_join": "operators.geo",
    # plan introspection
    "explain_analyze": "plans.metrics",
    "exchange_count": "plans.metrics",
    # sketches
    "hll_partials": "operators.sketches",
    "hll_rollup": "operators.sketches",
    "kll_partials": "operators.sketches",
    "kll_rollup_quantiles": "operators.sketches",
    "bitmap_partials": "operators.sketches",
    "bitmap_rollup": "operators.sketches",
    "mg_heavy_hitters": "operators.sketches",
    "mg_partials": "operators.sketches",
    "mg_merge_topk": "operators.sketches",
    "cm_partials": "operators.sketches",
    "cm_estimate": "operators.sketches",
    "hist_partials": "operators.sketches",
    "hist_quantile": "operators.sketches",
    # CDC / incremental
    "snapshot_diff": "operators.cdc",
    "apply_changes": "operators.cdc",
    "scd2_intervals": "operators.cdc",
    "pit_join": "operators.cdc",
    "incremental_join_delta": "operators.cdc",
    "incremental_hll_partials": "streaming.jobs",
    "read_incremental_hll_7d": "streaming.jobs",
    "incremental_kll_partials": "streaming.jobs",
    "read_incremental_kll_quantiles": "streaming.jobs",
    "incremental_fd_partials": "streaming.jobs",
    "read_incremental_fd": "streaming.jobs",
    # ML
    "purchase_propensity_auc": "operators.ml",
    "als_recommend": "operators.ml",
    "als_precision_at_k": "operators.ml",
    "purchase_matrix": "operators.ml",
    "frequent_event_sequences": "operators.ml",
    "frequent_itemsets": "operators.ml",
    # packed grouped map (the scale primitive)
    "packed_grouped_map": "operators.packed",
    # round 5
    "ams_partials": "operators.sketches",
    "ams_join_size": "operators.sketches",
    "frequent_directions": "operators.sketches",
    "plan_compaction": "sources.quality",
    "check_constraints": "sources.quality",
    "hurst_rs": "operators.tsmining",
    "shape_feature_vectors": "operators.tsmining",
    "cluster_silhouette_report": "operators.tsmining",
    "text_quality_classifier_auc": "operators.ml",
    "aft_session_lifetime": "operators.ml",
    "cv_tune_quality_lr": "operators.ml",
    "isotonic_calibration": "operators.ml",
    "stream_stream_left_outer_join": "streaming.jobs",
    "theta_forecast": "operators.forecast",
    "croston_forecast": "operators.forecast",
    "mips_topk": "operators.llm",
    "temperature_weights": "operators.llm",
    "frame_sample_rows": "operators.llm",
    "write_versioned": "sources.io",
    "read_versioned": "sources.io",
    "register_synthetic_source": "sources.pydatasource",
    "register_tick_stream_source": "sources.pydatasource",
}

__all__ = sorted(_API)

# Inside PySpark worker processes (where every task re-runs
# importlib.invalidate_caches and CPython re-parses every cached zip
# archive unconditionally — 110-160 ms/task measured), install the
# stamp-guarded zipimport invalidation. No-op in the driver and in
# plain Python programs. See zipcache.py for the full analysis.
from time_series_spark_spark import zipcache as _zipcache  # noqa: E402

_zipcache.install_if_worker()


def __getattr__(name: str):
    mod_path = _API.get(name)
    if mod_path is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        )
    import importlib

    mod = importlib.import_module(f"{__name__}.{mod_path}")
    value = getattr(mod, name)
    globals()[name] = value  # cache for subsequent lookups
    return value


def __dir__():
    return __all__

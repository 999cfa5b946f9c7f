"""Dump formatted physical plans for the headline queries → PLANS.md.

Also asserts the plan properties we design for (SURVEY §4 / scale notes):
filter pushdown reaching the parquet scan, column-pruned ReadSchema,
broadcast joins on dim tables, partial aggregation before the shuffle,
and no Python eval nodes outside the two deliberate pandas boundaries.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from db_migration_spark.queries import QUERIES
from db_migration_spark.session import get_spark

INSPECT = {
    "q1_pricing_summary": ["PushedFilters: [IsNotNull(l_shipdate)", "HashAggregate"],
    "x6_qa_report": ["BroadcastHashJoin", "HashAggregate"],
    "q3_top_revenue": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "x1_eav_melt": [],
    "x7_pivot_roundtrip": [],
    "w1_last_write_wins": ["Window"],
    "asof_join": ["Window"],
    "dedup_exact": ["HashAggregate"],
    "ann_cosine_topk": ["BroadcastNestedLoopJoin"],
    "events_hourly_rollup": ["HashAggregate"],
    "datalog_query": ["HashAggregate"],  # self-join eliminated: grouped pass
    "x3_typed_cast": [],
    "data_pipeline_filter": ["Window"],
    "q5_region_revenue": ["BroadcastHashJoin"],
    "q6_selective_sum": ["PushedFilters:", "HashAggregate"],
    "a7_cube": ["Expand", "HashAggregate"],
    "w4_lag_delta": ["Window"],
    "j4_semi_anti": ["LeftSemi"],
    "events_sessionize": [],
    "q12_priority_lines": ["HashAggregate"],
    "dedup_levenshtein": [],  # blocked equi-join — negative check below
    "f_array_suite": [],
    "emb_norm_stats": [],
    # round 2
    # banded equi self-join: AQE picks Broadcast/ShuffledHashJoin by size
    "dedup_embedding_cosine": ["HashJoin"],
    "ann_ivf_topk": ["TakeOrderedAndProject"],  # centroid seeding
    "dedup_simhash": ["HashAggregate"],  # codegen vote aggregate
    "text_tfidf_topterms": [],  # AQE picks tf⋈df strategy
    "text_contamination": ["HashAggregate"],
    "sample_lang_budget": ["Window"],
    "x4_card_many": ["Window"],  # single exchange, conditional key
    "ace_e2e_qa": ["HashAggregate"],
    "range_join_campaigns": ["HashJoin"],  # bucketed, never nested-loop
    "j_salted_hot_key": ["HashJoin"],  # salted equi-join
    "corpus_datacard": ["HashAggregate"],
    "datalog_not": ["LeftAnti"],  # not-clause → anti-join
    "datalog_agg": ["HashAggregate"],
    # round 2 continuation: hard relational patterns + corpus ops
    "q4_order_priority": ["LeftSemi"],
    "q7_nation_volume": ["BroadcastHashJoin"],
    "q10_returned_items": ["TakeOrderedAndProject"],
    "q15_top_supplier": ["BroadcastHashJoin"],
    "q17_small_qty_revenue": ["HashAggregate"],
    "q18_large_orders": ["HashAggregate"],
    "q19_disjunctive": ["BroadcastHashJoin"],
    "q21_sole_late_supplier": ["HashAggregate"],
    "q22_idle_customers": ["LeftAnti"],
    "chunk_dedup": ["Window", "HashAggregate"],
    "mixture_interleave": ["Window"],
    "user_profiles": ["HashAggregate"],
    "events_sliding_rollup": ["Expand", "HashAggregate"],
    "winsorize_values": ["Window"],
    "store_diff": ["FullOuter"],
    "dense_ids": ["Window"],
    "zorder_layout": [],
    "emb_quantize": [],
    "emb_random_projection": [],
    "w6_revenue_share": ["Window"],
    "funnel_view_purchase": ["Window"],
    "copurchase_triangles": ["LeftSemi"],  # degree-ordered wedge close
    "jsonl_roundtrip": [],
    "w5_distribution_ranks": ["Window"],
    "a8_grouping_sets": ["Expand"],
    "u4_union_by_name": ["Union"],
    "q8_market_share": ["BroadcastHashJoin"],
    "f_try_suite": [],
    "sql_frontend": ["Window"],
    "orc_roundtrip": ["HashAggregate"],
    "snapshot_time_travel": [],
    "stream_hourly_rollup": [],
    "stream_dedup_keys": [],
    "stream_stream_join": [],
    "partitioned_scan": ["PartitionFilters"],
    "schema_evolution": [],
    "crosstab_lang_source": [],
    "length_batching": ["Window"],
    "dedup_best_survivor": ["SortAggregate"],  # struct-max is sort-agg, still map-side partial
    "bucketed_join": ["SelectedBucketsCount"],
    # round 3 continuation: TPC-H close-out, Datomic ops, graph, corpus
    "q2_min_cost_supplier": ["Window", "BroadcastHashJoin"],
    "q9_product_profit": ["BroadcastHashJoin", "HashAggregate"],
    "q11_important_stock": ["HashAggregate"],
    "q16_supplier_count": ["LeftAnti", "HashAggregate"],
    "q20_concentrated_suppliers": ["LeftSemi", "HashAggregate"],
    "eav_since": ["Window"],
    "eav_upsert_identity": ["Window"],  # dense minting local ranks
    "eav_cas_patch": ["Window"],  # LWW current view + patch resolution
    "datalog_with": ["HashAggregate"],
    "datalog_collection": ["HashAggregate"],
    "datalog_pull_wildcard": ["HashAggregate"],
    "dedup_semantic": ["HashJoin"],  # within-cluster equi self-join
    "passage_chunks": ["Generate"],  # map-only chunk explode
    "multimodal_gif_decode": [],
    "multimodal_video_frames": [],
    "multimodal_g711_stats": [],
    "stream_session_rollup": [],
    # session 7
    "sql_recursive_cte": ["UnionLoop"],  # Catalyst recursion operator
    "assoc_rules": ["BroadcastHashJoin", "HashAggregate"],
    "rfm_segments": ["Window"],
    "ts_ohlc_bars": ["Window", "HashAggregate"],
    "graph_kcore": ["HashAggregate"],
    "ts_seasonal_forecast": ["HashAggregate"],
    "eav_lookup_ref": ["BroadcastHashJoin", "Window"],
    "orders_skyline": ["Window"],
    "stats_chi_square": ["BroadcastHashJoin"],
    "fixedwidth_source": ["HashAggregate"],
    "dedup_image_phash": [],
    "multimodal_bmp_decode": [],
    "multimodal_audio_resample": [],
    "ace_datasource_scan": ["BatchScan ace"],  # the source plugin node
    # session-8 surface
    "stats_spearman": ["Window", "HashAggregate"],
    "stats_linreg": ["HashAggregate"],
    "stats_mann_whitney": ["Window", "HashAggregate"],
    "stats_kruskal_wallis": ["Window", "HashAggregate"],
    "graph_clustering_coeff": ["HashAggregate"],
    "graph_jaccard_linkpred": ["Generate", "HashAggregate"],
    "ts_ewma": ["Window"],
    "ts_rolling_corr": ["Window", "HashAggregate"],
    "ts_max_drawdown": ["Window", "HashAggregate"],
    "a10_percentile_cont": ["BroadcastHashJoin", "Window"],
    "eav_attr_stats": ["HashAggregate"],
    "sql_group_by_all": ["HashAggregate", "Sort"],
    "binaryfile_scan": [],
    "corpus_ngram_counts": ["Generate", "TakeOrderedAndProject"],
    "text_gazetteer_tag": ["BroadcastHashJoin", "Generate"],
    "eav_entity_history": ["Window"],
    "f_aggmisc_suite": ["HashAggregate"],
    "multimodal_qoi_decode": [],
    "multimodal_webp_meta": [],
    # session-8 third wave
    "sql_join_hint": ["BroadcastHashJoin"],
    "cdc_apply": ["Window"],
    "multimodal_exif_meta": [],
    "stats_welch_suffstats": ["HashAggregate"],
    "graph_degree_histogram": ["HashAggregate"],
    "eav_db_filter": ["Aggregate"],  # collation/distinct picks SortAggregate
    "corpus_e2e_pipeline": ["Window", "HashAggregate"],
    "graph_modularity": ["BroadcastHashJoin", "HashAggregate"],
    "ts_cusum_changepoint": ["Window"],
    "sql_pipe_syntax": ["HashAggregate", "Sort"],
    "sql_collation_group": ["SortAggregate"],  # collated keys sort-aggregate
    "f_like_suite": ["HashAggregate"],
    "f_datetime_suite2": ["HashAggregate"],
    "stats_bootstrap_means": ["Generate", "HashAggregate"],
    "stats_mad": ["BroadcastHashJoin", "Window"],
    "eav_with_speculative": ["Window", "HashAggregate"],
    "stats_hhi_concentration": ["BroadcastHashJoin", "HashAggregate"],
    "stats_runs_test": ["Window", "HashAggregate"],
    "f_math_suite": [],
    "multimodal_ico_meta": [],
    "multimodal_flac_meta": [],
    "eav_ident_resolution": ["BroadcastHashJoin"],
    "w9_value_range_frame": ["Window"],
    "corpus_unigram_ranks": ["Generate", "HashAggregate"],
    "stats_gini_inequality": ["Window", "HashAggregate"],
    "ts_concurrent_intervals": ["Window", "HashAggregate"],
    "stats_km_lifetable": ["Window", "HashAggregate"],
    "ts_autocorrelation": ["Window"],
    "cohort_ltv": ["Window", "HashAggregate"],
    "events_sliding_distinct": ["Expand", "HashAggregate"],
    "multimodal_pdf_meta": [],
    # round-4 late sessions
    "txlog_delete_vectors": ["HashAggregate"],
    "txlog_merge_on_read": ["HashAggregate"],
    "privacy_k_anonymity": ["HashJoin", "HashAggregate"],
    "sql_udf_functions": ["HashJoin", "HashAggregate"],
    "corpus_preference_pairs": ["HashAggregate", "max_by", "min_by"],
    # round 5 (mv_reuse_rollup's ReusedExchange is an AQE runtime node —
    # asserted on the executed plan in test_plans_guard.py, invisible to
    # the static explain this tool captures)
    "mv_reuse_rollup": ["HashAggregate"],
    "txlog_partitioned_scan": ["HashAggregate"],  # post-prune slice agg
    "txlog_replace_where": ["HashAggregate"],
}

# plans that must NOT contain a product node (blocking worked)
FORBID = {
    "dedup_levenshtein": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    "q12_priority_lines": ["CartesianProduct"],
    "dedup_embedding_cosine": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    "text_contamination": ["CartesianProduct"],
    "dedup_semantic": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    "q2_min_cost_supplier": ["CartesianProduct"],
    "q16_supplier_count": ["CartesianProduct"],
    "passage_chunks": ["SortMergeJoin", "CartesianProduct"],
    "sql_recursive_cte": ["BroadcastNestedLoopJoin"],
    "assoc_rules": ["CartesianProduct"],
    "dedup_image_phash": ["CartesianProduct"],
    "graph_kcore": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    "orders_skyline": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    # session-8: exact CN/triangle pair generation must stay equi/hash
    "graph_clustering_coeff": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    "graph_jaccard_linkpred": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    "stats_spearman": ["CartesianProduct"],
    "corpus_ngram_counts": ["BatchEvalPython", "ArrowEvalPython"],
    "bpe_encode": ["BatchEvalPython", "ArrowEvalPython"],
    "graph_modularity": ["CartesianProduct"],
    "stats_mad": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    "ts_concurrent_intervals": ["CartesianProduct"],
    # governance must stay window-free; SQL UDFs must inline/decorrelate
    "privacy_k_anonymity": ["Window", "CartesianProduct"],
    "sql_udf_functions": [
        "BatchEvalPython", "ArrowEvalPython",
        "BroadcastNestedLoopJoin", "CartesianProduct",
    ],
    "corpus_preference_pairs": ["CartesianProduct", "Window", "SortMergeJoin"],
}


def main() -> None:
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.01"
    sections = []
    problems = []
    for name, expects in INSPECT.items():
        df = QUERIES[name](spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        for exp in expects:
            if exp not in plan:
                problems.append(f"{name}: expected `{exp}` in plan")
        for bad in FORBID.get(name, []):
            if bad in plan:
                problems.append(f"{name}: forbidden `{bad}` in plan")
        # scan width check: every parquet scan should have a ReadSchema
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        sections.append(f"## {name}\n\n```\n{plan}\n```\n")
        ncols = [len(s.split(",")) for s in scans if s]
        print(f"{name}: scans={ncols} "
              + ("OK" if not any(p.startswith(name) for p in problems) else "MISSING EXPECTED NODES"))
    with open("/root/repo/PLANS.md", "w") as fp:
        fp.write(
            "# Physical plans (sf0.01, generated by tools/explain_plans.py)\n\n"
            "Properties asserted per query: pushdown at the scan, pruned\n"
            "ReadSchema, broadcast dim joins, map-side partial aggregation.\n\n"
            + "\n".join(sections)
        )
    if problems:
        print("\nPROBLEMS:")
        for p in problems:
            print(" -", p)
        sys.exit(1)
    print("\nall expected plan nodes present; PLANS.md written")


if __name__ == "__main__":
    main()

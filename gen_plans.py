#!/usr/bin/env python
"""Regenerate PLANS.md: executed physical plans for every bench query
(headline + extended groups) plus the current round's new keys, at
$SPARK_GRAFT_SF_DIR (default sf0.1). Each entry gets an automated
shape-summary line (exchange/broadcast/SMJ/window/codegen counts, whether
scan-level pushed filters exist) and the executed plan tree trimmed to
_MAX_TREE_LINES lines — enough to diff plan-shape regressions without a
thousand-line wall per query.

Run: python gen_plans.py   (rewrites PLANS.md in place)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_MAX_TREE_LINES = 28

ROUND_KEYS = [
    # round-7 additions (plans/training.py BPE loop, composed IVF+PQ,
    # snapshot table format). The r06 cohort graduated into bench.py's
    # EXTENDED group and is covered through it.
    "text_bpe_train", "text_bpe_encode", "sim_topk_ivfpq",
    "table_snapshot_read",
    # round-8 additions (schema evolution + vacuum, oracle-exact IVFADC
    # twin, idempotent foreachBatch merge sink)
    "table_schema_evolution", "sim_topk_ivfpq_portable",
    "stream_foreach_merge", "table_stats_prune",
    # round-8 mid-round additions (change data feed, time-series
    # gap-fill, integer-exact k-means, recursive CTE, incremental MV)
    "table_changes", "ts_gapfill", "cluster_kmeans",
    "sql_recursive_bom", "table_incremental_mv",
    "json_variant_extract", "sql_scalar_udf", "shuffle_epoch",
    "try_funcs", "source_pyds_stream", "udtf_python_segments",
    "corpus_upsample",
    # round-9 additions (deletion vectors, partition pruning, typed CDF,
    # streaming change feed, history/restore/update, weighted sampling)
    "table_delete_mor", "table_partition_prune", "table_changes_typed",
    "stream_table_changes", "table_history", "table_restore",
    "table_update", "sample_weighted", "table_bloom_prune",
    "stream_table_changes_dist", "table_constraints",
    "table_generated_partition", "table_column_mapping", "table_clone",
    "text_bm25", "table_merge_evolve", "table_row_ids", "graph_bfs",
    "table_null_prune", "udf_cogrouped_asof", "table_partition_evolve",
    "table_update_mor",
    # round-10 additions (conflict matrix, branches, persisted ANN index,
    # rate-limited change feed, sketches, URL dedup, OHLC, weighted SSSP,
    # files metadata)
    "table_concurrent", "table_branch", "sim_index_persisted",
    "stream_changes_bounded", "sketch_countmin", "sketch_bloom",
    "url_normalize", "ts_resample_ohlc", "graph_sssp_weighted",
    "table_files_meta", "events_top_paths", "events_rfm",
    "orders_abc_pareto", "table_bucket_prune", "sketch_hll_portable",
    "stream_branch_changes", "orders_gini", "events_dau_wau",
    # round-11 additions (three-clause MERGE sync, type widening, XML
    # ingestion, polymorphic UDTF, audio energy windows, heavy hitters,
    # hive-partitioned source, containment join)
    "table_merge_sync", "table_type_widening", "xml_ingest",
    "udtf_polymorphic", "multimodal_audio_energy", "sketch_heavy_hitters",
    "source_hive_partitioned", "dedup_containment", "agg_linear_trend",
    "table_vacuum_audit",
    # round-12 additions (by-source MERGE UPDATE, generated/default
    # columns, unigram-LM tokenizer, TPC-DS mini-family, live stream
    # LEFT OUTER join)
    "table_merge_mark_stale", "table_generated_columns",
    "text_unigram_train", "text_unigram_encode",
    "sql_tpcds_q36", "sql_tpcds_q44", "sql_tpcds_q49", "sql_tpcds_q51",
    "sql_tpcds_q67", "stream_outer_join", "table_merge_clauses",
    "table_identity_columns", "table_merge_mor",
    "stream_foreach_merge_mor",
    # round-13 additions (SQL DML front-end, byte-level BPE, full-outer
    # stream join, per-prompt LLM isolation, bitmap DVs, MERGE skipping)
    "table_sql_merge", "table_sql_update", "table_sql_delete",
    "text_bpe_bytes_train", "text_bpe_bytes_encode",
    "stream_full_outer_join", "udf_llm_dead_letter", "table_dv_bitmap",
    "table_merge_skipping", "table_sql_insert", "table_sql_select",
    "sql_tpcds_q34", "sql_tpcds_q42", "sql_tpcds_q88", "sql_tpcds_q89",
    "sql_tpcds_q93", "quality_expectations",
    # round-14 additions (MoR clause matrix, SQL time travel + DDL,
    # pretrained byte-BPE, ANALYZE stats, legacy-DV decode, planted
    # near-dups at the production threshold)
    "table_merge_clauses_mor", "table_sql_timetravel", "table_sql_ddl",
    "text_bpe_pretrained", "table_analyze", "table_dv_legacy",
    "sim_near_dup_pairs",
    # round-14 mid-round additions (DESCRIBE HISTORY SQL, five more
    # TPC-DS shapes)
    "table_sql_history", "sql_tpcds_q43", "sql_tpcds_q59",
    "sql_tpcds_q65", "sql_tpcds_q79", "sql_tpcds_q98",
    "text_unigram_score",
    # round-15 additions (set-operation TPC-DS grammar: INTERSECT /
    # EXCEPT / multi-channel UNION ALL; warehouse write modes)
    "sql_tpcds_q8", "sql_tpcds_q14", "sql_tpcds_q38",
    "sql_tpcds_q71", "sql_tpcds_q87",
    "table_insert_overwrite", "table_copy_into",
    "sim_topk_lsh_portable", "doc_rolling_hash",
    "sim_index_refresh",
    # round-15 late additions (real-codec multimodal re-pins, the
    # language-ID gate, the structured-output retry)
    "multimodal_resize", "multimodal_audio_energy",
    "text_lang_id", "udf_llm_structured_retry",
    # round-15 second wave (prompt cache, year-over-year + deviation
    # TPC-DS families, pinned-centroid IVF twin)
    "udf_llm_prompt_cache", "sql_tpcds_q74", "sql_tpcds_q47",
    "sim_topk_ivf_portable", "corpus_split", "multimodal_decode",
    # round-15 third wave (retrieval/quality/curation breadth)
    "text_quality_classifier", "search_hybrid_rrf", "dedup_semantic",
    "sql_tpcds_q10", "sql_tpcds_q75", "sql_tpcds_q77", "sql_tpcds_q31",
    "corpus_curation_v2", "table_sql_dml_subquery",
    "search_mmr_rerank", "multimodal_image_dedup",
    "multimodal_audio_dedup", "sql_tpcds_q95", "sql_agg_filter",
    "join_asof_directions",
    # round-16 additions (chat-completions adapter, correlated-scalar
    # TPC-DS grammar, trained-weights classifier, integer-DCT pHash,
    # production-scale pretrained-vocab apply, parquet-side-table ANN)
    "udf_llm_openai_adapter", "sql_tpcds_q6", "sql_tpcds_q32",
    "sql_tpcds_q92", "sql_tpcds_q41", "text_quality_classifier_trained",
    "multimodal_image_phash", "text_bpe_pretrained_2k",
    "sim_index_persisted", "sim_index_refresh",
    # round-16 second wave (agg-of-agg subqueries, exact cov, channel
    # matrix, Unicode NFC gate)
    "sql_tpcds_q1", "sql_tpcds_q23", "sql_tpcds_q39", "sql_tpcds_q97",
    "text_normalize_nfc", "corpus_mix_temperature",
    "corpus_select_budget", "curation_domain_filter",
]


def _summary(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    n_bc = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    n_win = len(re.findall(r"\bWindow\b", plan))
    # executedPlan().toString() marks codegen stages as "*(<id>) Node";
    # count distinct stage ids (the literal wrapper name never appears)
    n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
    pushed = "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "no"
    cart = "!! CARTESIAN" if "CartesianProduct" in plan else ""
    return (
        f"_exchanges={n_ex} broadcast_joins={n_bc} sort_merge_joins={n_smj} "
        f"windows={n_win} codegen_spans={n_wsc} pushed_filters={pushed}{cart}_"
    )


def _tree(plan: str) -> str:
    # plan strings can embed literal NULs (the DV machinery's
    # concat_ws("\x00", ...) composite keys) — escape them so PLANS.md
    # stays a text file for grep/diff tooling
    plan = plan.replace("\x00", "\\x00")
    lines = [ln.rstrip() for ln in plan.splitlines() if ln.strip()]
    if len(lines) > _MAX_TREE_LINES:
        kept = lines[:_MAX_TREE_LINES]
        kept.append(f"... ({len(lines) - _MAX_TREE_LINES} more lines)")
        lines = kept
    return "\n".join(lines)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
    import bench
    from unfccc_documents_database_sandbox_spark.registry import (
        load_all_plans,
        lookup,
    )
    from unfccc_documents_database_sandbox_spark.session import get_spark

    load_all_plans()
    spark = get_spark(app_name="gen_plans")
    spark.sparkContext.setLogLevel("ERROR")
    # Static plans: a DataFrame's own AdaptiveSparkPlan only finalizes when
    # an action runs on THAT execution (df.write spawns a separate one), so
    # with AQE on every recorded plan would read "isFinalPlan=false" with
    # no codegen annotations. AQE off gives the deterministic static plan
    # — codegen spans, static broadcast choices — which is also the right
    # artifact to DIFF round-over-round (AQE's runtime re-planning is
    # pinned where it matters by tests/test_scale.py).
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    names = ["scan_full", *bench.HEADLINE, *bench.EXTENDED]
    names += [k for k in ROUND_KEYS if k not in names]
    builders = bench._builders()

    out = [
        "# PLANS — executed physical plans of the bench queries",
        "",
        f"Auto-generated by gen_plans.py at {sf_dir} on "
        "local[32] (`df._jdf.queryExecution().executedPlan()`). Covers the "
        "headline group, the extended group (VERDICT r05 #1), and the "
        "current round's new keys. Each entry: an automated shape summary "
        f"+ the plan tree trimmed to {_MAX_TREE_LINES} lines, so "
        "plan-shape regressions are reviewable in diffs, not only caught "
        "by tests/test_scale.py asserts. Regenerate with "
        "`python gen_plans.py`.",
        "",
    ]
    for name in names:
        b = builders.get(name)
        if b is None:
            b = lookup(name).build
        df = b(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", _summary(plan), "", "```", _tree(plan), "```", ""]
        print(f"{name}: {_summary(plan)}", flush=True)

    repo = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo, "PLANS.md"), "w", encoding="utf-8") as fh:
        fh.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()

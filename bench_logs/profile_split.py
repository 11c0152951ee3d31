#!/usr/bin/env python
"""Split each heavy query's wall time into build / plan / exec / re-exec.

build  = builder(spark, sf_dir) call (DataFrame construction, py-side)
plan   = force analysis+optimization+physical planning (executedPlan)
exec1  = first noop write of THIS DataFrame object (includes codegen/JIT
         if not already warm; bench warm-up makes this ~steady)
exec2  = second noop write of the SAME object (no re-planning)

A large (build+plan) share means the per-pass cost is driver-side plan
work (guide 7.3) — the fix is a smaller expression tree / truncated
plan, not a better distributed algorithm.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "corpus_curation_v2", "text_lang_id", "join_similarity_prefix",
    "dedup_embedding", "graph_pagerank", "udtf_polymorphic",
    "dedup_fuzzy_minhash", "dedup_containment", "cluster_kmeans",
    "sim_near_dup_pairs", "basket_pairs", "graph_sssp_weighted",
    "graph_bfs", "text_unigram_encode", "text_unigram_score",
    "text_bpe_bytes_encode", "text_bpe_encode", "search_hybrid_rrf",
    "text_bm25", "text_unigram_train", "text_bpe_bytes_train",
    "graph_triangles", "text_bpe_train", "search_mmr_rerank",
    "sql_tpcds_q95", "multimodal_image_phash", "multimodal_image_dedup",
    "agg_doc_text", "dedup_exact", "dedup_latest", "sql_tpch_q21",
    "text_quality_classifier", "dedup_semantic",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from unfccc_documents_database_sandbox_spark.registry import (
        load_all_plans, lookup,
    )
    from unfccc_documents_database_sandbox_spark.session import get_spark

    load_all_plans()
    spark = get_spark(app_name="profile_split")
    spark.sparkContext.setLogLevel("ERROR")

    # prime python workers
    (spark.range(0, 128).repartition(32)
     .mapInPandas(lambda it: (p for p in it), "id long")
     .write.format("noop").mode("overwrite").save())

    # warm all plans once at sf0.01 (same as bench warm-up)
    for name in QUERIES:
        lookup(name).build(spark, "/root/testdata/sf0.01") \
            .write.format("noop").mode("overwrite").save()

    out = {}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = lookup(name).build(spark, sf_dir)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        out[name] = {
            "build": round(t1 - t0, 3),
            "plan": round(t2 - t1, 3),
            "exec1": round(t3 - t2, 3),
            "exec2": round(t4 - t3, 3),
            "total": round(t3 - t0, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("FULL " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

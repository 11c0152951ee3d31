#!/usr/bin/env python
"""Cold-ish A/B for the r17 perf-weak keys (VERDICT r17 #2).

The r17 warm A/B (ab_keys.py, back-to-back passes of ONE key) showed the
eager-pin shapes faster, but the driver's full bench showed them slower.
Difference: the driver interleaves all 172 keys, so by the time a key's
next pass runs, executor storage carries every other key's localCheckpoint
blocks (freed only by driver GC) — back-to-back A/B never sees that
pressure. This harness replicates it: fresh JVM per invocation, warm-up at
sf0.01, then N timed passes of the target keys with a FIXED set of heavy
checkpoint-y filler keys run untimed between passes.

Usage: python bench_logs/cold_ab.py key1,key2 [n_passes]
Variant selection happens via code edits between runs (each run is its own
process, so there is no cross-contamination).
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

FILLERS = [
    "cluster_kmeans", "graph_pagerank", "basket_pairs",
    "text_bm25", "dedup_fuzzy_minhash", "text_tfidf",
]


def main():
    keys = sys.argv[1].split(",")
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from unfccc_documents_database_sandbox_spark.registry import (
        load_all_plans, lookup,
    )
    from unfccc_documents_database_sandbox_spark.session import get_spark

    load_all_plans()
    spark = get_spark(app_name="cold_ab")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    (spark.range(0, 128).repartition(32)
     .mapInPandas(lambda it: (p for p in it), "id long")
     .write.format("noop").mode("overwrite").save())
    for k in [*keys, *FILLERS]:
        noop(lookup(k).build(spark, "/root/testdata/sf0.01"))

    times = {k: [] for k in keys}
    for _ in range(n_passes):
        for f in FILLERS:
            noop(lookup(f).build(spark, sf))
        for k in keys:
            t0 = time.perf_counter()
            noop(lookup(k).build(spark, sf))
            times[k].append(round(time.perf_counter() - t0, 3))
    for k in keys:
        print("RESULT", k, "median", round(statistics.median(times[k]), 3),
              "min", min(times[k]), times[k])
    spark.stop()


if __name__ == "__main__":
    main()

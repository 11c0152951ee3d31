import sys, time, statistics
sys.path.insert(0, "/root/repo")
from unfccc_documents_database_sandbox_spark.registry import load_all_plans, lookup
from unfccc_documents_database_sandbox_spark.session import get_spark
load_all_plans()
spark = get_spark(app_name="ab_keys")
spark.sparkContext.setLogLevel("ERROR")
keys = sys.argv[1].split(",")
sf = "/root/testdata/sf0.1"
for k in keys:
    lookup(k).build(spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()
for k in keys:
    lookup(k).build(spark, sf).write.format("noop").mode("overwrite").save()
for k in keys:
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        lookup(k).build(spark, sf).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print("RESULT", k, "median", round(statistics.median(ts), 3), [round(t,2) for t in ts])
spark.stop()

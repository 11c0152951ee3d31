#!/usr/bin/env python
"""Dump explain('formatted') for the named registry keys into plans/<round>/ (3rd arg, default r18)."""
import os
import sys

sys.path.insert(0, "/root/repo")

names = sys.argv[1].split(",")
suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
rnd = sys.argv[3] if len(sys.argv) > 3 else "r18"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from unfccc_documents_database_sandbox_spark.registry import load_all_plans, lookup
from unfccc_documents_database_sandbox_spark.session import get_spark

load_all_plans()
spark = get_spark(app_name="dump_plans")
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(f"/root/repo/plans/{rnd}", exist_ok=True)
for name in names:
    df = lookup(name).build(spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = f"/root/repo/plans/{rnd}/{name}_{suffix}.txt"
    with open(path, "w") as f:
        f.write(txt)
    print("wrote", path, len(txt), "chars")
spark.stop()

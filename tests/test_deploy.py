"""Deployment-shape regression: the engine must work when the DRIVING
process does not run from the repo root (the external driver, a spark-submit
job, a notebook). Python workers unpickle module-level mapInPandas /
applyInPandasWithState functions by importing this package, which only
resolves everywhere because catalog.ensure_pyfiles ships the package zip via
addPyFile — the runtime equivalent of --py-files. This test runs the
worker-bound keys from a NEUTRAL cwd in a fresh interpreter; before the
addPyFile hook they failed there with ModuleNotFoundError."""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
from unfccc_documents_database_sandbox_spark.registry import lookup
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
e.queries()  # force plan registration
# docx_ingest: module-level mapInPandas parser; udf_llm_cost_sum:
# module-level batch-LLM fn — both need the package importable on workers.
# lookup() resolves pre-rotation names regardless of the current z_ window.
assert lookup("docx_ingest").build(spark, "/root/testdata/sf0.001").count() == 2
assert lookup("udf_llm_cost_sum").build(spark, "/root/testdata/sf0.001").count() == 1
print("DEPLOY_OK")
spark.stop()
"""


def test_worker_import_without_repo_cwd(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo)],
        cwd=str(tmp_path),  # NOT the repo root
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "DEPLOY_OK" in proc.stdout

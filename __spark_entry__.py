"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``unfccc_documents_database_sandbox_spark``;
this module is a thin view over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unfccc_documents_database_sandbox_spark.registry import REGISTRY, load_all_plans

load_all_plans()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the conclusions-pipeline
    slice (SURVEY.md §7 phase 1) — body-symbol-style filter → derived
    ordered blocks → per-document text assembly (A1) → stub-LLM summary
    with cost accounting (U1-U4), all in one plan."""
    from pyspark.sql import functions as F

    from unfccc_documents_database_sandbox_spark.catalog import load_table
    from unfccc_documents_database_sandbox_spark.llm.batch import (
        parse_structured,
        prompt_column,
        summarize,
    )
    from unfccc_documents_database_sandbox_spark.operators.assembly import (
        assemble_doc_text,
        blocks_from_documents,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isin("en", "es")  # the reference's SBI/SBSTA-style filter
    )
    assembled = assemble_doc_text(blocks_from_documents(docs))
    prompts = assembled.select(
        "doc_id", prompt_column(text_col="doc_text").alias("prompt")
    )
    summarized = parse_structured(summarize(prompts))
    return summarized.join(assembled, "doc_id").select(
        "doc_id", "doc_text", "n_blocks", "summary", "cost"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible query; rows-only ops
    (approx/hash-seeded/streaming-state) are intentionally absent."""
    return {
        name: spec.oracle
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }

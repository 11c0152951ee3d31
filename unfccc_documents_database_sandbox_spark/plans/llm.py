"""The LLM pipeline queries (U1-U5): prompt templating, batch inference
with the deterministic stub model, structured-output parse, cost rollup,
and a grouped-map (applyInPandas) UDAF.

The stub makes U1-U4 fully oracle-checkable: summary = 'STUB:' || sha256(prompt)
and cost = 1e-6 * length(prompt) are pure functions of the input.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from unfccc_documents_database_sandbox_spark.catalog import load_table
from unfccc_documents_database_sandbox_spark.llm.batch import (
    SYSTEM_PROMPT,
    parse_structured,
    prompt_column,
    summarize,
)
from unfccc_documents_database_sandbox_spark.registry import register

# DuckDB-side twin of llm.batch.prompt_column + StubChatModel
_PROMPT_SQL = f"'{SYSTEM_PROMPT}' || text"
# NB: SYSTEM_PROMPT contains a real newline; inline it via chr(10) instead.
_PROMPT_SQL = "'Summarize the following UNFCCC document.' || chr(10) || text"


@register(
    "udf_prompt_template",
    oracle=f"SELECT doc_id, {_PROMPT_SQL} AS prompt FROM documents",
)
def udf_prompt_template(spark, sf_dir):
    """U2 prompt templating (reference: ChatPromptTemplate system+user
    messages, generate_decisions_summaries.py:96-98) — JVM-side concat."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", prompt_column().alias("prompt"))


@register(
    "udf_llm_summarize",
    oracle=f"""
    SELECT doc_id,
           'STUB:' || sha256({_PROMPT_SQL}) AS summary,
           1e-6 * length({_PROMPT_SQL}) AS cost
    FROM documents
    """,
)
def udf_llm_summarize(spark, sf_dir):
    """U1+U3 batch LLM inference (reference: agent.batch(messages),
    generate_decisions_summaries.py:107) via mapInPandas with the
    deterministic stub model, then structured-output JSON parse."""
    d = load_table(spark, sf_dir, "documents")
    prompts = d.select("doc_id", prompt_column().alias("prompt"))
    raw = summarize(prompts)
    return parse_structured(raw).select("doc_id", "summary", "cost")


@register(
    "udf_llm_cost_sum",
    oracle=f"""
    SELECT CAST(SUM(CAST(ROUND(1e-6 * length({_PROMPT_SQL}) * 1000000, 0) AS BIGINT))
               AS BIGINT) AS total_cost_micros,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    """,
)
def udf_llm_cost_sum(spark, sf_dir):
    """U4 cost accounting rollup (reference: get_openai_callback cost
    accumulator, generate_decisions_summaries.py:105-109). Cost is an output
    column of the inference stage; summed exactly in micro-units."""
    d = load_table(spark, sf_dir, "documents")
    prompts = d.select("doc_id", prompt_column().alias("prompt"))
    raw = summarize(prompts)
    return raw.agg(
        F.sum(F.round(F.col("cost") * 1_000_000, 0).cast("long")).alias(
            "total_cost_micros"
        ),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


@register(
    "udaf_grouped_map",
    oracle="""
    SELECT doc_id, lang,
           CAST(n_chars - MIN(n_chars) OVER (PARTITION BY lang) AS BIGINT)
               AS chars_above_min,
           CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS group_size
    FROM documents
    """,
)
def udaf_grouped_map(spark, sf_dir):
    """U5 grouped-map UDAF via applyInPandas: per-language normalization
    (distance from the group minimum — integer math so it hashes exactly).
    The Spark pattern for any per-group Python logic that built-ins can't
    express; here it IS expressible in SQL, which is what makes it
    oracle-checkable."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("chars_above_min", T.LongType()),
            T.StructField("group_size", T.LongType()),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "lang": pdf["lang"],
                "chars_above_min": (pdf["n_chars"] - pdf["n_chars"].min()).astype(
                    "int64"
                ),
                "group_size": len(pdf),
            }
        )

    return d.groupBy("lang").applyInPandas(normalize, schema)


@register(
    "udaf_pandas_agg",
    oracle="""
    SELECT lang, source,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang, source
    """,
)
def x_udaf_pandas_agg(spark, sf_dir):
    """U5-ext grouped-AGGREGATE pandas UDF (the third pandas-UDF shape
    beside scalar-iterator and grouped-map): an Arrow-batched Series→scalar
    reduction per group. Integer sum, so the result hashes exactly.

    Honest scale note in the plan itself: grouped-agg pandas UDFs do NOT
    partial-aggregate — Spark shuffles raw rows to the group's reducer,
    unlike the map-side-combining built-in F.sum. The key exists to prove
    the API seam for reductions built-ins genuinely can't express (e.g. a
    custom sketch merge); for anything expressible, use the built-in — as
    every other registered aggregation here does."""
    from pyspark.sql.functions import pandas_udf

    d = load_table(spark, sf_dir, "documents").select("lang", "source", "n_chars")

    @pandas_udf("long")
    def total_chars(v: pd.Series) -> int:
        return int(v.sum())

    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates in
    # one agg (INVALID_PANDAS_UDF_PLACEMENT), so the count is pandas too
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    return d.groupBy("lang", "source").agg(
        total_chars("n_chars").alias("total_chars"),
        n_rows("n_chars").alias("n_docs"),
    )

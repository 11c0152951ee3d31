"""unfccc_documents_database_sandbox_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference sandbox ``Mitigation-unfccc/unfccc-documents-database-sandbox``
(a thin Postgres/SQLAlchemy + pandas + batch-LLM client), plus the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) required for a 100 TB-scale training-data pipeline.

Layout
------
- ``session``    — tuned ``SparkSession`` factory (AQE, Arrow, broadcast).
- ``schemas``    — explicit ``StructType`` schemas for every table.
- ``catalog``    — parquet table loader + temp-view registration.
- ``registry``   — query registry: each operator registers a Spark builder
                   and (when SQL-expressible) a DuckDB oracle twin.
- ``operators/`` — document assembly, dedup, similarity, windows, text stats.
- ``sources/``   — parquet / jdbc / csv / binary (multimodal) IO.
- ``functions/`` — scalar/array/text helper expressions (JVM-side only).
- ``plans/``     — the registered query plans (SURVEY.md §2 inventory).
- ``streaming/`` — Structured Streaming operators (windows, watermark, dedup).
- ``llm/``       — the batch-LLM inference island (mapInPandas, stubbed model).
"""

from unfccc_documents_database_sandbox_spark.session import get_spark
from unfccc_documents_database_sandbox_spark.catalog import TABLES, load_table, register_views
from unfccc_documents_database_sandbox_spark.registry import REGISTRY, register

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "register_views",
    "REGISTRY",
    "register",
]

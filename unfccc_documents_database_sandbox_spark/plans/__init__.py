"""Registered query plans (SURVEY.md §2 operator inventory)."""

from __future__ import annotations

import importlib

_MODULES = (
    "relational",
    "windows",
    "functions",
    "llm",
    "dedup",
    "layout",
    "graph",
    "similarity",
    "textstats",
    "streaming",
    "multimodal",
    "sql_queries",
    "pysources",
    "training",
    "analytics",
    "sketches",
)


def load() -> None:
    """Import every plans module so @register side effects populate REGISTRY."""
    for mod in _MODULES:
        importlib.import_module(f"unfccc_documents_database_sandbox_spark.plans.{mod}")

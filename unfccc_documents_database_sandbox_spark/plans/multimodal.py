"""Multimodal-column queries (north star L5)."""

from __future__ import annotations

from unfccc_documents_database_sandbox_spark.catalog import load_table
from unfccc_documents_database_sandbox_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
)
from unfccc_documents_database_sandbox_spark.registry import register


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id AS media_id,
           'image' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha
    FROM documents
    """,
)
def multimodal_decode(spark, sf_dir):
    """L5 binary payload → mapInPandas decode. n_bytes/sha are true
    functions of the payload (oracle-checked); width/height come from the
    stubbed decoder so they're excluded from the checked projection."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return decode_media(media).select("media_id", "kind", "n_bytes", "sha")

"""Multimodal-column queries (north star L5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.catalog import load_table
from unfccc_documents_database_sandbox_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    extract_features,
    resize_media,
    sample_frames,
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


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id, text,
               1 + octet_length(encode(text)) % 4 AS n_frames
        FROM documents
    ),
    f AS (
        SELECT media_id, text,
               unnest(generate_series(0, n_frames - 1)) AS i
        FROM m
    )
    SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
           sha256(text || CAST(i AS VARCHAR)) AS frame_sha
    FROM f
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """L5 frame sampling: 1 media row → N frame rows through mapInPandas
    (UDTF shape). Frame count and ids are deterministic functions of the
    payload, so the full expansion has an exact SQL oracle."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media)


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id AS media_id, CAST(48 AS BIGINT) AS width,
           CAST(32 AS BIGINT) AS height,
           CAST(48 * 32 AS BIGINT) AS out_bytes
    FROM documents
    """,
)
def multimodal_resize(spark, sf_dir):
    """L5 resize: binary in → fixed-dimension binary out per Arrow batch.
    The payload bytes come from the stubbed resampler, so the checked
    projection is the shape contract (one row per media, exact output
    dimensions and byte count)."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    resized = resize_media(media, width=48, height=32)
    return resized.select(
        "media_id", "width", "height", F.length("payload").cast("long").alias("out_bytes")
    )


@register("multimodal_features_topk", oracle=None, tags=("rows-only",))
def multimodal_features_topk(spark, sf_dir):
    """L5→L3 composition: featurize media payloads (mapInPandas), then run
    the IVF similarity search unchanged on the feature column — media and
    embeddings meet in one pipeline."""
    from unfccc_documents_database_sandbox_spark.operators import similarity as S

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media, dim=16).withColumnRenamed(
        "media_id", "vec_id"
    ).withColumnRenamed("feature", "embedding")
    queries = feats.filter(F.col("vec_id") < 3)
    return S.brute_force_topk(feats, queries, k=3)

"""Multimodal columns (north star L5): opaque binary payloads + typed
metadata, with decode/feature-extract as Arrow-batched Python stages.

Design for 100 TB of media:
- the payload is an opaque BinaryType column; Spark never interprets it
  JVM-side, so scans prune it unless a stage actually reads it.
- decode/resize/frame-sample run in mapInPandas: one Arrow batch of
  payloads per Python call, library calls vectorized over the batch.
- image/audio libs are NOT in this container, so the decode body is a
  deterministic fake behind the same seam a real decoder would use
  (clearly marked); schema/partitioning/batch plumbing are real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sha", T.StringType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Project the corpus into media shape: text bytes as the opaque
    payload, typed metadata alongside (stands in for image/audio blobs)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """'Decode' each payload in Arrow batches. A real decoder (PIL/ffmpeg)
    plugs into the loop body; this deterministic fake derives dimensions
    from the content hash so tests are value-stable."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shas = [hashlib.sha256(p).hexdigest() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    # FAKE decode: real impl returns actual image dims
                    "width": [16 + int(s[:4], 16) % 1024 for s in shas],
                    "height": [16 + int(s[4:8], 16) % 1024 for s in shas],
                    "sha": shas,
                }
            )

    return media.mapInPandas(decode, DECODED_SCHEMA)

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


def documents_as_media(docs: DataFrame, parallel: bool = False) -> DataFrame:
    """Project the corpus into media shape: text bytes as the opaque
    payload, typed metadata alongside (stands in for image/audio blobs).

    ``parallel=True`` spreads the rows across the cores first — pass it
    when the consuming Arrow stage is genuinely CPU-heavy (a real
    PIL/ffmpeg decoder), because mapInPandas parallelism equals the
    partition count and a row-group-bound scan may hand it ONE partition.
    The default skips the exchange: the stub decode/frame/feature stages
    in this container do microseconds of work per row, so the repartition
    plus 32-task scheduling costs more than single-partition execution at
    any tested SF (bisected r05: spread was the whole 2× creep of
    multimodal_frame_sample, VERDICT r04 #4), and at production scale the
    scan is already row-group-parallel, making the exchange redundant."""
    from unfccc_documents_database_sandbox_spark.catalog import spread

    base = spread(docs) if parallel else docs
    return base.select(
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """'Resize' payloads to fixed dimensions in Arrow batches. A real
    implementation calls PIL/opencv per batch; the fake emits a
    deterministic width×height-byte payload derived from the content hash.
    The Spark shape is the real thing: binary in, binary out, schema'd."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                # FAKE resample: real impl decodes + interpolates pixels
                seed = hashlib.sha256(bytes(p)).digest()
                out.append((seed * (target // len(seed) + 1))[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return media.mapInPandas(resize, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame sampling (UDTF shape: 1 media row → N frame rows). The frame
    count is a deterministic function of payload size (stands in for
    duration); each 'frame' is identified by a content-derived sha so the
    whole expansion is SQL-oracle-checkable. A real implementation replaces
    the body with ffmpeg keyframe extraction — same schema, same fan-out."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(p)
                n_frames = 1 + len(payload) % 4
                for i in range(n_frames):
                    ids.append(int(mid))
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(payload + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha": shas}
            )

    return media.mapInPandas(frames, FRAMES_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """Payload → feature embedding (array<float>), the bridge from media to
    the similarity operators (ivf_topk / brute_force_topk run unchanged on
    the output). Fake featurizer: hash-seeded floats in [-1, 1); a real one
    batches payloads through a vision/audio model here."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for p in pdf["payload"]:
                digest = hashlib.sha256(bytes(p)).digest()
                raw = (digest * (dim * 2 // len(digest) + 1))[: dim * 2]
                vecs.append(
                    [
                        (int.from_bytes(raw[2 * i : 2 * i + 2], "big") / 32768.0)
                        - 1.0
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "feature": vecs}
            )

    return media.mapInPandas(feats, FEATURES_SCHEMA)


AUDIO_WINDOWS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_energy_windows(media: DataFrame, window: int = 64) -> DataFrame:
    """Audio-shaped stage: 'decode' each payload to PCM samples and emit
    one row per fixed-size window with its integer energy (sum of squared
    samples) — the framing every audio featurizer (VAD, loudness
    normalization, silence trimming) starts from. A real decoder
    (soundfile/ffmpeg) plugs into the sample extraction; this
    deterministic fake derives sample k of media m as
    ``(m*31 + k*17) % 256`` with one sample per payload byte, so the
    whole expansion is an exact integer function both engines can
    compute (no audio libs in this container — the Spark plumbing is
    the real thing: binary in, numpy-vectorized window reduction per
    Arrow batch, windows out).

    Scale: one Python stage, no shuffle — windows are computed inside
    the batch that already holds the payload; the downstream top-k/agg
    is JVM-side. 100 TB of audio shards by file exactly like the
    image/video paths."""
    import numpy as np

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, energy = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n = len(p)
                if n == 0:
                    continue
                k = np.arange(n, dtype=np.int64)
                # FAKE decode: real impl reads PCM frames from the payload
                samples = (int(mid) * 31 + k * 17) % 256
                starts = np.arange(0, n, window)
                e = np.add.reduceat(samples * samples, starts)
                ids.extend([int(mid)] * len(starts))
                widx.extend(range(len(starts)))
                energy.extend(int(x) for x in e)
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "window_idx": pd.Series(widx, dtype="int64"),
                 "energy": pd.Series(energy, dtype="int64")}
            )

    return media.select("media_id", "payload").mapInPandas(
        windows, AUDIO_WINDOWS_SCHEMA
    )

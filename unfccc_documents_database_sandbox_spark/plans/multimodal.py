"""Multimodal-column queries (north star L5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.catalog import load_table, pin
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
    WITH m AS (
        SELECT doc_id AS media_id,
               8 + octet_length(encode(text)) % 9 AS sw,
               8 + octet_length(encode(text)) % 7 AS sh
        FROM documents
    )
    SELECT media_id,
           'image/pgm' AS kind,
           CAST(3 + length(CAST(sw AS VARCHAR)) + 1
                  + length(CAST(sh AS VARCHAR)) + 5
                  + sw * sh AS BIGINT) AS n_bytes,
           CAST(sw AS BIGINT) AS width,
           CAST(sh AS BIGINT) AS height,
           CAST(list_sum(list_transform(range(0, sw * sh),
                i -> (media_id * 7 + i * 13) % 256)) AS BIGINT) AS raster_sum
    FROM m
    """,
)
def multimodal_decode(spark, sf_dir):
    """L5 binary payload → content-sniffing decode, fully REAL as of r15
    (X208): the corpus is encoded as genuine binary PGM images, and
    decode_media parses the container back — kind from the magic bytes,
    width/height from the PGM header, raster_sum from the actual decoded
    pixels. Every checked column is now an exact function the oracle
    recomputes, including the container byte count (ASCII header length
    + raster size); the pre-r15 version could only check n_bytes/sha
    because its dims came from a hash-derived stub."""
    from unfccc_documents_database_sandbox_spark.operators.multimodal import (
        documents_as_pgm_media,
    )

    media = documents_as_pgm_media(
        documents_as_media(load_table(spark, sf_dir, "documents"))
    )
    return decode_media(media).select(
        "media_id", "kind", "n_bytes", "width", "height", "raster_sum"
    )


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
    WITH m AS (
        SELECT doc_id AS media_id,
               8 + octet_length(encode(text)) % 9 AS sw,
               8 + octet_length(encode(text)) % 7 AS sh
        FROM documents
    )
    SELECT media_id, CAST(48 AS BIGINT) AS width,
           CAST(32 AS BIGINT) AS height,
           CAST(48 * 32 AS BIGINT) AS out_bytes,
           CAST(list_sum(list_transform(range(0, 48 * 32), j ->
               (media_id * 7
                + ((((j // 48) * sh) // 32) * sw + (((j % 48) * sw) // 48)) * 13
               ) % 256)) AS BIGINT) AS pix_sum
    FROM m
    """,
)
def multimodal_resize(spark, sf_dir):
    """L5 resize over REAL image bytes (r15, VERDICT r14 #7): each doc is
    encoded as a genuine binary PGM (P5) whose raster is the documented
    integer pixel function, then resize_media parses the PGM bytes back
    (pure-bytes netpbm parser — the seam a PIL/opencv decoder plugs into)
    and nearest-neighbor resamples to 48×32 with one numpy fancy-index
    per image. The checked projection now includes pix_sum — the integer
    digest of the ACTUAL resized raster — so the oracle verifies the
    decoded + resampled pixel values, not just the shape contract."""
    from unfccc_documents_database_sandbox_spark.operators.multimodal import (
        documents_as_pgm_media,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    resized = resize_media(documents_as_pgm_media(media), width=48, height=32)
    return resized.select(
        "media_id", "width", "height",
        F.length("payload").cast("long").alias("out_bytes"), "pix_sum",
    )


# the stub featurizer is sha256(payload) bytes read as 16 big-endian uint16s
# scaled to [-1, 1): hex-pair arithmetic reproduces it exactly in SQL. Every
# value is a dyadic rational (k/2^15), so the float32 feature cast and the
# float64 oracle math agree bit-for-bit.
_HEXP = "(strpos('0123456789abcdef', substr(sha256(text), 4*i + {off}, 1)) - 1)"
_FEATURE_VEC_SQL = (
    "list_transform(range(0, 16), i -> ("
    + _HEXP.format(off=1) + " * 4096 + "
    + _HEXP.format(off=2) + " * 256 + "
    + _HEXP.format(off=3) + " * 16 + "
    + _HEXP.format(off=4)
    + ") / 32768.0 - 1.0)"
)


@register(
    "multimodal_features_topk",
    oracle=f"""
    WITH v AS (
        SELECT doc_id AS vec_id, {_FEATURE_VEC_SQL} AS vec FROM documents
    ),
    vn AS (
        SELECT vec_id, vec, sqrt(list_dot_product(vec, vec)) AS norm FROM v
    ),
    q AS (SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm
          FROM vn WHERE vec_id < 3),
    scored AS (
        SELECT q.query_id, vn.vec_id AS neighbor_id,
               list_dot_product(q.qvec, vn.vec) / (q.qnorm * vn.norm) AS cos
        FROM q JOIN vn ON vn.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank,
           ROUND(cos, 4) AS score
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def multimodal_features_topk(spark, sf_dir):
    """L5→L3 composition: featurize media payloads (mapInPandas), then run
    the exact similarity search unchanged on the feature column — media and
    embeddings meet in one pipeline. The stub featurizer is a deterministic
    function of the payload digest, so the whole composition has an exact
    SQL oracle (r03 upgrade from rows-only; the digest→uint16→[-1,1) map is
    restated in hex-digit arithmetic in the oracle)."""
    from unfccc_documents_database_sandbox_spark.operators import similarity as S

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media, dim=16).withColumnRenamed(
        "media_id", "vec_id"
    ).withColumnRenamed("feature", "embedding")
    queries = feats.filter(F.col("vec_id") < 3)
    return S.brute_force_topk(feats, queries, k=3)


@register(
    "multimodal_audio_energy",
    oracle="""
    WITH s AS (
        SELECT doc_id AS media_id,
               UNNEST(range(0, octet_length(encode(text)))) AS k
        FROM documents
    ),
    w AS (
        SELECT media_id, k // 64 AS window_idx,
               SUM(((media_id * 31 + k * 17) % 256)
                   * ((media_id * 31 + k * 17) % 256)) AS energy
        FROM s GROUP BY media_id, k // 64
    ),
    r AS (
        SELECT media_id, window_idx, energy,
               ROW_NUMBER() OVER (PARTITION BY media_id
                                  ORDER BY energy DESC, window_idx) AS rnk
        FROM w
    )
    SELECT media_id, CAST(window_idx AS BIGINT) AS window_idx,
           CAST(energy AS BIGINT) AS energy, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 2
    """,
)
def multimodal_audio_energy(spark, sf_dir):
    """L5 audio path over REAL audio bytes (r15, VERDICT r14 #7): each
    doc's documented PCM samples (sample k = (media_id*31+k*17)%256, one
    per payload byte) are packed into a genuine mono 8-bit WAV container
    by the stdlib ``wave`` writer, then audio_energy_windows parses the
    RIFF bytes back with the same library and emits fixed-size windows
    with integer energy (sum of squared samples) — top-2 loudest windows
    per media (loudness-normalization / VAD framing). The window
    expansion runs numpy-vectorized inside one Arrow stage with NO
    shuffle (the payload never leaves its batch); the per-media top-2 is
    a JVM window function over the tiny (media, window) table. Because
    8-bit WAV PCM stores unsigned bytes verbatim, the decoded samples
    equal the integer function and the pipeline stays hash-exact against
    the SQL replay — now through a real codec round-trip.

    Scale: energy framing is embarrassingly parallel per file; the only
    exchange is the rank over (media, ~n_bytes/64) rows — thousands of
    times smaller than the audio itself."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    from pyspark.sql import Window

    from unfccc_documents_database_sandbox_spark.operators.multimodal import (
        audio_energy_windows,
        documents_as_wav_media,
    )

    w = audio_energy_windows(documents_as_wav_media(media), window=64)
    rnk = Window.partitionBy("media_id").orderBy(
        F.col("energy").desc(), "window_idx"
    )
    return (
        w.withColumn("rnk", F.row_number().over(rnk))
        .filter(F.col("rnk") <= 2)
        .select("media_id", "window_idx", "energy",
                F.col("rnk").cast("long").alias("rnk"))
    )


# idx(j): nearest-neighbor 8x8 grid sample index into an sw x sh raster
_AHASH_IDX = "((((j // 8) * sh) // 8) * sw + ((j % 8) * sw) // 8)"
_AHASH_SAMP = (
    f"xor((base * 7 + {_AHASH_IDX} * 13) % 256,"
    f" CASE WHEN fl = 1 AND {_AHASH_IDX} < 3 THEN 1 ELSE 0 END)"
)


@register(
    "multimodal_image_dedup",
    oracle=f"""
    WITH m AS (
        SELECT doc_id AS media_id,
               8 + octet_length(encode(text)) % 9 AS sw,
               8 + octet_length(encode(text)) % 7 AS sh
        FROM documents
    ),
    g AS (
        SELECT media_id, media_id AS base, sw, sh, 0 AS fl FROM m
        UNION ALL
        SELECT media_id + 1000000, media_id, sw, sh, 1
        FROM m WHERE media_id % 40 = 0
    ),
    s AS (
        SELECT media_id,
               list_transform(range(0, 64), j -> {_AHASH_SAMP}) AS samp
        FROM g
    ),
    hsh AS (
        SELECT media_id,
               CAST(list_sum(list_transform(range(0, 32), j ->
                   CASE WHEN samp[j + 1] * 64 > list_sum(samp)
                        THEN CAST(1 AS BIGINT) << j ELSE 0 END))
                    AS BIGINT) AS hash_lo,
               CAST(list_sum(list_transform(range(32, 64), j ->
                   CASE WHEN samp[j + 1] * 64 > list_sum(samp)
                        THEN CAST(1 AS BIGINT) << (j - 32) ELSE 0 END))
                    AS BIGINT) AS hash_hi
        FROM s
    ),
    bands AS (
        SELECT media_id, hash_hi, hash_lo,
               unnest([hash_lo & 65535, (hash_lo >> 16) & 65535,
                       hash_hi & 65535, (hash_hi >> 16) & 65535]) AS bval,
               unnest([0, 1, 2, 3]) AS bidx
        FROM hsh
    ),
    cand AS (
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        FROM bands a JOIN bands b
          ON a.bidx = b.bidx AND a.bval = b.bval
         AND a.media_id < b.media_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(ha.hash_hi, hb.hash_hi))
              + bit_count(xor(ha.hash_lo, hb.hash_lo)) AS BIGINT)
               AS hamming
    FROM cand c
    JOIN hsh ha ON ha.media_id = c.id_a
    JOIN hsh hb ON hb.media_id = c.id_b
    WHERE bit_count(xor(ha.hash_hi, hb.hash_hi))
        + bit_count(xor(ha.hash_lo, hb.hash_lo)) <= 3
    """,
)
def multimodal_image_dedup(spark, sf_dir):
    """L5 x L2 crossover (r15 third wave): PERCEPTUAL image dedup over
    the real PGM corpus — average-hash (the published aHash: 8x8
    nearest-neighbor grid, bit j = sample_j*64 > sum, division-free
    strict mean test) computed from the ACTUAL decoded pixels in one
    numpy pass per image (operators/multimodal.image_ahash), packed as
    two 32-bit halves so the int64 sign bit never matters. Near-dup
    pairs surface via 4 x 16-bit band buckets (the simhash banding
    discipline): Hamming <= 3 pairs ALWAYS share an intact band
    (pigeonhole, 3 < 4 bands), so banding is recall-lossless for the
    verified threshold, and the exact Hamming check (xor + bit_count,
    JVM-side) prunes the rest.

    Planted twins (perturb_pgm: low bit of the first three pixels
    flipped on doc_id %% 40 == 0 images — the re-encode/minor-edit case
    pHashing exists for) must land as pairs; honest image pairs surface
    only if their rasters genuinely collide within the threshold —
    either way both engines derive the identical pair set, because the
    oracle restates raster, grid, hash, bands, and Hamming from the
    generative pixel formula (the X208 discipline; the Spark side
    parses REAL bytes).

    Scale shape: hashing is scan-speed Arrow batches; the only shuffle
    is the band-keyed equi-join (4 rows per image, 16-bit keys);
    candidate volume is governed by band width exactly like MinHash-LSH
    — no all-pairs anywhere."""
    from unfccc_documents_database_sandbox_spark.operators.multimodal import (
        documents_as_pgm_media,
        image_ahash,
        perturb_pgm,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_pgm_media(documents_as_media(docs))
    twins = perturb_pgm(media.filter(F.col("media_id") % 40 == 0))
    # the hash table feeds the band explode AND both verify sides — pin
    hashed = image_ahash(media.unionByName(twins)).transform(pin)
    bands = hashed.select(
        "media_id",
        F.explode(
            F.arrays_zip(
                F.array(F.lit(0), F.lit(1), F.lit(2), F.lit(3)).alias(
                    "bidx"
                ),
                F.array(
                    F.expr("hash_lo & 65535"),
                    F.expr("(hash_lo >> 16) & 65535"),
                    F.expr("hash_hi & 65535"),
                    F.expr("(hash_hi >> 16) & 65535"),
                ).alias("bval"),
            )
        ).alias("z"),
    ).select("media_id", F.col("z.bidx").alias("bidx"),
             F.col("z.bval").alias("bval"))
    a = bands.select(F.col("media_id").alias("id_a"), "bidx", "bval")
    b = bands.select(F.col("media_id").alias("id_b"), "bidx", "bval")
    cand = (
        a.join(b, ["bidx", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ha = hashed.select(F.col("media_id").alias("id_a"),
                       F.col("hash_hi").alias("hi_a"),
                       F.col("hash_lo").alias("lo_a"))
    hb = hashed.select(F.col("media_id").alias("id_b"),
                       F.col("hash_hi").alias("hi_b"),
                       F.col("hash_lo").alias("lo_b"))
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn(
            "hamming",
            (F.bit_count(F.expr("hi_a ^ hi_b"))
             + F.bit_count(F.expr("lo_a ^ lo_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )


_AFP_S = "(base * 31 + k * 17) % 256"
_AFP_SAMP = (
    f"CASE WHEN fl = 1 AND k < 3 THEN xor({_AFP_S}, 1) ELSE {_AFP_S} END"
)


@register(
    "multimodal_audio_dedup",
    oracle=f"""
    WITH m AS (
        SELECT doc_id AS media_id, octet_length(encode(text)) AS n
        FROM documents
    ),
    g AS (
        SELECT media_id, media_id AS base, n, 0 AS fl FROM m
        UNION ALL
        SELECT media_id + 1000000, media_id, n, 1
        FROM m WHERE media_id % 40 = 0
    ),
    e AS (
        SELECT media_id,
               list_transform(range(0, 32), j ->
                   COALESCE(list_sum(list_transform(
                       range((j * n) // 32, ((j + 1) * n) // 32),
                       k -> CAST({_AFP_SAMP} AS BIGINT)
                            * CAST({_AFP_SAMP} AS BIGINT))), 0)) AS env
        FROM g
    ),
    h AS (
        SELECT media_id,
               CAST(list_sum(list_transform(range(0, 32), j ->
                   CASE WHEN env[j + 1] * 32 > list_sum(env)
                        THEN CAST(1 AS BIGINT) << j ELSE 0 END))
                    AS BIGINT) AS fp
        FROM e
    ),
    bands AS (
        SELECT media_id, fp,
               unnest([fp & 65535, (fp >> 16) & 65535]) AS bval,
               unnest([0, 1]) AS bidx
        FROM h
    ),
    cand AS (
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        FROM bands a JOIN bands b
          ON a.bidx = b.bidx AND a.bval = b.bval
         AND a.media_id < b.media_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(ha.fp, hb.fp)) AS BIGINT) AS hamming
    FROM cand c
    JOIN h ha ON ha.media_id = c.id_a
    JOIN h hb ON hb.media_id = c.id_b
    WHERE bit_count(xor(ha.fp, hb.fp)) <= 1
    """,
)
def multimodal_audio_dedup(spark, sf_dir):
    """L5 x L2, audio leg (r15 third wave — X222's WAV sibling):
    energy-envelope fingerprint dedup over the REAL RIFF corpus. Each
    payload's decoded PCM samples grid into 32 equal spans (empty spans
    are exact zeros via a cumsum difference), bit j = span energy * 32 >
    total energy, one BIGINT fingerprint — the shape every audio
    near-dup system (echoprint/chromaprint) reduces to, minus the FFT a
    sandbox without scipy honestly stubs. Near-dup pairs via 2 x 16-bit
    band buckets: Hamming <= 1 ALWAYS shares an intact band
    (pigeonhole), so banding is recall-lossless at the verified
    threshold; exact xor + bit_count prunes the rest JVM-side.

    Planted perturb_wav twins (low bit of the first three samples
    flipped, doc_id %% 40 == 0) all land at Hamming 0 on this corpus —
    the envelope test is deliberately robust to sample-level dither,
    which is the fingerprint's entire point. The oracle restates
    signal, spans, fingerprint, bands, and Hamming from the generative
    sample formula (X208 discipline); Spark parses real bytes.

    Scale shape: fingerprinting is scan-speed Arrow batches; the only
    shuffle is the band-keyed equi-join (2 rows per media, 16-bit
    keys); measured collision structure at sf0.01 is 494 distinct
    fingerprints over 500 media — candidate volume stays linear."""
    from unfccc_documents_database_sandbox_spark.operators.multimodal import (
        audio_fingerprint,
        documents_as_wav_media,
        perturb_wav,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_wav_media(documents_as_media(docs))
    twins = perturb_wav(media.filter(F.col("media_id") % 40 == 0))
    hashed = audio_fingerprint(media.unionByName(twins)).transform(pin)
    bands = hashed.select(
        "media_id",
        F.explode(
            F.arrays_zip(
                F.array(F.lit(0), F.lit(1)).alias("bidx"),
                F.array(
                    F.expr("fp & 65535"), F.expr("(fp >> 16) & 65535")
                ).alias("bval"),
            )
        ).alias("z"),
    ).select("media_id", F.col("z.bidx").alias("bidx"),
             F.col("z.bval").alias("bval"))
    a = bands.select(F.col("media_id").alias("id_a"), "bidx", "bval")
    b = bands.select(F.col("media_id").alias("id_b"), "bidx", "bval")
    cand = (
        a.join(b, ["bidx", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ha = hashed.select(F.col("media_id").alias("id_a"),
                       F.col("fp").alias("fp_a"))
    hb = hashed.select(F.col("media_id").alias("id_b"),
                       F.col("fp").alias("fp_b"))
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn(
            "hamming",
            F.bit_count(F.expr("fp_a ^ fp_b")).cast("long"),
        )
        .filter(F.col("hamming") <= 1)
        .select("id_a", "id_b", "hamming")
    )


# --- pHash image dedup (r16, VERDICT r15 #8) — the frequency-domain
# sibling of multimodal_image_dedup. The 16x16 sample index and the
# gamma-curved sample formula are restated generatively (the X208
# discipline); the pinned integer DCT basis is shared verbatim with
# the numpy operator via phash_cos_table(). ---

def _phash_oracle() -> str:
    from unfccc_documents_database_sandbox_spark.operators.multimodal import (
        phash_cos_table,
    )

    c16 = "[" + ", ".join(str(v) for v in phash_cos_table()) + "]"
    idx16 = "((((j // 16) * sh) // 16) * sw + ((j % 16) * sw) // 16)"
    s_base = f"((base * 7 + {idx16} * 13) % 256)"
    samp = (f"CASE WHEN fl = 1 THEN ({s_base} * {s_base}) // 255 "
            f"ELSE {s_base} END")
    # the DCT is SEPARABLE (row pass t1, then column pass f) with the
    # basis hoisted into a one-row CTE — the inlined-literal-per-term
    # form re-built the 256-element list inside every lambda call and
    # cost ~100x (the r15 sim_topk_ivf_portable lesson, DuckDB edition)
    return f"""
    WITH c AS (SELECT {c16} AS t),
    m AS (
        SELECT doc_id AS media_id,
               8 + octet_length(encode(text)) % 9 AS sw,
               8 + octet_length(encode(text)) % 7 AS sh
        FROM documents
    ),
    g AS (
        SELECT media_id, media_id AS base, sw, sh, 0 AS fl FROM m
        UNION ALL
        SELECT media_id + 1000000, media_id, sw, sh, 1
        FROM m WHERE media_id % 40 = 0
    ),
    s AS (
        SELECT media_id,
               list_transform(range(0, 256), j -> {samp}) AS samp
        FROM g
    ),
    t1 AS (
        SELECT media_id,
               list_transform(range(0, 128), uc ->
                   list_sum(list_transform(range(0, 16), r ->
                       c.t[(uc // 16) * 16 + r + 1]
                       * samp[r * 16 + (uc % 16) + 1]))) AS t1
        FROM s, c
    ),
    fc AS (
        SELECT media_id,
               list_transform(range(0, 64), uv ->
                   list_sum(list_transform(range(0, 16), k ->
                       c.t[(uv % 8) * 16 + k + 1]
                       * t1[(uv // 8) * 16 + k + 1]))) AS f
        FROM t1, c
    ),
    hsh AS (
        SELECT media_id,
               CAST(list_sum(list_transform(range(1, 32), j ->
                   CASE WHEN f[j + 1] * 63 > list_sum(f) - f[1]
                        THEN CAST(1 AS BIGINT) << j ELSE 0 END))
                    AS BIGINT) AS hash_lo,
               CAST(list_sum(list_transform(range(32, 64), j ->
                   CASE WHEN f[j + 1] * 63 > list_sum(f) - f[1]
                        THEN CAST(1 AS BIGINT) << (j - 32) ELSE 0 END))
                    AS BIGINT) AS hash_hi
        FROM fc
    ),
    bands AS (
        SELECT media_id, hash_hi, hash_lo,
               unnest([hash_lo & 255, (hash_lo >> 8) & 255,
                       (hash_lo >> 16) & 255, (hash_lo >> 24) & 255,
                       hash_hi & 255, (hash_hi >> 8) & 255,
                       (hash_hi >> 16) & 255, (hash_hi >> 24) & 255])
                   AS bval,
               unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS bidx
        FROM hsh
    ),
    cand AS (
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        FROM bands a JOIN bands b
          ON a.bidx = b.bidx AND a.bval = b.bval
         AND a.media_id < b.media_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(ha.hash_hi, hb.hash_hi))
              + bit_count(xor(ha.hash_lo, hb.hash_lo)) AS BIGINT)
               AS hamming
    FROM cand c
    JOIN hsh ha ON ha.media_id = c.id_a
    JOIN hsh hb ON hb.media_id = c.id_b
    WHERE bit_count(xor(ha.hash_hi, hb.hash_hi))
        + bit_count(xor(ha.hash_lo, hb.hash_lo)) <= 6
    """


@register("multimodal_image_phash", oracle=_phash_oracle())
def multimodal_image_phash(spark, sf_dir):
    """pHash perceptual image dedup (r16, VERDICT r15 #8): the
    frequency-domain hash over the SAME real PGM corpus as the aHash
    key — 16x16 nearest-neighbor sample, integer 2-D DCT-II (pinned
    fixed-point cosine table), LOW-FREQUENCY top-left 8x8 block,
    division-free mean test over the 63 non-DC coefficients (the DC/
    brightness bucket is deliberately bit 0 = always 0). Twins here are
    GAMMA-CURVED copies (perturb_pgm_gamma: p' = p*p // 255 on every
    pixel — the tone-curve re-encode case), which flip several of
    aHash's spatial mean-test bits while moving the low-frequency sign
    structure much less. The superiority claim is MATCHED-PRECISION
    recall, machine-pinned in tests/test_multimodal.py on the
    deterministic corpus: pHash's non-dup distance floor is ~11x
    sparser than aHash's (29 vs 322 honest pairs at radius 6 at
    sf0.01), so at radius 6 pHash recalls 10/13 gamma twins for 29
    false pairs while aHash recalls 0-3/13 at ANY radius with a false-
    pair budget up to 4x larger — the twins aHash provably misses.

    Near-dup pairs surface via 8 x 8-bit band buckets: Hamming <= 6
    pairs ALWAYS share an intact band (pigeonhole, 6 < 8 bands), so
    banding is recall-lossless at the verified threshold; the exact
    Hamming check (xor + bit_count, JVM-side) prunes the rest. The
    oracle restates raster, gamma curve, 16-grid, the SHARED integer
    DCT table, bands, and Hamming from the generative pixel formula.

    Scale shape: hashing is scan-speed Arrow batches (one 16x16
    integer matmul pair per image); the only shuffle is the band-keyed
    equi-join (8 rows per image). 8-bit band keys saturate sooner than
    the aHash key's 16-bit bands — at billion-image scale the standard
    fix is compound band keys (two 8-bit bands per bucket, Hamming <=
    2 per band pair), the same widening MinHash-LSH applies; at this
    threshold-6 radius that trade is inherent to pHash, not this
    implementation."""
    from unfccc_documents_database_sandbox_spark.operators.multimodal import (
        documents_as_pgm_media,
        image_phash,
        perturb_pgm_gamma,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_pgm_media(documents_as_media(docs))
    twins = perturb_pgm_gamma(media.filter(F.col("media_id") % 40 == 0))
    # the hash table feeds the band explode AND both verify sides — pin
    hashed = image_phash(media.unionByName(twins)).transform(pin)
    bands = hashed.select(
        "media_id",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(i) for i in range(8)]).alias("bidx"),
                F.array(
                    F.expr("hash_lo & 255"),
                    F.expr("(hash_lo >> 8) & 255"),
                    F.expr("(hash_lo >> 16) & 255"),
                    F.expr("(hash_lo >> 24) & 255"),
                    F.expr("hash_hi & 255"),
                    F.expr("(hash_hi >> 8) & 255"),
                    F.expr("(hash_hi >> 16) & 255"),
                    F.expr("(hash_hi >> 24) & 255"),
                ).alias("bval"),
            )
        ).alias("z"),
    ).select("media_id", F.col("z.bidx").alias("bidx"),
             F.col("z.bval").alias("bval"))
    a = bands.select(F.col("media_id").alias("id_a"), "bidx", "bval")
    b = bands.select(F.col("media_id").alias("id_b"), "bidx", "bval")
    cand = (
        a.join(b, ["bidx", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ha = hashed.select(F.col("media_id").alias("id_a"),
                       F.col("hash_hi").alias("hi_a"),
                       F.col("hash_lo").alias("lo_a"))
    hb = hashed.select(F.col("media_id").alias("id_b"),
                       F.col("hash_hi").alias("hi_b"),
                       F.col("hash_lo").alias("lo_b"))
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn(
            "hamming",
            (F.bit_count(F.expr("hi_a ^ hi_b"))
             + F.bit_count(F.expr("lo_a ^ lo_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
    )

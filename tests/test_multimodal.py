"""Unit tests for the real-bytes media codecs (r15, VERDICT r14 #7).

These run without Spark: the PGM (netpbm P5) and WAV (stdlib ``wave``)
codecs are pure functions, so round-trip and resample invariants are
property-testable directly. The Spark-side wiring (mapInPandas stages,
oracle parity) is covered by tests/test_parity.py on the
multimodal_resize / multimodal_audio_energy keys and the plan-shape
assertions in tests/test_scale.py.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from unfccc_documents_database_sandbox_spark.operators.multimodal import (
    decode_wav,
    encode_pgm,
    encode_wav,
    parse_pgm,
)


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    data=st.data(),
)
@settings(max_examples=50, deadline=None)
def test_pgm_roundtrip(w, h, data):
    raster = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h, max_size=w * h
            )
        )
    )
    pw, ph, praster = parse_pgm(encode_pgm(w, h, raster))
    assert (pw, ph, praster) == (w, h, raster)


def test_pgm_parser_honors_comments_and_multidigit_dims():
    raster = bytes(range(200)) * 6  # 1200 bytes = 40 * 30
    payload = b"P5\n# a netpbm comment line\n40 30\n255\n" + raster[:1200]
    w, h, r = parse_pgm(payload)
    assert (w, h) == (40, 30) and r == raster[:1200]


def test_pgm_parser_rejects_bad_payloads():
    import pytest

    with pytest.raises(ValueError):
        parse_pgm(b"P6\n2 2\n255\n" + b"\x00" * 12)  # P6 = color PPM
    with pytest.raises(ValueError):
        parse_pgm(b"P5\n4 4\n255\n" + b"\x00" * 7)  # truncated raster
    with pytest.raises(ValueError):
        parse_pgm(b"P5\n2 2\n65535\n" + b"\x00" * 8)  # 16-bit maxval
    with pytest.raises(ValueError):
        encode_pgm(3, 3, b"\x00" * 8)  # raster/dims mismatch


@given(st.binary(min_size=0, max_size=4096))
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip(samples):
    assert decode_wav(encode_wav(samples)) == samples


def test_wav_is_a_real_riff_container():
    payload = encode_wav(bytes(range(256)))
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    # 44-byte canonical PCM header + the raw samples
    assert payload[-256:] == bytes(range(256))


def test_wav_decode_rejects_wrong_shape():
    import io
    import wave

    import pytest

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)  # stereo — the engine's contract is mono 8-bit
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_wav(buf.getvalue())


def test_nearest_neighbor_resample_matches_oracle_formula():
    """resize_media's fancy-index must equal the oracle's per-pixel
    formula out(y, x) = src((y*sh)//H, (x*sw)//W) — checked here on the
    raw numpy expression with the same integer pixel function."""
    sw, sh, W, H = 13, 9, 48, 32
    mid = 7
    src = ((mid * 7 + np.arange(sw * sh, dtype=np.int64) * 13) % 256).reshape(
        sh, sw
    )
    xs, ys = np.arange(W, dtype=np.int64), np.arange(H, dtype=np.int64)
    out = src[(ys * sh // H)[:, None], (xs * sw // W)[None, :]]
    expected = np.array(
        [
            [src[(y * sh) // H, (x * sw) // W] for x in range(W)]
            for y in range(H)
        ]
    )
    assert (out == expected).all()
    pix_sum = sum(
        (mid * 7 + ((((j // W) * sh) // H) * sw + ((j % W) * sw) // W) * 13)
        % 256
        for j in range(W * H)
    )
    assert int(out.sum()) == pix_sum


def test_decode_media_sniffs_containers(spark):
    """decode_media dispatches on magic bytes: PGM payloads get real
    header dims + pixel sums, WAV payloads get sample counts, unknown
    payloads fall back to the opaque hash-stub with NULL raster_sum."""
    from unfccc_documents_database_sandbox_spark.operators.multimodal import (
        decode_media,
        encode_pgm,
        encode_wav,
    )

    pgm = encode_pgm(3, 2, bytes([1, 2, 3, 4, 5, 6]))
    wav = encode_wav(bytes([10, 20, 30, 40]))
    rows = [(1, pgm), (2, wav), (3, b"plain text payload")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in decode_media(df).collect()}

    r = out[1]
    assert (r.kind, r.width, r.height) == ("image/pgm", 3, 2)
    assert r.raster_sum == 21 and r.n_bytes == len(pgm)
    r = out[2]
    assert (r.kind, r.width, r.height) == ("audio/wav", 4, 1)
    assert r.raster_sum == 100 and r.n_bytes == len(wav)
    r = out[3]
    assert r.kind == "opaque" and r.raster_sum is None
    assert r.n_bytes == len(b"plain text payload")


def test_decode_media_degrades_malformed_containers_to_opaque(spark):
    """r15 review: payloads that merely LOOK like a container must fall
    back to the opaque branch instead of failing the whole Arrow task —
    truncated PGM, text starting with RIFF, stereo WAV."""
    import io
    import wave

    from unfccc_documents_database_sandbox_spark.operators.multimodal import (
        decode_media,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00" * 32)
    rows = [
        (1, b"P5\n4 4\n255\n\x00\x01"),       # truncated raster
        (2, b"RIFF raffle results: ..."),      # text that sniffs as RIFF
        (3, buf.getvalue()),                   # real WAV, wrong shape
        (4, b"P5 but not really a header"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in decode_media(df).collect()}
    assert len(out) == 4
    for i in (1, 2, 3, 4):
        assert out[i].kind == "opaque", (i, out[i].kind)
        assert out[i].raster_sum is None
        assert out[i].n_bytes == len(rows[i - 1][1])


def test_image_dedup_catches_every_planted_twin(spark):
    """X222: each perturb_pgm twin pairs with its base within the
    verified Hamming threshold, and every reported pair is <= 3."""
    from tests.conftest import SF_CORRECT
    from unfccc_documents_database_sandbox_spark.catalog import load_table
    from unfccc_documents_database_sandbox_spark.plans.multimodal import (
        multimodal_image_dedup,
    )
    from pyspark.sql import functions as F

    rows = multimodal_image_dedup(spark, SF_CORRECT).collect()
    assert rows and all(r["hamming"] <= 3 for r in rows)
    twins = {(r["id_a"], r["id_b"]) for r in rows
             if r["id_b"] == r["id_a"] + 1_000_000}
    planted = {
        int(r["doc_id"])
        for r in load_table(spark, SF_CORRECT, "documents")
        .filter(F.col("doc_id") % 40 == 0).collect()
    }
    assert {a for a, _b in twins} == planted


def test_audio_dedup_catches_every_planted_twin(spark):
    """X223: every perturb_wav twin pairs with its base (Hamming 0 on
    this corpus), and all reported pairs sit within the threshold."""
    from tests.conftest import SF_CORRECT
    from unfccc_documents_database_sandbox_spark.catalog import load_table
    from unfccc_documents_database_sandbox_spark.plans.multimodal import (
        multimodal_audio_dedup,
    )
    from pyspark.sql import functions as F

    rows = multimodal_audio_dedup(spark, SF_CORRECT).collect()
    assert rows and all(r["hamming"] <= 1 for r in rows)
    twin_bases = {r["id_a"] for r in rows
                  if r["id_b"] == r["id_a"] + 1_000_000 and r["hamming"] == 0}
    planted = {
        int(r["doc_id"])
        for r in load_table(spark, SF_CORRECT, "documents")
        .filter(F.col("doc_id") % 40 == 0).collect()
    }
    assert twin_bases == planted


def test_phash_beats_ahash_at_matched_precision(spark):
    """r16 (VERDICT r15 #8): the pHash superiority claim, pinned as a
    MATCHED-PRECISION comparison on the deterministic corpus. Gamma
    twins (p' = p*p // 255) are the tone-curve edit aHash is weak to:

    - pHash's non-dup distance floor is much sparser, so at radius 6 it
      pays few false pairs while recalling most twins;
    - aHash cannot reach HALF of pHash's twin recall at ANY radius
      whose false-pair cost stays within 4x of pHash's.

    Everything is an exact integer function of the corpus, so the
    counts are stable — the assertions pin the relationship, not just
    'it worked once'."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from tests.conftest import SF_CORRECT
    from unfccc_documents_database_sandbox_spark.catalog import load_table
    from unfccc_documents_database_sandbox_spark.operators.multimodal import (
        documents_as_media,
        documents_as_pgm_media,
        image_ahash,
        image_phash,
        perturb_pgm_gamma,
    )
    from unfccc_documents_database_sandbox_spark.plans.multimodal import (
        multimodal_image_phash,
    )

    docs = load_table(spark, SF_CORRECT, "documents")
    media = documents_as_pgm_media(documents_as_media(docs))
    twins = perturb_pgm_gamma(media.filter(F.col("media_id") % 40 == 0))
    both = media.unionByName(twins)
    ph = {r.media_id: (r.hash_hi, r.hash_lo) for r in image_phash(both).collect()}
    ah = {r.media_id: (r.hash_hi, r.hash_lo) for r in image_ahash(both).collect()}

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    planted = sorted(m for m in ph if m < 1_000_000 and m % 40 == 0)
    base = sorted(m for m in ph if m < 1_000_000)
    twin_ph = [ham(ph[m], ph[m + 1_000_000]) for m in planted]
    twin_ah = [ham(ah[m], ah[m + 1_000_000]) for m in planted]

    # false-pair cost by radius, over all non-twin base pairs
    def false_counts(H):
        by_r = [0] * 65
        for a, b in combinations(base, 2):
            by_r[ham(H[a], H[b])] += 1
        # cumulative: pairs at <= r
        for r in range(1, 65):
            by_r[r] += by_r[r - 1]
        return by_r

    fp_ph, fp_ah = false_counts(ph), false_counts(ah)
    R = 6  # the registered key's radius
    recall_ph = sum(1 for d in twin_ph if d <= R)
    budget = 4 * max(fp_ph[R], 1)
    best_ah = max(
        (sum(1 for d in twin_ah if d <= r) for r in range(65)
         if fp_ah[r] <= budget),
        default=0,
    )
    # pHash recalls most twins at its radius; aHash cannot reach half
    # of that recall inside 4x pHash's false-pair budget
    assert recall_ph >= (3 * len(planted)) // 4 - 1, (recall_ph, twin_ph)
    assert best_ah * 2 < recall_ph, (best_ah, recall_ph, fp_ah[:10], fp_ph[:10])

    # and the registered key surfaces exactly the pHash-radius twins
    rows = multimodal_image_phash(spark, SF_CORRECT).collect()
    assert all(r["hamming"] <= R for r in rows)
    found = {r["id_a"] for r in rows if r["id_b"] == r["id_a"] + 1_000_000}
    assert found == {m for m, d in zip(planted, twin_ph) if d <= R}

"""Language-ID gate tests (r15, VERDICT r14 #8): the pure-Python twin of
the JVM scorer, the planted flag-flips, and the Spark/Python agreement
on real rows. Oracle parity runs in tests/test_parity.py."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from unfccc_documents_database_sandbox_spark.functions import langid as L


def test_profiles_are_pinned_and_integer():
    assert set(L.PROFILES) == set(L.LANGS) == {"en", "es", "fr"}
    for lang in L.LANGS:
        assert len(L.PROFILES[lang]) == L.PROFILE_SIZE
        assert all(
            isinstance(c, int) and c > 0 for c in L.PROFILES[lang].values()
        )
        assert isinstance(L.OOV_COST[lang], int)
        # OOV (zero-count Laplace) must dominate every seen bigram cost
        assert L.OOV_COST[lang] > max(L.PROFILES[lang].values())


def test_planted_docs_flip_the_keep_flag():
    """Three planted docs claim their true language, three claim a wrong
    one — the gate must keep exactly the first three."""
    for i, (doc_id, claimed, text) in enumerate(L.PLANTED_DOCS):
        pred = L.predict(text)
        keep = int(pred == claimed)
        assert keep == (1 if i < 3 else 0), (doc_id, claimed, pred)


def test_wrong_lang_planted_docs_still_classify_correctly():
    """The keep=0 docs are dropped because the PREDICTION is right and
    the claim is wrong — not because the scorer is confused."""
    truth = {9000004: "es", 9000005: "en", 9000006: "fr"}
    for doc_id, _claimed, text in L.PLANTED_DOCS[3:]:
        assert L.predict(text) == truth[doc_id]


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz -.,'", max_size=200))
@settings(max_examples=50, deadline=None)
def test_score_is_total_and_positive(text):
    """Any input scores under every profile (OOV fallback), and the cost
    is monotone in length: more bigrams can only add cost."""
    for lang in L.LANGS:
        c = L.score(text, lang)
        assert c >= 0
        assert L.score(text + " the", lang) > c


def test_spark_scorer_matches_python_twin(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    texts = [t for _, _, t in L.PLANTED_DOCS] + [
        "key agg row scan slow fast table value part hash",
        "",
        "A!!B??C",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    s = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " ")),
        F.lit(" "),
    )
    out = (
        df.withColumn("s", s)
        .select(
            "doc_id",
            *[L.spark_cost_column(g).alias(f"cost_{g}") for g in L.LANGS],
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, t in enumerate(texts):
        for lang in L.LANGS:
            assert out.loc[i, f"cost_{lang}"] == L.score(t, lang), (i, lang)

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


def test_arrow_costs_twin_is_bit_equal_to_the_fold(spark):
    """r16 (VERDICT r15 #4): the measured Arrow twin of the lang-ID
    fold. Measurement on this host at sf0.1 (2 runs each, steady):
    named_struct fold 0.45 s vs mapInPandas 1.28 s — the single-pass
    interpreted fold BEATS the Arrow hop for this workload (~400 grams
    x 3 map lookups per doc; the Python-side per-gram dict loop costs
    more than the interpreter overhead it removes), so the fold stays
    the registered path and this twin pins the equivalence that makes
    the measurement re-runnable."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_CORRECT
    from unfccc_documents_database_sandbox_spark.catalog import load_table
    from unfccc_documents_database_sandbox_spark.functions import langid as L

    docs = load_table(spark, SF_CORRECT, "documents").select(
        "doc_id", "lang", "text"
    )
    planted = spark.createDataFrame(
        list(L.PLANTED_DOCS), "doc_id long, lang string, text string"
    )
    u = docs.unionByName(planted)
    s = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " ")),
        F.lit(" "),
    )
    fold = {
        r.doc_id: (r.cost_en, r.cost_es, r.cost_fr)
        for r in u.withColumn("s", s)
        .withColumn("c", L.spark_cost_struct())
        .select(
            "doc_id",
            *[F.col(f"c.{lang}").alias(f"cost_{lang}") for lang in L.LANGS],
        )
        .collect()
    }
    arrow = {
        r.doc_id: (r.cost_en, r.cost_es, r.cost_fr)
        for r in L.arrow_costs(u).collect()
    }
    assert arrow == fold and len(fold) == u.count()


def test_score_costs_matches_the_fold_including_null_and_empty_text(spark):
    """ADVICE r17: score_costs (the registered explode-join scorer) is
    claimed bit-equal to the spark_cost_struct fold — this pins it over
    the corpus + planted docs PLUS the edge rows the explode could lose:
    NULL text (a plain explode would DROP the row; explode_outer keeps it
    with NULL costs, same as the fold) and empty text (one '  ' gram on
    both paths)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_CORRECT
    from unfccc_documents_database_sandbox_spark.catalog import load_table
    from unfccc_documents_database_sandbox_spark.functions import langid as L

    docs = load_table(spark, SF_CORRECT, "documents").select(
        "doc_id", "lang", "text"
    )
    planted = spark.createDataFrame(
        list(L.PLANTED_DOCS), "doc_id long, lang string, text string"
    )
    edges = spark.createDataFrame(
        [(90_000_001, "en", None), (90_000_002, "es", "")],
        "doc_id long, lang string, text string",
    )
    u = docs.unionByName(planted).unionByName(edges)
    s = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " ")),
        F.lit(" "),
    )
    fold = {
        r.doc_id: (r.lang, r.cost_en, r.cost_es, r.cost_fr)
        for r in u.withColumn("s", s)
        .withColumn("c", L.spark_cost_struct())
        .select(
            "doc_id", "lang",
            *[F.col(f"c.{lang}").alias(f"cost_{lang}") for lang in L.LANGS],
        )
        .collect()
    }
    ex = {
        r.doc_id: (r.lang, r.cost_en, r.cost_es, r.cost_fr)
        for r in L.score_costs(u).collect()
    }
    assert ex == fold and len(ex) == u.count()
    # the NULL-text row must SURVIVE with NULL costs on both paths
    assert ex[90_000_001] == ("en", None, None, None)

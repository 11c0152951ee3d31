"""Expectation-suite operator (operators/quality.py): ok-flag semantics
per op, violation counting, the one-scan plan shape, and the empty-check
refusal — the behaviors the oracle-checked quality_expectations key
can't isolate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.operators.quality import (
    completeness,
    expectation_report,
    max_at_most,
    min_at_least,
    no_violations,
    uniqueness,
)


def test_expectation_flags_pass_and_fail(spark):
    df = spark.createDataFrame(
        [(1, None, 5), (2, "b", 50), (2, "c", 500)],
        "id long, name string, v long",
    )
    rep = {
        r.check_name: (r.observed, r.expected, r.ok)
        for r in expectation_report(
            df,
            [
                completeness("name"),          # 2 of 3 -> fail
                completeness("v"),             # 3 of 3 -> pass
                uniqueness("id"),              # dup id=2 -> fail
                min_at_least(F.col("v"), "v", 0),     # 5 >= 0 -> pass
                max_at_most(F.col("v"), "v", 100),    # 500 > 100 -> fail
                no_violations(F.col("v") % 5 == 0, "in_set:v_mod5"),
            ],
        ).collect()
    }
    assert rep["completeness:name"] == (2, 3, 0)
    assert rep["completeness:v"] == (3, 3, 1)
    assert rep["uniqueness:id"] == (2, 3, 0)
    assert rep["range_min:v"] == (5, 0, 1)
    assert rep["range_max:v"] == (500, 100, 0)
    assert rep["in_set:v_mod5"] == (0, 0, 1)


def test_expectation_report_is_one_scan(spark):
    """All checks ride ONE aggregation: the physical plan contains
    exactly one Exchange (the partial->final agg boundary) and one scan
    of the input — never a job per check."""
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("g"))
    rep = expectation_report(
        df,
        [completeness("g"), uniqueness("id"),
         min_at_least(F.col("id"), "id", 0),
         max_at_most(F.col("id"), "id", 10_000),
         no_violations(F.col("g") < 7, "in_set:g")],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"\bExchange\b", plan)) <= 2  # agg (+AQE read)
    assert plan.count("Scan ") + plan.count("Range ") <= 2
    assert rep.count() == 5


def test_expectation_refusals(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="no checks"):
        expectation_report(df, [])
    with pytest.raises(ValueError, match="unknown expectation op"):
        expectation_report(
            df, [("bad", F.count(F.lit(1)), F.count(F.lit(1)), "!=")])


def test_corpus_split_is_deterministic_and_total(spark):
    """X214: the salted-hash split is a pure function of doc_id — every
    document lands in exactly one split, re-runs agree exactly, and the
    proportions approximate 90/5/5."""
    from tests.conftest import SF_CORRECT
    from unfccc_documents_database_sandbox_spark.catalog import load_table
    from unfccc_documents_database_sandbox_spark.registry import (
        load_all_plans,
        lookup,
    )

    load_all_plans()
    audit1 = lookup("corpus_split").build(spark, SF_CORRECT)
    audit2 = lookup("corpus_split").build(spark, SF_CORRECT)
    rows1 = sorted(map(tuple, audit1.collect()))
    rows2 = sorted(map(tuple, audit2.collect()))
    assert rows1 == rows2  # rerun-identical (no RNG anywhere)

    n_docs = load_table(spark, SF_CORRECT, "documents").count()
    by_split = {}
    for _, split, n, _ in rows1:
        by_split[split] = by_split.get(split, 0) + n
    assert sum(by_split.values()) == n_docs  # total: every doc, once
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] > 0.8 * n_docs  # ~90% with hash noise
    assert by_split["val"] + by_split["test"] < 0.2 * n_docs


def test_quality_classifier_python_twin_and_edges(spark):
    """X215: the hashed linear gate matches a pure-Python twin (hashlib
    md5 + the same weight arithmetic) on real corpus docs, and the
    feature count is exactly unigrams + bigrams."""
    import hashlib

    from tests.conftest import SF_CORRECT
    from unfccc_documents_database_sandbox_spark.catalog import load_table
    from unfccc_documents_database_sandbox_spark.registry import (
        load_all_plans,
        lookup,
    )

    load_all_plans()
    got = {
        r["doc_id"]: r
        for r in lookup("text_quality_classifier")
        .build(spark, SF_CORRECT)
        .filter(F.col("doc_id") < 20)
        .collect()
    }

    def w_milli(term: str) -> int:
        h = hashlib.md5(f"qc1:{term}".encode()).hexdigest()
        bucket = int(h[:7], 16) % 4096
        return ((bucket + 1) * 2654435761) % 2001 - 1000

    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .filter(F.col("doc_id") < 20)
        .collect()
    )
    assert len(docs) == len(got) > 0
    for d in docs:
        toks = [t for t in d["text"].split(" ") if t]
        feats = toks + [
            f"{a}_{b}" for a, b in zip(toks, toks[1:])
        ]
        row = got[d["doc_id"]]
        assert row["n_feat"] == len(feats)
        score = sum(w_milli(t) for t in feats)
        assert row["score_milli"] == score
        assert row["keep_flag"] == (1 if score > 0 else 0)


def test_curation_v2_funnel_monotone_and_dedup_split_of_labor(spark):
    """X219: the funnel never grows, the split stages partition the
    semantic survivors, and each planted twin family is caught by its
    intended stage (exact copies by (d), reworded near-dups by (e))."""
    from tests.conftest import SF_CORRECT
    from unfccc_documents_database_sandbox_spark.plans.textstats import (
        corpus_curation_v2,
    )

    rows = {r["stage"]: r for r in
            corpus_curation_v2(spark, SF_CORRECT).collect()}
    order = ["a_input", "b_quality", "c_lang", "d_exact_dedup",
             "e_semantic_dedup"]
    for prev, cur in zip(order, order[1:]):
        assert rows[cur]["n_docs"] <= rows[prev]["n_docs"]
        assert rows[cur]["n_tokens"] <= rows[prev]["n_tokens"]
    # both dedup stages actually fired on the planted twins
    assert rows["d_exact_dedup"]["n_docs"] < rows["c_lang"]["n_docs"]
    assert (rows["e_semantic_dedup"]["n_docs"]
            < rows["d_exact_dedup"]["n_docs"])
    # split partitions the final corpus exactly
    assert (rows["f_train"]["n_docs"] + rows["f_val"]["n_docs"]
            + rows["f_test"]["n_docs"]) == rows["e_semantic_dedup"]["n_docs"]
    assert (rows["f_train"]["n_tokens"] + rows["f_val"]["n_tokens"]
            + rows["f_test"]["n_tokens"]) == rows["e_semantic_dedup"]["n_tokens"]

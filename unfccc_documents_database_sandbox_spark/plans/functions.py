"""Scalar function surface (F1-F10): strings, dates, math, arrays, maps,
JSON, regex. All JVM-side built-ins — zero Python in these plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from unfccc_documents_database_sandbox_spark.catalog import load_table
from unfccc_documents_database_sandbox_spark.registry import register


@register(
    "str_funcs",
    oracle="""
    SELECT doc_id,
           trim('  ' || source || ' ') AS trimmed,
           upper(lang) AS lang_up,
           lower(source) AS src_lo,
           substring(text, 1, 10) AS head10,
           printf('%s [%d]', source, doc_id) AS label,
           CAST(length(text) AS BIGINT) AS len_chars,
           n_chars,
           regexp_extract(source, 'src(\\d+)', 1) AS src_num,
           CAST(CASE WHEN regexp_matches(source, '^src\\d+$') THEN 1 ELSE 0 END
                AS BIGINT) AS src_ok
    FROM documents
    """,
)
def str_funcs(spark, sf_dir):
    """F1+F3+F4+F10 string surface in one projection (consolidated from the
    r01/r02 str_trim / str_format / str_length / str_regex keys per VERDICT
    r02 #2 — every operator stays in the plan and the oracle; one registry
    key instead of four so the driver window reaches more families).

    - F1 trim/case/substring (reference: .strip() on numbering/text/caption,
      generate_decisions_summaries.py:52-56)
    - F3 printf-style interpolation (reference: f"{decision.symbol}
      [{decision.id}]", generate_decisions_summaries.py:46)
    - F4 char length, cross-checked against the stored n_chars column
    - F10 regex extract + match predicate (reference dep: regex,
      requirements.txt:58); the match is emitted as a 0/1 flag column
      rather than a WHERE so the other functions keep full-table coverage.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.trim(F.concat(F.lit("  "), F.col("source"), F.lit(" "))).alias("trimmed"),
        F.upper("lang").alias("lang_up"),
        F.lower("source").alias("src_lo"),
        F.substring("text", 1, 10).alias("head10"),
        F.format_string("%s [%d]", F.col("source"), F.col("doc_id")).alias("label"),
        F.length("text").cast("long").alias("len_chars"),
        "n_chars",
        F.regexp_extract("source", r"src(\d+)", 1).alias("src_num"),
        F.col("source").rlike(r"^src\d+$").cast("long").alias("src_ok"),
    )


@register(
    "date_extract",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2025-01-01 00:00:00') AS BIGINT)
               AS days_to_2025
    FROM orders
    """,
)
def date_extract(spark, sf_dir):
    """F5 date part extraction / truncation / arithmetic on order dates."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.datediff(
            F.lit("2025-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("days_to_2025"),
    )


@register(
    "math_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0)
                AS BIGINT) AS charge_cents,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS qty_floor,
           CAST(CAST(l_quantity AS BIGINT) % 5 AS BIGINT) AS qty_mod
    FROM lineitem
    """,
)
def math_arith(spark, sf_dir):
    """F6 per-row arithmetic — same IEEE ops per row in any engine, so
    doubles are bit-identical (only cross-row FP reductions are unsafe).
    The charge is emitted as cents: scale-then-round-to-integer is the only
    cross-engine-stable rounding (ROUND(x, 2) tie-breaking differs)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 100,
            0,
        ).cast("long").alias("charge_cents"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7.0).cast("long").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7.0).cast("long").alias("qty_floor"),
        (F.col("l_quantity").cast("long") % 5).cast("long").alias("qty_mod"),
    )


@register(
    "array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           array_to_string(
               list_transform(embedding[1:3],
                   x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT)
                             AS VARCHAR)),
               ',') AS head3,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_val
    FROM embeddings
    """,
)
def array_ops(spark, sf_dir):
    """F7 array size / slice / element access / transform over embeddings.

    The slice+transform still run on the array; the output serializes it to
    a scalar CSV string of 1e-4-unit ints because the driver's pandas
    canonicalization cannot hash list cells (r01 hard error) — keep array
    computation in the plan, scalars at the output boundary."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice("embedding", 1, 3),
                lambda x: F.round(x.cast("double") * 10000, 0)
                .cast("long")
                .cast("string"),
            ),
        ).alias("head3"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
    )


@register(
    "map_ops",
    oracle="""
    SELECT doc_id,
           element_at(MAP(['lang', 'src'], [lang, source]), 'lang')[1] AS m_lang,
           element_at(MAP(['lang', 'src'], [lang, source]), 'src')[1] AS m_src,
           CAST(cardinality(MAP(['lang', 'src'], [lang, source])) AS BIGINT) AS m_size
    FROM documents
    """,
)
def map_ops(spark, sf_dir):
    """F8 map construction + key access (reference: the symbol→text result
    dict, generate_decisions_summaries.py:35,59). Scalar outputs so the
    cross-engine hash is stable."""
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("src"), F.col("source"))
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("m_lang"),
        F.element_at(m, "src").alias("m_src"),
        F.size(m).cast("long").alias("m_size"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k2
    FROM events
    """,
)
def json_extract(spark, sf_dir):
    """F9/U3 JSON field extraction + typed parse (reference: pydantic
    structured-output validation of the LLM JSON response,
    generate_decisions_summaries.py:92-95; events.props is a JSON string).
    from_json gives the schema-validated struct path; get_json_object the
    quick single-field path."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k"),
        (F.get_json_object("props", "$.k").cast("long") * 2).alias("k2"),
    )


_NUMBERING_LABELS = (
    "1.", "12)", "(3)", "(a)", "b.", "(z)", "iv.", "(ix)", "xiv)",
    "mcmxciv.", "i.", "??",
)
_NUMBERING_VALUES_SQL = ", ".join(f"('{v}')" for v in _NUMBERING_LABELS)


@register(
    "numbering_normalize",
    oracle=f"""
    WITH labels(label) AS (VALUES {_NUMBERING_VALUES_SQL}),
    ex AS (
        SELECT label,
               regexp_extract(label, '^\\(?([0-9]+|[ivxlcdm]+|[a-z])\\)?\\.?\\)?$', 1) AS core
        FROM labels
    ),
    rv AS (
        SELECT label, core,
               list_transform(string_split(core, ''),
                   c -> CASE c WHEN 'i' THEN 1 WHEN 'v' THEN 5 WHEN 'x' THEN 10
                               WHEN 'l' THEN 50 WHEN 'c' THEN 100 WHEN 'd' THEN 500
                               WHEN 'm' THEN 1000 ELSE 0 END) AS vals
        FROM ex
    )
    SELECT label,
           CAST(CASE
               WHEN core = '' THEN NULL
               WHEN regexp_matches(core, '^[0-9]+$') THEN CAST(core AS INT)
               WHEN regexp_matches(core, '^[ivxlcdm]+$') THEN
                   list_sum(list_transform(range(1, len(vals) + 1),
                       i -> CASE WHEN i < len(vals) AND vals[i] < vals[i + 1]
                                 THEN -vals[i] ELSE vals[i] END))
               WHEN regexp_matches(core, '^[a-z]$') THEN ascii(core) - 96
           END AS INT) AS ordinal
    FROM rv
    """,
)
def numbering_normalize(spark, sf_dir):
    """F-extension: Block.numbering label normalization — arabic '12.',
    parenthesized letters '(a)', and roman numerals '(iv)' all to ordinal
    ints (reference deps roman + num2words, requirements.txt:62,41; the
    numbering field itself: generate_decisions_summaries.py:51-52).
    Runs over a literal label set via createDataFrame (S6 local collection
    → table), parsed entirely with JVM-side expressions."""
    from unfccc_documents_database_sandbox_spark.functions.text import numbering_ordinal

    labels = spark.createDataFrame([(v,) for v in _NUMBERING_LABELS], "label string")
    return labels.select("label", numbering_ordinal("label").alias("ordinal"))


@register(
    "json_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(k) AS BIGINT) AS n_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k,
           CAST(COUNT(*) FILTER (WHERE missing IS NULL) AS BIGINT)
               AS n_missing
    FROM (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               json_extract(props, '$.absent') AS missing
        FROM events
    )
    GROUP BY event_type
    """,
)
def json_variant_extract(spark, sf_dir):
    """Semi-structured VARIANT columns (Spark 4 / the open Variant binary
    encoding shared with Delta and Iceberg v3): parse events.props ONCE
    into a VariantType column, then extract typed paths with variant_get
    — the modern replacement for per-path get_json_object re-parsing
    (each get_json_object call re-reads the JSON text; a variant parses
    once and every extraction is a binary offset lookup, the win that
    compounds at 100 TB with many paths). A probe of a missing path
    ('$.absent') must yield NULL, not an error (try-semantics pinned in
    the n_missing count = every row). The oracle restates both
    extractions as DuckDB JSON ops; the per-type aggregate is exact
    bigints, so the row hashes exactly.

    Scale: parse_json + variant_get are JVM codegen expressions (no
    Python, no UDF); at rest a variant column stores the binary encoding
    in parquet and shredded readers prune sub-paths like columns."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    x = e.select(
        "event_type",
        F.expr("CAST(variant_get(v, '$.k') AS LONG)").alias("k"),
        F.expr("variant_get(v, '$.absent')").alias("missing"),
    )
    return x.groupBy("event_type").agg(
        F.count("k").cast("long").alias("n_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.count(F.when(F.col("missing").isNull(), F.lit(1)))
        .cast("long").alias("n_missing"),
    )


@register(
    "try_funcs",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS v,
               event_id % 5 AS d,
               CASE WHEN event_id % 3 = 0 THEN event_type
                    ELSE CAST(event_id AS VARCHAR) END AS s,
               list_extract([event_id, user_id],
                            CAST(1 + event_id % 3 AS INTEGER)) AS e
        FROM events
    ),
    t AS (
        SELECT event_type,
               CAST(v AS DOUBLE) / NULLIF(d, 0) AS a,
               TRY_CAST(s AS BIGINT) AS c,
               e
        FROM b
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE a IS NULL) AS BIGINT) AS n_div_null,
           CAST(SUM(CAST(ROUND(a * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_div_micros,
           CAST(COUNT(c) AS BIGINT) AS n_cast_ok,
           CAST(SUM(c) AS BIGINT) AS sum_cast,
           CAST(COUNT(*) FILTER (WHERE e IS NULL) AS BIGINT) AS n_elem_null,
           CAST(SUM(e) AS BIGINT) AS sum_elem
    FROM t GROUP BY event_type
    """,
)
def try_funcs(spark, sf_dir):
    """Error-safe function surface (the ANSI-mode escape hatches — Spark 4
    runs ANSI SQL by default, so division by zero / bad casts / bad
    indexes ERROR unless the try_ family turns them into NULLs; a 100 TB
    pipeline wants the job to survive one dirty row): try_divide (NULL on
    zero divisor — oracle: x / NULLIF(d, 0)), try_cast of a
    sometimes-non-numeric string (NULL, never a crash — DuckDB TRY_CAST),
    and try_element_at probing index 1 + event_id%3 into a 2-element
    array (index 3 → NULL on both engines; note index 0 is NOT
    try-catchable in Spark — INVALID_INDEX_OF_ZERO raises even in
    try_element_at, so the probe space is 1..3 by design). Division
    results are quantized to bigint micros before summing (double SUM is
    order-dependent; ROUND-then-bigint is exact), everything else counts
    and sums exact integers — hash-exact per event_type."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
        (F.col("event_id") % 5).alias("d"),
        F.when(F.col("event_id") % 3 == 0, F.col("event_type"))
        .otherwise(F.col("event_id").cast("string")).alias("s"),
        F.expr(
            "try_element_at(array(event_id, user_id), "
            "CAST(1 + event_id % 3 AS INT))"
        ).alias("e"),
    )
    t = e.select(
        "event_type",
        F.expr("try_divide(CAST(v AS DOUBLE), d)").alias("a"),
        F.expr("try_cast(s AS BIGINT)").alias("c"),
        "e",
    )
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(F.when(F.col("a").isNull(), F.lit(1)))
        .cast("long").alias("n_div_null"),
        F.sum(F.round(F.col("a") * 1000000).cast("long"))
        .cast("long").alias("sum_div_micros"),
        F.count("c").cast("long").alias("n_cast_ok"),
        F.sum("c").cast("long").alias("sum_cast"),
        F.count(F.when(F.col("e").isNull(), F.lit(1)))
        .cast("long").alias("n_elem_null"),
        F.sum("e").cast("long").alias("sum_elem"),
    )

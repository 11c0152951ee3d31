"""Character-n-gram language identification (CCNet-style gate, r15).

The standard pretraining-corpus language filter (CCNet / fastText LID)
scores each document against per-language character-n-gram profiles and
keeps it only when the predicted language matches the language the
pipeline expects. This module is the engine's JVM-expressible version:

- **Pinned profiles.** Per language, the top ``PROFILE_SIZE`` character
  bigrams of a small genuine-text training sample, with integer costs in
  log-thousandths (``round(-1000 * log2(p_laplace))`` — the X201
  integer-cost discipline: runtime arithmetic is pure int64, so Spark
  and DuckDB agree bit-for-bit; the only floating point happens here at
  pin time, and both engines consume the SAME pinned integers).
- **Row-local scoring.** A document's cost under language L is the sum
  of its bigram costs (out-of-vocabulary bigrams pay the Laplace
  zero-count cost). On the Spark side this is one ``aggregate()`` over a
  ``transform(sequence(...))`` bigram array with a literal-map lookup —
  no shuffle, no UDF, no explode; 100 TB scans stay embarrassingly
  parallel. The DuckDB oracle restates it as unnest + profile-table
  join + group, from the same constants.
- **The gate.** ``lang_pred = argmin_L cost_L`` (ties broken by language
  code) and ``keep = 1`` iff the prediction matches the document's
  claimed ``lang`` — documents tagged with a language outside the
  profile set can never match, which is exactly CCNet's behavior for
  its target-language set.

The synthetic corpus shares one English-ish vocabulary across all lang
tags, so the discriminating evidence is PLANTED genuine-language
documents (the r13 planted-near-dup precedent: the planting is a derived
union inside the query, mirrored exactly in the oracle — the read-only
testdata is untouched). Three planted docs claim their true language
(keep=1) and three claim the wrong one (keep=0), so a broken scorer or a
broken gate flips a known flag.

Reference tie: the reference pipelines trust a ``language`` column on
ingest (unfccc documents carry a language tag); this operator is the
filter that VALIDATES such a column at corpus scale.
"""

from __future__ import annotations

import math
import re

LANGS: tuple[str, ...] = ("en", "es", "fr")
PROFILE_SIZE = 64
COST_SCALE = 1000

# Genuine-text training samples, ASCII-only (accents stripped) so that
# lower()/regexp semantics are identical across Spark, DuckDB, and
# Python. A few hundred characters per language is plenty for bigram
# profiles this size.
_TRAIN: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and the children were "
        "reading quietly in the warm evening light while their friends "
        "walked along the river talking about the weather and the harvest "
        "that would come with the first days of autumn when the leaves turn "
        "and the wind grows cold across the northern hills and every house "
        "lights a fire against the long nights of the coming winter season"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y los ninos "
        "estaban leyendo tranquilamente en la tarde calida mientras sus "
        "amigos caminaban junto al rio hablando del tiempo y de la cosecha "
        "que llegaria con los primeros dias del otono cuando las hojas caen "
        "y el viento se vuelve frio sobre las colinas del norte y cada casa "
        "enciende un fuego contra las largas noches del invierno que viene"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et les "
        "enfants lisaient tranquillement dans la soiree chaude pendant que "
        "leurs amis marchaient le long de la riviere en parlant du temps et "
        "de la recolte qui viendrait avec les premiers jours de l automne "
        "quand les feuilles tombent et que le vent devient froid sur les "
        "collines du nord et chaque maison allume un feu contre les longues "
        "nuits de l hiver qui arrive"
    ),
}


def normalize(text: str) -> str:
    """The shared normalization: lowercase, non-letter runs to one space,
    then space-wrap so word boundaries form bigrams. Must stay expressible
    identically in Spark (`regexp_replace(lower(..))`) and DuckDB."""
    return " " + re.sub(r"[^a-z]+", " ", text.lower()).strip() + " "


def bigrams(text: str) -> list[str]:
    s = normalize(text)
    return [s[i : i + 2] for i in range(len(s) - 1)]


def _build_profile(sample: str) -> tuple[dict[str, int], int]:
    """Top-N bigram → integer cost (log-thousandths, Laplace-smoothed),
    plus the out-of-vocabulary cost (the zero-count estimate)."""
    counts: dict[str, int] = {}
    for g in bigrams(sample):
        counts[g] = counts.get(g, 0) + 1
    total = sum(counts.values())
    vocab = 27 * 27  # the [a-z ] bigram universe, the Laplace denominator
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PROFILE_SIZE]
    profile = {
        g: round(-COST_SCALE * math.log2((c + 1) / (total + vocab)))
        for g, c in top
    }
    oov = round(-COST_SCALE * math.log2(1 / (total + vocab)))
    return profile, oov


_BUILT = {lang: _build_profile(sample) for lang, sample in _TRAIN.items()}
PROFILES: dict[str, dict[str, int]] = {k: v[0] for k, v in _BUILT.items()}
OOV_COST: dict[str, int] = {k: v[1] for k, v in _BUILT.items()}


def score(text: str, lang: str) -> int:
    """Pure-Python twin of the runtime scoring (for tests)."""
    prof, oov = PROFILES[lang], OOV_COST[lang]
    return sum(prof.get(g, oov) for g in bigrams(text))


def predict(text: str) -> str:
    costs = {lang: score(text, lang) for lang in LANGS}
    return min(LANGS, key=lambda lang: (costs[lang], lang))


# --- planted documents: (doc_id, claimed lang, genuine text). ASCII
# only. The first three claim their true language (keep=1); the last
# three claim a wrong one (keep=0) — the flag-flip canaries. ---
PLANTED_DOCS: tuple[tuple[int, str, str], ...] = (
    (
        9000001,
        "en",
        "the committee reviewed the report and agreed that the parties "
        "should strengthen their national plans before the next session",
    ),
    (
        9000002,
        "es",
        "el comite reviso el informe y acordo que las partes deberian "
        "reforzar sus planes nacionales antes de la proxima sesion",
    ),
    (
        9000003,
        "fr",
        "le comite a examine le rapport et a convenu que les parties "
        "devraient renforcer leurs plans nationaux avant la prochaine "
        "session",
    ),
    (
        9000004,
        "en",  # genuinely Spanish — the gate must drop it
        "los delegados discutieron durante toda la manana sobre las "
        "medidas necesarias para reducir las emisiones en la region",
    ),
    (
        9000005,
        "fr",  # genuinely English — the gate must drop it
        "the delegates discussed all morning the measures needed to "
        "reduce emissions across the whole region and beyond",
    ),
    (
        9000006,
        "es",  # genuinely French — the gate must drop it
        "les delegues ont discute toute la matinee des mesures "
        "necessaires pour reduire les emissions dans la region",
    ),
)


def spark_cost_column(lang: str):
    """cost_<lang> as a pure-JVM column over a normalized text column
    ``s``: literal-map lookup per bigram, int64 fold. No UDF, no shuffle,
    row-local — the 100 TB shape."""
    from pyspark.sql import functions as F

    prof, oov = PROFILES[lang], OOV_COST[lang]
    pairs = ", ".join(f"'{g}', {c}L" for g, c in sorted(prof.items()))
    return F.expr(
        "aggregate(transform(sequence(1, length(s) - 1),"
        " i -> substring(s, i, 2)),"
        f" 0L, (acc, g) -> acc + coalesce(element_at(map({pairs}), g),"
        f" {oov}L))"
    )


def oracle_profile_values() -> str:
    """The profile table as a SQL VALUES literal: (plang, gram, cost)."""
    rows = [
        f"('{lang}', '{g}', {c})"
        for lang in LANGS
        for g, c in sorted(PROFILES[lang].items())
    ]
    return ",\n        ".join(rows)


def oracle_oov_values() -> str:
    return ", ".join(f"('{lang}', {OOV_COST[lang]})" for lang in LANGS)


def oracle_planted_values() -> str:
    return ",\n        ".join(
        f"({i}, '{lang}', '{text}')" for i, lang, text in PLANTED_DOCS
    )


def profile_weight_rows() -> list[tuple]:
    """(gram, w_en, w_es, w_fr) over the union of all profile grams;
    a language missing the gram gets None (the scorer coalesces to
    that language's OOV cost). 91 rows for the pinned profiles."""
    grams = sorted(set().union(*[set(PROFILES[lang]) for lang in LANGS]))
    return [(g, *[PROFILES[lang].get(g) for lang in LANGS]) for g in grams]


def score_costs(df):
    """(doc_id, lang, cost_en, cost_es, cost_fr) — the r17 REGISTERED
    scorer: explode the character bigrams of the normalized text,
    broadcast-join the pinned profile table, and take one grouped
    integer sum per (doc_id, lang). Same integers as the
    ``spark_cost_struct`` fold by construction (element_at-with-OOV ≡
    left-join-coalesce; integer sums are order-independent), pinned by
    tests/test_langid.py.

    Why this shape (r17, guide §4.1/§2.3): the fold is an interpreted
    higher-order function — ~450 ns per gram-step on local[32]
    regardless of how the per-gram lookup is expressed (literal map,
    literal 729-slot array, same cost — measured r17), so three costs
    over ~500 grams/doc dominate the key. The explode+join+agg runs
    entirely in whole-stage codegen: interleaved A/B at sf0.1, median
    of 9, fold 3.70 s vs explode-join 2.58 s (and the explode variant's
    spread is 2.35-2.84 s where the fold never beat 3.2 s). A
    numpy/mapInPandas twin measured a similar median (2.68 s) with 3x
    the variance — the Python boundary loses to codegen here.

    Scale shape: the explode multiplies rows ~500x but every doc's
    grams stay in its input partition, so the partial (map-side)
    aggregation collapses them back to ONE row per doc before the
    exchange — the shuffle carries (doc_id, lang, 3 longs) per doc, not
    grams. The profile table is 91 rows, always broadcast."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    prof = F.broadcast(
        spark.createDataFrame(
            profile_weight_rows(), "g string, w_en long, w_es long, w_fr long"
        )
    )
    s = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " ")),
        F.lit(" "),
    )
    grams = F.expr("transform(sequence(1, length(s) - 1), i -> substring(s, i, 2))")
    # explode_outer, not explode (ADVICE r17): a NULL-text row has a NULL
    # gram array, which a plain explode silently DROPS while the fold twin
    # keeps the row with NULL costs. explode_outer emits one g=NULL row
    # for it, and the null-propagating when() below makes its sums NULL —
    # bit-equal with the fold for every input, including NULL/absent text.
    # Non-null text always yields ≥1 gram (s is padded with two spaces),
    # so no real doc ever takes the NULL branch.
    e = df.withColumn("s", s).select(
        "doc_id", "lang", F.explode_outer(grams).alias("g")
    )
    return (
        e.join(prof, "g", "left")
        .groupBy("doc_id", "lang")
        .agg(
            *[
                F.sum(
                    F.when(
                        F.col("g").isNull(), F.lit(None).cast("long")
                    ).otherwise(
                        F.coalesce(F.col(f"w_{lang}"), F.lit(OOV_COST[lang]))
                    )
                ).alias(f"cost_{lang}")
                for lang in LANGS
            ]
        )
    )


def spark_cost_struct():
    """All three language costs in ONE fold over the bigram array — a
    named_struct accumulator replaces three separate aggregate() passes
    (the r15 bench showed 3 interpreted passes over ~400 grams/doc cost
    ~7 s at sf0.1; one pass does the same 3 map lookups per gram but
    walks the array once). Returns a struct column with fields en/es/fr.

    r17: superseded as the registered path by ``score_costs`` (the
    codegen explode+join scorer — see its docstring for the A/B); kept
    as the re-runnable row-local twin, still pinned bit-equal by
    tests/test_langid.py."""
    from pyspark.sql import functions as F

    def m(lang: str) -> str:
        pairs = ", ".join(
            f"'{g}', {c}L" for g, c in sorted(PROFILES[lang].items())
        )
        return f"map({pairs})"

    step = ", ".join(
        f"'{lang}', acc.{lang} + coalesce(element_at({m(lang)}, g),"
        f" {OOV_COST[lang]}L)"
        for lang in LANGS
    )
    zero = ", ".join(f"'{lang}', 0L" for lang in LANGS)
    return F.expr(
        "aggregate(transform(sequence(1, length(s) - 1),"
        " i -> substring(s, i, 2)),"
        f" named_struct({zero}),"
        f" (acc, g) -> named_struct({step}))"
    )


def arrow_costs(df):
    """Arrow twin of ``spark_cost_struct`` (r16, VERDICT r15 #4): the
    same three per-language bigram cost sums computed in a mapInPandas
    scorer — normalize exactly like the JVM expression (lower,
    [^a-z]+ -> ' ', trim, pad), walk the bigrams once per doc, and
    price each gram with the SAME pinned integer profiles. Bit-equal
    to the fold by construction (dict lookup == element_at, Python int
    sums == bigint sums; pinned by tests/test_langid.py), measured
    against it per round: interpreted ``aggregate()`` lambdas pay
    ~per-gram interpreter overhead, Arrow pays one Python hop per
    BATCH plus C-speed string work. The faster one owns the registered
    path; the loser stays as this twin so the measurement is
    re-runnable.

    Input: (doc_id, lang, text); output: (doc_id, lang, cost_en,
    cost_es, cost_fr) — the exact frame text_lang_id's prediction
    stage consumes."""
    import pandas as pd
    import re as _re

    profiles = {lang: dict(PROFILES[lang]) for lang in LANGS}
    oov = dict(OOV_COST)
    nonaz = _re.compile(r"[^a-z]+")

    def score_batch(batches):
        for pdf in batches:
            cols = {f"cost_{lang}": [] for lang in LANGS}
            for text in pdf["text"]:
                s = " " + nonaz.sub(" ", str(text).lower()).strip() + " "
                totals = {lang: 0 for lang in LANGS}
                for i in range(len(s) - 1):
                    g = s[i:i + 2]
                    for lang in LANGS:
                        totals[lang] += profiles[lang].get(g, oov[lang])
                for lang in LANGS:
                    cols[f"cost_{lang}"].append(totals[lang])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "lang": pdf["lang"],
                    **{k: pd.Series(v, dtype="int64")
                       for k, v in cols.items()},
                }
            )

    return df.select("doc_id", "lang", "text").mapInPandas(
        score_batch,
        "doc_id long, lang string, cost_en long, cost_es long, "
        "cost_fr long",
    )

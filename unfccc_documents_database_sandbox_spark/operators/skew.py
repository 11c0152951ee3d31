"""Skew-mitigation join strategies (scale hygiene, SURVEY.md §7 hard part 4).

Two complementary tools for the 100 TB regime:

- ``salted_join``: explicit key salting. The dimension side is replicated
  ``salt`` times (one copy per salt value); each fact row picks a
  deterministic salt, so a hot key's rows fan out over ``salt`` reducers
  instead of melting one. Result is provably identical to the plain join
  (each fact row meets exactly one replica of its dim row) — the registered
  query's oracle is the unsalted SQL join.

- AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on in
  session.py) handles the same problem at runtime without plan changes;
  explicit salting remains useful when the skew is known ahead of time or
  the join is not sort-merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt_on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """fact ⋈ dim on ``on`` with ``salt``-way key salting.

    ``salt_on``: fact columns whose hash spreads a hot join key's rows
    across salts (any columns with per-row variety — e.g. the fact's own
    primary key). Deterministic: same row → same salt."""
    sf = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_on), F.lit(salt)).cast("int")
    )
    sd = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return sf.join(sd, [*on, "_salt"], how).drop("_salt")

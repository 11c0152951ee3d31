"""SQL-text front-end queries: the same ANSI SQL string runs through
``spark.sql`` over registered views AND through the DuckDB oracle — proving
the engine's SQL surface, not just the DataFrame API, computes standard
analytics correctly. Shapes are TPC-H-inspired (pricing summary, shipping
priority, local-supplier volume) over the driver's TPC-H-ish corpus.

Reference parity: the sandbox's relational work is SQL pushed to Postgres
(SURVEY.md §1.1); these queries are the equivalent "hand the engine a SQL
string" path.

Money is summed in exact integer cents (registry.py determinism rule):
ROUND(SUM(double), 2) is summation-order-dependent at the 1e-10 scale and
can flip a 2nd decimal between engines; per-row scale-round-cast then an
integer sum is exact. The outer CAST(SUM(...) AS BIGINT) pins DuckDB's
HUGEINT back to int64 so both engines emit the same dtype. Averages divide
one exact integer sum by one exact count — a single deterministic FP op.
"""

from __future__ import annotations

from unfccc_documents_database_sandbox_spark.catalog import register_views
from unfccc_documents_database_sandbox_spark.registry import register

_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
       ROUND(CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*)), 4) AS avg_qty,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / (100.0 * COUNT(*)), 4) AS avg_price,
       ROUND(CAST(SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT)) AS DOUBLE) / (10000.0 * COUNT(*)), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

# the synthetic orders table has no o_shippriority; o_orderpriority stands in
_Q3 = """
SELECT l.l_orderkey,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
LIMIT 10
"""

_Q5 = """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


def _sql_plan(sql: str):
    def plan(spark, sf_dir):
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return plan


_Q6 = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100, 0) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


register("sql_tpch_q1", oracle=_Q1)(_sql_plan(_Q1))
register("sql_tpch_q3", oracle=_Q3)(_sql_plan(_Q3))
register("sql_tpch_q5", oracle=_Q5)(_sql_plan(_Q5))
# Q6 (forecasting revenue change): pure scan + conjunctive filter + global
# agg — the query whose whole cost is predicate pushdown; every filter must
# reach the parquet reader
register("sql_tpch_q6", oracle=_Q6)(_sql_plan(_Q6))


# correlated scalar subquery — Catalyst decorrelates it into a join+agg
# (SURVEY.md §4: "subquery decorrelation ... Postgres" → built-in here)
_QCORR = """
SELECT p_partkey, p_brand, ROUND(p_retailprice, 2) AS price
FROM part p
WHERE p_retailprice > 1.05 * (
    SELECT AVG(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
ORDER BY p_partkey
"""

register("sql_corr_subquery", oracle=_QCORR)(_sql_plan(_QCORR))


# time-based RANGE frame (W3 on event time): per event, activity in the
# trailing hour for the same user. RANGE ... CURRENT ROW includes ts-peers
# in both engines, so tie order never affects the result; the windowed SUM
# is over integer cents with an outer BIGINT cast (HUGEINT rule).
_QRANGE = """
SELECT event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_1h,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
           AS cents_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""

register("sql_window_range", oracle=_QRANGE)(_sql_plan(_QRANGE))


# explicit GROUPING SETS (A6 family completion beyond rollup/cube): the four
# set combinations in one pass — Spark plans one Expand + one aggregate, the
# distributed equivalent of running four grouped aggs. GROUPING() flags
# disambiguate a rolled-up NULL from a data NULL in both engines.
_QGSETS = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS price_cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                        (l_returnflag, l_linestatus), ())
"""

register("agg_grouping_sets", oracle=_QGSETS)(_sql_plan(_QGSETS))


# ---------------------------------------------------------------------------
# r03 SQL-breadth additions, promoted into the driver window at the r04
# rotation (they were parked behind an "x_" prefix while the r03 window was
# full; parity evidence from tests/test_parity.py covers the interim — see
# README "Driver-window rotation"). Shapes complete the TPC-H subquery
# family the engine had not yet exercised end-to-end through SQL text:
# EXISTS, IN + HAVING, NOT EXISTS + scalar subquery, disjunctive pushdown,
# conditional aggregation.
# ---------------------------------------------------------------------------

# Q4-shaped (order priority checking): correlated EXISTS — Catalyst plans a
# left-semi join; the subquery predicate pushes to the lineitem scan.
_Q4 = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o.o_orderpriority
"""

# Q12-shaped (shipping-mode priority split): CASE inside SUM — one pass,
# two conditional counts, no second scan or self-join.
_Q12 = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
"""

# Q14-shaped (promo revenue share): ratio of two exact integer-cent sums —
# the only FP ops are one division and one ROUND, deterministic on both
# engines. The corpus p_type is a flat category, so equality stands in for
# TPC-H's LIKE 'PROMO%'.
_Q14 = """
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents,
       ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS DOUBLE),
             4) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""

# Q18-shaped (large-volume orders): IN over a grouped+HAVING subquery —
# plans as agg → semi-join; quantities are whole-number doubles, summed as
# exact BIGINT (threshold 300 ≈ top 1% of per-order volume on this corpus).
_Q18 = """
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
    SELECT l2.l_orderkey FROM lineitem l2
    GROUP BY l2.l_orderkey
    HAVING SUM(CAST(ROUND(l2.l_quantity, 0) AS BIGINT)) > 300
)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
ORDER BY total_qty DESC, o.o_orderkey
LIMIT 20
"""

# Q19-shaped (discounted revenue, disjunctive predicates): three OR-arms
# over brand/size/quantity — Catalyst pushes the common join key and lets
# the disjunction filter after the join; the point is that an OR of ANDs
# still prunes columns and never degrades to a cartesian.
_Q19 = """
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 20 AND 40)
"""

# Q22-shaped (lapsed high-balance customers): uncorrelated scalar AVG
# subquery + correlated NOT EXISTS (anti-join). Every customer on this
# corpus has SOME order, so "lapsed" = no order in the final year; balances
# compare in exact integer cents against the single-division average.
_Q22 = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer c
WHERE CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) > (
        SELECT AVG(CAST(ROUND(c2.c_acctbal * 100, 0) AS BIGINT))
        FROM customer c2
      )
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  )
GROUP BY c.c_mktsegment
"""

register("sql_tpch_q4", oracle=_Q4)(_sql_plan(_Q4))
register("sql_tpch_q12", oracle=_Q12)(_sql_plan(_Q12))
register("sql_tpch_q14", oracle=_Q14)(_sql_plan(_Q14))
register("sql_tpch_q18", oracle=_Q18)(_sql_plan(_Q18))
register("sql_tpch_q19", oracle=_Q19)(_sql_plan(_Q19))
register("sql_tpch_q22", oracle=_Q22)(_sql_plan(_Q22))

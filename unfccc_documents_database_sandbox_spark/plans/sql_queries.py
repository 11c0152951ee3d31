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


# ---------------------------------------------------------------------------
# r05: the remaining 12 TPC-H query shapes, completing the 22-query suite.
# The synthetic corpus has no partsupp table and no l_commitdate /
# l_receiptdate (TESTDATA.md), so q2/q9/q11/q16/q20/q21 are corpus-shaped:
# the part↔supplier relation is derived as SELECT DISTINCT (l_partkey,
# l_suppkey) FROM lineitem, supply cost proxies use p_retailprice, and q21's
# "kept waiting" predicate is re-expressed over l_returnflag — each keeps
# the original query's characteristic PLAN shape (the thing being tested):
# correlated scalar min, nested INs, grouped-HAVING semi-join,
# double-correlated EXISTS/NOT EXISTS self-joins, left-join histogram.
# ---------------------------------------------------------------------------

# Q2-shaped (minimum-cost supplier): correlated scalar MIN subquery over the
# derived part-supplier relation, 4-table dim chain repeated inside the
# subquery — Catalyst decorrelates to an aggregate + join.
_Q2 = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_partkey, p.p_brand, s.s_name,
       CAST(ROUND(s.s_acctbal * 100, 0) AS BIGINT) AS s_acctbal_cents
FROM part p
JOIN ps ON ps.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
  AND CAST(ROUND(s.s_acctbal * 100, 0) AS BIGINT) = (
      SELECT MIN(CAST(ROUND(s2.s_acctbal * 100, 0) AS BIGINT))
      FROM ps ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal_cents DESC, p.p_partkey, s.s_name
"""

# Q7-shaped (volume shipping): the nation dim joined TWICE (supplier side
# and customer side) with a symmetric disjunctive pair filter, grouped by
# both nations and ship year.
_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol_cents) AS BIGINT) AS revenue_cents
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT) AS vol_cents
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

# Q8-shaped (national market share): 7-table join, share = conditional sum /
# total sum per order year — two exact integer sums, one division, one ROUND.
_Q8 = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_cents ELSE 0 END) AS DOUBLE)
             / CAST(SUM(vol_cents) AS DOUBLE), 6) AS mkt_share
FROM (
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT) AS vol_cents,
           n2.n_name AS supp_nation
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""

# Q9-shaped (product-type profit): profit = revenue − supply cost; with no
# partsupp, unit cost proxies as 10% of p_retailprice (both engines compute
# the identical double product before the cents round). Grouped by supplier
# nation and order year.
_Q9 = """
SELECT nation, o_year, CAST(SUM(amount_cents) AS BIGINT) AS sum_profit_cents
FROM (
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
             - CAST(ROUND(l.l_quantity * p.p_retailprice * 10, 0) AS BIGINT) AS amount_cents
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'LARGE'
) profit
GROUP BY nation, o_year
"""

# Q10-shaped (returned-item reporting): one quarter of 'R' lines, revenue
# per customer, top 20 — agg → TakeOrdered, ties broken by key.
_Q10 = """
SELECT c.c_custkey, c.c_name, n.n_name, c.c_mktsegment,
       CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '2000-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_mktsegment,
         CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)
ORDER BY revenue_cents DESC, c.c_custkey
LIMIT 20
"""

# Q11-shaped (important stock): per-part value from one nation's suppliers,
# kept when above 0.1% of the total — the threshold comparison is scaled to
# stay in exact integer arithmetic (value*1000 > total), no FP anywhere.
_Q11 = """
WITH val AS (
    SELECT l.l_partkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_0'
    GROUP BY l.l_partkey
)
SELECT l_partkey, value_cents
FROM val
WHERE value_cents * 1000 > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM val)
ORDER BY value_cents DESC, l_partkey
"""

# Q13-shaped (customer order-count distribution): LEFT join with the filter
# in the JOIN condition (zero-order customers must survive), then a
# histogram of the per-customer counts.
_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                      AND o.o_orderpriority <> '5-LOW'
    GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

# Q15-shaped (top supplier): quarter revenue per supplier in a CTE used
# twice — once as the join input, once under MAX — the classic
# view-plus-scalar-subquery shape.
_Q15 = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_cents
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_cents = (SELECT MAX(total_cents) FROM revenue)
ORDER BY s.s_suppkey
"""

# Q16-shaped (part-supplier relationship count): COUNT(DISTINCT supplier)
# per brand/type/size over the derived relation, excluding suppliers via
# NOT IN (anti-join); the exclusion predicate stands in for TPC-H's
# s_comment LIKE filter.
_Q16 = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""

# Q17-shaped (small-quantity-order revenue): correlated AVG subquery per
# part — quantities are whole-number doubles, so the AVG is one exact sum
# over one exact count and the 0.2× comparison is deterministic.
_Q17 = """
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < 0.2 * (
      SELECT AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
  )
"""

# Q20-shaped (potential part promotion): nested IN subqueries — suppliers
# (semi-join) whose shipped volume of PROMO parts (inner IN + grouped
# HAVING) cleared a threshold year.
_Q20 = """
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_regionkey = 2
  AND s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) > 50
  )
ORDER BY s.s_name
"""

# Q21-shaped (suppliers who kept orders waiting): the double-correlated
# self-join pair — EXISTS (another supplier contributed to the order) AND
# NOT EXISTS (any OTHER supplier's line was the problem) — re-expressed
# over l_returnflag since the corpus has no commit/receipt dates: count,
# per supplier in one region, finished orders where THIS supplier's line
# is the order's only returned ('R') line.
_Q21 = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F' AND n.n_regionkey = 1 AND l1.l_returnflag = 'R'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""

register("sql_tpch_q2", oracle=_Q2)(_sql_plan(_Q2))
register("sql_tpch_q7", oracle=_Q7)(_sql_plan(_Q7))
register("sql_tpch_q8", oracle=_Q8)(_sql_plan(_Q8))
register("sql_tpch_q9", oracle=_Q9)(_sql_plan(_Q9))
register("sql_tpch_q10", oracle=_Q10)(_sql_plan(_Q10))
register("sql_tpch_q11", oracle=_Q11)(_sql_plan(_Q11))
register("sql_tpch_q13", oracle=_Q13)(_sql_plan(_Q13))
register("sql_tpch_q15", oracle=_Q15)(_sql_plan(_Q15))
register("sql_tpch_q16", oracle=_Q16)(_sql_plan(_Q16))
register("sql_tpch_q17", oracle=_Q17)(_sql_plan(_Q17))
register("sql_tpch_q20", oracle=_Q20)(_sql_plan(_Q20))
register("sql_tpch_q21", oracle=_Q21)(_sql_plan(_Q21))


# WITH RECURSIVE (Spark 4 / SPARK-24497): depth-tracked BOM explosion over
# a synthetic 4-ary part hierarchy (the parent of part k is (k-1) DIV 4,
# i.e. children of part k = parts 4k+1..4k+4 — derived from the data,
# terminates when keys run off the table). The SAME
# text runs on both engines. Scale note: a recursive CTE executes as an
# iterated join — each level is one join against the base table, fine for
# bounded-depth hierarchies (depth ~ log4 |part| here); unbounded
# reachability at 100 TB belongs to the contracted-star operators
# (plans/dedup.py dedup_components), not recursion.
_QBOM = """
WITH RECURSIVE bom (root, pk, depth) AS (
    SELECT p_partkey, p_partkey, 0 FROM part
    WHERE p_partkey BETWEEN 1 AND 3  -- three mid-size subtrees (root 0 = whole table)
    UNION ALL
    SELECT b.root, p.p_partkey, b.depth + 1
    FROM bom b JOIN part p
      -- child k's parent is (k-1) DIV 4: an EQUI-join on the derived
      -- parent key, so every recursion level is a hash join; the naive
      -- "p_partkey IN (4*pk+1 .. 4*pk+4)" spelling is a non-equi
      -- nested-loop against the whole part table per level
      ON CAST(FLOOR((p.p_partkey - 1) / 4.0) AS BIGINT) = b.pk
     AND p.p_partkey >= 1
)
SELECT b.root, CAST(b.depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cost_cents
FROM bom b JOIN part p ON p.p_partkey = b.pk
GROUP BY b.root, b.depth
"""

register("sql_recursive_bom", oracle=_QBOM)(_sql_plan(_QBOM))


# SQL-defined scalar function (Spark 4 SQL UDF, SPARK-46499 family):
# CREATE FUNCTION ... RETURNS ... RETURN <expr>. Unlike a Python UDF the
# body is INLINED by the analyzer — the optimized plan is identical to
# writing the expression in place (whole-stage codegen, pushdown through
# it all still work), so the abstraction is free at 100 TB. The oracle
# restates the body inline, which is exactly what Catalyst executes.
_QSQLUDF_BODY = """
SELECT l_returnflag,
       CAST(SUM(disc_cents(l_extendedprice, l_discount)) AS BIGINT)
           AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY l_returnflag
"""

_QSQLUDF_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY l_returnflag
"""


@register("sql_scalar_udf", oracle=_QSQLUDF_ORACLE)
def sql_scalar_udf(spark, sf_dir):
    """SQL scalar UDF surface: declare disc_cents(price, discount) as a
    CREATE OR REPLACE TEMPORARY FUNCTION with a pure-SQL body and use it
    in an aggregate over lineitem. The function body (exact cent
    rounding of the discounted price) is analyzer-inlined, so this plan
    is bit-identical to sql_tpch_q1's inline arithmetic — the docstring
    claim a reader can check in PLANS.md: no UDF node, one codegen'd
    scan+agg."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_cents("
        "price DOUBLE, discount DOUBLE) RETURNS BIGINT "
        "RETURN CAST(ROUND(price * (1 - discount) * 100, 0) AS BIGINT)"
    )
    return spark.sql(_QSQLUDF_BODY)


# ---------------------------------------------------------------------------
# r12 TPC-DS mini-family (VERDICT r11 #4): retail/window-heavy shapes TPC-H
# never exercises, adapted to this corpus's tables (the partsupp-adaptation
# precedent above) and run SAME-STRING through spark.sql and DuckDB. What
# each shape adds beyond the 22 TPC-H keys:
#   Q36 — a RATIO aggregated under ROLLUP plus RANK *within the rollup
#         parent* (PARTITION BY the grouping level + CASE on GROUPING()),
#         the lochierarchy pattern: one Expand + one agg + one window.
#   Q44 — two-sided ranking (best AND worst lists from one aggregate,
#         joined positionally by rank).
#   Q49 — multi-channel UNION with DUAL ranks per channel (quantity-ratio
#         and currency-ratio rank over the same partition).
#   Q51 — two cumulative (running-total) series FULL OUTER JOINed and
#         compared row-by-row.
#   Q67 — rank-per-category over a 3-level ROLLUP's mixed grouping levels.
# Determinism: money in integer cents, every ratio ONE double division of
# exact bigints, every rank fully tie-broken (unique key last), NULLS
# pinned explicitly wherever a rollup NULL can enter an ORDER BY (Spark
# defaults NULLS FIRST on ASC where DuckDB defaults NULLS LAST — never
# rely on the default).

_QDS36 = """
WITH m AS (
    SELECT p.p_brand, p.p_type,
           CAST(GROUPING(p.p_brand) AS BIGINT) + CAST(GROUPING(p.p_type) AS BIGINT)
               AS lochierarchy,
           CAST(GROUPING(p.p_type) AS BIGINT) AS g_type,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS disc_cents,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS base_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY ROLLUP(p.p_brand, p.p_type)
)
SELECT p_brand, p_type, lochierarchy, disc_cents, base_cents,
       ROUND(CAST(disc_cents AS DOUBLE) / base_cents, 6) AS gross_margin,
       CAST(RANK() OVER (
           PARTITION BY lochierarchy,
                        CASE WHEN g_type = 0 THEN p_brand END
           ORDER BY CAST(disc_cents AS DOUBLE) / base_cents ASC,
                    p_brand ASC NULLS FIRST, p_type ASC NULLS FIRST
       ) AS BIGINT) AS rank_within_parent
FROM m
"""

_QDS44 = """
WITH perf AS (
    SELECT l_partkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem GROUP BY l_partkey
),
best AS (
    SELECT l_partkey, rev_cents,
           CAST(ROW_NUMBER() OVER (ORDER BY rev_cents DESC, l_partkey)
               AS BIGINT) AS rn
    FROM perf
),
worst AS (
    SELECT l_partkey, rev_cents,
           CAST(ROW_NUMBER() OVER (ORDER BY rev_cents ASC, l_partkey)
               AS BIGINT) AS rn
    FROM perf
)
SELECT b.rn AS rnk,
       pb.p_name AS best_performing, b.rev_cents AS best_cents,
       pw.p_name AS worst_performing, w.rev_cents AS worst_cents
FROM best b
JOIN worst w ON b.rn = w.rn
JOIN part pb ON pb.p_partkey = b.l_partkey
JOIN part pw ON pw.p_partkey = w.l_partkey
WHERE b.rn <= 10
"""

_QDS49 = """
WITH base AS (
    SELECT l_linestatus AS channel, l_partkey,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                         THEN CAST(ROUND(l_quantity, 0) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS ret_qty,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                         THEN CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS ret_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS cents
    FROM lineitem
    GROUP BY l_linestatus, l_partkey
),
ranked AS (
    SELECT channel, l_partkey, ret_qty, qty, ret_cents, cents,
           CAST(RANK() OVER (PARTITION BY channel
                             ORDER BY CAST(ret_qty AS DOUBLE) / qty DESC,
                                      l_partkey) AS BIGINT) AS qty_rank,
           CAST(RANK() OVER (PARTITION BY channel
                             ORDER BY CAST(ret_cents AS DOUBLE) / cents DESC,
                                      l_partkey) AS BIGINT) AS amt_rank
    FROM base
)
SELECT channel, l_partkey, ret_qty, qty, ret_cents, cents,
       qty_rank, amt_rank,
       ROUND(CAST(ret_qty AS DOUBLE) / qty, 6) AS return_ratio,
       ROUND(CAST(ret_cents AS DOUBLE) / cents, 6) AS currency_ratio
FROM ranked
WHERE qty_rank <= 10 OR amt_rank <= 10
"""

_QDS51 = """
WITH a AS (
    SELECT l_suppkey,
           CAST(EXTRACT(YEAR FROM l_shipdate) * 100
                + EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS ym,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS cents
    FROM lineitem WHERE l_returnflag = 'A'
    GROUP BY l_suppkey, CAST(EXTRACT(YEAR FROM l_shipdate) * 100
                             + EXTRACT(MONTH FROM l_shipdate) AS BIGINT)
),
r AS (
    SELECT l_suppkey,
           CAST(EXTRACT(YEAR FROM l_shipdate) * 100
                + EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS ym,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS cents
    FROM lineitem WHERE l_returnflag = 'R'
    GROUP BY l_suppkey, CAST(EXTRACT(YEAR FROM l_shipdate) * 100
                             + EXTRACT(MONTH FROM l_shipdate) AS BIGINT)
),
ac AS (
    SELECT l_suppkey, ym,
           CAST(SUM(cents) OVER (PARTITION BY l_suppkey ORDER BY ym)
               AS BIGINT) AS cum
    FROM a
),
rc AS (
    SELECT l_suppkey, ym,
           CAST(SUM(cents) OVER (PARTITION BY l_suppkey ORDER BY ym)
               AS BIGINT) AS cum
    FROM r
)
SELECT COALESCE(ac.l_suppkey, rc.l_suppkey) AS suppkey,
       COALESCE(ac.ym, rc.ym) AS ym,
       ac.cum AS cum_accepted, rc.cum AS cum_returned
FROM ac FULL OUTER JOIN rc
  ON ac.l_suppkey = rc.l_suppkey AND ac.ym = rc.ym
WHERE COALESCE(rc.cum, 0) > COALESCE(ac.cum, 0)
"""

_QDS67 = """
WITH base AS (
    SELECT p.p_brand AS brand, CAST(p.p_size AS BIGINT) AS psize,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr,
           CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
),
agg AS (
    SELECT brand, psize, yr,
           CAST(GROUPING(psize) AS BIGINT) AS g_size,
           CAST(GROUPING(yr) AS BIGINT) AS g_yr,
           CAST(SUM(cents) AS BIGINT) AS sales_cents
    FROM base GROUP BY ROLLUP(brand, psize, yr)
)
SELECT brand, psize, yr, g_size, g_yr, sales_cents, rk
FROM (
    SELECT *,
           CAST(RANK() OVER (
               PARTITION BY brand
               ORDER BY sales_cents DESC, g_size ASC, g_yr ASC,
                        psize ASC NULLS FIRST, yr ASC NULLS FIRST
           ) AS BIGINT) AS rk
    FROM agg
) t
WHERE rk <= 5
"""

register("sql_tpcds_q36", oracle=_QDS36)(_sql_plan(_QDS36))
register("sql_tpcds_q44", oracle=_QDS44)(_sql_plan(_QDS44))
register("sql_tpcds_q49", oracle=_QDS49)(_sql_plan(_QDS49))
register("sql_tpcds_q51", oracle=_QDS51)(_sql_plan(_QDS51))
register("sql_tpcds_q67", oracle=_QDS67)(_sql_plan(_QDS67))


# --- TPC-DS mini-family, round-13 widening (beyond the r12 five) ----------
# Same discipline: ONE SQL string runs verbatim through spark.sql AND
# DuckDB (the oracle IS the query), money as bigint cents, ranks with
# unique-key tie-breaks, double division only in final ROUND(...,6)
# projections (the _QDS36 precedent).

# Q42/Q52 shape: monthly brand revenue with a rank-per-month top-10 —
# the classic star-join + date-filter + per-group leaderboard. Filters
# reach the orders scan; the dim join broadcasts.
_QDS42 = """
WITH m AS (
    SELECT EXTRACT(month FROM o.o_orderdate) AS moy, p.p_brand,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                               * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY EXTRACT(month FROM o.o_orderdate), p.p_brand
),
r AS (
    SELECT CAST(moy AS BIGINT) AS moy, p_brand, rev_cents,
           CAST(RANK() OVER (PARTITION BY moy
                             ORDER BY rev_cents DESC, p_brand)
               AS BIGINT) AS rnk
    FROM m
)
SELECT moy, p_brand, rev_cents, rnk FROM r WHERE rnk <= 10
"""

# Q34/Q73 shape: frequent-buyer detection — per-customer order counts in
# a window, band filter, name join (the "households buying 15-20 times"
# pattern). One agg shuffle + one broadcast-able dim join.
_QDS34 = """
WITH oc AS (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, oc.cnt
FROM oc JOIN customer c ON oc.o_custkey = c.c_custkey
WHERE oc.cnt BETWEEN 4 AND 10
"""

# Q89 shape: months whose category revenue runs below the category's
# yearly average — windowed total/count instead of AVG so the comparison
# stays in exact integers; the ratio is the only double, in a final
# ROUND projection.
_QDS89 = """
WITH m AS (
    SELECT p.p_type, EXTRACT(month FROM o.o_orderdate) AS moy,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                               * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY p.p_type, EXTRACT(month FROM o.o_orderdate)
),
a AS (
    SELECT p_type, CAST(moy AS BIGINT) AS moy, rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY p_type) AS BIGINT)
               AS tot_cents,
           CAST(COUNT(*) OVER (PARTITION BY p_type) AS BIGINT) AS n_months
    FROM m
)
SELECT p_type, moy, rev_cents,
       ROUND(CAST(rev_cents AS DOUBLE) * n_months / tot_cents, 6)
           AS ratio_to_avg
FROM a
WHERE rev_cents * n_months < tot_cents
"""

# Q93 shape: returns-adjusted net activity per supplier — returned lines
# subtract instead of add (one conditional aggregation, map-side
# combinable; quantities are whole-number doubles, cast exact).
_QDS93 = """
SELECT l_suppkey,
       CAST(SUM(CASE WHEN l_returnflag = 'R'
                     THEN -CAST(l_quantity AS BIGINT)
                     ELSE CAST(l_quantity AS BIGINT) END) AS BIGINT)
           AS net_qty,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returned,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem GROUP BY l_suppkey
"""

# Q88 shape: one wide row of time-band counters over the event stream —
# eight conditional aggregations in a single scan (TPC-DS runs eight
# scalar subqueries; conditional aggregation is the plan a columnar
# engine should produce for it, one pass instead of eight).
_QDS88 = """
SELECT
    CAST(SUM(CASE WHEN h >= 0  AND h < 3  THEN 1 ELSE 0 END) AS BIGINT) AS h00_03,
    CAST(SUM(CASE WHEN h >= 3  AND h < 6  THEN 1 ELSE 0 END) AS BIGINT) AS h03_06,
    CAST(SUM(CASE WHEN h >= 6  AND h < 9  THEN 1 ELSE 0 END) AS BIGINT) AS h06_09,
    CAST(SUM(CASE WHEN h >= 9  AND h < 12 THEN 1 ELSE 0 END) AS BIGINT) AS h09_12,
    CAST(SUM(CASE WHEN h >= 12 AND h < 15 THEN 1 ELSE 0 END) AS BIGINT) AS h12_15,
    CAST(SUM(CASE WHEN h >= 15 AND h < 18 THEN 1 ELSE 0 END) AS BIGINT) AS h15_18,
    CAST(SUM(CASE WHEN h >= 18 AND h < 21 THEN 1 ELSE 0 END) AS BIGINT) AS h18_21,
    CAST(SUM(CASE WHEN h >= 21 AND h < 24 THEN 1 ELSE 0 END) AS BIGINT) AS h21_24
FROM (SELECT EXTRACT(hour FROM ts) AS h FROM events) t
"""

register("sql_tpcds_q34", oracle=_QDS34)(_sql_plan(_QDS34))
register("sql_tpcds_q42", oracle=_QDS42)(_sql_plan(_QDS42))
register("sql_tpcds_q88", oracle=_QDS88)(_sql_plan(_QDS88))
register("sql_tpcds_q89", oracle=_QDS89)(_sql_plan(_QDS89))
register("sql_tpcds_q93", oracle=_QDS93)(_sql_plan(_QDS93))


# --- TPC-DS mini-family, round-14 widening (beyond the r13 five) ----------
# Same discipline as the r12/r13 blocks: ONE SQL string runs verbatim
# through spark.sql AND DuckDB, money as bigint cents, double division
# only in final single-op ROUND(...,6) projections, deterministic output
# sets (no LIMIT without a unique-key tie-break). Weekday-based shapes
# are adapted to day-of-month bands: EXTRACT(dow) numbers Sunday
# differently across engines (DuckDB 0-6 vs Spark's DAYOFWEEK 1-7) while
# EXTRACT(day/month/year) agree exactly.

# Q43 shape: banded-period revenue pivot per supplier — the
# weekday-pivot star query as one conditional aggregation over a single
# scan (TPC-DS spells it as 7 SUM(CASE) columns; 3 day-bands keep the
# shape and the one-pass plan).
_QDS43 = """
SELECT l_suppkey,
       CAST(SUM(CASE WHEN d <= 10 THEN cents ELSE 0 END) AS BIGINT)
           AS rev_d01_10,
       CAST(SUM(CASE WHEN d > 10 AND d <= 20 THEN cents ELSE 0 END)
            AS BIGINT) AS rev_d11_20,
       CAST(SUM(CASE WHEN d > 20 THEN cents ELSE 0 END) AS BIGINT)
           AS rev_d21_31,
       CAST(SUM(cents) AS BIGINT) AS rev_total
FROM (
    SELECT l_suppkey, EXTRACT(day FROM l_shipdate) AS d,
           CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                AS BIGINT) AS cents
    FROM lineitem
) t
GROUP BY l_suppkey
"""

# Q65 shape: (supplier, part) pairs whose revenue runs under half the
# supplier's per-part average — windowed exact total/count instead of
# AVG so the band test stays in integers; the ratio is the only double.
_QDS65 = """
WITH si AS (
    SELECT l_suppkey, l_partkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100,
                               0) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem GROUP BY l_suppkey, l_partkey
),
w AS (
    SELECT l_suppkey, l_partkey, rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY l_suppkey) AS BIGINT)
               AS tot_cents,
           CAST(COUNT(*) OVER (PARTITION BY l_suppkey) AS BIGINT)
               AS n_parts
    FROM si
)
SELECT l_suppkey, l_partkey, rev_cents,
       ROUND(CAST(rev_cents AS DOUBLE) * n_parts / tot_cents, 6)
           AS ratio_to_avg
FROM w WHERE rev_cents * n_parts * 2 < tot_cents
"""

# Q98 shape: per-item revenue share within its class — one star join,
# one agg, one window sum; the share division is a single deterministic
# FP op over two exact integers.
_QDS98 = """
WITH pr AS (
    SELECT p.p_type, p.p_partkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                               * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY p.p_type, p.p_partkey
)
SELECT p_type, p_partkey, rev_cents,
       ROUND(CAST(rev_cents AS DOUBLE)
             / CAST(SUM(rev_cents) OVER (PARTITION BY p_type) AS BIGINT),
             6) AS class_share
FROM pr
"""

# Q59 shape: year-over-year month revenue comparison — the weekly
# self-join adapted to months (portable EXTRACT fields); both years'
# aggregates come from ONE grouped pass, then a keyed self-join.
_QDS59 = """
WITH m AS (
    SELECT o_orderpriority, EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS moy,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderpriority, EXTRACT(year FROM o_orderdate),
             EXTRACT(month FROM o_orderdate)
)
SELECT a.o_orderpriority, CAST(a.moy AS BIGINT) AS moy,
       a.rev_cents AS rev_1996_cents, b.rev_cents AS rev_1997_cents,
       ROUND(CAST(b.rev_cents AS DOUBLE) / a.rev_cents, 6) AS yoy_ratio
FROM m a
JOIN m b ON a.o_orderpriority = b.o_orderpriority AND a.moy = b.moy
WHERE a.yr = 1996 AND b.yr = 1997
"""

# Q79/Q68 shape: multi-line "shopping trips" in a quarter, joined back
# to the customer dimension — per-order agg shuffle + one
# broadcast-able dim join, band filter on the line count.
_QDS79 = """
WITH t AS (
    SELECT o.o_orderkey, o.o_custkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                               * 100, 0) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_custkey
)
SELECT c.c_custkey, c.c_name, t.o_orderkey, t.total_cents, t.n_lines
FROM t JOIN customer c ON t.o_custkey = c.c_custkey
WHERE t.n_lines >= 5
"""

register("sql_tpcds_q43", oracle=_QDS43)(_sql_plan(_QDS43))
register("sql_tpcds_q59", oracle=_QDS59)(_sql_plan(_QDS59))
register("sql_tpcds_q65", oracle=_QDS65)(_sql_plan(_QDS65))
register("sql_tpcds_q79", oracle=_QDS79)(_sql_plan(_QDS79))
register("sql_tpcds_q98", oracle=_QDS98)(_sql_plan(_QDS98))


# --- TPC-DS mini-family, round-15 widening: set-operation grammar ---------
# VERDICT r14 #6: the 20 prior shapes never exercise INTERSECT / EXCEPT /
# multi-channel UNION ALL — the grammar of TPC-DS Q8/Q14/Q38/Q87/Q71.
# Same discipline as every shape before: ONE SQL string runs verbatim
# through spark.sql AND DuckDB (the oracle IS the query), money as bigint
# cents, unique-key tie-breaks. Both engines give set operations DISTINCT
# semantics by default, so every branch is deterministic row-set algebra.
# The TPC-H-ish corpus has no store/catalog/web channels; o_orderpriority
# bands stand in as the three "channels" throughout.

# Q8 shape: an aggregate restricted by IN over an INTERSECT of two dim
# subqueries (TPC-DS: store zips ∩ preferred-customer zips; here:
# supplier nations ∩ high-balance-customer nations). Catalyst plans the
# INTERSECT as a left-semi chain over the two tiny dim scans; the
# restriction then semi-joins the fact side before the agg shuffle.
_QDS8 = """
WITH hot_nations AS (
    SELECT n_nationkey, n_name
    FROM nation JOIN supplier ON s_nationkey = n_nationkey
    INTERSECT
    SELECT n_nationkey, n_name
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    WHERE c_acctbal > 5000
)
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_nationkey IN (SELECT n_nationkey FROM hot_nations)
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""

# Q14 shape: cross_items = parts sold through ALL three channels (a
# 3-way INTERSECT), then per-channel revenue over just those parts —
# the cross-channel comparison grammar. The INTERSECT runs over three
# DISTINCT projections of the fact join (shuffle on l_partkey); the
# final pass semi-joins the fact scan against the small cross-items set.
_QDS14 = """
WITH sold AS (
    SELECT l.l_partkey, o.o_orderpriority AS channel,
           CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                AS BIGINT) AS cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
cross_items AS (
    SELECT l_partkey FROM sold WHERE channel = '1-URGENT'
    INTERSECT
    SELECT l_partkey FROM sold WHERE channel = '2-HIGH'
    INTERSECT
    SELECT l_partkey FROM sold WHERE channel = '3-MEDIUM'
)
SELECT channel, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS rev_cents
FROM sold
WHERE channel IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
  AND l_partkey IN (SELECT l_partkey FROM cross_items)
GROUP BY channel
"""

# Q38 shape: how many customers are active in EVERY period — a 3-way
# INTERSECT of DISTINCT customer sets, counted. Each branch is one
# dedup shuffle on o_custkey; the intersect chain is left-semi joins
# over already-distinct sets (no row explosion anywhere).
_QDS38 = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_loyal
FROM (
    SELECT o_custkey FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
) loyal
"""

# Q87 shape: Q38's dual — customers in the FIRST period and none of the
# later ones (EXCEPT chain), counted. Left-anti joins over distinct
# sets; with Q38 the pair covers both set-difference directions.
_QDS87 = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_churned
FROM (
    SELECT o_custkey FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
) churned
"""

# Q71 shape: one leaderboard over the UNION ALL of three channel
# slices — the multi-channel revenue union. Each branch keeps its
# channel tag; the union feeds ONE agg shuffle (Spark pushes the
# partial aggregation below the union), then a rank with a unique
# tie-break.
_QDS71 = """
WITH sales AS (
    SELECT 'urgent' AS channel, p.p_brand,
           EXTRACT(MONTH FROM o.o_orderdate) AS moy,
           CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE o.o_orderpriority = '1-URGENT'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    UNION ALL
    SELECT 'high' AS channel, p.p_brand,
           EXTRACT(MONTH FROM o.o_orderdate) AS moy,
           CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE o.o_orderpriority = '2-HIGH'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    UNION ALL
    SELECT 'routine' AS channel, p.p_brand,
           EXTRACT(MONTH FROM o.o_orderdate) AS moy,
           CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
),
agg AS (
    SELECT channel, p_brand, CAST(moy AS BIGINT) AS moy,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM sales GROUP BY channel, p_brand, moy
)
SELECT channel, p_brand, moy, rev_cents, rnk
FROM (
    SELECT *, CAST(RANK() OVER (PARTITION BY channel, moy
                                ORDER BY rev_cents DESC, p_brand)
                  AS BIGINT) AS rnk
    FROM agg
) t
WHERE rnk <= 5
"""

register("sql_tpcds_q8", oracle=_QDS8)(_sql_plan(_QDS8))
register("sql_tpcds_q14", oracle=_QDS14)(_sql_plan(_QDS14))
register("sql_tpcds_q38", oracle=_QDS38)(_sql_plan(_QDS38))
register("sql_tpcds_q71", oracle=_QDS71)(_sql_plan(_QDS71))
register("sql_tpcds_q87", oracle=_QDS87)(_sql_plan(_QDS87))


# Q74 shape (the q4/q11/q74 year-over-year family, new grammar r15):
# one aggregated CTE self-joined FOUR ways — per-customer yearly totals
# in two "channels" (urgent vs other order priority, the q71 channel
# emulation) × two years — keeping customers whose urgent-channel
# growth outpaced their other-channel growth. The ratio comparison is
# integer cross-multiplication (u2/u1 > o2/o1 ⟺ u2*o1 > o2*u1 for
# positive denominators), so no FP touches the predicate. Catalyst
# plans the four self-joins off one shuffle of the CTE; the official
# q74 divides decimals here.
_QDS74 = """
WITH year_total AS (
    SELECT o_custkey, EXTRACT(YEAR FROM o_orderdate) AS yr,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
                ELSE 'other' END AS channel,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders
    WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)
    GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate),
             CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
                  ELSE 'other' END
)
SELECT u1.o_custkey AS o_custkey,
       u1.cents AS urgent_1995, u2.cents AS urgent_1996,
       o1.cents AS other_1995, o2.cents AS other_1996
FROM year_total u1
JOIN year_total u2 ON u1.o_custkey = u2.o_custkey
JOIN year_total o1 ON u1.o_custkey = o1.o_custkey
JOIN year_total o2 ON u1.o_custkey = o2.o_custkey
WHERE u1.channel = 'urgent' AND u1.yr = 1995
  AND u2.channel = 'urgent' AND u2.yr = 1996
  AND o1.channel = 'other'  AND o1.yr = 1995
  AND o2.channel = 'other'  AND o2.yr = 1996
  AND u1.cents > 0 AND o1.cents > 0
  AND u2.cents * o1.cents > o2.cents * u1.cents
ORDER BY o_custkey
"""

# Q47 shape (the q47/q57 time-series deviation family, new grammar
# r15): windowed LAG/LEAD plus a deviation-from-partition-mean filter
# over an aggregated CTE. The mean never materializes as a double: the
# predicate |cents - tot/n| > (tot/n)/10 is cross-multiplied to
# 10*|n*cents - tot| > tot, and the ordering key |n*cents - tot| is
# the same integer. LAG/LEAD get COALESCE(…, 0) so the frame edges
# stay non-NULL (bigint-exact on both engines).
_QDS47 = """
WITH monthly AS (
    SELECT p.p_brand, EXTRACT(MONTH FROM o.o_orderdate) AS moy,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100,
                               0) AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1996
    GROUP BY p.p_brand, EXTRACT(MONTH FROM o.o_orderdate)
),
w AS (
    SELECT p_brand, moy, cents,
           CAST(SUM(cents) OVER (PARTITION BY p_brand) AS BIGINT) AS tot,
           CAST(COUNT(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n,
           CAST(COALESCE(LAG(cents) OVER (PARTITION BY p_brand
                                          ORDER BY moy), 0)
                AS BIGINT) AS prev_cents,
           CAST(COALESCE(LEAD(cents) OVER (PARTITION BY p_brand
                                           ORDER BY moy), 0)
                AS BIGINT) AS next_cents
    FROM monthly
)
SELECT p_brand, CAST(moy AS BIGINT) AS moy, cents, prev_cents, next_cents
FROM w
WHERE n = 12 AND 10 * abs(n * cents - tot) > tot
ORDER BY abs(n * cents - tot) DESC, p_brand, moy
LIMIT 100
"""

register("sql_tpcds_q74", oracle=_QDS74)(_sql_plan(_QDS74))
register("sql_tpcds_q47", oracle=_QDS47)(_sql_plan(_QDS47))


# Q10 shape (the q10/q35/q69 demographic-activity family, new grammar
# r15 third wave): correlated EXISTS under a DISJUNCTION — customers
# active in a base channel AND present in at least one of two other
# channels, counted per demographic cell. The official q10 is exactly
# this (store_sales EXISTS and (web EXISTS or catalog EXISTS)); prior
# shapes used EXISTS only conjunctively, which Catalyst rewrites to
# plain semi-joins — the disjunction forces ExistenceJoin planning
# (semi-join flags OR-ed in the filter), grammar nothing else here
# exercises.
_QDS10 = """
SELECT c.c_mktsegment, CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND EXTRACT(YEAR FROM o.o_orderdate) = 1995
      )
  AND (EXISTS (
         SELECT 1 FROM orders o
         WHERE o.o_custkey = c.c_custkey
           AND o.o_orderpriority = '1-URGENT'
       )
       OR EXISTS (
         SELECT 1 FROM orders o
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
       ))
GROUP BY c.c_mktsegment, c.c_nationkey
ORDER BY c_mktsegment, c_nationkey
"""

# Q75 shape (prior-year decline report, new grammar r15 third wave):
# a UNION ALL of per-channel fact slices re-aggregated, self-joined
# cur-year vs prev-year on the brand key, keeping brands whose volume
# SHRANK, emitting the deltas. The official q75 unions three channels
# minus returns and sorts by the quantity decrease; the channel split
# here is returned-vs-kept lines (the q8/q71 channel emulation), and
# every measure is integer (quantities are whole-number doubles,
# money in cents) so the deltas are exact.
_QDS75 = """
WITH chan AS (
    SELECT p.p_brand, EXTRACT(YEAR FROM o.o_orderdate) AS yr,
           CAST(ROUND(l.l_quantity, 0) AS BIGINT) AS qty,
           CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_returnflag <> 'R'
      AND EXTRACT(YEAR FROM o.o_orderdate) IN (1995, 1996)
    UNION ALL
    SELECT p.p_brand, EXTRACT(YEAR FROM o.o_orderdate) AS yr,
           -CAST(ROUND(l.l_quantity, 0) AS BIGINT) AS qty,
           -CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                 AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_returnflag = 'R'
      AND EXTRACT(YEAR FROM o.o_orderdate) IN (1995, 1996)
),
tot AS (
    SELECT p_brand, yr,
           CAST(SUM(qty) AS BIGINT) AS qty,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM chan GROUP BY p_brand, yr
)
SELECT cur.p_brand,
       prev.qty AS prev_qty, cur.qty AS cur_qty,
       cur.qty - prev.qty AS qty_delta,
       cur.cents - prev.cents AS cents_delta
FROM tot cur
JOIN tot prev ON cur.p_brand = prev.p_brand
WHERE cur.yr = 1996 AND prev.yr = 1995 AND cur.qty < prev.qty
ORDER BY qty_delta, cents_delta, cur.p_brand
LIMIT 100
"""

# Q77 shape (multi-channel profit-and-returns report, new grammar r15
# third wave): per-channel sales and returns CTEs stitched with LEFT
# and FULL OUTER joins (a key can have returns but no sales — the FULL
# OUTER keeps it, COALESCE zero-fills both sides), UNION ALL-ed into a
# channel fact, then ROLLUP over (channel, id) with GROUPING() flags —
# the official q77's exact skeleton. The supplier channel joins on
# l_suppkey, the part channel on a part-id bucket.
_QDS77 = """
WITH ss AS (
    SELECT CAST(l_suppkey AS BIGINT) AS id,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS sales_cents
    FROM lineitem WHERE l_returnflag <> 'R' GROUP BY l_suppkey
),
sr AS (
    SELECT CAST(l_suppkey AS BIGINT) AS id,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS returns_cents
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_suppkey
),
ps AS (
    SELECT CAST(l_partkey % 25 AS BIGINT) AS id,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS sales_cents
    FROM lineitem WHERE l_returnflag <> 'R' GROUP BY l_partkey % 25
),
pr AS (
    SELECT CAST(l_partkey % 25 AS BIGINT) AS id,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS returns_cents
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey % 25
),
chan AS (
    SELECT 'supplier' AS channel, ss.id,
           ss.sales_cents, COALESCE(sr.returns_cents, 0) AS returns_cents
    FROM ss LEFT JOIN sr ON ss.id = sr.id
    UNION ALL
    SELECT 'part' AS channel, COALESCE(ps.id, pr.id) AS id,
           COALESCE(ps.sales_cents, 0) AS sales_cents,
           COALESCE(pr.returns_cents, 0) AS returns_cents
    FROM ps FULL OUTER JOIN pr ON ps.id = pr.id
)
SELECT COALESCE(channel, 'ALL') AS channel,
       CAST(COALESCE(id, -1) AS BIGINT) AS id,
       CAST(GROUPING(channel) AS BIGINT) AS g_chan,
       CAST(GROUPING(id) AS BIGINT) AS g_id,
       CAST(SUM(sales_cents) AS BIGINT) AS sales_cents,
       CAST(SUM(returns_cents) AS BIGINT) AS returns_cents,
       CAST(SUM(sales_cents) - SUM(returns_cents) AS BIGINT) AS profit_cents
FROM chan
GROUP BY ROLLUP(channel, id)
ORDER BY channel, g_id, id
LIMIT 200
"""

# Q31 shape (the consecutive-period share-growth family, new grammar
# r15 third wave): ONE aggregated CTE instantiated SIX ways — two
# channels x three consecutive quarters — keeping the groups whose
# first channel grew faster than the second in BOTH transitions. The
# growth comparison is integer cross-multiplication twice over
# (u2·o1 > o2·u1 and u3·o2 > o3·u2), so as in q74 no FP touches the
# predicate; the official q31 compares web/store share growth across
# county quarters with decimal division.
_QDS31 = """
WITH qsales AS (
    SELECT c.c_nationkey AS nat,
           EXTRACT(QUARTER FROM o.o_orderdate) AS qtr,
           CASE WHEN o.o_orderpriority = '1-URGENT' THEN 'urgent'
                ELSE 'other' END AS channel,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1995
      AND EXTRACT(QUARTER FROM o.o_orderdate) IN (1, 2, 3)
    GROUP BY c.c_nationkey, EXTRACT(QUARTER FROM o.o_orderdate),
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 'urgent'
                  ELSE 'other' END
)
SELECT u1.nat AS nat,
       u1.cents AS urgent_q1, u2.cents AS urgent_q2, u3.cents AS urgent_q3,
       o1.cents AS other_q1, o2.cents AS other_q2, o3.cents AS other_q3
FROM qsales u1
JOIN qsales u2 ON u1.nat = u2.nat
JOIN qsales u3 ON u1.nat = u3.nat
JOIN qsales o1 ON u1.nat = o1.nat
JOIN qsales o2 ON u1.nat = o2.nat
JOIN qsales o3 ON u1.nat = o3.nat
WHERE u1.channel = 'urgent' AND u1.qtr = 1
  AND u2.channel = 'urgent' AND u2.qtr = 2
  AND u3.channel = 'urgent' AND u3.qtr = 3
  AND o1.channel = 'other' AND o1.qtr = 1
  AND o2.channel = 'other' AND o2.qtr = 2
  AND o3.channel = 'other' AND o3.qtr = 3
  AND u1.cents > 0 AND o1.cents > 0 AND u2.cents > 0 AND o2.cents > 0
  AND u2.cents * o1.cents > o2.cents * u1.cents
  AND u3.cents * o2.cents > o3.cents * u2.cents
ORDER BY nat
"""

register("sql_tpcds_q10", oracle=_QDS10)(_sql_plan(_QDS10))
register("sql_tpcds_q75", oracle=_QDS75)(_sql_plan(_QDS75))
register("sql_tpcds_q77", oracle=_QDS77)(_sql_plan(_QDS77))
register("sql_tpcds_q31", oracle=_QDS31)(_sql_plan(_QDS31))


# Q95 shape (promising-order-count family, new grammar r15 third wave):
# a CTE referenced from inside TWO different correlated EXISTS
# subqueries — the official q95's skeleton (ws_wh = same-order
# different-warehouse sales pairs, probed by both the sales EXISTS and
# the returns-join EXISTS). Prior shapes bind CTEs only in FROM
# position; Catalyst must plan the shared CTE under two ExistenceJoin
# rewrites. Emulation: multi-supplier orders stand in for
# multi-warehouse shipments, returned lines for web returns.
_QDS95 = """
WITH multi_supp AS (
    SELECT DISTINCT l1.l_orderkey
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
)
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
FROM orders o
WHERE EXISTS (SELECT 1 FROM multi_supp m
              WHERE m.l_orderkey = o.o_orderkey)
  AND EXISTS (SELECT 1 FROM lineitem l
              JOIN multi_supp m2 ON m2.l_orderkey = l.l_orderkey
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
ORDER BY o_orderpriority
"""

# Aggregate FILTER clause (SQL:2003 T612, new grammar r15 third wave):
# per-group conditional aggregates without CASE gymnastics — COUNT/SUM/
# COUNT(DISTINCT) each under their own FILTER (WHERE ...). Both engines
# support the clause natively; the distinct-count-under-filter is the
# shape CASE WHEN cannot express without a nested subquery.
_QFILTER = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (WHERE o.o_orderpriority = '1-URGENT')
            AS BIGINT) AS n_urgent,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
            FILTER (WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1995)
            AS BIGINT) AS cents_1995,
       CAST(COUNT(DISTINCT o.o_custkey)
            FILTER (WHERE o.o_orderstatus = 'F') AS BIGINT) AS custs_f
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
ORDER BY c_mktsegment
"""

register("sql_tpcds_q95", oracle=_QDS95)(_sql_plan(_QDS95))
register("sql_agg_filter", oracle=_QFILTER)(_sql_plan(_QFILTER))


# --- r16: the correlated-SCALAR-AGGREGATE grammar family (VERDICT r15
# #6) — the one TPC-DS subquery class the 27 prior shapes never touch:
# a scalar aggregate subquery correlated to the outer row used INSIDE
# the WHERE predicate. All threshold comparisons are integer
# cross-multiplications over cents (avg = sum/count is never divided —
# `x > k/10 * sum/cnt` becomes `x*cnt*10 > k*sum`), so no FP boundary
# can flip a row between engines (the q74/q31 rule). ---

# Q6 shape (official q6: customers in states buying items priced over
# 1.2x their category's average, month pinned by an UNCORRELATED
# scalar subquery): nations stand in for states, brands for
# categories. Grammar: one uncorrelated scalar subquery (the year pin)
# + TWO correlated scalar aggregates (COUNT and SUM re-expressing the
# AVG threshold exactly) + HAVING. The synthetic price band is
# 900-999.9 (max/avg within a brand ~1.06), so the official 1.2x
# multiplier would be vacuous — 1.04x keeps the identical grammar with
# real selectivity (~1k qualifying lines at sf0.01).
_QDS6 = """
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS cnt
FROM nation n
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE EXTRACT(YEAR FROM o.o_orderdate) =
        (SELECT MIN(EXTRACT(YEAR FROM o2.o_orderdate)) FROM orders o2)
  AND CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT)
        * (SELECT COUNT(*) FROM part p2 WHERE p2.p_brand = p.p_brand)
        * 100
      > 104 * (SELECT CAST(SUM(CAST(ROUND(p2.p_retailprice * 100, 0)
                                    AS BIGINT)) AS BIGINT)
               FROM part p2 WHERE p2.p_brand = p.p_brand)
GROUP BY n.n_name
HAVING COUNT(*) >= 5
ORDER BY cnt, n_name
"""

# Q32 shape (official q32: "excess discount" — catalog lines whose
# discount exceeds 1.3x the item's average discount, summed): lines
# whose discount amount beats 1.3x their PART's average discount
# amount. Grammar: the correlated scalar aggregate lives in the WHERE
# of an outer GLOBAL aggregate (one output row) — Catalyst plans the
# correlated pair as aggregated subquery joins under a final
# single-group HashAggregate.
_QDS32 = """
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * l.l_discount * 100, 0)
                     AS BIGINT)) AS BIGINT) AS excess_discount_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size BETWEEN 1 AND 10
  AND CAST(ROUND(l.l_extendedprice * l.l_discount * 100, 0) AS BIGINT)
        * (SELECT COUNT(*) FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey)
        * 10
      > 13 * (SELECT CAST(SUM(CAST(ROUND(l2.l_extendedprice
                                         * l2.l_discount * 100, 0)
                                   AS BIGINT)) AS BIGINT)
              FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""

# Q92 shape (official q92: the q32 skeleton on web_sales with the SAME
# date window pinned inside and outside the correlated subquery — the
# hallmark that makes the correlation a filtered self-slice, not the
# whole fact): orders whose value beats 1.3x their customer's 1995
# average, where BOTH the outer scan and the correlated aggregate see
# only the 1995 window.
_QDS92 = """
SELECT CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
            AS BIGINT) AS excess_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1995
  AND CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)
        * (SELECT COUNT(*) FROM orders o2
           WHERE o2.o_custkey = o.o_custkey
             AND EXTRACT(YEAR FROM o2.o_orderdate) = 1995)
        * 10
      > 13 * (SELECT CAST(SUM(CAST(ROUND(o2.o_totalprice * 100, 0)
                                   AS BIGINT)) AS BIGINT)
              FROM orders o2
              WHERE o2.o_custkey = o.o_custkey
                AND EXTRACT(YEAR FROM o2.o_orderdate) = 1995)
"""

# Q41 shape (official q41: distinct product names whose manufacturer
# ALSO makes an item matching one of several deeply OR-ed attribute
# combinations — a correlated COUNT(*) > 0 confined entirely to the
# DIM table): brands stand in for manufacturers, (p_type, p_size)
# bands for the unit/size combos. Grammar: the correlated aggregate
# compares > 0 (an EXISTS spelled as a scalar agg — engines must NOT
# need the user to rewrite it), with a disjunctive predicate inside
# the subquery only.
_QDS41 = """
SELECT p1.p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM part p1
WHERE p1.p_size BETWEEN 1 AND 25
  AND (SELECT COUNT(*) FROM part p2
       WHERE p2.p_brand = p1.p_brand
         AND ((p2.p_type LIKE 'SMALL%' AND p2.p_size BETWEEN 1 AND 5)
           OR (p2.p_type LIKE 'LARGE%' AND p2.p_size BETWEEN 10 AND 15)
           OR (p2.p_type LIKE 'STANDARD%' AND p2.p_size BETWEEN 20 AND 25)))
      > 0
GROUP BY p1.p_brand
ORDER BY p_brand
"""

register("sql_tpcds_q6", oracle=_QDS6)(_sql_plan(_QDS6))
register("sql_tpcds_q32", oracle=_QDS32)(_sql_plan(_QDS32))
register("sql_tpcds_q92", oracle=_QDS92)(_sql_plan(_QDS92))
register("sql_tpcds_q41", oracle=_QDS41)(_sql_plan(_QDS41))


# --- r16 second wave: the aggregate-of-aggregate subquery families —
# scalar aggregates over AGGREGATED CTEs (q1/q23), an integer-exact
# coefficient-of-variation filter (q39), and the full-outer channel
# membership matrix (q97). Same one-string discipline; thresholds stay
# integer cross-multiplications. ---

# Q1 shape (official q1: customers whose store returns exceed 1.2x the
# per-store AVERAGE of the returns CTE — the correlated scalar
# aggregate ranges over an AGGREGATED CTE, not a base table, which is
# the grammar q6/q32/q92 do not touch): per-customer returned-line
# totals, kept when 10x the total beats 12x the nation's average,
# expressed as integer cross-multiplication against the nation's COUNT
# and SUM over the same CTE.
_QDS1 = """
WITH cr AS (
    SELECT o.o_custkey AS cust, c.c_nationkey AS nat,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS ret_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE l.l_returnflag = 'R'
    GROUP BY o.o_custkey, c.c_nationkey
)
SELECT cr1.cust, CAST(cr1.nat AS BIGINT) AS nat, cr1.ret_cents
FROM cr cr1
WHERE cr1.ret_cents
        * (SELECT COUNT(*) FROM cr cr2 WHERE cr2.nat = cr1.nat) * 10
      > 12 * (SELECT CAST(SUM(cr2.ret_cents) AS BIGINT) FROM cr cr2
              WHERE cr2.nat = cr1.nat)
ORDER BY cr1.ret_cents DESC, cr1.cust
LIMIT 100
"""

# Q23 shape (official q23: sales restricted to FREQUENT items AND BEST
# customers, where best = spend above 95% of the maximum of an
# aggregated spend CTE): the hallmark is an UNCORRELATED scalar MAX
# over an aggregated CTE inside WHERE, composed with two IN-filters
# over aggregated CTEs — qualification sets, not dims.
_QDS23 = """
WITH freq_parts AS (
    SELECT l_partkey FROM lineitem
    GROUP BY l_partkey HAVING COUNT(*) >= 8
),
spend AS (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
best_cust AS (
    SELECT o_custkey FROM spend
    WHERE cents * 100 > 95 * (SELECT MAX(cents) FROM spend)
)
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100,
                           0) AS BIGINT)) AS BIGINT) AS qualified_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_partkey IN (SELECT l_partkey FROM freq_parts)
  AND o.o_custkey IN (SELECT o_custkey FROM best_cust)
"""

# Q39 shape (official q39: warehouse/item month pairs whose quantity
# coefficient of variation exceeds a bar in BOTH consecutive months):
# the cov = stdev/mean comparison is re-expressed with zero FP — for
# whole-number quantities, cov > 1/2 with sample stdev is
# 4*n*(n*sumsq - sum^2) > (n-1)*sum^2; months pair by self-join. The
# official bar of 1 is vacuous on uniform synthetic quantities (cov
# tops out ~0.9 per supplier-month); 1/2 keeps the identical grammar
# with real selectivity (48 pairs at sf0.01). The grammar: HAVING over
# second-moment aggregates + a self-join keyed on the derived month.
_QDS39 = """
WITH mq AS (
    SELECT l_suppkey AS supp,
           EXTRACT(MONTH FROM l_shipdate) AS mon,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT)
               AS s,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)
                    * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT)
               AS sq
    FROM lineitem
    WHERE EXTRACT(YEAR FROM l_shipdate) = 1995
      AND EXTRACT(MONTH FROM l_shipdate) IN (3, 4)
    GROUP BY l_suppkey, EXTRACT(MONTH FROM l_shipdate)
    HAVING COUNT(*) >= 2
)
SELECT a.supp,
       a.n AS n_m3, a.s AS s_m3,
       b.n AS n_m4, b.s AS s_m4
FROM mq a
JOIN mq b ON a.supp = b.supp
WHERE a.mon = 3 AND b.mon = 4
  AND 4 * a.n * (a.n * a.sq - a.s * a.s) > (a.n - 1) * (a.s * a.s)
  AND 4 * b.n * (b.n * b.sq - b.s * b.s) > (b.n - 1) * (b.s * b.s)
ORDER BY a.supp
"""

# Q97 shape (official q97: store and catalog customer-sale sets FULL
# OUTER joined on the customer key, counted into a both/store-only/
# catalog-only membership matrix — ONE row): channels here are the
# urgent vs non-urgent order populations.
_QDS97 = """
WITH u AS (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
),
r AS (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderpriority <> '1-URGENT'
)
SELECT CAST(SUM(CASE WHEN u.o_custkey IS NOT NULL
                      AND r.o_custkey IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS both_channels,
       CAST(SUM(CASE WHEN u.o_custkey IS NOT NULL
                      AND r.o_custkey IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS urgent_only,
       CAST(SUM(CASE WHEN u.o_custkey IS NULL
                      AND r.o_custkey IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS other_only
FROM u FULL OUTER JOIN r ON u.o_custkey = r.o_custkey
"""

register("sql_tpcds_q1", oracle=_QDS1)(_sql_plan(_QDS1))
register("sql_tpcds_q23", oracle=_QDS23)(_sql_plan(_QDS23))
register("sql_tpcds_q39", oracle=_QDS39)(_sql_plan(_QDS39))
register("sql_tpcds_q97", oracle=_QDS97)(_sql_plan(_QDS97))

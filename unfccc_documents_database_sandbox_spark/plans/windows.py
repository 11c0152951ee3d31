"""Window functions (W1-W4), top-k, and the range/as-of joins (J6).

All [N] extensions — the reference does per-group ordering in Python list
order (SURVEY.md §2.5); windows are their scale-out equivalent.
Every ORDER BY carries a unique tiebreak key so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.catalog import load_table
from unfccc_documents_database_sandbox_spark.registry import register


@register(
    "window_funcs",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rnk,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER run
                AS BIGINT) AS run_cents,
           CAST(LAG(o_orderkey) OVER w AS BIGINT) AS prev_key,
           CAST(LEAD(o_orderkey) OVER w AS BIGINT) AS next_key,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER f
                 / 100.0 / COUNT(*) OVER f, 6) AS moving_avg_price,
           CAST(NTILE(4) OVER nt AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           f AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING),
           nt AS (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_funcs(spark, sf_dir):
    """W1+W2+W3 window surface in one query over per-customer order history
    (consolidated from the r01/r02 window_rank / window_running /
    window_frame / window_ntile keys per VERDICT r02 #2 — every window
    operator class stays in the plan and the oracle under one registry key):

    - W1 ranking: row_number / rank / dense_rank / percent_rank / cume_dist
      (the ratio functions divide two exact ints once — IEEE-identical
      across engines, rounded to 6 places)
    - W2 running aggregate + lag/lead (money summed as bigint cents — exact)
    - W3 explicit rows-frame: centered 3-row moving average as
      exact-cents-sum / 100.0 / exact-count
    - NTILE bucketing on a second partitioning (priority class), unique
      o_orderkey tiebreak so bucket boundaries are deterministic

    Two window partitionings → exactly two shuffles; the four w/run/f specs
    share one sort order so Catalyst computes them in a single Window node.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f = w.rowsBetween(-1, 1)
    nt = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rnk"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.sum(cents).over(run).cast("long").alias("run_cents"),
        F.lag("o_orderkey").over(w).cast("long").alias("prev_key"),
        F.lead("o_orderkey").over(w).cast("long").alias("next_key"),
        F.round(
            F.sum(cents).over(f) / F.lit(100.0) / F.count(F.lit(1)).over(f), 6
        ).alias("moving_avg_price"),
        F.ntile(4).over(nt).cast("long").alias("quartile"),
    )


def window_running(spark, sf_dir):
    """W2 running sum + lag/lead per order — bench-harness builder (the
    BASELINE.md headline list predates the window_funcs consolidation, so
    bench.py keeps timing this exact lineitem plan under its original name;
    the registered/oracle-checked variant lives in window_funcs).
    (l_orderkey, l_linenumber) is NOT unique in the corpus; (+ partkey,
    suppkey) is — the full tiebreak keeps frame order deterministic."""
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.sum("l_quantity").over(run).alias("run_qty"),
        F.lag("l_linenumber").over(w).cast("long").alias("prev_line"),
        F.lead("l_linenumber").over(w).cast("long").alias("next_line"),
    )


@register(
    "dedup_latest",
    oracle="""
    SELECT event_id, user_id, ts FROM (
        SELECT event_id, user_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest(spark, sf_dir):
    """W4 dedup-keep-latest (north star L1 variant): latest event per user.
    At scale this is one shuffle on the dedup key; AQE splits skewed users."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts")
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    """O4 top-k per group (3 priciest orders per customer)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "join_range",
    oracle="""
    WITH bands(band_id, lo, hi) AS (
        VALUES (0, 0.0, 50000.0), (1, 50000.0, 150000.0), (2, 150000.0, 300000.0),
               (3, 300000.0, 1000000.0)
    )
    SELECT o_orderkey, CAST(band_id AS BIGINT) AS band_id
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    """,
)
def join_range(spark, sf_dir):
    """J6 range (non-equi) join: orders banded by price. The band table is
    tiny → broadcast-nested-loop, which is the right plan: the fact side
    streams through without a shuffle."""
    bands = F.broadcast(
        spark.createDataFrame(
            [(0, 0.0, 50_000.0), (1, 50_000.0, 150_000.0), (2, 150_000.0, 300_000.0), (3, 300_000.0, 1_000_000.0)],
            "band_id int, lo double, hi double",
        )
    )
    o = load_table(spark, sf_dir, "orders")
    return o.join(
        bands, (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi)
    ).select("o_orderkey", F.col("band_id").cast("long").alias("band_id"))


@register(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
        SELECT event_id, user_id,
               (event_id * 2654435761) % 1000000 AS start_n,
               (event_id * 2654435761) % 1000000 + 1 + event_id % 500 AS end_n
        FROM events
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           CAST(LEAST(a.end_n, b.end_n) - GREATEST(a.start_n, b.start_n)
                AS BIGINT) AS overlap_len
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id
     AND a.start_n <= b.end_n AND b.start_n <= a.end_n
    WHERE a.event_id % 2 = 0 AND b.event_id % 2 = 1
    """,
)
def join_interval_overlap(spark, sf_dir):
    """J6-completion: interval-OVERLAP join (two interval sets, pairs that
    intersect within a user). The oracle states the naive overlap
    predicate; the Spark plan runs the bucketized form
    (operators/intervals.py): explode each interval to its covering
    1000-wide buckets, EQUI-join on (user_id, bucket), dedup, verify the
    exact predicate — a hash shuffle with fan-out ≤ 2 instead of the
    nested-loop join Spark would otherwise plan (asserted no-BNLJ in
    tests/test_scale.py). Intervals are synthesized deterministically from
    event ids (multiplicative-hash start, length 1-500) so both engines
    derive identical integer ranges."""
    from unfccc_documents_database_sandbox_spark.operators.intervals import (
        interval_overlap_join,
    )

    ev = load_table(spark, sf_dir, "events")
    start = (F.col("event_id") * F.lit(2654435761)) % F.lit(1000000)
    iv = ev.select(
        "event_id",
        "user_id",
        start.alias("start_n"),
        (start + 1 + F.col("event_id") % 500).alias("end_n"),
    )
    a = iv.filter(F.col("event_id") % 2 == 0)
    b = iv.filter(F.col("event_id") % 2 == 1)
    return interval_overlap_join(a, b, key="user_id")


@register(
    "join_asof",
    oracle="""
    SELECT o.o_orderkey,
           (SELECT e.event_id FROM events e
             WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
             ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS last_event_id
    FROM orders o
    """,
)
def join_asof(spark, sf_dir):
    """J6 keyed as-of join: for each order, the customer's most recent
    event at-or-before the order date (NULL when the customer has none).

    Spark lacks a native as-of join; the scalable pattern is the
    union-and-carry-forward merge: union both sides tagged by kind, sort
    within each key partition by (ts, kind, id), and carry the last seen
    event id forward with last(..., ignorenulls) — one shuffle on the key,
    no per-row subquery, no cross join. Events sort before orders at equal
    ts so ties honor `<=`.

    The window partitions on the REAL key (user_id = o_custkey), so
    parallelism grows with the number of users — not a fixed hash-bucket
    count, which would cap the sort at that many tasks and make per-task
    data grow linearly with the corpus (r01 verdict's scale nit). A truly
    hot single user is the residual skew case; time-bucketing the key with
    boundary carry-over is the next step if one appears.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts"),
        F.lit(0).alias("kind"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey"),
    )
    merged = ev.unionByName(orders)
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn(
            "last_event_id", F.last("event_id", ignorenulls=True).over(w)
        )
        .filter(F.col("kind") == 1)
        .select("o_orderkey", "last_event_id")
    )


_SESSION_GAP_US = 43_200_000_000  # 12 h — sized to this corpus's ~7 h median gap


def _ntz_micros(c):
    """Epoch microseconds from a TIMESTAMP_NTZ using FIELD EXTRACTION only —
    zero timezone dependence. timestampdiff/unix_micros coerce NTZ to LTZ
    through the caller session's zone (visible as cast(ts as timestamp) +
    Some(tz) in the plan), which skews by the DST offset delta between 1970
    and the event date in non-UTC sessions; datediff/hour/minute and
    extract(SECOND) read the wall-clock fields directly. SECOND is a
    Decimal(8,6) covering the fraction — ×1e6 is exact decimal arithmetic."""
    days = F.datediff(c.cast("date"), F.lit("1970-01-01")).cast("long")
    mins = days * 1440 + F.hour(c).cast("long") * 60 + F.minute(c).cast("long")
    return mins * 60_000_000 + (
        F.date_part(F.lit("SECOND"), c) * 1_000_000
    ).cast("long")


@register(
    "events_sessionize",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    ),
    m AS (
        SELECT user_id, event_id, event_type, us,
               CASE WHEN prev_us IS NULL OR us - prev_us > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM e
    ),
    s AS (
        SELECT user_id, event_type, us,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM m
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           CAST(MIN(us) AS BIGINT) AS start_us,
           CAST(MAX(us) AS BIGINT) AS end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM s GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark, sf_dir):
    """Batch sessionization (gaps-and-islands): split each user's event
    stream into sessions wherever the inter-event gap exceeds 12 h, then
    aggregate per session. The classic clickstream/training-log shape the
    reference's event model implies but only streaming covered so far
    (stream_session is the watermarked sibling; this is the exact batch
    restatement over the full history).

    Timestamps are compared as epoch-microsecond BIGINTs on both engines
    (_ntz_micros: tz-free field extraction; the events table carries
    microsecond precision, and double-seconds epoch() would round
    differently per engine).

    Scale shape: lag + running-sum share ONE window spec (user_id hash
    partition, single Exchange + Sort); the session aggregate is a second,
    map-side-combinable shuffle on (user_id, session_seq). No global
    window, no driver state — a 1000-executor cluster partitions by user
    exactly the same way."""
    # ts is TIMESTAMP_NTZ: _ntz_micros extracts exact bigint microseconds
    # with NO session-timezone dependency (the driver owns the session).
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        _ntz_micros(F.col("ts")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    brk = (
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > _SESSION_GAP_US),
            1,
        )
        .otherwise(0)
    )
    sess = e.withColumn("brk", brk).withColumn(
        "session_seq",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq")).agg(
        F.min("us").cast("long").alias("start_us"),
        F.max("us").cast("long").alias("end_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type,
               date_diff('microseconds', TIMESTAMP '1970-01-01', ts) AS us
        FROM events
    ),
    v AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
                      OVER (PARTITION BY user_id) AS v_us
        FROM e
    ),
    c AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND us > v_us THEN us END)
                      OVER (PARTITION BY user_id) AS c_us
        FROM v
    ),
    p AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > c_us THEN us END)
                      OVER (PARTITION BY user_id) AS p_us
        FROM c
    )
    SELECT user_id,
           CAST(MAX(v_us) AS BIGINT) AS view_us,
           CAST(MAX(c_us) AS BIGINT) AS click_us,
           CAST(MAX(p_us) AS BIGINT) AS purchase_us,
           CAST(CASE WHEN MAX(p_us) IS NOT NULL THEN 3
                     WHEN MAX(c_us) IS NOT NULL THEN 2
                     WHEN MAX(v_us) IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS reached
    FROM p GROUP BY user_id
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered funnel analysis (view -> click -> purchase): per user, the
    first view, the first click AFTER that view, and the first purchase
    AFTER that click — strict event-order matching, not mere presence.
    The product-analytics staple over the events model.

    Shape: three chained UNBOUNDED windows over the same user_id
    partitioning (no orderBy -> no Sort at all), each conditional MIN
    referencing the previous stage's column; the final per-user collapse
    reuses the same partitioning. One Exchange for the whole funnel,
    plan-pinned. Timestamps as tz-free microsecond bigints (see
    events_sessionize)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        _ntz_micros(F.col("ts")).alias("us"),
    )
    w = Window.partitionBy("user_id")
    v = e.withColumn(
        "v_us", F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w)
    )
    c = v.withColumn(
        "c_us",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("us") > F.col("v_us")),
                F.col("us"),
            )
        ).over(w),
    )
    p = c.withColumn(
        "p_us",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("us") > F.col("c_us")),
                F.col("us"),
            )
        ).over(w),
    )
    return p.groupBy("user_id").agg(
        F.max("v_us").cast("long").alias("view_us"),
        F.max("c_us").cast("long").alias("click_us"),
        F.max("p_us").cast("long").alias("purchase_us"),
        F.when(F.max("p_us").isNotNull(), 3)
        .when(F.max("c_us").isNotNull(), 2)
        .when(F.max("v_us").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("reached"),
    )


@register(
    "events_retention",
    oracle="""
    WITH e AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                   AS week
        FROM events
    ),
    c AS (
        SELECT user_id, week,
               MIN(week) OVER (PARTITION BY user_id) AS cohort_week
        FROM e
    )
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(week - cohort_week AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
    FROM c GROUP BY cohort_week, week - cohort_week
    """,
)
def events_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by the week of their FIRST
    event (cohort), then counted as active per (cohort, weeks-since-
    cohort) cell — the third classic clickstream shape beside
    events_sessionize and events_funnel. Weeks are integer epoch-day DIV 7
    (tz-free date extraction, exact on both engines).

    Scale shape: the cohort week comes from an unbounded MIN window (one
    user_id exchange, no sort, no self-join back onto events — the
    join-on-first-event formulation shuffles events twice); the matrix
    aggregate is a COUNT DISTINCT over (cohort, offset), which Spark
    expands map-side. Cell count is bounded by weeks², not data size."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "datediff(CAST(ts AS DATE), DATE '1970-01-01') DIV 7"
        ).alias("week"),
    )
    w = Window.partitionBy("user_id")
    c = e.withColumn("cohort_week", F.min("week").over(w))
    return c.groupBy(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        (F.col("week") - F.col("cohort_week")).cast("long").alias("week_offset"),
    ).agg(F.countDistinct("user_id").cast("long").alias("n_active"))


_OHLC_US_PER_HOUR = 3_600_000_000


@register(
    "ts_resample_ohlc",
    oracle=f"""
    WITH e AS (
        SELECT event_type, epoch_us(ts) AS us, event_id, value
        FROM events
    ),
    b AS (
        SELECT event_type, us // {_OHLC_US_PER_HOUR} AS hr, us, event_id,
               value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, us // {_OHLC_US_PER_HOUR}
                   ORDER BY us, event_id) AS rn_open,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, us // {_OHLC_US_PER_HOUR}
                   ORDER BY us DESC, event_id DESC) AS rn_close
        FROM e
    )
    SELECT event_type, CAST(hr AS BIGINT) AS hr,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM b GROUP BY event_type, hr
    """,
)
def ts_resample_ohlc(spark, sf_dir):
    """TIME-SERIES RESAMPLING to OHLC bars (the financial downsample —
    pandas `resample('1h').ohlc()`, InfluxDB/Timescale `time_bucket`):
    bucket each event into its epoch hour and emit per (event_type, hour)
    the OPEN (value of the chronologically first event), HIGH, LOW,
    CLOSE (last), event count, and an exact cent-scaled volume sum.
    Timestamps compare as epoch-microsecond bigints (`_ntz_micros`, the
    events_sessionize idiom) and first/last are ROW_NUMBER picks with
    (us, event_id) tie-breaks on BOTH engines — open/close are selected
    doubles, never computed ones, so the whole bar hash-matches.

    Plan shape: two window passes + one groupBy, ALL partitioned by the
    same (event_type, hour) key — Catalyst reuses a single exchange for
    the windows and the aggregate (one shuffle total). At 100 TB the
    bucket key is the natural time-partition key, so with a
    date-partitioned layout the exchange prunes to the queried window;
    state per bar is O(1) — the map-side-combinable rollup shape a
    1000-executor downsample needs."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value", _ntz_micros(F.col("ts")).alias("us")
    )
    hr = (F.col("us") / _OHLC_US_PER_HOUR).cast("long")
    b = e.withColumn("hr", hr)
    w_open = Window.partitionBy("event_type", "hr").orderBy("us", "event_id")
    w_close = Window.partitionBy("event_type", "hr").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    ranked = b.withColumn("rn_open", F.row_number().over(w_open)) \
              .withColumn("rn_close", F.row_number().over(w_close))
    return ranked.groupBy("event_type", "hr").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
        .alias("sum_cents"),
    )


@register(
    "events_top_paths",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS e2,
               LEAD(event_type, 2) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS e3
        FROM events
    ),
    paths AS (
        SELECT event_type || '>' || e2 || '>' || e3 AS path
        FROM o WHERE e3 IS NOT NULL
    ),
    counted AS (SELECT path, COUNT(*) AS n FROM paths GROUP BY path)
    SELECT path, CAST(n AS BIGINT) AS n_occurrences,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT path, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rnk
        FROM counted
    ) WHERE rnk <= 10
    """,
)
def events_top_paths(spark, sf_dir):
    """BEHAVIORAL PATH MINING: the 10 most common 3-step event-type
    sequences across all users — each user's clickstream is ordered by
    (ts, event_id) and slid over with LEAD(1)/LEAD(2), the trigrams are
    counted globally, and the top 10 rank with a deterministic
    (count DESC, path) tie-break. The sequence-mining sibling of
    events_funnel (which checks ONE fixed ordered pattern per user; this
    discovers which patterns dominate) — the "what do users actually do"
    query every product-analytics store ships (Amplitude's Pathfinder,
    the n-gram analysis run on LLM agent traces).

    Plan shape: both LEAD windows share one (user_id) partitioning —
    a single sort-within-partition pass, then a map-side-combinable
    count on the trigram string and a broadcast-sized top-10. At 100 TB
    the stream shuffles ONCE on user_id (the same exchange
    sessionization uses; on a user-bucketed layout it vanishes) and the
    path-count shuffle carries one row per distinct trigram per task —
    event-type vocabularies are tiny, so that stage is effectively
    free."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        e.withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .select(
            # F.concat (NULL-propagating) to match the oracle's `||`
            # exactly — concat_ws SKIPS nulls, so a NULL event_type in
            # the first trigram slot would produce ">b>c" here but NULL
            # in DuckDB (r10 ADVICE #5); with concat, both engines fold
            # such trigrams into one NULL path group.
            F.concat(
                F.col("event_type"), F.lit(">"),
                F.col("e2"), F.lit(">"), F.col("e3"),
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.col("n").desc(), "path")
    return (
        counted.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 10)
        .select(
            "path",
            F.col("n").cast("long").alias("n_occurrences"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


@register(
    "join_asof_directions",
    oracle="""
    SELECT o.o_orderkey,
           (SELECT e.event_id FROM events e
             WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
             ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS back_event_id,
           (SELECT e.event_id FROM events e
             WHERE e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
             ORDER BY e.ts ASC, e.event_id ASC LIMIT 1) AS fwd_event_id,
           (SELECT e.event_id FROM events e
             WHERE e.user_id = o.o_custkey
             ORDER BY CASE WHEN e.ts >= o.o_orderdate
                           THEN e.ts - o.o_orderdate
                           ELSE o.o_orderdate - e.ts END ASC,
                      CASE WHEN e.ts <= o.o_orderdate THEN 0 ELSE 1 END ASC,
                      CASE WHEN e.ts <= o.o_orderdate
                           THEN -e.event_id ELSE e.event_id END ASC
             LIMIT 1) AS nearest_event_id
    FROM orders o
    """,
)
def join_asof_directions(spark, sf_dir):
    """J6 completion — the full pandas-merge_asof direction surface in
    one distributed pass: per order, the customer's latest event
    at-or-before (`backward`, join_asof's rule), earliest at-or-after
    (`forward`), and the absolute-nearest (`nearest`: backward
    preferred on an exact-distance tie, each side keeping its own tie
    rule — latest id backward, earliest id forward).

    Spark-first shape: ONE union of both sides keyed on user, TWO
    window passes over the SAME key partitioning (one exchange, two
    in-partition sorts) — the backward pass orders events BEFORE orders
    at equal ts and carries last(event struct) forward; the forward
    pass orders orders first and pulls first(event struct) from the
    current-row-onward frame, so `<=`/`>=` tie inclusion is encoded in
    the sort, never a per-row subquery or a range self-join. `nearest`
    is then a row-local comparison of the two carried structs
    (timestamp differences compare as intervals — no epoch extraction,
    no precision loss). NULL-safe: an order with no event on a side
    carries NULL there, and nearest falls back to the populated side.

    Scale: identical to join_asof — parallelism grows with the user-key
    cardinality, the union never materializes per-pair candidates, and
    both windows ride one shuffle. The oracle states the same three
    rules as correlated subqueries (DuckDB's optimizer's problem, not
    the engine's)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts"),
        F.lit(0).alias("is_order"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey"),
    )
    merged = ev.unionByName(orders)
    ev_struct = F.when(
        F.col("is_order") == 0, F.struct(F.col("ts"), F.col("event_id"))
    )
    # backward: events sort BEFORE orders at equal ts (is_order asc),
    # last event wins (highest id among equal ts)
    w_back = (
        Window.partitionBy("k")
        .orderBy("ts", "is_order", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: orders sort BEFORE events at equal ts (1 - is_order
    # desc == is_order asc flipped), first event from here on wins
    w_fwd = (
        Window.partitionBy("k")
        .orderBy("ts", (1 - F.col("is_order")), "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = (
        merged.withColumn(
            "back", F.last(ev_struct, ignorenulls=True).over(w_back)
        )
        .withColumn(
            "fwd", F.first(ev_struct, ignorenulls=True).over(w_fwd)
        )
        .filter(F.col("is_order") == 1)
    )
    nearest = (
        F.when(F.col("back").isNull(), F.col("fwd.event_id"))
        .when(F.col("fwd").isNull(), F.col("back.event_id"))
        .when(
            F.col("ts") - F.col("back.ts") <= F.col("fwd.ts") - F.col("ts"),
            F.col("back.event_id"),
        )
        .otherwise(F.col("fwd.event_id"))
    )
    return out.select(
        "o_orderkey",
        F.col("back.event_id").alias("back_event_id"),
        F.col("fwd.event_id").alias("fwd_event_id"),
        nearest.alias("nearest_event_id"),
    )

"""Event-time window queries over the events table.

These run the streaming module's operators in BATCH mode — the exact same
``tumbling``/``sliding``/``session`` code executes incrementally under
``readStream`` + watermark (tests/test_streaming.py proves plan equality);
batch mode is what the DuckDB oracle can check."""

from __future__ import annotations

from pyspark.sql import functions as F

from orange3_spark.plans.registry import query
from orange3_spark.session import load_tables
from orange3_spark.streaming import windows as SW


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir, ("events",))["events"]


@query("q_window_tumbling", """
SELECT CAST(to_timestamp(floor(epoch(ts)/3600)*3600) AS TIMESTAMP) AS window_start,
       CAST(to_timestamp(floor(epoch(ts)/3600)*3600 + 3600) AS TIMESTAMP) AS window_end,
       event_type,
       count(*) AS n,
       sum(value) AS total
FROM events
GROUP BY 1, 2, 3
""")
def q_window_tumbling(spark, sf_dir):
    """1-hour tumbling event-time windows per event type."""
    ev = _events(spark, sf_dir)
    return SW.tumbling(ev, "ts", "1 hour", ["event_type"],
                       [F.count(F.lit(1)).alias("n"),
                        F.sum("value").alias("total")])


@query("q_window_sliding", """
WITH base AS (
  SELECT CAST(to_timestamp(floor(epoch(ts)/1800)*1800) AS TIMESTAMP) AS s0,
         event_type, value
  FROM events),
expanded AS (
  SELECT s0 AS window_start, event_type, value FROM base
  UNION ALL
  SELECT s0 - INTERVAL 30 MINUTE, event_type, value FROM base)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n,
       avg(value) AS avg_value
FROM expanded
GROUP BY 1, 2, 3
""")
def q_window_sliding(spark, sf_dir):
    """1-hour windows sliding every 30 minutes — each event lands in two
    windows (oracle expands rows explicitly, Spark's window() internally)."""
    ev = _events(spark, sf_dir)
    return SW.sliding(ev, "ts", "1 hour", "30 minutes", ["event_type"],
                      [F.count(F.lit(1)).alias("n"),
                       F.avg("value").alias("avg_value")])


@query("q_window_session", """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
islands AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       count(*) AS n_events,
       sum(value) AS total
FROM islands
GROUP BY user_id, sid
""")
def q_window_session(spark, sf_dir):
    """Session windows (30-minute inactivity gap) per user — the oracle is
    the classic gaps-and-islands formulation; Spark's session_window merges
    events with ts < session_end = last_ts + gap (end-exclusive)."""
    ev = _events(spark, sf_dir)
    return SW.session(ev, "ts", "30 minutes", ["user_id"],
                      [F.count(F.lit(1)).alias("n_events"),
                       F.sum("value").alias("total")])


@query("q_stream_dedup", """
WITH doubled AS (
  SELECT event_id, ts, user_id, event_type, value FROM events
  UNION ALL
  SELECT event_id, ts, user_id, event_type, value FROM events)
SELECT event_type, count(*) AS n, sum(value) AS total
FROM (SELECT DISTINCT event_id, ts, user_id, event_type, value FROM doubled)
GROUP BY event_type
""")
def q_stream_dedup(spark, sf_dir):
    """Watermark-bounded event dedup (streaming/windows.py:dedup): a
    doubled event feed collapses back to one row per event id.  Batch mode
    is oracle-checked; the identical operator runs under readStream with
    dropDuplicatesWithinWatermark (state bounded by the watermark horizon
    — tests/test_streaming.py)."""
    ev = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value")
    doubled = ev.unionByName(ev)
    return (SW.dedup(doubled,
                     ["event_id", "ts", "user_id", "event_type", "value"])
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("value").alias("total")))


@query("q_stream_enrich", """
SELECT c.c_mktsegment AS segment, count(*) AS n,
       avg(e.value) AS avg_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""")
def q_stream_enrich(spark, sf_dir):
    """Stream-static enrichment (streaming/windows.py:enrich): events join
    a broadcast customer dimension, then aggregate per segment.  The static
    side broadcasts so a stream never shuffles; the same plan serves batch
    (oracle-checked here) and readStream micro-batches."""
    tabs = load_tables(spark, sf_dir, ("events", "customer"))
    ev = tabs["events"].select(F.col("user_id"), F.col("value"))
    cust = tabs["customer"].select(F.col("c_custkey"),
                                   F.col("c_mktsegment"))
    joined = SW.enrich(ev, cust, ev.user_id == cust.c_custkey)
    return (joined.groupBy(F.col("c_mktsegment").alias("segment"))
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.avg("value").alias("avg_value")))


@query("q_time_rollup", """
SELECT 'hour' AS granularity, event_type, date_trunc('hour', ts) AS bucket_ts,
       count(*) AS n, round(sum(value), 6) AS total
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day', event_type, date_trunc('day', ts), count(*),
       round(sum(value), 6)
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'month', event_type, date_trunc('month', ts), count(*),
       round(sum(value), 6)
FROM events GROUP BY 2, 3
""")
def q_time_rollup(spark, sf_dir):
    """Hypertable-style multi-resolution rollup (engine extension):
    hour/day/month aggregates per event type from ONE shuffle via
    GROUPING SETS (streaming/windows.py:time_rollup) — the oracle computes
    each resolution independently and must agree exactly (coarser buckets
    are exact rollups of finer ones)."""
    ev = _events(spark, sf_dir)
    out = SW.time_rollup(
        ev, "ts",
        [F.count(F.lit(1)).alias("n"),
         F.round(F.sum("value"), 6).alias("total")],
        granularities=("hour", "day", "month"), keys=["event_type"])
    return out


@query("q_stream_cusum", """
WITH x AS (SELECT user_id, ts, event_id, value - 1.5 AS d FROM events),
p AS (SELECT user_id, ts, event_id,
             sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS pp
      FROM x),
q AS (SELECT user_id, pp,
             min(pp) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS mm,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM p)
SELECT user_id AS key, round(pp - least(0, mm), 6) AS cusum,
       (pp - least(0, mm)) > 25.0 AS drifted
FROM q WHERE rn = 1
""")
def q_stream_cusum(spark, sf_dir):
    """Per-user CUSUM drift state (streaming/stateful.py:cusum_drift_stream,
    an applyInPandasWithState operator) in its batch-twin closed form:
    s_t = P_t − min(0, min_{j≤t} P_j) — running sum + running min over one
    per-key ordered window, so the whole stateful recursion is EXACTLY
    oracle-checked (additions happen in the declared order on both
    engines; the streaming path is equivalence-tested in
    tests/test_stateful.py)."""
    from orange3_spark.streaming.stateful import cusum_batch

    events = load_tables(spark, sf_dir, ("events",))["events"]
    return cusum_batch(events, "user_id", "value", ("ts", "event_id"),
                       target=1.5, slack=0.0, threshold=25.0)


@query("q_stream_totals", """
SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(value) AS DOUBLE) AS total
FROM events GROUP BY user_id
""")
def q_stream_totals(spark, sf_dir):
    """Per-key running totals — the other applyInPandasWithState operator
    (streaming/stateful.py:running_totals_stream; state = one (n, total)
    pair per key in the state store) — checked through its batch twin,
    which is the same grouped aggregation the final micro-batch state
    equals; stream/batch equality is pinned in tests/test_stateful.py."""
    from orange3_spark.streaming.stateful import running_totals_batch

    events = load_tables(spark, sf_dir, ("events",))["events"]
    return running_totals_batch(events, "user_id", "value")


@query("q_stream_interval_join", """
WITH c AS (SELECT event_id, ts, user_id, value FROM events
           WHERE event_type = 'click'),
p AS (SELECT event_id, ts, user_id, value FROM events
      WHERE event_type = 'purchase'),
j AS (SELECT c.user_id, p.value AS pv
      FROM c JOIN p ON c.user_id = p.user_id
       AND epoch(p.ts) >= epoch(c.ts)
       AND epoch(p.ts) < epoch(c.ts) + 3600)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(floor(pv * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS qvalue_total
FROM j
""")
def q_stream_interval_join(spark, sf_dir):
    """Stream-stream interval join (streaming/windows.interval_join):
    each click matches same-user purchases within the following hour —
    a key equi-join with the event-time range as join condition, the
    canonical watermark-bounded stream-stream join.  Batch mode is
    oracle-checked (exact pair counts + fixed-point value sums); the
    identical operator runs under two readStream sources with watermarks
    in tests/test_streaming.py."""
    ev = _events(spark, sf_dir).select("event_id", "ts", "user_id",
                                       "event_type", "value")
    clicks = ev.filter(F.col("event_type") == "click")
    buys = ev.filter(F.col("event_type") == "purchase")
    j = SW.interval_join(clicks, buys, "user_id",
                         lower="0 seconds", upper="1 hour")
    return j.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("r_value") * F.lit(100.0) + F.lit(0.5))
              .cast("long")).alias("qvalue_total"))


@query("q_sessionize", """
WITH e AS (SELECT user_id, ts FROM events WHERE ts IS NOT NULL),
m AS (SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                 AS session_id
      FROM m),
per AS (SELECT user_id, session_id, count(*) AS n_events
        FROM s GROUP BY user_id, session_id)
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS sessions_total,
       CAST(max(n_events) AS BIGINT) AS max_events_in_session,
       CAST(sum(n_events) AS BIGINT) AS events_total
FROM per
""")
def q_sessionize(spark, sf_dir):
    """Event-level sessionization (operators/window.sessionize): every
    event gets a per-user session ordinal — new session when the gap to
    the previous event exceeds 30 minutes.  One partitioned window (lag
    to mark starts, running sum to number them); per-row assignment is
    tie-order-independent, so the SQL window mirror grades it exactly."""
    from orange3_spark.operators.window import sessionize

    ev = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    s = sessionize(ev.select("user_id", "ts"), key="user_id",
                   gap="30 minutes")
    per = (s.groupBy("user_id", "session_id")
           .agg(F.count(F.lit(1)).alias("n_events")))
    return per.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("sessions_total"),
        F.max("n_events").alias("max_events_in_session"),
        F.sum("n_events").alias("events_total"))


@query("q_funnel", """
WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t
       FROM events e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t
       FROM events e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
SELECT 1 AS step, 'view' AS step_name,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_keys
UNION ALL SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
""")
def q_funnel(spark, sf_dir):
    """Ordered-funnel conversion (operators/window.funnel_counts):
    view → click (strictly after the first view) → purchase (strictly
    after that click), earliest-qualifying-event frontiers per user —
    exact timestamps/counts, mirrored step for step by the oracle."""
    from orange3_spark.operators.window import funnel_counts

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    return funnel_counts(ev, ["view", "click", "purchase"])


@query("q_cohort_retention", """
WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
           FROM events GROUP BY user_id),
a AS (SELECT e.user_id, f.cohort,
             CAST(date_diff('day', f.cohort,
                            date_trunc('week', e.ts)) / 7 AS BIGINT) AS age
      FROM events e JOIN f ON e.user_id = f.user_id)
SELECT CAST(cohort AS TIMESTAMP) AS cohort, age,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
FROM a GROUP BY cohort, age ORDER BY cohort, age
""")
def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention (operators/window.cohort_retention):
    first-activity week per user, distinct active users per
    (cohort, weeks-since) — exact date_trunc/datediff integers, mirrored
    by the oracle."""
    from orange3_spark.operators.window import cohort_retention

    ev = _events(spark, sf_dir).select("user_id", "ts")
    return cohort_retention(ev, granularity="week")

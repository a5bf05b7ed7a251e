"""Window / ranking functions — extension surface beyond the reference.

The reference has no row-window aggregates (SURVEY §2.6: none — the nearest
analogues are Unique's tiebreakers and feature ranking).  On Spark these are
native and cheap, so the engine exposes them as first-class operators; Unique
(reshape.unique) is built on them.

All helpers take explicit partition/order columns — an unordered distributed
DataFrame has no implicit row order to window over.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _win(partition_by: Sequence[str], order_by: Sequence[str]):
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(*order_by)


def with_row_number(df: DataFrame, partition_by: Sequence[str],
                    order_by: Sequence[str], name: str = "rn") -> DataFrame:
    return df.withColumn(name, F.row_number().over(_win(partition_by, order_by)))


def with_rank(df: DataFrame, partition_by: Sequence[str],
              order_by: Sequence[str], name: str = "rank",
              dense: bool = False) -> DataFrame:
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(name, fn.over(_win(partition_by, order_by)))


def with_lag(df: DataFrame, col: str, partition_by: Sequence[str],
             order_by: Sequence[str], offset: int = 1,
             name: Optional[str] = None) -> DataFrame:
    name = name or f"{col}_lag{offset}"
    return df.withColumn(name, F.lag(col, offset).over(_win(partition_by, order_by)))


def with_lead(df: DataFrame, col: str, partition_by: Sequence[str],
              order_by: Sequence[str], offset: int = 1,
              name: Optional[str] = None) -> DataFrame:
    name = name or f"{col}_lead{offset}"
    return df.withColumn(name, F.lead(col, offset).over(_win(partition_by, order_by)))


def with_rolling(df: DataFrame, col: str, agg: str,
                 partition_by: Sequence[str], order_by: Sequence[str],
                 preceding: int = 2, following: int = 0,
                 name: Optional[str] = None) -> DataFrame:
    """Rolling frame aggregate (rows between)."""
    name = name or f"{col}_{agg}_roll"
    w = _win(partition_by, order_by).rowsBetween(-preceding, following)
    expr: Column = {
        "sum": F.sum(col), "mean": F.avg(col), "min": F.min(col),
        "max": F.max(col), "count": F.count(col),
    }[agg]
    return df.withColumn(name, expr.over(w))


def with_cumulative(df: DataFrame, col: str, agg: str,
                    partition_by: Sequence[str], order_by: Sequence[str],
                    name: Optional[str] = None) -> DataFrame:
    name = name or f"{col}_{agg}_cum"
    w = _win(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    expr: Column = {"sum": F.sum(col), "mean": F.avg(col), "min": F.min(col),
                    "max": F.max(col), "count": F.count(col)}[agg]
    return df.withColumn(name, expr.over(w))


def top_k_per_group(df: DataFrame, partition_by: Sequence[str],
                    order_by: Sequence[str], k: int) -> DataFrame:
    """Top-k rows per group — one shuffle, rank-filter.  Always pass a
    deterministic tiebreaker in ``order_by`` for reproducible output."""
    return (with_row_number(df, partition_by, order_by, "_rn")
            .filter(F.col("_rn") <= k).drop("_rn"))


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              by: Sequence[str] = (), right_cols: Sequence[str] = (),
              tolerance: Optional[str] = None,
              direction: str = "backward") -> DataFrame:
    """As-of join: each left row gets the right row with the greatest
    ``on`` value ≤ its own (``direction="backward"``; ``"forward"``
    mirrors), optionally within the same ``by`` keys and a ``tolerance``
    interval (SQL literal like ``INTERVAL 1 HOUR`` or a number).

    Spark-first shape: instead of an inequality join (which Catalyst can
    only execute as a broadcast-nested-loop or sort-merge-range — both
    explode at scale), the two sides are UNIONed with a side tag and ONE
    window pass per ``by`` partition carries the most recent right-side
    values onto left rows via ``last(..., ignorenulls=True)``.  Cost: one
    shuffle on ``by`` + one ordered window — the same plan as a rolling
    aggregate, independent of match fan-out.  Ties on ``on`` resolve
    right-row-first (a right row at exactly the left timestamp matches),
    matching DuckDB's ASOF JOIN, which is the oracle (``q_asof_join``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rc = list(right_cols) or [c for c in right.columns
                              if c != on and c not in by]
    bys = list(by)
    lt = left.withColumn("__side", F.lit(1))
    for c in rc:
        lt = lt.withColumn(f"__r_{c}", F.lit(None).cast(
            dict(right.dtypes)[c]))
    rt = right.select(*bys, F.col(on),
                      *[F.col(c).alias(f"__r_{c}") for c in rc]) \
              .withColumn("__side", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = lt.unionByName(rt.select(lt.columns))
    # final content-hash tiebreak: two right rows with identical (by, on)
    # would otherwise leave last() picking whichever the shuffle ordered
    # last — nondeterministic across runs/partitionings
    tie = F.xxhash64(*[F.col(f"__r_{c}") for c in rc]) if rc else F.lit(0)
    if direction == "backward":
        w = Window.partitionBy(*bys).orderBy(F.col(on).asc(),
                                             F.col("__side").asc(),
                                             tie.asc())
    else:
        w = Window.partitionBy(*bys).orderBy(F.col(on).desc(),
                                             F.col("__side").asc(),
                                             tie.asc())
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    matched = u
    for c in rc:
        matched = matched.withColumn(
            f"__m_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    m_on = F.last(F.when(F.col("__side") == 0, F.col(on)),
                  ignorenulls=True).over(w)
    matched = matched.withColumn("__m_on", m_on)
    out = matched.filter(F.col("__side") == 1)
    if tolerance is not None:
        if isinstance(tolerance, str):
            # accept both "1 HOUR" and the docstring's "INTERVAL 1 HOUR"
            import re as _re
            bare = _re.sub(r"(?i)^\s*interval\s+", "", tolerance)
            tol = F.expr(f"INTERVAL {bare}")
        else:
            tol = F.lit(tolerance)
        gap = (F.col(on) - F.col("__m_on")) if direction == "backward" \
            else (F.col("__m_on") - F.col(on))
        keep = F.col("__m_on").isNotNull() & (gap <= tol)
        for c in rc:
            out = out.withColumn(
                f"__m_{c}", F.when(keep, F.col(f"__m_{c}")))
        out = out.withColumn("__m_on", F.when(keep, F.col("__m_on")))
    sel = [F.col(c) for c in left.columns] + \
        [F.col(f"__m_{c}").alias(f"right_{c}") for c in rc] + \
        [F.col("__m_on").alias(f"right_{on}")]
    return out.select(*sel)


def range_join(left: DataFrame, right: DataFrame, *, on: str,
               lower, upper, by: Sequence[str] = (),
               right_cols: Sequence[str] = ()) -> DataFrame:
    """Interval join: all (left, right) pairs with
    ``left.on + lower <= right.on <= left.on + upper`` (and equal ``by``
    keys).  ``on`` must be numeric (cast timestamps with
    ``F.unix_timestamp`` upstream); ``lower``/``upper`` are numbers,
    ``lower <= upper``.

    Spark-first shape: a raw inequality join degenerates to
    broadcast-nested-loop (O(|L|·|R|)).  Instead both sides are bucketed
    into width ``upper - lower`` cells; every candidate pair shares the
    left row's bucket or one of its two neighbors, so the join is an
    equi-join on (by…, bucket) — the right side is exploded into 3 bucket
    replicas — followed by the exact range filter.  Shuffle volume is
    3×|R| + |L| keyed rows; fan-out is bounded by true matches plus
    same-bucket near-misses, never the cross product.
    """
    if not lower <= upper:
        raise ValueError("lower must be <= upper")
    width = float(upper - lower) or 1.0
    bys = list(by)
    rc = list(right_cols) or [c for c in right.columns
                              if c != on and c not in bys]
    lon = F.col(f"l_{on}")
    ron = F.col(f"r_{on}")
    lt = left.select(*[F.col(c) for c in left.columns],
                     F.floor((F.col(on).cast("double") + F.lit(float(lower)))
                             / F.lit(width)).alias("__bucket")) \
             .withColumnRenamed(on, f"l_{on}")
    rt = right.select(*bys, F.col(on).cast("double").alias(f"r_{on}"),
                      *[F.col(c).alias(f"right_{c}") for c in rc])
    rt = rt.withColumn("__off", F.explode(F.array(F.lit(-1), F.lit(0),
                                                  F.lit(1))))
    rt = rt.withColumn("__bucket",
                       F.floor(ron / F.lit(width)) + F.col("__off")) \
           .drop("__off")
    keys = bys + ["__bucket"]
    j = lt.join(rt, keys)
    j = j.where((ron >= lon.cast("double") + F.lit(float(lower)))
                & (ron <= lon.cast("double") + F.lit(float(upper))))
    return (j.drop("__bucket")
             .withColumnRenamed(f"l_{on}", on)
             .withColumnRenamed(f"r_{on}", f"right_{on}"))


def sessionize(df: DataFrame, *, key: str, time_col: str = "ts",
               gap: str = "30 minutes",
               session_col: str = "session_id") -> DataFrame:
    """Event-level sessionization: assign every event a per-key session
    ordinal — a new session starts when the gap to the previous event of
    the same key exceeds ``gap``.

    The aggregate form (``streaming/windows.session`` via
    ``session_window``) collapses rows; this keeps every EVENT row with
    its (key, session_id) label — what downstream per-event features
    join on.  One partitioned window (shuffle on key), two passes of the
    same spec: lag to mark session starts, running sum to number them.
    Ties on (time, …) are ordered deterministically by the full sort key.
    All arithmetic is integer epoch seconds — exactly replayable in SQL
    (``q_sessionize``).
    """
    from pyspark.sql.window import Window

    gap_s = F.expr(f"INTERVAL {gap}")
    w = Window.partitionBy(key).orderBy(time_col)
    prev = F.lag(time_col).over(w)
    is_new = (prev.isNull()
              | (F.col(time_col).cast("timestamp")
                 > prev.cast("timestamp") + gap_s)).cast("long")
    return (df.withColumn("_new", is_new)
            .withColumn(session_col,
                        F.sum("_new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))
                        - F.lit(1))
            .drop("_new"))


def funnel_counts(events: DataFrame, steps: Sequence[str], *,
                  key: str = "user_id", time_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel conversion: how many keys reached step 1, then
    step 2 STRICTLY AFTER their first step-1 event, and so on.

    Per step: the earliest qualifying event per key (groupBy min over
    the filtered scan, joined to the previous step's frontier — the
    frontier is keys×1 timestamp, broadcast-sized relative to the event
    log, so each stage is one pruned scan + one cheap join).  Exact
    timestamps and counts — SQL-replayable (``q_funnel``).  Returns one
    row per step: ``(step, step_name, n_keys)``."""
    frontier = None
    out = []
    for i, step in enumerate(steps):
        stage = events.filter(F.col(type_col) == F.lit(step))
        if frontier is not None:
            stage = (stage.join(frontier, key)
                     .filter(F.col(time_col) > F.col("_ft")))
        frontier = (stage.groupBy(key)
                    .agg(F.min(time_col).alias("_ft")))
        out.append(frontier.agg(
            F.lit(i + 1).alias("step"),
            F.lit(step).alias("step_name"),
            F.count(F.lit(1)).alias("n_keys")))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def cohort_retention(events: DataFrame, *, key: str = "user_id",
                     time_col: str = "ts",
                     granularity: str = "week") -> DataFrame:
    """Cohort retention: keys grouped by their FIRST-activity bucket
    (the cohort), counted as active per subsequent bucket.

    Two exact aggregations: first-activity per key (groupBy min), then
    distinct keys per (cohort, age) where age = bucket(ts) − cohort in
    whole buckets.  All date_trunc/datediff integers — SQL-replayable
    (``q_cohort_retention``).  Returns
    ``(cohort, age, n_active)``."""
    first = (events.groupBy(key)
             .agg(F.date_trunc(granularity, F.min(time_col))
                  .alias("_cohort")))
    act = (events.join(first, key)
           .select(F.col(key), F.col("_cohort"),
                   F.date_trunc(granularity, F.col(time_col))
                   .alias("_bucket")))
    unit_days = {"day": 1, "week": 7}.get(granularity)
    if unit_days is None:
        raise ValueError(
            f"cohort_retention: granularity {granularity!r} not supported"
            " (day/week — months are uneven; bucket by month upstream)")
    age = (F.datediff(F.col("_bucket"), F.col("_cohort"))
           / F.lit(unit_days)).cast("long")
    return (act.withColumn("age", age)
            .groupBy(F.col("_cohort").alias("cohort"), "age")
            .agg(F.countDistinct(key).alias("n_active"))
            .orderBy("cohort", "age"))


def resample_ffill(df: DataFrame, *, ts_col: str, by: Sequence[str],
                   value_col: str, step: str = "1 hour") -> DataFrame:
    """Regular-grid resampling with forward fill — the time-series
    gap-fill the reference lacks (its time support stops at parsing and
    binning): per key, generate an hourly (``step``) grid from the
    key's first observation hour to its last, and carry the most recent
    observation forward onto each grid point (NULL before the first).

    Spark-first shape: the grid is a row-local ``sequence`` explode off
    one per-key bounds aggregate (never a driver loop); the fill is the
    engine's as-of join — ONE ordered window per key, no inequality
    join.  Observations sharing a timestamp are deduplicated with
    ``max`` first (a deterministic tie rule; window ordering over true
    duplicates would tie-break differently per engine/partitioning).

    Returns ``(by..., ts_col, filled_<value_col>, src_ts)``."""
    bounds = df.groupBy(*by).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("_lo"),
        F.max(ts_col).alias("_hi"))
    grid = bounds.select(
        *by,
        F.explode(F.sequence("_lo", "_hi",
                             F.expr(f"INTERVAL {step}"))).alias(ts_col))
    dedup = (df.groupBy(*by, ts_col)
             .agg(F.max(value_col).alias(value_col)))
    out = asof_join(grid, dedup, on=ts_col, by=list(by),
                    right_cols=[value_col])
    return out.select(
        *by, ts_col,
        F.col(f"right_{value_col}").alias(f"filled_{value_col}"),
        F.col(f"right_{ts_col}").alias("src_ts"))


def ewma_weights_q(alpha: float, n: int, *, scale: int = 1 << 20):
    """Fixed-point EWMA weight table ``[wq_0..wq_{n-1}]`` (oldest
    first): ``w_k = α(1−α)^{n−1−k}``, normalized over the window, then
    ×2^20 integers — computed ONCE driver-side so the windowed dot
    product below is exact integer arithmetic (engine-portable;
    ``pow`` is libm and drifts across engines)."""
    raw = [alpha * (1 - alpha) ** (n - 1 - k) for k in range(n)]
    tot = sum(raw)
    return [int((w / tot) * scale + 0.5) for w in raw]


def ewma(df: DataFrame, *, value_col: str, ts_col: str, by: Sequence[str],
         order_tiebreak: Sequence[str] = (), alpha: float = 0.4,
         window: int = 8, out_col: str = "ewma_q") -> DataFrame:
    """Exponentially-weighted moving average over the last ``window``
    observations per key — the time-decay feature/monitoring smoother.
    Emitted as fixed-point int64 (``Σ round(x·2^20)·wq`` with the
    deepest ``window`` weights, suffix-aligned so the newest row always
    gets the largest weight): exact integer arithmetic, deterministic
    under any partitioning and bit-replayable in SQL.

    Shape: one PARTITIONED window collect of ≤ ``window`` quantized
    values (bounded state per row), then a row-local weighted fold —
    no self-join, no global sort.

    Precondition: ``(by…, ts_col, order_tiebreak…)`` must uniquely
    identify rows — window ordering over true duplicates tie-breaks
    differently per engine/partitioning.  Dedupe with groupBy-max
    first (as resample_ffill does) when uniqueness isn't guaranteed."""
    from pyspark.sql.window import Window

    wq = ewma_weights_q(alpha, window)
    order = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    w = (Window.partitionBy(*by).orderBy(*order)
         .rowsBetween(-(window - 1), 0))
    xq = F.floor(F.col(value_col).cast("double") * F.lit(float(1 << 20))
                 + F.lit(0.5)).cast("long")
    arr = F.collect_list(xq).over(w)
    # suffix-align: element i of a k-long frame uses weight
    # wq[window-k+i]  (newest row -> last weight)
    weights = F.lit(wq)
    k = F.size(arr)
    dotted = F.aggregate(
        F.zip_with(arr,
                   F.slice(weights, F.lit(len(wq)) - k + 1, k),
                   lambda x, g: x * g),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    return df.withColumn(out_col, dotted)


def zorder_key(a, b, *, bits: int = 16):
    """Morton/Z-order interleave of two non-negative integer bucket
    columns — the multi-dimensional data-layout key: writing a table
    sorted by ``zorder_key(bucket(x), bucket(y))`` clusters BOTH
    dimensions, so min/max row-group stats prune 2-D predicates that a
    row-major sort can only prune on its leading column.  Pure integer
    bit arithmetic (one codegen expression, engine-portable), ``bits``
    per dimension (≤ 31)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    z = F.lit(0).cast("long")
    for k in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(a.cast("long"), k)
                           .bitwiseAND(F.lit(1)), 2 * k)
             + F.shiftleft(F.shiftright(b.cast("long"), k)
                           .bitwiseAND(F.lit(1)), 2 * k + 1))
    return z

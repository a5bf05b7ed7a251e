"""Custom stateful streaming operators via applyInPandasWithState.

Beyond the built-in windowed aggregations (windows.py): per-key state that
survives across micro-batches — the Structured Streaming escape hatch for
operators Spark doesn't ship (SURVEY §2.13 names this the extension path).

Two operators:
  * running_totals — per-key cumulative count/sum maintained in the state
    store; emits the updated totals every micro-batch a key appears in.
  * cusum_drift — per-key CUSUM drift detector (classic S_n = max(0,
    S_{n−1} + x − target − slack)): flags when the one-sided cumulative
    deviation exceeds a threshold.  The canonical streaming-quality monitor
    for a training-data pipeline (e.g. watch a quality score drift down).

Both also run in BATCH mode through applyInPandas with the same per-key
pandas kernel — one implementation, two execution modes, mirroring
windows.py's design.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import types as T

TOTALS_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])
_TOTALS_STATE = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _totals_fn(key, pdf_iter, state):
    import pandas as pd
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})


def running_totals_stream(df: DataFrame, key_col: str = "user_id",
                          value_col: str = "value",
                          timeout: str = "NoTimeout") -> DataFrame:
    """Streaming per-key running totals; state persists across micro-batches
    (GroupState in the state store, bounded by key cardinality)."""
    from pyspark.sql import functions as F

    renamed = df.select(F.col(key_col).alias("key"),
                        F.col(value_col).alias("value"))
    return (renamed.groupBy("key")
            .applyInPandasWithState(_totals_fn, TOTALS_SCHEMA, _TOTALS_STATE,
                                    "update", timeout))


def running_totals_batch(df: DataFrame, key_col: str = "user_id",
                         value_col: str = "value") -> DataFrame:
    """Same result computed as a batch aggregation (the oracle twin)."""
    from pyspark.sql import functions as F

    return (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(value_col).cast("double").alias("total")))


CUSUM_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("cusum", T.DoubleType()),
    T.StructField("drifted", T.BooleanType()),
])
_CUSUM_STATE = T.StructType([T.StructField("s", T.DoubleType())])


def make_cusum_fn(target: float, slack: float, threshold: float):
    def fn(key, pdf_iter, state):
        import pandas as pd
        (s,) = state.get if state.exists else (0.0,)
        for pdf in pdf_iter:
            # order within the batch by event time if present
            if "ts" in pdf.columns:
                pdf = pdf.sort_values("ts")
            for v in pdf["value"]:
                s = max(0.0, s + float(v) - target - slack)
        state.update((s,))
        yield pd.DataFrame({"key": [key[0]], "cusum": [s],
                            "drifted": [s > threshold]})
    return fn


def cusum_drift_stream(df: DataFrame, key_col: str = "user_id",
                       value_col: str = "value", *, target: float,
                       slack: float = 0.0, threshold: float = 5.0) -> DataFrame:
    """Streaming CUSUM drift detection per key."""
    from pyspark.sql import functions as F

    cols = [F.col(key_col).alias("key"), F.col(value_col).alias("value")]
    if "ts" in df.columns:
        cols.append(F.col("ts"))
    renamed = df.select(*cols)
    return (renamed.groupBy("key")
            .applyInPandasWithState(make_cusum_fn(target, slack, threshold),
                                    CUSUM_SCHEMA, _CUSUM_STATE,
                                    "update", "NoTimeout"))


def cusum_batch(df: DataFrame, key_col: str = "user_id",
                value_col: str = "value",
                order_cols: tuple = ("ts", "event_id"), *, target: float,
                slack: float = 0.0, threshold: float = 5.0) -> DataFrame:
    """Batch twin of :func:`cusum_drift_stream` — the oracle-checkable form.

    The positive-part CUSUM recursion s_t = max(0, s_{t-1} + x_t − k) has
    the closed prefix form s_t = P_t − min(0, min_{j≤t} P_j) with
    P_t = Σ_{i≤t}(x_i − k): a running sum and a running min, both over the
    SAME per-key ordered window — partition-parallel, no recursion, no
    state store.  The final state per key reads off the last row.  Every
    addition happens in the declared (ts, id) order, so the doubles are
    bit-identical across engines and runs.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    k = float(target) + float(slack)
    d = F.col(value_col).cast("double") - F.lit(k)
    run = (Window.partitionBy(key_col).orderBy(*order_cols)
           .rowsBetween(Window.unboundedPreceding, 0))
    last = Window.partitionBy(key_col).orderBy(
        *[F.col(c).desc() for c in order_cols])
    rows = (df.withColumn("_p", F.sum(d).over(run))
              .withColumn("_m", F.min(F.col("_p")).over(run))
              .withColumn("_rn", F.row_number().over(last))
              .filter(F.col("_rn") == 1))
    s = F.col("_p") - F.least(F.lit(0.0), F.col("_m"))
    return rows.select(
        F.col(key_col).alias("key"),
        F.round(s, 6).alias("cusum"),
        (s > F.lit(float(threshold))).alias("drifted"))


# ------------------------------------------------- stateful sessionizer

# ts travels as epoch NANOSECONDS: the state-ful kernel's output path
# round-trips pandas datetimes through a µs-epoch conversion that
# misreads ns — integers are unambiguous; the wrapper rebuilds the
# timestamp with exact integer µs
SESSION_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("ts_ns", T.LongType()),
    T.StructField("session_id", T.LongType()),
])
_SESSION_STATE = T.StructType([
    T.StructField("last_ns", T.LongType()),
    T.StructField("sid", T.LongType()),
])


def make_session_fn(gap_seconds: float):
    """Per-key kernel: continue session numbering across micro-batches —
    the state carries (last event time, current session ordinal), so a
    session spanning a batch boundary keeps its id and a quiet gap
    between batches opens a new one.  Matches operators/window.sessionize
    numbering exactly (first session = 0)."""
    gap_ns = int(gap_seconds * 1_000_000_000)

    def fn(key, pdf_iter, state):
        import pandas as pd
        last_ns, sid = state.get if state.exists else (None, -1)
        pdf = pd.concat(list(pdf_iter)).sort_values("ts")
        ns = pdf["ts"].astype("int64").tolist()
        sids = []
        for t in ns:
            if last_ns is None or t - last_ns > gap_ns:
                sid += 1
            last_ns = t
            sids.append(sid)
        state.update((last_ns, sid))
        yield pd.DataFrame({"key": key[0], "ts_ns": ns,
                            "session_id": sids})
    return fn


def sessionize_stream(df: DataFrame, key_col: str = "user_id",
                      time_col: str = "ts", gap_seconds: float = 1800.0,
                      timeout: str = "NoTimeout") -> DataFrame:
    """Streaming EVENT-LEVEL sessionization (the stateful twin of
    operators/window.sessionize — the built-in ``session_window``
    collapses rows, this labels every event): per-key GroupState holds
    (last seen time, session ordinal), bounded by key cardinality.

    Caveat the batch twin doesn't have: correctness across batches
    assumes per-key event-time order across micro-batches (a file/kafka
    source replaying history in order); late events need the
    watermarked ``session_window`` aggregate instead."""
    from pyspark.sql import functions as F

    renamed = df.select(F.col(key_col).alias("key"),
                        F.col(time_col).alias("ts"))
    out = (renamed.groupBy("key")
           .applyInPandasWithState(make_session_fn(gap_seconds),
                                   SESSION_SCHEMA, _SESSION_STATE,
                                   "append", timeout))
    return out.select("key",
                      F.expr("timestamp_micros(ts_ns div 1000)")
                      .alias("ts"), "session_id")

"""Event-time windowed aggregation: tumbling / sliding / session windows.

The reference has ZERO streaming capability (SURVEY §2.13) — this is the
green-field extension over Structured Streaming.  Every function here is
written against the unified DataFrame API, so THE SAME CODE runs:

  * batch  — ``spark.read.parquet(...)`` → windowed groupBy (oracle-checked
    against DuckDB epoch arithmetic), and
  * stream — ``spark.readStream...`` → identical plan + watermark →
    incremental state-store execution with late-data handling.

That unification is the point: operators declared once, Catalyst plans them
for either execution mode (the micro-batch engine keeps per-window state in
the state store; watermark bounds state size at scale).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _watermarked(df: DataFrame, time_col: str, watermark: str) -> DataFrame:
    """``withWatermark`` requires TIMESTAMP (LTZ) event time, but parquet
    written without a timezone (pandas/arrow default) reads back as
    TIMESTAMP_NTZ in Spark 4.  Cast NTZ → LTZ first: the wall clock is
    interpreted in the session zone, which the engine session pins to UTC
    (session.py) — the same naive-equals-UTC convention the oracles use.
    """
    if dict(df.dtypes).get(time_col) == "timestamp_ntz":
        df = df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    return df.withWatermark(time_col, watermark)


def tumbling(df: DataFrame, time_col: str, duration: str,
             keys: Sequence[str], aggs: Sequence[Column],
             watermark: Optional[str] = None) -> DataFrame:
    """Fixed non-overlapping event-time windows.

    Output carries ``window_start``/``window_end`` as plain timestamp
    columns.  With ``watermark`` set (streaming), state for windows older
    than max(event_time) − watermark is evicted and late rows dropped.
    """
    if watermark:
        df = _watermarked(df, time_col, watermark)
    w = F.window(F.col(time_col), duration)
    return _windowed(df, w.alias("w"), keys, aggs, "window_start", "window_end")


def sliding(df: DataFrame, time_col: str, duration: str, slide: str,
            keys: Sequence[str], aggs: Sequence[Column],
            watermark: Optional[str] = None) -> DataFrame:
    """Overlapping windows of ``duration`` every ``slide`` — each event lands
    in duration/slide windows (Spark expands rows internally; state cost
    scales with the overlap factor)."""
    if watermark:
        df = _watermarked(df, time_col, watermark)
    w = F.window(F.col(time_col), duration, slide)
    return _windowed(df, w.alias("w"), keys, aggs, "window_start", "window_end")


def session(df: DataFrame, time_col: str, gap: str,
            keys: Sequence[str], aggs: Sequence[Column],
            watermark: Optional[str] = None) -> DataFrame:
    """Session windows: events closer than ``gap`` merge into one session
    (dynamic window end = last event + gap).  In streaming this REQUIRES a
    watermark (the session can't close otherwise)."""
    if watermark:
        df = _watermarked(df, time_col, watermark)
    w = F.session_window(F.col(time_col), gap)
    return _windowed(df, w.alias("w"), keys, aggs, "session_start", "session_end")


def _windowed(df, w_alias, keys, aggs, start_name, end_name):
    agged = df.groupBy(w_alias, *keys).agg(*aggs)
    rest = [c for c in agged.columns if c != "w" and c not in keys]
    return agged.select(F.col("w.start").alias(start_name),
                        F.col("w.end").alias(end_name),
                        *keys, *rest)


def stream_from_directory(spark, path: str, schema, fmt: str = "parquet",
                          max_files_per_trigger: Optional[int] = None):
    """File-source stream — each new file in ``path`` becomes a micro-batch
    input (the standard backfill-then-tail pattern for data pipelines)."""
    reader = (spark.readStream.format(fmt).schema(schema))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "complete", timeout_s: int = 120):
    """Drive a streaming plan to completion over the currently-available
    input (``availableNow`` trigger) into an in-memory table; returns the
    result DataFrame.  Test/validation harness, not a production sink."""
    q = (stream_df.writeStream.format("memory")
         .queryName(name).outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination(timeout_s)
    return stream_df.sparkSession.table(name)


def dedup(df: DataFrame, keys: Sequence[str], *, time_col: str = "ts",
          watermark: Optional[str] = None) -> DataFrame:
    """Exactly-once event dedup by business key.

    Streaming input + watermark → ``dropDuplicatesWithinWatermark``: state
    for a key is held only until the watermark passes, so state size is
    bounded by (arrival-rate × watermark) instead of growing forever —
    the 100-TB-stream shape.  Batch input → plain ``dropDuplicates``
    (same semantics, no state)."""
    if df.isStreaming:
        if watermark is None:
            raise ValueError("streaming dedup requires a watermark")
        return (_watermarked(df, time_col, watermark)
                  .dropDuplicatesWithinWatermark(list(keys)))
    return df.dropDuplicates(list(keys))


def enrich(events: DataFrame, dim: DataFrame, on, how: str = "inner"
           ) -> DataFrame:
    """Stream-static enrichment join: the static dimension is broadcast, so
    the stream never shuffles — each micro-batch (or batch partition) maps
    through the hash table.  Works identically for batch and readStream
    inputs (stream-static joins are stateless in Structured Streaming)."""
    return events.join(F.broadcast(dim), on, how)


def interval_join(left: DataFrame, right: DataFrame, key: str, *,
                  left_time: str = "ts", right_time: str = "ts",
                  lower: str = "0 seconds", upper: str = "1 hour",
                  left_watermark: Optional[str] = None,
                  right_watermark: Optional[str] = None,
                  how: str = "inner") -> DataFrame:
    """Stream-stream event-time INTERVAL join: match left row ``l`` with
    right rows ``r`` of the same ``key`` whose event time falls in
    ``[l.time + lower, l.time + upper)``.

    Spark-first shape: a key equi-join (one shuffle per side, co-
    partitioned) with the time range as a join-condition filter — never
    an inequality-only join (no broadcast-nested-loop blowup).  Under
    ``readStream`` BOTH sides need watermarks; together with the time
    bound they let the state store evict rows older than
    ``max(event time) − watermark − upper``, so state stays bounded at
    any stream rate (the canonical Structured Streaming join recipe).
    The identical plan serves batch, which is how the oracle checks it
    (``q_stream_interval_join``).  Skewed keys at batch scale: pre-bucket
    with ``operators/window.range_join``'s cell trick instead.

    Right-side columns are prefixed ``r_`` to keep the output
    unambiguous."""
    lf = left
    rf = right
    if left_watermark:
        lf = _watermarked(lf, left_time, left_watermark)
    if right_watermark:
        rf = _watermarked(rf, right_time, right_watermark)
    rf = rf.select(F.col(key).alias("__rk"),
                   *[F.col(c).alias(f"r_{c}")
                     for c in rf.columns if c != key])
    cond = ((F.col(key) == F.col("__rk"))
            & (F.col(f"r_{right_time}")
               >= F.col(left_time) + F.expr(f"INTERVAL {lower}"))
            & (F.col(f"r_{right_time}")
               < F.col(left_time) + F.expr(f"INTERVAL {upper}")))
    return lf.join(rf, cond, how).drop("__rk")


def time_rollup(df: DataFrame, time_col: str, aggs: Sequence[Column],
                granularities: Sequence[str] = ("hour", "day", "month"),
                keys: Sequence[str] = ()) -> DataFrame:
    """Hypertable-style multi-resolution rollup: aggregates at every
    requested calendar granularity from ONE shuffle.

    Spark-first shape: project one ``date_trunc`` column per granularity,
    then aggregate over GROUPING SETS (``DataFrame.groupingSets``, Spark
    4): Catalyst expands the sets from a single exchange's partial
    aggregates instead of one scan-and-shuffle per resolution.
    ``F.grouping`` flags identify which set produced each row — never
    inferred from NULL bucket values, so NULL timestamps stay unambiguous.
    Output: ``(granularity, keys..., bucket_ts, aggs...)``."""
    gs = list(granularities)
    ks = list(keys)
    proj = df.select(*df.columns,
                     *[F.date_trunc(g, F.col(time_col)).alias(f"__g_{g}")
                       for g in gs])
    kcols = [F.col(k) for k in ks]
    sets = [kcols + [F.col(f"__g_{g}")] for g in gs]
    grouped = proj.groupingSets(sets, *kcols,
                                *[F.col(f"__g_{g}") for g in gs])
    out = grouped.agg(*aggs,
                      *[F.grouping(f"__g_{g}").alias(f"__is_{g}")
                        for g in gs])
    gran = F.coalesce(*[F.when(F.col(f"__is_{g}") == 0, F.lit(g))
                        for g in gs])
    bucket = F.coalesce(*[F.when(F.col(f"__is_{g}") == 0,
                                 F.col(f"__g_{g}")) for g in gs])
    agg_names = [c for c in out.columns
                 if not c.startswith("__") and c not in ks]
    return out.select(gran.alias("granularity"), *ks,
                      bucket.alias("bucket_ts"), *agg_names)


def idempotent_parquet_sink(stream_df: DataFrame, base_dir: str, *,
                            checkpoint_dir: str,
                            timeout_s: int = 120):
    """Exactly-once-per-batch parquet sink — the production pattern for
    "stream this pipeline's output to a lake path".

    Structured Streaming's offset log commits AFTER the sink write, so
    a restart inside that window REPLAYS the last micro-batch
    (at-least-once).  ``foreachBatch`` + write-by-batch-id makes the
    replay idempotent: batch ``i`` always lands in ``batch_id=i/`` with
    ``overwrite``, so re-running it overwrites its own output instead
    of appending duplicates; readers see the union via partition
    discovery (``spark.read.parquet(base_dir)``), and ``batch_id`` is a
    partition column they can prune on.  The checkpoint directory is
    REQUIRED — it is the source of batch-id stability across restarts.

    Drives the currently-available input (availableNow) and returns the
    finished query (inspect ``.recentProgress`` for per-batch rows)."""
    def _write(bdf, batch_id: int) -> None:
        bdf.write.mode("overwrite").parquet(
            f"{base_dir}/batch_id={batch_id}")

    q = (stream_df.writeStream.foreachBatch(_write)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    if not q.awaitTermination(timeout_s):
        # honor the "returns the FINISHED query" contract — a caller
        # reading base_dir after a silent timeout would see a partial
        # batch set with no error
        q.stop()
        raise TimeoutError(
            f"idempotent_parquet_sink: availableNow run did not finish "
            f"within {timeout_s}s; stream stopped, {base_dir} is partial "
            "(restart from the same checkpoint to resume exactly-once)")
    return q

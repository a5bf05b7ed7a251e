"""Custom stateful streaming: state persists across micro-batches."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from orange3_spark.streaming import stateful as ST
from orange3_spark.streaming import windows as SW


def _write_batch(d, name, keys, values):
    pdf = pd.DataFrame({"user_id": keys, "value": values})
    pdf.to_parquet(d / name)


def test_running_totals_across_microbatches(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_batch(d, "b1.parquet", [1, 1, 2], [10.0, 5.0, 1.0])
    schema = spark.read.parquet(str(d / "b1.parquet")).schema
    stream = SW.stream_from_directory(spark, str(d), schema,
                                      max_files_per_trigger=1)
    out = ST.running_totals_stream(stream)
    q = (out.writeStream.format("memory").queryName("s_tot")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)

    # second micro-batch: key 1 gains more rows — state must accumulate
    _write_batch(d, "b2.parquet", [1, 3], [100.0, 7.0])
    q2 = (out.writeStream.format("memory").queryName("s_tot2")
          .outputMode("update").trigger(availableNow=True).start())
    q2.awaitTermination(120)

    latest = {r.key: r for r in spark.table("s_tot2").collect()}
    assert latest[1].n == 3 and latest[1].total == 115.0
    assert latest[3].n == 1 and latest[3].total == 7.0


def test_stream_totals_equal_batch(spark, tmp_path):
    d = tmp_path / "in2"
    d.mkdir()
    _write_batch(d, "b1.parquet", [1, 2, 2, 3], [1.0, 2.0, 3.0, 4.0])
    schema = spark.read.parquet(str(d / "b1.parquet")).schema
    stream = SW.stream_from_directory(spark, str(d), schema)
    got = ST.running_totals_stream(stream)
    q = (got.writeStream.format("memory").queryName("s_eq")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    want = ST.running_totals_batch(spark.read.parquet(str(d)))
    assert sorted(map(tuple, spark.table("s_eq").collect())) == \
        sorted(map(tuple, want.collect()))


def test_cusum_detects_drift(spark, tmp_path):
    d = tmp_path / "in3"
    d.mkdir()
    # key 1 stays on target (1.0); key 2 drifts high
    _write_batch(d, "b1.parquet", [1] * 5 + [2] * 5,
                 [1.0] * 5 + [3.0] * 5)
    schema = spark.read.parquet(str(d / "b1.parquet")).schema
    stream = SW.stream_from_directory(spark, str(d), schema)
    out = ST.cusum_drift_stream(stream, target=1.0, slack=0.1, threshold=5.0)
    q = (out.writeStream.format("memory").queryName("s_cusum")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.key: r for r in spark.table("s_cusum").collect()}
    assert not got[1].drifted and got[1].cusum == 0.0
    assert got[2].drifted and got[2].cusum > 5.0


def test_cusum_batch_matches_recursion(spark):
    """The prefix-form batch CUSUM must equal the literal per-row
    recursion the streaming operator runs."""
    from orange3_spark.streaming.stateful import cusum_batch

    rows = [(1, i, float(v)) for i, v in
            enumerate([3, 0, 4, 0, 0, 5, 1, 0])] + \
           [(2, i, float(v)) for i, v in enumerate([10, 10, 0, 0])]
    df = spark.createDataFrame(rows, "user_id int, event_id int, value double")
    got = {r["key"]: (r["cusum"], r["drifted"]) for r in
           cusum_batch(df, "user_id", "value", ("event_id",),
                       target=2.0, threshold=5.0).collect()}

    def recur(vals, k=2.0):
        s = 0.0
        for v in vals:
            s = max(0.0, s + v - k)
        return s

    s1 = recur([3, 0, 4, 0, 0, 5, 1, 0])
    s2 = recur([10, 10, 0, 0])
    assert got[1] == (round(s1, 6), s1 > 5.0)
    assert got[2] == (round(s2, 6), s2 > 5.0)


def test_sessionize_stream_continues_across_microbatches(spark, tmp_path):
    import datetime as dt

    from orange3_spark.operators.window import sessionize

    d = tmp_path / "in_sess"
    d.mkdir()
    T = dt.datetime
    # batch 1: key 1 has two sessions (gap > 30s between 00:00 and 01:00),
    # ending at 01:00:05; batch 2 continues session 1 (01:00:20, within
    # gap) then opens session 2 (02:00)
    b1 = pd.DataFrame({"user_id": [1, 1, 1, 2],
                       "ts": [T(2024, 1, 1, 0, 0, 0),
                              T(2024, 1, 1, 0, 0, 10),
                              T(2024, 1, 1, 1, 0, 5),
                              T(2024, 1, 1, 0, 0, 0)]})
    b2 = pd.DataFrame({"user_id": [1, 1],
                       "ts": [T(2024, 1, 1, 1, 0, 20),
                              T(2024, 1, 1, 2, 0, 0)]})
    # µs precision: Spark misreads pandas' default ns-precision parquet
    # timestamps (instantToMicros overflow)
    b1.astype({"ts": "datetime64[us]"}).to_parquet(d / "0.parquet")
    b2.astype({"ts": "datetime64[us]"}).to_parquet(d / "1.parquet")
    schema = spark.read.parquet(str(d / "0.parquet")).schema
    stream = SW.stream_from_directory(spark, str(d), schema,
                                      max_files_per_trigger=1)
    out = ST.sessionize_stream(stream, gap_seconds=30.0)
    q = (out.writeStream.format("memory").queryName("s_sess")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.key, r.ts): r.session_id
           for r in spark.table("s_sess").collect()}
    # cross-batch continuation: 01:00:20 stays in session 1
    assert got[(1, T(2024, 1, 1, 1, 0, 20))] == 1
    assert got[(1, T(2024, 1, 1, 2, 0, 0))] == 2
    assert got[(2, T(2024, 1, 1, 0, 0, 0))] == 0
    # equality with the batch sessionizer over the full input
    batch = spark.read.parquet(str(d))
    want = {(r.user_id, r.ts): r.session_id
            for r in sessionize(batch, key="user_id", time_col="ts",
                                gap="30 seconds").collect()}
    assert got == want

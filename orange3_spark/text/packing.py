"""Sequence packing: group documents into ~fixed-token training
sequences — the pretraining prep step between "clean corpus" and "token
batches" (not in the reference; standard LLM practice).

Spark-first contract: fully deterministic SEQUENTIAL packing.

  * each doc lands in a BUCKET by id hash (md5-prefix mod n — the same
    engine-portable hash the CV folds use) — buckets are the unit of
    parallelism, so packing 100 TB is n independent window scans, no
    global order;
  * within a bucket docs are ordered by id and filled sequentially:
    ``seq_id = floor(cumulative_tokens_before / target)`` — one
    partitioned window cumsum, all exact integers, so the assignment is
    a pure function of the data (any engine replays it —
    ``q_pack_sequences``'s oracle mirrors it as a SQL window).

A greedy reset-on-overflow packer would need a stateful scan per bucket;
the floor-division contract keeps the op windowed (whole-stage codegen)
and gives the same ≈target fill for corpora whose doc length ≪ target.
Oversized docs (> target tokens) still get a seq of their own plus
spill into the next — count them upstream with the quality gate if that
matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from orange3_spark.text.analysis import token_count


def pack_sequences(docs: DataFrame, *, target_tokens: int = 2048,
                   n_buckets: int = 64, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """→ ``(id, bucket, n_tokens, seq_id)``: bucket-parallel sequential
    packing of documents into ~``target_tokens`` sequences."""
    toks = token_count(text_col).cast("long")
    h32 = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                 16, 10).cast("long")
    base = (docs.select(F.col(id_col), toks.alias("n_tokens"))
            .withColumn("bucket",
                        F.pmod(h32, F.lit(n_buckets)).cast("int")))
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.withColumn(
        "seq_id", F.floor(cum_before / F.lit(float(target_tokens)))
        .cast("long"))

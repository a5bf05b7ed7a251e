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


def sliding_chunks(docs: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id", window: int = 32,
                   stride: int = 16,
                   keep: tuple = ()) -> DataFrame:
    """Fixed-stride sliding-window chunking — the RAG/eval-window prep
    step (split every document into ``window``-token chunks every
    ``stride`` tokens; the fixed-geometry complement of the
    content-defined splitter in ``text/dedup.cdc_chunks``).

    Pure row-local codegen: token array → 1-based start sequence
    ``1, 1+stride, …, max(n-window+1, 1)`` → per-start ``slice`` +
    join + hash, exploded — no shuffle at all until the caller
    aggregates, so at 100 TB chunking rides the scan.  Documents
    shorter than ``window`` yield one whole-doc chunk; empty documents
    yield none.  Returns ``(*keep, id_col, chunk_idx, start_tok,
    n_tok, chash)`` with ``chash`` the engine-portable md5-prefix int
    of the chunk text (dedup-able across overlaps and docs).
    """
    from orange3_spark.text.analysis import tokens

    if stride > window:
        raise ValueError("sliding_chunks: stride must be <= window "
                         "(gaps would drop tokens)")
    toks = tokens(text_col)
    n = F.size(toks)
    # upper bound n - window + stride: the first start past the full-
    # coverage point (n - window + 1) is still generated — exactly one
    # tail chunk, so the last tokens are never dropped
    starts = F.sequence(F.lit(1),
                        F.greatest(n - F.lit(window - stride), F.lit(1)),
                        F.lit(stride))
    chunk = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start_tok"),
            F.array_join(F.slice(toks, s, window), " ").alias("_ct"),
            F.size(F.slice(toks, s, window)).alias("n_tok")))
    ex = (docs.where(F.col(text_col).isNotNull() & (n > 0))
          .select(*keep, id_col, F.posexplode(chunk)
                  .alias("chunk_idx", "_c")))
    return ex.select(*keep, id_col, "chunk_idx",
                     F.col("_c.start_tok").alias("start_tok"),
                     F.col("_c.n_tok").alias("n_tok"),
                     F.conv(F.substring(F.md5(F.col("_c._ct")), 1, 8),
                            16, 10).cast("long").alias("chash"))

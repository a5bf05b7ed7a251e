"""N-gram language-model scoring — the CCNet-style "perplexity filter".

The classic training-data quality step (Wenzek et al. 2020, CCNet): fit a
small LM on a trusted reference slice (CCNet uses Wikipedia; here any
predicate over the corpus), score every document by how predictable its
text is under that model, and filter/bucket on the score.  The reference
engine has no such operator; it is first-class here because a 100 TB
pretraining pipeline needs it (quality gate → dedup → mix → pack).

Spark-first contract — exact integer likelihoods, not float perplexity:

  * the model is add-one-smoothed bigram counts over the REFERENCE slice:
    ``c2(w1,w2)``, ``c1(w1)``, and vocab size ``V`` (distinct reference
    tokens);
  * each bigram's likelihood is the fixed-point integer
    ``pq = ((c2+1) · SCALE) DIV (c1+V)`` — one exact integer multiply and
    one truncating integer division, identical in Spark (``DIV``), DuckDB
    (``//``) and Python (``//``) for the non-negative operands used here;
  * a document's score ``lm_q = Σpq DIV n_bigrams`` is the mean bigram
    continuation likelihood in parts-per-SCALE — order-independent
    (integer sum), so hash-stable under any partitioning or engine.
    Higher = more predictable under the reference LM; true perplexity is
    a monotone transform (geometric vs arithmetic mean aside) and the
    FILTERING decision — score < threshold — is what the operator is for.

Scale shape: token/bigram extraction is row-local array codegen (no
window, no UDF); the model is two groupBy counts over the reference
slice; scoring is one join of the corpus bigram stream against the model
tables.  The ``c1`` join key (a single word) is stopword-skewed — AQE
skew-join splits it; the model tables are vocab-bounded so Catalyst
broadcasts them when small.  ``min_count`` prunes rare bigrams from the
model (CCNet ships pruned KenLM for the same reason) — pruned bigrams
score as unseen, and the model table shrinks by the Zipf tail.

Overflow bound: ``(c2+1)·SCALE`` must stay < 2⁶³ — at SCALE 1e6 that is
~9.2e12 occurrences of ONE bigram in the reference slice, far beyond any
single bigram's count in a bounded reference corpus (raise ``min_count``
or lower SCALE long before that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orange3_spark.text.analysis import tokens

#: likelihoods are parts-per-LM_SCALE integers
LM_SCALE = 1_000_000


def doc_bigrams(docs: DataFrame, *, text_col: str = "text",
                keep: tuple[str, ...] = ()) -> DataFrame:
    """Explode each document into its consecutive-token bigram stream
    ``(*keep, w1, w2)`` — row-local array codegen (transform over a
    slice), no window, no UDF; single-token/empty docs emit no rows."""
    tk = tokens(text_col)
    pairs = F.when(
        F.size(tk) >= 2,
        F.transform(F.slice(tk, 1, F.size(tk) - 1),
                    lambda x, i: F.struct(
                        x.alias("w1"),
                        F.element_at(tk, i + 2).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (docs.select(*keep, F.explode(pairs).alias("bg"))
            .select(*keep, F.col("bg.w1").alias("w1"),
                    F.col("bg.w2").alias("w2")))


def bigram_model(reference: DataFrame, *, text_col: str = "text",
                 min_count: int = 1):
    """Fit the add-one bigram model on a reference corpus.

    Returns ``(c2, c1, V)``: bigram-count frame ``(w1, w2, c2)`` (pruned
    to ``c2 ≥ min_count``), context-count frame ``(w1, c1)`` (unpruned —
    denominators stay exact), and the reference vocab size ``V`` (a
    driver int; one scalar action)."""
    bg = doc_bigrams(reference, text_col=text_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    if min_count > 1:
        c2 = c2.where(F.col("c2") >= min_count)
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (reference.select(F.explode(tokens(text_col)).alias("t"))
             .agg(F.countDistinct("t").alias("v")).collect()[0]["v"])
    if not vocab:
        # a zero vocab would make every denominator 0: Spark DIV yields
        # NULL silently while SQL `//` raises — fail loudly instead
        raise ValueError("bigram_model: the reference slice has no "
                         "tokens — check train_filter")
    return c2, c1, int(vocab)


def score_bigrams(docs: DataFrame, c2: DataFrame, c1: DataFrame,
                  vocab: int, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  scale: int = LM_SCALE) -> DataFrame:
    """Score documents under an already-fit bigram model →
    ``(id_col, n_bigrams, sum_pq, lm_q)``.

    ``docs`` may be a STREAMING frame: the model joins are stream-static
    (the vocab-bounded count tables broadcast) and the per-doc
    aggregation is a bounded streaming agg — the CCNet gate as a live
    filter (stream/batch equality pinned in tests/test_streaming.py)."""
    bg = doc_bigrams(docs, text_col=text_col, keep=(id_col,))
    scored = (bg.join(c2, ["w1", "w2"], "left")
              .join(c1, ["w1"], "left")
              .select(F.col(id_col),
                      F.expr(f"((coalesce(c2, 0L) + 1L) * {scale}L) DIV "
                             f"(coalesce(c1, 0L) + {vocab}L)").alias("pq")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("pq").alias("sum_pq"))
            .withColumn("lm_q", F.expr("sum_pq DIV n_bigrams")))


def bigram_lm_scores(docs: DataFrame, *, train_filter: Column,
                     text_col: str = "text", id_col: str = "doc_id",
                     scale: int = LM_SCALE,
                     min_count: int = 1) -> DataFrame:
    """Score every document under a bigram LM fit on the
    ``train_filter`` slice → ``(id_col, n_bigrams, sum_pq, lm_q)``.

    ``lm_q`` is the exact-integer mean bigram likelihood (parts per
    ``scale``); docs with fewer than one bigram are absent (join the
    result back to the corpus to count them — ``q_lm_score`` does)."""
    c2, c1, vocab = bigram_model(docs.where(train_filter),
                                 text_col=text_col, min_count=min_count)
    return score_bigrams(docs, c2, c1, vocab, text_col=text_col,
                         id_col=id_col, scale=scale)

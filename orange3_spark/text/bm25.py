"""BM25 keyword retrieval over the documents table.

Not in the reference (Orange core has no retrieval; the text add-on stops
at bag-of-words) — this is the training-data-pipeline retrieval op:
score every document against a small keyword query, exactly, at corpus
scale.

Spark-first shape (Robertson/Spärck Jones BM25, k1/b standard form):

  * one token scan → per-(doc, term) tf for the QUERY terms only (the
    filter on ~k terms prunes the explode before the shuffle);
  * doc lengths + corpus stats from the same scan family — all exact
    integers;
  * idf computed driver-side from the k collected document frequencies
    (k scalars, not data) and embedded as literals;
  * the score is a pure codegen Column chain — fixed term order, fixed
    association — so a SQL mirror with the same literals reproduces it
    bit for bit (``q_text_bm25``'s replay oracle).

At 100 TB: the only shuffles are the (doc, term) count and the doc-length
aggregate, both map-side combinable; the score join broadcasts the k-row
tf table side if tiny or co-partitions on doc_id otherwise.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orange3_spark.text.analysis import tokens


def idf_robertson(n_docs: int, df_t: int) -> float:
    """BM25 idf — shared by the Spark driver and the oracle replay so
    both embed the identical double."""
    return math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)


def bm25_scores(docs: DataFrame, query_terms: Sequence[str], *,
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Score every document against ``query_terms``; returns
    ``(id, doc_len, score)`` with the standard BM25 sum over terms.

    Exactness: tf / doc_len / df / N are exact integers; avg doc length
    is one double division of exact ints; idf values are driver-computed
    literals; the per-term sum is a FIXED-order (sorted terms),
    left-associated Column chain — every double is reproducible from the
    same integers in any engine.
    """
    terms = sorted(set(query_terms))
    tok = docs.select(F.col(id_col),
                      F.explode(tokens(text_col)).alias("_t"))
    lens = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("doc_len"))
    hits = (tok.filter(F.col("_t").isin(list(terms)))
            .groupBy(id_col)
            .pivot("_t", list(terms))
            .agg(F.count(F.lit(1))))
    stats = docs.agg(F.count(F.lit(1)).alias("n")).first()
    n_docs = int(stats["n"])
    dfs = (tok.filter(F.col("_t").isin(list(terms)))
           .groupBy("_t").agg(F.countDistinct(id_col).alias("df"))
           .collect())
    df_map = {r["_t"]: int(r["df"]) for r in dfs}
    tot = lens.agg(F.sum("doc_len").alias("s"),
                   F.count(F.lit(1)).alias("c")).first()
    # avg doc length: one double division of exact integer totals
    avg_len = float(int(tot["s"])) / float(int(tot["c"]))

    joined = lens.join(hits, id_col, "left")
    score = None
    norm = (F.lit(k1) * (F.lit(1.0 - b)
                         + F.lit(b) * (F.col("doc_len").cast("double")
                                       / F.lit(avg_len))))
    for t in terms:
        idf = idf_robertson(n_docs, df_map.get(t, 0))
        tf = F.coalesce(F.col(t).cast("double"), F.lit(0.0))
        part = F.lit(idf) * ((tf * F.lit(k1 + 1.0)) / (tf + norm))
        score = part if score is None else score + part
    return joined.select(F.col(id_col), "doc_len",
                         score.alias("score"))

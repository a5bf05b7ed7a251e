"""Text analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (Orange's text handling stops at string
filters and Split, SURVEY §2.9) — these are the document-pipeline operators
the project brief lists as first-class: token counting, quality scoring,
language-ID heuristics, fingerprinting.

Everything is built from JVM-side ``pyspark.sql.functions`` string/array
expressions — no Python UDFs in the hot path, so the operators run inside
whole-stage codegen and scale linearly with executors.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small function-word list per language for the n-gram/stopword heuristic.
# (Public knowledge; the usual top function words.)
LANG_MARKERS: Mapping[str, Sequence[str]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "de": ("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"),
    "fr": ("le", "la", "les", "et", "est", "je", "ne", "un", "une", "de"),
    "es": ("el", "la", "los", "las", "y", "es", "no", "un", "una", "que"),
    "zh": ("的", "了", "是", "我", "不", "在", "有", "这", "他", "就"),
}

TOKEN_PATTERN = r"\s+"
# BPE-ish word/punct splitter: words, numbers, or single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def tokens(col: str, pattern: str = TOKEN_PATTERN) -> Column:
    """Whitespace tokenization as an array column."""
    return F.filter(F.split(F.trim(F.col(col)), pattern), lambda t: t != "")


def _word_regex(words: Sequence[str]) -> str:
    """Zero-width-delimited alternation: matches any word bounded by
    whitespace/ends.  Lookaround (not ``\\b``) so non-ASCII words match."""
    import re as _re
    alt = "|".join(_re.escape(w) for w in words)
    return f"(?<=^|\\s)({alt})(?=\\s|$)"


def bpe_ish_tokens(col: str) -> Column:
    """Sub-word-ish tokenization: letters / digit runs / single symbols —
    a cheap proxy for BPE token counts (regexp_extract_all stays JVM-side)."""
    return F.expr(f"regexp_extract_all(`{col}`, '{BPE_ISH_PATTERN}', 0)")


def token_count(col: str) -> Column:
    # regexp_count stays inside whole-stage codegen; array-lambda ops
    # (size/filter/split) are interpreted per row — measurably slower.
    return F.regexp_count(F.col(col), F.lit(r"\S+"))


def char_count(col: str) -> Column:
    return F.length(F.col(col))


def avg_token_len(col: str) -> Column:
    # sum of token lengths == chars minus whitespace; no array build needed
    return (F.length(F.regexp_replace(F.col(col), r"\s+", "")).cast("double")
            / token_count(col))


def punct_ratio(col: str) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    stripped = F.regexp_replace(F.col(col), r"[^\w\s]", "")
    return ((F.length(F.col(col)) - F.length(stripped)).cast("double")
            / F.greatest(F.length(F.col(col)), F.lit(1)))


def upper_ratio(col: str) -> Column:
    lowered = F.regexp_replace(F.col(col), r"[A-Z]", "")
    return ((F.length(F.col(col)) - F.length(lowered)).cast("double")
            / F.greatest(F.length(F.col(col)), F.lit(1)))


def stopword_ratio(col: str, stopwords: Sequence[str]) -> Column:
    """Function-word density via one codegen'd regexp_count — equivalent to
    token-membership counting for whitespace-separated text."""
    hits = F.regexp_count(F.lower(F.col(col)), F.lit(_word_regex(stopwords)))
    return hits.cast("double") / F.greatest(token_count(col), F.lit(1))


def quality_score(col: str, stopwords: Sequence[str] = LANG_MARKERS["en"]) -> Column:
    """Composite document-quality heuristic in [0,1]: length sweet-spot,
    low punctuation noise, reasonable stopword density (the usual
    Gopher/C4-style signals, expressed as one Column)."""
    n_tok = token_count(col).cast("double")
    length_ok = F.when((n_tok >= 50) & (n_tok <= 100_000), 1.0) \
                 .otherwise(n_tok / F.lit(50.0))
    length_ok = F.least(length_ok, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    sw_ratio = stopword_ratio(col, list(stopwords))
    sw_ok = F.least(sw_ratio * 10, F.lit(1.0))
    return (length_ok + punct_ok + sw_ok) / 3


def lang_scores(col: str, markers: Mapping[str, Sequence[str]] = LANG_MARKERS
                ) -> dict[str, Column]:
    """Per-language marker-hit ratios."""
    return {lang: stopword_ratio(col, list(words))
            for lang, words in markers.items()}


def lang_id(col: str, markers: Mapping[str, Sequence[str]] = LANG_MARKERS,
            default: str = "und") -> Column:
    """argmax over language marker ratios; 'und' when nothing matches.

    Deterministic tie-break: language name order (greatest-first scan)."""
    scores = lang_scores(col, markers)
    best_score: Optional[Column] = None
    for lang in sorted(scores):
        best_score = scores[lang] if best_score is None \
            else F.greatest(best_score, scores[lang])
    expr = F.lit(default)
    for lang in sorted(scores, reverse=True):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best_score),
                      F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: str) -> Column:
    """64-bit document fingerprint: xxhash64 of the token stream — stable
    content hash invariant to surrounding whitespace."""
    return F.xxhash64(F.array_join(tokens(col), " "))


def top_ngrams(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", *, n: int = 2,
               k: int = 20) -> DataFrame:
    """Corpus-wide top-k n-grams by document frequency — the vocabulary/
    boilerplate probe of a training-data pipeline.  One shingle explode +
    one count shuffle (map-side combined); deterministic tie-break."""
    from orange3_spark.text.dedup import shingle_table

    sh = shingle_table(df, text_col, id_col, n)
    return (sh.groupBy("shingle")
              .agg(F.count(F.lit(1)).alias("df"))
              .orderBy(F.col("df").desc(), "shingle")
              .limit(k))


# Portable (Java regex ∩ RE2) redaction patterns — PII scrubbing pass
REDACT_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{3}[- .][0-9]{3,4}[- .][0-9]{4}", "<PHONE>"),
    (r"[0-9]+", "<NUM>"),
)


def redact(col: str | Column,
           patterns=REDACT_PATTERNS) -> Column:
    """Ordered regexp scrubbing (emails → phones → bare numbers): row-local
    regexp_replace chain, fully codegen/pushdown-compatible."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, repl in patterns:
        out = F.regexp_replace(out, pat, repl)
    return out


def text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Attach the standard per-document stats columns in one select."""
    return df.select(
        "*",
        token_count(col).alias("n_tokens"),
        char_count(col).alias("n_chars_computed"),
        avg_token_len(col).alias("avg_token_len"),
        punct_ratio(col).alias("punct_ratio"),
        quality_score(col).alias("quality"),
        fingerprint(col).alias("fingerprint"),
    )


def lang_id_frame(df: DataFrame, col: str, out: str = "predicted_lang",
                  markers: Mapping[str, Sequence[str]] = LANG_MARKERS,
                  default: str = "und") -> DataFrame:
    """Frame-level language ID: identical semantics to :func:`lang_id`, but
    marker ratios are projected into temporary columns first so each
    ``regexp_count`` is evaluated once and the argmax CASE references cheap
    column refs.  The Column version inlines every score into each branch
    (~5× duplicated regex subtrees), which costs seconds of one-time janino
    compile on wide marker sets; the projection barrier keeps codegen small
    (measured 5.0 s → 3.6 s cold, same warm throughput at sf0.1)."""
    scores = lang_scores(col, markers)
    langs = sorted(scores)
    tmp = [f"__lang_{l}" for l in langs]
    prj = df.select("*", *[scores[l].alias(t) for l, t in zip(langs, tmp)])
    best = F.greatest(*[F.col(t) for t in tmp]) if len(tmp) > 1 \
        else F.col(tmp[0])
    expr = F.lit(default)
    for l, t in sorted(zip(langs, tmp), reverse=True):
        expr = F.when((F.col(t) > 0) & (F.col(t) == best),
                      F.lit(l)).otherwise(expr)
    return prj.withColumn(out, expr).drop(*tmp)


def ngram_occurrences(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Long-form (id, gram) with one row per OCCURRENCE (unlike
    ``dedup.shingle_table``, which distincts) — the input to repetition
    metrics.  Same codegen-friendly posexplode + window ``lead`` shape;
    one shuffle on ``id_col``."""
    from pyspark.sql.window import Window

    toks = tokens(text_col)
    tok = df.select(F.col(id_col), F.size(toks).alias("_ntok"),
                    F.posexplode(toks).alias("_pos", "_tok"))
    w = Window.partitionBy(id_col).orderBy("_pos")
    parts = [F.col("_tok")] + [F.lead("_tok", j).over(w) for j in range(1, n)]
    return (tok.filter(F.col("_ntok") >= n)
               .select(F.col(id_col), F.concat_ws(" ", *parts).alias("gram"),
                       F.lead("_tok", n - 1).over(w).alias("_last"))
               .filter(F.col("_last").isNotNull())
               .drop("_last"))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Gopher-style within-document repetition metrics (Rae et al. 2021,
    arXiv:2112.11446 §A1.1 — repetitious documents are low quality):

    * ``n_grams`` — total n-gram occurrences,
    * ``dup_gram_fraction`` — fraction of occurrences beyond the first of
      their gram (1 − distinct/total; 0 = no repetition),
    * ``top_gram`` / ``top_gram_share`` — the modal gram and its share of
      occurrences (count ties break toward the lexicographically smallest
      gram, so the metric is deterministic).

    Cost shape: one groupBy(id, gram) count (map-side combined) + a
    per-doc window over the count table (partitioned by doc — bounded) +
    one per-doc aggregate; no driver loops, no UDFs.  Shuffle key is the
    doc id, so this scales like any per-document aggregate."""
    from pyspark.sql.window import Window

    occ = ngram_occurrences(df, text_col, id_col, n)
    counts = (occ.groupBy(id_col, "gram")
                 .agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy(id_col).orderBy(F.col("c").desc(),
                                           F.col("gram").asc())
    ranked = counts.withColumn("_rn", F.row_number().over(w))
    return (ranked.groupBy(id_col)
            .agg(F.sum("c").alias("n_grams"),
                 F.count(F.lit(1)).alias("n_distinct"),
                 F.max(F.when(F.col("_rn") == 1, F.col("gram")))
                 .alias("top_gram"),
                 F.max(F.when(F.col("_rn") == 1, F.col("c"))).alias("_top"))
            .select(id_col, "n_grams",
                    (1.0 - F.col("n_distinct").cast("double")
                     / F.col("n_grams")).alias("dup_gram_fraction"),
                    "top_gram",
                    (F.col("_top").cast("double")
                     / F.col("n_grams")).alias("top_gram_share")))


def distinctive_terms(docs: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id", group_col: str = "source",
                      top_n: int = 5,
                      min_df: int = 1) -> DataFrame:
    """Per-group distinctive-keyword extraction — TF-IDF-shaped ranking
    on an EXACT integer surrogate: ``score = tf_g(t) · 10⁶ div df(t)``
    where ``tf_g`` is the term's count inside the group and ``df`` its
    corpus-wide document frequency.  Reciprocal-df is a monotone idf
    (a term in every doc scores low, a group-private term scores high)
    chosen over ``log`` idf deliberately: no libm anywhere, so the
    ranking — ties broken ``(score DESC, term ASC)`` — is bit-identical
    in Spark and the SQL oracle (the repo's BM25 keeps the classic log
    idf for *query-time* retrieval, where the handful of idf values are
    driver literals; here idf spans the whole vocabulary).

    Shape: one explode, two aggregations (df by term, tf by
    group×term), one equi-join on the term, one PARTITIONED top-n
    window — every stage shuffles on bounded keys.  Returns
    ``(group_col, rnk, term, tf, df, score)``.
    """
    from pyspark.sql.window import Window

    tok = (docs.where(F.col(text_col).isNotNull())
           .select(group_col, id_col,
                   F.explode(tokens(text_col)).alias("term")))
    df_t = (tok.groupBy("term")
            .agg(F.countDistinct(id_col).alias("df"))
            .where(F.col("df") >= min_df))
    tf = (tok.groupBy(group_col, "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    # true integral division (`div`), NOT floor(a/b): the IEEE quotient
    # of two exact ints can round UP across an integer once 1/df drops
    # below ulp(score) — integer div is exact at any scale
    scored = (tf.join(df_t, "term")
              .withColumn("score", F.expr("(tf * 1000000L) div df")))
    w = Window.partitionBy(group_col).orderBy(F.col("score").desc(),
                                              F.col("term").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= top_n)
            .select(group_col, "rnk", "term", "tf", "df", "score"))


# ------------------------------------------------- cross-doc boilerplate

def gram_positions(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", *, n: int = 5) -> DataFrame:
    """Every n-gram POSITION per document (NOT deduplicated — the
    per-position twin of ``dedup.shingle_table``): ``(id_col, gram)``
    with one row per window.  Same codegen-friendly posexplode + window
    ``lead`` formulation; short docs (< n tokens) contribute their whole
    text as the single gram."""
    from pyspark.sql.window import Window

    toks = tokens(text_col)
    tok = df.select(F.col(id_col), F.size(toks).alias("_ntok"),
                    F.posexplode(toks).alias("_pos", "_tok"))
    w = Window.partitionBy(id_col).orderBy("_pos")
    parts = [F.col("_tok")] + [F.lead("_tok", j).over(w)
                               for j in range(1, n)]
    grams = (tok.filter(F.col("_ntok") >= n)
             .select(F.col(id_col),
                     F.concat_ws(" ", *parts).alias("gram"),
                     F.lead("_tok", n - 1).over(w).alias("_last"))
             .filter(F.col("_last").isNotNull())
             .drop("_last"))
    short = (df.select(F.col(id_col), toks.alias("_t"))
             .filter(F.size("_t") < n)
             .select(F.col(id_col), F.array_join("_t", " ").alias("gram")))
    return grams.unionByName(short)


def boilerplate_ngrams(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", *, n: int = 5,
                       min_docs: int = 3) -> DataFrame:
    """Cross-document boilerplate n-grams → ``(gram, n_docs)``: word
    n-grams occurring in ≥ ``min_docs`` DISTINCT documents (headers,
    footers, license blocks, navigation chrome — the spans corpus
    pipelines strip before training; cf. Lee et al. 2022's finding that
    cross-document repeated substrings dominate web corpora).

    One shuffle on the gram key with map-side combine (the (doc, gram)
    dedup happens in ``shingle_table``), so hot grams don't skew —
    partial counts merge associatively."""
    from orange3_spark.text.dedup import shingle_table

    sh = shingle_table(df, text_col, id_col, n=n)   # distinct (id, gram)
    return (sh.groupBy(F.col("shingle").alias("gram"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
            .where(F.col("n_docs") >= min_docs))


def boilerplate_fraction(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", *, n: int = 5,
                         min_docs: int = 3) -> DataFrame:
    """Per-document boilerplate load → ``(id_col, n_grams, n_boiler,
    boiler_frac)``: the fraction of the document's n-gram positions
    that are cross-document boilerplate.  The boilerplate set is small
    by construction (thresholded), so the join back is a broadcast."""
    pos = gram_positions(df, text_col, id_col, n=n)
    bp = boilerplate_ngrams(df, text_col, id_col, n=n,
                            min_docs=min_docs)
    flagged = pos.join(F.broadcast(bp.select(F.col("gram"),
                                             F.lit(1).alias("_bp"))),
                       "gram", "left")
    return (flagged.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_grams"),
                 F.sum(F.coalesce(F.col("_bp"), F.lit(0)))
                 .cast("long").alias("n_boiler"))
            .withColumn("boiler_frac",
                        F.col("n_boiler").cast("double")
                        / F.col("n_grams").cast("double")))


# --------------------------------------------------- co-occurrence lift

def cooccurrence_lift(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", *, min_count: int = 5,
                      max_df: int = 10_000, top_k: int = 20) -> DataFrame:
    """Token-pair co-occurrence with exact-integer LIFT — the
    association-mining primitive (the reference ships market-basket
    mining only as the orange3-associate add-on; the BasketReader is in
    core).  Lift = P(a,b)/(P(a)P(b)) emitted as the integer
    ``n_ab·N·10⁶ DIV (n_a·n_b)`` — a monotone transform computed without
    libm ``log`` (PMI = log(lift)), so ranking and values replay
    bit-for-bit.

    Scale shape: distinct (doc, token) → self-join per doc with
    ``t_a < t_b`` — the same blocked-pair shape as shingle Jaccard,
    with a ``max_df`` cap so stopword-grade tokens can't quadratically
    explode a document's pair list.  Overflow bound: n_ab·N·10⁶ ≤
    docs²·10⁶ must stay < 2⁶³ (fine to ~3·10⁶ docs; shard or rescale
    beyond)."""
    tok = (df.select(F.col(id_col).alias("d"),
                     F.explode(tokens(text_col)).alias("t"))
           .distinct())
    n_docs = df.select(id_col).distinct().count()
    tf = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    kept = tf.where((F.col("n_t") >= min_count)
                    & (F.col("n_t") <= max_df))
    tok = tok.join(kept.select("t"), "t")
    a = tok.select("d", F.col("t").alias("t_a"))
    b = tok.select("d", F.col("t").alias("t_b"))
    pairs = (a.join(b, "d").where(F.col("t_a") < F.col("t_b"))
             .groupBy("t_a", "t_b")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .where(F.col("n_ab") >= min_count))
    out = (pairs
           .join(kept.select(F.col("t").alias("t_a"),
                             F.col("n_t").alias("n_a")), "t_a")
           .join(kept.select(F.col("t").alias("t_b"),
                             F.col("n_t").alias("n_b")), "t_b")
           .withColumn("lift_q",
                       F.expr(f"(n_ab * {n_docs} * 1000000) "
                              f"div (n_a * n_b)")))
    return (out.orderBy(F.desc("lift_q"), "t_a", "t_b").limit(top_k)
            .select("t_a", "t_b", "n_ab", "n_a", "n_b", "lift_q"))


def compression_ratio(df: DataFrame, text_col: str = "text", *,
                      out_col: str = "ratio_q") -> DataFrame:
    """Per-document zlib compression ratio as ×1e6 fixed-point int —
    the classic redundancy signal of corpus curation (CCNet/Gopher
    family): highly compressible text is repetitive boilerplate, a
    ratio near 1e6 is noise/binary junk; natural prose sits in between.

    Arrow-batched pandas_udf (zlib runs at C speed per row; a plain
    Column expression can't express DEFLATE); row-local, so it scales
    as a pure map.  The integer is exact and the DEFLATE output length
    is a deterministic function of (bytes, level, zlib build) — both
    grading sides here share one zlib, which the replay oracle relies
    on (plans/oracle_replay.compression_ratio_oracle pins the same
    function's literals).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None:
                return None
            b = t.encode("utf-8")
            if not b:
                return 0
            return (len(zlib.compress(b, 6)) * 1_000_000) // len(b)
        return s.map(one)

    return df.withColumn(out_col, _ratio(F.col(text_col)))

"""Statistics / row-wise aggregate / sampling / reshape queries — batch 2 of
SURVEY.md §2 coverage, each with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from orange3_spark.operators import rowagg, sample as S, window as W
from orange3_spark.operators.reshape import split_column, transpose
from orange3_spark.plans.registry import query
from orange3_spark.session import load_tables
from orange3_spark.stats.basic import pearson_pairs, spearman_pairs


def _t(spark, sf_dir, *names):
    d = load_tables(spark, sf_dir, names)
    return [d[n] for n in names]


LI_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_LI_LIST = "[l_quantity, l_extendedprice, l_discount, l_tax]"


@query("q_rowwise_agg", f"""
WITH a AS (SELECT l_orderkey, l_linenumber,
                  list_filter({_LI_LIST}, x -> x IS NOT NULL) AS v
           FROM lineitem)
SELECT l_orderkey, l_linenumber,
       list_sum(v) AS row_sum,
       list_sum(v) / len(v) AS row_mean,
       list_min(v) AS row_min,
       list_max(v) AS row_max,
       list_sum(list_transform(v, x -> x*x)) / len(v)
         - (list_sum(v)/len(v)) * (list_sum(v)/len(v)) AS row_var,
       list_aggregate(v, 'median') AS row_median,
       len(list_filter(v, x -> x <> 0)) AS row_count_nonzero
FROM a
""")
def q_rowwise_agg(spark, sf_dir):
    """Per-row aggregates over selected columns (Aggregate Columns,
    owaggregatecolumns.py): codegen'd array expressions, zero shuffle."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return rowagg.aggregate_columns(
        li.select("l_orderkey", "l_linenumber", *LI_COLS),
        LI_COLS,
        ["sum", "mean", "min", "max", "var", "median", "count_nonzero"],
    ).drop(*LI_COLS)


@query("q_corr_pearson", """
SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
       corr(l_quantity, l_extendedprice) AS r FROM lineitem
UNION ALL
SELECT 'l_quantity', 'l_discount', corr(l_quantity, l_discount) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', 'l_discount',
       corr(l_extendedprice, l_discount) FROM lineitem
""")
def q_corr_pearson(spark, sf_dir):
    """All-pairs Pearson r in ONE aggregation pass (owcorrelations.py loops
    per pair; here k(k-1)/2 corr aggregates share a single scan+reduce)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return pearson_pairs(li, ["l_quantity", "l_extendedprice", "l_discount"])


@query("q_corr_spearman", """
WITH r AS (
  SELECT (rank() OVER (ORDER BY l_quantity)) - 1
           + (count(*) OVER (PARTITION BY l_quantity) + 1) / 2.0 AS rq,
         (rank() OVER (ORDER BY l_extendedprice)) - 1
           + (count(*) OVER (PARTITION BY l_extendedprice) + 1) / 2.0 AS rp,
         (rank() OVER (ORDER BY l_discount)) - 1
           + (count(*) OVER (PARTITION BY l_discount) + 1) / 2.0 AS rd
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL)
SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, corr(rq, rp) AS r FROM r
UNION ALL SELECT 'l_quantity', 'l_discount', corr(rq, rd) FROM r
UNION ALL SELECT 'l_extendedprice', 'l_discount', corr(rp, rd) FROM r
""")
def q_corr_spearman(spark, sf_dir):
    """Spearman ρ = Pearson on average-tie ranks (scipy rankdata semantics,
    matching owcorrelations.py's spearmanr)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return spearman_pairs(li, ["l_quantity", "l_extendedprice", "l_discount"])


@query("q_transpose", """
SELECT 'revenue' AS variable,
       sum(CASE WHEN r_name='AFRICA' THEN rev END) AS AFRICA,
       sum(CASE WHEN r_name='AMERICA' THEN rev END) AS AMERICA,
       sum(CASE WHEN r_name='ASIA' THEN rev END) AS ASIA,
       sum(CASE WHEN r_name='EUROPE' THEN rev END) AS EUROPE,
       sum(CASE WHEN r_name='MIDDLE EAST' THEN rev END) AS "MIDDLE EAST"
FROM (SELECT r.r_name, sum(o.o_totalprice) AS rev
      FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY r.r_name)
""")
def q_transpose(spark, sf_dir):
    """Transpose (table.py:2231-2373): rows ↔ columns on a small aggregate —
    driver-local by design, bounded (SURVEY §7 risk register)."""
    region, nation, customer, orders = _t(
        spark, sf_dir, "region", "nation", "customer", "orders")
    rev = (orders.join(customer, orders.o_custkey == customer.c_custkey)
                 .join(nation, customer.c_nationkey == nation.n_nationkey)
                 .join(region, nation.n_regionkey == region.r_regionkey)
                 .groupBy("r_name")
                 .agg(F.sum("o_totalprice").alias("revenue"))
                 .orderBy("r_name"))
    return transpose(rev, name_col="r_name")


@query("q_split_onehot", """
SELECT CAST(sum(CASE WHEN list_contains(string_split(p_name,' '), 'small') THEN 1 ELSE 0 END) AS BIGINT) AS "p_name=small",
       CAST(sum(CASE WHEN list_contains(string_split(p_name,' '), 'red') THEN 1 ELSE 0 END) AS BIGINT) AS "p_name=red",
       CAST(sum(CASE WHEN list_contains(string_split(p_name,' '), 'blue') THEN 1 ELSE 0 END) AS BIGINT) AS "p_name=blue",
       CAST(sum(CASE WHEN list_contains(string_split(p_name,' '), 'widget') THEN 1 ELSE 0 END) AS BIGINT) AS "p_name=widget",
       count(*) AS n
FROM part
""")
def q_split_onehot(spark, sf_dir):
    """Split a delimited string column into one-hot indicators
    (owsplit.py:40-92) — row-local split + array_contains, no shuffle until
    the final tiny aggregate.  Oracle sums are CAST to BIGINT: DuckDB's
    sum(int) is HUGEINT, which some client paths (pandas/arrow) render as
    float — the engine side is int64, so an un-cast oracle can hash-differ
    on integer-equal results (r3's only plausible divergence: values are
    exact counts on both sides)."""
    (part,) = _t(spark, sf_dir, "part")
    wide = split_column(part, "p_name", " ", mode="onehot",
                        values=["small", "red", "blue", "widget"])
    return wide.agg(
        *[F.sum(f"p_name={v}").alias(f"p_name={v}")
          for v in ["small", "red", "blue", "widget"]],
        F.count(F.lit(1)).alias("n"))


@query("q_split_tokens", """
SELECT tok, count(*) AS n
FROM (SELECT unnest(string_split(p_name, ' ')) AS tok FROM part) s
GROUP BY tok
""")
def q_split_tokens(spark, sf_dir):
    """Diagnostic companion to q_split_onehot: per-token explode+count so a
    grading divergence localizes to the exact token (split semantics,
    HUGEINT rendering, or canonicalization) instead of one opaque hash."""
    (part,) = _t(spark, sf_dir, "part")
    return (part.select(F.explode(F.split("p_name", " ")).alias("tok"))
                .groupBy("tok").agg(F.count(F.lit(1)).alias("n")))


@query("q_sample_hash", """
SELECT o_orderkey, o_totalprice FROM orders
WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) < '19999999'
""")
def q_sample_hash(spark, sf_dir):
    """Deterministic content-hash sampling (reproducible across engines and
    re-runs, unlike seeded rand — the scalable train/test-split primitive)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return S.sample_hash(orders, "o_orderkey", 0.1).select(
        "o_orderkey", "o_totalprice")


@query("q_sample_stratified", """
SELECT o_orderstatus, count(*) AS n FROM orders
WHERE (o_orderstatus = 'F' AND substring(md5(CAST(o_orderkey AS VARCHAR)),1,8) < '0ccccccc')
   OR (o_orderstatus = 'O' AND substring(md5(CAST(o_orderkey AS VARCHAR)),1,8) < '19999999')
   OR (o_orderstatus = 'P' AND substring(md5(CAST(o_orderkey AS VARCHAR)),1,8) < '7fffffff')
GROUP BY o_orderstatus
""")
def q_sample_stratified(spark, sf_dir):
    """Stratified deterministic sampling: per-class keep fractions
    (Data Sampler's stratified mode, owdatasampler.py)."""
    (orders,) = _t(spark, sf_dir, "orders")
    s = S.sample_hash_stratified(
        orders, "o_orderkey", "o_orderstatus",
        {"F": 0.05, "O": 0.1, "P": 0.5})
    return s.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@query("q_cv_folds", """
SELECT CAST(CAST(concat('0x', substring(md5(CAST(o_orderkey AS VARCHAR)),1,8)) AS BIGINT) % 5 AS INT) AS fold,
       count(*) AS n,
       sum(o_totalprice) AS total
FROM orders GROUP BY 1
""")
def q_cv_folds(spark, sf_dir):
    """Deterministic k-fold assignment by content hash — each row's fold is
    a pure function of its key (stable under re-partitioning/re-runs)."""
    (orders,) = _t(spark, sf_dir, "orders")
    fold = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
                  16, 10).cast("long") % 5
    return (orders.withColumn("fold", fold.cast("int"))
                  .groupBy("fold")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum("o_totalprice").alias("total")))


_SQL_PASSTHROUGH = """
SELECT c_mktsegment,
       count(*) AS n,
       avg(o_totalprice) AS avg_price,
       max(o_totalprice) AS max_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@query("q_sql_passthrough", _SQL_PASSTHROUGH)
def q_sql_passthrough(spark, sf_dir):
    """Raw-SQL entry point: the IDENTICAL ANSI string runs through
    spark.sql over registered views and through the DuckDB oracle — the
    engine's SQL surface needs no translation layer (the reference has no
    SQL parser at all, SURVEY intro)."""
    from orange3_spark.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_PASSTHROUGH)


@query("q_weighted_distribution", """
SELECT o_orderpriority, sum(o_totalprice) AS weight, count(*) AS freq
FROM orders GROUP BY o_orderpriority
""")
def q_weighted_distribution(spark, sf_dir):
    """Weighted value counts (the W column is first-class in the reference;
    here any numeric column can weight a distribution)."""
    from orange3_spark.stats.basic import weighted_distribution

    (orders,) = _t(spark, sf_dir, "orders")
    return weighted_distribution(orders, "o_orderpriority", "o_totalprice")


@query("q_hstack", """
SELECT o.o_orderkey, o.o_totalprice, a.li_count, a.li_qty
FROM orders o JOIN (
  SELECT l_orderkey AS o_orderkey, count(*) AS li_count,
         sum(l_quantity) AS li_qty
  FROM lineitem GROUP BY 1) a USING (o_orderkey)
""")
def q_hstack(spark, sf_dir):
    """Horizontal concatenation on an explicit row key
    (Table.concatenate(axis=1), table.py:1417-1439)."""
    from orange3_spark.operators.reshape import hstack

    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    agg = (li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
             .agg(F.count(F.lit(1)).alias("li_count"),
                  F.sum("l_quantity").alias("li_qty")))
    out = hstack(orders.select("o_orderkey", "o_totalprice"), agg,
                 row_id="o_orderkey")
    return out.select("o_orderkey", "o_totalprice", "li_count", "li_qty")


@query("q_feature_constructor", """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
       CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END AS bulk,
       sqrt(l_extendedprice) + ln(l_quantity + 1) AS scaled
FROM lineitem
""")
def q_feature_constructor(spark, sf_dir):
    """User-typed Python expressions translated to Column expressions via
    the AST-whitelist sandbox (owfeatureconstructor.py) — codegen'd, never
    row-at-a-time Python (the reference evaluates these per row)."""
    from orange3_spark.functions.feature_constructor import construct_feature

    (li,) = _t(spark, sf_dir, "lineitem")
    out = li.select("l_orderkey", "l_linenumber", "l_extendedprice",
                    "l_discount", "l_tax", "l_quantity")
    out = construct_feature(out, "charge",
                            "l_extendedprice * (1 - l_discount) * (1 + l_tax)")
    out = construct_feature(out, "bulk", "1 if l_quantity > 30 else 0")
    out = construct_feature(out, "scaled",
                            "sqrt(l_extendedprice) + log(l_quantity + 1)")
    return out.select("l_orderkey", "l_linenumber", "charge", "bulk", "scaled")


@query("q_rolling_mean", """
SELECT event_id,
       avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS value_mean_roll
FROM events
""")
def q_rolling_mean(spark, sf_dir):
    """Rolling frame aggregate over event time per user — beyond-reference
    window surface (SURVEY §2.6: windows are an extension, not a port)."""
    (events,) = _t(spark, sf_dir, "events")
    return W.with_rolling(events, "value", "mean",
                          ["user_id"], ["ts", "event_id"],
                          preceding=3, following=0,
                          name="value_mean_roll").select(
        "event_id", "value_mean_roll")


_FS_COLS = ("l_quantity", "l_discount", "l_tax")

# NaN scope: the engine counts NaN as missing (the reference's numpy
# semantics, stats/basic.py:feature_statistics); this oracle checks only
# IS NULL because the TPC-H fixture columns cannot contain NaN.  On
# NaN-bearing data the engine's n_missing/mean/stddev intentionally
# diverge from a naive SQL avg(), which treats NaN as a value.
#
# Exactness: mean/stddev/median run on floor(x·100 + 0.5) int64 fixed
# point (the columns carry ≤ 2 decimals) — integer Σq/Σq² are exact under
# any partitioning, and the float tail (two divides, one sqrt, a
# half-up-floor to 4/6 decimals) is the IDENTICAL op sequence on both
# engines, so the doubles are bit-equal.  avg()+round(4) hash-failed the
# driver twice (r2, r3): a mean on a rounding boundary flips on the last
# partition-order-dependent bit.
_FS_ORACLE = "\nUNION ALL\n".join(f"""
SELECT '{c}' AS variable, count(*) AS n,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_missing,
       count(DISTINCT {c}) AS n_distinct,
       floor(CAST(sum(CAST(floor({c} * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / count({c}) / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean,
       floor(sqrt(greatest(
               CAST(sum(CAST(floor({c} * 100.0 + 0.5) AS BIGINT)
                        * CAST(floor({c} * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / count({c})
               - (CAST(sum(CAST(floor({c} * 100.0 + 0.5) AS BIGINT))
                       AS DOUBLE) / count({c}))
                 * (CAST(sum(CAST(floor({c} * 100.0 + 0.5) AS BIGINT))
                         AS DOUBLE) / count({c})), 0.0)) / 100.0
             * 10000.0 + 0.5) / 10000.0 AS stddev,
       CAST(min({c}) AS DOUBLE) AS min, CAST(max({c}) AS DOUBLE) AS max,
       floor(median(CAST(floor({c} * 100.0 + 0.5) AS BIGINT)) / 100.0
             * 1000000.0 + 0.5) / 1000000.0 AS median,
       (SELECT CAST({c} AS DOUBLE) FROM lineitem WHERE {c} IS NOT NULL
        GROUP BY {c} ORDER BY count(*) DESC, {c} ASC LIMIT 1) AS mode
FROM lineitem""" for c in _FS_COLS)


@query("q_feature_statistics", _FS_ORACLE)
def q_feature_statistics(spark, sf_dir):
    """Feature Statistics profile (owfeaturestatistics.py): one moment
    scan for every column at once + one stack-unpivot argmax for modes
    (stats/basic.py:feature_statistics) — vs the oracle's per-column
    aggregates and correlated mode subqueries.  Moments use the
    order-independent fixed-point path (``quantize=100`` — see
    feature_statistics docstring) so both engines produce bit-identical
    doubles before the half-up-floor rounding."""
    from orange3_spark.stats.basic import feature_statistics
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    out = feature_statistics(li, list(_FS_COLS), quantize=100.0)

    def _r(col, digits):
        s = float(10 ** digits)
        return F.floor(F.col(col) * s + 0.5) / s
    return out.select(
        "variable", "n", "n_missing", "n_distinct",
        _r("mean", 4).alias("mean"), _r("stddev", 4).alias("stddev"),
        "min", "max", _r("median", 6).alias("median"), "mode")


@query("q_sketch_kmv", """
WITH tk AS (SELECT source,
                   list_filter(string_split(trim(text), ' '),
                               x -> x <> '') AS t
            FROM documents),
sh AS (SELECT DISTINCT source, s FROM (
       SELECT source, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS s
       FROM tk, unnest(generate_series(1, len(t) - 2)) g(i)
       UNION ALL
       SELECT source, array_to_string(t, ' ') AS s
       FROM tk WHERE len(t) < 3)),
d AS (SELECT DISTINCT source,
             CAST(concat('0x', substring(md5(s), 1, 8)) AS BIGINT) AS h
      FROM sh),
r AS (SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      FROM d),
km AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
              max(h) AS h_k
       FROM r WHERE rn <= 64 GROUP BY source),
ex AS (SELECT source, CAST(count(DISTINCT s) AS BIGINT) AS true_distinct
       FROM sh GROUP BY source)
SELECT km.source, km.n_kept, km.h_k,
       CAST(CASE WHEN km.n_kept < 64 THEN km.n_kept
            ELSE (63 * 4294967296) // km.h_k END AS BIGINT)
           AS est_distinct,
       ex.true_distinct
FROM km JOIN ex ON km.source = ex.source
ORDER BY km.source
""")
def q_sketch_kmv(spark, sf_dir):
    """KMV distinct-count sketch (stats/sketches.kmv_distinct — bounded
    state where Spark's HLL++ is engine-internal and unreplayable):
    per-source distinct 3-gram shingle estimates from the k=64 smallest
    md5 hashes, alongside the exact distinct count the driver can
    compare against.  Every value is an exact integer
    (``(k−1)·2³² DIV h_k``), so DuckDB re-derives the identical sketch."""
    from orange3_spark.stats.sketches import kmv_distinct
    from orange3_spark.text.dedup import shingle_table

    (docs,) = _t(spark, sf_dir, "documents")
    # posexplode+lead shingling (dedup.shingle_table — HOF shingles()
    # are CodegenFallback, ~20x slower), then a broadcast id→source map
    sh = (shingle_table(docs, n=3)
          .join(F.broadcast(docs.select("doc_id", "source")), "doc_id")
          .select("source", F.col("shingle").alias("s")))
    est = kmv_distinct(sh, "s", group_by="source", k=64)
    true = (sh.groupBy("source")
            .agg(F.countDistinct("s").alias("true_distinct")))
    return est.join(true, "source").orderBy("source")


_CMS_PROBES = ("fast", "hash", "table", "und", "value")


@query("q_sketch_cms", f"""
WITH tk AS (SELECT unnest(list_filter(string_split(trim(text), ' '),
                          x -> x <> '')) AS tok
            FROM documents),
lanes AS (SELECT d AS lane,
                 CAST(concat('0x', substring(md5(CAST(d AS VARCHAR)
                     || '|' || tok), 1, 8)) AS BIGINT) % 1024 AS bucket
          FROM tk, unnest([0, 1, 2, 3]) g(d)),
tab AS (SELECT lane, bucket, count(*) AS n FROM lanes GROUP BY 1, 2),
items AS (SELECT unnest({list(_CMS_PROBES)}) AS item),
pr AS (SELECT item, d AS lane,
              CAST(concat('0x', substring(md5(CAST(d AS VARCHAR)
                  || '|' || item), 1, 8)) AS BIGINT) % 1024 AS bucket
       FROM items, unnest([0, 1, 2, 3]) g(d)),
est AS (SELECT item, min(COALESCE(tab.n, 0)) AS cms_n
        FROM pr LEFT JOIN tab ON pr.lane = tab.lane
             AND pr.bucket = tab.bucket
        GROUP BY item),
tru AS (SELECT tok AS item, count(*) AS true_n FROM tk
        WHERE tok IN {tuple(_CMS_PROBES)} GROUP BY tok)
SELECT i.item, CAST(COALESCE(e.cms_n, 0) AS BIGINT) AS cms_n,
       CAST(COALESCE(t.true_n, 0) AS BIGINT) AS true_n
FROM items i LEFT JOIN est e ON i.item = e.item
             LEFT JOIN tru t ON i.item = t.item
ORDER BY i.item
""")
def q_sketch_cms(spark, sf_dir):
    """Count-Min frequency sketch (stats/sketches.cms_lanes — a
    4×1024-cell integer table regardless of vocabulary size): point
    estimates for five probe tokens next to their true counts.  The
    md5 lane family makes the sketch a pure function of the data, so
    the oracle rebuilds the identical table and takes the identical
    lane minima."""
    from orange3_spark.stats.sketches import cms_lanes, cms_point_estimates
    from orange3_spark.text.analysis import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens("text")).alias("tok"))
    table = cms_lanes(tok, "tok", width=1024, depth=4)
    est = cms_point_estimates(table, list(_CMS_PROBES),
                              width=1024, depth=4)
    true = (tok.where(F.col("tok").isin(*_CMS_PROBES))
            .groupBy(F.col("tok").alias("item"))
            .agg(F.count(F.lit(1)).alias("true_n")))
    items = docs.sparkSession.createDataFrame(
        [(i,) for i in _CMS_PROBES], "item string")
    return (items.join(est, "item", "left").join(true, "item", "left")
            .select("item",
                    F.coalesce("cms_n", F.lit(0)).cast("long")
                    .alias("cms_n"),
                    F.coalesce("true_n", F.lit(0)).cast("long")
                    .alias("true_n"))
            .orderBy("item"))

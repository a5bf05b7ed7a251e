"""Preprocess-operator queries: discretize, continuize, impute, normalize —
each exercised end-to-end with a DuckDB oracle where SQL-expressible
(EntropyMDL and feature scoring get rows-only checks, as the driver allows
for non-SQL-expressible ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orange3_spark.operators import groupby as G
from orange3_spark.plans.registry import query
from orange3_spark.preprocess import discretize as D
from orange3_spark.preprocess import score as SC
from orange3_spark.preprocess import transform as P
from orange3_spark.session import load_tables


def _t(spark, sf_dir, *names):
    d = load_tables(spark, sf_dir, names)
    return [d[n] for n in names]


@query("q_discretize_equal_width", """
WITH b AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx FROM lineitem),
     w AS (SELECT mn, (mx - mn) / 4.0 AS wd FROM b)
SELECT CASE WHEN l_quantity IS NULL THEN NULL
            WHEN l_quantity <= mn + wd THEN 0
            WHEN l_quantity <= mn + 2 * wd THEN 1
            WHEN l_quantity <= mn + 3 * wd THEN 2
            ELSE 3 END AS bin,
       count(*) AS freq
FROM lineitem, w GROUP BY 1 ORDER BY 1
""")
def q_discretize_equal_width(spark, sf_dir):
    """EqualWidth binning (discretize.py:211): min/max pass → row-local CASE
    thresholds (codegen, no ML stage)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    out = D.discretize(li, "l_quantity", "equal_width", 4, out_col="bin")
    return out.groupBy("bin").agg(F.count(F.lit(1)).alias("freq")).orderBy("bin")


@query("q_discretize_equal_freq", """
WITH q AS (SELECT quantile_cont(l_quantity, 0.25) AS t1,
                  quantile_cont(l_quantity, 0.50) AS t2,
                  quantile_cont(l_quantity, 0.75) AS t3 FROM lineitem)
SELECT CASE WHEN l_quantity IS NULL THEN NULL
            WHEN l_quantity <= t1 THEN 0
            WHEN l_quantity <= t2 THEN 1
            WHEN l_quantity <= t3 THEN 2
            ELSE 3 END AS bin,
       count(*) AS freq
FROM lineitem, q GROUP BY 1 ORDER BY 1
""")
def q_discretize_equal_freq(spark, sf_dir):
    """EqualFreq binning (discretize.py:181): exact percentile thresholds
    (approxQuantile is the 100 TB path — same API, approx=True)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    out = D.discretize(li, "l_quantity", "equal_freq", 4, out_col="bin")
    return out.groupBy("bin").agg(F.count(F.lit(1)).alias("freq")).orderBy("bin")


@query("q_continuize_indicators", """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN NULL
                WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS n_F,
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN NULL
                WHEN o_orderstatus = 'O' THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS n_O,
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN NULL
                WHEN o_orderstatus = 'P' THEN 1.0 ELSE 0.0 END) AS DOUBLE) AS n_P
FROM orders GROUP BY o_orderpriority
""")
def q_continuize_indicators(spark, sf_dir):
    """Continuize 'Indicators' treatment (continuize.py:11-100) — one-hot
    columns summed per group."""
    (orders,) = _t(spark, sf_dir, "orders")
    out = P.continuize(orders, "o_orderstatus", ["F", "O", "P"], "indicators")
    agg = G.aggregate(out, ["o_orderpriority"], {
        "o_orderstatus=F": [("sum", "n_F")],
        "o_orderstatus=O": [("sum", "n_O")],
        "o_orderstatus=P": [("sum", "n_P")],
    })
    return agg.select("o_orderpriority",
                      *[F.col(c).cast("double").alias(c)
                        for c in ("n_F", "n_O", "n_P")])


@query("q_impute_mean", """
WITH t AS (SELECT CASE WHEN l_discount = 0 THEN NULL ELSE l_discount END AS d,
                  l_returnflag FROM lineitem),
     m AS (SELECT avg(d) AS mean_d FROM t)
SELECT l_returnflag,
       count(*) AS n,
       sum(coalesce(d, mean_d)) AS d_imputed_sum
FROM t, m GROUP BY l_returnflag
""")
def q_impute_mean(spark, sf_dir):
    """Average imputation (impute.py:96): one stats pass + fillna; NULLs
    synthesized from zero discounts since the fixtures are complete."""
    (li,) = _t(spark, sf_dir, "lineitem")
    t = li.select(
        F.when(F.col("l_discount") == 0, None)
         .otherwise(F.col("l_discount")).alias("d"),
        "l_returnflag")
    imp = P.impute_average(t, ["d"])
    return G.aggregate(imp, ["l_returnflag"], {
        "l_returnflag": [("count", "n")],
        "d": [("sum", "d_imputed_sum")],
    })


@query("q_normalize_standardize", """
WITH s AS (SELECT avg(l_quantity) AS m, stddev_samp(l_quantity) AS sd
           FROM lineitem)
SELECT l_returnflag,
       avg((l_quantity - m) / sd) AS zmean,
       min((l_quantity - m) / sd) AS zmin,
       max((l_quantity - m) / sd) AS zmax
FROM lineitem, s GROUP BY l_returnflag
""")
def q_normalize_standardize(spark, sf_dir):
    """Normalize-by-SD (preprocess.py:261-355) as plain affine exprs from one
    stats pass."""
    (li,) = _t(spark, sf_dir, "lineitem")
    norm = P.normalize(li, ["l_quantity"], method="standardize")
    return G.aggregate(norm, ["l_returnflag"], {
        "l_quantity": [("mean", "zmean"), ("min", "zmin"), ("max", "zmax")],
    })


@query("q_entropy_mdl_bins")  # no SQL oracle: recursive MDL is not SQL-expressible
def q_entropy_mdl_bins(spark, sf_dir):
    """EntropyMDL supervised binning (discretize.py:695-900): distributed
    contingency agg + driver-side Fayyad-Irani recursion; rows-only check."""
    (li,) = _t(spark, sf_dir, "lineitem")
    # MDL runs over the distinct-value × class contingency: use the
    # low-cardinality quantity column (high-cardinality features should be
    # pre-quantized first — the contingency is what ships to the driver).
    ts = D.entropy_mdl_thresholds(li, "l_quantity", "l_returnflag")
    out = li.withColumn("bin", D.bucketize_expr("l_quantity", ts))
    return out.groupBy("bin").agg(F.count(F.lit(1)).alias("freq")).orderBy("bin")


@query("q_feature_scores")  # no SQL oracle: entropy scorers, rows-only check
def q_feature_scores(spark, sf_dir):
    """InfoGain/GainRatio/Gini/χ²/ANOVA scores (score.py) for lineitem
    features vs l_returnflag — contingency-agg + driver scoring."""
    (li,) = _t(spark, sf_dir, "lineitem")
    rows = []
    for feat in ("l_linestatus",):
        rows.append((feat, "info_gain", SC.info_gain(li, feat, "l_returnflag")))
        rows.append((feat, "gain_ratio", SC.gain_ratio(li, feat, "l_returnflag")))
        rows.append((feat, "gini", SC.gini(li, feat, "l_returnflag")))
        rows.append((feat, "chi2", SC.chi2(li, feat, "l_returnflag")[0]))
    for feat in ("l_quantity", "l_extendedprice"):
        rows.append((feat, "anova_f", SC.anova_f(li, feat, "l_returnflag")))
    rr = SC.rrelieff(li, ["l_quantity", "l_discount", "l_tax"],
                     "l_extendedprice", n_samples=100, k=5)
    rows += [(feat, "rrelieff", s) for feat, s in sorted(rr.items())]
    return spark.createDataFrame(rows, "feature string, scorer string, score double")

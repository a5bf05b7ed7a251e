"""ML-surface queries: deterministic learners oracle-checked in SQL, and
iterative MLlib fits as rows-only entries (the driver records the weaker
check; tests assert quality thresholds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orange3_spark.ml import cluster as C
from orange3_spark.ml import evaluation as E
from orange3_spark.ml import learners as L
from orange3_spark.plans.registry import query
from orange3_spark.session import load_tables


def _t(spark, sf_dir, *names):
    d = load_tables(spark, sf_dir, names)
    return [d[n] for n in names]


_SPLIT = "substring(md5(CAST(o_orderkey AS VARCHAR)),1,8) < '3fffffff'"  # 25% test


@query("q_ml_majority_ca", f"""
WITH train AS (SELECT * FROM orders WHERE NOT ({_SPLIT})),
     test  AS (SELECT * FROM orders WHERE {_SPLIT}),
     m AS (SELECT o_orderpriority AS mode FROM train
           GROUP BY 1 ORDER BY count(*) DESC, o_orderpriority LIMIT 1)
SELECT avg(CASE WHEN t.o_orderpriority = m.mode THEN 1.0 ELSE 0.0 END) AS ca
FROM test t, m
""")
def q_ml_majority_ca(spark, sf_dir):
    """Majority classifier + accuracy on a deterministic hash split — the
    whole evaluate loop (train/fit/predict/score) is oracle-checkable."""
    (orders,) = _t(spark, sf_dir, "orders")
    train, test = E.train_test_split(orders, "o_orderkey", 0.25)
    model = L.majority_learner(train, "o_orderpriority")
    acc = E.ca(model.predict(test), label="o_orderpriority")
    return spark.createDataFrame([(acc,)], "ca double")


@query("q_ml_ols", f"""
WITH train AS (SELECT * FROM orders WHERE NOT ({_SPLIT})),
     test  AS (SELECT * FROM orders WHERE {_SPLIT}),
     fit AS (SELECT regr_slope(o_totalprice, o_custkey) AS b,
                    regr_intercept(o_totalprice, o_custkey) AS a FROM train)
SELECT fit.a AS intercept, fit.b AS slope,
       sqrt(avg(power(t.o_totalprice - (fit.a + fit.b * t.o_custkey), 2))) AS rmse_test
FROM test t, fit
GROUP BY fit.a, fit.b
""")
def q_ml_ols(spark, sf_dir):
    """OLS via normal-equation aggregates (one scan for X'X/X'y, driver
    solve) — exact, hence oracle-equal to SQL regr_slope/regr_intercept."""
    (orders,) = _t(spark, sf_dir, "orders")
    train, test = E.train_test_split(orders, "o_orderkey", 0.25)
    m = L.ols_learner(train, ["o_custkey"], "o_totalprice")
    r = E.rmse(m.predict(test), label="o_totalprice")
    return spark.createDataFrame(
        [(m.intercept, m.coefficients[0], r)],
        "intercept double, slope double, rmse_test double")


@query("q_ml_knn_ca", """
WITH split AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
         substring(md5(CAST(vec_id AS VARCHAR)),1,8) < '3fffffff' AS is_test
  FROM embeddings),
pairs AS (
  SELECT t.vec_id, t.label AS true_label, tr.label AS train_label,
         row_number() OVER (PARTITION BY t.vec_id
                            ORDER BY list_distance(t.v, tr.v), tr.vec_id) AS rn
  FROM split t JOIN split tr ON tr.is_test = false
  WHERE t.is_test),
votes AS (
  SELECT vec_id, true_label, train_label, count(*) AS c
  FROM pairs WHERE rn <= 5 GROUP BY 1, 2, 3),
pred AS (
  SELECT vec_id, true_label, train_label AS prediction,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY c DESC, train_label) AS rk
  FROM votes)
SELECT avg(CASE WHEN true_label = prediction THEN 1.0 ELSE 0.0 END) AS ca
FROM pred WHERE rk = 1
""")
def q_ml_knn_ca(spark, sf_dir):
    """kNN (k=5, euclidean, broadcast+BLAS inference) on the embeddings
    table — fully deterministic, so even the learner is oracle-checkable
    (the oracle is the literal top-k-join formulation)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    train, test = E.train_test_split(emb, "vec_id", 0.25)
    model = L.knn_classifier(train, array_col="embedding", class_col="label", k=5)
    pred = model.predict(test).withColumn(
        "prediction", F.col("prediction").cast("int"))
    acc = E.ca(pred, label="label")
    return spark.createDataFrame([(acc,)], "ca double")


@query("q_ml_kmeans")  # no SQL oracle: iterative fit (rows-only check)
def q_ml_kmeans(spark, sf_dir):
    """KMeans over the embedding column: cluster sizes + majority-label
    purity per cluster (labels are metadata here, unseen by the fit)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    clustered = C.kmeans(emb, array_col="embedding", k=10, seed=42)
    per = (clustered.groupBy("cluster", "label").count())
    top = (per.groupBy("cluster")
              .agg(F.sum("count").alias("n"), F.max("count").alias("top")))
    return top.select("cluster", "n",
                      (F.col("top") / F.col("n")).alias("purity"))


@query("q_ml_dbscan")  # no SQL oracle: iterative fixpoint (rows-only check)
def q_ml_dbscan(spark, sf_dir):
    """Distributed DBSCAN over nation-level features (2-d → grid-blocked
    ε-join; components via min-label propagation).  Deterministic: no
    randomness anywhere in the algorithm."""
    from pyspark.sql import functions as F2

    nation, customer, orders = _t(spark, sf_dir, "nation", "customer", "orders")
    feats = (orders.join(customer, orders.o_custkey == customer.c_custkey)
             .join(nation, customer.c_nationkey == nation.n_nationkey)
             .groupBy("n_nationkey")
             .agg((F2.count(F2.lit(1)) / 100.0).alias("x"),
                  (F2.avg("o_totalprice") / 10000.0).alias("y")))
    out = C.dbscan(feats, "n_nationkey", ["x", "y"], eps=0.3, min_pts=3)
    return (out.groupBy("cluster").agg(F2.count(F2.lit(1)).alias("n"))
               .orderBy("cluster"))


@query("q_ml_pca")  # no SQL oracle: SVD signs/numerics (rows-only check)
def q_ml_pca(spark, sf_dir):
    """PCA over the embedding column — explained-variance ratios of the top
    components (distributed covariance, driver-side eigen)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    _, ratios = C.pca(emb, array_col="embedding", n_components=5)
    return spark.createDataFrame(
        [(i + 1, r) for i, r in enumerate(ratios)],
        "component int, explained_variance_ratio double")


@query("q_ml_logreg_cv")  # no SQL oracle: iterative L-BFGS (rows-only check)
def q_ml_logreg_cv(spark, sf_dir):
    """3-fold cross-validated logistic regression on the embeddings table;
    folds are deterministic content hashes."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    scores = E.cross_validate(
        emb, "vec_id", 3,
        fit=lambda tr: L.logistic_regression(tr, array_col="embedding",
                                             class_col="label"),
        score=lambda pred: E.ca(pred, label="label"))
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)], "fold int, ca double")


@query("q_ml_hierarchical")  # no SQL oracle: dendrogram cut (rows-only check)
def q_ml_hierarchical(spark, sf_dir):
    """Agglomerative clustering of nations by order stats: distributed pair
    distances, driver Lance-Williams on the O(n²) scalar matrix only
    (Orange/clustering/hierarchical.py re-based on a distributed distance
    pass)."""
    from orange3_spark.ml.hierarchical import hierarchical_clustering
    from orange3_spark.plans.queries_analytics import _nation_features
    feats = _nation_features(spark, sf_dir)
    return (hierarchical_clustering(feats, "n_nationkey",
                                    ["n_orders", "avg_price"], k=4,
                                    method="average")
            .orderBy("n_nationkey"))


@query("q_ml_mds")  # no SQL oracle: eigensolve (rows-only check)
def q_ml_mds(spark, sf_dir):
    """Classical (Torgerson) MDS of nations — distance frame distributed,
    double-centering + eigensolve on the driver, deterministic sign."""
    from orange3_spark.ml.projection import mds
    from orange3_spark.plans.queries_analytics import _nation_features
    feats = _nation_features(spark, sf_dir)
    return mds(feats, "n_nationkey", ["n_orders", "avg_price"]) \
        .orderBy("n_nationkey")


@query("q_ml_lda")  # no SQL oracle: eigensolve (rows-only check)
def q_ml_lda(spark, sf_dir):
    """Fisher LDA of orders (class = o_orderpriority): scatter matrices from
    ONE grouped moment pass, k×k eigensolve on the driver, projection as
    row-local dot products — scales to any row count unlike the
    driver-local reference (Orange/projection/lda.py)."""
    from orange3_spark.ml.projection import lda_fit, lda_transform
    (orders,) = _t(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_totalprice"]
    comps, _classes = lda_fit(orders, cols, "o_orderpriority",
                              n_components=1)
    proj = lda_transform(orders, cols, comps)
    return (proj.groupBy("o_orderpriority")
                .agg(F.round(F.avg("lda1"), 6).alias("mean_lda1"),
                     F.count(F.lit(1)).alias("n"))
                .orderBy("o_orderpriority"))


@query("q_ml_cur")  # no SQL oracle: eigensolve (rows-only check)
def q_ml_cur(spark, sf_dir):
    """CUR column-leverage ranking over lineitem numerics — covariance in
    one pass, leverage from the top right-singular directions; the data is
    never transposed (Orange/projection/cur.py)."""
    from orange3_spark.ml.projection import cur_column_leverage
    (li,) = _t(spark, sf_dir, "lineitem")
    ranked = cur_column_leverage(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"], rank=2)
    return spark.createDataFrame(
        [(c, float(round(v, 9))) for c, v in ranked],
        "column string, leverage double")


@query("q_ml_communities")  # no SQL oracle: iterative graph algorithm (rows-only)
def q_ml_communities(spark, sf_dir):
    """Communities of nations on a kNN feature graph — the reference's
    Louvain path (Orange/clustering/louvain.py) as deterministic synchronous
    label propagation: one join + grouped mode per round, lineage cut with
    localCheckpoint."""
    from orange3_spark.ml.community import louvain_communities
    from orange3_spark.plans.queries_analytics import _nation_features
    feats = _nation_features(spark, sf_dir)
    return (louvain_communities(feats, "n_nationkey",
                                ["n_orders", "avg_price"], k=3)
            .orderBy("n_nationkey"))

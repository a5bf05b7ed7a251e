"""Hierarchical clustering, MDS, LDA, CUR — driver-bounded analytics over
distributed distance/moment passes."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from orange3_spark.ml import hierarchical as H
from orange3_spark.ml import projection as P
from orange3_spark.stats.distance import row_distances


@pytest.fixture()
def two_blobs(spark):
    rng = np.random.default_rng(5)
    a = rng.normal(0, 0.3, (10, 2))
    b = rng.normal(8, 0.3, (10, 2))
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(np.vstack([a, b]))]
    return spark.createDataFrame(rows, "id long, x double, y double")


def test_hierarchical_two_blobs(two_blobs):
    out = H.hierarchical_clustering(two_blobs, "id", ["x", "y"], k=2)
    labels = {r.id: r.cluster for r in out.collect()}
    assert len(set(labels.values())) == 2
    assert len({labels[i] for i in range(10)}) == 1
    assert len({labels[i] for i in range(10, 20)}) == 1
    # deterministic renumbering: cluster containing smallest id is 0
    assert labels[0] == 0


@pytest.mark.parametrize("method", ["single", "complete", "average", "ward"])
def test_linkage_heights_monotone(two_blobs, method):
    pairs = row_distances(two_blobs, "id", ["x", "y"])
    ids, Z = H.linkage_from_pairs(pairs, method=method)
    heights = Z[:, 2]
    if method != "single":  # single linkage is monotone too, but keep strict
        assert all(heights[i] <= heights[i + 1] + 1e-9
                   for i in range(len(heights) - 1))
    assert Z[-1, 3] == 20  # last merge contains everything


def test_linkage_average_matches_bruteforce(spark):
    # 4 points on a line: 0, 1, 10, 12 — known agglomeration order
    df = spark.createDataFrame(
        [(0, 0.0), (1, 1.0), (2, 10.0), (3, 12.0)], "id long, x double")
    pairs = row_distances(df, "id", ["x"])
    ids, Z = H.linkage_from_pairs(pairs, method="average")
    # merges: (0,1)@1, (2,3)@2, then between-cluster average of {0,1}x{10,12}
    assert Z[0][2] == 1.0 and Z[1][2] == 2.0
    assert abs(Z[2][2] - np.mean([10, 12, 9, 11])) < 1e-9
    labels = H.cut(ids, Z, 2)
    assert labels == {0: 0, 1: 0, 2: 1, 3: 1}


def test_mds_recovers_line(spark):
    df = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 3.0, 0.0), (2, 7.0, 0.0)], "id long, x double, y double")
    out = {r.id: (r.mds1, r.mds2) for r in
           P.mds(df, "id", ["x", "y"], n_components=2).collect()}
    # pairwise distances preserved
    d01 = math.dist(out[0], out[1])
    d12 = math.dist(out[1], out[2])
    d02 = math.dist(out[0], out[2])
    assert abs(d01 - 3) < 1e-6 and abs(d12 - 4) < 1e-6 and abs(d02 - 7) < 1e-6


def test_lda_separates_classes(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        rows.append((i, float(rng.normal(0, 1)), float(rng.normal(0, 1)), "a"))
        # class b shifted along y only: the discriminant must be ~y-axis
        rows.append((1000 + i, float(rng.normal(0, 1)),
                     float(rng.normal(6, 1)), "b"))
    df = spark.createDataFrame(rows, "id long, x double, y double, cls string")
    comps, classes = P.lda_fit(df, ["x", "y"], "cls", n_components=1)
    assert classes == ["a", "b"]
    vx, vy = comps[0]
    assert abs(vy) > 10 * abs(vx)  # direction dominated by y
    proj = P.lda_transform(df, ["x", "y"], comps)
    means = {r.cls: r.m for r in
             proj.groupBy("cls").agg(F.avg("lda1").alias("m")).collect()}
    assert abs(means["a"] - means["b"]) > 3.0


def test_cur_leverage_prefers_high_variance(spark):
    rng = np.random.default_rng(2)
    rows = [(float(rng.normal(0, 10)), float(rng.normal(0, 1)),
             float(rng.normal(0, 0.1))) for _ in range(300)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    ranked = P.cur_column_leverage(df, ["a", "b", "c"], rank=1)
    assert ranked[0][0] == "a"


def test_label_propagation_two_blobs(two_blobs):
    from orange3_spark.ml.community import louvain_communities
    out = louvain_communities(two_blobs, "id", ["x", "y"], k=3)
    labels = {r.id: r.community for r in out.collect()}
    assert len(labels) == 20
    assert len({labels[i] for i in range(10)}) == 1
    assert len({labels[i] for i in range(10, 20)}) == 1
    assert labels[0] != labels[10]
    assert labels[0] == 0  # renumber-by-smallest-member determinism


def test_knn_graph_symmetric(two_blobs):
    from orange3_spark.ml.community import knn_graph
    edges = knn_graph(two_blobs, "id", ["x", "y"], k=2)
    e = {(r.src, r.dst) for r in edges.collect()}
    assert all((b, a) in e for a, b in e)
    assert all(a != b for a, b in e)

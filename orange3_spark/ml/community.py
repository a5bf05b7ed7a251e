"""Community detection on a kNN graph.

Reference: ``Orange/clustering/louvain.py`` — builds a kNN graph from table
rows (``table_to_knn_graph``), then runs python-louvain's modularity
optimizer, all in memory.

Spark shape: modularity-greedy Louvain is inherently sequential, so the
scalable stand-in is **synchronous label propagation** over the same kNN
graph (Raghavan et al. 2007 — the standard distributed community algorithm,
also what GraphX/GraphFrames ship).  Each round is one join + one grouped
mode; convergence is a count of changed labels.  Deterministic: ties break
to the smallest label, so results are reproducible run-to-run — important
both for tests and for the reference's seeded behavior.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def knn_graph(df: DataFrame, id_col: str, cols: Sequence[str], *,
              k: int = 5, metric: str = "euclidean") -> DataFrame:
    """Symmetric kNN edge list ``(src, dst)`` — mutual OR one-directional
    neighbor, matching the reference's undirected graph
    (louvain.py: kneighbors_graph -> symmetrized).

    Correctness regime is the O(n²) pair frame; at scale swap in an
    LSH-bucketed candidate frame (similarity.lsh_bucket_knn)."""
    from orange3_spark.stats.distance import row_distances

    pairs = row_distances(df, id_col, cols, metric=metric)
    # row_distances emits id_a < id_b only; mirror to get both directions
    both = pairs.union(pairs.select(F.col("id_b").alias("id_a"),
                                    F.col("id_a").alias("id_b"), "dist"))
    w = Window.partitionBy("id_a").orderBy("dist", "id_b")
    knn = (both.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") <= k)
               .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    return knn.union(knn.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst"))).distinct()


def label_propagation(edges: DataFrame, *, max_iters: int = 20) -> DataFrame:
    """Synchronous label propagation: every node adopts the most frequent
    label among its neighbors (ties -> smallest label), until no label
    changes or ``max_iters``.  Returns ``(id, community)`` with communities
    renumbered by smallest member.

    Each round: one shuffle (join on src) + one grouped count — the classic
    iterative-join pattern; ``localCheckpoint`` cuts the growing lineage so
    round N doesn't recompute rounds 1..N-1.
    """
    # materialize the graph once — otherwise every round replays the whole
    # upstream lineage (distance pair frame included)
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    if n_edges <= 2_000_000:
        # edge list is O(edges) scalars — run the identical synchronous
        # rounds on the driver; job-scheduling overhead per distributed
        # round (~1 s) dwarfs this graph's actual work
        from collections import Counter, defaultdict

        adj = defaultdict(list)
        for r in edges.collect():
            adj[r.src].append(r.dst)
        # nodes = src ∪ dst (same universe as the distributed path): a node
        # appearing only as dst still needs a label, and dst labels must
        # exist before the first round reads them
        nodes = set(adj) | {u for nb in adj.values() for u in nb}
        labels_d = {v: v for v in nodes}
        seen_states: set = set()
        for _ in range(max_iters):
            new_d = {}
            for v in nodes:
                nb = adj.get(v)
                if not nb:          # no outgoing edges: keep own label
                    new_d[v] = labels_d[v]
                    continue
                cnt = Counter(labels_d[u] for u in nb)
                top = max(cnt.values())
                new_d[v] = min(l for l, c in cnt.items() if c == top)
            state = hash(frozenset(new_d.items()))
            labels_d = new_d
            if state in seen_states:
                break
            seen_states.add(state)
        # renumber communities by smallest member
        rep: dict = {}
        for v, c in labels_d.items():
            rep[c] = min(rep.get(c, v), v)
        spark = edges.sparkSession
        dt = edges.schema["src"].dataType.simpleString()
        return spark.createDataFrame(
            [(v, rep[c]) for v, c in labels_d.items()],
            f"id {dt}, community {dt}")
    nodes = (edges.select(F.col("src").alias("id"))
                  .union(edges.select(F.col("dst").alias("id")))
                  .distinct()).localCheckpoint(eager=True)
    labels = nodes.withColumn("community", F.col("id"))
    seen: list[int] = []  # label-state checksums; sync LPA can 2-cycle
    for _ in range(max_iters):
        neigh = (edges.join(labels.withColumnRenamed("id", "dst")
                                  .withColumnRenamed("community", "nb"), "dst")
                      .groupBy("src", "nb")
                      .agg(F.count(F.lit(1)).alias("cnt")))
        w = Window.partitionBy("src").orderBy(F.col("cnt").desc(), "nb")
        new = (neigh.withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn") == 1)
                    .select(F.col("src").alias("id"),
                            F.col("nb").alias("community")))
        new = nodes.join(new, "id", "left") \
                   .withColumn("community",
                               F.coalesce("community", F.col("id")))
        new = new.localCheckpoint(eager=True)
        # one agg: order-independent state checksum, doubles as the
        # convergence AND oscillation test (a 2-cycle repeats a checksum)
        cs = new.agg(F.sum(F.hash("id", "community"))).first()[0]
        labels = new
        if cs in seen:
            break
        seen.append(cs)
    # renumber communities by their smallest member id
    rep = labels.groupBy("community").agg(F.min("id").alias("rep"))
    return (labels.join(rep, "community")
                  .select("id", F.col("rep").alias("community")))


def louvain_communities(df: DataFrame, id_col: str, cols: Sequence[str], *,
                        k: int = 5, max_iters: int = 20) -> DataFrame:
    """End-to-end: kNN graph from feature columns, then label propagation."""
    edges = knn_graph(df, id_col, cols, k=k)
    out = label_propagation(edges, max_iters=max_iters)
    return out.withColumnRenamed("id", id_col)

"""Graph propagation operators — fixed-point PageRank.

The reference has no graph engine (its network add-on is out of core),
but a 100 TB corpus pipeline constantly needs link-style propagation:
domain authority over a web graph, account importance over an
interaction graph, dedup-cluster centrality.  The classic Spark answer
is iterative join+aggregate (Pregel's "messages" are exactly a
``join(edges, ranks) → groupBy(dst).sum``), which this module
implements with one deliberate twist: **all rank mass is exact int64
fixed-point** (parts-per-``total``), so

* partial aggregation is associative — results are bit-identical under
  any partitioning, executor count, or engine (the float PageRank sum
  ``Σ r(u)/deg(u)`` is famously run-to-run unstable at cluster scale);
* the DuckDB oracle replays iterations verbatim with ``//`` integer
  division.

Scale shape: edges are counted+persisted ONCE (the iteration loop must
never re-run the upstream edge derivation — at 100 TB that is the whole
input); each iteration is one shuffle of (dst, contrib) pairs.  Dangling
mass is folded in as a 1-row aggregate cross-joined into the update —
no per-iteration driver action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: total rank mass, in fixed-point "parts" — ranks sum to ≤ this
TOTAL = 10**12


def pagerank_frame(edges: DataFrame, *, src: str = "src",
                   dst: str = "dst", iterations: int = 3,
                   damping_pct: int = 85, total: int = TOTAL,
                   persisted: list | None = None) -> DataFrame:
    """Lazy rank frame ``(node, rank)`` after ``iterations`` rounds.

    Exact-integer update (mirrored by the SQL oracle term for term)::

        retained(u) = (rank(u) * damping_pct) div 100
        contrib(e)  = retained(src(e)) div outdeg(src(e))
        dang_share  = (Σ retained over out-degree-0 nodes) div n
        rank'(v)    = (total * (100-damping_pct)) div 100 div n
                      + dang_share + Σ contrib(e to v)

    Caller owns persistence of ``edges`` (see :func:`pagerank_topk`);
    the returned plan references it ``iterations`` times.
    ``n = |nodes|`` is fetched driver-side once (one count job).

    Cache ownership: with ``persisted`` supplied, every frame this
    function persists is appended to it and the caller unpersists after
    its action.  With ``persisted=None`` (direct calls, e.g. tests) the
    intermediates (nodes / message table / dangling set) are released
    here once the final ranks are materialized; only the returned frame
    stays cached, exposed as ``result.pagerank_cache`` — unpersist it
    when done (mirrors the ``bpe_cache`` convention in text/bpe.py)."""
    from pyspark import StorageLevel

    raw = (edges.select(F.col(src).cast("string").alias("src"),
                        F.col(dst).cast("string").alias("dst"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    outdeg = raw.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # message table (src, dst, outdeg), pre-partitioned by src and
    # persisted: InMemoryRelation keeps the partitioning, so each
    # iteration's join exchanges ONLY the rank table — the edge side
    # (the 100 TB side) never moves again.  The raw edge derivation is
    # scanned exactly once (into `raw`), then released.
    e2 = (raw.join(outdeg, "src").repartition(F.col("src"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    # one scan of the (cached-on-first-use) message table derives nodes
    nodes = (e2.select(F.explode(F.array("src", "dst")).alias("node"))
             .distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    n = nodes.count()
    raw.unpersist()
    if n == 0:
        raise ValueError("pagerank on an empty edge set (0 nodes)")
    dangling = nodes.join(e2.select(F.col("src").alias("node")),
                          "node", "left_anti")
    # static property probed ONCE: a symmetric/strongly-covering graph
    # has no dangling nodes, and the per-iteration dangling aggregate
    # (a semi-join + 1-row agg + broadcast) is pure overhead then
    has_dangling = dangling.limit(1).count() > 0
    if has_dangling:
        dangling = dangling.persist(StorageLevel.MEMORY_AND_DISK)
    if persisted is not None:      # caller unpersists after its action
        persisted.extend([nodes, e2]
                         + ([dangling] if has_dangling else []))
    teleport = (total * (100 - damping_pct)) // 100 // n
    ranks = nodes.withColumn("rank", F.lit(total // n).cast("long"))
    prev = None
    for it in range(iterations):
        retained = ranks.withColumn(
            "ret", F.expr(f"(rank * {damping_pct}) div 100"))
        contrib = (e2.join(retained.select(F.col("node").alias("src"),
                                           "ret"), "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("ret div outdeg").alias("c"))
                   .groupBy("node")
                   .agg(F.sum("c").alias("contrib")))
        ranks = nodes.join(contrib, "node", "left")
        if has_dangling:
            # dangling mass: 1-row aggregate folded in lazily (no
            # action); the dangling node SET is static, probed above
            dang = (retained.join(dangling.select("node"), "node",
                                  "left_semi")
                    .agg(F.coalesce(F.sum("ret"), F.lit(0))
                         .alias("dang")))
            ranks = ranks.crossJoin(F.broadcast(dang))
            dang_share = F.expr(f"dang div {n}")
        else:
            dang_share = F.lit(0)
        ranks = ranks.select(
            "node",
            (F.lit(teleport) + dang_share
             + F.coalesce(F.col("contrib"), F.lit(0)))
            .cast("long").alias("rank"))
        # materialize each iteration (the Pregel loop shape): `retained`
        # feeds BOTH the contrib and dangling branches, so a lazy chain
        # re-executes every earlier iteration once per branch — 2^k
        # recomputation — and unbounded lineage breaks at high k anyway
        ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)
        ranks.count()
        if prev is not None:
            prev.unpersist()
        prev = ranks
    if persisted is not None:
        if prev is not None:
            persisted.append(prev)
    else:
        # direct call: the loop has materialized `ranks`, so the
        # upstream caches are no longer needed — release them here
        # instead of leaking them for the life of the session
        e2.unpersist()
        nodes.unpersist()
        if has_dangling:
            dangling.unpersist()
        ranks.pagerank_cache = prev
    return ranks


def pagerank_topk(edges: DataFrame, *, k: int = 20, src: str = "src",
                  dst: str = "dst", iterations: int = 3,
                  damping_pct: int = 85,
                  total: int = TOTAL) -> DataFrame:
    """Top-``k`` nodes by rank (ties broken by node id — ranks are
    exact integers, so the cut is deterministic).  Persists the edge
    frame for the iteration loop and unpersists before returning a
    small literal frame."""
    spark = edges.sparkSession
    handles: list = []
    try:
        ranks = pagerank_frame(edges, src=src, dst=dst,
                               iterations=iterations,
                               damping_pct=damping_pct, total=total,
                               persisted=handles)
        top = (ranks.orderBy(F.desc("rank"), F.asc("node"))
               .limit(k).collect())
    finally:
        for h in handles:
            h.unpersist()
    return spark.createDataFrame(
        [(r["node"], int(r["rank"])) for r in top],
        "node string, rank long")

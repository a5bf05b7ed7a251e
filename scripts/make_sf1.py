"""Materialize an sf1.0 corpus (10x the sf0.1 driver fixtures) under
.localdata/sf1 for the scale evidence runs (scale_smoke --growth and the
sf1 oracle sweep).

Replication keeps referential integrity: every *key column is offset by
replica * 10_000_000 (the same convention scale_smoke uses in memory),
dimension tables (region/nation) stay fixed like TPC-H SF scaling, and
documents get BOTH exact-copy and near-dup pressure (odd replicas append
a unique token, mirroring scale_smoke.replicate_docs) so the dedup
family sees realistic duplicate structure at 10x.  Embeddings shift by
replica * 0.001 per element (distinct but near vectors).

DuckDB does the generation — the output parquet uses plain µs
timestamps, which both engines read directly.  Deterministic: pure SQL
over the fixtures, no randomness.

Usage: python scripts/make_sf1.py [n_replicas] [out_dir] [tables...]

With explicit ``tables`` only those are materialized — e.g.
``python scripts/make_sf1.py 100 .localdata/sf10 documents`` builds the
sf10 documents corpus for the pair-heavy dedup growth runs without
paying for a 60M-row lineitem nobody reads.
"""

from __future__ import annotations

import os
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OFF = 10_000_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        HERE, ".localdata", "sf1")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT r FROM range({n}) t(r)")

    fixed = ("region", "nation")
    scaled = {
        "customer": "c_custkey + r*{o} AS c_custkey, c_name, c_nationkey, "
                    "c_acctbal, c_mktsegment",
        "supplier": "s_suppkey + r*{o} AS s_suppkey, s_name, s_nationkey, "
                    "s_acctbal",
        "part": "p_partkey + r*{o} AS p_partkey, p_name, p_brand, p_type, "
                "p_size, p_retailprice",
        "orders": "o_orderkey + r*{o} AS o_orderkey, "
                  "o_custkey + r*{o} AS o_custkey, o_orderstatus, "
                  "o_totalprice, o_orderdate, o_orderpriority",
        "lineitem": "l_orderkey + r*{o} AS l_orderkey, "
                    "l_partkey + r*{o} AS l_partkey, "
                    "l_suppkey + r*{o} AS l_suppkey, l_linenumber, "
                    "l_quantity, l_extendedprice, l_discount, l_tax, "
                    "l_returnflag, l_linestatus, l_shipdate",
        "events": "event_id + r*{o} AS event_id, ts, "
                  "user_id + r*{o} AS user_id, event_type, value, props",
        # Near-dup structure is GROUP-BOUNDED: replicas come in groups
        # of 10 (g = r // 10); within a group the original duplicate
        # pressure applies (even r: exact copy, odd r: one appended
        # token), while each group g > 0 rewrites ~3/4 of the words
        # (hash-selected, deterministic) so cross-group Jaccard drops
        # below any dedup threshold (word-level ~0.14, 3-gram shingle
        # ~0.005).  Without this, every replica of a document
        # is a mutual near-dup and the TRUE pair count grows
        # quadratically in the replica count — a 100-replica sf10 then
        # measures output blow-up, not algorithm scaling.  A realistic
        # 10x corpus has 10x more dup GROUPS of the same size.  g = 0
        # leaves text untouched, so sf1 (n=10) is byte-identical to the
        # pre-group construction and its committed artifacts.
        "documents": (
            "doc_id + r*{o} AS doc_id, "
            "CASE WHEN r % 2 = 1 THEN mut || ' u' || CAST(r AS VARCHAR) "
            "ELSE mut END AS text, lang, source, "
            "CASE WHEN r % 2 = 1 THEN length(mut || ' u' || "
            "CAST(r AS VARCHAR)) ELSE length(mut) END AS n_chars"),
        "embeddings": "vec_id + r*{o} AS vec_id, "
                      "CAST(list_transform(CAST(embedding AS DOUBLE[]), "
                      "x -> x + r * 0.001) AS FLOAT[]) AS embedding, label",
    }
    only = set(sys.argv[3:])
    if only:
        fixed = tuple(t for t in fixed if t in only)
        scaled = {t: s for t, s in scaled.items() if t in only}
    for t in fixed:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied", flush=True)
    for t, sel in scaled.items():
        src = f"'{SRC}/{t}.parquet', reps"
        if t == "documents":
            # mut: group-g word rewrite (see the documents comment above)
            src = (f"(SELECT d.*, r, CASE WHEN r // 10 = 0 THEN text "
                   f"ELSE array_to_string(list_transform("
                   f"string_split(text, ' '), w -> CASE WHEN "
                   f"hash(w || 'g' || CAST(r // 10 AS VARCHAR)) % 4 != 3 "
                   f"THEN w || '_g' || CAST(r // 10 AS VARCHAR) "
                   f"ELSE w END), ' ') END AS mut "
                   f"FROM '{SRC}/documents.parquet' d, reps)")
        con.execute(
            f"COPY (SELECT {sel.format(o=OFF)} "
            f"FROM {src} ORDER BY 1) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        c = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {c} rows", flush=True)


if __name__ == "__main__":
    main()

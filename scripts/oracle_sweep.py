"""Local mirror of the driver's t2 correctness gate: run every queries()
entry against its DuckDB oracle at sf0.01, write correctness_local.json.

Usage: python scripts/oracle_sweep.py [sf_dir [query ...]]
Optional query names restrict the sweep (the sf1 scale sweep runs the
heavy family only); non-sf0.01 dirs write
correctness_local_<dirname>.json so the default artifact is untouched."""
import importlib.util
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))

import duckdb

spec = importlib.util.spec_from_file_location(
    "e", os.path.join(HERE, "__spark_entry__.py"))
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
from conftest import assert_matches_oracle  # noqa: E402

from orange3_spark.session import get_spark  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# conftest (imported above for assert_matches_oracle) pins the replay-
# oracle dir to ITS test default — repoint at the dir this sweep runs
os.environ["SPARK_GRAFT_SF_DIR"] = sf
spark = get_spark("oracle-sweep")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
# the sweep process hosts BOTH the Spark JVM (32g heap) and DuckDB;
# DuckDB's default memory_limit (80% of RAM) ignores the JVM and
# bad_allocs on the big sf1 oracles — cap it and give it a spill dir
con.execute("SET memory_limit='48GB'")
con.execute(f"SET temp_directory='{tempfile.mkdtemp(prefix='ddb_spill_')}'")
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

qs, osql = m.queries(), m.oracle_sql()


def _materialize_ctes(sql: str) -> str:
    """DuckDB INLINES non-recursive CTEs, re-executing a chain once per
    reference — the deep replay oracles (lloyd/PQ chains) then blow past
    any memory limit at sf1.  Force `AS MATERIALIZED` on plain CTEs
    (identical semantics); recursive CTEs (written with a column list,
    `walk (id, lbl) AS (`) are left untouched."""
    import re
    return re.sub(r"(\bWITH\s+|,\s*\n?)(\w+)(\s+)AS\s*\(",
                  r"\1\2\3AS MATERIALIZED (", sql)


osql = {k: _materialize_ctes(v) for k, v in osql.items()}
if len(sys.argv) > 2:
    subset = sys.argv[2:]
    missing = [q for q in subset if q not in qs]
    if missing:
        sys.exit(f"unknown queries: {missing}")
    qs = {q: qs[q] for q in subset}
out = {}
n_ok = 0
for name, fn in qs.items():
    t0 = time.perf_counter()
    try:
        if name in osql:
            assert_matches_oracle(fn(spark, sf), con, osql[name])
            out[name] = {"ok": True, "mode": "oracle"}
        else:
            n = fn(spark, sf).count()
            out[name] = {"ok": n >= 0, "mode": "rows_only", "rows": n}
        n_ok += 1
        print(f"OK   {name} ({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as ex:
        out[name] = {"ok": False, "err": str(ex)[:300]}
        print(f"FAIL {name}: {str(ex)[:200]}", flush=True)
    spark.catalog.clearCache()

base = os.path.basename(os.path.normpath(sf))
name = ("correctness_local.json" if base == "sf0.01"
        else f"correctness_local_{base}.json")
path = os.path.join(HERE, name)
if len(sys.argv) > 2 and os.path.exists(path):
    # subset run: MERGE into the existing artifact instead of clobbering
    # the full sweep's results with a 2-query file
    try:
        with open(path) as fh:
            prev = json.load(fh).get("results", {})
    except Exception:
        prev = {}
    prev.update(out)
    out = prev
    n_ok = sum(1 for r in out.values() if r.get("ok"))
with open(path, "w") as fh:
    json.dump({"sf_dir": sf, "n": len(out), "n_ok": n_ok,
               "results": out}, fh, indent=1)
print(f"\n{n_ok}/{len(out)} green")

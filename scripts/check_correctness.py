"""Driver-mimic correctness harness.

Runs each registered query through a VANILLA SparkSession (no engine confs —
exactly what the per-round driver does) and its oracle SQL through DuckDB,
then compares canonicalized results (sorted columns, 9-sig-digit floats,
tz-stripped timestamps, sorted rows).

Usage:
    python scripts/check_correctness.py                 # all queries
    python scripts/check_correctness.py q_a q_b         # subset
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01            # data (default sf0.01)
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon_rows(rows, colnames):
    import datetime
    import math

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if v == 0:
                return 0.0
            return float(f"{v:.9g}")
        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None).isoformat()
        if isinstance(v, datetime.date):
            return v.isoformat()
        if isinstance(v, list):
            return tuple(canon(x) for x in v)
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        return v

    return sorted((tuple(canon(r[i]) for i in order) for r in rows), key=repr)


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    names = sys.argv[1:]
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if names:
        queries = {k: v for k, v in queries.items() if k in names}

    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
             .appName("check-correctness")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    report = {}
    n_pass = n_fail = 0
    for name, fn in queries.items():
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            df = fn(spark, SF_DIR)
            got_cols = df.columns
            got = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(got)
            sql = oracles.get(name)
            if sql is None:
                rec["err"] = "no_oracle"
            else:
                res = con.execute(sql)
                want_cols = [d[0] for d in res.description]
                want = res.fetchall()
                rec["oracle_rows"] = len(want)
                rec["rows_match"] = len(got) == len(want)
                rec["schema_match"] = sorted(got_cols) == sorted(want_cols)
                g = canon_rows(got, got_cols)
                w = canon_rows(want, want_cols)
                rec["hash_match"] = g == w
                if not rec["hash_match"] and rec["rows_match"] \
                        and rec["schema_match"]:
                    diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
                    rec["sample_diff"] = [
                        {"spark": repr(a), "oracle": repr(b)} for a, b in diffs]
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
        # engine operators cache internally; without cleanup a full-surface
        # sweep accumulates storage blocks until the (vanilla-sized) heap
        # OOMs — same isolation bench.py applies, outside any timing
        spark.catalog.clearCache()
        ok = rec["hash_match"] is True
        n_pass += ok
        n_fail += not ok
        report[name] = rec
        status = "PASS" if ok else ("ERR " if rec["err"] else "FAIL")
        print(f"{status} {name} spark={rec['spark_rows']} "
              f"oracle={rec['oracle_rows']}", flush=True)
        if rec["err"] and rec["err"] != "no_oracle":
            print("  " + rec["err"].strip().splitlines()[-1], flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "correctness_check.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"\n{n_pass} pass / {n_fail} fail of {len(queries)}")
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

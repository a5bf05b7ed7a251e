"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Timing methodology (round 4; three passes + variance band since round
8): every query runs THREE times and the reported figure is the MINIMUM
of the passes, with the per-query median sum and the inter-pass band
recorded alongside so host drift is distinguishable from plan changes
(see the comment at the ``timings`` computation).  Round-3 forensics showed the
first execution of a query carries one-off costs that are properties of
the session, not the plan — janino whole-stage-codegen compilation,
Arrow/pandas-UDF runner spin-up, and ContextCleaner/GC stalls inherited
from whichever query ran before — and those spikes MOVE between runs
(q_leakage_safe_split: 24.4 s cold / 3.2 s steady in the same session;
q_ml_metrics was 11.2 s in the r3 driver run and 2.3 s in the next).
Single-cold-run totals therefore measure scheduling noise, not engine
throughput.  The cold pass is still recorded (``cold_value`` /
``cold_queries`` in bench_result.json) so regressions in first-run
latency stay visible.  Between queries the caches are cleared and the JVM
is nudged to collect OUTSIDE the timed window, so storage-block cleanup
never lands inside another query's measurement."""

from __future__ import annotations

import gc
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from orange3_spark.session import get_spark


def host_canary(spark) -> float:
    """Fixed synthetic CPU+shuffle microbench — ZERO data dependence —
    run once per pass and recorded in the artifact (r9 verdict task #5:
    a 1.2-1.3x uniform drift between the builder's idle-host run and
    the driver's rerun of the SAME commit burned a round of forensics).

    The work is pinned: 2M generated rows, an md5 per row (CPU), one
    hash-partitioned aggregation over 1000 keys (shuffle), 32 input
    slices.  Identical plan every session, so the ratio
    ``canary_min(session A) / canary_min(session B)`` measures host
    state, not engine changes.  Normalization rule (PERF_NOTES): a
    per-query delta within ~±15% of the canary ratio is host drift;
    adjudicate only deltas that exceed it."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (spark.range(0, 2_000_000, 1, 32)
          .select((F.col("id") % 1000).alias("k"),
                  F.md5(F.col("id").cast("string")).alias("h"))
          .groupBy("k")
          .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("mh"))
          .where(F.col("n") > 0)
          .count())
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("orange3-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        # subset smoke for iterating on the harness itself; the driver
        # never sets this, so per-round artifacts stay full-fleet
        names = [q.strip() for q in only.split(",") if q.strip()]
        qs = {k: qs[k] for k in names if k in qs}
    # warm-up: JVM, codegen, parquet footer reads
    first = next(iter(qs))
    qs[first](spark, sf_dir).count()

    def isolate():
        # Operators cache/localCheckpoint internally and can't unpersist
        # while their result is still lazy; without cleanup a 150-query
        # session accumulates storage blocks and ContextCleaner stalls land
        # on whichever query runs next (measured 4-5x one-off spikes).
        # The JVM System.gc nudge drains them outside the timed section.
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    def run_pass() -> dict[str, float]:
        t: dict[str, float] = {}
        for name, fn in qs.items():
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).count()
            except Exception:
                # driver-facing default: fail loudly (a broken query must
                # break the bench).  SPARK_GRAFT_BENCH_TOLERANT=1 is for
                # off-SF runs (e.g. the sf1 scale bench), where a
                # data-scale guard legitimately firing on one query
                # (relieff's fixed n_samples under-samples a rare class
                # at 10x) shouldn't void the other 230 measurements.
                if not os.environ.get("SPARK_GRAFT_BENCH_TOLERANT"):
                    raise
                errors.append(name)
                isolate()
                continue
            t[name] = round(time.perf_counter() - t0, 4)
            isolate()
        return t

    errors: list = []
    # THREE full passes (round 8; was two): the r7 post-mortem measured a
    # 13-24 % same-code host drift between sessions, so a 2-pass min can
    # neither resolve nor rule out a <1.3x plan regression.  Min-of-3 plus
    # a recorded per-run variance band makes the artifact self-describing:
    # a delta inside the band is host noise, outside it is a plan change.
    # SPARK_GRAFT_BENCH_WARMUP_PASS=1 (off-SF scale runs, e.g. sf1) runs
    # ONE extra untimed pass first so the recorded passes are
    # steady-state (r9: sf1 pass_totals were still decaying at pass 3).
    canaries = [host_canary(spark)]
    if os.environ.get("SPARK_GRAFT_BENCH_WARMUP_PASS"):
        run_pass()
        isolate()
    cold = run_pass()
    canaries.append(host_canary(spark))
    passes = [cold, run_pass(), run_pass()]
    canaries.append(host_canary(spark))
    common = [q for q in passes[0] if all(q in p for p in passes)]
    # min across passes: one-off session stalls (full-GC inheritance,
    # cleaner pauses) land on random queries in ANY pass; the minimum is
    # the reproducible per-query cost.  The median and band expose how
    # noisy this session was.
    timings = {q: min(p[q] for p in passes) for q in common}
    medians = {q: sorted(p[q] for p in passes)[1] for q in common}
    total = round(sum(timings.values()), 4)
    median_total = round(sum(medians.values()), 4)
    pass_totals = [round(sum(p[q] for q in common), 4) for p in passes]
    band = round((max(pass_totals) - min(pass_totals))
                 / max(min(pass_totals), 1e-9), 4)

    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "median_value": median_total,
        "pass_totals": pass_totals,
        "variance_band": band,
        "cold_value": round(sum(cold.values()), 4),
        "cold_queries": cold,
        # host-drift canary: fixed synthetic CPU+shuffle microbench, one
        # run before the passes and one after each; compare canary_min
        # across artifacts to normalize same-code drift (PERF_NOTES)
        "canary_secs": canaries,
        "canary_min": min(canaries),
        "sf": sf,
    }
    if errors:
        result["errors"] = sorted(set(errors))
    # Full per-query record to a file: the driver keeps only a ~2 KB stdout
    # tail, which truncated the 115-query line in rounds 1-2 (BENCH_r0*.json
    # "parsed": null).  stdout gets the full line for humans, then a LAST
    # line compact enough to survive the tail window and parse.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_result.json")
    payload = json.dumps(result)
    with open(out_path, "w") as fh:
        fh.write(payload)
    print(payload)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:15])
    # Contract: entries may be ADDED to the compact line's `queries` but
    # never removed — the r10 optimizations pushed several r9 headline
    # queries out of the top 15, so carry every name the r9 artifact's
    # compact line reported (with its CURRENT timing) alongside the
    # current top 15.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_r09.json")) as fh:
            prev = json.load(fh).get("parsed", {}).get("queries", {}) or {}
        for q in prev:
            if q in timings:
                slowest.setdefault(q, timings[q])
    except Exception:
        pass
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "median_value": median_total,
        "variance_band": band,
        "canary_min": min(canaries),
        "queries": slowest,
        "queries_file": "bench_result.json",
        # sha256 of the bench_result.json BYTES this run wrote: the
        # driver-parsed compact line can be checked byte-for-byte against
        # the committed artifact (r8 verdict task #9)
        "queries_sha256": hashlib.sha256(payload.encode()).hexdigest(),
    }))


if __name__ == "__main__":
    main()

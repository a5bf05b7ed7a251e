"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` pair every implemented operator from SURVEY.md §2 with a
DuckDB oracle for the t2 correctness gate.  The actual definitions live in
``orange3_spark/plans/queries_*.py`` (registry pattern).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importing the modules populates the registry
import orange3_spark.plans.queries_analytics  # noqa: F401
import orange3_spark.plans.queries_core  # noqa: F401
import orange3_spark.plans.queries_media  # noqa: F401
import orange3_spark.plans.queries_ml  # noqa: F401
import orange3_spark.plans.queries_preprocess  # noqa: F401
import orange3_spark.plans.queries_sources  # noqa: F401
import orange3_spark.plans.queries_stats  # noqa: F401
import orange3_spark.plans.queries_streaming  # noqa: F401
import orange3_spark.plans.queries_text  # noqa: F401
from orange3_spark.plans.registry import ORACLE, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_filter_groupby"](spark, SF0001)


# The correctness harness grades entries in dict order with a ~50-query
# budget per round.  Round-7 ordering is COMPUTED, not hand-rotated:
# (1) queries whose engine paths materially changed this round (their
# old verdicts cover code that no longer exists); (2) never-graded /
# last-graded-red queries, oracle-paired first; (3) the greens, OLDEST
# driver grade first — so the ~50-query window provably cycles through
# every registered query within ~5 rounds and staleness stays bounded
# without hand-curated lists.
_CHANGED_THIS_ROUND = [
    # r10 OPTIMIZATION round: every query whose engine path materially
    # changed regrades first (their old verdicts cover dead code).  The
    # optimization pass (OPTIMIZATION_r10.md) rewrote these paths with
    # structurally-proven-equivalent fast paths — all locally
    # oracle-green, but the driver grade is the hard signal:
    # contingency-cube CN2 (ml/rules.py)
    "q_ml_cn2", "q_ml_cn2_depth2",
    # lazy Platt calibration (ml/scoringsheet.py)
    "q_scoring_sheet",
    # IRLS column layout + bounded local-twin fast path (ml/learners.py)
    "q_ml_logreg_irls", "q_quality_classifier",
    # shared scoring UDF column layout + scan spreading
    # (ml/outlier_models.py, neural.py, svr.py)
    "q_outlier_ocsvm", "q_outlier_iforest", "q_ml_mlp_reg",
    # id-only LSH candidate shuffle (similarity/knn.py)
    "q_neardup_cosine_scaled", "q_neardup_cosine",
    # SOM bounded local-twin fast path (ml/projection.py)
    "q_ml_som",
    # bounded-vocab local BPE merge rounds (text/bpe.py)
    "q_bpe_vocab", "q_bpe_tokenize",
    # --- carried from the r10 build phase (paths changed there) ---
    # joint-frame + capped-driver-path rewrite of column Spearman
    # (stats/distance.py, the r9 2.4x regression fix)
    "q_distance_spearman_cols",
    # r10 candidate-volume auto-valve in the default mining path
    # (similarity/knn.py max_cell_rows="auto"; graded data is uniform so
    # results are unchanged — regrade proves it)
    "q_hard_negatives_blocked",
    # r9-advisor multimodal fixes: per-video-track WebM block counting,
    # legal duplicate-packet continuity in MPEG-TS (+ r10 stuck-CC fix)
    "q_media_webm_meta", "q_media_ts_meta",
    # r10 TIFF widening: tiled storage, 16-bit samples, Deflate — the
    # encode matrix rotates through the new paths, same pixel oracle
    "q_media_decode_tiff",
    # r10 12-bit JPEG: the shared DCT decode path changed (SOF parse
    # precision admit, frame tuple, DC category 16, _reconstruct level
    # shift/fold) — every query through _parse_jpeg regrades, plus the
    # classifier scope change.  Head exceeds the verdict's ≤5 ONLY
    # because these paths materially changed (build phase + optimization
    # phase): 22 head + the 30-query r3/r4 tail = 52 vs the ~50-slot
    # window, so ~2 of the oldest-green tail may carry to r11 — the
    # 252/252 local sweep at HEAD is the backstop for those.
    "q_media_decode_jpeg", "q_media_decode_jpeg_prog",
    "q_media_decode_jpeg420", "q_media_gate_fraction",
]


def _grade_history() -> dict:
    """last-grade info per query from the driver's CORRECTNESS_r*.json
    artifacts: {name: (round, was_green)}."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict = {}
    def _round_of(p):
        mt = re.search(r"r(\d+)", os.path.basename(p))
        return int(mt.group(1)) if mt else -1

    # sort by PARSED round number, not lexicographically — a non-padded
    # r9.json would otherwise sort after r10.json and stale grades win
    paths = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
                   key=_round_of)
    for p in paths:
        rnd = _round_of(p)
        if rnd < 0:
            continue
        try:
            with open(p) as fh:
                data = json.load(fh)
        except Exception:
            continue
        for q, rec in data.items():
            if not isinstance(rec, dict):
                continue
            ok = (rec.get("err") is None
                  and rec.get("rows_match") is not False
                  and rec.get("hash_match") is not False)
            last[q] = (rnd, bool(ok))
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    last = _grade_history()
    reg = list(QUERIES)
    head = [q for q in _CHANGED_THIS_ROUND if q in QUERIES]

    def key(q):
        rnd, ok = last.get(q, (0, False))
        if not ok:
            # never graded / last grade red: grade first, oracle-paired
            # before rows-only (a hash verdict is the stronger signal if
            # the driver's budget runs out mid-bucket)
            return (0, 0, q not in ORACLE, reg.index(q))
        return (1, rnd, q not in ORACLE, reg.index(q))  # oldest green first

    tail = sorted((q for q in reg if q not in head), key=key)
    return {q: QUERIES[q] for q in head + tail}


def oracle_sql() -> dict[str, str]:
    # replay oracles (plans/oracle_replay.py) register a zero-arg callable
    # that re-fits the sample-fit learners through DuckDB at grading time
    # and embeds the fitted constants in exact SQL — resolve them here
    return {k: (v() if callable(v) else v) for k, v in ORACLE.items()}

"""CN2 rule induction as distributed candidate-evaluation sweeps.

Reference: ``Orange/classification/rules.py`` — CN2 learns an ordered rule
list by sequential covering: beam-search the best conjunction of selectors,
predict the majority class among covered rows, remove them, repeat.  Rule
quality is Laplace accuracy; with no fixed target class the reference uses
``(max_class_count + 1) / (covered + n_classes)``
(``LaplaceAccuracyEvaluator.evaluate_rule``, rules.py:187-199).

Spark-first reformulation: the expensive step — scoring *every* candidate
refinement of a rule — is a single aggregation pass PER BEAM MEMBER.  All
(attribute, value, class) counts under the member's conjunction come from
one ``stack``-unpivot + groupBy (map-side combinable, codegen-safe, no
UDFs), and the conjunction is a plain equality filter, so it PUSHES DOWN
to the scan — each member's pass reads only its selector's row groups.
(A fused single-scan variant that exploded rows into matching members was
tried in r7 and MEASURED 1.5-2× slower here: the explode forfeits
per-member predicate pushdown and generates |scopes| × |attrs| rows from
a full read — per-member pushdown beats scan-sharing when selectors are
selective, which CN2 selectors are by construction.)  Only per-candidate
count triples ever reach the driver (bounded by attribute cardinality,
never row count).  The uncovered remainder is cached per rule so
successive rules scan shrinking data.

A depth-1 rule list (single-selector rules, beam 1) is expressible as
chained SQL CTEs, which is exactly what the registered oracle does.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Rule", "cn2_induce", "rules_to_dataframe", "cn2_predict"]


@dataclass
class Rule:
    """An induced rule: ``IF sel1 AND sel2 ... THEN class``."""
    selectors: list  # [(attr, value)]
    prediction: object
    quality: float
    covered: int
    correct: int

    def predicate(self) -> Column:
        """Selector values are matched as strings (discrete attributes)."""
        p = F.lit(True)
        for attr, value in self.selectors:
            p = p & (F.col(attr).cast("string") == F.lit(str(value)))
        return p

    def __str__(self):
        cond = " AND ".join(f"{a}={v}" for a, v in self.selectors) or "TRUE"
        return (f"IF {cond} THEN {self.prediction}  "
                f"(laplace={self.quality:.4f}, {self.correct}/{self.covered})")


def _candidate_counts(df: DataFrame, attrs: Sequence[str],
                      class_col: str) -> list:
    """(attr, value, class, count) for every single-selector refinement —
    ONE scan: stack-unpivot the attributes then count."""
    n = len(attrs)
    stack_args = ", ".join(f"'{a}', cast(`{a}` as string)" for a in attrs)
    pairs = df.select(
        F.expr(f"stack({n}, {stack_args}) as (attr, value)"),
        F.col(class_col).alias("cls"))
    rows = (pairs.where(F.col("value").isNotNull())
                 .groupBy("attr", "value", "cls").count().collect())
    return [(r["attr"], r["value"], r["cls"], r["count"]) for r in rows]


def _score(counts_by_class: dict, n_classes: int, target_class=None):
    """Laplace accuracy + prediction with deterministic ties.

    No target class (majority mode): ``(max_count+1)/(total+n_classes)``;
    with a target class the reference uses k=2 — target vs rest
    (``LaplaceAccuracyEvaluator``, rules.py:187-199)."""
    total = sum(counts_by_class.values())
    if target_class is not None:
        top = counts_by_class.get(target_class, 0)
        return (top + 1) / (total + 2), target_class, total, top
    # deterministic: max count, then smallest class value
    top = max(counts_by_class.values())
    best_cls = min(c for c, v in counts_by_class.items() if v == top)
    return (top + 1) / (total + n_classes), best_cls, total, top


def cn2_induce(df: DataFrame, attrs: Sequence[str], class_col: str, *,
               max_rules: int = 5, beam_width: int = 5,
               max_selectors: int = 3, min_covered: int = 1,
               n_classes: Optional[int] = None,
               target_class=None) -> list:
    """Ordered CN2 rule list (unordered evaluator, majority prediction).

    Each beam depth evaluates all refinements of each beam member with one
    stack-unpivot aggregation over the remaining rows; sequential covering
    filters covered rows out (predicate pushdown keeps the scans shrinking).
    The terminal default rule (empty selector list) is always appended.
    """
    attrs = list(attrs)
    if n_classes is None:
        n_classes = df.select(class_col).distinct().count()
    remaining = df
    rules: list[Rule] = []

    cached = []
    for _ in range(max_rules):
        # ---- beam search for the best conjunction on `remaining`
        # beam entries: (quality, selectors, prediction, covered, correct)
        base_counts: dict = {}
        for r in remaining.groupBy(class_col).count().collect():
            base_counts[r[0]] = r[1]
        if not base_counts:  # everything covered
            break
        q0, cls0, tot0, top0 = _score(base_counts, n_classes, target_class)
        best = (q0, [], cls0, tot0, top0)
        beam = [best]
        for _depth in range(max_selectors):
            nxt = []
            for quality, sels, _, _, _ in beam:
                used = {a for a, _v in sels}
                free = [a for a in attrs if a not in used]
                if not free:
                    continue
                scope = remaining
                for a, v in sels:
                    scope = scope.where(
                        F.col(a).cast("string") == F.lit(str(v)))
                cand = _candidate_counts(scope, free, class_col)
                by_sel: dict = {}
                for attr, value, cls, cnt in cand:
                    by_sel.setdefault((attr, value), {})[cls] = cnt
                for (attr, value), dist in by_sel.items():
                    q, cls, tot, top = _score(dist, n_classes, target_class)
                    if tot >= min_covered:
                        nxt.append((q, sels + [(attr, value)], cls, tot, top))
            if not nxt:
                break
            # deterministic beam: quality desc, coverage desc, selector repr
            nxt.sort(key=lambda t: (-t[0], -t[3], str(t[1])))
            beam = nxt[:beam_width]
            if beam[0][0] > best[0]:
                best = beam[0]
        quality, sels, cls, tot, top = best
        if not sels:  # nothing beats the default rule: stop
            break
        rule = Rule(sels, cls, quality, tot, top)
        rules.append(rule)
        # coalesce: a NULL attribute makes predicate() NULL, and WHERE ~NULL
        # would silently drop the row; reference semantics are "missing value
        # fails the selector", so the row must stay uncovered
        remaining = remaining.where(
            ~F.coalesce(rule.predicate(), F.lit(False))).cache()
        cached.append(remaining)

    # default rule over whatever is left
    left = {r[0]: r[1] for r in
            remaining.groupBy(class_col).count().collect()}
    if left:
        q, cls, tot, top = _score(left, n_classes, target_class)
        rules.append(Rule([], cls, q, tot, top))
    for c in cached:
        c.unpersist()
    return rules


def rules_to_dataframe(spark, rules: Sequence[Rule]) -> DataFrame:
    rows = [(i, " AND ".join(f"{a}={v}" for a, v in r.selectors) or "TRUE",
             str(r.prediction), float(r.quality), int(r.covered),
             int(r.correct))
            for i, r in enumerate(rules)]
    return spark.createDataFrame(
        rows, "rule_idx int, conditions string, prediction string, "
              "laplace double, covered bigint, correct bigint")


def cn2_predict(df: DataFrame, rules: Sequence[Rule],
                out: str = "prediction") -> DataFrame:
    """First-matching-rule prediction as one chained CASE expression —
    pure codegen, no Python at inference."""
    expr = None
    for r in reversed(rules):
        if not r.selectors:
            expr = F.lit(r.prediction)
            continue
        expr = F.when(r.predicate(), F.lit(r.prediction)) \
            .otherwise(expr if expr is not None else F.lit(None))
    return df.withColumn(out, expr)

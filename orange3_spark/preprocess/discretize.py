"""Discretization — continuous → binned discrete.

Reference: ``Orange/preprocess/discretize.py`` (961 LoC): ``EqualFreq``
(quantiles, ``:181``), ``EqualWidth`` (``:211``), ``FixedWidth`` (``:251``),
``Binning`` (nice decimal bins, ``decimal_binnings`` ``:433``), ``EntropyMDL``
(supervised MDL recursion ``:695-900``); SQL pushdown uses ``width_bucket`` /
``quantile()`` (``BinSql`` ``:149-157``, ``:192-201``).

Spark shape: thresholds from ONE aggregate pass (``percentile`` exact or
``approxQuantile`` at scale — the reference itself switches to sampled
quantiles beyond 100k rows, ``sql/table.py:20-22``), then binning is a pure
row-local expression (no Bucketizer ML stage needed — a CASE/width expression
keeps it inside whole-stage codegen).  EntropyMDL: aggregate a contingency
once, recurse on the driver over the (tiny) per-threshold counts — the
aggregate-then-driver-recurse plan from SURVEY §7.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize_expr(col: str, thresholds: Sequence[float]) -> Column:
    """Map a value to bin index 0..len(thresholds) by fixed thresholds —
    row-local, codegen-friendly (the ``Discretizer`` kernel,
    ``discretize.py:25-147``).  NULL stays NULL."""
    c = F.col(col)
    expr = F.lit(len(thresholds))
    for i in reversed(range(len(thresholds))):
        expr = F.when(c <= F.lit(thresholds[i]), F.lit(i)).otherwise(expr)
    return F.when(c.isNull(), F.lit(None).cast("int")).otherwise(expr.cast("int"))


def bin_labels(thresholds: Sequence[float], fmt: str = "%g") -> list[str]:
    """Orange-style interval labels: ``< a``, ``a - b``, ``≥ b``."""
    pts = [fmt % t for t in thresholds]
    if not pts:
        return ["single_value"]
    labels = [f"< {pts[0]}"]
    labels += [f"{a} - {b}" for a, b in zip(pts, pts[1:])]
    labels.append(f"≥ {pts[-1]}")
    return labels


def equal_freq_thresholds(df: DataFrame, col: str, n: int,
                          *, approx: bool = False,
                          rel_error: float = 0.001) -> list[float]:
    """n-quantile thresholds (EqualFreq, ``discretize.py:181``).

    ``approx=True`` -> ``approxQuantile`` (Greenwald-Khanna, single pass,
    mergeable — the 100 TB path)."""
    ps = [i / n for i in range(1, n)]
    if approx:
        vals = df.approxQuantile(col, ps, rel_error)
    else:
        row = df.agg(*[F.expr(f"percentile(`{col}`, {p})").alias(f"p{i}")
                       for i, p in enumerate(ps)]).collect()[0]
        vals = [row[f"p{i}"] for i in range(len(ps))]
    # dedupe near-equal thresholds like the reference does
    out: list[float] = []
    for v in vals:
        if v is not None and (not out or v > out[-1]):
            out.append(float(v))
    return out


def equal_width_thresholds(df: DataFrame, col: str, n: int) -> list[float]:
    """EqualWidth (``discretize.py:211``) — one min/max pass."""
    r = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo, hi = float(r["lo"]), float(r["hi"])
    if hi == lo:
        return []
    w = (hi - lo) / n
    return [lo + i * w for i in range(1, n)]


def fixed_width_thresholds(lo: float, hi: float, width: float) -> list[float]:
    """FixedWidth (``discretize.py:251``) — purely arithmetic."""
    start = math.floor(lo / width) * width
    out = []
    t = start + width
    while t < hi:
        out.append(t)
        t += width
    return out


def discretize(df: DataFrame, col: str, method: str = "equal_freq",
               n: int = 4, *, width: Optional[float] = None,
               approx: bool = False, labels: bool = False,
               out_col: Optional[str] = None) -> DataFrame:
    """Bin ``col``; ``labels=True`` emits Orange-style interval strings,
    else integer bin codes."""
    if method == "equal_freq":
        ts = equal_freq_thresholds(df, col, n, approx=approx)
    elif method == "equal_width":
        ts = equal_width_thresholds(df, col, n)
    elif method == "fixed_width":
        if width is None:
            raise ValueError("fixed_width needs width=")
        r = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        ts = fixed_width_thresholds(float(r["lo"]), float(r["hi"]), width)
    else:
        raise ValueError(method)
    out_col = out_col or f"{col}_bin"
    code = bucketize_expr(col, ts)
    if labels:
        lab = F.array(*[F.lit(s) for s in bin_labels(ts)])
        return df.withColumn(out_col, lab[code])
    return df.withColumn(out_col, code)


# ------------------------------------------------------------- EntropyMDL

def _entropy(counts) -> float:
    tot = sum(counts)
    if tot == 0:
        return 0.0
    return -sum((c / tot) * math.log2(c / tot) for c in counts if c)


def entropy_mdl_first_split(df: DataFrame, col: str, class_col: str):
    """The FIRST Fayyad-Irani step of :func:`entropy_mdl_thresholds` —
    best info-gain boundary over the distinct-value × class contingency and
    the MDL acceptance test.  Returns ``(cut_value, gain, accepted)`` or
    ``None`` when no boundary exists.  This projection is window-SQL
    expressible, giving the supervised-MDL machinery an exact oracle; the
    full recursion (same aggregation, driver recursion) is pytest-verified
    against the reference's behavior."""
    rows = (df.filter(F.col(col).isNotNull() & F.col(class_col).isNotNull())
              .groupBy(col, class_col).count()
              .orderBy(col).collect())
    if not rows:
        return None
    classes = sorted({r[class_col] for r in rows})
    cidx = {c: i for i, c in enumerate(classes)}
    values: list[float] = []
    dist: list[list[int]] = []
    for r in rows:
        v = float(r[col])
        if not values or v != values[-1]:
            values.append(v)
            dist.append([0] * len(classes))
        dist[-1][cidx[r[class_col]]] += r["count"]
    if len(values) < 2:
        return None
    acc = [0] * len(classes)
    pref = []
    for vec in dist:
        acc = [a + b for a, b in zip(acc, vec)]
        pref.append(list(acc))
    total = pref[-1]
    n = sum(total)
    ent_all = _entropy(total)
    best, best_gain = None, -1.0
    best_left = best_right = None
    for i in range(1, len(dist)):
        left = pref[i - 1]
        right = [t - p for t, p in zip(total, pref[i - 1])]
        nl, nr = sum(left), sum(right)
        if nl == 0 or nr == 0:
            continue
        ent = (nl * _entropy(left) + nr * _entropy(right)) / n
        gain = ent_all - ent
        if gain > best_gain:
            best, best_gain = i, gain
            best_left, best_right = left, right
    if best is None:
        return None
    k = sum(1 for c in total if c)
    k1 = sum(1 for c in best_left if c)
    k2 = sum(1 for c in best_right if c)
    delta = (math.log2(3 ** k - 2)
             - (k * ent_all - k1 * _entropy(best_left)
                - k2 * _entropy(best_right)))
    accept = best_gain > (math.log2(n - 1) + delta) / n
    return (values[best - 1] + values[best]) / 2, best_gain, accept


def entropy_mdl_thresholds(df: DataFrame, col: str, class_col: str,
                           *, force: bool = False) -> list[float]:
    """Supervised MDL binning (``discretize.py:695-900``, Fayyad-Irani).

    One distributed contingency aggregate (value × class counts), then the
    recursive MDL split runs on the driver over the aggregated counts — the
    driver never sees rows, only distinct-value × class counts.
    """
    rows = (df.filter(F.col(col).isNotNull() & F.col(class_col).isNotNull())
              .groupBy(col, class_col).count()
              .orderBy(col).collect())
    if not rows:
        return []
    classes = sorted({r[class_col] for r in rows})
    cidx = {c: i for i, c in enumerate(classes)}
    # collapse to per-distinct-value class count vectors, ascending
    values: list[float] = []
    dist: list[list[int]] = []
    for r in rows:
        v = float(r[col])
        if not values or v != values[-1]:
            values.append(v)
            dist.append([0] * len(classes))
        dist[-1][cidx[r[class_col]]] += r["count"]

    def cumsum(vecs):
        out, acc = [], [0] * len(classes)
        for v in vecs:
            acc = [a + b for a, b in zip(acc, v)]
            out.append(list(acc))
        return out

    def split(lo: int, hi: int) -> list[int]:
        """Return cut indices (thresholds between values[i-1], values[i])."""
        if hi - lo < 2:
            return []
        seg = dist[lo:hi]
        pref = cumsum(seg)
        total = pref[-1]
        n = sum(total)
        ent_all = _entropy(total)
        best, best_gain = None, -1.0
        for i in range(1, len(seg)):
            left, right = pref[i - 1], [t - p for t, p in zip(total, pref[i - 1])]
            nl, nr = sum(left), sum(right)
            if nl == 0 or nr == 0:
                continue
            ent = (nl * _entropy(left) + nr * _entropy(right)) / n
            gain = ent_all - ent
            if gain > best_gain:
                best, best_gain = i, gain
                best_left, best_right = left, right
        if best is None:
            return []
        k = sum(1 for c in total if c)
        k1 = sum(1 for c in best_left if c)
        k2 = sum(1 for c in best_right if c)
        delta = (math.log2(3 ** k - 2) -
                 (k * ent_all - k1 * _entropy(best_left) - k2 * _entropy(best_right)))
        accept = best_gain > (math.log2(n - 1) + delta) / n
        if not accept and not force:
            return []
        return split(lo, lo + best) + [lo + best] + split(lo + best, hi)

    cuts = split(0, len(values))
    return [(values[i - 1] + values[i]) / 2 for i in sorted(cuts)]

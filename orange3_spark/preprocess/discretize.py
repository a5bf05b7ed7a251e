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
    ``discretize.py:25-147``).  NULL — and NaN, which Spark orders above
    every threshold and would otherwise land in the top bin — stays NULL
    (missing in, missing out, the reference's numpy semantics)."""
    c = F.col(col).cast("double")
    expr = F.lit(len(thresholds))
    for i in reversed(range(len(thresholds))):
        expr = F.when(c <= F.lit(thresholds[i]), F.lit(i)).otherwise(expr)
    return F.when(c.isNull() | F.isnan(c),
                  F.lit(None).cast("int")).otherwise(expr.cast("int"))


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


# --------------------------------------------------- FixedTimeWidth binning

# unit name -> seconds (fixed-length units binned by epoch division)
_FIXED_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def fixed_time_width(df: DataFrame, col: str, width: int, unit: str,
                     *, out_col: Optional[str] = None,
                     max_intervals: int = 100) -> DataFrame:
    """FixedTimeWidth discretization (``discretize.py:272-301``): bin a
    timestamp column into calendar-aligned intervals of ``width`` units
    (year/month/week/day/hour/minute/second), emitting the bin START as a
    timestamp column — deterministic, joinable, and SQL-expressible.

    Spark shape: every unit reduces to row-local integer arithmetic on
    epoch seconds (fixed-length units) or on year/month fields (calendar
    units), so the whole operator is one codegen'd projection — no shuffle,
    no UDF.  Day/hour/minute/second bins are aligned to the Unix epoch and
    weeks to ISO Mondays (the reference aligns to the data minimum, which
    would make bin identity depend on a global aggregate; epoch alignment
    keeps bins stable under appends — the property a 100 TB ingest wants).
    Raises like the reference when the span exceeds ``max_intervals``.
    """
    from orange3_spark.functions.timeparse import epoch_seconds

    out_col = out_col or f"{col}_bin"
    c = F.col(col)
    if unit in _FIXED_SECONDS or unit == "week":
        # epoch_seconds, not cast: TIMESTAMP_NTZ (how tz-less parquet reads
        # back in Spark 4) can't cast to numeric, and this stays correct in
        # any session timezone.
        ep = epoch_seconds(c)
        if unit == "week":
            # Monday-aligned week index: epoch day 0 is a Thursday (+3)
            days = F.floor(ep / F.lit(86400))
            widx = F.floor((days + 3) / F.lit(7))
            bstart = (F.floor(widx / F.lit(width)) * width * 7 - 3) * 86400
            binc = F.timestamp_seconds(bstart.cast("long"))
        else:
            wsec = width * _FIXED_SECONDS[unit]
            binc = F.timestamp_seconds(
                F.floor(ep / F.lit(wsec)).cast("long") * wsec)
    elif unit == "month":
        midx = (F.year(c) - 1970) * 12 + (F.month(c) - 1)
        b = F.floor(midx / F.lit(width)).cast("int") * width
        # pmod, not %: Spark's % keeps the dividend's sign, so a pre-1970
        # (negative) month index would hand make_date a month <= 0
        binc = F.to_timestamp(F.make_date(
            (F.lit(1970) + F.floor(b / 12)).cast("int"),
            (F.pmod(b, F.lit(12)) + 1).cast("int"), F.lit(1)))
    elif unit == "year":
        yb = (F.floor(F.year(c) / F.lit(width)) * width).cast("int")
        binc = F.to_timestamp(F.make_date(yb, F.lit(1), F.lit(1)))
    else:
        raise ValueError(f"unknown unit {unit!r}")
    if max_intervals is not None:
        r = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        if r.lo is not None:
            spans = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
                     "week": 604800, "month": 2592000, "year": 31536000}
            n = (r.hi.timestamp() - r.lo.timestamp()) / (width * spans[unit])
            if n - 1 >= max_intervals:
                raise ValueError(
                    f"FixedTimeWidth would produce ~{int(n)} > "
                    f"{max_intervals} intervals (discretize.py:266 "
                    "TooManyIntervals)")
    return df.withColumn(out_col, binc)


# ------------------------------------------------------ nice decimal bins

NICE_FACTORS = (0.01, 0.02, 0.025, 0.05, 0.1, 0.2, 0.25, 0.5,
                1, 2, 5, 10, 20)


def nice_decimal_binnings(lo: float, hi: float, n_unique: int,
                          *, min_width: float = 0, min_bins: int = 2,
                          max_bins: int = 50) -> list[list[float]]:
    """All candidate "nice" threshold lists (``decimal_binnings``,
    ``discretize.py:433-521``): widths are decimal factors of the value
    span's power of ten; min is floored and max ceiled to the width.
    Pure driver arithmetic over (lo, hi) — no data access."""
    if hi <= lo:
        return []
    diff = hi - lo
    f10 = 10.0 ** -math.floor(math.log10(diff))
    out: list[list[float]] = []
    max_bins = min(max_bins, n_unique)
    for f in NICE_FACTORS:
        width = f / f10
        if width < min_width:
            continue
        mn_ = math.floor(lo / width) * width
        mx_ = math.ceil(hi / width) * width
        nbins = round((mx_ - mn_) / width)
        if min_bins <= nbins <= max_bins and (
                not out or len(out[-1]) - 1 != nbins):
            # round like the reference to keep edge values in the right bin
            out.append([round(mn_ + width * i, 10) for i in range(nbins + 1)])
    return out


def nice_binning_thresholds(df: DataFrame, col: str, n: int = 4,
                            *, min_unique: int = 5) -> list[float]:
    """Pick the nice binning closest to ``n`` bins (``Binning.__call__``,
    ``discretize.py:332-390``): candidates need ≥3 intervals (≥2 when
    n == 2); ties prefer more bins; few-uniques degrade to one bin per
    distinct value.  One distributed agg (min/max/count distinct), then
    driver arithmetic; returns INTERIOR thresholds for ``bucketize_expr``."""
    r = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi"),
               F.countDistinct(col).alias("nu")).first()
    if r.lo is None or r.nu <= 1:
        return []
    if r.nu <= min_unique:
        uniq = sorted(x[0] for x in df.select(col).distinct().collect()
                      if x[0] is not None)
        # bucketize_expr maps v <= t[i] -> bin i, so the LAST value needs no
        # threshold (uniq[:-1], not uniq[1:] — the latter merges the two
        # smallest values into bin 0)
        return [float(v) for v in uniq[:-1]]   # one bin per distinct value
    cands = nice_decimal_binnings(float(r.lo), float(r.hi), int(r.nu))
    need = 2 + (n != 2)
    ok = [c for c in cands if len(c) - 1 >= need]
    if not ok:
        chosen = cands[-1] if cands else []
    else:
        chosen = min(ok, key=lambda c: (abs(n - (len(c) - 1)), -(len(c) - 1)))
    return chosen[1:-1]   # interior thresholds


def nice_binning(df: DataFrame, col: str, n: int = 4, *,
                 labels: bool = False,
                 out_col: Optional[str] = None) -> DataFrame:
    """Binning with nice decimal thresholds, applied as a row-local
    bucketize expression."""
    ts = nice_binning_thresholds(df, col, n)
    out_col = out_col or f"{col}_bin"
    code = bucketize_expr(col, ts)
    if labels:
        lab = F.array(*[F.lit(s) for s in bin_labels(ts)])
        return df.withColumn(out_col, lab[code])
    return df.withColumn(out_col, code)

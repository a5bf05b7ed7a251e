"""Sampling — Data Sampler widget surface on Spark.

Reference: ``Orange/widgets/data/owdatasampler.py:41-42,216`` (fixed
proportion / fixed size / cross-validation folds / bootstrap, optional
stratification) and the SQL TABLESAMPLE path ``sql/table.py:577-631``.

All seeded (SURVEY §7 deterministic-randomness note).  Everything is a
single scan; ``fixed_size`` without replacement needs a global sort of
random keys only when exactness is required — the approximate fast path
(``exact=False``) over-samples then limits, avoiding the full sort.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_fraction(df: DataFrame, fraction: float, *, seed: int = 42,
                    stratify_by: Optional[str] = None) -> DataFrame:
    """Bernoulli sample; stratified variant keeps the fraction per class
    (``sampleBy``)."""
    if stratify_by is not None:
        keys = [r[0] for r in df.select(stratify_by).distinct().collect()]
        return df.sampleBy(stratify_by, {k: fraction for k in keys}, seed=seed)
    return df.sample(fraction=fraction, seed=seed)


def sample_fixed(df: DataFrame, n: int, *, seed: int = 42,
                 replacement: bool = False, exact: bool = True) -> DataFrame:
    """Fixed-size sample.  With replacement = bootstrap of size n."""
    if replacement:
        # bootstrap: expected size n via sample(withReplacement); exact size
        # would need a limit on top of an over-sample
        total = df.count()
        return df.sample(withReplacement=True, fraction=n / max(total, 1), seed=seed)
    if exact:
        return df.orderBy(F.rand(seed)).limit(n)
    total = df.count()
    frac = min(1.0, 1.5 * n / max(total, 1))
    return df.sample(fraction=frac, seed=seed).limit(n)


def cv_folds(df: DataFrame, k: int, *, seed: int = 42,
             fold_col: str = "fold") -> DataFrame:
    """Assign each row a fold 0..k-1 — a deterministic hash of a random key;
    one pass, no shuffle."""
    return df.withColumn(fold_col, (F.pmod(F.xxhash64(F.rand(seed)), F.lit(k))).cast("int"))


def random_split(df: DataFrame, weights: Sequence[float], *, seed: int = 42):
    return df.randomSplit(list(weights), seed=seed)


def sample_hash(df: DataFrame, key: str, fraction: float, *,
                salt: str = "") -> DataFrame:
    """Deterministic content-hash Bernoulli sample: keep rows whose
    ``md5(key)`` falls below the fraction threshold of the hex keyspace.

    Unlike seeded ``rand()`` this is reproducible across engines, partitions
    and re-runs (the property TABLESAMPLE lacks), making it the right
    primitive for train/test splits of a 100 TB corpus: membership depends
    only on the row's key, so late-arriving replicas of a row land in the
    same split.  Cost: a row-local hash, no shuffle, fully pushed into scan.
    """
    # compare in hex-string space: first 8 hex chars ≈ 32-bit uniform
    threshold = format(int(fraction * 0xFFFFFFFF), "08x")
    h = F.md5(F.concat(F.col(key).cast("string"), F.lit(salt)))
    return df.filter(F.substring(h, 1, 8) < F.lit(threshold))


def sample_hash_stratified(df: DataFrame, key: str, stratify_by: str,
                           fractions: Mapping[str, float], *,
                           salt: str = "") -> DataFrame:
    """Per-stratum deterministic hash sampling (Data Sampler's stratified
    mode, reproducible): each class value gets its own keep-fraction."""
    h = F.substring(F.md5(F.concat(F.col(key).cast("string"), F.lit(salt))), 1, 8)
    pred = None
    for value, frac in fractions.items():
        threshold = format(int(frac * 0xFFFFFFFF), "08x")
        p = (F.col(stratify_by) == F.lit(value)) & (h < F.lit(threshold))
        pred = p if pred is None else pred | p
    return df.filter(pred if pred is not None else F.lit(False))


def shuffle(df: DataFrame, *, seed: int = 42) -> DataFrame:
    """``Table.shuffle`` (``table.py:1618-1629``) — global random permutation.
    A full sort; at scale prefer per-partition local shuffles unless global
    order matters."""
    return df.orderBy(F.rand(seed))

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


def shuffle(df: DataFrame, *, seed: int = 42) -> DataFrame:
    """``Table.shuffle`` (``table.py:1618-1629``) — global random permutation.
    A full sort; at scale prefer per-partition local shuffles unless global
    order matters."""
    return df.orderBy(F.rand(seed))

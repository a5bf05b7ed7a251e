"""Group-by / aggregation — Orange's full aggregation surface on Spark.

Reference: ``Table.groupby`` (``Orange/data/table.py:2409-2425``),
``OrangeTableGroupBy.aggregate`` (``Orange/data/aggregate.py:53-149``) and the
Group-By widget's agg matrix (``Orange/widgets/data/owgroupby.py:57-183``):
``Mean, Median, Q1, Q3, Min, Max, Mode, Std, Var, Sum, Concatenate, Span,
First, Last, Random value, Count defined, Count, Proportion defined``.

Semantics preserved:
  * aggregations ignore missing (pandas semantics) — Spark aggs already skip
    NULLs; NaN in float columns is converted by callers at ingest.
  * empty categorical groups are dropped (``observed=True``) — native to
    ``groupBy``.
  * ``Concatenate`` joins non-missing stringified values with ``" "``
    (``owgroupby.py:57-62``); row order isn't defined on a distributed
    engine, so we sort values for determinism (callers may pass
    ``order_col`` to concatenate in a stable explicit order instead).

All aggregations are single-pass, map-side-combinable built-ins — one shuffle
per groupBy, no Python in the hot path.  ``median``/``q1``/``q3`` use exact
``percentile`` by default (matches the DuckDB oracle); pass
``approx=True`` to switch to ``percentile_approx`` — the right choice at
100 TB where exact percentile's per-group sort state is the bottleneck.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pct(col: str, p: float, approx: bool) -> Column:
    if approx:
        return F.percentile_approx(col, p)
    return F.expr(f"percentile({col}, {p})")


def _concatenate(col: str, order_col: Optional[str]) -> Column:
    vals = F.collect_list(F.col(col).cast("string"))
    if order_col is not None:
        # stable order: collect (order, value) structs, sort by order key
        pairs = F.array_sort(F.collect_list(F.struct(F.col(order_col), F.col(col).cast("string"))))
        vals = F.transform(pairs, lambda s: s[col])
        return F.array_join(vals, " ")
    return F.array_join(F.array_sort(vals), " ")


# name -> factory(col, *, approx, order_col, seed) -> Column
def agg_expr(name: str, col: str, *, approx: bool = False,
             order_col: Optional[str] = None, seed: int = 42) -> Column:
    n = name.lower()
    if n == "mean":
        return F.avg(col)
    if n == "median":
        return _pct(col, 0.5, approx)
    if n == "q1":
        return _pct(col, 0.25, approx)
    if n == "q3":
        return _pct(col, 0.75, approx)
    if n == "min":
        return F.min(col)
    if n == "max":
        return F.max(col)
    if n == "mode":
        return F.mode(col)
    if n == "std":
        return F.stddev_samp(col)
    if n == "var":
        return F.var_samp(col)
    if n == "sum":
        return F.sum(col)
    if n == "concatenate":
        return _concatenate(col, order_col)
    if n == "span":
        return F.max(col) - F.min(col)
    if n == "first":
        return F.first(col, ignorenulls=True)
    if n == "last":
        return F.last(col, ignorenulls=True)
    if n == "random_value":
        # deterministic "random": min over a seeded hash — reproducible across
        # runs and partitionings, unlike F.first on an unordered DataFrame
        return F.min_by(col, F.xxhash64(F.col(col).cast("string"), F.lit(seed)))
    if n == "count_defined":
        return F.count(col)
    if n == "count":
        return F.count(F.lit(1))
    if n == "proportion_defined":
        return F.count(col) / F.count(F.lit(1))
    raise ValueError(f"unknown aggregation {name!r}")


def weighted_agg_expr(name: str, col: str, weight_col: str) -> Column:
    """Instance-weighted aggregates — the reference's ``W`` column is
    first-class in every statistic (``Orange/data/table.py:530-537``,
    weighted distributions in ``statistics/distribution.py``).  All are
    plain ratio-of-sums expressions (map-side combinable, one shuffle):

    - ``mean``   = Σwx / Σw
    - ``var``    = Σwx² / Σw − (Σwx / Σw)²   (population, frequency weights)
    - ``std``    = sqrt(var)
    - ``sum``    = Σwx
    - ``count``  = Σw over defined x
    """
    n = name.lower()
    x = F.col(col).cast("double")
    w = F.when(x.isNotNull() & ~F.isnan(x),
               F.col(weight_col).cast("double"))
    sw = F.sum(w)
    swx = F.sum(w * x)
    swx2 = F.sum(w * x * x)
    if n == "mean":
        return swx / sw
    if n == "var":
        return swx2 / sw - (swx / sw) * (swx / sw)
    if n == "std":
        return F.sqrt(swx2 / sw - (swx / sw) * (swx / sw))
    if n == "sum":
        return swx
    if n == "count":
        return sw
    raise ValueError(f"unknown weighted aggregation {name!r}")


AggSpec = Union[str, tuple[str, str], Column, Callable[[str], Column]]


def aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, Sequence[AggSpec]],
    *,
    approx: bool = False,
    order_col: Optional[str] = None,
) -> DataFrame:
    """``df.groupby(keys).aggregate({col: [aggs]})``.

    ``aggs`` maps source column -> list of agg names (output columns named
    ``{col}_{agg}``), ``(name, alias)`` tuples, ready-made ``Column``s, or
    callables ``col_name -> Column``.

    Group keys lead the output (Orange puts them in metas,
    ``aggregate.py:139-147`` — here they are ordinary leading columns with
    role metadata handled by the caller).
    """
    exprs: list[Column] = []
    for col, specs in aggs.items():
        for spec in specs:
            if isinstance(spec, Column):
                exprs.append(spec)
            elif callable(spec) and not isinstance(spec, str):
                exprs.append(spec(col))
            elif isinstance(spec, tuple):
                name, alias = spec
                exprs.append(agg_expr(name, col, approx=approx,
                                      order_col=order_col).alias(alias))
            else:
                exprs.append(agg_expr(spec, col, approx=approx,
                                      order_col=order_col).alias(f"{col}_{spec}"))
    if not keys:
        return df.agg(*exprs)
    return df.groupBy(*keys).agg(*exprs)


_SALTED_MERGE = {
    "count": F.sum, "sum": F.sum, "min": F.min, "max": F.max,
}


def salted_aggregate(df: DataFrame, keys: Sequence[str],
                     aggs: Mapping[str, Sequence[str]], *,
                     n_salts: int = 32,
                     salt_on: Optional[Sequence[str]] = None) -> DataFrame:
    """Two-phase aggregation for SKEWED group keys.

    A plain ``groupBy(keys)`` hashes every row of a hot key to one reducer;
    AQE's skew handling splits join partitions, not aggregation partitions,
    so at 100 TB a 90 %-English ``groupBy(language)`` stalls on one task.
    Phase 1 groups by ``(keys, salt)`` — ``salt`` is a deterministic hash
    of ``salt_on`` (default: every non-key column) mod ``n_salts`` — so a
    hot key's rows spread over ``n_salts`` reducers; phase 2 merges the
    ``n_salts`` partials per key.  Phase-2 input is ≤ groups×n_salts rows,
    metadata-sized regardless of data volume.

    Supported agg names: ``count, sum, min, max, mean`` — the algebraically
    decomposable set (mean = merged sum / merged count; medians and other
    holistic aggs cannot be salted — use ``approx=True`` percentiles in
    ``aggregate`` instead).  Output columns ``{col}_{agg}``, matching
    ``aggregate``.  Deterministic: the salt is content-hashed, never
    ``rand()``, so retries/AQE replans reproduce the same partials.
    """
    salt_src = list(salt_on) if salt_on else \
        [c for c in df.columns if c not in keys]
    if not salt_src:
        raise ValueError(
            "salted_aggregate needs at least one non-key column to salt on "
            "(a salt derived from the group key cannot spread a hot key)")
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts)))

    partials: dict[str, Column] = {}
    merge_exprs: list[Column] = []
    for col, names in aggs.items():
        for name in names:
            n = name.lower()
            out = f"{col}_{name}"
            x = F.col(col).cast("double") if n in ("sum", "mean") else F.col(col)
            if n == "mean":
                partials.setdefault(f"__s_{col}", F.sum(x).alias(f"__s_{col}"))
                partials.setdefault(f"__c_{col}",
                                    F.count(col).alias(f"__c_{col}"))
                merge_exprs.append(
                    (F.sum(f"__s_{col}") / F.sum(f"__c_{col}")).alias(out))
            elif n == "count":
                partials.setdefault(f"__p_{out}",
                                    F.count(col).alias(f"__p_{out}"))
                merge_exprs.append(F.sum(f"__p_{out}").alias(out))
            elif n in _SALTED_MERGE:
                partials.setdefault(
                    f"__p_{out}",
                    getattr(F, n)(x).alias(f"__p_{out}"))
                merge_exprs.append(_SALTED_MERGE[n](f"__p_{out}").alias(out))
            else:
                raise ValueError(
                    f"{name!r} is not algebraically decomposable; "
                    "salted_aggregate supports count/sum/min/max/mean")
    part = salted.groupBy(*keys, "__salt").agg(*partials.values())
    return part.groupBy(*keys).agg(*merge_exprs)

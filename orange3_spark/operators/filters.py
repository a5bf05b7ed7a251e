"""Row filters — the full Orange filter surface as Column predicates.

Reference: ``Orange/data/filter.py`` (API) and the SQL pushdown forms in
``Orange/data/sql/filter.py:4-139``.  Each class below builds ONE Spark
``Column`` predicate; application is a plain ``df.filter(pred)`` so Catalyst
pushes it into the parquet scan (check ``PushedFilters`` in ``.explain``).

Semantics deliberately preserved from the reference:
  * Missing is NULL (canonical form, SURVEY.md §7 risk register); every
    comparison with NULL is False *except* ``NotEqual``, which matches NULLs
    — the reference emits ``x <> v OR x IS NULL`` (``sql/filter.py:53,87``).
  * ``FilterDiscrete(values=None)`` means "is defined"
    (``filter.py:272-301``).
  * String ops come in case-sensitive and -insensitive variants
    (``filter.py:400-500``).
  * ``Values`` composes sub-filters with AND/OR and supports ``negate``
    (``filter.py:200-244``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_float(df: DataFrame, col: str) -> bool:
    dt = df.schema[col].dataType
    return isinstance(dt, (T.DoubleType, T.FloatType))


def _defined(df: DataFrame, col: str) -> Column:
    """NULL (and NaN for float columns) means missing."""
    c = F.col(col)
    if _is_float(df, col):
        return c.isNotNull() & ~F.isnan(c)
    return c.isNotNull()


class Filter:
    """Base: a filter is a predicate factory; ``__call__`` applies it."""

    negate: bool = False

    def predicate(self, df: DataFrame) -> Column:
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        pred = self.predicate(df)
        if self.negate:
            # Orange's negation flips the boolean mask, so rows where the
            # predicate is NULL (missing operand) are KEPT under negation.
            pred = ~F.coalesce(pred, F.lit(False))
        return df.filter(pred)


@dataclass
class IsDefined(Filter):
    """Keep rows with no missing value in the given (default: all) columns
    (``filter.py:41-83``)."""

    columns: Optional[Sequence[str]] = None
    negate: bool = False

    def predicate(self, df: DataFrame) -> Column:
        cols = list(self.columns) if self.columns else df.columns
        pred = F.lit(True)
        for c in cols:
            pred = pred & _defined(df, c)
        return pred


@dataclass
class HasClass(Filter):
    """Class column(s) defined (``filter.py:86-107``)."""

    class_columns: Sequence[str] = ()
    negate: bool = False

    def predicate(self, df: DataFrame) -> Column:
        pred = F.lit(True)
        for c in self.class_columns:
            pred = pred & _defined(df, c)
        return pred


@dataclass
class Random(Filter):
    """Bernoulli (prob<1) or exact-count random sample (``filter.py:110-140``).

    Seeded for reproducibility (SURVEY.md §7 deterministic-randomness note).
    """

    prob: float = 0.1
    seed: Optional[int] = None
    negate: bool = False

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.prob >= 1:  # exact count
            n = int(self.prob)
            return df.orderBy(F.rand(self.seed)).limit(n)
        frac = 1 - self.prob if self.negate else self.prob
        return df.sample(fraction=frac, seed=self.seed)


@dataclass
class SameValue(Filter):
    """Equality with missing-aware semantics (``filter.py:143-197``)."""

    column: str = ""
    value: object = None
    negate: bool = False

    def predicate(self, df: DataFrame) -> Column:
        import math
        if self.value is None or (isinstance(self.value, float)
                                  and math.isnan(self.value)):
            # NaN is missing: match the undefined rows (Spark's NaN == NaN
            # is TRUE, which would instead select exactly the NaN rows —
            # same result here, but NULLs must match too per filter.py:143)
            return ~_defined(df, self.column)
        return F.col(self.column) == F.lit(self.value)


@dataclass
class FilterDiscrete(Filter):
    """IN-list over a discrete column; ``values=None`` -> is-defined
    (``filter.py:272-301``)."""

    column: str = ""
    values: Optional[Sequence[str]] = None
    negate: bool = False

    def predicate(self, df: DataFrame) -> Column:
        if self.values is None:
            return _defined(df, self.column)
        return F.col(self.column).isin(list(self.values))


class ContinuousOps:
    EQUAL = "=="
    NOT_EQUAL = "!="
    LESS = "<"
    LESS_EQUAL = "<="
    GREATER = ">"
    GREATER_EQUAL = ">="
    BETWEEN = "between"
    OUTSIDE = "outside"
    IS_DEFINED = "isdefined"


@dataclass
class FilterContinuous(Filter):
    """Numeric/time comparisons (``filter.py:304-397``, op enum ``:328``).

    ``NotEqual`` keeps the reference's NULL-matching behavior
    (``sql/filter.py:53``: ``x <> v OR x IS NULL``).
    """

    column: str = ""
    op: str = ContinuousOps.EQUAL
    ref: object = None
    max: object = None
    negate: bool = False

    def predicate(self, df: DataFrame) -> Column:
        c, v = F.col(self.column), F.lit(self.ref)
        op = self.op
        if op == ContinuousOps.NOT_EQUAL:
            return (c != v) | ~_defined(df, self.column)
        if op == ContinuousOps.IS_DEFINED:
            return _defined(df, self.column)
        if op == ContinuousOps.EQUAL:
            cmp = c == v
        elif op == ContinuousOps.LESS:
            cmp = c < v
        elif op == ContinuousOps.LESS_EQUAL:
            cmp = c <= v
        elif op == ContinuousOps.GREATER:
            cmp = c > v
        elif op == ContinuousOps.GREATER_EQUAL:
            cmp = c >= v
        elif op == ContinuousOps.BETWEEN:
            cmp = (c >= v) & (c <= F.lit(self.max))
        elif op == ContinuousOps.OUTSIDE:
            cmp = (c < v) | (c > F.lit(self.max))
        else:
            raise ValueError(f"unknown op {op!r}")
        # Spark orders NaN above every value (NaN >= x is TRUE, NaN == NaN
        # is TRUE); the reference uses numpy semantics where NaN fails every
        # comparison (filter.py:304-397) — mask missing explicitly.
        return cmp & _defined(df, self.column)


class StringOps(ContinuousOps):
    CONTAINS = "contains"
    NOT_CONTAIN = "notcontains"
    STARTS_WITH = "startswith"
    NOT_STARTS_WITH = "notstartswith"
    ENDS_WITH = "endswith"
    NOT_ENDS_WITH = "notendswith"
    NOT_IS_DEFINED = "notisdefined"


@dataclass
class FilterString(Filter):
    """16 string ops incl. case-insensitive variants (``filter.py:400-500``,
    enum ``:428``)."""

    column: str = ""
    op: str = StringOps.EQUAL
    ref: str = ""
    max: Optional[str] = None
    case_sensitive: bool = True
    negate: bool = False

    def predicate(self, df: DataFrame) -> Column:
        c = F.col(self.column)
        ref, mx = self.ref, self.max
        if not self.case_sensitive:
            c = F.lower(c)
            ref = ref.lower() if ref is not None else ref
            mx = mx.lower() if mx is not None else mx
        v = F.lit(ref)
        op = self.op
        if op == StringOps.EQUAL:
            return c == v
        if op == StringOps.NOT_EQUAL:
            return (c != v) | ~_defined(df, self.column)
        if op == StringOps.LESS:
            return c < v
        if op == StringOps.LESS_EQUAL:
            return c <= v
        if op == StringOps.GREATER:
            return c > v
        if op == StringOps.GREATER_EQUAL:
            return c >= v
        if op == StringOps.BETWEEN:
            return (c >= v) & (c <= F.lit(mx))
        if op == StringOps.OUTSIDE:
            return (c < v) | (c > F.lit(mx))
        if op == StringOps.CONTAINS:
            return c.contains(v)
        if op == StringOps.NOT_CONTAIN:
            return ~F.coalesce(c.contains(v), F.lit(False))
        if op == StringOps.STARTS_WITH:
            return c.startswith(ref)
        if op == StringOps.NOT_STARTS_WITH:
            return ~F.coalesce(c.startswith(ref), F.lit(False))
        if op == StringOps.ENDS_WITH:
            return c.endswith(ref)
        if op == StringOps.NOT_ENDS_WITH:
            return ~F.coalesce(c.endswith(ref), F.lit(False))
        if op == StringOps.IS_DEFINED:
            return _defined(df, self.column)
        if op == StringOps.NOT_IS_DEFINED:
            return ~_defined(df, self.column)
        raise ValueError(f"unknown op {op!r}")


@dataclass
class FilterStringList(Filter):
    """IN over strings with optional case-insensitivity
    (``filter.py:503-541``)."""

    column: str = ""
    values: Sequence[str] = ()
    case_sensitive: bool = True
    negate: bool = False

    def predicate(self, df: DataFrame) -> Column:
        c = F.col(self.column)
        vals = list(self.values)
        if not self.case_sensitive:
            c = F.lower(c)
            vals = [v.lower() for v in vals]
        return c.isin(vals)


@dataclass
class FilterRegex(Filter):
    """``re.search`` semantics -> ``rlike`` (unanchored in both)
    (``filter.py:544-554``)."""

    column: str = ""
    pattern: str = ""
    negate: bool = False

    def predicate(self, df: DataFrame) -> Column:
        re.compile(self.pattern)  # fail fast on bad patterns, like re.search
        return F.col(self.column).rlike(self.pattern)


@dataclass
class Values(Filter):
    """Boolean tree over sub-filters, nestable (``filter.py:200-244``)."""

    conditions: Sequence[Filter] = ()
    conjunction: bool = True
    negate: bool = False

    def predicate(self, df: DataFrame) -> Column:
        preds = [c.predicate(df) for c in self.conditions]
        if not preds:
            return F.lit(True)
        out = preds[0]
        for p in preds[1:]:
            out = (out & p) if self.conjunction else (out | p)
        return out

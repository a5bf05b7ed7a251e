"""Schema layer: Orange's Variable/Domain mapped onto StructType + metadata.

Reference semantics (cited against /root/reference):
  * ``Domain`` holds ordered role tuples attributes/class_vars/metas
    (``Orange/data/domain.py:110-538``, role tuples ``:159-166``).
  * ``Variable`` carries name, type, free-form ``attributes`` dict
    (``Orange/data/variable.py:328-556``); discrete variables carry an
    *ordered* ``values`` tuple (``variable.py:671-879``); time variables carry
    ``have_date``/``have_time`` flags (``variable.py:920-1230``).

Spark mapping: one DataFrame column per variable; the role and per-variable
info ride in ``StructField.metadata`` under the ``"orange"`` key.  Spark drops
metadata on computed columns, so every operator that rewrites columns calls
:func:`with_domain` / :func:`copy_metadata` to re-attach it (SURVEY.md §4's
"custom piece (a)" — an API-layer concern, no Catalyst rule needed).

Canonical missing value is SQL NULL (not NaN) — decided once at ingest;
Orange NaN quirks (NaN keys never join, NULL-safe ``!=``) are encoded as
explicit predicates in the operators, not by keeping NaN around.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_KEY = "orange"

ROLE_ATTRIBUTE = "attribute"
ROLE_CLASS = "class"
ROLE_META = "meta"
ROLE_WEIGHT = "weight"

TYPE_CONTINUOUS = "continuous"
TYPE_DISCRETE = "discrete"
TYPE_STRING = "string"
TYPE_TIME = "time"


@dataclass(frozen=True)
class Variable:
    """Column descriptor (reference: ``Orange/data/variable.py:328-556``)."""

    name: str
    var_type: str = TYPE_CONTINUOUS
    role: str = ROLE_ATTRIBUTE
    # Ordered category list for discrete variables (order is semantic:
    # joins/unions between same-named-different-order categoricals must remap,
    # ``variable.py:704-788``).
    values: Optional[tuple[str, ...]] = None
    have_date: bool = True
    have_time: bool = True
    number_of_decimals: Optional[int] = None
    attributes: dict = field(default_factory=dict, compare=False)

    @property
    def is_discrete(self) -> bool:
        return self.var_type == TYPE_DISCRETE

    @property
    def is_continuous(self) -> bool:
        return self.var_type == TYPE_CONTINUOUS

    @property
    def is_string(self) -> bool:
        return self.var_type == TYPE_STRING

    @property
    def is_time(self) -> bool:
        return self.var_type == TYPE_TIME

    @property
    def is_primitive(self) -> bool:
        # variable.py:452-458 — discrete & continuous are "primitive"
        return self.var_type in (TYPE_CONTINUOUS, TYPE_DISCRETE, TYPE_TIME)

    def spark_type(self) -> T.DataType:
        return {
            TYPE_CONTINUOUS: T.DoubleType(),
            TYPE_DISCRETE: T.StringType(),
            TYPE_STRING: T.StringType(),
            TYPE_TIME: T.TimestampType(),
        }[self.var_type]

    def to_metadata(self) -> dict:
        md = {"type": self.var_type, "role": self.role}
        if self.values is not None:
            md["values"] = list(self.values)
        if self.var_type == TYPE_TIME:
            md["have_date"] = self.have_date
            md["have_time"] = self.have_time
        if self.number_of_decimals is not None:
            md["number_of_decimals"] = self.number_of_decimals
        if self.attributes:
            md["attributes"] = dict(self.attributes)
        return md

    @staticmethod
    def from_field(f: T.StructField) -> "Variable":
        md = (f.metadata or {}).get(META_KEY, {})
        var_type = md.get("type") or _infer_type(f.dataType)
        return Variable(
            name=f.name,
            var_type=var_type,
            role=md.get("role", ROLE_ATTRIBUTE),
            values=tuple(md["values"]) if "values" in md else None,
            have_date=md.get("have_date", True),
            have_time=md.get("have_time", True),
            number_of_decimals=md.get("number_of_decimals"),
            attributes=md.get("attributes", {}),
        )


def _infer_type(dt: T.DataType) -> str:
    if isinstance(dt, (T.DoubleType, T.FloatType, T.IntegerType, T.LongType,
                       T.ShortType, T.ByteType, T.DecimalType)):
        return TYPE_CONTINUOUS
    if isinstance(dt, (T.TimestampType, T.DateType)):
        return TYPE_TIME
    return TYPE_STRING


@dataclass(frozen=True)
class Domain:
    """Ordered role tuples, mirroring ``Orange/data/domain.py:110-538``."""

    attributes: tuple[Variable, ...] = ()
    class_vars: tuple[Variable, ...] = ()
    metas: tuple[Variable, ...] = ()

    @property
    def variables(self) -> tuple[Variable, ...]:
        return self.attributes + self.class_vars

    def __iter__(self):
        return iter(self.attributes + self.class_vars + self.metas)

    def __getitem__(self, name: str) -> Variable:
        for v in self:
            if v.name == name:
                return v
        raise KeyError(name)

    def __contains__(self, name: str) -> bool:
        return any(v.name == name for v in self)

    @property
    def names(self) -> tuple[str, ...]:
        return tuple(v.name for v in self)

    @staticmethod
    def from_df(df: DataFrame) -> "Domain":
        """Recover a Domain from DataFrame schema + metadata.

        Columns with no role metadata default to Orange's I/O inference:
        primitives are attributes, strings are metas
        (``Orange/data/io_util.py:153-192``).
        """
        attrs, classes, metas = [], [], []
        for f in df.schema.fields:
            v = Variable.from_field(f)
            explicit = (f.metadata or {}).get(META_KEY, {}).get("role")
            role = explicit or (ROLE_META if v.is_string and not explicit else v.role)
            bucket = {ROLE_ATTRIBUTE: attrs, ROLE_CLASS: classes,
                      ROLE_META: metas, ROLE_WEIGHT: metas}[role]
            bucket.append(v if v.role == role else Variable(
                v.name, v.var_type, role, v.values, v.have_date, v.have_time,
                v.number_of_decimals, v.attributes))
        return Domain(tuple(attrs), tuple(classes), tuple(metas))


def with_domain(df: DataFrame, domain: Domain | Iterable[Variable]) -> DataFrame:
    """Attach per-column Orange metadata to a DataFrame's schema."""
    by_name = {v.name: v for v in (domain if not isinstance(domain, Domain) else list(domain))}
    cols = []
    for f in df.schema.fields:
        v = by_name.get(f.name)
        if v is None:
            cols.append(F.col(f.name))
        else:
            cols.append(F.col(f.name).alias(f.name, metadata={META_KEY: v.to_metadata()}))
    return df.select(*cols)


def copy_metadata(src: DataFrame, dst: DataFrame,
                  rename: Optional[dict[str, str]] = None) -> DataFrame:
    """Re-attach ``src``'s column metadata onto ``dst`` after an op that
    dropped it (Spark computed columns lose metadata)."""
    rename = rename or {}
    src_md = {f.name: (f.metadata or {}).get(META_KEY) for f in src.schema.fields}
    cols = []
    for f in dst.schema.fields:
        origin = rename.get(f.name, f.name)
        md = src_md.get(origin)
        if md:
            cols.append(F.col(f.name).alias(f.name, metadata={META_KEY: md}))
        else:
            cols.append(F.col(f.name))
    return dst.select(*cols)


def get_variable(df: DataFrame, name: str) -> Variable:
    for f in df.schema.fields:
        if f.name == name:
            return Variable.from_field(f)
    raise KeyError(name)


def discrete_mapper(col: Column, source_order: Sequence[str],
                    target_order: Sequence[str]) -> Column:
    """Value-order remap between same-named discrete variables
    (``variable.py:704-788`` ``get_mapper_from``).

    With string-coded categories the *storage* doesn't change — the mapper's
    job in Spark is to null out values absent from the target order.
    """
    tgt = set(target_order)
    missing = [v for v in source_order if v not in tgt]
    if not missing:
        return col
    return F.when(col.isin(list(tgt)), col)  # else NULL == Orange NaN


def transform(df: DataFrame, exprs: dict[str, Column],
              keep: Optional[Sequence[str]] = None) -> DataFrame:
    """The compute_value executor (``Orange/data/table.py:778-873``) mapped to
    its Spark shape: a Domain full of compute_values is a logical plan, and
    ``transform`` is a single ``select`` — Catalyst provides column pruning,
    CSE and pipelining (reference pipelines 5000-row batches by hand,
    ``table.py:380,424-447``; whole-stage codegen replaces that).
    """
    keep_cols = list(keep) if keep is not None else [
        c for c in df.columns if c not in exprs]
    return df.select(*[F.col(c) for c in keep_cols],
                     *[e.alias(n) for n, e in exprs.items()])

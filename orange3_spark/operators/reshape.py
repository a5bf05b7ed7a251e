"""Reshaping: concatenate, unique, melt, pivot, transpose, split, create-class.

References:
  * vertical concat — ``Orange/data/table.py:1339-1415`` + Concatenate widget
    domain merge (``owconcatenate.py:336-400``, source id ``:237``)
  * Unique — ``Orange/widgets/data/owunique.py:30-35,86-100``
  * Melt — ``Orange/widgets/data/owmelt.py:200-296``
  * Pivot — ``Orange/widgets/data/owpivot.py:55-462``
  * Transpose — ``Orange/data/table.py:2231-2373``
  * Split — ``Orange/widgets/data/owsplit.py``
  * Create Class — ``Orange/widgets/data/owcreateclass.py:24-197``
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orange3_spark.operators.groupby import agg_expr


# ---------------------------------------------------------------- concatenate

def concatenate(
    tables: Sequence[DataFrame],
    *,
    domain_merge: str = "union",          # 'union' | 'intersection'
    source_column: Optional[str] = None,  # add provenance column
    source_values: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Vertical UNION ALL with Orange's domain-merge options.

    ``union`` keeps all columns (missing filled with NULL) =
    ``unionByName(allowMissingColumns=True)``; ``intersection`` keeps common
    columns only (``owconcatenate.py:336-400``).
    """
    if not tables:
        raise ValueError("no tables")
    dfs = list(tables)
    if source_column:
        vals = source_values or [str(i) for i in range(len(dfs))]
        dfs = [d.withColumn(source_column, F.lit(v)) for d, v in zip(dfs, vals)]
    if domain_merge == "intersection":
        common = [c for c in dfs[0].columns if all(c in d.columns for d in dfs[1:])]
        dfs = [d.select(*common) for d in dfs]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


# --------------------------------------------------------------------- unique

def unique(
    df: DataFrame,
    keys: Sequence[str],
    *,
    tiebreaker: str = "first",   # first | last | middle | random | discard
    order_col: Optional[str] = None,
    seed: int = 42,
) -> DataFrame:
    """Keep one row per key group (``owunique.py:30-35``).

    Distributed DataFrames have no intrinsic row order, so 'first'/'last'/
    'middle' need an explicit ``order_col`` (e.g. an ingest-time row_id);
    'random' is seeded.  'discard' drops all groups with >1 row.

    Single shuffle: window ``row_number`` over ``partitionBy(keys)``.
    """
    from pyspark.sql.window import Window

    if tiebreaker == "discard":
        w = Window.partitionBy(*keys)
        return (df.withColumn("_n", F.count(F.lit(1)).over(w))
                  .filter(F.col("_n") == 1).drop("_n"))

    if tiebreaker == "random":
        order = [F.xxhash64(*[F.col(c).cast("string") for c in df.columns],
                            F.lit(seed))]
    elif order_col is None:
        raise ValueError("first/last/middle need an explicit order_col on a "
                         "distributed engine")
    elif tiebreaker == "first":
        order = [F.col(order_col).asc()]
    elif tiebreaker == "last":
        order = [F.col(order_col).desc()]
    elif tiebreaker == "middle":
        order = [F.col(order_col).asc()]
    else:
        raise ValueError(tiebreaker)

    w = Window.partitionBy(*keys).orderBy(*order)
    df2 = df.withColumn("_rn", F.row_number().over(w))
    if tiebreaker == "middle":
        wc = Window.partitionBy(*keys)
        df2 = df2.withColumn("_cnt", F.count(F.lit(1)).over(wc))
        return (df2.filter(F.col("_rn") == F.floor((F.col("_cnt") + 1) / 2))
                   .drop("_rn", "_cnt"))
    return df2.filter(F.col("_rn") == 1).drop("_rn")


# ----------------------------------------------------------------------- melt

def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    item_col: str = "item",
    value_col: str = "value",
    drop_missing: bool = True,
    exclude_zeros: bool = False,
) -> DataFrame:
    """Wide → long ``(id, item, value)`` (``owmelt.py:200-296``).

    Uses the built-in ``stack`` generator — no shuffle, row-local expansion.
    """
    n = len(value_cols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    out = df.select(*id_cols,
                    F.expr(f"stack({n}, {pairs}) as (`{item_col}`, `{value_col}`)"))
    if drop_missing:
        out = out.filter(F.col(value_col).isNotNull())
    if exclude_zeros:
        out = out.filter(F.col(value_col) != 0)
    return out


# ---------------------------------------------------------------------- pivot

def pivot(
    df: DataFrame,
    row_var: str,
    col_var: str,
    val_var: Optional[str] = None,
    agg: str = "count",
    *,
    col_values: Optional[Sequence[str]] = None,
) -> DataFrame:
    """group by ``row_var`` × pivot ``col_var`` with one aggregation
    (``owpivot.py:55-462``).  Output columns ``{col_value}_{agg}``.

    Passing ``col_values`` (the discrete variable's known value order) skips
    Spark's extra distinct-collection job AND fixes the column order — at
    scale always pass it.
    """
    expr = (agg_expr(agg, val_var) if val_var else F.count(F.lit(1)))
    p = df.groupBy(row_var).pivot(col_var, list(col_values) if col_values else None)
    out = p.agg(expr)
    # name columns deterministically: value -> f"{value}_{agg}"
    renames = {c: f"{c}_{agg}" for c in out.columns if c != row_var}
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out


def pivot_totals(
    df: DataFrame,
    row_var: str,
    col_var: str,
    val_var: Optional[str] = None,
    agg: str = "count",
) -> DataFrame:
    """Pivot margins via ``cube`` — the reference computes h/v/grand totals
    by hand (``owpivot.py:115-127``); cube gets all three in ONE pass
    (SURVEY §2.5: grouping sets are a free win on Spark)."""
    expr = (agg_expr(agg, val_var) if val_var else F.count(F.lit(1))).alias(f"total_{agg}")
    return df.cube(row_var, col_var).agg(expr)


def hstack(left: DataFrame, right: DataFrame, *,
           row_id: Optional[str] = None) -> DataFrame:
    """Horizontal concatenation (``Table.concatenate(axis=1)``,
    ``table.py:1417-1439``): same row count, unique names.

    With ``row_id`` given, an equi-join on it (order-independent — the only
    sane distributed semantics).  Without, both sides get a
    partition-parallel row index (``operators.rowid.with_row_index`` —
    zipWithIndex shape, no unpartitioned window) and join on position —
    valid only when both frames have a deterministic physical order from
    the SAME source (e.g. two projections of one parquet scan); prefer an
    explicit key.
    """
    dup = set(left.columns) & set(right.columns) - ({row_id} if row_id else set())
    if dup:
        raise ValueError(f"duplicate columns: {sorted(dup)}")
    if row_id is not None:
        return left.join(right, row_id)
    from orange3_spark.operators.rowid import with_row_index

    ln = with_row_index(left, "_pos")
    rn = with_row_index(right, "_pos")
    return ln.join(rn, "_pos").drop("_pos")


# ------------------------------------------------------------------ transpose

def transpose(df: DataFrame, name_col: Optional[str] = None,
              max_rows: int = 10_000) -> DataFrame:
    """Rows ↔ columns (``table.py:2231-2373``) — inherently driver-local
    (the output schema depends on the row count), so bounded explicitly
    rather than pretending to scale (SURVEY §7 risk register)."""
    n = df.count()
    if n > max_rows:
        raise ValueError(f"transpose of {n} rows exceeds bound {max_rows}")
    pdf = df.toPandas()
    if name_col is not None:
        pdf = pdf.set_index(name_col)
    else:
        pdf.index = [f"r{i}" for i in range(len(pdf))]
    tdf = pdf.transpose().reset_index().rename(columns={"index": "variable"})
    tdf.columns = [str(c) for c in tdf.columns]
    return df.sparkSession.createDataFrame(tdf)


# ---------------------------------------------------------------------- split

def split_column(
    df: DataFrame,
    column: str,
    delimiter: str = " ",
    *,
    mode: str = "onehot",   # 'onehot' | 'count'
    values: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Split a delimited string column into one-hot / count columns
    (``owsplit.py:40-92``).

    ``values=None`` collects the distinct token set first (driver-side —
    fine for categorical-ish columns; pass explicit values at scale).
    Row-local: ``split`` + per-value ``array_contains`` / filter-size; no
    explode+pivot shuffle needed.
    """
    arr = F.split(F.col(column), delimiter)
    if values is None:
        values = [r[0] for r in
                  df.select(F.explode(F.split(F.col(column), delimiter)).alias("t"))
                    .filter(F.col("t") != "").distinct().orderBy("t").collect()]
    out = df
    for v in values:
        safe = v.replace(".", "_")
        if mode == "onehot":
            out = out.withColumn(f"{column}={safe}",
                                 F.array_contains(arr, v).cast("int"))
        else:
            out = out.withColumn(
                f"{column}={safe}",
                F.size(F.filter(arr, lambda x: x == F.lit(v))))
    return out


# --------------------------------------------------------------- create class

def create_class(
    df: DataFrame,
    column: str,
    rules: Sequence[tuple[str, str]],
    *,
    new_column: str = "class",
    regex: bool = False,
    default: Optional[str] = None,
) -> DataFrame:
    """Map a string column to a new discrete target by ORDERED substring (or
    regex) rules — first match wins (``owcreateclass.py:24-70``)."""
    expr: Optional[Column] = None
    c = F.col(column)
    for pattern, label in rules:
        cond = c.rlike(pattern) if regex else c.contains(pattern)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    if expr is None:
        expr = F.lit(default)
    else:
        expr = expr.otherwise(F.lit(default))
    return df.withColumn(new_column, expr)

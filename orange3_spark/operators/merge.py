"""Merge Data — Orange's one join operator, with its exact semantics.

Reference: ``Orange/widgets/data/owmergedata.py:244-728``.  The reference
implements a driver-side hash join (dict probe, ``:553-572``); here the join
is declared with ``df.join`` and Catalyst picks broadcast / shuffled-hash /
sort-merge — with AQE converting to broadcast at runtime when the build side
turns out small.  What we preserve is the *semantics*:

  * NaN/NULL keys never match (``owmergedata.py:530-551`` masks them out) —
    so we use plain ``==`` (never null-safe ``<=>``) and additionally drop
    NULL-keyed rows from the *inner* result the same way the reference does.
  * duplicate-key checks: error if right keys are non-unique and actually
    matched (``_check_uniqueness`` ``:453-497``); outer requires both unique.
  * right columns identical in name to left columns are dropped when merging
    on equal keys (``_compute_reduced_extra_data`` ``:498-525``); genuine
    collisions are renamed with a suffix (``_domain_rename_duplicates``
    ``:640-661``).
  * join types: ``left`` ("Append columns to reference data"), ``inner``
    ("Find matching pairs"), ``outer`` ("Concatenate tables").

Scale note: pass ``broadcast_right=True`` (or let AQE decide) for dim-table
merges; at 100 TB the fact side must never be shuffled for a small dim.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class MergeError(ValueError):
    pass


def _check_right_unique(right: DataFrame, right_keys: Sequence[str]) -> None:
    dup = (right.groupBy(*right_keys).count().filter(F.col("count") > 1).limit(1).count())
    if dup:
        raise MergeError(
            "right table contains duplicate key rows "
            f"on {list(right_keys)} (owmergedata.py:453-497 semantics)")


def merge(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str],
    right_keys: Optional[Sequence[str]] = None,
    how: str = "left",
    *,
    check_unique: bool = True,
    broadcast_right: bool = False,
    suffix: str = " (1)",
) -> DataFrame:
    """Orange Merge Data on Spark.  ``how`` in {'left','inner','outer'}."""
    right_keys = list(right_keys or left_keys)
    left_keys = list(left_keys)
    if how not in ("left", "inner", "outer"):
        raise MergeError(f"unsupported merge type {how!r}")
    if check_unique and how in ("left", "outer"):
        _check_right_unique(right, right_keys)

    same_keys = left_keys == right_keys
    # Column dedup: right columns with names equal to left's are dropped —
    # key columns always (they are equal by construction on matches), payload
    # name collisions renamed with a suffix.
    drop_right = set(right_keys) if same_keys else set()
    rename = {c: c + suffix
              for c in right.columns
              if c in set(left.columns) and c not in drop_right}

    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    rk = [rename.get(k, k) for k in right_keys]

    # NaN/NULL keys never match: plain == gives that for NULL; additionally
    # an *outer* join must still keep NULL-keyed rows from both sides as
    # unmatched (Orange appends them), which plain == also provides.
    cond = None
    for lk, rkey in zip(left_keys, rk):
        c = left[lk] == r[rkey]
        cond = c if cond is None else (cond & c)

    joined = left.join(F.broadcast(r) if broadcast_right else r, cond,
                       {"left": "left_outer", "inner": "inner",
                        "outer": "full_outer"}[how])
    # drop duplicated right key columns (same-name case)
    if same_keys:
        out_cols = [left[c] for c in left.columns] + \
                   [r[c] for c in r.columns if c not in set(right_keys)]
        # outer join: key values may live only on the right side for
        # unmatched right rows — coalesce keys so the output key is defined.
        if how == "outer":
            out_cols = [F.coalesce(left[c], r[c]).alias(c) if c in set(left_keys)
                        else left[c] for c in left.columns] + \
                       [r[c] for c in r.columns if c not in set(right_keys)]
        joined = joined.select(*out_cols)
    return joined


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Select-by-Data-Index keep case (``owselectbydataindex.py``)."""
    return left.join(right.select(*on).dropDuplicates(), on=list(on), how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Select-by-Data-Index remove case."""
    return left.join(right.select(*on).dropDuplicates(), on=list(on), how="left_anti")


def salted_join(left: DataFrame, right: DataFrame,
                on: Sequence[str], *, n_salts: int = 16,
                how: str = "inner",
                salt_on: Optional[Sequence[str]] = None) -> DataFrame:
    """Skew-resilient equi-join: the companion of
    ``groupby.salted_aggregate`` for the JOIN side of the skew toolbox.

    A plain shuffle join hashes every row of a hot key to ONE reducer
    pair; AQE's skew-join only splits after a partition is observed
    oversized and cannot help when one KEY (not partition) is hot.
    Here the fat side carries a deterministic content-hash salt
    (``xxhash64(salt_on) % n_salts``, never ``rand()`` — retries and
    replans reproduce it), and the other side is EXPLODED to all
    ``n_salts`` values, so the hot key's rows spread over ``n_salts``
    reducers at the cost of replicating the smaller side ``n_salts``
    times — the standard trade when the small side is modest but too
    big to broadcast.

    Join result is EXACTLY the plain join's (the salt is a refinement
    of the key partition), verified by oracle and property test.
    ``how`` supports inner/left (the salted side is ``left``)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_src = list(salt_on) if salt_on else \
        [c for c in left.columns if c not in on]
    if not salt_src:
        raise ValueError("salted_join needs a non-key left column to "
                         "salt on")
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]),
                         F.lit(n_salts)).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s).cast("int")
                                      for s in range(n_salts)])))
    out = l.join(r, [*on, "__salt"], how)
    return out.drop("__salt")


def snapshot_diff(old: DataFrame, new: DataFrame, keys: Sequence[str],
                  *, compare: Optional[Sequence[str]] = None) -> DataFrame:
    """CDC-style snapshot diff: classify every key as ``added`` (only in
    ``new``), ``removed`` (only in ``old``), ``changed`` (present in
    both, any compared column differs — NULL-safe), or ``unchanged``.
    The per-batch reconciliation report of an incremental pipeline
    (what a MERGE INTO would do, as an inspectable table).

    One full outer join on the key; comparison is NULL-safe equality
    (``<=>``) over ``compare`` (default: all shared non-key columns).
    Returns ``(keys..., change)``; aggregate for the census."""
    compare = list(compare) if compare is not None else [
        c for c in old.columns if c in set(new.columns) and c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"_o_{c}") for c in compare],
                   F.lit(1).alias("_in_o"))
    n = new.select(*keys, *[F.col(c).alias(f"_n_{c}") for c in compare],
                   F.lit(1).alias("_in_n"))
    j = o.join(n, list(keys), "full_outer")
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (F.when(F.col("_in_o").isNull(), F.lit("added"))
              .when(F.col("_in_n").isNull(), F.lit("removed"))
              .when(same, F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select(*keys, change.alias("change"))

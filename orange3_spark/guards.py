"""Cardinality guards shared by operators that collect per-level state
to the driver.

The naive ``approx_count_distinct`` probe has ~2-5% HLL++ error in BOTH
directions: an under-estimate admits a too-wide column into an unbounded
driver-side ``collect()``; an over-estimate falsely rejects valid input.
``check_max_levels`` is exact at the decision boundary while staying
cheap at 100 TB:

1. ONE HLL probe over all guarded columns (one aggregation pass).
2. Estimates above ``max_levels * (1 + band)`` reject immediately — HLL
   cannot over-estimate by >band, so no exact pass is spent on columns
   that are obviously too wide (at scale these are the expensive ones:
   an exact distinct of a high-cardinality column shuffles every
   distinct value).
3. Estimates inside the band run an exact capped probe —
   ``distinct().limit(max_levels + 1).count()`` — whose shuffle is
   bounded by the (near-threshold, hence small) true level set.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: relative HLL++ error headroom (default rsd is 5%; 15% is generous)
HLL_BAND = 0.15


def check_max_levels(df: DataFrame, cols: Sequence[str],
                     max_levels: int, what: str, *,
                     band: float = HLL_BAND) -> None:
    """Raise ``ValueError`` naming ``what`` if any column in ``cols``
    has more than ``max_levels`` distinct values.  Exact at the
    boundary (see module docstring); one HLL pass plus at most one
    tiny exact pass per near-threshold column."""
    est = df.agg(*[F.approx_count_distinct(f"`{c}`").alias(f"_g{i}")
                   for i, c in enumerate(cols)]).first()
    hi = max_levels * (1.0 + band)
    lo = max_levels / (1.0 + band)
    too_big = []
    for i, c in enumerate(cols):
        e = est[f"_g{i}"]
        if e > hi:
            too_big.append(c)
        elif e >= lo:
            # inside the HLL error band: settle it exactly, capped.
            # NULLs are excluded to match both the HLL estimate above
            # (approx_count_distinct ignores NULL) and every caller,
            # which drops missing values downstream — otherwise a
            # column with exactly max_levels non-null levels plus any
            # NULLs would be falsely rejected at the boundary.
            n = (df.select(F.col(f"`{c}`").alias("_v"))
                 .where(F.col("_v").isNotNull()).distinct()
                 .limit(max_levels + 1).count())
            if n > max_levels:
                too_big.append(c)
    if too_big:
        raise ValueError(
            f"columns {too_big} exceed {max_levels} levels; {what}")

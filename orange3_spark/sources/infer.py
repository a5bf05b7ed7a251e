"""Column type inference — Orange's ``guess_data_type`` rules on samples.

Reference: ``Orange/data/io_util.py:153-192`` — try discrete (small distinct
value set) → float → ISO time → string; and the SQL-boundary probe that
treats int/char columns with <21 distinct values as discrete
(``Orange/data/sql/backend/base.py:119-150``, ``postgres.py:185-189``).

Used driver-side over a bounded sample (the reference infers over the whole
file; at 100 TB a 1000-row sample keeps the probe O(1) — the same trade the
reference makes at its SQL boundary with ``LIMIT``-ed probes).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from orange3_spark.domain import (
    TYPE_CONTINUOUS, TYPE_DISCRETE, TYPE_STRING, TYPE_TIME,
)

# how many distinct values may a discrete column have (sql/backend/base.py:147)
DISCRETE_MAX_VALUES = 20

# TimeVariable.REGEX (Orange/data/variable.py:977-985) minus the pure-number
# arms (numbers are claimed by the float probe first), plus the dot/slash
# date shapes of ADDITIONAL_FORMATS (variable.py:987+) which our lenient
# parser accepts.
_ISO_TIME_RE = re.compile(
    r"^("
    r"\d{1,4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?([+-]\d{4})?)?)?Z?|"
    r"\d{4}\d{2}\d{2}T\d{2}\d{2}\d{2}([+-]\d{4})?Z?|"
    r"\d{2}:\d{2}(:\d{2}(\.\d+)?)?|"
    r"\d{1,4}-\d{2,3}|"
    r"\d{1,2}\. ?\d{1,2}\. ?\d{2,4}|"
    r"\d{1,2}/\d{1,2}/\d{2,4}"
    r")$")


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def is_discrete_values(values: Sequence[str]) -> Optional[tuple[str, ...]]:
    """Plausibly-discrete probe: few distinct values relative to the sample
    (``io_util.py`` ``is_discrete_values``).  Numeric columns qualify only
    when integer-coded with a tiny range (e.g. 0/1/2 class codes)."""
    if not values:
        return None
    distinct = sorted(set(values))
    if len(distinct) > DISCRETE_MAX_VALUES:
        return None
    if any(_ISO_TIME_RE.match(v) for v in distinct):
        return None   # time-shaped values are never discrete
    if all(_is_float(v) for v in distinct):
        # numbers: discrete only if all integer-valued and very few
        try:
            as_f = [float(v) for v in distinct]
        except ValueError:
            return None
        if all(f.is_integer() for f in as_f) and len(distinct) <= 3:
            return tuple(str(int(f)) for f in sorted(as_f))
        return None
    # symbolic values with a small distinct set → discrete
    return tuple(distinct)


def guess_data_type(values: Sequence[str]) -> tuple[str, Optional[tuple[str, ...]]]:
    """→ (var_type, ordered values or None), mirroring ``io_util.py:153-192``:
    discrete probe first, then float, then ISO time, else string."""
    vals = [v for v in values if v is not None and v != ""]
    if not vals:
        return TYPE_STRING, None
    disc = is_discrete_values(vals)
    if disc is not None:
        return TYPE_DISCRETE, disc
    if all(_is_float(v) for v in vals):
        return TYPE_CONTINUOUS, None
    if all(_ISO_TIME_RE.match(v) for v in vals):
        return TYPE_TIME, None
    return TYPE_STRING, None

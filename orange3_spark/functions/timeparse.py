"""Lenient multi-format datetime parsing — TimeVariable.parse as a Column.

Reference: ``Orange/data/variable.py:937-985`` (``_ISO_FORMATS`` probe
table + ``ADDITIONAL_FORMATS``) and ``:1146-1211`` (``parse``): try each
format in decreasing-probability order, assume the Unix-epoch date when
only a time is given, and fall back to reading a plain number as a Unix
timestamp.

Spark shape: ONE ``coalesce`` over ``try_to_timestamp`` probes — each probe
is a codegen'd JVM expression that yields NULL on mismatch, so the whole
chain stays row-local inside WholeStageCodegen (no Python, no shuffle);
Catalyst short-circuits coalesce, so well-formed columns pay ~one parse.
The reference's strptime loop is per-value driver Python — this is the
vectorized equivalent.  Missing date fields default to 1970-01-01 in
Spark's parser, which is exactly the reference's epoch-date rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark datetime patterns mirroring variable.py's _ISO_FORMATS order
# (decreasing probability; time-only patterns inherit the epoch date) and
# ADDITIONAL_FORMATS (European dot-dates, US slash-dates).  Spark's 'S'
# fraction accepts 1..n digits on parse, so one .SSSSSS probe covers
# %f of any precision; 'Z' accepts ±HHMM offsets like %z.
ISO_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd HH:mm:ssZ",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd'T'HH:mm:ssZ",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss.SSSSSSZ",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSZ",
    "yyyyMMdd'T'HHmmssZ",
    "yyyyMMddHHmmssZ",
    "HH:mm:ss.SSSSSS",
    "HH:mm:ss",
    "HH:mm",
    "yyyyMMdd'T'HHmmss",
    "yyyyMMddHHmmss",
    "yyyyMMdd",
    "yyyyDDD",
    "yyyy",
    "HHmmss.SSSSSS",
    "yyyy-MM",
    "yyyy-DDD",
)

ADDITIONAL_FORMATS: tuple[str, ...] = (
    "dd.MM.yyyy", "dd. MM. yyyy",
    "dd.MM.yy", "dd. MM. yy",
    "MM/dd/yyyy", "MM/dd/yy",
)

_NUMERIC_RE = r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"


def lenient_timestamp(col, *, formats=None, unix_fallback: bool = True) -> Column:
    """Parse a string column as a timestamp, trying every known format.

    Mirrors ``TimeVariable.parse``: a trailing ``Z`` (UTC marker) becomes
    an explicit ``+0000`` offset for the offset-bearing formats — NOT
    stripped, which would re-interpret the wall clock in the session
    timezone and shift Z-suffixed instants by the session offset in any
    non-UTC caller session.  Offset-LESS formats additionally probe the
    Z-stripped string (the reference ``rstrip('Z')``s before parsing, so
    '2021-01-01Z' / '12:00:00Z' / numeric-with-Z must still parse; their
    wall clocks carry no time-of-instant ambiguity for date-only and
    time-only shapes).  Then a plain number reads as Unix seconds.
    Unparseable values become NULL (the reference raises; at 100 TB a
    poison row must not kill the job — filter ``parsed IS NULL AND raw IS
    NOT NULL`` to audit rejects).
    """
    if isinstance(col, str):
        col = F.col(col)
    fmts = formats or ISO_FORMATS + ADDITIONAL_FORMATS
    c = F.regexp_replace(F.trim(col), "Z$", "+0000")
    stripped = F.regexp_replace(F.trim(col), "Z$", "")
    probes = [F.try_to_timestamp(c, F.lit(f)) for f in fmts]
    # Z-stripped probes only for formats with no offset pattern, and only
    # ranked AFTER every offset-aware probe so explicit offsets still win
    probes += [F.try_to_timestamp(stripped, F.lit(f))
               for f in fmts if "Z" not in f and "X" not in f]
    if unix_fallback:
        probes.append(F.timestamp_seconds(
            F.when(stripped.rlike(_NUMERIC_RE), stripped).cast("double")))
    return F.coalesce(*probes)


def epoch_seconds(col, *, fractional: bool = False) -> Column:
    """Epoch seconds of a timestamp column, independent of the session
    timezone and of whether the column is TIMESTAMP or TIMESTAMP_NTZ.

    Spark 4 forbids casting TIMESTAMP_NTZ to numeric, and casting NTZ
    through TIMESTAMP interprets the wall clock in the *session* zone —
    a correctness trap when the caller's session isn't pinned to UTC
    (parquet written by pandas/arrow without tz reads back as NTZ).
    ``unix_timestamp`` interprets NTZ wall clocks as UTC regardless of the
    session zone — the same convention DuckDB's ``epoch()`` applies to
    naive timestamps — so results agree with SQL oracles everywhere.

    ``fractional=True`` adds the sub-second part (exact: seconds are a
    DECIMAL(8,6) field, and timezone offsets are whole minutes, so the
    fraction is zone-invariant for LTZ inputs too).
    """
    if isinstance(col, str):
        col = F.col(col)
    secs = F.unix_timestamp(col)
    if not fractional:
        return secs
    return secs + F.date_part(F.lit("SECOND"), col) % 1

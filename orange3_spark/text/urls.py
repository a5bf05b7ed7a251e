"""URL canonicalization / domain extraction — web-corpus curation ops.

Web-scale training pipelines key dedup, blocklists, and per-site quota
decisions on a CANONICAL url (Common-Crawl-style processing); raw urls
differ by tracking params, fragment, case, default ports, and trailing
slashes while naming the same resource.  Everything here is a pure
Column expression tree (whole-stage codegen, no UDFs) mirrored verbatim
by DuckDB SQL — string ops only, so it is exactly replayable and scales
as a row-local map.

Canonicalization contract (documented order, applied by
:func:`canonicalize_url`):

1. strip the ``#fragment``;
2. split off the query string;
3. lowercase ``scheme://host`` and drop a default ``:80``/``:443``;
4. strip trailing slashes from the path;
5. drop tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
   sort the survivors bytewise, and re-append as ``?a=..&z=..``.

:func:`registrable_domain` is a heuristic eTLD+1: it special-cases the
common two-level public suffixes (``co.uk``-style) by regex and
otherwise takes the last two labels.  A production deployment would
ship the full Public Suffix List as a broadcast join table; the
expression form is the 100 TB-friendly shape either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: params stripped during canonicalization (anchored key match)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="

#: two-level public-suffix heuristic (co.uk, com.au, ac.jp, ...)
TWO_LEVEL_SUFFIX_RE = r"([^.]+\.(?:co|com|org|net|ac|gov)\.[a-z][a-z])$"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of a URL column (see module contract)."""
    col = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(col, r"#.*$", "")
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    qs = F.regexp_extract(u, r"\?(.*)$", 1)
    head = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)
    path = F.substr(base, F.length(head) + F.lit(1))
    h2 = F.regexp_replace(F.lower(head), r":(80|443)$", "")
    p2 = F.regexp_replace(path, r"/+$", "")
    kept = F.filter(F.split(qs, "&"),
                    lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    tail = F.when(F.size(kept) > 0,
                  F.concat(F.lit("?"),
                           F.array_join(F.array_sort(kept), "&"))
                  ).otherwise(F.lit(""))
    return F.concat(h2, p2, tail)


def url_host(col: Column | str) -> Column:
    """Lowercased host (no port) of a URL column."""
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(F.lower(col), r"://([^/:?#]*)", 1)


def registrable_domain(col: Column | str) -> Column:
    """Heuristic eTLD+1 of a URL column (see module contract)."""
    host = url_host(col)
    two = F.regexp_extract(host, TWO_LEVEL_SUFFIX_RE, 1)
    return F.when(two != "", two).otherwise(
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))

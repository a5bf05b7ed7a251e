"""URL reader — fetch a remote table and dispatch to the extension registry.

Reference: ``Orange/data/io.py:409-513`` (``UrlReader``): normalize the URL
(default http scheme, percent-quote non-ASCII), rewrite well-known share
links (Google Sheets → TSV export, Google Drive → direct download,
Dropbox → ``dl=1``), resolve redirects, download to a temp file, then read
it with the reader matching the suggested filename's extension.

Spark note: the download is driver-side by design — a shared URL is a
small-data source (the reference treats it the same way).  Datasets big
enough to matter live on distributed storage and are read directly by
``spark.read`` through the registry, not over HTTP.
"""

from __future__ import annotations

import contextlib
import os
import re
import tempfile
from pathlib import Path
from urllib.parse import unquote as urlunquote
from urllib.parse import urlparse, urlsplit, urlunsplit
from urllib.request import Request, urlopen

from pyspark.sql import DataFrame, SparkSession

_UA = "Mozilla/5.0 (X11; Linux) Gecko/20100101 Firefox/"


def normalize_url(url: str) -> str:
    """Default scheme + percent-quote bytes ≥ 0x80 (io.py:411-420)."""
    url = url.strip()
    if not urlparse(url).scheme:
        url = "http://" + url
    return "".join(chr(b) if b < 0x80 else "%{:02X}".format(b)
                   for b in url.encode("utf-8"))


def trim_googlesheet(url: str) -> str:
    """docs.google.com spreadsheet link → TSV export URL (io.py:470-485)."""
    match = re.match(r"(?:https?://)?(?:www\.)?"
                     r"docs\.google\.com/spreadsheets/d/"
                     r"(?P<workbook_id>[-\w_]+)"
                     r"(?:/.*?gid=(?P<sheet_id>\d+).*|.*)?",
                     url, re.IGNORECASE)
    if not match or not match.group("workbook_id"):
        raise ValueError(url)
    out = ("https://docs.google.com/spreadsheets/d/"
           f"{match.group('workbook_id')}/export?format=tsv")
    if match.group("sheet_id"):
        out += "&gid=" + match.group("sheet_id")
    return out


def trim_googledrive(url: str) -> str:
    """drive.google.com file link → direct download (io.py:487-497)."""
    parts = urlsplit(url)
    if not parts.netloc.endswith("drive.google.com"):
        raise ValueError(url)
    match = re.match(r"/file/d/(?P<id>[^/]+).*", parts.path)
    if not match:
        raise ValueError(url)
    parts = parts._replace(
        path=f"uc?export=download&id={match.group('id')}", query="")
    return urlunsplit(parts)


def trim_dropbox(url: str) -> str:
    """dropbox share link → ``dl=1`` direct download (io.py:499-504)."""
    parts = urlsplit(url)
    if not parts.netloc.endswith("dropbox.com"):
        raise ValueError(url)
    return urlunsplit(parts._replace(query="dl=1"))


def trim_url(url: str) -> str:
    for trim in (trim_googlesheet, trim_googledrive, trim_dropbox):
        try:
            return trim(url)
        except ValueError:
            continue
    return url


def _suggest_filename(url: str, content_disposition: str | None) -> str:
    """RFC 6266 filename from Content-Disposition, else the URL path
    (io.py:506-513)."""
    default_name = re.sub(r"[\\:/]", "_", urlparse(url).path)
    matches = re.findall(r"filename\*?=(?:\"|.{0,10}?'[^']*')([^\"]+)",
                         content_disposition or "")
    return urlunquote(matches[-1]) if matches else default_name


def _open(url: str):
    if url.startswith("file:"):
        return urlopen(url, timeout=10)
    return urlopen(Request(url, headers={"User-Agent": _UA}), timeout=10)


def read_url(spark: SparkSession, url: str) -> DataFrame:
    """Download ``url`` to a temp file and read it via the extension
    registry (``read_table``)."""
    from orange3_spark.sources.registry import read_table

    url = trim_url(normalize_url(url))
    with contextlib.closing(_open(url)) as response:
        final_url = getattr(response, "url", url)
        headers = getattr(response, "headers", {})
        name = _suggest_filename(
            final_url, headers.get("content-disposition")
            if hasattr(headers, "get") else None)
        suffix = "".join(Path(name).suffixes) or ".csv"
        fd, tmp = tempfile.mkstemp(suffix=suffix)
        with os.fdopen(fd, "wb") as f:
            f.write(response.read())
        # Spark scans the temp path LAZILY (every registry format goes
        # through spark.read), so the file must outlive this call; clean
        # it up at interpreter exit instead of eagerly.
        import atexit
        atexit.register(lambda p=tmp: os.path.exists(p) and os.remove(p))
        return read_table(spark, tmp)

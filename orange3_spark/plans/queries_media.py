"""Multimodal queries — binary columns synthesized from the documents table
(the fixtures carry no real blobs; the engine treats any binary payload the
same way)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orange3_spark.multimodal import media as M
from orange3_spark.plans.registry import query
from orange3_spark.session import load_tables


def _docs_as_media(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return docs.select(F.col("doc_id").alias("media_id"),
                       F.encode("text", "utf-8").alias("content"))


@query("q_media_metadata", """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS media_bytes,
       md5(text) AS media_hash,
       'unknown' AS media_format
FROM documents
""")
def q_media_metadata(spark, sf_dir):
    """Blob metadata (format sniff / length / content hash) as pure column
    expressions — the filter/dedup surface that never touches pixels."""
    m = M.media_metadata(_docs_as_media(spark, sf_dir))
    return m.select("media_id", "media_bytes", "media_hash", "media_format")


@query("q_media_dedup", """
SELECT min(doc_id) AS media_id, count(*) AS n_copies
FROM (SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 5000000, text FROM documents)
GROUP BY md5(text)
""")
def q_media_dedup(spark, sf_dir):
    """Exact blob dedup by content hash (doubled corpus collapses back)."""
    m = _docs_as_media(spark, sf_dir)
    doubled = m.unionByName(
        m.select((F.col("media_id") + 5000000).alias("media_id"), "content"))
    return M.dedup_media_exact(doubled)


@query("q_media_bytes")  # rows-only: byte histograms aren't SQL-portable
def q_media_bytes(spark, sf_dir):
    """Byte histogram + entropy per blob via Arrow-batched mapInPandas —
    the real-computation path of the decode plumbing."""
    out = M.byte_histogram(_docs_as_media(spark, sf_dir))
    return out.select("media_id", "entropy", "mean_byte")

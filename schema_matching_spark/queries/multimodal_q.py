"""Multimodal plumbing exposed as an oracle-checkable query."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.multimodal import assets_from_documents, extract_features


def q_multimodal_features(spark, sf_dir):
    """Binary-asset feature extraction (mapInPandas over opaque
    payloads): per-kind byte totals + distinct content hashes.  The
    sha256/entropy math is deterministic, so DuckDB can mirror it on
    the text bytes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assets = assets_from_documents(docs)
    feats = extract_features(assets)
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("sha256").alias("n_distinct_sha"),
            F.round(F.avg("mean_byte"), 4).alias("avg_mean_byte"),
        )
        .orderBy("kind")
    )


SQL_MULTIMODAL = """
SELECT 'text/utf-8' AS kind,
       count(*) AS n_assets,
       sum(strlen(text)) AS total_bytes,
       count(DISTINCT sha256(text)) AS n_distinct_sha,
       round(avg(mean_byte), 4) AS avg_mean_byte
FROM (
  SELECT text,
         list_aggregate([unicode(x) for x in split(text, '')], 'avg') AS mean_byte
  FROM documents
)
GROUP BY 1
ORDER BY kind
"""


QUERIES = {"multimodal_features": q_multimodal_features}
ORACLE = {"multimodal_features": SQL_MULTIMODAL}

"""Corpus table layouts for the fetch join at 100 TB.

``FrontierEngine`` defaults to ``repartition(url).sortWithinPartitions``
+ ``persist()`` — right for a corpus that fits the cluster's cache. At
100 TB the same co-location comes from the TABLE layout instead: bucket
the pages table by url once at ingest (Spark bucketing here; Iceberg
bucket + sort order in production), and every later fetch join exchanges
ONLY the schedule side — the corpus is never shuffled and never needs to
be cached, on any session that reads the table.

``spark.table(name)`` returns a DataFrame carrying the bucket spec, so it
plugs straight into ``FrontierEngine(..., pages_prepared=True)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_pages_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 32,
    bucket_col: str = "url",
) -> None:
    """Write the pages corpus as a bucketed+sorted table (one shuffle, at
    ingest time, forever). Equivalent Iceberg DDL:
    ``ALTER TABLE ... WRITE ORDERED BY url`` + ``bucket(N, url)``
    partition transform."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_pages_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """The bucketed corpus as a DataFrame (bucket spec attached — joins on
    the bucket column skip the corpus-side exchange). Hand this to
    ``FrontierEngine(..., pages_prepared=True)``."""
    return spark.table(table)

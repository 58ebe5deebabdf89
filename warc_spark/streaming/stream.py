"""Structured Streaming variants of the ingest path: a continuously-arriving
pages table (the production shape of a live crawl: WARC drops landing in
object storage) processed incrementally.

The reference library is a blocking pull iterator (warc/warc.py:389-393);
the streaming mapping is ``readStream`` over the landing directory ->
the same vectorized parse kernel (mapInPandas works unchanged on streams) ->
watermarked windowed aggregation / streaming dedup -> ``writeStream``.

Scale notes:
- file-source streaming scales by files-per-trigger; each WARC drop is an
  independent task (per-record gzip members keep it splittable, SURVEY §1.4);
- ``withWatermark + dropDuplicates(url)`` is the streaming URL-seen set —
  state is bounded by the watermark horizon; the batch engine's partitioned
  bloom blobs are the unbounded-horizon complement;
- windowed counts use the event-time ``warc_ts``, tolerating late fetches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.pages import PAGES_SCHEMA
from ..sources.warc_source import WARC_RECORD_SCHEMA, parse_warc_column


def stream_pages(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Incrementally read a growing pages-table directory."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


def streaming_parse_records(pages_stream: DataFrame) -> DataFrame:
    """The vectorized WARC parse kernel applied to a stream — identical
    code path as batch (parse_warc_column is stream-safe: map-only)."""
    return parse_warc_column(pages_stream, "html", keep=["url", "lang", "warc_ts"])


def streaming_host_rollup(
    pages_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time windowed page counts per host/lang with late-data
    tolerance via watermark."""
    host = F.regexp_extract(F.col("url"), r"//([^/:?#]+)", 1)
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), host.alias("host"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            "host",
            "lang",
            "n_pages",
        )
    )


def streaming_url_dedup(pages_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming URL-seen set: exactly-once url emission within the
    watermark horizon (state bounded by the horizon)."""
    return pages_stream.withWatermark("warc_ts", watermark).dropDuplicates(["url"])


def run_available_now(
    stream_df: DataFrame, query_name: str, timeout_sec: int = 120,
    output_mode: str = "append",
) -> DataFrame:
    """Drain everything currently available through the streaming engine
    into an in-memory sink and return the result as a DataFrame (test /
    backfill harness; Trigger.AvailableNow processes all pending files in
    bounded batches then stops)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    spark = stream_df.sparkSession
    return spark.table(query_name)

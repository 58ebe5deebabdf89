"""Vectorized ARC v1/v2 ingest (mirror of warc_source for the ARC format;
reference read path /root/reference/warc/arc.py:307-382)."""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..kernels.arcrec import parse_arc_file
from ..kernels.gzipmember import GZIP_MAGIC, iter_gzip_members

ARC_RECORD_SCHEMA = StructType(
    [
        StructField("filename", StringType()),
        StructField("record_index", LongType()),
        StructField("arc_version", IntegerType()),
        StructField("url", StringType()),
        StructField("ip_address", StringType()),
        StructField("arc_date", TimestampType()),
        StructField("content_type", StringType()),
        StructField("result_code", StringType()),
        StructField("checksum", StringType()),
        StructField("location", StringType()),
        StructField("offset", StringType()),
        StructField("arc_filename", StringType()),
        StructField("length", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def _records_of_arc(name: str, data: bytes) -> list[dict]:
    if data[:2] == GZIP_MAGIC:
        text = b"".join(p for _, _, p in iter_gzip_members(data)).decode("latin-1")
    else:
        text = data.decode("latin-1")
    it = parse_arc_file(text)
    version = next(it)
    rows = []
    for idx, rec in enumerate(it):
        f = rec.fields
        rows.append(
            {
                "filename": name,
                "record_index": idx,
                "arc_version": version,
                "url": f.get("url"),
                "ip_address": f.get("ip_address"),
                "arc_date": pd.to_datetime(
                    f.get("date"), format="%Y%m%d%H%M%S", errors="coerce"
                ),
                "content_type": f.get("content_type"),
                "result_code": f.get("result_code") or None,
                "checksum": f.get("checksum") or None,
                "location": f.get("location") or None,
                "offset": f.get("offset") or None,
                "arc_filename": f.get("filename") or None,
                "length": int(f["length"]) if f.get("length") else 0,
                "payload": rec.payload.encode("latin-1"),
            }
        )
    return rows


def read_arc(spark: SparkSession, path: str) -> DataFrame:
    files = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, data in zip(pdf["path"], pdf["content"]):
                rows.extend(_records_of_arc(os.path.basename(name), bytes(data)))
            yield pd.DataFrame(rows, columns=[f.name for f in ARC_RECORD_SCHEMA.fields])

    return files.select("path", "content").mapInPandas(gen, ARC_RECORD_SCHEMA)

"""End-to-end Spark tests for the vectorized sources: WARC/ARC ingest,
pages generator (incl. the byte-identity invariant), distributed WARC sink
round-trip."""

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from warc_spark.kernels import make_record, sha1_digest_hex
from warc_spark.kernels.gzipmember import compress_records_as_members
from warc_spark.sources import (
    open_archive,
    parse_warc_column,
    read_warc,
    synth_pages,
    write_warc,
)
from warc_spark.sources.pages import extract_text_kernel, synth_seeds


@pytest.fixture(scope="module")
def warc_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("warcs")
    records = [
        make_record(
            payload=b"payload %d" % i,
            headers=[("WARC-Target-URI", "http://example.com/%d" % i)],
            record_id="00000000-0000-0000-0000-%012d" % i,
            date="2026-08-01T00:00:%02dZ" % (i % 60),
        ).to_bytes()
        for i in range(25)
    ]
    path = str(d / "sample.warc.gz")
    with open(path, "wb") as f:
        f.write(compress_records_as_members(records))
    plain = str(d / "sample.warc")
    with open(plain, "wb") as f:
        f.write(b"".join(records))
    return path, plain


def test_read_warc_gz(spark, warc_file):
    gz, plain = warc_file
    df = read_warc(spark, gz)
    rows = df.orderBy("record_index").collect()
    assert len(rows) == 25
    assert rows[0].target_uri == "http://example.com/0"
    assert rows[0].warc_type == "response"
    assert bytes(rows[0].payload) == b"payload 0"
    assert rows[0].payload_digest == sha1_digest_hex(b"payload 0")
    assert rows[0].offset == 0 and rows[0].size > 0
    # compressed offsets are cumulative member sizes (browse() semantics)
    assert rows[1].offset == rows[0].size
    assert rows[0].error is None


def test_read_warc_plain_and_dispatch(spark, warc_file):
    gz, plain = warc_file
    df = open_archive(spark, plain)
    assert df.count() == 25
    with pytest.raises(IOError):
        open_archive(spark, "file.unknown")


def test_header_only_scan_prunes_payload(spark, warc_file):
    gz, _ = warc_file
    df = read_warc(spark, gz).select("target_uri", "warc_type")
    assert df.count() == 25  # no payload materialization required downstream


def test_write_warc_roundtrip(spark, warc_file, tmp_path):
    gz, _ = warc_file
    df = read_warc(spark, gz)
    out = str(tmp_path / "out")
    manifest = write_warc(df, out, compress=True).collect()
    assert sum(m.records for m in manifest) == 25
    back = read_warc(spark, os.path.join(out, "*.warc.gz"))
    a = {(r.target_uri, bytes(r.payload)) for r in df.collect()}
    b = {(r.target_uri, bytes(r.payload)) for r in back.collect()}
    assert a == b


def test_synth_pages_schema_and_identity(spark):
    pages = synth_pages(spark, 300, seed=42)
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    pdf = pages.toPandas()
    assert len(pdf) == 300
    assert pdf["url"].is_unique
    # byte-identity invariant (BASELINE.json input_hint)
    assert (extract_text_kernel(pdf["html"]) == pdf["text"]).all()


def test_synth_pages_deterministic_across_parallelism(spark):
    a = synth_pages(spark, 200, seed=42, partitions=2).orderBy("url").toPandas()
    b = synth_pages(spark, 200, seed=42, partitions=16).orderBy("url").toPandas()
    assert (a["url"] == b["url"]).all()
    assert (a["text"] == b["text"]).all()
    assert [bytes(x) for x in a["html"]] == [bytes(x) for x in b["html"]]


def test_parse_warc_column_on_pages(spark):
    pages = synth_pages(spark, 100, seed=42)
    recs = parse_warc_column(pages, "html", keep=["url", "lang"])
    rows = recs.select("url", "target_uri", "warc_type", "error").collect()
    assert len(rows) == 100
    for r in rows:
        assert r.target_uri == r.url
        assert r.warc_type == "response"
        assert r.error is None


def test_synth_seeds(spark):
    seeds = synth_seeds(spark, 300, n_seeds=10)
    pdf = seeds.toPandas()
    assert pdf["url"].is_unique
    assert (pdf["priority"] <= 1.0).all()

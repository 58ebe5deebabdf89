"""WET / WAT derived-format export (sources/wet.py): conversion records
carry the extracted text byte-exact, metadata records carry a parseable
JSON envelope, both round-trip through the engine's own reader, and ids
are deterministic across parallelism."""

import json
import os

from pyspark.sql import functions as F

from warc_spark.sources import (
    read_warc,
    synth_pages,
    parse_warc_column,
    wat_records,
    wet_records,
    write_wat,
    write_wet,
)


def test_wet_roundtrip(spark, tmp_path):
    pages = synth_pages(spark, 80, seed=11, n_hosts=5)
    out = str(tmp_path / "wet")
    manifest = write_wet(pages, out).collect()
    assert sum(m.records for m in manifest) == 80
    back = read_warc(spark, os.path.join(out, "*.warc.gz"))
    rows = {r.target_uri: r for r in back.collect()}
    orig = {r.url: r for r in pages.collect()}
    assert set(rows) == set(orig)
    for url, r in rows.items():
        assert r.warc_type == "conversion"
        assert r.content_type == "text/plain"
        assert bytes(r.payload).decode("utf-8") == orig[url].text  # byte-exact
        assert r.record_id.startswith("<urn:uuid:")
        assert r.error is None


def test_wet_skips_null_text(spark):
    pages = synth_pages(spark, 20, seed=1).withColumn(
        "text", F.when(F.col("url").endswith("0"), F.col("text"))
    )
    n_nonnull = pages.filter(F.col("text").isNotNull()).count()
    assert 0 < n_nonnull < 20
    assert wet_records(pages).count() == n_nonnull


def test_wet_ids_deterministic_across_parallelism(spark):
    pages = synth_pages(spark, 50, seed=3)
    a = wet_records(pages.repartition(1)).select("headers").collect()
    b = wet_records(pages.repartition(7)).select("headers").collect()
    ida = sorted(r.headers["warc-record-id"] for r in a)
    idb = sorted(r.headers["warc-record-id"] for r in b)
    assert ida == idb and len(set(ida)) == 50


def test_wet_same_second_revisits_get_distinct_ids(spark):
    """Two captures of one URI in the same second (revisit/duplicate —
    common in real crawls) must not share a WARC-Record-ID (ADVICE r4):
    the id salts in the payload digest."""
    rows = [
        ("http://h.example.org/p", "2024-01-01 00:00:00", "first capture"),
        ("http://h.example.org/p", "2024-01-01 00:00:00", "second capture"),
    ]
    pages = spark.createDataFrame(rows, "url string, ts string, text string").select(
        "url", F.col("ts").cast("timestamp").alias("warc_ts"), "text"
    )
    ids = [r.headers["warc-record-id"] for r in wet_records(pages).collect()]
    assert len(ids) == 2 and ids[0] != ids[1]


def test_wat_same_second_revisits_get_distinct_ids(spark):
    """WAT metadata ids salt in the SOURCE record's id, which is unique
    by construction — same-second revisits of one URI stay distinct."""
    pages = synth_pages(spark, 6, seed=5, n_hosts=2)
    # force every capture onto one uri + one timestamp
    recs = parse_warc_column(pages, "html", keep=[]).withColumn(
        "target_uri", F.lit("http://h.example.org/same")
    ).withColumn("warc_date", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    ids = [
        r.headers["warc-record-id"]
        for r in wat_records(recs, with_html_metadata=False).collect()
    ]
    assert len(ids) == 6 and len(set(ids)) == 6


def test_wat_all_record_types(spark):
    """WAT covers all three CC envelope kinds (VERDICT r4 #7): response,
    request (method/path/version parsed from the request line), and
    warcinfo (warc-fields verbatim, NO WARC-Target-URI header)."""
    import datetime

    rows = [
        ("warcinfo", None,
         b"software: warc-spark\r\nformat: WARC File Format 1.0\r\n", "<urn:a>"),
        ("request", "http://h.example.org/x",
         b"GET /x?q=1 HTTP/1.1\r\nHost: h.example.org\r\n\r\n", "<urn:b>"),
        ("response", "http://h.example.org/x",
         b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
         b"<html><body><p>t</p></body></html>", "<urn:c>"),
    ]
    df = spark.createDataFrame(
        [
            (t, u, datetime.datetime(2024, 1, 1), bytearray(p), 0, len(p),
             "sha1:XYZ", rid, "f.warc.gz")
            for t, u, p, rid in rows
        ],
        "warc_type string, target_uri string, warc_date timestamp, "
        "payload binary, offset long, size long, payload_digest string, "
        "record_id string, filename string",
    )
    out = wat_records(df, with_html_metadata=False).collect()
    envs = {}
    for r in out:
        env = json.loads(bytes(r.payload).decode("utf-8"))
        envs[env["record_type"]] = (r, env)
    assert set(envs) == {"warcinfo", "request", "response"}
    req_r, req_e = envs["request"]
    assert req_e["method"] == "GET"
    assert req_e["path"] == "/x?q=1"
    assert req_e["http_version"] == "HTTP/1.1"
    assert req_e["refers_to"] == "<urn:b>"
    wi_r, wi_e = envs["warcinfo"]
    assert "software: warc-spark" in wi_e["warc_fields"]
    assert wi_e["refers_to"] == "<urn:a>"
    assert "warc-target-uri" not in wi_r.headers
    assert "WARC-Target-URI" not in list(wi_r.header_names)
    resp_r, resp_e = envs["response"]
    assert resp_e["status"] == 200 and resp_e["refers_to"] == "<urn:c>"
    # every WAT record is a metadata record with a distinct id
    assert all(r.headers["warc-type"] == "metadata" for r, _ in envs.values())
    assert len({r.headers["warc-record-id"] for r, _ in envs.values()}) == 3


def test_wat_envelope(spark, tmp_path):
    pages = synth_pages(spark, 30, seed=7, n_hosts=3)
    recs = parse_warc_column(pages, "html", keep=[])
    out = str(tmp_path / "wat")
    write_wat(recs, out).collect()
    back = read_warc(spark, os.path.join(out, "*.warc.gz"))
    rows = back.collect()
    assert len(rows) == 30
    orig = {r.target_uri: r for r in recs.collect()}
    for r in rows:
        assert r.warc_type == "metadata"
        assert r.content_type == "application/json"
        env = json.loads(bytes(r.payload).decode("utf-8"))
        assert env["url"] == r.target_uri
        assert env["status"] == 200
        assert env["mime"] == "text/html"
        assert env["refers_to"] == orig[r.target_uri].record_id
        assert r.headers["warc-refers-to"] == orig[r.target_uri].record_id
        assert env["digest"] == orig[r.target_uri].payload_digest
        # CC-style HTML-Metadata block: title, base, anchor-text links
        assert env["title"] == "page"
        assert env["base"] == r.target_uri
        assert len(env["links"]) >= 2
        for link in env["links"]:
            assert link["url"].startswith("http://host")
            assert link["text"] == "l"


def test_wat_html_metadata_declared_charset(spark):
    """A windows-1251 page whose charset is declared ONLY in the HTTP
    Content-Type header (no <meta charset>) must decode through the raw
    header, not the params-stripped media type."""
    from warc_spark.kernels.warcrec import make_record
    from warc_spark.sources.wet import wat_records

    title = "Привет мир"
    body = ("<html><head><title>%s</title></head><body>x</body></html>" % title).encode(
        "windows-1251"
    )
    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=windows-1251\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body) + body
    )
    rec = make_record(
        payload=payload, warc_type="response",
        headers=[("WARC-Target-URI", "http://cy.example/p"),
                 ("Content-Type", "application/http; msgtype=response")],
        record_id="00000000-0000-0000-0003-000000000000",
        date="2026-08-02T00:00:00Z",
    )
    import pandas as pd

    from warc_spark.sources import parse_warc_column

    pages = spark.createDataFrame(
        pd.DataFrame({"url": ["http://cy.example/p"],
                      "html": [rec.to_bytes()]}))
    recs = parse_warc_column(pages, "html", keep=[])
    env = json.loads(bytes(wat_records(recs).collect()[0].payload).decode())
    assert env["title"] == title


def test_wat_html_metadata_gating(spark, tmp_path):
    """Non-HTML captures get null HTML-Metadata; with_html_metadata=False
    omits the keys entirely (and never decodes the body)."""
    from warc_spark.sources.wet import wat_records

    pages = synth_pages(spark, 6, seed=3, n_hosts=2)
    recs = parse_warc_column(pages, "html", keep=[])
    rows = wat_records(recs).collect()
    assert all(
        json.loads(bytes(r.payload).decode())["title"] == "page" for r in rows
    )
    lean = wat_records(recs, with_html_metadata=False).collect()
    for r in lean:
        env = json.loads(bytes(r.payload).decode())
        assert "links" not in env and "title" not in env

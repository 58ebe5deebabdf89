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


def test_presplit_scan_matches_read_warc(spark, warc_file, tmp_path):
    """Member-offset pre-split scan: >1 input split over one multi-member
    file must yield byte-identical records to the whole-file scan
    (reference member framing, warc/gzip2.py:88-109)."""
    from warc_spark.sources import (
        index_warc_members,
        plan_warc_splits,
        read_warc_presplit,
    )

    gz, _ = warc_file
    idx = index_warc_members(spark, gz)
    idx_rows = idx.orderBy("member_index").collect()
    assert len(idx_rows) == 25
    assert idx_rows[0].offset == 0
    # offsets tile the file contiguously
    for a, b in zip(idx_rows, idx_rows[1:]):
        assert b.offset == a.offset + a.length
    file_bytes = os.path.getsize(gz)
    split_bytes = max(1, file_bytes // 5)  # force >1 split
    splits = plan_warc_splits(idx, split_bytes).collect()
    assert len(splits) > 1
    got = read_warc_presplit(spark, gz, split_bytes=split_bytes).collect()
    ref = read_warc(spark, gz).collect()
    key = lambda r: r.offset
    got_t = [
        (r.filename, r.record_index, r.offset, r.size, r.target_uri,
         bytes(r.payload), r.payload_digest, r.record_id)
        for r in sorted(got, key=key)
    ]
    ref_t = [
        (r.filename, r.record_index, r.offset, r.size, r.target_uri,
         bytes(r.payload), r.payload_digest, r.record_id)
        for r in sorted(ref, key=key)
    ]
    assert got_t == ref_t


def test_write_warc_streams_and_roundtrips_plain(spark, warc_file, tmp_path):
    gz, _ = warc_file
    df = read_warc(spark, gz)
    out = str(tmp_path / "plain")
    manifest = write_warc(df, out, compress=False).collect()
    assert sum(m.records for m in manifest) == 25
    # no stray .tmp files (stream sink renames atomically)
    assert not glob.glob(os.path.join(out, "*.tmp"))
    for m in manifest:
        assert os.path.getsize(m.filename) == m.bytes
    back = read_warc(spark, os.path.join(out, "*.warc"))
    a = {(r.target_uri, bytes(r.payload)) for r in df.collect()}
    b = {(r.target_uri, bytes(r.payload)) for r in back.collect()}
    assert a == b


def test_write_arc_roundtrip_and_golden(spark, tmp_path):
    """Distributed ARC sink: files-on-disk round-trip via read_arc, and the
    single-partition file byte-matches the reference-golden kernel
    serializer (serialize_arc_file)."""
    import datetime as dt

    from warc_spark.kernels.arcrec import parse_arc_file, serialize_arc_file
    from warc_spark.sources import read_arc, write_arc

    date = dt.datetime(2026, 8, 1)
    rows = [
        {
            "url": "http://example.com/%d" % i,
            "ip_address": "127.0.0.1",
            "arc_date": date,
            "content_type": "text/html",
            "result_code": "200",
            "checksum": "-",
            "location": "-",
            "offset": "0",
            "arc_filename": "part.arc",
            "length": 9,
            "payload": b"payload %d" % i,
        }
        for i in range(10)
    ]
    df = spark.createDataFrame(rows).coalesce(1)
    out = str(tmp_path / "arcs")
    manifest = write_arc(df.orderBy("url"), out, version=2, date=date).collect()
    manifest = [m for m in manifest if m.records]
    assert sum(m.records for m in manifest) == 10
    back = read_arc(spark, os.path.join(out, "*.arc"))
    got = {(r.url, bytes(r.payload)) for r in back.collect()}
    assert got == {(r["url"], r["payload"]) for r in rows}
    # byte-identity vs the kernel's whole-file serializer
    assert len(manifest) == 1
    fname = manifest[0].filename
    recs = [
        (
            {
                "url": r["url"], "ip_address": r["ip_address"],
                "date": "20260801000000", "content_type": r["content_type"],
                "length": str(len(r["payload"])), "result_code": "200",
                "checksum": "-", "location": "-", "offset": "0",
                "filename": r["arc_filename"],
            },
            r["payload"].decode("latin-1"),
        )
        for r in sorted(rows, key=lambda x: x["url"])
    ]
    expect = serialize_arc_file(
        recs, os.path.basename(fname), version=2, date=date
    )
    with open(fname, "rb") as f:
        assert f.read().decode("latin-1") == expect
    # gz variant round-trips too
    out_gz = str(tmp_path / "arcs_gz")
    mz = write_arc(df, out_gz, version=2, date=date, compress=True).collect()
    assert sum(m.records for m in mz if m.records) == 10
    back_gz = read_arc(spark, os.path.join(out_gz, "*.arc.gz"))
    assert {(r.url, bytes(r.payload)) for r in back_gz.collect()} == got


def test_dispatch_presplit(spark, warc_file):
    gz, _ = warc_file
    split = max(1, os.path.getsize(gz) // 4)
    a = open_archive(spark, gz).count()
    b = open_archive(spark, gz, split_bytes=split).count()
    assert a == b == 25


def test_presplit_plain_file_fallback(spark, warc_file):
    """Plain (uncompressed) WARCs go through the presplit path as one
    ranged member per file — same records as read_warc."""
    from warc_spark.sources import read_warc_presplit

    _, plain = warc_file
    got = {(r.target_uri, bytes(r.payload))
           for r in read_warc_presplit(spark, plain, split_bytes=100).collect()}
    ref = {(r.target_uri, bytes(r.payload))
           for r in read_warc(spark, plain).collect()}
    assert got == ref and len(got) == 25


def test_random_access_by_offset_index(spark, warc_file):
    """cc-index pattern: select rows from the member index, ranged-read
    exactly those records — byte-identical to the scan's records."""
    from pyspark.sql import functions as SF

    from warc_spark.sources import index_warc_members, read_warc_records

    gz, _ = warc_file
    idx = index_warc_members(spark, gz)
    wanted = idx.filter(SF.col("member_index").isin(3, 7, 19)).withColumn(
        "tag", SF.concat(SF.lit("m"), SF.col("member_index").cast("string"))
    ).drop("member_index")
    got = read_warc_records(spark, wanted).collect()
    assert len(got) == 3
    ref = {
        r.offset: r
        for r in read_warc(spark, gz).collect()
        if r.record_index in (3, 7, 19)
    }
    for r in got:
        e = ref[r.offset]
        assert (r.target_uri, bytes(r.payload), r.record_id, r.size) == (
            e.target_uri, bytes(e.payload), e.record_id, e.size
        )
        assert r.tag == "m%d" % e.record_index  # passthrough column


def test_streamed_member_index_matches_whole_file(spark, warc_file):
    """The bounded-memory streamed indexer must produce the identical
    member index as the whole-file one — forced through many tiny chunk
    boundaries (chunk_bytes=64) so member frames straddle reads — and the
    presplit scan over it must equal read_warc."""
    from warc_spark.sources import (
        index_warc_members,
        index_warc_members_streamed,
        read_warc_presplit,
    )

    gz, plain = warc_file
    whole = index_warc_members(spark, gz)
    paths = [r.path for r in whole.select("path").distinct().collect()]
    streamed = index_warc_members_streamed(spark, paths, chunk_bytes=64)
    key = lambda r: (r.path, r.offset, r.length, r.member_index)  # noqa: E731
    assert sorted(map(key, streamed.collect())) == sorted(map(key, whole.collect()))
    got = {(r.target_uri, bytes(r.payload))
           for r in read_warc_presplit(spark, gz, index=streamed).collect()}
    ref = {(r.target_uri, bytes(r.payload))
           for r in read_warc(spark, gz).collect()}
    assert got == ref and len(got) == 25
    # plain files: one whole-file member, same as the whole-file indexer
    pwhole = index_warc_members(spark, plain)
    ppaths = [r.path for r in pwhole.select("path").distinct().collect()]
    pstreamed = index_warc_members_streamed(spark, ppaths, chunk_bytes=64)
    assert sorted(map(key, pstreamed.collect())) == sorted(map(key, pwhole.collect()))


def test_arc_random_access_by_offset_index(spark, tmp_path):
    """ARC mirror of the cc-index pattern (VERDICT r2 #8): per-record byte
    offsets on plain files, per-member compressed offsets on gzipped ones
    — ranged reads recover exactly the records the scan sees."""
    import datetime as dt

    from pyspark.sql import functions as SF

    from warc_spark.kernels.arcrec import (
        make_filedesc_record,
        serialize_arc_record,
    )
    from warc_spark.kernels.gzipmember import compress_gzip_member
    from warc_spark.sources import (
        index_arc_records,
        read_arc,
        read_arc_records,
        write_arc,
    )

    date = dt.datetime(2026, 8, 1)
    rows = [
        {
            "url": "http://example.com/%d" % i,
            "ip_address": "127.0.0.1",
            "arc_date": date,
            "content_type": "text/html",
            "result_code": "200",
            "checksum": "-",
            "location": "-",
            "offset": "0",
            "arc_filename": "part.arc",
            "length": 9,
            "payload": b"payload %d" % i,
        }
        for i in range(10)
    ]
    expect = {(r["url"], r["payload"]) for r in rows}

    # ---- plain file: per-record byte offsets --------------------------
    out = str(tmp_path / "arcs")
    write_arc(
        spark.createDataFrame(rows).coalesce(1).orderBy("url"),
        out, version=2, date=date,
    ).collect()
    idx = index_arc_records(spark, os.path.join(out, "*.arc"))
    assert idx.count() == 10
    wanted = idx.filter(SF.col("record_index").isin(2, 5, 9)).drop("record_index")
    got = read_arc_records(spark, wanted).collect()
    assert len(got) == 3
    ref = {
        r.url: r
        for r in read_arc(spark, os.path.join(out, "*.arc")).collect()
        if r.record_index in (2, 5, 9)
    }
    assert {r.url for r in got} == set(ref)
    for r in got:
        e = ref[r.url]
        assert (bytes(r.payload), r.arc_version, r.content_type) == (
            bytes(e.payload), e.arc_version, e.content_type
        )

    # ---- member-per-record gzip (the IA convention) -------------------
    gz_path = str(tmp_path / "members.arc.gz")
    fd_fields, fd_payload = make_filedesc_record("members.arc.gz", 2, date=date)
    with open(gz_path, "wb") as f:
        f.write(
            compress_gzip_member(
                (serialize_arc_record(fd_fields, fd_payload, 2) + "\n").encode("latin-1")
            )
        )
        for r in rows:
            fields = {
                "url": r["url"], "ip_address": r["ip_address"],
                "date": "20260801000000", "content_type": r["content_type"],
                "length": str(len(r["payload"])), "result_code": "200",
                "checksum": "-", "location": "-", "offset": "0",
                "filename": r["arc_filename"],
            }
            f.write(
                compress_gzip_member(
                    (serialize_arc_record(fields, r["payload"].decode("latin-1"), 2)
                     + "\n").encode("latin-1")
                )
            )
    midx = index_arc_records(spark, gz_path)
    assert midx.count() == 10  # distinct member offsets, one record each
    assert midx.select("offset").distinct().count() == 10
    one = midx.filter(SF.col("record_index") == 4)
    got1 = read_arc_records(spark, one).collect()
    assert len(got1) == 1
    assert (got1[0].url, bytes(got1[0].payload)) == (
        rows[4]["url"], rows[4]["payload"]
    )

    # ---- whole-file gzip (write_arc compress=True): one member --------
    out_gz = str(tmp_path / "arcs_gz")
    write_arc(
        spark.createDataFrame(rows).coalesce(1),
        out_gz, version=2, date=date, compress=True,
    ).collect()
    gidx = index_arc_records(spark, os.path.join(out_gz, "*.arc.gz"))
    assert gidx.count() == 10
    # all 10 index rows address the SAME member; read_arc_records must
    # fetch the member once, not once per row (ADVICE r3: feeding the
    # index straight in used to return NxN duplicated records), and the
    # emitted record_index must stay the per-file ordinal
    gall = read_arc_records(spark, gidx).collect()
    assert len(gall) == 10
    assert {(r.url, bytes(r.payload)) for r in gall} == expect
    assert sorted(r.record_index for r in gall) == list(range(10))
    by_ordinal = {r.record_index: r.url for r in gall}
    ref_gz = {
        r.record_index: r.url
        for r in read_arc(spark, os.path.join(out_gz, "*.arc.gz")).collect()
    }
    assert by_ordinal == ref_gz


def test_pages_from_records_feeds_frontier(spark, tmp_path):
    """The ingest bridge end to end: synthetic pages -> WARC files on disk
    -> scanned back -> pages table -> a frontier crawl whose scheduling is
    IDENTICAL to crawling the original pages table."""
    from warc_spark.operators.frontier import FrontierConfig, FrontierEngine
    from warc_spark.plans.snapstore import SnapStore
    from warc_spark.sources.pages import pages_from_records, synth_seeds

    orig = synth_pages(spark, 300, seed=42, n_hosts=6)
    wdir = str(tmp_path / "warcs")
    write_warc(
        parse_warc_column(orig, "html", keep=[]).select(
            "header_names", "headers", "payload"
        ),
        wdir,
        compress=True,
    ).collect()
    back = pages_from_records(read_warc(spark, os.path.join(wdir, "*.warc.gz")))
    # the rebuilt pages table equals the original on every column
    a = orig.orderBy("url").collect()
    b = back.orderBy("url").collect()
    assert len(a) == len(b) == 300
    for ra, rb in zip(a, b):
        assert (ra.url, bytes(ra.html), ra.text) == (rb.url, bytes(rb.html), rb.text)
        assert ra.warc_ts == rb.warc_ts
    seeds = synth_seeds(spark, 300, n_seeds=8, seed=42, n_hosts=6)
    cfg = FrontierConfig(max_batches=2, default_budget=4)
    s1, s2 = SnapStore(str(tmp_path / "s1")), SnapStore(str(tmp_path / "s2"))
    FrontierEngine(spark, orig, s1, config=cfg).run(seeds)
    FrontierEngine(spark, back, s2, config=cfg).run(seeds)
    for k in range(2):
        x = [(r.url, r.priority) for r in s1.read_df(spark, k, "scheduled").orderBy("url").collect()]
        y = [(r.url, r.priority) for r in s2.read_df(spark, k, "scheduled").orderBy("url").collect()]
        assert x == y


def test_real_html_warc_roundtrip_feeds_frontier(spark, tmp_path):
    """VERDICT r2 #1 done-criterion: a fixture WARC with real-world-shaped
    HTML (nested tags, script/style payloads, comments, entities, relative
    hrefs, <base>) round-trips through pages_from_records(extractor='html')
    -> FrontierEngine(extractor='html') with correct tag-stripped text and
    RESOLVED links."""
    from warc_spark.kernels.gzipmember import compress_gzip_member
    from warc_spark.kernels.warcrec import serialize_warc_record
    from warc_spark.operators.frontier import FrontierConfig, FrontierEngine
    from warc_spark.plans.snapstore import SnapStore
    from warc_spark.sources.pages import pages_from_records

    site = "http://site.example.com"
    pages = {
        f"{site}/a/index.html": (
            '<html><head><title>Index</title><style>a {color: blue}</style>'
            '<script>var h = "<a href=\'dead.html\'>x</a>";</script></head>'
            "<body><!-- menu -->"
            "<div><p>Welcome &amp; enjoy &#8212; caf&eacute;!</p></div>"
            '<a href="b.html">b</a><a href="../c.html">c</a>'
            '<a href="/d.html">d</a><a href="e.html?x=1&amp;y=2">e</a>'
            '<a href="#top">t</a><a href="javascript:void(0)">j</a>'
            '<a href="http://other.example.org/abs.html">o</a></body></html>'
        ),
        f"{site}/a/b.html": (
            f'<html><head><base href="{site}/z/"></head>'
            '<body><p>Beta page</p><a href="f.html">f</a></body></html>'
        ),
        f"{site}/c.html": "<html><body><p>Gamma</p></body></html>",
        f"{site}/z/f.html": "<html><body><p>Final leaf</p></body></html>",
    }
    expect_text = {
        f"{site}/a/index.html": "Index\nWelcome & enjoy — café!\nbcdetjo",
        f"{site}/a/b.html": "Beta page\nf",
        f"{site}/c.html": "Gamma",
        f"{site}/z/f.html": "Final leaf",
    }
    index_links = {
        f"{site}/a/b.html",
        f"{site}/c.html",
        f"{site}/d.html",
        f"{site}/a/e.html?x=1&y=2",
        "http://other.example.org/abs.html",
    }
    wpath = str(tmp_path / "real.warc.gz")
    with open(wpath, "wb") as f:
        for i, (url, body) in enumerate(pages.items()):
            http = (
                "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                "Content-Length: %d\r\n\r\n%s" % (len(body), body)
            )
            headers = [
                ("WARC-Type", "response"),
                ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-%012d>" % i),
                ("WARC-Date", "2026-08-01T00:00:00Z"),
                ("WARC-Target-URI", url),
                ("Content-Type", "application/http; msgtype=response"),
                ("Content-Length", str(len(http))),
            ]
            f.write(
                compress_gzip_member(
                    serialize_warc_record(headers, http.encode("latin-1"))
                )
            )

    corpus = pages_from_records(
        read_warc(spark, wpath), extractor="html"
    )
    got_text = {r.url: r.text for r in corpus.collect()}
    assert got_text == expect_text

    store = SnapStore(str(tmp_path / "snap"))
    eng = FrontierEngine(
        spark, corpus, store,
        config=FrontierConfig(extractor="html", max_batches=4, default_budget=10),
    )
    seeds = spark.createDataFrame(
        [(f"{site}/a/index.html", 1.0)], "url string, priority double"
    )
    manifests = eng.run(seeds)
    assert len(manifests) == 3  # index -> its links -> f.html
    b0 = store.read_df(spark, 0, "scheduled").collect()
    assert [r.url for r in b0] == [f"{site}/a/index.html"]
    assert b0[0].text_extracted == expect_text[f"{site}/a/index.html"]
    b1 = {r.url: r for r in store.read_df(spark, 1, "scheduled").collect()}
    assert set(b1) == index_links  # fragments/javascript skipped, hrefs resolved
    assert b1[f"{site}/a/b.html"].status == "found"
    assert b1[f"{site}/c.html"].status == "found"
    assert b1[f"{site}/d.html"].status == "missing"
    assert b1[f"{site}/a/e.html?x=1&y=2"].status == "missing"
    assert b1[f"{site}/c.html"].text_extracted == "Gamma"
    b2 = [r for r in store.read_df(spark, 2, "scheduled").collect()]
    # b.html's relative link resolved against its <base>, not its url
    assert [r.url for r in b2] == [f"{site}/z/f.html"]
    assert b2[0].status == "found"
    assert b2[0].text_extracted == "Final leaf"


def test_parse_sitemap_entries(spark):
    """JVM sitemap parser: per-entry hints, entity decode, index rows,
    passthrough keep columns — and a map-only, Python-free plan."""
    import io
    import re
    from contextlib import redirect_stdout

    from warc_spark.sources.pages import parse_sitemap_entries

    body = """<?xml version="1.0"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>http://h.example.org/a?x=1&amp;y=&quot;2&quot;</loc>
           <lastmod>2026-01-05</lastmod>
           <changefreq>daily</changefreq>
           <priority>0.8</priority></url>
      <url><loc> http://h.example.org/b </loc></url>
      <url><lastmod>2026-01-06</lastmod></url>
    </urlset>"""
    idx = """<sitemapindex>
      <sitemap><loc>http://h.example.org/s1.xml</loc>
               <lastmod>2026-02-01</lastmod></sitemap>
    </sitemapindex>"""
    df = spark.createDataFrame(
        [("sm0", body), ("sm1", idx), ("sm2", None)], "src string, body string"
    )
    ent = parse_sitemap_entries(df, keep=("src",))
    rows = {r.loc: r for r in ent.collect()}
    # the loc-less <url> block and the null body drop out
    assert set(rows) == {
        'http://h.example.org/a?x=1&y="2"',
        "http://h.example.org/b",
        "http://h.example.org/s1.xml",
    }
    a = rows['http://h.example.org/a?x=1&y="2"']
    assert (a.src, a.lastmod, a.changefreq, a.priority, a.is_index) == (
        "sm0", "2026-01-05", "daily", 0.8, False,
    )
    b = rows["http://h.example.org/b"]
    assert (b.lastmod, b.changefreq, b.priority, b.is_index) == (
        None, None, None, False,
    )
    s1 = rows["http://h.example.org/s1.xml"]
    assert (s1.src, s1.lastmod, s1.is_index) == ("sm1", "2026-02-01", True)

    buf = io.StringIO()
    with redirect_stdout(buf):
        ent.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert not re.findall(r"\(\d+\) Exchange", plan)  # map-only


def test_parse_sitemap_entries_gzip(spark):
    """binary=True gunzips .xml.gz blobs; plain and corrupt blobs pass
    through the lax fallback."""
    import gzip

    from warc_spark.sources.pages import parse_sitemap_entries

    xml = "<urlset><url><loc>http://h.example.org/gz</loc></url></urlset>"
    plain = "<urlset><url><loc>http://h.example.org/plain</loc></url></urlset>"
    df = spark.createDataFrame(
        [
            (bytearray(gzip.compress(xml.encode())),),
            (bytearray(plain.encode()),),
            (bytearray(b"\x1f\x8b\x00truncated"),),  # lax: raw fallback
            # valid 10-byte gzip header, corrupt DEFLATE body: raises
            # zlib.error (not an OSError) — must also fall back, not
            # kill the task
            (bytearray(b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03garbage"),),
            (None,),
        ],
        "body binary",
    )
    locs = {r.loc for r in parse_sitemap_entries(df, binary=True).collect()}
    assert locs == {"http://h.example.org/gz", "http://h.example.org/plain"}


def test_seeds_from_sitemaps(spark):
    from warc_spark.sources.pages import seeds_from_sitemaps

    urlset = """<?xml version="1.0"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>http://h0.example.org/a</loc><priority>0.9</priority></url>
      <url><loc> http://h0.example.org/b?x=1&amp;y=2 </loc></url>
      <url><loc>http://h0.example.org/a</loc><priority>0.3</priority></url>
    </urlset>"""
    index = """<sitemapindex>
      <sitemap><loc>http://h0.example.org/sitemap2.xml</loc></sitemap>
    </sitemapindex>"""
    seeds = seeds_from_sitemaps(
        spark.createDataFrame([(urlset,), (index,), (None,)], "body string"),
        default_priority=0.5,
    )
    got = {r.url: r.priority for r in seeds.collect()}
    assert got == {
        "http://h0.example.org/a": 0.9,            # duplicate max-merged
        "http://h0.example.org/b?x=1&y=2": 0.5,    # entity unescaped, default pri
        "http://h0.example.org/sitemap2.xml": None, # index row to expand
    }
    # feeds the frontier seed path directly (url + priority columns)
    assert set(seeds.columns) == {"url", "priority"}


def test_read_warc11_lax_with_fractional_date(spark, tmp_path):
    """WARC/1.1 segments (fractional-second WARC-Date, ISO revision) parse
    in the default lax scan: no error rows, version column carries 1.1,
    and the date lands on the general ISO-8601 parse path."""
    rec = (
        b"WARC/1.1\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Date: 2026-08-02T10:20:30.123456Z\r\n"
        b"WARC-Target-URI: http://v11.example/a\r\n"
        b"Content-Length: 5\r\n"
        b"\r\nhello\r\n\r\n"
    )
    p = str(tmp_path / "v11.warc")
    with open(p, "wb") as f:
        f.write(rec)
    rows = read_warc(spark, p).collect()
    assert len(rows) == 1 and rows[0].error is None
    assert rows[0].version == "1.1"
    assert rows[0].warc_date.microsecond == 123456
    assert rows[0].payload == b"hello"

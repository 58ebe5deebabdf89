"""HTTP response payload split (kernels/httpresp + sources.split_http_payload):
status line / header block / body promoted to columns, pass-through for
non-HTTP payloads, and the status-filtered pages bridge
(pages_from_records(require_status=200)) — VERDICT r3 missing #3."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from warc_spark.kernels.httpresp import parse_http_response, split_http_payload_kernel
from warc_spark.sources import read_warc, split_http_payload, write_warc


# ---------------------------------------------------------------- kernel


def test_parse_basic_response():
    body = b"<html><body>hi</body></html>"
    p = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n"
        b"Content-Length: 28\r\n\r\n" + body
    )
    out = parse_http_response(p)
    assert out["http_status"] == 200
    assert out["http_reason"] == "OK"
    assert out["http_content_type"] == "text/html"
    assert out["http_headers"]["content-type"] == "text/html; charset=UTF-8"
    assert out["http_header_names"] == ["Content-Type", "Content-Length"]
    assert out["http_body"] == body


def test_parse_body_bytes_exact_even_with_embedded_framing():
    # only the FIRST \r\n\r\n ends the header block; body bytes opaque
    body = b"\x00\x01\r\n\r\nbinary tail\xff"
    p = b"HTTP/1.0 206 Partial Content\r\nX: y\r\n\r\n" + body
    out = parse_http_response(p)
    assert out["http_status"] == 206
    assert out["http_reason"] == "Partial Content"
    assert out["http_body"] == body


def test_parse_lax_lf_framing():
    p = b"HTTP/1.1 301 Moved Permanently\nLocation: /new\n\ngone"
    out = parse_http_response(p)
    assert out["http_status"] == 301
    assert out["http_headers"]["location"] == "/new"
    assert out["http_body"] == b"gone"


def test_parse_headers_only_capture():
    p = b"HTTP/1.1 304 Not Modified\r\nETag: \"abc\""
    out = parse_http_response(p)
    assert out["http_status"] == 304
    assert out["http_headers"]["etag"] == '"abc"'
    assert out["http_body"] is None


def test_parse_duplicate_headers_comma_joined_rfc9110():
    p = (
        b"HTTP/1.1 200 OK\r\nSet-Cookie: a=1\r\nset-cookie: b=2\r\n"
        b"Via: x\r\n\r\n"
    )
    out = parse_http_response(p)
    assert out["http_headers"]["set-cookie"] == "a=1, b=2"
    # original spelling recorded once, wire order kept
    assert out["http_header_names"] == ["Set-Cookie", "Via"]


def test_parse_obs_fold_continuation():
    p = b"HTTP/1.1 200 OK\r\nX-Long: part one\r\n  part two\r\n\r\nb"
    out = parse_http_response(p)
    assert out["http_headers"]["x-long"] == "part one part two"


def test_parse_reason_missing_and_status_no_reason():
    out = parse_http_response(b"HTTP/1.1 204\r\n\r\n")
    assert out["http_status"] == 204
    assert out["http_reason"] == ""
    assert out["http_body"] == b""


def test_parse_non_http_passthrough():
    for p in (b"GET / HTTP/1.1\r\nHost: x\r\n\r\n", b"\x89PNG\r\n\x1a\n", b""):
        out = parse_http_response(p)
        assert out["http_status"] is None
        assert out["http_headers"] is None
        assert out["http_body"] == p


def test_parse_malformed_status_passthrough():
    p = b"HTTP/garbage nope\r\n\r\nbody"
    out = parse_http_response(p)
    assert out["http_status"] is None
    assert out["http_body"] == p


def test_parse_none_payload():
    out = parse_http_response(None)
    assert all(v is None for v in out.values())


def test_kernel_batch_mixed():
    s = pd.Series(
        [
            b"HTTP/1.1 200 OK\r\nContent-Type: TEXT/HTML\r\n\r\nA",
            b"not http",
            None,
        ]
    )
    df = split_http_payload_kernel(s)
    assert df["http_status"][0] == 200 and df["http_status"].isna().tolist() == [
        False,
        True,
        True,
    ]
    assert df["http_content_type"][0] == "text/html"  # lowercased media type
    assert df["http_body"][0] == b"A"
    assert df["http_body"][1] == b"not http"
    assert df["http_body"][2] is None


# ---------------------------------------------------------------- Spark


@pytest.fixture(scope="module")
def http_warc(tmp_path_factory, spark):
    """A real-shaped WARC: 200 HTML, 404, 301, and a non-HTTP resource
    record, written through the engine's own sink."""
    from warc_spark.kernels.gzipmember import compress_gzip_member
    from warc_spark.kernels.warcrec import serialize_warc_record

    d = tmp_path_factory.mktemp("httpwarc")
    path = str(d / "mixed.warc.gz")
    recs = [
        (
            "http://a.example.com/ok",
            "response",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Server: nginx\r\n\r\n<html><body><p>hello</p></body></html>",
        ),
        (
            "http://a.example.com/gone",
            "response",
            b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n"
            b"<html><body>404</body></html>",
        ),
        (
            "http://a.example.com/moved",
            "response",
            b"HTTP/1.1 301 Moved Permanently\r\nLocation: http://b.example.com/\r\n"
            b"Content-Type: text/html\r\n\r\n<html>moved</html>",
        ),
        ("http://a.example.com/blob", "resource", b"\x89PNG raw bytes no http"),
    ]
    with open(path, "wb") as f:
        for i, (url, wtype, payload) in enumerate(recs):
            headers = [
                ("WARC-Type", wtype),
                ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-%012d>" % i),
                ("WARC-Date", "2026-08-01T00:00:00Z"),
                ("WARC-Target-URI", url),
                ("Content-Type", "application/http; msgtype=response"),
                ("Content-Length", str(len(payload))),
            ]
            f.write(compress_gzip_member(serialize_warc_record(headers, payload)))
    return path


def test_split_http_payload_columns(spark, http_warc):
    df = split_http_payload(read_warc(spark, http_warc))
    rows = {r.target_uri: r for r in df.collect()}
    ok = rows["http://a.example.com/ok"]
    assert ok.http_status == 200 and ok.http_reason == "OK"
    assert ok.http_content_type == "text/html"
    assert ok.http_headers["server"] == "nginx"
    assert ok.http_header_names == ["Content-Type", "Server"]
    assert bytes(ok.http_body) == b"<html><body><p>hello</p></body></html>"
    assert rows["http://a.example.com/gone"].http_status == 404
    moved = rows["http://a.example.com/moved"]
    assert moved.http_status == 301
    assert moved.http_headers["location"] == "http://b.example.com/"
    blob = rows["http://a.example.com/blob"]
    assert blob.http_status is None  # pass-through contract
    assert bytes(blob.http_body) == b"\x89PNG raw bytes no http"
    # original payload retained by default ...
    assert bytes(ok.payload).startswith(b"HTTP/1.1 200 OK")
    # ... and dropped on request (scale hygiene: one blob column, not two)
    slim = split_http_payload(read_warc(spark, http_warc), drop_payload=True)
    assert "payload" not in slim.columns
    assert "http_body" in slim.columns


def test_split_is_single_arrow_pass(spark, http_warc):
    # one projection over the scan: no shuffle, no join introduced
    plan = split_http_payload(
        read_warc(spark, http_warc)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pages_from_records_require_status(spark, http_warc):
    from warc_spark.sources.pages import pages_from_records

    recs = read_warc(spark, http_warc)
    pages = pages_from_records(recs, extractor="html", require_status=200)
    rows = pages.collect()
    # 404/301/resource records are filtered; only the 200 survives
    assert [r.url for r in rows] == ["http://a.example.com/ok"]
    assert rows[0].text == "hello"
    # html column stays the byte-exact wire record (round-trip invariant)
    assert bytes(rows[0].html).startswith(b"WARC/1.0\r\n")
    # without the filter every response record becomes a page
    allpages = pages_from_records(recs, extractor="html")
    assert {r.url for r in allpages.collect()} == {
        "http://a.example.com/ok",
        "http://a.example.com/gone",
        "http://a.example.com/moved",
    }


def test_require_status_synthetic_extractor_matches_unfiltered(spark, tmp_path):
    """For an all-200 synthetic corpus the status filter must be a no-op:
    same pages, same text, via the body-split path instead of the
    payload-split path."""
    from warc_spark.sources import parse_warc_column, synth_pages
    from warc_spark.sources.pages import pages_from_records

    orig = synth_pages(spark, 60, seed=7, n_hosts=4)
    wdir = str(tmp_path / "w")
    write_warc(
        parse_warc_column(orig, "html", keep=[]).select(
            "header_names", "headers", "payload"
        ),
        wdir,
        compress=True,
    ).collect()
    recs = read_warc(spark, os.path.join(wdir, "*.warc.gz"))
    a = pages_from_records(recs).orderBy("url").collect()
    b = pages_from_records(recs, require_status=200).orderBy("url").collect()
    assert len(a) == len(b) == 60
    for ra, rb in zip(a, b):
        assert (ra.url, ra.text, bytes(ra.html)) == (rb.url, rb.text, bytes(rb.html))


# ------------------------------------------------- wire-encoding decode


class TestBodyDecode:
    """Transfer-Encoding: chunked + Content-Encoding: gzip/deflate reversal
    (split_http_payload(decode_body=True))."""

    def test_dechunk_golden(self):
        from warc_spark.kernels.httpresp import dechunk

        assert dechunk(b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n") == b"hello world"
        # chunk extension + lax LF framing + trailers ignored
        assert dechunk(b"3;x=y\r\nabc\r\n0\r\nTrailer: t\r\n\r\n") == b"abc"
        assert dechunk(b"2\nhi\n0\n\n") == b"hi"
        assert dechunk(b"0\r\n\r\n") == b""

    def test_dechunk_malformed_raises(self):
        import pytest as _pytest

        from warc_spark.kernels.httpresp import dechunk

        for bad in (b"zz\r\nabc\r\n0\r\n\r\n", b"5\r\nab", b"3\r\nabcX0\r\n\r\n", b"5"):
            with _pytest.raises(ValueError):
                dechunk(bad)

    def test_decode_body_layers(self):
        import gzip
        import zlib

        from warc_spark.kernels.httpresp import decode_body

        raw = b"the decoded content"
        assert decode_body(raw, None, None) == (raw, True)
        chunked = b"13\r\n" + raw + b"\r\n0\r\n\r\n"
        assert decode_body(chunked, "chunked", None) == (raw, True)
        assert decode_body(gzip.compress(raw, mtime=0), None, "gzip") == (raw, True)
        assert decode_body(zlib.compress(raw), None, "deflate") == (raw, True)
        # raw-deflate quirk (no zlib wrapper)
        co = zlib.compressobj(wbits=-15)
        rawdef = co.compress(raw) + co.flush()
        assert decode_body(rawdef, None, "deflate") == (raw, True)
        both = b"%x\r\n" % len(gzip.compress(raw, mtime=0)) + gzip.compress(
            raw, mtime=0
        ) + b"\r\n0\r\n\r\n"
        assert decode_body(both, "chunked", "gzip") == (raw, True)

    def test_decode_body_multi_layer_ce(self):
        """Every comma-separated coding is reversed right-to-left (ADVICE
        r4): a trailing identity is a no-op layer, double-gzip gunzips
        twice, and an unreversible OUTER coding stops the walk with
        applied=False even when an inner coding is decodable."""
        import gzip

        from warc_spark.kernels.httpresp import decode_body

        raw = b"the decoded content"
        gz = gzip.compress(raw, mtime=0)
        assert decode_body(gz, None, "gzip, identity") == (raw, True)
        assert decode_body(gz, None, "identity, gzip") == (raw, True)
        assert decode_body(gzip.compress(gz, mtime=0), None, "gzip, gzip") == (raw, True)
        assert decode_body(gzip.compress(gz, mtime=0), None, "gzip , x-gzip") == (raw, True)
        # outer br undecodable: bytes untouched, False — never feed the
        # inner gzip decoder bytes still wrapped in br
        assert decode_body(gz, None, "gzip, br") == (gz, False)
        # inner br under a decodable outer gzip: outer reversed, then stop
        assert decode_body(gzip.compress(raw, mtime=0), None, "br, gzip") == (raw, False)

    def test_decode_body_lenient_on_lies(self):
        from warc_spark.kernels.httpresp import decode_body

        raw = b"not actually gzip"
        assert decode_body(raw, None, "gzip") == (raw, False)
        assert decode_body(raw, "chunked", None) == (raw, False)
        # undecodable coding: bytes untouched, flag False
        assert decode_body(raw, None, "br") == (raw, False)
        assert decode_body(None, "chunked", "gzip") == (None, False)

    def test_split_decode_spark(self, spark):
        import gzip

        from pyspark.sql import functions as F

        gz = gzip.compress(b"<html>page</html>", mtime=0)
        payloads = [
            (
                1,
                b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
                b"Transfer-Encoding: chunked\r\nContent-Type: text/html\r\n\r\n"
                + b"%x\r\n" % len(gz) + gz + b"\r\n0\r\n\r\n",
            ),
            (2, b"HTTP/1.1 200 OK\r\n\r\nplain body"),
            (3, b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip"),
            (4, b"not http at all"),
        ]
        df = spark.createDataFrame(payloads, "id long, payload binary")
        got = {
            r.id: r
            for r in split_http_payload(df, decode_body=True).collect()
        }
        assert bytes(got[1].http_body) == b"<html>page</html>"
        assert got[1].http_body_decoded is True
        assert bytes(got[2].http_body) == b"plain body"
        assert got[2].http_body_decoded is True
        assert bytes(got[3].http_body) == b"not-gzip"  # lie kept raw
        assert got[3].http_body_decoded is False
        assert got[4].http_status is None
        assert got[4].http_body_decoded is False
        # without the flag the schema stays the six-field contract
        assert "http_body_decoded" not in split_http_payload(df).columns

"""Golden tests for the ARC kernel, mirroring the reference suite
(/root/reference/warc/tests/test_arc.py, test_common.py) with the golden
strings hard-coded."""

import datetime
import gzip
import os

import pytest

from warc_spark.kernels.arcrec import (
    ARCRecord,
    arc_record_from_string,
    format_arc_date,
    parse_arc_file,
    parse_arc_header_line,
    serialize_arc_file,
    serialize_arc_header,
    serialize_arc_record,
)

FIELDS = dict(
    url="http://archive.org",
    ip_address="127.0.0.1",
    date="20120301093000",
    content_type="text/html",
    length="500",
    result_code="200",
    checksum="a123456",
    location="http://www.archive.org",
    offset="300",
    filename="sample.arc.gz",
)


def test_date_validation():
    # arc.py:47-53
    assert format_arc_date("20120301093000") == "20120301093000"
    assert format_arc_date(datetime.datetime(2012, 3, 2, 19, 32, 10)) == "20120302193210"
    with pytest.raises(ValueError):
        format_arc_date("not-a-date")


def test_typed_accessors():
    # reference test_arc.py:14-38
    rec = ARCRecord(fields={k: v for k, v in FIELDS.items()})
    assert rec["url"] == "http://archive.org"
    assert rec.date == datetime.datetime.strptime("20120301093000", "%Y%m%d%H%M%S")
    assert rec["date"] == "20120301093000"
    assert rec.length == 500
    assert rec["length"] == "500"
    assert rec.offset == 300
    assert rec["filename"] == "sample.arc.gz"


def test_v1_header_golden():
    # reference test_arc.py:40-56
    assert serialize_arc_header(FIELDS, 1) == (
        "http://archive.org 127.0.0.1 20120301093000 text/html 500"
    )


def test_v2_header_golden():
    # reference test_arc.py:59-74
    assert serialize_arc_header(FIELDS, 2) == (
        "http://archive.org 127.0.0.1 20120301093000 text/html 200 a123456 "
        "http://www.archive.org 300 sample.arc.gz 500"
    )


def test_v1_record_golden():
    # reference test_arc.py:77-93
    assert serialize_arc_record(FIELDS, "BlahBlah", 1) == (
        "http://archive.org 127.0.0.1 20120301093000 text/html 500\nBlahBlah\n"
    )


def test_v2_record_golden():
    # reference test_arc.py:95-111
    assert serialize_arc_record(FIELDS, "BlahBlah", 2) == (
        "http://archive.org 127.0.0.1 20120301093000 text/html 200 a123456 "
        "http://www.archive.org 300 sample.arc.gz 500\nBlahBlah\n"
    )


def test_v1_file_golden():
    # reference test_arc.py:113-133 (org given)
    now = "20120302193210"
    records = []
    for payload in "Payload1 Payload2".split():
        records.append((
            dict(url="http://www.archive.org", ip_address="127.0.0.1",
                 date=now, content_type="text/html", length=str(len(payload))),
            payload,
        ))
    out = serialize_arc_file(records, "sample.arc", version=1,
                             org="Internet Archive", ip_address="127.0.0.1", date=now)
    assert out == (
        "filedesc://sample.arc 127.0.0.1 20120302193210 text/plain 76\n"
        "1 0 Internet Archive\n"
        "URL IP-address Archive-date Content-type Archive-length\n\n"
        "http://www.archive.org 127.0.0.1 20120302193210 text/html 8\nPayload1\n\n"
        "http://www.archive.org 127.0.0.1 20120302193210 text/html 8\nPayload2\n\n"
    )


def test_v1_file_default_org_golden():
    # reference test_arc.py:136-156 (defaults: org Unknown)
    now = datetime.datetime(2012, 3, 2, 19, 32, 10)
    records = []
    for payload in "Payload1 Payload2".split():
        records.append((
            dict(url="http://www.archive.org", ip_address="127.0.0.1",
                 date=now, content_type="text/html", length=str(len(payload))),
            payload,
        ))
    out = serialize_arc_file(records, "sample.arc", version=1, date=now)
    assert out == (
        "filedesc://sample.arc 127.0.0.1 20120302193210 text/plain 67\n"
        "1 0 Unknown\n"
        "URL IP-address Archive-date Content-type Archive-length\n\n"
        "http://www.archive.org 127.0.0.1 20120302193210 text/html 8\nPayload1\n\n"
        "http://www.archive.org 127.0.0.1 20120302193210 text/html 8\nPayload2\n\n"
    )


def test_v2_file_golden_length_quirk():
    # reference test_arc.py:159-183: v2 filedesc length counts the literal
    # "%(org)s" template -> 113 regardless of org name
    now = "20120302193210"
    records = [(dict(FIELDS), p) for p in ("Payload1", "Payload2")]
    out = serialize_arc_file(records, "sample.arc", version=2,
                             org="Internet Archive", ip_address="127.0.0.1", date=now)
    assert out == (
        "filedesc://sample.arc 127.0.0.1 20120302193210 text/plain 200 - - 0 "
        "sample.arc 113\n"
        "2 0 Internet Archive\n"
        "URL IP-address Archive-date Content-type Result-code Checksum "
        "Location Offset Filename Archive-length\n\n"
        "http://archive.org 127.0.0.1 20120301093000 text/html 200 a123456 "
        "http://www.archive.org 300 sample.arc.gz 500\nPayload1\n\n"
        "http://archive.org 127.0.0.1 20120301093000 text/html 200 a123456 "
        "http://www.archive.org 300 sample.arc.gz 500\nPayload2\n\n"
    )


def test_version_autodetect():
    # reference test_arc.py:185-196
    v1 = ("filedesc://sample.arc 127.0.0.1 20120302193210 text/plain 68\n"
          "1 0 Unknown\nURL IP-address Archive-date Content-type Archive-length\n\n\n"
          "http://www.archive.org 127.0.0.1 20120302193210 text/html 8\n\nPayload1\n"
          "http://archive.org 127.0.0.1 20120302193211 text/plain 8\n\nPayload2")
    v2 = ("filedesc://sample.arc 127.0.0.1 20120302193210 text/plain 200 - - 0 sample.arc 114\n"
          "2 0 Internet Archive\nURL IP-address Archive-date Content-type Result-code "
          "Checksum Location Offset Filename Archive-length\n\n\n"
          "http://archive.org 127.0.0.1 20120301093000 text/html 200 a123456 "
          "http://www.archive.org 300 sample.arc.gz 500\n\nPayload1")
    assert next(parse_arc_file(v1)) == 1
    assert next(parse_arc_file(v2)) == 2
    with pytest.raises(IOError):
        list(parse_arc_file(v1, version=2))


def test_reader_v1_records():
    # reference test_arc.py:216-236
    v1 = ("filedesc://sample.arc 127.0.0.1 20120302193210 text/plain 68\n"
          "1 0 Unknown\nURL IP-address Archive-date Content-type Archive-length\n\n\n"
          "http://www.archive.org 127.0.0.1 20120302193210 text/html 8\nPayload1\n"
          "http://archive.org 127.0.0.1 20120302193211 text/plain 8\nPayload2")
    it = parse_arc_file(v1)
    assert next(it) == 1
    r1, r2 = list(it)
    assert r1["url"] == "http://www.archive.org"
    assert r1["ip_address"] == "127.0.0.1"
    assert r1["date"] == "20120302193210"
    assert r1["content_type"] == "text/html"
    assert r1["length"] == "8"
    assert r1.payload == "Payload1"
    assert r2["url"] == "http://archive.org"
    assert r2["content_type"] == "text/plain"
    assert r2.payload == "Payload2"


def test_reader_v2_records():
    # reference test_arc.py:239-257
    v2 = ("filedesc://sample.arc 127.0.0.1 20120302193210 text/plain 200 - - 0 sample.arc 114\n"
          "2 0 Internet Archive\nURL IP-address Archive-date Content-type Result-code "
          "Checksum Location Offset Filename Archive-length\n\n\n"
          "http://archive.org 127.0.0.1 20120301093000 text/html 200 a123456 "
          "http://www.archive.org 300 sample.arc.gz 8\nPayload1\n"
          "http://archive.org 127.0.0.1 20120301093000 text/html 200 a123456 "
          "http://www.archive.org 300 sample.arc.gz 8\nPayload2")
    it = parse_arc_file(v2)
    assert next(it) == 2
    r1, r2 = list(it)
    assert r1["checksum"] == "a123456"
    assert r1["location"] == "http://www.archive.org"
    assert r1["offset"] == "300"
    assert r1["filename"] == "sample.arc.gz"
    assert r1.payload == "Payload1"
    assert r2.payload == "Payload2"


def test_from_string_v1_v2():
    # reference test_arc.py:259-289
    r = arc_record_from_string(
        "http://www.archive.org 127.0.0.1 20120301093000 text/html 500\nBlahBlah", 1)
    assert r["url"] == "http://www.archive.org"
    assert r["length"] == "500"
    assert r.payload == "BlahBlah"
    r = arc_record_from_string(
        "http://archive.org 127.0.0.1 20120301093000 text/html 200 a123456 "
        "http://www.archive.org 300 sample.arc.gz 500\nBlahBlah", 2)
    assert r["checksum"] == "a123456"
    assert r["filename"] == "sample.arc.gz"
    assert r.payload == "BlahBlah"


def test_alexa_fixture_empty_content_type():
    # reference test_common.py:33-40: real-world ARC with an EMPTY
    # content_type field (two adjacent spaces) — \S* groups allow it
    path = "/root/reference/test_data/alexa_short_header.arc.gz"
    if not os.path.exists(path):
        pytest.skip("fixture not available")
    with gzip.open(path, "rb") as f:
        data = f.read().decode("latin-1")
    it = parse_arc_file(data)
    next(it)  # version
    rec = next(it)
    assert rec["content_type"] == ""
    assert rec["length"] == "39"

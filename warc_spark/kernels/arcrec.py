"""ARC v1/v2 record parse/serialize kernel (pure Python 3, str in/out).

Reimplements the reference's ARC semantics from observed behavior
(/root/reference/warc/arc.py). ARC is a line-oriented text container, so this
kernel works on ``str`` (callers decode with latin-1 to keep byte fidelity).

Semantics matched (with reference cites):

- header line schema: v1 = 5 whitespace-separated ``\\S*`` fields
  (url, ip_address, date, content_type, length); v2 adds
  (result_code, checksum, location, offset, filename) before length
  (arc.py:16-17). Fields may be empty strings — the regex groups are ``\\S*``
  (alexa_short_header.arc.gz has an empty content_type).
- record framing: header line + ``\\n`` + payload + ``\\n``; the file writer
  adds one more ``\\n`` separator between records (arc.py:181-193,305).
- file header: a ``filedesc://<name>`` record whose payload lists the field
  names; v1 length counts the *org-substituted* payload while v2 length counts
  the template with a literal ``%(org)s`` — a reference quirk we replicate
  exactly (arc.py:276-295; goldens test_arc.py:131,152,181).
- defaults on write: org="Unknown", ip="127.0.0.1", date=now (injectable
  here; the reference warns + uses utcnow, arc.py:265-273).
- version auto-detect from the file header's payload first token
  (arc.py:319-333).
- date wire format ``%Y%m%d%H%M%S`` with ValueError on unparseable
  (arc.py:47-53).
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass

ARC1_HEADER_RE = re.compile(
    r"(?P<url>\S*)\s(?P<ip_address>\S*)\s(?P<date>\S*)\s(?P<content_type>\S*)"
    r"\s(?P<length>\S*)"
)
ARC2_HEADER_RE = re.compile(
    r"(?P<url>\S*)\s(?P<ip_address>\S*)\s(?P<date>\S*)\s(?P<content_type>\S*)"
    r"\s(?P<result_code>\S*)\s(?P<checksum>\S*)\s(?P<location>\S*)"
    r"\s(?P<offset>\S*)\s(?P<filename>\S*)\s(?P<length>\S*)"
)

V1_FIELDS = ("url", "ip_address", "date", "content_type", "length")
V2_FIELDS = (
    "url", "ip_address", "date", "content_type", "result_code",
    "checksum", "location", "offset", "filename", "length",
)

V1_FIELD_NAMES = "URL IP-address Archive-date Content-type Archive-length"
V2_FIELD_NAMES = (
    "URL IP-address Archive-date Content-type Result-code Checksum "
    "Location Offset Filename Archive-length"
)


def format_arc_date(date: str | _dt.datetime) -> str:
    """Validate/format the 14-digit ARC date (arc.py:47-53)."""
    if isinstance(date, _dt.datetime):
        return date.strftime("%Y%m%d%H%M%S")
    try:
        _dt.datetime.strptime(date, "%Y%m%d%H%M%S")
    except ValueError:
        raise ValueError("Couldn't parse the date '%s' in file header" % date)
    return date


@dataclass
class ARCRecord:
    """header fields (lower-case keys, all str) + payload str."""

    fields: dict[str, str]
    payload: str = ""
    version: int = 2

    def __getitem__(self, name: str) -> str:
        return self.fields[name.lower()]

    def get(self, name: str, default: str | None = None) -> str | None:
        return self.fields.get(name.lower(), default)

    # typed accessors (arc.py:97-135)
    @property
    def date(self) -> _dt.datetime:
        return _dt.datetime.strptime(self.fields["date"], "%Y%m%d%H%M%S")

    @property
    def offset(self) -> int:
        return int(self.fields["offset"])

    @property
    def length(self) -> int:
        return int(self.fields["length"])


def _full_fields(fields: dict[str, str]) -> dict[str, str]:
    out = {k: "" for k in V2_FIELDS}
    for k, v in fields.items():
        out[k.lower()] = "" if v is None else str(v)
    if out["date"]:
        out["date"] = format_arc_date(fields.get("date", out["date"]))
    return out


def serialize_arc_header(fields: dict[str, str], version: int = 2) -> str:
    f = _full_fields(fields)
    names = V1_FIELDS if version == 1 else V2_FIELDS
    return " ".join(f[k] for k in names)


def serialize_arc_record(
    fields: dict[str, str], payload: str, version: int = 2
) -> str:
    """header line + \\n + payload + \\n (arc.py:181-193)."""
    return serialize_arc_header(fields, version) + "\n" + payload + "\n"


def parse_arc_header_line(line: str, version: int) -> dict[str, str]:
    rx = ARC1_HEADER_RE if int(version) == 1 else ARC2_HEADER_RE
    m = rx.search(line)
    if not m:
        raise IOError("Bad ARC v%s header line: %r" % (version, line[:120]))
    return m.groupdict()


def arc_record_from_string(string: str, version: int) -> ARCRecord:
    """Mirror of ARCRecord.from_string (arc.py:160-179): split on first
    newline, drop one extra leading newline from the payload if present."""
    header, payload = string.split("\n", 1)
    if payload[:1] == "\n":
        payload = payload[1:]
    fields = parse_arc_header_line(header, version)
    return ARCRecord(fields=fields, payload=payload, version=int(version))


def make_filedesc_record(
    filename: str,
    version: int,
    org: str = "Unknown",
    ip_address: str = "127.0.0.1",
    date: str | _dt.datetime | None = None,
    offset: int = 0,
) -> tuple[dict[str, str], str]:
    """Build the file-header record (arc.py:264-295), defaults injectable.

    Returns (fields, payload). Quirk replicated exactly: the v2 length counts
    the *unsubstituted* template (literal ``%(org)s``), v1 the substituted
    payload — validated by reference goldens (test_arc.py:131,152,181).
    """
    if date is None:
        raise ValueError("date must be injected (reference uses utcnow())")
    if version == 1:
        payload = "1 0 %s\n%s" % (org, V1_FIELD_NAMES)
        length = len(payload)
    elif version == 2:
        template = "2 0 %(org)s\n" + V2_FIELD_NAMES
        length = len(template)
        payload = template % {"org": org}
    else:
        raise IOError("Can't write an ARC file with version '\"%s\"'" % version)
    fields = {
        "url": "filedesc://%s" % filename,
        "ip_address": ip_address,
        "date": format_arc_date(date),
        "content_type": "text/plain",
        "length": str(length),
        "result_code": "200",
        "checksum": "-",
        "location": "-",
        "offset": str(offset),
        "filename": filename,
    }
    return fields, payload


def serialize_arc_file(
    records: list[tuple[dict[str, str], str]],
    filename: str,
    version: int = 2,
    org: str = "Unknown",
    ip_address: str = "127.0.0.1",
    date: str | _dt.datetime | None = None,
) -> str:
    """Whole-file serialization: filedesc header record then records, each
    followed by the ``\\n`` record separator (arc.py:296-305)."""
    fd_fields, fd_payload = make_filedesc_record(
        filename, version, org=org, ip_address=ip_address, date=date
    )
    out = [serialize_arc_record(fd_fields, fd_payload, version), "\n"]
    for fields, payload in records:
        out.append(serialize_arc_record(fields, payload, version))
        out.append("\n")
    return "".join(out)


def _readline_at(data: str, pos: int) -> tuple[str, int]:
    eol = data.find("\n", pos)
    if eol < 0:
        return data[pos:], len(data)
    return data[pos : eol + 1], eol + 1


def parse_arc_records_indexed(data: str, version: int, base_offset: int = 0):
    """Parse ARC records (NO file header expected) yielding
    ``(offset, length, ARCRecord)``: ``offset`` = byte position of the
    record's header line (+``base_offset``), ``length`` = header line +
    newline + payload — the span a ranged read needs to recover the record
    (the reference's v2 ``offset`` header-field semantics, arc.py:126-127,
    as REAL file geometry instead of a stringly field)."""
    ver = int(version)
    pos = 0
    while pos < len(data):
        line, pos2 = _readline_at(data, pos)
        while line and line.strip() == "":
            pos = pos2
            line, pos2 = _readline_at(data, pos)
        if line == "":
            return
        start = pos
        pos = pos2
        fields = parse_arc_header_line(line.rstrip("\n"), ver)
        length = int(fields["length"]) if fields["length"] else 0
        payload = data[pos : pos + length]
        pos += length
        yield start + base_offset, pos - start, ARCRecord(
            fields=fields, payload=payload, version=ver
        )
        _, pos = _readline_at(data, pos)  # munge the separator newline


def parse_arc_file_indexed(data: str, version: int | None = None):
    """Parse a whole ARC file; yields the version first (int), then
    ``(offset, length, ARCRecord)`` per record (see
    ``parse_arc_records_indexed``). Mirrors ARCFile._read_file_header +
    _read_arc_record (arc.py:307-372), including version auto-detection
    and blank-line skipping."""
    pos = 0
    header_line, pos = _readline_at(data, pos)
    payload1, pos = _readline_at(data, pos)
    _, pos = _readline_at(data, pos)  # field-names line
    ver_tok = payload1.split(None, 2)[0]
    _, pos = _readline_at(data, pos)  # separator newline
    if version is not None and int(version) != int(ver_tok):
        raise IOError(
            "Version mismatch. Requested version was '%s' but version in "
            "file was '%s'" % (version, ver_tok)
        )
    if ver_tok == "1":
        ver = 1
    elif ver_tok == "2":
        ver = 2
    else:
        raise IOError("Unknown ARC version '%s'" % ver_tok)
    # file header line itself parses with the detected version's schema
    parse_arc_header_line(header_line.rstrip("\n"), ver)
    yield ver
    yield from parse_arc_records_indexed(data[pos:], ver, base_offset=pos)


def parse_arc_file(data: str, version: int | None = None):
    """Parse a whole ARC file; yields the version first (int), then
    ``ARCRecord`` objects (thin wrapper over ``parse_arc_file_indexed``)."""
    it = parse_arc_file_indexed(data, version)
    yield next(it)
    for _, _, rec in it:
        yield rec

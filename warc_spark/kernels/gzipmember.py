"""Multi-member gzip kernel.

The reference stores one gzip member per WARC record so records are
independently decompressable (/root/reference/warc/gzip2.py:1-13,42-67;
warc/warc.py:269-272). That per-record member is the natural split unit for a
parallel scan — here we provide pure-Python member split/compress kernels used
by the vectorized ingest UDFs.

Member splitting uses ``zlib.decompressobj(wbits=31)`` + ``unused_data``
rather than scanning for the gzip magic bytes: magic scanning can false-match
inside compressed data, whereas the decompressor knows exact member
boundaries from the stream itself.
"""

from __future__ import annotations

import gzip
import zlib

GZIP_MAGIC = b"\x1f\x8b"


def iter_gzip_members(data: bytes):
    """Yield ``(offset, compressed_size, decompressed_bytes)`` per member.

    Offsets are in *compressed* space, matching the reference's
    ``WARCFile.browse()``/``tell()`` semantics (warc/warc.py:284-313).
    """
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != GZIP_MAGIC:
            raise OSError("Not a gzipped member at offset %d" % pos)
        d = zlib.decompressobj(wbits=31)
        payload = d.decompress(data[pos:]) + d.flush()
        consumed = (n - pos) - len(d.unused_data)
        yield pos, consumed, payload
        pos += consumed


def split_gzip_members(data: bytes) -> list[tuple[int, int, bytes]]:
    return list(iter_gzip_members(data))


def count_gzip_members(data: bytes) -> int:
    return sum(1 for _ in iter_gzip_members(data))


def compress_gzip_member(data: bytes, compresslevel: int = 9) -> bytes:
    """One deterministic gzip member (mtime pinned to 0 so output bytes are
    reproducible; the reference uses compresslevel 9, gzip2.py:17,54)."""
    return gzip.compress(data, compresslevel=compresslevel, mtime=0)


def compress_records_as_members(
    records: list[bytes], compresslevel: int = 9
) -> bytes:
    """Serialize a list of already-serialized records as a multi-member gzip
    file, one member per record (reference write path warc/warc.py:265-272)."""
    return b"".join(compress_gzip_member(r, compresslevel) for r in records)

"""Pure-Python (no Spark) kernels: WARC/ARC/gzip parse + serialize.

These are the batch-friendly scalar kernels that the vectorized Arrow UDFs in
``warc_spark.sources`` call per binary cell. They are independently unit-tested
against the reference's golden strings (see tests/test_kernels_*.py).
"""

from .warcrec import (  # noqa: F401
    WARCRecord,
    normalize_header_name,
    serialize_warc_record,
    parse_warc_stream,
    make_record,
    sha1_digest_hex,
    sha1_digest_base32,
)
from .arcrec import (  # noqa: F401
    ARCRecord,
    parse_arc_header_line,
    serialize_arc_record,
    serialize_arc_file,
    parse_arc_file,
)
from .gzipmember import (  # noqa: F401
    iter_gzip_members,
    split_gzip_members,
    compress_gzip_member,
    count_gzip_members,
)

from .warc_source import (  # noqa: F401
    WARC_RECORD_SCHEMA,
    read_warc,
    parse_warc_column,
    write_warc,
)
from .arc_source import ARC_RECORD_SCHEMA, read_arc  # noqa: F401
from .dispatch import open_archive  # noqa: F401
from .pages import synth_pages, extract_text_kernel, extract_links_kernel  # noqa: F401

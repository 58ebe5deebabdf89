from .stream import (  # noqa: F401
    stream_pages,
    streaming_parse_records,
    streaming_host_rollup,
    streaming_url_dedup,
    streaming_bloom_seen,
    run_available_now,
    run_available_now_to_dir,
)

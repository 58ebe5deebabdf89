"""Deterministic synthetic Common-Crawl-style pages table + extraction kernels.

Shape is the BASELINE.json:15 input_hint exactly:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
where ``html`` is a *full serialized WARC response record* (version line +
headers + HTTP response payload + CRLF CRLF footer, per
/root/reference/warc/warc.py:90-104,159-164) so the parse kernel is exercised
end-to-end, and ``text`` is the reference-extracted text for that html — the
byte-identity oracle column: ``extract_text_kernel(html) == text`` must hold
for every row.

Everything is derived from (seed, row-index) through a splitmix64-style mixer
— vectorized numpy, no RNG state, so generation is order- and
partition-independent (the same row id yields the same page at any
parallelism; required for the two-parallelism scaling proof and for exact
crawl-oracle replay). Hosts are Zipf-skewed (log-uniform rank) so politeness
and skew-handling paths are genuinely exercised; pages embed deterministic
``<a href>`` links to other pages, giving the frontier a crawlable graph.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

_LANGS = np.array(["en", "de", "fr", "es", "zh", "ru", "ja"])
_LANG_CDF = np.array([0.55, 0.67, 0.77, 0.85, 0.91, 0.96, 1.0])
_PHRASES = np.array(
    [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
        "sphinx of black quartz judge my vow",
        "crawling the open web requires politeness and patience",
        "distributed systems fail in correlated and amusing ways",
        "a bloom filter never forgets but sometimes imagines",
        "shuffle partitions should scale with the data not the cluster",
        "broadcast the small side and salt the hot keys",
        "columnar storage prunes what row stores must read",
        "adaptive execution replans when statistics disagree",
        "checkpoint early checkpoint often resume exactly",
        "robots dot txt is a promise not a firewall",
        "the frontier grows faster than any single queue",
        "deduplicate before you fetch not after you store",
        "latency hides in the tail of the slowest host",
    ]
)
_BASE_TS = np.datetime64("2026-08-01T00:00:00")
_MAX_LINKS = 8


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer — stateless per-index randomness (uint64
    wraparound is the point, so overflow warnings are suppressed)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(
            (salt * 0x9E3779B97F4A7C15) % (1 << 64)
        )
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray, salt: int) -> np.ndarray:
    return (_mix(x, salt) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _hosts(ids: np.ndarray, n_hosts: int, seed: int, hot_frac: float = 0.0) -> np.ndarray:
    # log-uniform rank -> Zipf-ish skew: rank 0 is the hottest host.
    # hot_frac > 0 pins that fraction of pages onto host 0 on top of the
    # natural skew (the skew-stress knob: e.g. 0.3 = one host holds 30%
    # of the corpus/frontier — bench_skew.py's north_star evidence).
    u = _u01(ids, seed + 1)
    rank = np.minimum(
        (np.exp(u * np.log(n_hosts)) - 1.0).astype(np.int64), n_hosts - 1
    )
    if hot_frac:
        rank = np.where(_u01(ids, seed + 8) < hot_frac, 0, rank)
    return rank


def _host_names(rank: np.ndarray) -> pd.Series:
    return "host" + pd.Series(rank).astype(str) + ".example.org"


def _urls_for(
    ids: np.ndarray, n_hosts: int, seed: int, hot_frac: float = 0.0
) -> pd.Series:
    host = _host_names(_hosts(ids, n_hosts, seed, hot_frac))
    return "http://" + host + "/page/" + pd.Series(ids).astype(str)


def _texts_for(ids: np.ndarray, seed: int) -> pd.Series:
    """Deterministic text: 4 phrase slots + a per-doc marker sentence.

    ~5%% of pages are exact duplicates of a nearby 'canonical' page (same
    text, different url) so dedup operators have real work.
    """
    base = ids - (ids % 17)
    is_dup = _u01(ids, seed + 2) < 0.05
    eff = np.where(is_dup, base, ids)
    parts = []
    for k in range(4):
        idx = (_mix(eff, seed + 10 + k) % np.uint64(len(_PHRASES))).astype(np.int64)
        parts.append(pd.Series(_PHRASES[idx]))
    marker = "document " + pd.Series(eff).astype(str) + " of the synthetic crawl."
    return parts[0] + ". " + parts[1] + ". " + parts[2] + ". " + parts[3] + ". " + marker


def _langs_for(ids: np.ndarray, seed: int) -> pd.Series:
    u = _u01(ids, seed + 3)
    idx = np.searchsorted(_LANG_CDF, u, side="right")
    return pd.Series(_LANGS[np.minimum(idx, len(_LANGS) - 1)])


def _links_for(
    ids: np.ndarray, n: int, n_hosts: int, seed: int, hot_frac: float = 0.0
) -> pd.Series:
    """Per-page anchor list (html string); targets are other page ids."""
    n_links = 2 + (_mix(ids, seed + 4) % np.uint64(_MAX_LINKS - 1)).astype(np.int64)
    out = pd.Series([""] * len(ids))
    for k in range(_MAX_LINKS):
        tgt = (_mix(ids, seed + 20 + k) % np.uint64(n)).astype(np.int64)
        anchor = '<a href="' + _urls_for(tgt, n_hosts, seed, hot_frac) + '">l</a>'
        out = out.where(~(k < n_links), out + anchor)
    return out


def _pseudo_uuid(ids: np.ndarray, seed: int) -> pd.Series:
    a = pd.Series(_mix(ids, seed + 5)).apply(lambda v: format(v, "016x"))
    b = pd.Series(_mix(ids, seed + 6)).apply(lambda v: format(v, "016x"))
    return (
        a.str[:8] + "-" + a.str[8:12] + "-" + a.str[12:16]
        + "-" + b.str[:4] + "-" + b.str[4:16]
    )


def gen_pages_pdf(
    ids: np.ndarray, n: int, n_hosts: int, seed: int, hot_frac: float = 0.0
) -> pd.DataFrame:
    """The generation kernel: page rows for the given ids (vectorized)."""
    ids = ids.astype(np.uint64)
    url = _urls_for(ids, n_hosts, seed, hot_frac)
    text = _texts_for(ids, seed)
    lang = _langs_for(ids, seed)
    links = _links_for(ids, n, n_hosts, seed, hot_frac)
    secs = (_mix(ids, seed + 7) % np.uint64(86400)).astype("timedelta64[s]")
    warc_ts = pd.Series((_BASE_TS + secs).astype("datetime64[ns]"))
    date_str = warc_ts.dt.strftime("%Y-%m-%dT%H:%M:%SZ")

    body = (
        "<html><head><title>page</title></head><body><p>" + text + "</p><ul>"
        + links + "</ul></body></html>"
    )
    http = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "
        + body.str.len().astype(str) + "\r\n\r\n" + body
    )
    record = (
        "WARC/1.0\r\n"
        + "WARC-Type: response\r\n"
        + "WARC-Record-ID: <urn:uuid:" + _pseudo_uuid(ids, seed) + ">\r\n"
        + "WARC-Date: " + date_str + "\r\n"
        + "WARC-Target-URI: " + url + "\r\n"
        + "Content-Type: application/http; msgtype=response\r\n"
        + "Content-Length: " + http.str.len().astype(str) + "\r\n"
        + "\r\n" + http + "\r\n\r\n"
    )
    html = record.map(lambda s: s.encode("latin-1"))
    return pd.DataFrame(
        {"url": url, "warc_ts": warc_ts, "html": html, "text": text, "lang": lang}
    )


def synth_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    n_hosts: int | None = None,
    partitions: int | None = None,
    hot_frac: float = 0.0,
) -> DataFrame:
    """Distributed deterministic pages table (map-only over spark.range).
    ``hot_frac`` pins that fraction of pages (and link targets) onto one
    host — the host-skew stress corpus."""
    n_hosts = n_hosts or max(8, n // 200)
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield gen_pages_pdf(pdf["id"].to_numpy(), n, n_hosts, seed, hot_frac)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, PAGES_SCHEMA)


# ---- extraction kernels (vectorized; the byte-identity invariant) ---------

_TEXT_RE = r"<p>(.*?)</p>"
_HREF_RE = r'href="([^"]+)"'


def _nullsafe(s: pd.Series) -> pd.Series:
    """Missing (NaN from object .str ops, pd.NA from string dtype) -> None,
    object dtype. pd.NA in particular breaks Spark's Arrow conversion for
    array<string> output columns ('NAType' object is not iterable), so every
    kernel result that crosses back to Spark goes through this."""
    return s.astype(object).where(s.notna(), None)


def extract_text_kernel(html: pd.Series) -> pd.Series:
    """html (WARC record bytes) -> extracted text. Byte-identical to the
    ``text`` column for generated pages (BASELINE.json per-row invariant).
    Null/unframed html yields null text (ADVICE r3, high)."""
    s = html.map(
        lambda b: bytes(b).decode("latin-1") if b is not None else None
    ).astype("string")
    body = s.str.split("\r\n\r\n", n=2).str[2]  # after WARC hdr + HTTP hdr
    return _nullsafe(body.str.extract(_TEXT_RE, expand=False))


def extract_links_kernel(html: pd.Series) -> pd.Series:
    """html -> list<string> of out-link urls."""
    s = html.map(
        lambda b: bytes(b).decode("latin-1") if b is not None else None
    ).astype("string")
    body = s.str.split("\r\n\r\n", n=2).str[2]
    return _nullsafe(body.str.findall(_HREF_RE))


def extract_page_kernel(html: pd.Series) -> pd.DataFrame:
    """html -> (links array<string>, text string) in ONE pass: the binary
    column crosses the Arrow boundary once instead of once per kernel —
    at 100 TB the html transfer dominates, so this halves the fetch-path
    Python I/O vs separate links/text UDFs. Null html (fetch miss) yields
    null links/text."""
    s = html.map(
        lambda b: bytes(b).decode("latin-1") if b is not None else None
    ).astype("string")
    body = s.str.split("\r\n\r\n", n=2).str[2]
    return pd.DataFrame(
        {
            "links": _nullsafe(body.str.findall(_HREF_RE)),
            "text": _nullsafe(body.str.extract(_TEXT_RE, expand=False)),
        }
    )


def extract_text_from_payload_kernel(payload: pd.Series) -> pd.Series:
    """Parsed-record payload (HTTP response bytes) -> extracted text.
    Same extraction as extract_text_kernel, one framing layer down."""
    s = payload.map(
        lambda b: bytes(b).decode("latin-1") if b is not None else None
    ).astype("string")
    body = s.str.split("\r\n\r\n", n=1).str[1]
    return _nullsafe(body.str.extract(_TEXT_RE, expand=False))


# ---- real-HTML extraction (kernels/htmlext; VERDICT r2 #1) ---------------

def extract_page_html_kernel(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """WARC record bytes + page url -> (links array<string>, text string)
    via the REAL-HTML kernel (kernels/htmlext): tag-aware text extraction
    and relative-href resolution against the record's target uri (+ any
    ``<base>``). Same one-Arrow-pass contract as extract_page_kernel —
    the binary column crosses the boundary once. Null html (fetch miss)
    yields null links/text."""
    from ..kernels.htmlext import extract_links, html_to_text, warc_record_bodies

    body = warc_record_bodies(html)
    links = [
        extract_links(b, u) if b is not None else None
        for b, u in zip(body, url)
    ]
    text = [html_to_text(b) for b in body]
    return pd.DataFrame({"links": links, "text": text})


def extract_text_from_body_kernel(body: pd.Series) -> pd.Series:
    """HTTP body bytes (already split from the response framing by
    kernels/httpresp) -> extracted text, synthetic-corpus grammar."""
    s = body.map(
        lambda b: bytes(b).decode("latin-1") if b is not None else None
    ).astype("string")
    return _nullsafe(s.str.extract(_TEXT_RE, expand=False))


def extract_text_html_from_body_kernel(
    body: pd.Series, content_type: pd.Series
) -> pd.Series:
    """HTTP body bytes + raw Content-Type header (charset param intact) ->
    text via the real-HTML kernel. The declared charset reaches the
    redecode step (VERDICT r3 #6) — the one place in the engine where the
    HTTP layer and the HTML layer genuinely need each other."""
    from ..kernels.htmlext import html_to_text, redecode_html

    vals = (
        bytes(b).decode("latin-1") if b is not None else None for b in body
    )
    return pd.Series(
        [
            html_to_text(redecode_html(v, ct if isinstance(ct, str) else None))
            if v is not None
            else None
            for v, ct in zip(vals, content_type)
        ],
        index=body.index,
    )


def extract_text_html_from_payload_kernel(payload: pd.Series) -> pd.Series:
    """Parsed-record payload (HTTP response bytes) -> real-HTML extracted
    text (kernels/htmlext.html_to_text), one framing layer down."""
    from ..kernels.htmlext import html_to_text, redecode_html

    s = payload.map(
        lambda b: bytes(b).decode("latin-1") if b is not None else None
    ).astype("string")
    body = s.str.split("\r\n\r\n", n=1).str[1]
    # NaN-normalize records missing the framing (ADVICE r3, high)
    return pd.Series(
        [
            html_to_text(redecode_html(b)) if isinstance(b, str) else None
            for b in body
        ],
        index=payload.index,
    )


def synth_seeds(
    spark: SparkSession, n_pages: int, n_seeds: int = 20, seed: int = 42,
    n_hosts: int | None = None, hot_frac: float = 0.0,
) -> DataFrame:
    """Distributed deterministic seed list (same rows the oracle simulator
    uses). Generated executor-side over ``spark.range`` — a driver-local
    relation would be re-shipped to every task on every recompute, which at
    a 10^10-URL frontier is exactly the wrong shape (real seed lists are a
    table, not driver memory)."""
    n_hosts_v = n_hosts or max(8, n_pages // 200)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                i = pdf["id"].to_numpy().astype(np.uint64)
                ids = i * np.uint64(7) % np.uint64(n_pages)
                yield pd.DataFrame(
                    {
                        "url": _urls_for(ids, n_hosts_v, seed, hot_frac),
                        "priority": 1.0 - (i.astype(np.int64) % 499) * 1e-3,
                    }
                )

    parts = max(1, min(spark.sparkContext.defaultParallelism, n_seeds // 500 + 1))
    df = spark.range(0, n_seeds, 1, parts).mapInPandas(
        gen, "url string, priority double"
    )
    # duplicate urls MAX-merge their priorities (the priority formula is
    # non-monotone in seed index, so this is not keep-first) — the same
    # max-merge the oracle simulator applies to its seed list
    from pyspark.sql import functions as F

    return df.groupBy("url").agg(F.max("priority").alias("priority"))


def pages_from_records(
    records: DataFrame,
    extractor: str = "synthetic",
    require_status: int | None = None,
) -> DataFrame:
    """WARC records table (``read_warc``/``read_warc_presplit`` output) ->
    the input_hint pages table (url, warc_ts, html, text, lang): response
    records re-serialized to their wire bytes (byte-identical — round-trip
    law in tests/test_kernels_warc.py), text extracted from the payload,
    lang identified heuristically. This is the ingest bridge: real WARC
    files in, the frontier's corpus out — one map-only Arrow pass, no
    shuffle.

    ``extractor``: ``"synthetic"`` keeps the corpus-shape kernel (the
    byte-identity oracle for generated corpora); ``"html"`` uses the
    REAL-HTML kernel (kernels/htmlext — tag stripping, entity decode,
    whitespace normalization) — what a real Common-Crawl segment needs.

    ``require_status``: when set (typically 200), the payload is split into
    HTTP status/headers/body first (sources.warc_source.split_http_payload)
    and only responses with that status survive — the standard first filter
    of a real crawl corpus. Text then extracts straight from the HTTP body
    (no second framing split); the ``html`` column stays the byte-exact
    wire record either way."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from ..functions.text import lang_id_udf
    from ..kernels.warcrec import serialize_warc_record

    def reserialize(names: pd.Series, hmaps: pd.Series, payloads: pd.Series) -> pd.Series:
        out = []
        for ns, hm, pl in zip(names, hmaps, payloads):
            headers = [(n, hm[n.lower()]) for n in ns]
            out.append(serialize_warc_record(headers, bytes(pl or b"")))
        return pd.Series(out)

    reser_udf = F.pandas_udf(reserialize, BinaryType())
    from pyspark.sql.types import StringType

    text_kernel = (
        extract_text_html_from_payload_kernel
        if extractor == "html"
        else extract_text_from_payload_kernel
    )
    resp = records.filter(
        (F.col("warc_type") == "response") & F.col("target_uri").isNotNull()
    )
    if require_status is not None:
        from .warc_source import split_http_payload

        body_kernel = (
            extract_text_html_from_body_kernel
            if extractor == "html"
            else extract_text_from_body_kernel
        )
        resp = split_http_payload(resp).filter(
            F.col("http_status") == int(require_status)
        )
        if extractor == "html":
            # raw Content-Type header (charset param intact) feeds the
            # declared-charset redecode (VERDICT r3 #6)
            text_col = F.pandas_udf(body_kernel, StringType())(
                F.col("http_body"), F.col("http_headers").getItem("content-type")
            )
        else:
            text_col = F.pandas_udf(body_kernel, StringType())(F.col("http_body"))
    else:
        text_col = F.pandas_udf(text_kernel, StringType())(F.col("payload"))
    return resp.select(
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("warc_ts"),
        reser_udf("header_names", "headers", "payload").alias("html"),
        text_col.alias("text"),
        lang_id_udf(text_col).alias("lang"),
    )


SITEMAP_SCHEMA = "url string, priority double"


def _xml_unescape(col):
    """The five predefined XML entities, as chained literal replaces
    (codegen'd JVM string ops). ``&amp;`` LAST, per XML decode order."""
    from pyspark.sql import functions as F

    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _gunzip_text_kernel(col: pd.Series) -> pd.Series:
    """binary -> text: whole-blob gunzip when gzip-magic'd (sitemaps ship
    as .xml.gz), then utf-8 with a latin-1 fallback. Truncated/corrupt
    gzip falls back to the raw bytes (lax, like the record scanners)."""
    import gzip
    import zlib

    out = []
    for b in col:
        if b is None:
            out.append(None)
            continue
        b = bytes(b)
        if b[:2] == b"\x1f\x8b":
            try:
                b = gzip.decompress(b)
            # zlib.error is NOT an OSError: a valid gzip header with a
            # corrupt deflate body raises it and would kill the task
            except (OSError, EOFError, zlib.error):
                pass
        try:
            out.append(b.decode("utf-8"))
        except UnicodeDecodeError:
            out.append(b.decode("latin-1"))
    return pd.Series(out, dtype=object)


def parse_sitemap_entries(
    bodies: DataFrame,
    body_col: str = "body",
    keep: tuple[str, ...] = (),
    binary: bool = False,
) -> DataFrame:
    """Sitemap XML -> one row per entry, entirely JVM-side (regexp
    built-ins inside whole-stage codegen — no Python in this hot path;
    the sitemap XML subset needs no real XML parser). Emits::

        *keep, loc, lastmod, changefreq, priority, is_index

    ``is_index`` rows are ``<sitemap><loc>`` children of a sitemapindex
    file (fetch + re-parse to expand — a driver loop over index levels,
    each level one distributed map-only pass); urlset rows carry the
    optional per-url ``lastmod``/``changefreq``/``priority`` hints (null
    when absent). ``loc`` values are XML-entity-unescaped. Map-only:
    explode + per-block regexp extraction, no exchange. ``binary=True``
    accepts a binary column and first gunzips gzip-magic'd blobs
    (``sitemap.xml.gz`` — the standard wire format) in one Arrow pass;
    plain-text sitemaps keep the all-JVM path."""
    from pyspark.sql import functions as F

    if binary:
        bodies = bodies.withColumn(
            body_col,
            F.pandas_udf(_gunzip_text_kernel, StringType())(F.col(body_col)),
        )
    block = F.explode(
        F.regexp_extract_all(
            F.col(body_col), F.lit(r"(?s)<(url|sitemap)\b.*?</\1\s*>"), 0
        )
    ).alias("_block")
    df = bodies.select(*keep, block)

    def tag(name, grab=r"(.*?)"):
        pat = r"(?s)<%s\s*>\s*%s\s*</%s\s*>" % (name, grab, name)
        return F.nullif(F.regexp_extract("_block", pat, 1), F.lit(""))

    return (
        df.select(
            *keep,
            _xml_unescape(tag("loc")).alias("loc"),
            tag("lastmod").alias("lastmod"),
            tag("changefreq").alias("changefreq"),
            tag("priority", r"([0-9.eE+\-]+)").cast("double").alias("priority"),
            F.col("_block").startswith("<sitemap").alias("is_index"),
        )
        .where(F.col("loc").isNotNull())
    )


def seeds_from_sitemaps(bodies: DataFrame, default_priority: float = 0.5) -> DataFrame:
    """Sitemap XML bodies -> a (url, priority) seeds table (the standard
    seed source of a production crawl). Urlset entries get their
    ``<priority>`` hint (missing -> ``default_priority``); sitemap-index
    rows are emitted with priority NULL so the caller can fetch and
    expand them. Duplicate urls max-merge like synth_seeds. Built on
    ``parse_sitemap_entries`` — map-only JVM extraction, then ONE slim
    (url, priority) exchange for the merge."""
    from pyspark.sql import functions as F

    entries = parse_sitemap_entries(bodies)
    return (
        entries.select(
            F.col("loc").alias("url"),
            F.when(
                F.col("is_index"), F.lit(None).cast("double")
            )
            .otherwise(F.coalesce("priority", F.lit(default_priority)))
            .alias("priority"),
        )
        .groupBy("url")
        .agg(F.max("priority").alias("priority"))
    )

"""Crawl-trap detection — per-host URL-pattern explosion scoring.

Real crawls die in traps: calendar pages, session-id rewrites, faceted
search, and infinite pagination generate unbounded URL spaces on a single
host. The reference library stops at record I/O; a frontier at scale
needs the counter-signal. The detector collapses every URL to a PATH
TEMPLATE (digit runs, long hex tokens, and query values masked), then
scores each host by how many captured urls share how few templates: a
photo gallery has many urls AND many templates; a calendar trap has many
urls collapsing onto a handful (``/cal/{n}/{n}/{n}``).

Plan shape for 100 TB
---------------------
- Template collapse is a map-side ``regexp_replace`` chain (pure JVM
  codegen, no UDF) — the regexes stay inside the Java∩RE2 subset so the
  DuckDB test oracle replays them verbatim.
- One slim aggregation ladder: (host, template) partial-counts map-side
  before the only real exchange, then the per-host rollup reduces
  host-cardinality rows — payload never shuffles, urls never shuffle,
  only template strings do.
- ``trap_hosts`` output is a small (host, score) table: broadcast it
  into the frontier as a negative priority signal or a politeness budget
  override (``merge_seed_tables`` / ``flag_politeness`` both take such
  tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import host_of_expr

# Java & RE2 compatible; applied in order. Hex BEFORE digits, so a
# 32-hex session token becomes one {x}, not a {n}a{n}b... shred.
_HEX_RUN = r"[0-9a-fA-F]{16,}"
_DIGIT_RUN = r"[0-9]+"
# stops at '/' so a matrix parameter (/view;jsid=.../item) masks its
# value without swallowing the rest of the path
_QUERY_VALUE = r"=[^&#/]*"


def url_template_expr(url) -> "F.Column":
    """The url's path+query TEMPLATE as a codegen'd JVM expression:
    scheme+host stripped, long hex runs -> ``{x}``, digit runs ->
    ``{n}``, every query value -> ``=*`` (fragments dropped). '' for
    urls with no path."""
    col = F.col(url) if isinstance(url, str) else url
    pq = F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^#]*)", 1)
    t = F.regexp_replace(pq, _HEX_RUN, "{x}")
    t = F.regexp_replace(t, _DIGIT_RUN, "{n}")
    return F.regexp_replace(t, _QUERY_VALUE, "=*")


def url_pattern_stats(captures: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host template profile: ``(host, n_urls, n_templates,
    urls_per_template, top_template, top_share)``. ``urls_per_template``
    is the explosion ratio (a calendar trap scores in the hundreds);
    ``top_template``/``top_share`` name the dominating template and its
    share of the host's urls (ties broken by template string, so the
    result is deterministic at any parallelism)."""
    per_tpl = (
        captures.select(
            host_of_expr(url_col).alias("host"),
            url_template_expr(url_col).alias("template"),
        )
        .where(F.col("host") != "")
        .groupBy("host", "template")
        .agg(F.count("*").alias("c"))
    )
    top = F.max(F.struct(F.col("c"), F.col("template"))).alias("_top")
    return (
        per_tpl.groupBy("host")
        .agg(
            F.sum("c").alias("n_urls"),
            F.count("*").alias("n_templates"),
            top,
        )
        .select(
            "host",
            "n_urls",
            "n_templates",
            F.round(F.col("n_urls") / F.col("n_templates"), 4).alias(
                "urls_per_template"
            ),
            F.col("_top.template").alias("top_template"),
            F.round(F.col("_top.c") / F.col("n_urls"), 4).alias("top_share"),
        )
    )


def flag_trap_stats(
    stats: DataFrame,
    min_urls: int = 1000,
    min_urls_per_template: float = 50.0,
) -> DataFrame:
    """The flagging rule over a (pre-computed) ``url_pattern_stats``
    frame — the single definition both ``trap_hosts`` and the CLI's
    write-then-reread flow apply, so the criteria can't diverge."""
    return stats.where(
        (F.col("n_urls") >= min_urls)
        & (F.col("urls_per_template") >= min_urls_per_template)
    ).orderBy(F.desc("urls_per_template"), "host")


def trap_hosts(
    captures: DataFrame,
    url_col: str = "url",
    min_urls: int = 1000,
    min_urls_per_template: float = 50.0,
) -> DataFrame:
    """Hosts whose captured URL space collapses onto suspiciously few
    templates: ``n_urls >= min_urls`` and ``urls_per_template >=
    min_urls_per_template``. Returns the stats rows for flagged hosts,
    highest explosion first — feed it to the frontier as a budget
    override or negative seed signal."""
    return flag_trap_stats(
        url_pattern_stats(captures, url_col), min_urls, min_urls_per_template
    )


def budgets_from_traps(
    flagged: DataFrame, budget_per_batch: int = 1
) -> DataFrame:
    """``trap_hosts`` output -> the ``(host, max_fetches_per_batch)``
    override table ``flag_politeness`` broadcasts: flagged hosts are
    throttled to ``budget_per_batch`` urls per batch (starved, not
    banned — a real site that LOOKS templated still trickles through,
    and the stats recover if the template profile normalizes)."""
    return flagged.select(
        "host", F.lit(budget_per_batch).alias("max_fetches_per_batch")
    )

"""HTTP redirect-chain resolution over a capture table — the fetch-side
semantics every crawler needs between "got a 3xx" and "schedule the
target": map each captured url to the FINAL url its redirect chain lands
on, with hop counts, the terminal capture's status, and loop/overflow
detection. ``added``/``dangling`` targets feed the frontier as new work;
the url->final_url mapping is the canonical-url table dedup and the link
graph join against (cf. how CDX/wayback collapse redirect chains).

The reference library stops at record I/O (it yields the 3xx record
itself — /root/reference/warc/warc.py); this is engine-level crawl
semantics over the HTTP split columns the engine already promotes
(``http_status``, headers map -> ``location``).

Plan shape for 100 TB
---------------------
- ``redirect_edges`` is a map-side projection + filter of the capture
  table: only (url, target) string pairs survive. Location resolution is
  pure JVM expressions (absolute, network-path ``//host/..``, and root-relative Location
  values — the RFC 9110/3986 common cases; path-relative Locations are
  rare on real captures and pass through unresolved, landing as
  ``dangling``).
- ``resolve_redirects`` advances every url ``max_hops`` times through
  ONE lazy plan of K url-keyed joins against the slim edge table (AQE
  broadcasts it when it fits — redirect captures are a small fraction of
  a crawl; otherwise co-partitioned joins reuse one partitioning). No
  driver actions, no Python. K is a constant (chains beyond ~8 hops are
  loops in practice, and browsers cap near 20), so plan growth is linear
  and bounded — the pagerank trade, not the components one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REDIRECT_STATUSES = (301, 302, 303, 307, 308)

_ORIGIN_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/]+)"


def redirect_edges(
    captures: DataFrame,
    url_col: str = "url",
    status_col: str = "http_status",
    location_col: str = "location",
) -> DataFrame:
    """``(url, target)`` — one row per captured 3xx with a Location.
    Absolute Locations pass through; network-path ``//host/..`` ones keep
    the capture url's scheme; root-relative ones resolve against its
    origin. Map-only; only the two url strings
    survive."""
    loc = F.col(location_col)
    origin = F.regexp_extract(F.col(url_col), _ORIGIN_RE, 1)
    scheme = F.regexp_extract(F.col(url_col), r"^([a-zA-Z][a-zA-Z0-9+.\-]*):", 1)
    target = (
        F.when(loc.rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"), loc)
        .when(  # network-path reference (//host/path): keep the scheme
            loc.startswith("//") & (scheme != ""),
            F.concat(scheme, F.lit(":"), loc),
        )
        .when(loc.startswith("/") & (origin != ""), F.concat(origin, loc))
        .otherwise(loc)
    )
    return (
        captures.where(
            F.col(status_col).isin(list(REDIRECT_STATUSES))
            & loc.isNotNull()
            & (loc != "")
        )
        .select(F.col(url_col).alias("url"), target.alias("target"))
    )


def resolve_redirects(
    captures: DataFrame,
    max_hops: int = 8,
    url_col: str = "url",
    status_col: str = "http_status",
    location_col: str = "location",
) -> DataFrame:
    """One row per captured url: ``(url, final_url, hops, final_status,
    resolved)``.

    - ``resolved=True``: the chain terminated within ``max_hops`` —
      ``final_url`` is the landing url, ``final_status`` its captured
      HTTP status (NULL when the landing url was never captured: a
      DANGLING redirect, i.e. frontier work).
    - ``resolved=False``: still on a redirect after ``max_hops`` hops —
      a loop or an over-long chain; ``final_url`` is where the walk
      stopped.

    Captures must be one-row-per-url (reduce history with
    ``latest_captures`` first). Deterministic: each url has at most one
    outgoing edge, so the walk is a function, not a search."""
    edges = redirect_edges(captures, url_col, status_col, location_col)
    state = captures.select(
        F.col(url_col).alias("url"),
        F.col(url_col).alias("cur"),
        F.lit(0).alias("hops"),
    )
    for _ in range(max_hops):
        e = edges.select(
            F.col("url").alias("_eu"), F.col("target").alias("_et")
        )
        state = (
            state.join(e, state.cur == e._eu, "left")
            .select(
                "url",
                F.coalesce("_et", "cur").alias("cur"),
                (
                    F.col("hops")
                    + F.when(F.col("_et").isNotNull(), 1).otherwise(0)
                ).alias("hops"),
            )
        )
    # still redirecting after max_hops? (loop / over-long chain)
    more = edges.select(F.col("url").alias("_mu"))
    terminal = captures.select(
        F.col(url_col).alias("_tu"), F.col(status_col).alias("_ts")
    )
    return (
        state.join(more, state.cur == more._mu, "left")
        .join(terminal, state.cur == terminal._tu, "left")
        .select(
            "url",
            F.col("cur").alias("final_url"),
            "hops",
            F.when(F.col("_mu").isNull(), F.col("_ts")).alias("final_status"),
            F.col("_mu").isNull().alias("resolved"),
        )
    )

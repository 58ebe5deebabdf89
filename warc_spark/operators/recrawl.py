"""Adaptive recrawl scheduling from capture history: estimate each URL's
change frequency from its observed captures (the ``payload_digest``
sequence the WARC/CDX/revisit paths already produce) and turn it into a
next-fetch priority — the freshness-driven half of a crawl scheduler
(discovery seeds come from the graph layer, recrawl seeds from here).

The change-rate estimator is the bias-reduced Poisson estimator of
Cho & Garcia-Molina, "Estimating Frequency of Change" (ACM TOIT 3(3),
2003, eq. for the irregular-access case)::

    lambda_hat = -ln((n - 0.5 - X) / (n - 0.5)) / avg_interval

where ``n`` is the number of captures, ``X`` the number of observed
digest changes among the ``n-1`` consecutive pairs, and ``avg_interval``
the mean spacing between captures. Under the Poisson change model the
probability the page changed since its last capture is then
``1 - exp(-lambda_hat * age)`` — used directly as the recrawl priority,
so it composes with the graph layer's [0, 1]-normalized discovery
priorities in ``crawl --seeds-table``.

The reference library stops at record I/O (/root/reference/warc/warc.py)
and has no scheduler; this is engine-level crawl semantics over the same
capture model.

Plan shape for 100 TB
---------------------
ONE shuffle, on ``url``: the lag window (previous digest per capture)
and the per-url aggregate use the same partitioning key, so Spark plans
a single exchange and the groupBy reuses it. Only (url, ts, digest)
strings cross it — payloads never move. Everything downstream is
codegen'd JVM expressions (no Python, no second exchange); hot urls
skew only ~100-byte rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def recrawl_priority(
    captures: DataFrame,
    asof,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "payload_digest",
    default_priority: float = 0.5,
) -> DataFrame:
    """Per-url change statistics and recrawl priority from a capture
    table ``(url, warc_ts, payload_digest, ...)``.

    Returns one row per url::

        url, n_captures, n_changes, avg_interval_sec,
        change_rate (lambda_hat, 1/sec), priority (in [0, 1])

    ``asof`` (timestamp literal/column) anchors the age of the last
    capture — pass it explicitly so runs are deterministic and
    replayable. Urls with a single capture, or whose captures all share
    one timestamp, carry no rate information: ``change_rate`` is null
    and ``priority`` falls back to ``default_priority`` (the neutral
    prior a scheduler assigns to unknown-freshness urls).

    Capture pairs are ordered by ``(ts, digest)`` — a total order, so
    ties in timestamp cannot flip ``n_changes`` across partitionings.
    """
    asof_c = asof if isinstance(asof, Column) else F.lit(asof).cast("timestamp")
    w = Window.partitionBy(url_col).orderBy(ts_col, digest_col)
    flagged = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        (F.col(digest_col) != F.lag(digest_col).over(w)).alias("_chg"),
    )
    per_url = flagged.groupBy("url").agg(
        F.count("*").alias("n_captures"),
        F.sum(F.when(F.col("_chg"), 1).otherwise(0)).alias("n_changes"),
        F.min("_ts").alias("_first"),
        F.max("_ts").alias("_last"),
    )
    n = F.col("n_captures").cast("double")
    x = F.col("n_changes").cast("double")
    span = (F.col("_last").cast("long") - F.col("_first").cast("long")).cast(
        "double"
    )
    avg_interval = F.when(F.col("n_captures") > 1, span / (n - 1.0))
    lam = F.when(
        avg_interval > 0.0,
        -F.log((n - 0.5 - x) / (n - 0.5)) / avg_interval,
    )
    age = (asof_c.cast("long") - F.col("_last").cast("long")).cast("double")
    priority = F.when(
        lam.isNotNull(), 1.0 - F.exp(-lam * F.greatest(age, F.lit(0.0)))
    ).otherwise(F.lit(default_priority))
    return per_url.select(
        "url",
        "n_captures",
        "n_changes",
        avg_interval.alias("avg_interval_sec"),
        lam.alias("change_rate"),
        priority.alias("priority"),
    )


def latest_captures(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "payload_digest",
) -> DataFrame:
    """One row per url: the LAST capture's digest, ordered by
    ``(ts, digest)`` — the same total order ``recrawl_priority`` uses, so
    a timestamp tie cannot flip which digest represents the crawl at any
    parallelism. One url-keyed exchange; max_by is a map-side-combining
    aggregate (no window, no sort)."""
    return captures.groupBy(F.col(url_col).alias("url")).agg(
        F.max_by(
            F.col(digest_col),
            F.struct(F.col(ts_col).alias("t"), F.col(digest_col).alias("d")),
        ).alias("digest")
    )


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Diff two crawls: ``(url, status, old_digest, new_digest)`` where
    status is ``added`` (url only in the new crawl), ``gone`` (only in
    the old), ``changed`` (both, different digest) or ``unchanged`` —
    the crawl-over-crawl delta report every recurring crawl publishes
    (and the input to deletion-aware seen-state expiry: ``gone`` urls are
    cuckoo-delete candidates, ``changed`` urls feed ``recrawl_priority``
    as fresh change observations).

    Inputs are one-row-per-url digest tables (reduce raw capture history
    with ``latest_captures`` first). ONE url-keyed full-outer sort-merge
    join of two slim (url, digest) projections — correct and skew-free at
    any corpus size (url is unique on both sides)."""
    o = old.select(
        F.col(url_col).alias("url"), F.col(digest_col).alias("old_digest")
    )
    n = new.select(
        F.col(url_col).alias("url"), F.col(digest_col).alias("new_digest")
    )
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("gone"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("url", status.alias("status"), "old_digest", "new_digest")


def recrawl_seeds(
    captures: DataFrame,
    asof,
    min_priority: float = 0.0,
    **kwargs,
) -> DataFrame:
    """``(url, priority)`` seed table for ``crawl --seeds-table`` from a
    capture history — the recrawl twin of the graph layer's
    ``seeds_from_pagerank``. ``min_priority`` drops urls the change
    model considers fresh enough to skip this cycle."""
    pri = recrawl_priority(captures, asof, **kwargs)
    return pri.where(F.col("priority") >= min_priority).select(
        "url", "priority"
    )

"""robots.txt gating (SURVEY.md §2.B E7).

The rules table is tiny relative to the frontier (one row per host), so it
is *broadcast* — the frontier never shuffles for the gate. Prefix matching
is a built-in higher-order function (``exists(disallow_prefixes,
p -> startswith(path, p))``): whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("disallow_prefixes", ArrayType(StringType()), True),
        StructField("crawl_delay", DoubleType(), True),
    ]
)


def url_host(col):
    return F.lower(F.regexp_extract(col, r"//([^/:?#]+)", 1))


def url_path(col):
    path = F.regexp_extract(col, r"//[^/]+(/[^?#]*)", 1)
    return F.when(path == "", "/").otherwise(path)


def flag_robots(
    frontier: DataFrame,
    robots: DataFrame | None,
    url_col: str = "url",
    host_col: str = "host",
    flag_col: str = "robots_allowed",
) -> DataFrame:
    """Add a ``robots_allowed`` boolean instead of filtering — lets one
    persisted pass feed both the allowed path and the blocked/retired path
    (no anti-join, no recompute). Unknown hosts (no rules row) are allowed —
    matching common crawler semantics."""
    if robots is None:
        return frontier.withColumn(flag_col, F.lit(True))
    path = url_path(F.col(url_col))
    gated = frontier.join(
        F.broadcast(robots.select("host", "disallow_prefixes")),
        on=host_col,
        how="left",
    )
    blocked = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array().cast("array<string>")),
        lambda p: path.startswith(p),
    )
    return gated.withColumn(flag_col, ~blocked).drop("disallow_prefixes")


def apply_robots(
    frontier: DataFrame,
    robots: DataFrame | None,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Drop urls disallowed by their host's rules."""
    if robots is None:
        return frontier
    return (
        flag_robots(frontier, robots, url_col, host_col)
        .filter(F.col("robots_allowed"))
        .drop("robots_allowed")
    )

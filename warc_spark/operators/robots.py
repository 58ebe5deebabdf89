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


# ---------------------------------------------------------------------------
# robots.txt parsing: raw fetched bodies -> the rules table
# ---------------------------------------------------------------------------

def parse_robots_txt(body: str, agent: str = "*") -> tuple[list[str], float | None]:
    """Parse one robots.txt body into (disallow_prefixes, crawl_delay) for
    ``agent`` (falling back to the ``*`` group). Standard-practice subset:
    grouped User-agent stanzas, Disallow prefixes (empty = allow all),
    Crawl-delay; comments and unknown directives ignored. Pure function —
    the executor kernel maps it over a batch."""
    agent = agent.lower()
    groups: dict[str, tuple[list[str], float | None]] = {}
    cur_agents: list[str] = []
    expecting_agents = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not expecting_agents:
                cur_agents = []
            cur_agents.append(val.lower())
            for a in cur_agents:
                groups.setdefault(a, ([], None))
            expecting_agents = True
            continue
        expecting_agents = False
        if not cur_agents:
            continue
        if key == "disallow" and val:
            for a in cur_agents:
                groups[a][0].append(val)
        elif key == "crawl-delay":
            try:
                d = float(val)
            except ValueError:
                continue
            for a in cur_agents:
                groups[a] = (groups[a][0], d)
    got = groups.get(agent) or groups.get("*") or ([], None)
    return got


def robots_rules_from_bodies(
    bodies: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, body) robots.txt fetches -> the ROBOTS_SCHEMA rules table the
    gate broadcasts. Vectorized: one pandas UDF pass over the bodies (the
    rules table is one row per host — tiny vs the frontier, so this runs
    once per refresh cycle, not per batch)."""
    import pandas as pd

    def kernel(body):
        parsed = [parse_robots_txt(b if b is not None else "", agent) for b in body]
        return pd.DataFrame(
            {
                "disallow_prefixes": [p[0] for p in parsed],
                "crawl_delay": [p[1] for p in parsed],
            }
        )

    udf = F.pandas_udf(
        kernel, "disallow_prefixes array<string>, crawl_delay double"
    )
    return bodies.select(
        F.col(host_col).alias("host"), udf(F.col(body_col)).alias("_r")
    ).select(
        "host",
        F.col("_r.disallow_prefixes").alias("disallow_prefixes"),
        F.col("_r.crawl_delay").alias("crawl_delay"),
    )

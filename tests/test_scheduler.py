"""Scheduler building blocks: politeness window, robots gate, salted
priority ordering (skew split + within-partition order)."""

import pytest
from pyspark.sql import functions as F

from warc_spark.operators.politeness import apply_politeness, topk_per_key
from warc_spark.operators.priority import salted_priority_order
from warc_spark.operators.robots import ROBOTS_SCHEMA, apply_robots, url_host, url_path


@pytest.fixture(scope="module")
def frontier(spark):
    rows = []
    for h in range(4):
        for i in range(20):
            rows.append(
                (f"http://host{h}.example.org/p/{i}", f"host{h}.example.org", 1.0 - i * 0.01)
            )
    return spark.createDataFrame(rows, "url string, host string, priority double")


def test_politeness_default_budget(spark, frontier):
    kept = apply_politeness(frontier, None, default_budget=5)
    counts = kept.groupBy("host").count().collect()
    assert all(r["count"] == 5 for r in counts)
    # keeps the top-priority urls specifically
    top = {r.url for r in kept.filter(F.col("host") == "host0.example.org").collect()}
    assert top == {f"http://host0.example.org/p/{i}" for i in range(5)}


def test_politeness_budget_overrides(spark, frontier):
    budgets = spark.createDataFrame(
        [("host1.example.org", 2)], "host string, max_fetches_per_batch int"
    )
    kept = apply_politeness(frontier, budgets, default_budget=4)
    counts = {r.host: r["count"] for r in kept.groupBy("host").count().collect()}
    assert counts["host1.example.org"] == 2
    assert counts["host0.example.org"] == 4


def test_robots_gate(spark, frontier):
    robots = spark.createDataFrame(
        [
            ("host0.example.org", ["/p/1"], 1.0),   # blocks /p/1, /p/10..19
            ("host1.example.org", [], 2.0),          # empty = allow all
        ],
        ROBOTS_SCHEMA,
    )
    kept = apply_robots(frontier, robots)
    h0 = [r.url for r in kept.filter(F.col("host") == "host0.example.org").collect()]
    assert all("/p/1" not in u for u in h0)
    assert len(h0) == 9  # p/0, p/2..9
    assert kept.filter(F.col("host") == "host1.example.org").count() == 20
    assert kept.filter(F.col("host") == "host2.example.org").count() == 20  # no rules


def test_url_helpers(spark):
    df = spark.createDataFrame(
        [("http://Ex.COM:8080/a/b?q=1",), ("https://x.org",)], "url string"
    )
    rows = df.select(url_host("url").alias("h"), url_path("url").alias("p")).collect()
    assert rows[0].h == "ex.com" and rows[0].p == "/a/b"
    assert rows[1].h == "x.org" and rows[1].p == "/"


def test_salted_order_splits_hot_host(spark):
    # one host dominates; salting must spread it over multiple partitions
    rows = [(f"http://hot.example.org/{i}", "hot.example.org", float(i % 100)) for i in range(2000)]
    rows += [(f"http://cold{i}.example.org/", f"cold{i}.example.org", 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, "url string, host string, priority double")
    ordered = salted_priority_order(df, n_partitions=8, n_salts=8)
    pid = ordered.withColumn("pid", F.spark_partition_id())
    hot_parts = (
        pid.filter(F.col("host") == "hot.example.org").select("pid").distinct().count()
    )
    assert hot_parts >= 4  # hot host spread across partitions, not one

    # within each partition rows are (priority desc, url) ordered
    import pandas as pd

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        expected = pdf.sort_values(["priority", "url"], ascending=[False, True])
        ok = (pdf["url"].to_numpy() == expected["url"].to_numpy()).all()
        return pd.DataFrame({"ok": [bool(ok)]})

    res = ordered.mapInPandas(
        lambda it: (check(pdf) for pdf in [pd.concat(list(it))] if len(pdf)), "ok boolean"
    ).collect()
    assert all(r.ok for r in res)


def test_topk_deterministic_ties(spark):
    df = spark.createDataFrame(
        [("a", 1.0, "u2"), ("a", 1.0, "u1"), ("a", 1.0, "u3")],
        "host string, priority double, url string",
    )
    kept = topk_per_key(df, "host", [F.desc("priority"), F.col("url")], k=2)
    assert {r.url for r in kept.collect()} == {"u1", "u2"}


ROBOTS_BODY = """
# crawler policy
User-agent: fancybot
Disallow: /private/
Crawl-delay: 2.5

User-agent: *
Disallow: /tmp/
Disallow: /cgi-bin/
Crawl-delay: 1

User-agent: otherbot
Disallow:
"""


def test_parse_robots_txt_groups():
    from warc_spark.operators.robots import parse_robots_txt

    # wildcard group
    prefixes, delay = parse_robots_txt(ROBOTS_BODY, "*")
    assert prefixes == ["/tmp/", "/cgi-bin/"]
    assert delay == 1.0
    # specific agent wins over wildcard
    prefixes, delay = parse_robots_txt(ROBOTS_BODY, "fancybot")
    assert prefixes == ["/private/"]
    assert delay == 2.5
    # empty Disallow = allow all
    prefixes, delay = parse_robots_txt(ROBOTS_BODY, "otherbot")
    assert prefixes == []
    # unknown agent falls back to *
    prefixes, _ = parse_robots_txt(ROBOTS_BODY, "nobody")
    assert prefixes == ["/tmp/", "/cgi-bin/"]
    # grouped user-agents share directives
    multi = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots_txt(multi, "b")[0] == ["/x"]


def test_robots_rules_from_bodies_feeds_gate(spark):
    from warc_spark.operators.robots import apply_robots, robots_rules_from_bodies

    bodies = spark.createDataFrame(
        [
            ("h0.example.org", ROBOTS_BODY),
            ("h1.example.org", "User-agent: *\nDisallow: /\n"),
            ("h2.example.org", None),
        ],
        "host string, body string",
    )
    rules = robots_rules_from_bodies(bodies)
    got = {r.host: (list(r.disallow_prefixes), r.crawl_delay) for r in rules.collect()}
    assert got["h0.example.org"] == (["/tmp/", "/cgi-bin/"], 1.0)
    assert got["h1.example.org"] == (["/"], None)
    assert got["h2.example.org"] == ([], None)

    frontier = spark.createDataFrame(
        [
            ("http://h0.example.org/ok", "h0.example.org", 1.0),
            ("http://h0.example.org/tmp/x", "h0.example.org", 1.0),
            ("http://h1.example.org/anything", "h1.example.org", 1.0),
            ("http://h3.example.org/new", "h3.example.org", 1.0),
        ],
        "url string, host string, priority double",
    )
    kept = {r.url for r in apply_robots(frontier, rules).collect()}
    assert kept == {"http://h0.example.org/ok", "http://h3.example.org/new"}

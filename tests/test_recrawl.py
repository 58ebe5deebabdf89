"""Adaptive recrawl scheduling (operators/recrawl.py): closed-form
estimator checks, degenerate-history fallbacks, tie-break determinism,
and the one-exchange plan shape."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from warc_spark.operators.recrawl import recrawl_priority, recrawl_seeds


def _caps(spark, rows):
    """rows: (url, epoch_sec, digest)"""
    df = spark.createDataFrame(rows, "url string, e long, payload_digest string")
    return df.select(
        "url", F.timestamp_seconds("e").alias("warc_ts"), "payload_digest"
    )


def _asof(sec):
    return F.timestamp_seconds(F.lit(sec))


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestEstimator:
    def test_closed_form(self, spark):
        """n=3 captures at 0/100/200s, one change -> avgi=100,
        lambda = -ln((3-.5-1)/(3-.5))/100 = ln(5/3)/100; at age=100
        priority = 1 - exp(-ln(5/3)) = 1 - 3/5 = 0.4 exactly."""
        import math

        c = _caps(spark, [("u", 0, "A"), ("u", 100, "A"), ("u", 200, "B")])
        r = recrawl_priority(c, _asof(300)).collect()[0]
        assert (r.n_captures, r.n_changes) == (3, 1)
        assert r.avg_interval_sec == pytest.approx(100.0, abs=0)
        assert r.change_rate == pytest.approx(math.log(5 / 3) / 100, rel=1e-12)
        assert r.priority == pytest.approx(0.4, rel=1e-12)

    def test_never_changed_low_priority_monotonic_in_age(self, spark):
        """X=0 -> lambda=0 -> priority 0 at any age (the bias-reduced
        estimator reports no evidence of change)."""
        c = _caps(spark, [("u", 0, "A"), ("u", 100, "A"), ("u", 200, "A")])
        r = recrawl_priority(c, _asof(10_000_000)).collect()[0]
        assert r.n_changes == 0
        assert r.change_rate == 0.0
        assert r.priority == 0.0

    def test_always_changed_beats_sometimes_changed(self, spark):
        c = _caps(
            spark,
            [("hot", 0, "A"), ("hot", 100, "B"), ("hot", 200, "C"),
             ("warm", 0, "A"), ("warm", 100, "A"), ("warm", 200, "B")],
        )
        got = {r.url: r for r in recrawl_priority(c, _asof(300)).collect()}
        assert got["hot"].change_rate > got["warm"].change_rate
        assert got["hot"].priority > got["warm"].priority

    def test_age_zero_priority_zero(self, spark):
        """Captured right now -> nothing can have changed since."""
        c = _caps(spark, [("u", 0, "A"), ("u", 100, "B")])
        r = recrawl_priority(c, _asof(100)).collect()[0]
        assert r.priority == 0.0


class TestDegenerate:
    def test_single_capture_default(self, spark):
        c = _caps(spark, [("u", 50, "A")])
        r = recrawl_priority(c, _asof(100), default_priority=0.25).collect()[0]
        assert (r.n_captures, r.n_changes) == (1, 0)
        assert r.avg_interval_sec is None and r.change_rate is None
        assert r.priority == 0.25

    def test_zero_span_default(self, spark):
        """All captures share one timestamp -> no rate information."""
        c = _caps(spark, [("u", 50, "A"), ("u", 50, "B")])
        r = recrawl_priority(c, _asof(100)).collect()[0]
        assert r.change_rate is None
        assert r.priority == 0.5

    def test_ts_tie_ordered_by_digest(self, spark):
        """Equal timestamps order by digest -> (A,B,A) at ts 0,0,100 is
        A,B at 0 then A: two changes however it's partitioned."""
        rows = [("u", 0, "B"), ("u", 0, "A"), ("u", 100, "A")]
        a = recrawl_priority(
            _caps(spark, rows).repartition(1), _asof(200)
        ).collect()[0]
        b = recrawl_priority(
            _caps(spark, rows).repartition(7), _asof(200)
        ).collect()[0]
        assert a.n_changes == b.n_changes == 2
        assert a.priority == b.priority


class TestCrawlDelta:
    def test_statuses(self, spark):
        from warc_spark.operators.recrawl import crawl_delta

        old = spark.createDataFrame(
            [("u1", "A"), ("u2", "B"), ("u3", "C")], "url string, digest string"
        )
        new = spark.createDataFrame(
            [("u1", "A"), ("u2", "B2"), ("u4", "D")], "url string, digest string"
        )
        got = {r.url: r for r in crawl_delta(old, new).collect()}
        assert got["u1"].status == "unchanged"
        assert got["u2"].status == "changed"
        assert (got["u2"].old_digest, got["u2"].new_digest) == ("B", "B2")
        assert got["u3"].status == "gone" and got["u3"].new_digest is None
        assert got["u4"].status == "added" and got["u4"].old_digest is None

    def test_latest_captures_total_order(self, spark):
        from warc_spark.operators.recrawl import latest_captures

        rows = [("u", 100, "A"), ("u", 200, "C"), ("u", 200, "B"), ("v", 5, "X")]
        for parts in (1, 7):
            c = _caps(spark, rows).repartition(parts)
            got = {r.url: r.digest for r in latest_captures(c).collect()}
            # ts tie at 200 breaks by digest: C wins over B
            assert got == {"u": "C", "v": "X"}

    def test_empty_sides(self, spark):
        from warc_spark.operators.recrawl import crawl_delta

        old = spark.createDataFrame([("u1", "A")], "url string, digest string")
        empty = old.where("1=0")
        assert [r.status for r in crawl_delta(old, empty).collect()] == ["gone"]
        assert [r.status for r in crawl_delta(empty, old).collect()] == ["added"]


class TestSeedsAndPlan:
    def test_seeds_filter_and_shape(self, spark):
        c = _caps(
            spark,
            [("hot", 0, "A"), ("hot", 100, "B"),
             ("cold", 0, "A"), ("cold", 100, "A")],
        )
        s = recrawl_seeds(c, _asof(1000), min_priority=0.01)
        assert s.columns == ["url", "priority"]
        assert [r.url for r in s.collect()] == ["hot"]

    def test_one_exchange_no_python(self, spark):
        c = _caps(spark, [("u", 0, "A"), ("u", 100, "B"), ("v", 0, "C")])
        plan = _plan(recrawl_priority(c, _asof(200)))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # the lag window and the per-url aggregate share the url key ->
        # exactly ONE shuffle (each node appears once in the tree and
        # once in the detail section)
        import re

        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan

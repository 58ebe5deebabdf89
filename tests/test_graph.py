"""Host-graph + PageRank operator tests (warc_spark/functions/graph.py):
hand-computed closed forms, dangling-mass conservation, parallelism
determinism, and plan shape (pure built-ins, slim exchanges)."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from warc_spark.functions.graph import hits, host_edges, host_of_expr, pagerank


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight double")


class TestHostEdges:
    def test_host_extraction_rules(self, spark):
        df = spark.createDataFrame(
            [
                ("http://A.Example.COM/x", ["https://b.example.org:8443/y"]),
                ("http://trail.example.com./z", ["not-a-url", "ftp://c.d/e"]),
                ("relative/path", ["http://lost.example.com/"]),
            ],
            "url string, out_links array<string>",
        )
        got = {
            (r.src, r.dst): r.weight for r in host_edges(df).collect()
        }
        # lower-cased, port kept out of host, trailing dot stripped;
        # non-absolute urls (either side) drop out entirely
        assert got == {
            ("a.example.com", "b.example.org"): 1.0,
            ("trail.example.com", "c.d"): 1.0,
        }

    def test_weights_aggregate_per_host_pair(self, spark):
        df = spark.createDataFrame(
            [
                ("http://s.ex/1", ["http://t.ex/a", "http://t.ex/b"]),
                ("http://s.ex/2", ["http://t.ex/c", "http://u.ex/d"]),
            ],
            "url string, out_links array<string>",
        )
        got = {(r.src, r.dst): r.weight for r in host_edges(df).collect()}
        assert got == {("s.ex", "t.ex"): 3.0, ("s.ex", "u.ex"): 1.0}


class TestPageRank:
    def test_one_iteration_closed_form(self, spark):
        """Two nodes, one edge a->b (b dangles). N=2, pr0=1/2 each.
        dangling0 = pr0(b) = 0.5.
        pr1(a) = 0.15/2 + 0.85*(0 + 0.5/2)        = 0.28750
        pr1(b) = 0.15/2 + 0.85*(0.5 + 0.5/2)      = 0.71250
        """
        e = _edges(spark, [("a", "b", 1.0)])
        got = {r.host: r for r in pagerank(e, iterations=1).collect()}
        assert got["a"].pagerank == pytest.approx(0.2875, abs=1e-12)
        assert got["b"].pagerank == pytest.approx(0.7125, abs=1e-12)
        assert (got["a"].out_degree, got["a"].in_degree) == (1, 0)
        assert (got["b"].out_degree, got["b"].in_degree) == (0, 1)

    def test_weight_split_closed_form(self, spark):
        """a links b with weight 3 and c with weight 1 -> b gets 3/4 of
        a's rank, c 1/4. N=3, pr0=1/3, no dangling... b and c DO dangle.
        dangling0 = 2/3.
        pr1(a) = 0.05 + 0.85*(2/3/3)            = 0.238888...
        pr1(b) = 0.05 + 0.85*(1/3*3/4 + 2/9)    = 0.451388...
        pr1(c) = 0.05 + 0.85*(1/3*1/4 + 2/9)    = 0.309722...
        """
        e = _edges(spark, [("a", "b", 3.0), ("a", "c", 1.0)])
        got = {r.host: r.pagerank for r in pagerank(e, iterations=1).collect()}
        third = 1.0 / 3.0
        dang = 2 * third / 3.0
        assert got["a"] == pytest.approx(0.05 + 0.85 * dang, abs=1e-12)
        assert got["b"] == pytest.approx(
            0.05 + 0.85 * (third * (3.0 / 4.0) + dang), abs=1e-12
        )
        assert got["c"] == pytest.approx(
            0.05 + 0.85 * (third * (1.0 / 4.0) + dang), abs=1e-12
        )

    def test_mass_conserved_over_iterations(self, spark):
        e = _edges(
            spark,
            [
                ("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0),
                ("a", "d", 1.0),  # d dangles
            ],
        )
        for k in (1, 3, 5):
            total = pagerank(e, iterations=k).agg(F.sum("pagerank")).first()[0]
            assert total == pytest.approx(1.0, abs=1e-9)

    def test_deterministic_across_parallelism(self, spark):
        rows = [
            (f"h{i % 11}", f"h{(i * 7 + 3) % 11}", float(1 + i % 4))
            for i in range(200)
        ]
        e1 = _edges(spark, rows).coalesce(1)
        e2 = _edges(spark, rows).repartition(13)
        r1 = {
            r.host: round(r.pagerank, 9)
            for r in pagerank(e1, iterations=3).collect()
        }
        r2 = {
            r.host: round(r.pagerank, 9)
            for r in pagerank(e2, iterations=3).collect()
        }
        assert r1 == r2

    def test_self_loop_supported(self, spark):
        e = _edges(spark, [("a", "a", 1.0), ("a", "b", 1.0), ("b", "a", 1.0)])
        got = {r.host: r.pagerank for r in pagerank(e, iterations=4).collect()}
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
        assert got["a"] > got["b"]  # a keeps half its own rank + all of b's

    def test_persist_every_same_result(self, spark):
        e = _edges(spark, [("a", "b", 1.0), ("b", "a", 2.0), ("b", "c", 1.0)])
        plain = {
            r.host: round(r.pagerank, 12)
            for r in pagerank(e, iterations=4).collect()
        }
        cut = {
            r.host: round(r.pagerank, 12)
            for r in pagerank(e, iterations=4, persist_every=2).collect()
        }
        assert plain == cut


class TestPlanShape:
    def test_no_python_in_pagerank_plan(self, spark):
        """The whole recurrence is JVM built-ins: no Python UDF / Arrow
        eval node anywhere, and the 1-row node-count/dangling sides come
        back as broadcast nested-loop joins, never a shuffle."""
        e = _edges(spark, [("a", "b", 1.0), ("b", "a", 1.0)])
        p = _plan(pagerank(e, iterations=2))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "BroadcastNestedLoopJoin" in p

    def test_host_edges_exchange_is_slim(self, spark):
        """Only (src, dst) host strings reach the aggregate exchange —
        the page url/out_links columns are projected away map-side."""
        df = spark.createDataFrame(
            [("http://s.ex/1", ["http://t.ex/a"])],
            "url string, out_links array<string>",
        )
        p = _plan(host_edges(df))
        lines = p.splitlines()
        ex_inputs = [
            lines[i + 1]
            for i, ln in enumerate(lines[:-1])
            if ln.strip().endswith("Exchange") and lines[i + 1].startswith("Input")
        ]
        assert ex_inputs and all(
            "out_links" not in ln and "url" not in ln for ln in ex_inputs
        )
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_host_of_expr_is_codegen(self, spark):
        df = spark.range(3).select(
            F.concat(F.lit("http://h"), F.col("id").cast("string"), F.lit(".ex/p"))
            .alias("u")
        )
        p = _plan(df.select(host_of_expr("u").alias("h")))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestHits:
    def test_one_iteration_closed_form(self, spark):
        """a->b (w 1), a->c (w 3), b->c (w 1). h0 = 1 everywhere.
        a_raw: b = 1*1 = 1, c = 3*1 + 1*1 = 4; sum 5
        a1:    a = 0, b = 0.2, c = 0.8
        h_raw: a = 1*0.2 + 3*0.8 = 2.6, b = 1*0.8 = 0.8; sum 3.4
        h1:    a = 2.6/3.4, b = 0.8/3.4, c = 0
        """
        e = _edges(spark, [("a", "b", 1.0), ("a", "c", 3.0), ("b", "c", 1.0)])
        got = {r.host: r for r in hits(e, iterations=1).collect()}
        assert got["a"].authority == pytest.approx(0.0, abs=1e-12)
        assert got["b"].authority == pytest.approx(0.2, abs=1e-12)
        assert got["c"].authority == pytest.approx(0.8, abs=1e-12)
        assert got["a"].hub == pytest.approx(2.6 / 3.4, abs=1e-12)
        assert got["b"].hub == pytest.approx(0.8 / 3.4, abs=1e-12)
        assert got["c"].hub == pytest.approx(0.0, abs=1e-12)

    def test_l1_mass_conserved_and_sink_hub_zero(self, spark):
        e = _edges(
            spark,
            [("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 1.0), ("a", "sink", 5.0)],
        )
        rows = hits(e, iterations=3).collect()
        assert sum(r.hub for r in rows) == pytest.approx(1.0, abs=1e-9)
        assert sum(r.authority for r in rows) == pytest.approx(1.0, abs=1e-9)
        got = {r.host: r for r in rows}
        assert got["sink"].hub == 0.0  # no out-edges -> never a hub
        assert got["sink"].authority > 0.0

    def test_deterministic_across_parallelism(self, spark):
        e = _edges(
            spark,
            [(f"h{i}", f"h{(i * 7 + 3) % 23}", float(1 + i % 5)) for i in range(60)],
        )
        a = {
            (r.host): (round(r.hub, 9), round(r.authority, 9))
            for r in hits(e.repartition(1), iterations=2).collect()
        }
        b = {
            (r.host): (round(r.hub, 9), round(r.authority, 9))
            for r in hits(e.repartition(17), iterations=2).collect()
        }
        assert a == b

    def test_no_python_in_plan(self, spark):
        e = _edges(spark, [("a", "b", 1.0), ("b", "a", 2.0)])
        plan = _plan(hits(e, iterations=2))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_zero_iterations_rejected(self):
        with pytest.raises(ValueError):
            hits(None, iterations=0)

    def test_persist_every_same_result(self, spark):
        """The lazy per-interval localCheckpoint (plan-doubling cut) must
        not change values. 3 iterations with a cut after the 2nd keeps the
        uncut twin cheap (the uncut plan doubles per iteration — the very
        blow-up persist_every exists for)."""
        e = _edges(
            spark,
            [(f"h{i}", f"h{(i * 5 + 2) % 11}", float(1 + i % 3)) for i in range(30)],
        )
        a = {r.host: (round(r.hub, 9), round(r.authority, 9))
             for r in hits(e, iterations=3, persist_every=0).collect()}
        b = {r.host: (round(r.hub, 9), round(r.authority, 9))
             for r in hits(e, iterations=3, persist_every=2).collect()}
        assert a == b


class TestConnectedComponents:
    def test_two_components_and_chain(self, spark):
        """A 4-node chain (propagation needs >1 round) plus a separate
        2-cycle; labels are the lexicographically smallest member."""
        from warc_spark.functions.graph import connected_components

        e = _edges(
            spark,
            [("d", "c", 1.0), ("c", "b", 1.0), ("b", "a", 1.0),
             ("y", "z", 1.0), ("z", "y", 1.0)],
        )
        got = {r.host: r.component for r in connected_components(e).collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                       "y": "y", "z": "y"}

    def test_directed_edges_treated_undirected(self, spark):
        from warc_spark.functions.graph import connected_components

        e = _edges(spark, [("b", "a", 1.0), ("c", "b", 1.0)])
        got = {r.host: r.component for r in connected_components(e).collect()}
        assert set(got.values()) == {"a"}

    def test_deterministic_across_parallelism(self, spark):
        from warc_spark.functions.graph import connected_components

        rows = [(f"h{i}", f"h{(i * 3 + 1) % 40}", 1.0) for i in range(40)]
        r1 = {
            r.host: r.component
            for r in connected_components(_edges(spark, rows).coalesce(1)).collect()
        }
        r2 = {
            r.host: r.component
            for r in connected_components(
                _edges(spark, rows).repartition(9)
            ).collect()
        }
        assert r1 == r2 and len(r1) == 40

    def test_isolated_self_loop(self, spark):
        from warc_spark.functions.graph import connected_components

        e = _edges(spark, [("a", "a", 1.0), ("b", "c", 1.0)])
        got = {r.host: r.component for r in connected_components(e).collect()}
        assert got == {"a": "a", "b": "b", "c": "b"}


class TestConnectedComponentsProperty:
    def test_matches_union_find_on_random_graphs(self, spark):
        """Pure-Python union-find oracle over pseudo-random edge sets of
        varying density (deterministic LCG — no test-run randomness)."""
        from warc_spark.functions.graph import connected_components

        def lcg(seed):
            x = seed
            while True:
                x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
                yield x

        for seed, n, m in [(1, 30, 10), (2, 40, 25), (3, 25, 60), (4, 50, 50)]:
            g = lcg(seed)
            rows = [
                (f"n{next(g) % n:02d}", f"n{next(g) % n:02d}", 1.0)
                for _ in range(m)
            ]
            parent = {}

            def find(x):
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for s, d, _ in rows:
                rs, rd = find(s), find(d)
                if rs != rd:
                    parent[max(rs, rd)] = min(rs, rd)
            # oracle label = lexicographically smallest member of the set
            want = {x: find(x) for x in parent}
            got = {
                r.host: r.component
                for r in connected_components(_edges(spark, rows)).collect()
            }
            assert got == want, f"seed={seed}"


class TestHostGraphFromPages:
    def test_html_extractor_links_only(self, spark):
        """Real-HTML pages frame -> host edges: resolved relative hrefs,
        framing-less record tolerated (null links), weights aggregated."""
        from warc_spark.functions.graph import host_graph_from_pages

        def rec(html: bytes) -> bytes:
            return b"WARC/1.0\r\nX: y\r\n\r\nHTTP/1.1 200 OK\r\n\r\n" + html

        df = spark.createDataFrame(
            [
                ("http://a.ex/p/1",
                 rec(b'<html><a href="/x">r</a><a href="http://b.ex/y">o</a></html>')),
                ("http://a.ex/p/2", rec(b'<a HREF="http://b.ex/z">upper</a>')),
                ("http://c.ex/q", b"no framing at all"),
            ],
            "url string, html binary",
        )
        got = {
            (r.src, r.dst): r.weight
            for r in host_graph_from_pages(df, extractor="html").collect()
        }
        assert got == {("a.ex", "a.ex"): 1.0, ("a.ex", "b.ex"): 2.0}

    def test_synthetic_extractor_matches_frontier_kernel(self, spark):
        """On the deterministic synthetic corpus the links-only path must
        see exactly the links the frontier's combined kernel sees."""
        from warc_spark.functions.graph import host_graph_from_pages
        from warc_spark.sources.pages import synth_pages

        pages = synth_pages(spark, 300, seed=7)
        edges = host_graph_from_pages(pages, extractor="synthetic")
        rows = edges.collect()
        assert rows and all(r.weight >= 1.0 and r.src and r.dst for r in rows)
        # total link mass == what the frontier's extract_links kernel emits
        from warc_spark.sources.pages import extract_links_kernel

        import pandas as pd

        pdf = pages.select("html").toPandas()
        want = int(
            extract_links_kernel(pdf["html"]).map(
                lambda l: len(l) if l is not None else 0
            ).sum()
        )
        # host_edges drops non-absolute urls; synthetic links are absolute
        assert int(sum(r.weight for r in rows)) == want


class TestAnchorTexts:
    def _pages(self, spark, bodies_and_urls):
        rows = [
            (u, bytearray(("H\r\n\r\nHTTP/1.1 200 OK\r\n\r\n" + b).encode()))
            for u, b in bodies_and_urls
        ]
        return spark.createDataFrame(rows, "url string, html binary")

    def test_rollup_counts_and_empty_anchor_dropped(self, spark):
        from warc_spark.functions.graph import anchor_texts_from_pages

        pages = self._pages(spark, [
            ("http://a.example.org/1",
             '<a href="http://t.example.org/x">Target Site</a>'
             '<a href="http://t.example.org/y">Target Site</a>'
             '<a href="http://t.example.org/z"><img src="i.png"></a>'),
            ("http://b.example.org/1",
             '<a href="http://t.example.org/x">Target Site</a>'
             '<a href="http://u.example.org/">other</a>'),
        ])
        got = {
            (r.dst, r.anchor): r.weight
            for r in anchor_texts_from_pages(pages).collect()
        }
        # both hosts call t "Target Site" (3 links); the image-only
        # anchor drops; u gets its single label
        assert got == {
            ("t.example.org", "Target Site"): 3.0,
            ("u.example.org", "other"): 1.0,
        }

    def test_top_anchors_rank_deterministic(self, spark):
        from warc_spark.functions.graph import top_anchors

        tbl = spark.createDataFrame(
            [("t", "alpha", 5.0), ("t", "beta", 5.0), ("t", "gamma", 9.0),
             ("u", "only", 1.0)],
            "dst string, anchor string, weight double",
        )
        got = [(r.dst, r.anchor, r.rank) for r in
               top_anchors(tbl, k=2).orderBy("dst", "rank").collect()]
        # weight desc, then anchor asc on the tie
        assert got == [
            ("t", "gamma", 1), ("t", "alpha", 2), ("u", "only", 1),
        ]

    def test_null_record_safe(self, spark):
        from warc_spark.functions.graph import anchor_texts_from_pages

        pages = spark.createDataFrame(
            [("http://a.example.org/1", None)], "url string, html binary"
        )
        assert anchor_texts_from_pages(pages).count() == 0


class TestDomainRollup:
    def test_domain_of_expr_rules(self, spark):
        from warc_spark.functions.graph import domain_of_expr

        df = spark.createDataFrame(
            [
                ("www.news.example.com",),
                ("example.com",),
                ("a.b.co.uk",),
                ("sub.deep.example.com.au",),
                ("co.uk",),            # bare suffix: <=2 labels pass through
                ("localhost",),
                ("192.168.0.1",),      # IPv4 literal passes through
                ("[2001:db8::1]",),    # bracketed IPv6 literal too
            ],
            "h string",
        )
        got = [r.d for r in df.select(domain_of_expr("h").alias("d")).collect()]
        assert got == [
            "example.com", "example.com", "b.co.uk", "example.com.au",
            "co.uk", "localhost", "192.168.0.1", "[2001:db8::1]",
        ]

    def test_domain_edges_rollup(self, spark):
        from warc_spark.functions.graph import domain_edges

        e = _edges(
            spark,
            [
                ("www.a.com", "cdn.a.com", 2.0),   # intra-domain after rollup
                ("blog.a.com", "shop.b.co.uk", 3.0),
                ("www.a.com", "shop.b.co.uk", 1.0),
            ],
        )
        got = {(r.src, r.dst): r.weight for r in domain_edges(e).collect()}
        assert got == {
            ("a.com", "a.com"): 2.0,
            ("a.com", "b.co.uk"): 4.0,
        }

    def test_domain_expr_is_jvm_only(self, spark):
        from warc_spark.functions.graph import domain_of_expr

        df = spark.createDataFrame([("x.co.uk",)], "h string")
        p = _plan(df.select(domain_of_expr("h").alias("d")))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestSeedsFromPagerank:
    def test_priorities_normalized_and_joined(self, spark):
        from warc_spark.functions.graph import seeds_from_pagerank

        pages = spark.createDataFrame(
            [("http://big.ex/1",), ("http://big.ex/2",),
             ("http://small.ex/1",), ("http://other.ex/1",)],
            "url string",
        )
        ranks = spark.createDataFrame(
            [("big.ex", 0.5), ("small.ex", 0.25)],
            "host string, pagerank double",
        )
        got = {r.url: r.priority for r in
               seeds_from_pagerank(pages, ranks).collect()}
        # other.ex has no rank -> dropped; top host normalizes to 1.0
        assert got == {
            "http://big.ex/1": 1.0, "http://big.ex/2": 1.0,
            "http://small.ex/1": 0.5,
        }

    def test_top_hosts_cut(self, spark):
        from warc_spark.functions.graph import seeds_from_pagerank

        pages = spark.createDataFrame(
            [("http://h%d.ex/p" % i,) for i in range(5)], "url string",
        )
        ranks = spark.createDataFrame(
            [("h%d.ex" % i, 0.1 * (i + 1)) for i in range(5)],
            "host string, pagerank double",
        )
        got = {r.url: r.priority for r in
               seeds_from_pagerank(pages, ranks, top_hosts=2).collect()}
        assert got == {"http://h4.ex/p": 1.0, "http://h3.ex/p": 0.8}

"""Host-frequency capping (functions/curation.py) and crawl-trap
detection (operators/traps.py): DuckDB exact-replay oracles + the
100 TB plan shapes (broadcast-only join, slim-only exchanges)."""

import io
from contextlib import redirect_stdout

import duckdb
import pytest
from pyspark.sql import functions as F

from warc_spark.functions.curation import cap_host_frequency
from warc_spark.operators.traps import trap_hosts, url_pattern_stats


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def corpus(spark, tmp_path):
    """Deterministic synthetic corpus: host h{k} gets (k+1)*40 urls, so
    h0 has 40 and h9 has 400 — capping at 100 leaves h0-h1 intact and
    downsamples h4-h9. Written to parquet so DuckDB reads the SAME rows."""
    path = str(tmp_path / "corpus")
    spark.range(0, 2200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("http://h"),
            # id -> host index with (k+1)*40 urls per host: inverse of the
            # cumulative 40*k*(k+1)/2 boundary, done the simple way
            F.expr(
                "CAST(floor((sqrt(8*id/40.0 + 1) - 1) / 2) AS INT)"
            ).cast("string"),
            F.lit(".example.com/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
    ).coalesce(2).write.mode("overwrite").parquet(path)
    return path


class TestCapHostFrequency:
    def test_duckdb_exact_replay(self, spark, corpus):
        """The kept id-set must equal DuckDB's replay of the same rule:
        hosts over the cap keep rows with
        ('0x'||substr(md5(url),1,8))::BIGINT * n < cap * 2^32."""
        cap = 100
        df = spark.read.parquet(corpus)
        got = sorted(
            r.doc_id for r in cap_host_frequency(df, cap=cap).select("doc_id").collect()
        )
        con = duckdb.connect()
        want = [
            r[0]
            for r in con.execute(
                f"""
                WITH t AS (
                  SELECT doc_id, url,
                         lower(regexp_extract(url,
                           '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]*)', 1)) AS host
                  FROM read_parquet('{corpus}/*.parquet')),
                n AS (SELECT host, COUNT(*) AS n FROM t GROUP BY 1)
                SELECT doc_id FROM t JOIN n USING (host)
                WHERE n <= {cap}
                   OR CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT)
                      * CAST(n AS DOUBLE) < {cap} * 4294967296.0
                ORDER BY doc_id
                """
            ).fetchall()
        ]
        assert got == want
        # under-cap hosts intact; the heaviest host lands near cap
        df_all = {r.doc_id for r in df.select("doc_id").collect()}
        kept = set(got)
        assert all(i in kept for i in range(40))  # h0 (40 urls) untouched
        h9 = [i for i in df_all if 1800 <= i < 2200]
        n9 = sum(1 for i in h9 if i in kept)
        assert 60 <= n9 <= 140, n9  # 400 urls @ p=0.25 -> ~100 +- binomial

    def test_determinism_across_partitionings(self, spark, corpus):
        df = spark.read.parquet(corpus)
        a = sorted(r.doc_id for r in cap_host_frequency(df, 100).select("doc_id").collect())
        b = sorted(
            r.doc_id
            for r in cap_host_frequency(df.repartition(13), 100).select("doc_id").collect()
        )
        assert a == b

    def test_plan_broadcast_only_corpus_never_shuffles(self, spark, corpus):
        """ONE exchange total (the slim host-count agg); the corpus joins
        the heavy-hitter table via broadcast — no sort-merge, no second
        hashpartitioning of the big side."""
        df = spark.read.parquet(corpus)
        p = _plan_of(cap_host_frequency(df, 100))
        assert "SortMergeJoin" not in p, p
        assert "BroadcastHashJoin" in p, p
        import re

        # formatted explain puts the node name and its hashpartitioning
        # Arguments on separate lines; BroadcastExchange must not count
        n_shuffles = len(re.findall(r"\(\d+\) Exchange\b", p))
        assert n_shuffles == 1, p


@pytest.fixture()
def captures(spark, tmp_path):
    """A calendar-trap host (3,000 urls, ~1 template), a session-id trap
    (1,200 urls, 1 template), and a healthy gallery host (1,500 urls
    across 500 distinct article slugs)."""
    path = str(tmp_path / "caps")
    cal = spark.range(0, 3000).select(
        F.concat(
            F.lit("http://trap-cal.example.com/cal/20"),
            (F.col("id") % 25).cast("string"),
            F.lit("/"),
            (F.col("id") % 12 + 1).cast("string"),
            F.lit("/"),
            (F.col("id") % 28 + 1).cast("string"),
            F.lit("?page="),
            F.col("id").cast("string"),
        ).alias("url")
    )
    ses = spark.range(0, 1200).select(
        F.concat(
            F.lit("http://trap-ses.example.com/view;jsid="),
            F.md5(F.col("id").cast("string")),  # 32-hex token -> {x}
            F.lit("/item"),
        ).alias("url")
    )
    art = spark.range(0, 1500).select(
        F.concat(
            F.lit("http://news.example.com/articles/story-slug-"),
            # letter slugs — numeric ones would (correctly!) collapse
            # into a single {n} template and read as a trap
            F.translate((F.col("id") % 500).cast("string"), "0123456789", "abcdefghij"),
            F.lit("-part"),
            (F.col("id") % 3).cast("string"),
        ).alias("url")
    )
    cal.unionByName(ses).unionByName(art).coalesce(2).write.mode(
        "overwrite"
    ).parquet(path)
    return path


class TestTrapDetection:
    def test_duckdb_exact_replay(self, spark, captures):
        got = [
            tuple(r)
            for r in url_pattern_stats(spark.read.parquet(captures))
            .orderBy("host")
            .collect()
        ]
        con = duckdb.connect()
        want = [
            tuple(r)
            for r in con.execute(
                f"""
                WITH t AS (
                  SELECT lower(regexp_extract(url,
                           '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/:?#]*)', 1)) AS host,
                         regexp_replace(regexp_replace(regexp_replace(
                           regexp_extract(url,
                             '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^#]*)', 1),
                           '[0-9a-fA-F]{{16,}}', '{{x}}', 'g'),
                           '[0-9]+', '{{n}}', 'g'),
                           '=[^&#/]*', '=*', 'g') AS template
                  FROM read_parquet('{captures}/*.parquet')
                  WHERE host <> ''),
                per AS (SELECT host, template, COUNT(*) AS c FROM t GROUP BY 1, 2),
                ranked AS (
                  SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY host ORDER BY c DESC, template DESC) AS rn
                  FROM per)
                SELECT p.host,
                       SUM(p.c) AS n_urls,
                       COUNT(*) AS n_templates,
                       ROUND(SUM(p.c) / CAST(COUNT(*) AS DOUBLE), 4)
                         AS urls_per_template,
                       MAX(CASE WHEN r.rn = 1 THEN r.template END) AS top_template,
                       ROUND(MAX(CASE WHEN r.rn = 1 THEN r.c END)
                             / CAST(SUM(p.c) AS DOUBLE), 4) AS top_share
                FROM per p JOIN ranked r
                  ON r.host = p.host AND r.template = p.template
                GROUP BY 1 ORDER BY 1
                """
            ).fetchall()
        ]
        assert got == want

    def test_flags_traps_not_galleries(self, spark, captures):
        flagged = trap_hosts(
            spark.read.parquet(captures), min_urls=1000, min_urls_per_template=50
        ).collect()
        hosts = [r.host for r in flagged]
        # cal: 3000 urls / 1 template; ses: 1200 / 1 — cal explodes harder
        assert hosts == ["trap-cal.example.com", "trap-ses.example.com"]
        cal, ses = flagged
        assert cal.top_template == "/cal/{n}/{n}/{n}?page=*"
        assert ses.n_templates == 1 and ses.top_template == "/view;jsid=*/item"
        # the gallery's 500 slugs survive as ~500/3 templates -> low ratio
        stats = {
            r.host: r
            for r in url_pattern_stats(spark.read.parquet(captures)).collect()
        }
        assert stats["news.example.com"].urls_per_template < 5

    def test_plan_slim_exchanges_only(self, spark, captures):
        """The url column must not cross either exchange — only (host,
        template) strings do."""
        p = _plan_of(url_pattern_stats(spark.read.parquet(captures)))
        import re

        for block in re.split(r"\n\(\d+\) ", p):
            if block.startswith("Exchange"):
                assert "url#" not in block, block


class TestTemplateRegexDialectParity:
    def test_template_matches_python_re_on_adversarial_urls(self, spark):
        """Guard against Java-regex vs documented-semantics drift: the
        full template chain (path+query extract, hex/digit/value masks)
        must agree with a plain Python `re` replay on adversarial inputs
        — unicode hosts/paths, %-encoding, empty paths, case-mixed hex,
        40-digit runs, matrix params, bare fragments. One Spark job."""
        import re

        def py_template(url):
            m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^#]*)", url)
            pq = m.group(1) if m else ""
            t = re.sub(r"[0-9a-fA-F]{16,}", "{x}", pq)
            t = re.sub(r"[0-9]+", "{n}", t)
            return re.sub(r"=[^&#/]*", "=*", t)

        urls = [
            "http://h/p", "http://h/", "http://h", "http://h?q=1", "http://h#f",
            "http://h/%e2%82%ac/p%20q", "http://h/café/日本語",
            "http://h/" + "9" * 40, "http://h/" + "aB3" * 20,
            "http://h/DEADbeefDEADbeef0123/x", "http://h/deadbee/x",  # 7 hex: no mask
            "http://h/a;jsid=ABC123/x?k=v&k2=v2#frag",
            "http://h/p?==&=&#", "http://h/p?a=1&b=&c",
            "ftp://files.example.org/pub/1.2.3/pkg.tgz",
            "http://h:8080/p/1", "http://user@h/p",  # port/userinfo in authority
            "not-a-url", "", "/relative/only", "//proto-relative/p",
            "http://h/٠١٢",  # arabic-indic digits: NOT [0-9]
            "http://h/p?x=a/b&y=c",  # '/' ends a value mask
        ]
        tagged = spark.createDataFrame(
            [(str(i), u) for i, u in enumerate(urls)], "i string, url string"
        )
        from warc_spark.operators.traps import url_template_expr

        got = {
            int(r.i): r.t
            for r in tagged.select("i", url_template_expr("url").alias("t")).collect()
        }
        mismatches = [
            (u, got[i], py_template(u))
            for i, u in enumerate(urls)
            if got[i] != py_template(u)
        ]
        assert not mismatches, mismatches

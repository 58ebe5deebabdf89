"""Physical-plan regression tests: the scale-design claims in README.md /
PLANS.md as assertions, so a refactor that silently loses pushdown, a
broadcast, or the corpus-stationary fetch join fails CI — not a 100 TB run.
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_pushdown_and_pruning(spark, sf_dir):
    """TPC-H Q6 shape (the Q6 leg of the merged q6_q14_q17 entry): every
    predicate reaches the parquet scan; that scan reads only the 4
    referenced columns (of 11). The plan also contains the Q14 and Q17
    legs' scans, so locate the Q6 scan by its pushed l_quantity AND
    l_shipdate (Q17's scans push quantity but never shipdate)."""
    from warc_spark.queries import queries

    p = plan_of(queries()["q6_q14_q17_scalar_metrics"](spark, sf_dir))
    pushed = [
        ln for ln in p.splitlines()
        if "PushedFilters" in ln and "l_quantity" in ln and "l_shipdate" in ln
    ][0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed
    reads = [
        ln for ln in p.splitlines()
        if "ReadSchema" in ln and "l_quantity" in ln and "l_shipdate" in ln
    ]
    assert reads and all("l_extendedprice" in r for r in reads)
    # the wide columns must be pruned away from the Q6 scan
    for absent in ("l_returnflag", "l_orderkey", "l_tax"):
        assert all(absent not in r for r in reads)


def test_q3_broadcasts_dimensions(spark, sf_dir):
    """customer/orders broadcast; no sort-merge join, so the lineitem fact
    side never shuffles for the join."""
    from warc_spark.queries import queries

    p = plan_of(queries()["q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_politeness_window_group_limit(spark):
    """The budget rank (row_number <= k) must trigger WindowGroupLimit —
    per-partition top-k pruning BEFORE the window shuffle, the first line
    of defense against hot-host skew."""
    from warc_spark.operators.politeness import flag_politeness

    df = spark.range(0, 1000).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 13).cast("double").alias("priority"),
    )
    kept = flag_politeness(df, None, default_budget=5).filter(F.col("kept"))
    assert "WindowGroupLimit" in plan_of(kept)


def test_bloom_probe_map_no_exchange(spark):
    """probe_with_map must not shuffle the candidate side: membership is a
    broadcast blob map + scalar pandas UDF."""
    from warc_spark.operators.seen import BloomSeenSet

    bloom = BloomSeenSet(n_buckets=8, m_bits=1 << 12)
    cands = spark.range(0, 100).select(
        F.concat(F.lit("http://h"), F.col("id").cast("string"), F.lit(".x/p")).alias("url")
    )
    bc = spark.sparkContext.broadcast({0: bytes(1 << 9)})
    p = plan_of(bloom.probe_with_map(cands, bc))
    assert "Exchange" not in p
    assert "ArrowEvalPython" in p or "BatchEvalPython" in p


def test_fetch_join_corpus_stationary(spark):
    """The fetch join must consume the pages cache with NO exchange above
    the InMemoryTableScan: only the schedule side shuffles."""
    import tempfile

    from warc_spark.operators.frontier import FrontierConfig, FrontierEngine
    from warc_spark.plans.snapstore import SnapStore
    from warc_spark.sources.pages import synth_pages

    eng = FrontierEngine(
        spark, synth_pages(spark, 200, seed=1), SnapStore(tempfile.mkdtemp()),
        config=FrontierConfig(),
    )
    eng.pages.count()
    sched = spark.range(0, 50).select(
        F.concat(F.lit("http://h0.example.org/page/"), F.col("id").cast("string")).alias("url")
    )
    p = plan_of(sched.join(eng.pages, "url", "left"))
    assert "InMemoryTableScan" in p
    # at most ONE hash exchange on the join key (the schedule side); two
    # would mean the cached corpus lost its layout and is re-shuffling
    assert p.count("Exchange hashpartitioning(url") <= 1
    eng.pages.unpersist()


def _node_blocks(formatted_plan: str, node_name: str) -> list[str]:
    """The detail blocks ('(n) NodeName' + Input/Arguments lines) of every
    node whose name contains node_name, from explain('formatted') output."""
    import re

    blocks, cur = [], None
    for ln in formatted_plan.splitlines():
        if re.match(r"^\(\d+\) ", ln):
            if cur is not None:
                blocks.append("\n".join(cur))
                cur = None
            if node_name in ln:
                cur = [ln]
        elif cur is not None:
            cur.append(ln)
    if cur is not None:
        blocks.append("\n".join(cur))
    return blocks


def test_lsh_band_shuffle_carries_no_payload(spark, sf_dir):
    """The MinHash band self-join exchanges only (id, band, bucket) — the
    corpus text must NOT appear in any Exchange below the candidate join
    (r1's measured scale-killer: 2×bands × corpus text through the
    shuffle). Text re-attaches to the deduped pairs afterwards."""
    from warc_spark.queries import queries

    p = plan_of(queries()["doc_minhash_near_dups"](spark, sf_dir))
    blocks = _node_blocks(p, "Generate")
    assert blocks, "expected a band posexplode (Generate) in the LSH plan"
    for b in blocks:
        assert "posexplode" in b
        assert "_text" not in b, b


def test_embedding_lsh_band_shuffle_carries_no_vectors(spark, sf_dir):
    from warc_spark.queries import queries

    p = plan_of(queries()["emb_near_dup_pairs"](spark, sf_dir))
    blocks = _node_blocks(p, "Generate")
    assert blocks, "expected a table posexplode (Generate) in the LSH plan"
    for b in blocks:
        assert "posexplode" in b
        assert "_v#" not in b, b


def test_bucketed_corpus_join_has_single_exchange(spark, tmp_path):
    """The 100 TB corpus layout: a url-bucketed pages table joins the
    schedule side with NO exchange above the corpus scan — only the
    schedule side shuffles (into the bucket layout). This is the on-disk
    version of FrontierEngine's repartition+persist, valid across
    sessions without any cache."""
    from warc_spark.plans.layout import read_pages_bucketed, write_pages_bucketed
    from warc_spark.sources.pages import synth_pages

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    pages = synth_pages(spark, 2000, seed=42).select("url", "html")
    write_pages_bucketed(pages, "t_pages_bucketed", n_buckets=8)
    try:
        corpus = read_pages_bucketed(spark, "t_pages_bucketed")
        sched = spark.range(0, 500).select(
            F.concat(F.lit("http://host0.example.org/page/"), F.col("id").cast("string")).alias("url"),
            F.lit(1.0).alias("priority"),
        )
        # disable broadcast so the join must pick a shuffle strategy — the
        # bucketed side's layout then shows up as a missing Exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            p = plan_of(sched.join(corpus, "url", "left"))
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        import re as _re

        n_exchanges = len(_re.findall(r"\(\d+\) Exchange", p))
        assert n_exchanges == 1, p  # schedule side only; corpus is bucketed
        assert "SortMergeJoin" in p
        assert "Bucketed: true" in p or "SelectedBucketsCount" in p, p
    finally:
        spark.sql("DROP TABLE IF EXISTS t_pages_bucketed")


def test_distributed_probe_copartitioned_join(spark):
    """BloomSeenSet.probe(broadcast=False): with broadcast disabled, the
    candidate-blob join hash-partitions BOTH sides on bucket — the blob
    state is never collected or broadcast (the 10^10-URL membership
    plan)."""
    import re as _re

    from warc_spark.operators.seen import BloomSeenSet

    bloom = BloomSeenSet(n_buckets=8, m_bits=1 << 12)
    urls = spark.range(0, 200).select(
        F.concat(F.lit("http://h"), (F.col("id") % 10).cast("string"),
                 F.lit(".x/p"), F.col("id").cast("string")).alias("url")
    )
    blobs = bloom.build_blobs(urls)
    cands = spark.range(200, 400).select(
        F.concat(F.lit("http://h"), (F.col("id") % 10).cast("string"),
                 F.lit(".x/p"), F.col("id").cast("string")).alias("url")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(bloom.probe(cands, blobs, broadcast=False))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "BroadcastExchange" not in p, p
    assert "BroadcastHashJoin" not in p, p
    exchanges = [b for b in _node_blocks(p, "Exchange") if "bucket" in b]
    assert len(exchanges) >= 2, p  # both sides partition on the bucket key


def test_decontaminate_corpus_side_broadcast_only(spark, sf_dir):
    """The decontamination joins must both be broadcast (reference grams
    and contaminated-id set): the corpus side — 100 TB in production —
    never sort-merge-joins, and its exploded grams never enter a hash
    exchange."""
    from warc_spark.queries import queries

    p = plan_of(queries()["doc_decontaminate_agg"](spark, sf_dir))
    assert "SortMergeJoin" not in p, p
    assert "ShuffledHashJoin" not in p, p
    assert p.count("BroadcastHashJoin") >= 2, p
    # the fuzzy (MinHash) variant carries the same placement contract:
    # reference signatures broadcast, candidates verified via broadcast
    # joins — the corpus side never joins by shuffle
    pf = plan_of(queries()["doc_fuzzy_decontaminate"](spark, sf_dir))
    assert "SortMergeJoin" not in pf, pf
    assert "ShuffledHashJoin" not in pf, pf
    assert pf.count("BroadcastHashJoin") >= 3, pf


def test_pack_sequences_shuffle_is_slim(spark, sf_dir):
    """Sequence packing must shuffle only (doc_id, shard, n_tokens) —
    the document text never enters the exchange (token counts are
    computed by built-in expressions before the groupBy)."""
    from warc_spark.queries import queries

    p = plan_of(queries()["doc_pack_sequences"](spark, sf_dir))
    for b in _node_blocks(p, "Exchange"):
        assert "text" not in b, b


def test_cuckoo_distributed_probe_copartitioned_join(spark):
    """CuckooSeenSet.probe(broadcast=False): same placement contract as
    bloom — the fingerprint state is hash-partitioned on bucket alongside
    the candidates, never broadcast (the recrawl backend's tables are
    BIGGER than bloom bitmaps, so this path matters even more)."""
    from warc_spark.operators.seen import CuckooSeenSet

    ck = CuckooSeenSet(n_buckets=8, table_buckets=1 << 8)
    urls = spark.range(0, 200).select(
        F.concat(F.lit("http://h"), (F.col("id") % 10).cast("string"),
                 F.lit(".x/p"), F.col("id").cast("string")).alias("url")
    )
    blobs = ck.build_blobs(urls)
    cands = spark.range(200, 400).select(
        F.concat(F.lit("http://h"), (F.col("id") % 10).cast("string"),
                 F.lit(".x/p"), F.col("id").cast("string")).alias("url")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(ck.probe(cands, blobs, broadcast=False))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "BroadcastExchange" not in p, p
    assert "BroadcastHashJoin" not in p, p
    exchanges = [b for b in _node_blocks(p, "Exchange") if "bucket" in b]
    assert len(exchanges) >= 2, p


def test_resolve_redirects_edges_cached_no_leak(spark, tmp_path):
    """resolve_redirects persists the slim edge projection for the K=8
    hop-joins (VERDICT r4 #5: uncached, the capture scan re-ran 8x),
    materializes the walk eagerly, and RELEASES the cache before
    returning (r5 review: a lazy return leaked one cached edge copy per
    call for the session lifetime). Contract: the returned frame is a
    checkpoint scan with ZERO parquet scans left in its plan, and the
    session's cache is empty afterwards."""
    from warc_spark.operators.redirects import resolve_redirects

    path = str(tmp_path / "caps")
    spark.range(0, 50).select(
        F.concat(F.lit("http://h/p"), F.col("id").cast("string")).alias("url"),
        F.when(F.col("id") % 3 == 0, F.lit(301)).otherwise(F.lit(200)).alias("http_status"),
        F.when(F.col("id") % 3 == 0,
               F.concat(F.lit("http://h/p"), (F.col("id") + 1).cast("string"))).alias("location"),
    ).write.mode("overwrite").parquet(path)
    caps = spark.read.parquet(path)
    spark.catalog.clearCache()
    try:
        # the r4 invariant, asserted on the LAZY plan (materialize=False):
        # the K=8 hop-joins consume an InMemoryTableScan and the capture
        # source is scanned a CONSTANT number of times (cache-build +
        # state + terminal = 3), not once per hop — so deleting the
        # edges.persist() fails here, not at 100x scale
        lazy = resolve_redirects(caps, max_hops=8, materialize=False)
        lazy.count()  # materialize the edge cache so the plan shows it
        lp = plan_of(lazy)
        assert "InMemoryTableScan" in lp, lp
        assert len(_node_blocks(lp, "Scan parquet")) <= 3, lp
    finally:
        spark.catalog.clearCache()
    out = resolve_redirects(caps, max_hops=8)
    p = plan_of(out)
    # the walk already ran: nothing left to scan, nothing left cached
    assert len(_node_blocks(p, "Scan parquet")) == 0, p
    assert "InMemoryTableScan" not in p, p
    jcache = spark._jsparkSession.sharedState().cacheManager()
    assert jcache.isEmpty(), "edge cache leaked past resolve_redirects"
    assert out.count() == 50


def test_wat_records_single_scan(spark, tmp_path):
    """wat_records builds all three envelope kinds (response, request,
    warcinfo) in ONE select over ONE pass of the records source (r5
    review #4: the previous three-filter union re-scanned — and for gzip
    WARCs re-gunzipped — the entire input three times per export)."""
    from warc_spark.sources.wet import wat_records

    path = str(tmp_path / "recs")
    spark.range(0, 30).select(
        F.when(F.col("id") % 3 == 0, F.lit("response"))
        .when(F.col("id") % 3 == 1, F.lit("request"))
        .otherwise(F.lit("warcinfo")).alias("warc_type"),
        F.when(F.col("id") % 3 != 2,
               F.concat(F.lit("http://h/p"), F.col("id").cast("string"))).alias("target_uri"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_date"),
        F.encode(F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhi"), "UTF-8").alias("payload"),
        F.lit("sha1:AAAA").alias("payload_digest"),
        F.lit(0).cast("long").alias("offset"),
        F.lit(10).cast("long").alias("size"),
        F.concat(F.lit("<urn:uuid:r"), F.col("id").cast("string"), F.lit(">")).alias("record_id"),
        F.lit("part-0.warc.gz").alias("filename"),
    ).write.mode("overwrite").parquet(path)
    rows = wat_records(spark.read.parquet(path))
    p = plan_of(rows)
    assert len(_node_blocks(p, "Scan parquet")) == 1, p
    assert "Union" not in p, p
    got = rows.collect()
    assert len(got) == 30
    # warcinfo rows omit WARC-Target-URI; the others carry it
    for r in got:
        names = list(r.header_names)
        if '"record_type":"warcinfo"' in bytes(r.payload).decode():
            assert "WARC-Target-URI" not in names
        else:
            assert "WARC-Target-URI" in names

"""Host-level web-graph analytics: edge aggregation from resolved
out-links and an iterative weighted PageRank — the crawl-prioritization
layer of a web-scale pipeline (real crawl operators rank hosts/domains to
set fetch budgets and seed priorities; Common Crawl publishes exactly this
host-graph + centrality product). The reference library has no graph
surface (it stops at record I/O — /root/reference/warc/warc.py); this is
engine-level capability over the same extracted-link model
(``kernels/htmlext.extract_links`` -> ``operators/frontier`` emits).

Plan shape for 100 TB
---------------------
- ``host_edges``: links explode map-side; ONLY the two host strings cross
  the one (src_host, dst_host) exchange, partially aggregated before the
  shuffle (map-side combine). Page payloads never shuffle.
- ``pagerank``: the rank table is (host string, double) — slim even at
  10^8 hosts. Each iteration is edges ⋈ ranks on src (AQE broadcasts
  ranks while they fit; past that it is a co-partitioned shuffle join —
  persist ``edges`` once and every iteration reuses its partitioning)
  followed by a map-side-combined ``groupBy(dst)``. Node count and
  dangling mass are 1-row aggregates crossJoined back (broadcast nested
  loop by construction), so the whole K-iteration recurrence is ONE lazy
  declarative plan with ZERO driver-side actions or collects.
- For large K, pass ``persist_every`` to cut lineage (otherwise the plan
  tree grows linearly in K; K<=10 is fine uncut).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# mirrors kernels/urlnorm._URL_RE's host group, as a pure JVM expression
# (lower-cased, trailing root-dot stripped) — SQL-replayable in oracles
_HOST_PATTERN = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]*)"


def host_of_expr(url) -> Column:
    """Host of a url column as a codegen'd JVM expression (no UDF):
    lower-case, trailing dot stripped; '' for non-absolute urls."""
    col = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(col, _HOST_PATTERN, 1))
    return F.regexp_replace(host, r"\.+$", "")


def host_edges(
    pages: DataFrame, url_col: str = "url", links_col: str = "out_links"
) -> DataFrame:
    """``(src, dst, weight)`` host-graph edges from a pages table carrying
    a page url and an array of resolved out-link urls. Weight = number of
    links from src-host pages to dst-host urls (self-loops kept — they are
    real intra-host links and PageRank handles them). Non-absolute urls on
    either side drop out."""
    return (
        pages.select(
            host_of_expr(url_col).alias("src"),
            F.explode(F.col(links_col)).alias("_link"),
        )
        .select("src", host_of_expr(F.col("_link")).alias("dst"))
        .where((F.col("src") != "") & (F.col("dst") != ""))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    persist_every: int = 0,
    cache_static: bool = True,
) -> DataFrame:
    """Weighted PageRank over a ``(src, dst, weight)`` edge table.

    Standard recurrence with dangling-mass redistribution::

        pr_0(v)     = 1/N
        pr_{k+1}(v) = (1-d)/N + d * (sum_{u->v} pr_k(u) * w(u,v)/out_w(u)
                                     + dangling_k / N)

    where ``dangling_k`` is the rank mass sitting on nodes with no
    out-edges (so total mass stays 1 every iteration — the uniform
    teleport absorbs it, the textbook formulation). Returns one row per
    node: ``(host, pagerank, out_degree, in_degree)`` — degrees are
    distinct-neighbor counts. Deterministic at any parallelism up to
    float-sum ordering (callers comparing across engines should round).

    ``cache_static`` (default on) lazily persists the iteration-invariant
    frames (normalized edge shares, node set, source-node set) — without
    it Spark recomputes the edge aggregation subtree once per USE (~4x
    per iteration; exchange reuse recovers only part of it), which at
    100 TB means re-scanning the corpus K times. Lazy ``persist`` keeps
    the whole recurrence action-free and lineage-recoverable; caches
    belong to the session until it clears them (the GraphX/ALS trade).
    """
    if cache_static:
        edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    n_row = nodes.agg(F.count("*").cast("double").alias("n_nodes"))
    out_w = edges.groupBy("src").agg(
        F.sum("weight").alias("out_w"), F.count("*").alias("out_degree")
    )
    in_deg = edges.groupBy("dst").agg(F.count("*").alias("in_degree"))
    share = edges.join(out_w.select("src", "out_w"), "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("share")
    )
    src_nodes = out_w.select(F.col("src").alias("host"))
    if cache_static:
        nodes = nodes.persist()
        share = share.persist()
        src_nodes = src_nodes.persist()

    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "host", (F.lit(1.0) / F.col("n_nodes")).alias("pr")
    )
    for k in range(iterations):
        flow = (
            share.join(ranks, share.src == ranks.host)
            .select(F.col("dst").alias("host"), (F.col("pr") * F.col("share")).alias("c"))
            .groupBy("host")
            .agg(F.sum("c").alias("flow"))
        )
        dangling = (
            ranks.join(src_nodes, "host", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dangling"))
        )
        ranks = (
            nodes.join(flow, "host", "left")
            .crossJoin(F.broadcast(n_row))
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit(1.0 - damping) / F.col("n_nodes")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("flow"), F.lit(0.0))
                        + F.col("dangling") / F.col("n_nodes")
                    )
                ).alias("pr"),
            )
        )
        if persist_every and (k + 1) % persist_every == 0 and k + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)

    return (
        ranks.join(out_w.select(F.col("src").alias("host"), "out_degree"), "host", "left")
        .join(in_deg.select(F.col("dst").alias("host"), "in_degree"), "host", "left")
        .select(
            "host",
            F.col("pr").alias("pagerank"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    cache_static: bool = True,
) -> DataFrame:
    """Undirected connected components over a ``(src, dst, *)`` edge
    table by iterated min-label propagation: every node starts labeled
    with itself; each round a node takes the minimum label among itself
    and its neighbors; fixpoint = components (label = lexicographically
    smallest member — deterministic, no hashing). Converges in
    O(graph diameter) rounds; host graphs are shallow (small-world), so
    the default cap is generous. Returns ``(host, component)``.

    Unlike ``pagerank`` this loop needs a convergence test, so each round
    runs ONE metadata-only action: a count over the (label-changed) rows
    — no row data ever reaches the driver. Each round's labels persist
    lazily and the previous round unpersists after the check; labels are
    (host, label) string pairs, slim at any scale. The propagation join
    is host-keyed both ways (AQE broadcasts while labels fit)."""
    sym = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    if cache_static:
        sym = sym.persist()
    labels = (
        sym.select(F.col("src").alias("host"))
        .distinct()
        .select("host", F.col("host").alias("component"))
    )
    if cache_static:
        labels = labels.persist()
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.host)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        nxt = (
            labels.join(
                neighbor_min, labels.host == neighbor_min.src, "left"
            )
            .select(
                "host",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (F.col("nmin") < F.col("component")).alias("_changed"),
            )
            .persist()
        )
        changed = nxt.where(F.col("_changed")).count()  # metadata-only action
        prev, labels = labels, nxt.drop("_changed")
        prev.unpersist()
        if changed == 0:
            break
    return labels

"""The frontier loop (SURVEY.md §2.B E9-E11): BFS-ish batched crawl with
fetch simulation, URL-seen dedup, robots gating, politeness budgets, salted
priority ordering, and per-batch snapshot checkpointing.

Batch semantics (the contract the pure-Python oracle simulator in
tests/oracle_sim.py replicates exactly):

1. candidates   = frontier urls not in the seen set (bloom prefilter +
                  exact anti-join rescue — no false drops)
2. robots gate  : disallowed urls are *dropped permanently* (added to seen,
                  never scheduled)
3. politeness   : per host keep top ``budget`` by (priority desc, url);
                  the rest *stay in the frontier* for the next batch
4. scheduled    : fetched (simulated: looked up in the pages table — the
                  reference's from_response hook, warc/warc.py:215-242,
                  with the network replaced by the deterministic pages
                  corpus); links extracted from html
5. next frontier: politeness-deferred ∪ extracted links (priority =
                  parent*decay, max-merged per url), minus seen
6. checkpoint   : scheduled/frontier/bloom written, manifest committed

Determinism: every cut is keyed by (priority desc, url); priorities are
IEEE doubles produced by max/multiply only (associative-safe); seeds and
page links are seed-derived. So the batch-number + rank of every url is
reproducible at any parallelism — the crawl-ordering oracle (BASELINE.json
north_rule).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..plans.snapstore import SnapStore
from .politeness import apply_politeness
from .priority import salted_priority_order
from .robots import apply_robots, url_host
from .seen import BloomSeenSet


@dataclass
class FrontierConfig:
    default_budget: int = 4
    decay: float = 0.8
    max_batches: int = 20
    n_salts: int = 8
    use_bloom: bool = True
    bloom_buckets: int = 32
    bloom_bits: int = 1 << 16
    min_priority: float = 1e-6

    def asdict(self) -> dict[str, Any]:
        return self.__dict__.copy()


_extract_links = None
_extract_text = None


def _links_udf():
    """Vectorized link extraction from the WARC html bytes."""
    global _extract_links
    if _extract_links is None:
        from ..sources.pages import extract_links_kernel

        _extract_links = F.pandas_udf(extract_links_kernel, ArrayType(StringType()))
    return _extract_links


def _text_udf():
    """Vectorized text extraction (the byte-identity invariant kernel)."""
    global _extract_text
    if _extract_text is None:
        from ..sources.pages import extract_text_kernel

        _extract_text = F.pandas_udf(extract_text_kernel, StringType())
    return _extract_text


class FrontierEngine:
    """Driver-side loop over distributed batches; all heavy ops are
    DataFrame transformations, the loop itself only sequences batches and
    commits snapshots."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        store: SnapStore,
        robots: DataFrame | None = None,
        budgets: DataFrame | None = None,
        config: FrontierConfig | None = None,
    ):
        self.spark = spark
        self.store = store
        self.robots = robots
        self.budgets = budgets
        self.cfg = config or FrontierConfig()
        # pages are looked up per batch; cache the (url -> html) projection
        self.pages = pages.select(
            "url", "html"
        ).persist()
        self.bloom = BloomSeenSet(
            n_buckets=self.cfg.bloom_buckets, m_bits=self.cfg.bloom_bits
        )

    # -- state loading ------------------------------------------------------
    def _empty_seen(self) -> DataFrame:
        return self.spark.createDataFrame([], "url string")

    def _with_host(self, df: DataFrame) -> DataFrame:
        return df.withColumn("host", url_host(F.col("url")))

    def run(self, seeds: DataFrame, resume: bool = False) -> list[dict]:
        """Run the crawl (optionally resuming from the last committed
        snapshot). Returns the list of batch manifests."""
        cfg = self.cfg
        last = self.store.latest() if resume else None
        if last is not None:
            start = last + 1
            frontier = self.store.read_df(self.spark, last, "frontier")
            seen = self.store.read_all_scheduled(self.spark, last).select("url")
            blobs = (
                self.store.read_df(self.spark, last, "bloom")
                if cfg.use_bloom
                else None
            )
        else:
            start = 0
            frontier = (
                self._with_host(seeds.select("url", "priority"))
                .groupBy("url", "host")
                .agg(F.max("priority").alias("priority"))
            )
            seen = self._empty_seen()
            blobs = None

        manifests: list[dict] = []
        for batch in range(start, cfg.max_batches):
            m = self._run_batch(batch, frontier, seen, blobs)
            if m is None:
                break
            manifests.append(m)
            frontier = self.store.read_df(self.spark, batch, "frontier")
            seen = self.store.read_all_scheduled(self.spark, batch).select("url")
            if cfg.use_bloom:
                blobs = self.store.read_df(self.spark, batch, "bloom")
        return manifests

    def _run_batch(
        self,
        batch: int,
        frontier: DataFrame,
        seen: DataFrame,
        blobs: DataFrame | None,
    ) -> dict | None:
        cfg = self.cfg
        t0 = time.time()

        # 1. membership: bloom prefilter + exact rescue (no false drops)
        candidates = self.bloom.filter_new(frontier, blobs, seen)

        # 2. robots gate — blocked urls are permanently retired.
        # ``allowed`` feeds three downstream consumers (politeness cut,
        # deferred set, blocked diff): persist so the probe/gate chain runs
        # once per batch, not once per consumer.
        allowed = apply_robots(candidates, self.robots).persist()
        blocked = (
            candidates.join(allowed.select("url"), "url", "left_anti")
            if self.robots is not None
            else None
        )

        # 3. politeness cut; the deferred remainder stays pending
        scheduled = apply_politeness(
            allowed,
            self.budgets,
            default_budget=cfg.default_budget,
        )
        # salted fetch-order partitioning (the executor-side hot path).
        # Crawl order is data: (batch, priority desc, url) is a total order —
        # no global rank window (a single-partition serialization point).
        scheduled = salted_priority_order(
            scheduled, n_salts=cfg.n_salts
        ).withColumn("batch", F.lit(batch))

        # 4. fetch simulation + page processing: the politeness cut bounds
        # |scheduled|, so broadcast it into the pages scan — the (huge)
        # pages table is never shuffled. Each fetched page does the real
        # pipeline work: link extraction + text extraction + payload digest.
        fetched = (
            self.pages.join(F.broadcast(scheduled), "url", "right")
            .withColumn("status", F.when(F.col("html").isNotNull(), "found").otherwise("missing"))
            .withColumn(
                "links",
                F.when(
                    F.col("html").isNotNull(), _links_udf()(F.col("html"))
                ).otherwise(F.array().cast("array<string>")),
            )
            .withColumn(
                "text_extracted",
                F.when(F.col("html").isNotNull(), _text_udf()(F.col("html"))),
            )
            .withColumn(
                "digest",
                F.when(
                    F.col("html").isNotNull(),
                    F.concat(F.lit("sha1:"), F.sha1(F.col("html"))),
                ),
            )
            .drop("html")
            .persist()
        )

        sched_info = self.store.write_df(
            fetched.select(
                "url", "host", "priority", "batch", "salt",
                "status", F.size("links").alias("n_links"),
                "text_extracted", "digest",
            ),
            batch,
            "scheduled",
        )
        if sched_info["rows"] == 0:
            allowed.unpersist()
            fetched.unpersist()
            return None

        fetched_back = self.store.read_df(self.spark, batch, "scheduled")

        # 5. next frontier = deferred ∪ new links, max-merged, minus seen
        deferred = allowed.join(
            fetched_back.select("url"), "url", "left_anti"
        ).select("url", "host", "priority")
        new_links = (
            fetched.select(
                F.col("priority").alias("_pp"), F.explode("links").alias("url")
            )
            .withColumn("priority", F.col("_pp") * cfg.decay)
            .filter(F.col("priority") >= cfg.min_priority)
            .drop("_pp")
        )
        new_links = self._with_host(new_links).select("url", "host", "priority")
        retired = fetched_back.select("url")
        if blocked is not None:
            retired = retired.unionByName(blocked.select("url"))
        next_frontier = (
            deferred.unionByName(new_links)
            .groupBy("url", "host")
            .agg(F.max("priority").alias("priority"))
            .join(seen.unionByName(retired), "url", "left_anti")
        )
        frontier_info = self.store.write_df(next_frontier, batch, "frontier")

        # 6. seen-set state: merge this batch's urls into the bloom blobs
        tables = {"scheduled": sched_info, "frontier": frontier_info}
        if cfg.use_bloom:
            new_blobs = self.bloom.build_blobs(
                retired if self.robots is not None else fetched_back.select("url")
            )
            merged = (
                self.bloom.merge_blobs(blobs, new_blobs)
                if blobs is not None
                else new_blobs
            )
            tables["bloom"] = self.store.write_df(merged, batch, "bloom")

        n_blocked = blocked.count() if blocked is not None else 0
        status_row = fetched_back.agg(
            F.sum(F.when(F.col("status") == "found", 1).otherwise(0)).alias("found"),
            F.sum(F.when(F.col("status") == "missing", 1).otherwise(0)).alias("missing"),
            F.sum("n_links").alias("links_extracted"),
        ).first()
        metrics = {
            "batch": batch,
            "scheduled": sched_info["rows"],
            "found": int(status_row["found"] or 0),
            "missing": int(status_row["missing"] or 0),
            "links_extracted": int(status_row["links_extracted"] or 0),
            "robots_blocked": n_blocked,
            "frontier_after": frontier_info["rows"],
            "wall_sec": round(time.time() - t0, 3),
        }
        metrics["urls_per_sec"] = (
            round(metrics["scheduled"] / metrics["wall_sec"], 1)
            if metrics["wall_sec"]
            else None
        )
        allowed.unpersist()
        fetched.unpersist()
        self.store.commit(batch, tables, metrics, self.cfg.asdict())
        return self.store.manifest(batch)

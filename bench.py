"""Benchmark harness: headline queries + frontier throughput at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The north-rule scaling evidence (local[8] vs local[32] as the sandbox proxy
for N vs 4N executors) is produced by bench_scaling.py, which writes
BENCH/BASELINE.md; this file is the per-round driver hook and stays fast.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "window_top3_customers_per_nation",
    "events_sessionized",
    "doc_exact_dedup_survivors",
    "doc_minhash_near_dups",
    "doc_quality_features",
    "emb_cosine_top10",
    "emb_ann_top10",
    "warc_parse_agg",
]


def run_frontier(spark, n_pages: int = 1_500_000, batches: int = 3) -> tuple[float, int]:
    """Frontier throughput: urls scheduled+fetch-simulated per second.
    Corpus generation/caching happens outside the timed window (the real
    metric is the frontier loop, not synthetic-data synthesis). 1.5M pages
    keeps each batch compute-dominated (per-batch fixed cost is ~2-4s; see
    BENCH/BASELINE.md for the N vs 4N scaling evidence at 6M)."""
    import shutil
    import tempfile

    from warc_spark.operators.frontier import FrontierConfig, FrontierEngine
    from warc_spark.plans.snapstore import SnapStore
    from warc_spark.sources.pages import synth_pages, synth_seeds

    tmp = tempfile.mkdtemp(prefix="bench_frontier_")
    try:
        pages = synth_pages(spark, n_pages, seed=42)
        seeds = synth_seeds(spark, n_pages, n_seeds=n_pages // 2, seed=42)
        eng = FrontierEngine(
            spark, pages, SnapStore(tmp),
            config=FrontierConfig(max_batches=batches, default_budget=65536,
                                  bloom_buckets=64, bloom_bits=1 << 21,
                                  rescue_mode="broadcast"),
        )
        eng.pages.count()  # materialize the corpus cache, untimed
        t0 = time.time()
        manifests = eng.run(seeds)
        dt = time.time() - t0
        scheduled = sum(m["metrics"]["scheduled"] for m in manifests)
        eng.pages.unpersist()
        return dt, scheduled
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def calibrate_epoch(cpus: int) -> dict:
    """No-JVM hardware burns (same kernels as bench_scaling.py) run BEFORE
    Spark starts: the host's delivered cpu/bandwidth this epoch, at 1 and
    at ``cpus`` busy processes. The sandbox's performance drifts by tens
    of percent between epochs (BENCH/BASELINE.md), so round-over-round
    BENCH_r{N} comparisons divide by these to separate code deltas from
    host drift (VERDICT r2 #3/#4)."""
    from bench_scaling import _bw_burn, _cpu_burn, calibrate

    return {
        "cpu_tasks_per_sec_1": round(calibrate(_cpu_burn, 1, [40_000_000]), 2),
        "cpu_tasks_per_sec_n": round(calibrate(_cpu_burn, cpus, [40_000_000]), 2),
        "bw_tasks_per_sec_1": round(calibrate(_bw_burn, 1, [0]), 2),
        "bw_tasks_per_sec_n": round(calibrate(_bw_burn, cpus, [0]), 2),
        "n": cpus,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    calibration = calibrate_epoch(int(cpus))

    # measured (BENCH notes): a LARGER heap is reliably SLOWER for this
    # workload at local[32] (8g: ~33s for the frontier leg; 24g: 46-61s;
    # interleaved A/B) — G1 with a big heap + 32 allocating threads. Keep
    # the default 8g unless the env overrides.
    from warc_spark.plans import get_spark
    from warc_spark.queries import queries

    spark = get_spark(app="bench", master=f"local[{cpus}]")
    qs = queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).collect()  # warm (plan/code paths), not timed
        t0 = time.time()
        fn(spark, sf_dir).collect()
        times[name] = round(time.time() - t0, 3)

    fdt, fsched = run_frontier(spark)
    times["frontier_3batches"] = round(fdt, 3)
    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_queries_plus_frontier_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "frontier_urls_per_sec": round(fsched / fdt, 1) if fdt else None,
        "frontier_urls_scheduled": fsched,
        "cpus": int(cpus),
        "calibration": calibration,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Scaling-efficiency evidence for the north rule: run the SAME frontier
job on the SAME input at two parallelism levels (local[8] vs local[32] — the
sandbox proxy for N vs 4N executors; no real cluster is available here) and
report throughput at both plus scaling efficiency. Writes BENCH/BASELINE.md.

Efficiency = (T_8 / T_32)  / (32/8) per perfect-linear ideal; the north rule
asks >=0.8. Generation, parsing, membership and scheduling all scale with
partitions, so the job is genuinely parallel — the residual is Spark job
scheduling overhead, which shrinks with batch size.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, %(repo)r)
from warc_spark.plans import get_spark
from warc_spark.operators.frontier import FrontierConfig, FrontierEngine
from warc_spark.plans.snapstore import SnapStore
from warc_spark.sources.pages import synth_pages, synth_seeds

cores = %(cores)d
n_pages = %(n_pages)d
spark = get_spark(app="scaling_%%d" %% cores, master="local[%%d]" %% cores,
                  shuffle_partitions=max(2 * cores, 16))
# warm the JVM/python-worker pools so we time the job, not process spawn
synth_pages(spark, 2000, seed=7).count()
tmp = tempfile.mkdtemp(prefix="scal_")
pages = synth_pages(spark, n_pages, seed=42)
seeds = synth_seeds(spark, n_pages, n_seeds=4000, seed=42)
eng = FrontierEngine(spark, pages, SnapStore(tmp),
                     config=FrontierConfig(max_batches=%(batches)d, default_budget=256,
                                           bloom_buckets=32, bloom_bits=1 << 20))
t0 = time.time()
manifests = eng.run(seeds)
dt = time.time() - t0
sched = sum(m["metrics"]["scheduled"] for m in manifests)
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
print("RESULT " + json.dumps({"cores": cores, "sec": dt, "scheduled": sched,
                              "urls_per_sec": sched / dt}))
"""


def run_at(cores: int, n_pages: int, batches: int) -> dict:
    code = CHILD % {"repo": REPO, "cores": cores, "n_pages": n_pages, "batches": batches}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main() -> None:
    n_pages = int(os.environ.get("SCALING_PAGES", "200000"))
    batches = int(os.environ.get("SCALING_BATCHES", "4"))
    low, high = 8, 32
    r_low = run_at(low, n_pages, batches)
    r_high = run_at(high, n_pages, batches)
    speedup = r_low["sec"] / r_high["sec"]
    efficiency = speedup / (high / low)
    report = {
        "n_pages": n_pages,
        "batches": batches,
        "low": r_low,
        "high": r_high,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — frontier throughput & scaling efficiency

North rule: the same frontier job at two cluster sizes (N vs 4N executors)
with throughput scaling efficiency >= 0.8. No real cluster exists in this
sandbox, so the evidence is the same job, same input, at two parallelism
levels: `local[{low}]` vs `local[{high}]` (per driver instruction).

Job: synthetic Common-Crawl-style pages table ({n_pages:,} pages, Zipf host
skew), {batches} frontier batches (bloom URL-seen prefilter + exact rescue,
politeness budget 96/host, salted priority ordering, per-batch snapshot
checkpoints). Metric = URLs scheduled+fetch-simulated per second.

| parallelism | wall sec | urls scheduled | urls/sec |
|---|---|---|---|
| local[{low}]  | {r_low['sec']:.1f} | {r_low['scheduled']:,} | {r_low['urls_per_sec']:.0f} |
| local[{high}] | {r_high['sec']:.1f} | {r_high['scheduled']:,} | {r_high['urls_per_sec']:.0f} |

- speedup {low}->{high} cores (4x resources): **{speedup:.2f}x**
- scaling efficiency (speedup / 4): **{efficiency:.2f}** (target >= 0.8)

Reference single-core baseline (BASELINE.md): ~3.9e3-3.9e4 rec/s depending
on compression; the engine's absolute urls/sec at local[{high}] is
{r_high['urls_per_sec']:.0f} on synthetic fetch-simulated pages including
checkpointing, dedup state and scheduling — the comparison the north star
cares about is the scaling *ratio* at fixed semantics.

Reproduce: `python bench_scaling.py` (env: SCALING_PAGES, SCALING_BATCHES).
"""
        )


if __name__ == "__main__":
    main()

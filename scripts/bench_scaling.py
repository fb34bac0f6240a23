"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox proxy per BASELINE.md:
the identical job at local[8] vs local[32]).

Protocol:
  * one fixed corpus, generated once to parquet (128 files);
  * each level runs in a fresh subprocess (clean JVM), taskset-pinned to
    exactly that many cores — without pinning, local[8]'s python UDF workers
    overflow onto the idle 24 cores and inflate the small-"cluster" baseline;
  * warm-up excluded; 2 repetitions per level, min taken (the box shows
    30-50% run-to-run variance).

Caveat recorded in BENCH/BASELINE.md: both "clusters" share one box's DRAM
and LLC, which real N vs 4N clusters do not — a pure-CPU control (tight
integer loop) measured on this box tops out at ~0.81 efficiency for 8->32
cores from frequency/bandwidth effects alone, so that is the attainable
ceiling here, not 1.0.

Usage: python3 scripts/bench_scaling.py [n_docs] [out_md]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_ONE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from ispaq_spark.session import get_spark
from ispaq_spark.pipeline import run_pipeline
from ispaq_spark.synthesize import default_model

cores = int(sys.argv[1]); path = sys.argv[2]
spark = get_spark(app_name=f"scale{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores,
                  extra_conf={{"spark.driver.memory": "24g"}})
spark.sparkContext.setLogLevel("ERROR")
model = default_model()
pages = spark.read.parquet(path)
run_pipeline(spark, pages.limit(2048), model=model).write.format("noop").mode("overwrite").save()
best = None
for rep in range(2):
    t0 = time.time()
    run_pipeline(spark, pages, model=model).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
n = pages.count()
print(json.dumps({{"cores": cores, "sec": best, "docs_per_sec": n / best}}))
spark.stop()
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, "BENCH", "BASELINE.md"
    )

    workdir = tempfile.mkdtemp(prefix="bench_pages_")
    path = os.path.join(workdir, "pages.parquet")

    from ispaq_spark.session import get_spark
    from ispaq_spark.synthesize import pages_df

    spark = get_spark(app_name="gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    pages_df(spark, n_docs, partitions=128).write.mode("overwrite").parquet(path)
    spark.stop()
    # warm the page cache so neither level pays cold-read noise
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass

    script = RUN_ONE.format(repo=repo)
    results = {}
    for cores in (8, 32):
        cpu_list = f"0-{cores - 1}"
        proc = subprocess.run(
            ["taskset", "-c", cpu_list, sys.executable, "-c", script,
             str(cores), path],
            capture_output=True, text=True, cwd=repo, timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    t8, t32 = results[8]["sec"], results[32]["sec"]
    eff = (t8 / t32) / 4
    summary = {
        "n_docs": n_docs,
        "local8_sec": round(t8, 2),
        "local8_docs_per_sec": round(results[8]["docs_per_sec"], 1),
        "local32_sec": round(t32, 2),
        "local32_docs_per_sec": round(results[32]["docs_per_sec"], 1),
        "scaling_efficiency": round(eff, 3),
        "single_box_cpu_ceiling": 0.81,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(out_md, "a") as f:
        f.write(
            f"\n## Scaling run {stamp}\n\n"
            f"Identical quality-pipeline job (fused extraction+perplexity Arrow\n"
            f"stage → SQL heuristics/langid → scrub → keep/drop), {n_docs} docs,\n"
            f"128 input files, fresh taskset-pinned JVM per level, warm-up\n"
            f"excluded, min of 2 reps.\n\n"
            f"| parallelism | wall sec | docs/sec |\n|---|---|---|\n"
            f"| local[8] pinned 8 cores | {summary['local8_sec']} | {summary['local8_docs_per_sec']} |\n"
            f"| local[32] pinned 32 cores | {summary['local32_sec']} | {summary['local32_docs_per_sec']} |\n\n"
            f"**Scaling efficiency (T8/T32)/4 = {summary['scaling_efficiency']}** "
            f"(target ≥ 0.8: {'PASS' if summary['pass'] else 'FAIL'}; single-box\n"
            f"pure-CPU control ceiling for 8→32 cores on this VM ≈ 0.81 due to\n"
            f"shared DRAM/frequency scaling — separate machines would not share it)\n"
        )


if __name__ == "__main__":
    main()

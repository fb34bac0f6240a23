"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors; sandbox proxy per BASELINE.md:
the identical job at local[8] vs local[32]).

Protocol:
  * one fixed corpus, generated once to parquet (128 files);
  * each level runs in a fresh subprocess (clean JVM), taskset-pinned to
    exactly that many cores — without pinning, local[8]'s python UDF workers
    overflow onto the idle 24 cores and inflate the small-"cluster" baseline;
  * warm-up excluded (one full untimed pass); 3 repetitions per level,
    min taken (the box shows 30-50% run-to-run variance).

Caveat recorded in BENCH/BASELINE.md: both "clusters" share one box's DRAM
and LLC, which real N vs 4N clusters do not — a pure-CPU control (tight
integer loop) measured on this box tops out at ~0.81 efficiency for 8->32
cores from frequency/bandwidth effects alone, so that is the attainable
ceiling here, not 1.0.

Usage: python3 scripts/bench_scaling.py [n_docs] [out_md] [N]
  N = small-cluster core count (default 8); levels run are (N, 4N).
  N=2 measures 2 vs 8 pinned cores — on a 32-core box that leaves the
  machine unsaturated at both levels, isolating the parallelism variable
  from whole-box frequency/DRAM effects that separate machines in a real
  N-vs-4N cluster would not share.
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
                  extra_conf={{"spark.driver.memory": "48g"}})
spark.sparkContext.setLogLevel("ERROR")
model = default_model()
pages = spark.read.parquet(path)
# FULL untimed warm-up pass: a limit() warm-up collapses to a few tasks,
# leaving the first timed run to pay every worker's broadcast unpickle +
# JIT + heap growth at once (measured 39s cold vs 5s warm at 60k docs).
run_pipeline(spark, pages, model=model).write.format("noop").mode("overwrite").save()
best = None
for rep in range(3):
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
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    levels = (n_small, n_small * 4)

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
    for cores in levels:
        cpu_list = f"0-{cores - 1}"
        proc = subprocess.run(
            ["taskset", "-c", cpu_list, sys.executable, "-c", script,
             str(cores), path],
            capture_output=True, text=True, cwd=repo, timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    lo, hi = levels
    t_lo, t_hi = results[lo]["sec"], results[hi]["sec"]
    eff = (t_lo / t_hi) / 4
    summary = {
        "n_docs": n_docs,
        "levels": list(levels),
        f"local{lo}_sec": round(t_lo, 2),
        f"local{lo}_docs_per_sec": round(results[lo]["docs_per_sec"], 1),
        f"local{hi}_sec": round(t_hi, 2),
        f"local{hi}_docs_per_sec": round(results[hi]["docs_per_sec"], 1),
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
            f"\n## Scaling run {stamp} (N={lo} vs 4N={hi})\n\n"
            f"Identical quality-pipeline job (fused extraction+perplexity+scrub\n"
            f"Arrow stage → SQL heuristics/langid → keep/drop), {n_docs} docs,\n"
            f"128 input files, fresh taskset-pinned JVM per level, ParallelGC,\n"
            f"one full untimed warm-up pass, min of 3 reps.\n\n"
            f"| parallelism | wall sec | docs/sec |\n|---|---|---|\n"
            f"| local[{lo}] pinned {lo} cores | {summary[f'local{lo}_sec']} | {summary[f'local{lo}_docs_per_sec']} |\n"
            f"| local[{hi}] pinned {hi} cores | {summary[f'local{hi}_sec']} | {summary[f'local{hi}_docs_per_sec']} |\n\n"
            f"**Scaling efficiency (T{lo}/T{hi})/4 = {summary['scaling_efficiency']}** "
            f"(target ≥ 0.8: {'PASS' if summary['pass'] else 'FAIL'}; a single box\n"
            f"shares DRAM bandwidth and frequency headroom across both levels —\n"
            f"a pure-CPU control tops out ≈ 0.81 for 8→32 cores here — which\n"
            f"separate machines in a real N-vs-4N cluster would not share)\n"
        )


if __name__ == "__main__":
    main()

"""Noise-controlled round-over-round per-query bench ratios.

Round-over-round per-query diffs from separate bench runs are
uninterpretable on this box: it shows 2-4x WHOLE-BOX bimodal slowdowns
(BENCH/BASELINE.md), so a query can look "3x regressed" purely because
round N ran in a slow phase. This script removes the box state from the
comparison by running the PREVIOUS round's implementation and the current
one INTERLEAVED in one process:

  * the previous round's `ispaq_spark` package is materialized from git
    (worktree of the given ref) and imported under a renamed package root
    (all intra-package imports are relative, so the copy is import-clean);
  * one taskset-style pinned JVM (sched_setaffinity before the gateway
    starts, inherited by the JVM and python workers) runs both versions;
  * per query, versions alternate prev/cur within each of 3 reps, so any
    box phase shift hits both versions equally; min-of-3 each;
  * output: per-query {prev_sec, cur_sec, ratio} JSON. bench.py merges it
    into the BENCH_DETAIL.json sidecar as `ratio_vs_prev` when present.

Usage:
    python3 scripts/bench_ratio.py <prev-git-ref> [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PIN_CORES = int(os.environ.get("SPARK_GRAFT_RATIO_CORES", "8"))
REPS = 3


def materialize_prev(ref: str) -> str:
    """Check out `ref` and copy its ispaq_spark under a renamed root."""
    tree = f"/tmp/_ratio_tree_{ref[:12]}"
    pkgroot = f"/tmp/_ratio_pkg_{ref[:12]}"
    if os.path.exists(tree):
        subprocess.run(
            ["git", "worktree", "remove", "--force", tree],
            cwd=REPO, check=False, capture_output=True,
        )
    shutil.rmtree(pkgroot, ignore_errors=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", tree, ref],
        cwd=REPO, check=True, capture_output=True,
    )
    os.makedirs(pkgroot)
    shutil.copytree(
        os.path.join(tree, "ispaq_spark"),
        os.path.join(pkgroot, "ispaq_spark_prev"),
    )
    return pkgroot


def main() -> None:
    ref = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH", "RATIO_vs_prev.json"
    )
    # pin BEFORE the JVM exists; everything it forks inherits the set
    os.sched_setaffinity(0, set(range(PIN_CORES)))

    pkgroot = materialize_prev(ref)
    sys.path.insert(0, pkgroot)
    # Executor python workers unpickle UDFs that reference
    # ispaq_spark_prev.*; they resolve imports from PYTHONPATH captured
    # when the JVM gateway launches, so export it BEFORE get_spark().
    os.environ["PYTHONPATH"] = pkgroot + os.pathsep + os.environ.get(
        "PYTHONPATH", ""
    )
    from ispaq_spark_prev import driver_queries as dq_prev  # noqa: E402

    from bench import BENCH_QUERIES, force  # noqa: E402
    from ispaq_spark import driver_queries as dq_cur  # noqa: E402
    from ispaq_spark.session import get_spark  # noqa: E402

    spark = get_spark(
        app_name="ispaq_spark_bench_ratio",
        master=f"local[{PIN_CORES}]",
        shuffle_partitions=PIN_CORES,
    )
    spark.sparkContext.setLogLevel("ERROR")

    prev_qs = dq_prev.queries()
    cur_qs = dq_cur.queries()
    names = [n for n in BENCH_QUERIES if n in prev_qs and n in cur_qs]
    skipped = [n for n in BENCH_QUERIES if n not in prev_qs]
    if skipped:
        print(f"new this round (no prev twin): {skipped}")

    # one throwaway pair to absorb first-job costs (codegen, workers)
    force(cur_qs[names[0]](spark, SF_DIR))
    force(prev_qs[names[0]](spark, SF_DIR))

    rows = {}
    for name in names:
        t_prev, t_cur = [], []
        for rep in range(REPS):
            # Alternate which version goes first each rep: a fixed
            # prev-first order hands per-query first-touch costs (codegen,
            # parquet page-cache warm) to prev on rep 1 and systematically
            # flatters cur; alternating splits the asymmetry across reps
            # and min-of-REPS then compares equally-warmed runs.
            order = (
                [(prev_qs, t_prev), (cur_qs, t_cur)]
                if rep % 2 == 0
                else [(cur_qs, t_cur), (prev_qs, t_prev)]
            )
            for qs, sink in order:
                t0 = time.time()
                force(qs[name](spark, SF_DIR))
                sink.append(time.time() - t0)
        p, c = min(t_prev), min(t_cur)
        rows[name] = {
            "prev_sec": round(p, 3),
            "cur_sec": round(c, 3),
            "ratio": round(c / p, 3) if p > 0 else None,
        }
        print(f"{name}: prev {p:.3f}s cur {c:.3f}s ratio "
              f"{(c / p) if p > 0 else float('nan'):.2f}")

    payload = {
        "prev_ref": ref,
        "sf_dir": SF_DIR,
        "pinned_cores": PIN_CORES,
        "protocol": (
            "interleaved prev/cur per rep (order alternates each rep), "
            "one pinned JVM, min-of-3"
        ),
        "queries": rows,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    # ratio is None when prev_sec rounded to 0 — skip, don't compare None
    worse = {
        n: r["ratio"]
        for n, r in rows.items()
        if r["ratio"] is not None and r["ratio"] > 1.5
    }
    better = {
        n: r["ratio"]
        for n, r in rows.items()
        if r["ratio"] is not None and r["ratio"] < 0.67
    }
    print(json.dumps({"n": len(rows), "gt_1.5x": worse, "lt_0.67x": better}))
    spark.stop()


if __name__ == "__main__":
    main()

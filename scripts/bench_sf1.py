"""Scale-tail bench: the operator suite at 10x bench scale (sf1 ~ 600k
docs), min-of-3, vs the same queries at sf0.1 — the empirical super-linearity
detector (a `pack_sequences`-class skew bug shows up here as a per-query
time ratio far above the 10x data ratio long before anyone owns a cluster).

Corpus construction (deterministic, no external data): each sf0.1 table is
replicated REPLICAS times with

  * key columns offset by replica * 100M (referential joins stay valid
    within a replica; dimension tables region/nation are NOT replicated —
    domains don't scale with corpus size);
  * document/text tokens suffixed with the replica id, so replicas share NO
    exact spans, n-grams, or LSH buckets: intra-replica duplicate structure
    is identical to sf0.1 and cross-replica structure is zero. Total dedup
    work therefore scales exactly linearly in the data — bucket COUNT grows
    10x, bucket SIZES stay constant — which is the honest scaling corpus (a
    naive 10x copy would square every bucket's pair count by construction
    and measure the data, not the engine). The trade-off: vocabulary also
    grows 10x, so vocab-sized shuffles (vocab_topk, bpe_pair_counts) are
    EXPECTED to scale super-unit in their reduce side; they are reported
    but judged against that expectation.

Excluded queries: the documented sf-small quadratic oracle twins
(jaccard_pairs, cosine_neardup, langid_nb_confusion, cogroup_xcorr) — their
production forms (LSH chain, broadcast scorer, xcorr_collected) ARE timed.

Output: per-query table (sf0.1 min-of-3, sf1 min-of-3, ratio) + one JSON
line; ratios > FLAG_RATIO are flagged. With 32 cores both runs are
parallelism-unconstrained, so a linear operator should show ratio <= ~10
plus fixed overhead amortization (often < 10).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/ispaq_sf1_scaled")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICAS = 10
BIG = 100_000_000
FLAG_RATIO = 13.0  # 10x data + noise margin; above this = super-linear

KEY_OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]

EXCLUDE = {
    "jaccard_pairs",
    "cosine_neardup",
    "langid_nb_confusion",
    "cogroup_xcorr",
}


def build_scaled(spark) -> None:
    from pyspark.sql import functions as F

    for name in COPY_ONLY:
        spark.read.parquet(f"{SRC_DIR}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT_DIR}/{name}.parquet")
    for name, keys in KEY_OFFSETS.items():
        base = spark.read.parquet(f"{SRC_DIR}/{name}.parquet")
        parts = []
        for i in range(REPLICAS):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * BIG))
            if name == "documents" and i > 0:
                suffix = F.lit(f"_{i}")
                df = df.withColumn(
                    "text",
                    F.when(
                        F.col("text").isNotNull(),
                        F.array_join(
                            F.transform(
                                F.split("text", " "),
                                lambda w: F.concat(w, suffix),
                            ),
                            " ",
                        ),
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(CPUS * 4).write.mode("overwrite").parquet(
            f"{OUT_DIR}/{name}.parquet"
        )


def main() -> None:
    from bench import BENCH_QUERIES, force
    from ispaq_spark import driver_queries as dq
    from ispaq_spark.session import get_spark

    spark = get_spark(
        app_name="ispaq_spark_bench_sf1",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # completion marker, not a table probe: a crash mid-build leaves some
    # tables written and later runs must NOT silently reuse the partial set
    marker = f"{OUT_DIR}/_BUILD_COMPLETE"
    if not os.path.exists(marker):
        t0 = time.time()
        build_scaled(spark)
        with open(marker, "w") as f:
            f.write(f"replicas={REPLICAS} src={SRC_DIR}\n")
        print(f"# built {OUT_DIR} in {time.time() - t0:.1f}s", flush=True)

    qs = dq.queries()
    names = [q for q in BENCH_QUERIES if q not in EXCLUDE]

    def min3(fn) -> float:
        return min(
            (lambda t0: (fn(), time.time() - t0)[1])(time.time())
            for _ in range(3)
        )

    rows = []
    for name in names:
        small = min3(lambda: force(qs[name](spark, SRC_DIR)))
        big = min3(lambda: force(qs[name](spark, OUT_DIR)))
        ratio = big / small if small > 0 else float("inf")
        rows.append((name, round(small, 3), round(big, 3), round(ratio, 2)))
        flag = "  <-- SUPER-LINEAR" if ratio > FLAG_RATIO else ""
        print(
            f"{name:28s} sf0.1={small:7.3f}s sf1={big:8.3f}s "
            f"ratio={ratio:6.2f}{flag}",
            flush=True,
        )

    flagged = [r for r in rows if r[3] > FLAG_RATIO]
    print(
        json.dumps(
            {
                "metric": "sf1_scale_tail",
                "sf_small_total": round(sum(r[1] for r in rows), 1),
                "sf1_total": round(sum(r[2] for r in rows), 1),
                "n_queries": len(rows),
                "flagged": {r[0]: r[3] for r in flagged},
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

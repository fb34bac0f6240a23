"""spark-submit entry point: pages parquet/table in -> resumable metrics
sink out.

The CLI surface of the reference (ispaq/ispaq.py:47 main: metric-set alias
x target x time range) as job arguments: --metric-sets picks registry
aliases (ispaq_spark/registry.py ALIASES), --days prunes partitions,
--salt-buckets engages domain salting, and the sink resumes from the
partition manifest (ispaq_spark/sinks.py).

  spark-submit --py-files dist/ispaq_spark.zip scripts/run_job.py \
      --input /data/pages --output /data/metrics \
      --metric-sets default --days 2024-03-01 2024-03-02 --salt-buckets 256
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--metric-sets", default="default")
    ap.add_argument("--days", nargs="*", default=None)
    ap.add_argument("--salt-buckets", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ispaq_spark.session import get_spark
    from ispaq_spark.sinks import run_resumable
    from ispaq_spark.synthesize import default_model

    spark = get_spark(app_name="ispaq_spark_job")
    pages = spark.read.parquet(args.input)
    if args.days:
        pages = pages.where(
            F.date_format("warc_ts", "yyyy-MM-dd").isin(args.days)
        )
    if args.salt_buckets:
        from ispaq_spark.pipeline import salt_repartition

        pages = salt_repartition(
            pages.withColumn("ds", F.date_format("warc_ts", "yyyy-MM-dd")),
            args.salt_buckets,
        )
    report = run_resumable(
        spark, pages, args.output,
        model=default_model(), metric_sets=args.metric_sets,
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()

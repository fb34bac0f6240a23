"""spark-submit entry point: declarative request -> resumable metrics sink.

The CLI surface of the reference (ispaq/ispaq.py:47: `ispaq.py -P prefs -M
metricAlias -S targetAlias --starttime ... --endtime ...`) re-targeted:
aliases resolve through the preference file (ispaq_spark/request.py, the
user_request.py:197-302 graft), unresolved names fall back to literal
registry set names / URL globs, and validation fails loudly on unknown
names.

  spark-submit --py-files dist/ispaq_spark.zip scripts/run_job.py \
      -P preference_files/default.txt -M default -S hotSites \
      --starttime 2024-03-01 --endtime 2024-03-03 \
      --input /data/pages --output /data/metrics --salt-buckets 256
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-P", "--preferences", default=None,
                    help="preference file (Metrics/Targets/Data_Access/Preferences)")
    ap.add_argument("-M", "--metrics", default="default",
                    help="metric-set alias or comma-separated set/column names")
    ap.add_argument("-S", "--stations", "--targets", dest="targets",
                    default=None, help="target alias or URL glob(s)")
    ap.add_argument("--starttime", default=None)
    ap.add_argument("--endtime", default=None)
    ap.add_argument("--input", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--salt-buckets", type=int, default=None)
    args = ap.parse_args()

    from ispaq_spark.request import build_request, run_request
    from ispaq_spark.session import get_spark
    from ispaq_spark.synthesize import default_model

    req = build_request(
        preferences_path=args.preferences,
        metrics=args.metrics,
        targets=args.targets,
        starttime=args.starttime,
        endtime=args.endtime,
        input_path=args.input,
        output_path=args.output,
    )
    if args.salt_buckets is not None:
        req.preferences["salt_buckets"] = args.salt_buckets

    spark = get_spark(app_name="ispaq_spark_job")
    report = run_request(spark, req, model=default_model())
    if isinstance(report, dict):
        print(json.dumps(report))
    else:  # no output path: materialize a row count as the job result
        print(json.dumps({"rows": report.count()}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Watermarked stream-stream join: labels arriving within the horizon
match; out-of-horizon labels never emit; pages buffered in the checkpoint
still match labels that arrive only in a later run (restart)."""

from __future__ import annotations

import datetime
import tempfile

from ispaq_spark.streaming.label_join import run_label_join_once

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _pages(spark, path, n):
    rows = [
        (f"https://ex.com/p/{i}", T0 + datetime.timedelta(hours=i))
        for i in range(n)
    ]
    spark.createDataFrame(rows, "url string, warc_ts timestamp").coalesce(
        1
    ).write.mode("append").parquet(path)


def _labels(spark, path, items):
    rows = [
        (f"https://ex.com/p/{i}", ts, lab) for i, ts, lab in items
    ]
    spark.createDataFrame(
        rows, "url string, label_ts timestamp, label string"
    ).coalesce(1).write.mode("append").parquet(path)


def test_label_join_within_horizon_and_across_restart(spark):
    pages_dir = tempfile.mkdtemp(prefix="lj_pages_")
    labels_dir = tempfile.mkdtemp(prefix="lj_labels_")
    ckpt = tempfile.mkdtemp(prefix="lj_ckpt_")
    out = tempfile.mkdtemp(prefix="lj_out_") + "/result"

    _pages(spark, pages_dir, 10)
    # run 1: labels for p0..p4 one hour after crawl (inside the 2-day
    # horizon) + a label for p8 TEN days later (outside -> must never emit)
    _labels(
        spark,
        labels_dir,
        [(i, T0 + datetime.timedelta(hours=i + 1), "ok") for i in range(5)]
        + [(8, T0 + datetime.timedelta(days=10), "late")],
    )
    run_label_join_once(spark, pages_dir, labels_dir, ckpt, out)
    got1 = spark.read.parquet(out).collect()
    assert {r["url"] for r in got1} == {
        f"https://ex.com/p/{i}" for i in range(5)
    }

    # run 2 (restart, same checkpoint): labels for p5..p7 arrive late in
    # WALL time but inside the horizon in EVENT time — the buffered page
    # state from run 1 must still match them
    _labels(
        spark,
        labels_dir,
        [(i, T0 + datetime.timedelta(hours=i + 2), "ok") for i in (5, 6, 7)],
    )
    run_label_join_once(spark, pages_dir, labels_dir, ckpt, out)
    got2 = spark.read.parquet(out).collect()
    assert {r["url"] for r in got2} == {
        f"https://ex.com/p/{i}" for i in range(8)
    }
    assert len(got2) == 8  # each pair exactly once; the day-10 label never

"""The north-rule correctness gates (BASELINE.json):
keep/drop F1 >= 0.99 and byte-identical scrubbed text vs the reference
labeler, over the deterministic fixture corpus."""

from __future__ import annotations

import pytest

from ispaq_spark.pipeline import (
    metrics_eav,
    rollup_histograms,
    rollup_lineage,
    run_pipeline,
)


@pytest.fixture(scope="module")
def pipeline_rows(spark, fixture_pages, model):
    out = run_pipeline(spark, fixture_pages, model=model)
    return {r["url"]: r for r in out.collect()}


def test_rowcount(pipeline_rows, fixture_labels):
    assert len(pipeline_rows) == len(fixture_labels) == 400


def test_keep_f1(pipeline_rows, fixture_labels):
    tp = fp = fn = 0
    for url, lab in fixture_labels.items():
        got = bool(pipeline_rows[url]["keep"])
        want = lab["keep"]
        tp += got and want
        fp += got and not want
        fn += (not got) and want
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"F1={f1} (tp={tp} fp={fp} fn={fn})"
    # exact parity expected, not just F1 — flag any drift loudly
    assert fp == 0 and fn == 0


def test_scrubbed_text_byte_identical(pipeline_rows, fixture_labels):
    for url, lab in fixture_labels.items():
        assert pipeline_rows[url]["scrubbed_text"] == lab["scrubbed_text"], url


def test_extracted_text_byte_identical(pipeline_rows, fixture_labels):
    for url, lab in fixture_labels.items():
        assert pipeline_rows[url]["extracted_text"] == lab["text"], url


def test_quarantine_flags(pipeline_rows, fixture_labels):
    n_err = 0
    for url, lab in fixture_labels.items():
        assert pipeline_rows[url]["quality_flag"] == lab["quality_flag"], url
        n_err += lab["quality_flag"] == -9
    assert n_err > 0  # fixture must exercise the quarantine path


def test_quarantined_rows_never_kept(pipeline_rows):
    for url, r in pipeline_rows.items():
        if r["quality_flag"] == -9:
            assert r["keep"] is False
            assert r["extracted_text"] is None


def test_lineage_rollup_sums(spark, fixture_pages, model, pipeline_rows):
    out = run_pipeline(spark, fixture_pages, model=model)
    roll = {r["partition_id"]: r for r in rollup_lineage(out).collect()}
    assert sum(r["docs_in"] for r in roll.values()) == 400
    for r in roll.values():
        assert r["docs_in"] == r["docs_kept"] + r["docs_dropped"] + r["docs_error"]


def test_histogram_rollup(spark, fixture_pages, model):
    out = run_pipeline(spark, fixture_pages, model=model)
    hist = rollup_histograms(out).collect()
    names = {r["metricName"] for r in hist}
    assert "stopword_ratio" in names and "perplexity" in names
    assert all(r["hits"] > 0 for r in hist)


def test_eav_unpivot(spark, fixture_pages, model):
    out = run_pipeline(spark, fixture_pages, model=model)
    eav = metrics_eav(out)
    per_doc = eav.groupBy("target").count().collect()
    assert all(r["count"] == 10 for r in per_doc)  # 10 metric names


def test_salted_run_same_result(spark, fixture_pages, model, pipeline_rows):
    salted = run_pipeline(spark, fixture_pages, model=model, salt_buckets=16)
    rows = {r["url"]: r for r in salted.collect()}
    assert len(rows) == len(pipeline_rows)
    for url, r in rows.items():
        assert bool(r["keep"]) == bool(pipeline_rows[url]["keep"])
        assert r["scrubbed_text"] == pipeline_rows[url]["scrubbed_text"]

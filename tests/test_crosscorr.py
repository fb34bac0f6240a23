"""Cogrouped two-stream cross-correlation operator (operators/crosscorr.py)."""

from __future__ import annotations

import datetime as dt

from ispaq_spark.operators.crosscorr import cogroup_xcorr, lagged_peak


def _t(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


def test_lagged_peak_identical_series():
    # Non-linear series: only the zero-lag alignment is perfectly
    # correlated, so lag 0 is the strict unique max.
    e = [1.0, 5.0, 2.0, 8.0, 3.0, 9.0]
    best = lagged_peak(e, list(e))
    assert best is not None
    lag, r, n = best
    assert lag == 0 and abs(r - 1.0) < 1e-12 and n == 6


def test_lagged_peak_tie_breaks_to_smaller_lag():
    # A linear RAMP correlates perfectly at EVERY eligible lag (any shift
    # of a linear series is still linear), so after the 6dp rounding the
    # argmax sees a genuine tie and the documented rule — smaller lag
    # wins — picks -1 (lag -2 has overlap 3 < MIN_OVERLAP). The DuckDB
    # oracle's ORDER BY round(corr, 6) DESC, lag ASC makes the same pick.
    e = [1.0, 2.0, 3.0, 4.0, 5.0]
    best = lagged_peak(e, list(e))
    assert best is not None
    lag, r, n = best
    assert lag == -1 and abs(r - 1.0) < 1e-12 and n == 4


def test_lagged_peak_detects_shift():
    # c is e delayed by one index: pairing e[i] with c[i+1] aligns them.
    e = [1.0, 5.0, 2.0, 8.0, 3.0, 9.0]
    c = [0.0] + e[:-1]
    lag, r, n = lagged_peak(e, c)
    assert lag == 1 and abs(r - 1.0) < 1e-12


def test_lagged_peak_too_short():
    assert lagged_peak([1.0, 2.0], [1.0, 2.0]) is None


def test_cogroup_xcorr_spark(spark):
    rows_l = [(1, _t(i), i, float(v)) for i, v in enumerate([1, 5, 2, 8, 3, 9])]
    rows_r = [(1, _t(i), 100 + i, float(v)) for i, v in enumerate([0, 1, 5, 2, 8, 3])]
    # user 2 exists only on the left -> no output row
    rows_l += [(2, _t(i), 200 + i, float(i)) for i in range(6)]
    schema = "user_id long, ts timestamp, event_id long, value double"
    left = spark.createDataFrame(rows_l, schema)
    right = spark.createDataFrame(rows_r, schema)
    out = {r["user_id"]: r for r in cogroup_xcorr(left, right).collect()}
    assert set(out) == {1}
    assert out[1]["best_lag"] == 1
    assert abs(out[1]["peak_corr"] - 1.0) < 1e-9

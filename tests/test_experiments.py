"""Unit tests for the experiment parity runner's pure functions —
summarization must mirror the reference's pandas methodology
(analyze_exp1.py) and the SVG scaffolding must never clip data."""

from __future__ import annotations

import math
import sys

import pytest

sys.path.insert(0, "/root/repo")

from experiments import (  # noqa: E402
    MEASURE_BATCHES,
    WARMUP_BATCHES,
    _quantile,
    _ticks,
    summarize_rate,
    window_measurement,
)


def test_ticks_cover_data_range():
    # Regression: ticks stopping below `hi` plotted the 50k point above the
    # axes (label at negative y).  The last tick must always cover hi.
    for lo, hi in [(0, 53920), (0, 1), (3, 97500), (0.5, 2.5), (1000, 50000)]:
        tk = _ticks(lo, hi)
        assert tk[0] <= lo + 1e-9
        assert tk[-1] >= hi - 1e-9, (lo, hi, tk)
        assert all(b > a for a, b in zip(tk, tk[1:]))


def test_quantile_matches_pandas_linear_interpolation():
    pd = pytest.importorskip("pandas")
    import random

    rng = random.Random(7)
    for n in (1, 2, 5, 20, 48):
        xs = [rng.uniform(0, 1000) for _ in range(n)]
        for q in (0.5, 0.95, 0.99):
            assert _quantile(xs, q) == pytest.approx(
                float(pd.Series(xs).quantile(q)), rel=1e-12
            )


class _Row:
    def __init__(self, i):
        self.batch_events = 1000 + i
        self.mean_latency_ms = 100.0 + i
        self.p50_latency_ms = 90.0 + i
        self.p95_latency_ms = 200.0 + i
        self.p99_latency_ms = 300.0 + i


def test_window_measurement_excludes_warmup_and_caps():
    rows = [_Row(i) for i in range(WARMUP_BATCHES + MEASURE_BATCHES + 10)]
    m = window_measurement(rows)
    assert len(m) == MEASURE_BATCHES
    assert m[0] is rows[WARMUP_BATCHES]
    # short-run fallback: fewer than 5 measured batches -> take all post-warmup
    short = [_Row(i) for i in range(WARMUP_BATCHES + 3)]
    assert len(window_measurement(short)) == 3
    # degenerate: nothing past warm-up -> use everything rather than nothing
    tiny = [_Row(i) for i in range(2)]
    assert window_measurement(tiny) == tiny


def test_summarize_rate_reference_columns():
    rows = [_Row(i) for i in range(10)]
    s = summarize_rate(7000, rows)
    assert set(s) == {
        "rate_eps_input", "batches_used", "throughput_eps_mean",
        "throughput_eps_p95", "lat_mean_ms_avg", "lat_p50_ms_avg",
        "lat_p95_ms_avg", "lat_p99_ms_avg", "lat_p95_ms_max",
    }
    assert s["rate_eps_input"] == 7000
    assert s["batches_used"] == 10
    assert s["throughput_eps_mean"] == pytest.approx(1004.5)
    assert s["lat_p95_ms_max"] == 209.0
    assert not any(
        isinstance(v, float) and math.isnan(v) for v in s.values()
    )

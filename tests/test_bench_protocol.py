"""Spark-free unit tests for bench.py's windowed-scaling protocol
mechanics (the instrument logic, not the measurements): the round-5c
control re-measure repairs a burst-corrupted CONTROL reading without
ever touching the Spark numbers, and leaves in-band windows alone.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _calm_instruments(monkeypatch):
    bench._T0[0] = time.monotonic()       # list singletons, not dicts
    bench._GATE_TIMEOUTS[0] = 0
    monkeypatch.setattr(bench, "RETRY_WAIT_S", 0.0)
    monkeypatch.setattr(bench, "_wait_calm", lambda deadline: True)
    monkeypatch.setattr(bench, "_probe_calm", lambda: True)
    monkeypatch.setattr(bench, "_probe_calm_par", lambda: True)


def _spark_fn(cores):
    # clean engine: lo=34 s, hi=10 s -> spark_eff (34/10)/4 = 0.85
    return (10.0, 7.5) if cores == bench.SCALE_HI else (34.0, 28.0)


def test_ctrl_remeasure_repairs_out_of_band_control(monkeypatch):
    """run10-w2 shape: ctrl_lo catches a burst -> ctrl_eff 1.2 (out of
    band) while every Spark instrument is green. The control pair is
    re-measured once; min per level restores the in-band reading and
    the Spark numbers are untouched."""
    _calm_instruments(monkeypatch)
    seq = iter([10.0, 48.0,   # window attempt 1: c_hi clean, c_lo burst
                10.0, 34.0])  # re-measure: both clean -> ctrl_eff 0.85
    monkeypatch.setattr(bench, "_pool_control",
                        lambda corpus, workers: next(seq))
    res = bench._windowed_scaling(_spark_fn, "unused", base_reps=1,
                                  ext_budget_s=0.0, max_pairs=1,
                                  tag="t")
    w = res["windows"][0]
    assert w["ctrl_remeasures"] == 1
    assert w["ctrl_lo"] == 34.0 and w["ctrl_hi"] == 10.0
    assert bench.CTRL_BAND[0] <= w["ctrl_eff"] <= bench.CTRL_BAND[1]
    assert w["spark_lo"] == 34.0 and w["spark_hi"] == 10.0  # untouched
    assert bench._window_clean(w)


def test_ctrl_remeasure_skips_in_band_control(monkeypatch):
    """A window whose control pair is already in band never re-measures
    (exactly 2 control region calls)."""
    _calm_instruments(monkeypatch)
    calls = []

    def pool(corpus, workers):
        calls.append(workers)
        return 10.0 if workers == bench.SCALE_HI else 34.0

    monkeypatch.setattr(bench, "_pool_control", pool)
    res = bench._windowed_scaling(_spark_fn, "unused", base_reps=1,
                                  ext_budget_s=0.0, max_pairs=1,
                                  tag="t")
    w = res["windows"][0]
    assert w["ctrl_remeasures"] == 0
    assert len(calls) == 2


def test_ctrl_remeasure_fires_on_sublinear_control_too(monkeypatch):
    """Symmetry: a burst-hit ctrl_hi (control looks WORSE than
    half-linear, which would inflate the envelope) is repaired the same
    way as a super-linear one."""
    _calm_instruments(monkeypatch)
    seq = iter([25.0, 34.0,   # c_hi burst -> ctrl_eff (34/25)/4 = 0.34
                10.0, 34.0])  # re-measure clean -> 0.85
    monkeypatch.setattr(bench, "_pool_control",
                        lambda corpus, workers: next(seq))
    res = bench._windowed_scaling(_spark_fn, "unused", base_reps=1,
                                  ext_budget_s=0.0, max_pairs=1,
                                  tag="t")
    w = res["windows"][0]
    assert w["ctrl_remeasures"] == 1
    assert w["ctrl_hi"] == 10.0
    assert bench._window_clean(w)

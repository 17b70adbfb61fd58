"""The Monte-Carlo acquisition benchmark harness (tools/acq_benchmark.py).

Covers the reference's legacy acquisition analysis tables
(``/root/reference/sydr/old/analysis.py:21-110``) in benchmark form: at a
strong C/N0 the production PCPS must detect every randomized trial with
sub-chip code error, and signal-absent trials must stay under the
two-peak threshold.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from tools.acq_benchmark import render_table, run_config


def test_detection_at_strong_cn0():
    r = run_config(
        prn=13, cn0_dbhz=45.0, trials=6, sampling_frequency=2e6,
        coherent=4, non_coherent=3, doppler_range=3000.0,
        doppler_step=200.0, seed=7, threshold=1.5)
    assert r["pd"] == 1.0
    assert r["metric_p10"] > 2.0
    assert r["code_rms_chips"] < 0.5
    assert r["doppler_rms_hz"] <= 120.0


def test_false_alarm_silent_without_signal():
    r = run_config(
        prn=13, cn0_dbhz=None, trials=6, sampling_frequency=2e6,
        coherent=4, non_coherent=3, doppler_range=3000.0,
        doppler_step=200.0, seed=11, threshold=1.5)
    assert r["pfa"] == 0.0
    assert r["metric_mean"] < 1.4


def test_render_table_includes_rows():
    rows = [
        {"cn0_dbhz": 40.0, "coherent": 5, "non_coherent": 10, "pd": 0.9,
         "metric_mean": 2.5, "metric_p10": 2.0, "doppler_rms_hz": 30.0,
         "code_rms_chips": 0.2},
        {"cn0_dbhz": None, "trials": 8, "coherent": 5, "non_coherent": 10,
         "pfa": 0.125, "metric_mean": 1.1, "metric_p10": 1.0},
    ]
    out = render_table(rows, 1.5)
    assert "| 40 | 5x10 | 0.90 |" in out
    # round-5 format: count/trials + rule-of-three bound (advisor item)
    assert "Pfa = 1/8 trials" in out


def test_seed_reproducible():
    kw = dict(prn=2, cn0_dbhz=42.0, trials=4, sampling_frequency=2e6,
              coherent=4, non_coherent=3, doppler_range=3000.0,
              doppler_step=200.0, seed=3, threshold=1.5)
    a = run_config(**kw)
    b = run_config(**kw)
    for k in ("pd", "metric_mean", "metric_p10"):
        assert np.isclose(a[k], b[k])

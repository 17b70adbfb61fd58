"""Serial-search acquisition (matmul formulation) tests."""

import numpy as np

from sydr_tpu.ops import acquisition as acq
from sydr_tpu.signal.synthetic import IQGenerator

FS = 2e6


def test_serial_search_finds_signal():
    gen = IQGenerator(FS, noise=True, seed=5)
    gen.add_satellite(7, doppler_hz=1500.0, code_phase_chips=200.0,
                      cn0_dbhz=50.0)
    iq = gen.generate_ms(1)
    shift = acq.code_shift_matrix(7, FS)
    bins = acq.doppler_bins(3000, 250)  # 25 bins -> pad to 32
    pad = (-len(bins)) % 8
    bins_p = np.concatenate([bins, np.repeat(bins[-1:], pad)])
    cmap = acq.serial_search(
        np.float32(iq.real), np.float32(iq.imag), shift, bins_p,
        sampling_frequency=FS,
    )[: len(bins)]
    (fi, ci), metric = acq.peak_metric_ss(cmap)
    assert abs(float(bins[int(fi)]) - 1500.0) <= 125.0
    # Code phase 200 chips into the stream -> shift of 1023-200 = 823.
    assert abs(int(ci) - 823) <= 1
    assert float(metric) > 2.0


def test_serial_search_absent_prn_low_metric():
    gen = IQGenerator(FS, noise=True, seed=6)
    gen.add_satellite(1, doppler_hz=500.0, cn0_dbhz=48.0)
    iq = gen.generate_ms(1)
    shift = acq.code_shift_matrix(22, FS)
    bins = acq.doppler_bins(2000, 250)
    pad = (-len(bins)) % 8
    bins_p = np.concatenate([bins, np.repeat(bins[-1:], pad)])
    cmap = acq.serial_search(
        np.float32(iq.real), np.float32(iq.imag), shift, bins_p,
        sampling_frequency=FS,
    )[: len(bins)]
    _, metric = acq.peak_metric_ss(cmap)
    assert float(metric) < 2.0


def test_metrics_module():
    import time as _t

    from sydr_tpu.utils.metrics import StageTimers

    tm = StageTimers()
    with tm.time("a"):
        _t.sleep(0.01)
    tm.add("a", 0.02)
    s = tm.summary()
    assert s["a"]["count"] == 2
    assert 5 < s["a"]["mean_ms"] < 30
    assert "a" in tm.report()


def test_serial_search_session_tracks():
    """Full session with acquisition method='serial' acquires and tracks."""
    from sydr_tpu.channels.runtime import TrackingConfig
    from sydr_tpu.receiver.session import AcquisitionConfig, TrackingSession

    gen = IQGenerator(4e6, noise=True, seed=9)
    gen.add_satellite(5, doppler_hz=1250.0, code_phase_chips=321.4,
                      cn0_dbhz=48.0)
    cfg = TrackingConfig(sampling_frequency=4e6, block_ms=20, tail_ms=4,
                         window_size=4224)
    session = TrackingSession(
        cfg, [5], AcquisitionConfig(method="serial", doppler_step=250.0))
    outs = []
    for _ in range(1500 // 20):
        iq = gen.generate_ms(20)
        outs.append(session.process_block(
            np.float32(iq.real), np.float32(iq.imag)))
    res = session.acq_results[0]
    assert res["metric"] > 2.0
    assert abs(res["doppler"] - 1250.0) <= 125.0
    cf = np.concatenate([o["carrier_freq"][:, 0] for o in outs])
    assert abs(cf[-100:].mean() - 1250.0) < 10.0

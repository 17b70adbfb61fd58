"""Long-run Doppler drift: rail re-anchoring keeps the loop off the rail.

Real Doppler drifts ~0.5-1 Hz/s across a satellite pass; the acquisition-time
frequency rail (+-400 Hz, alias rejection) would pin the loop after ~10
minutes. Once bit sync is declared the anchor slews toward the tracked
carrier (``TrackingConfig.anchor_slew_hz_per_s``), so the rail follows the
drift. Compressed here: 20 Hz/s for 30 s sweeps 600 Hz — past the rail —
and tracking must follow to the end.
"""

import numpy as np
import pytest

from sydr_tpu.channels.runtime import TrackingConfig
from sydr_tpu.receiver.session import TrackingSession
from sydr_tpu.signal.synthetic import IQGenerator

FS = 4e6
SECONDS = 30
DRIFT = 20.0        # Hz/s (compressed: ~20x a real pass)
F0 = 1200.0


@pytest.mark.slow
def test_drift_beyond_rail_tracks_with_reanchoring():
    n_ms = SECONDS * 1000
    profile = F0 + DRIFT * np.arange(n_ms) * 1e-3
    bits = np.random.default_rng(2).integers(0, 2, n_ms // 20 + 1)
    gen = IQGenerator(FS, noise=True, seed=13)
    gen.add_satellite(17, doppler_hz=F0, code_phase_chips=402.2,
                      cn0_dbhz=47.0, nav_bits=bits, doppler_profile=profile)

    cfg = TrackingConfig(
        sampling_frequency=FS, block_ms=20, tail_ms=4, window_size=4224,
        runtime="batch", superblock=5,
        freq_rail_hz=400.0, anchor_slew_hz_per_s=30.0,
    )
    session = TrackingSession(cfg, [17])
    chunk = cfg.superblock * cfg.block_ms
    outs = []
    for _ in range(n_ms // chunk):
        iq = gen.generate_ms(chunk)
        outs.append(session.process_block(np.float32(iq.real),
                                          np.float32(iq.imag)))
    out = {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}

    f_end = profile[-1]                      # 1800 Hz
    cf = out["carrier_freq"][-200:, 0]
    assert abs(cf.mean() - f_end) < 5.0, cf.mean()
    # The anchor must have slewed well past the acquisition value: the
    # final carrier exceeds acq_anchor + rail, so without re-anchoring the
    # loop would be pinned.
    anchor = float(np.asarray(session.state.freq_anchor)[0])
    acq_dop = session.acq_results[0]["doppler"]
    assert f_end > acq_dop + cfg.freq_rail_hz - 50
    assert anchor > acq_dop + 300, (anchor, acq_dop)
    # Still genuinely locked at the end (a 2nd-order PLL under a constant
    # 20 Hz/s ramp carries a small steady-state phase lag).
    assert abs(out["pll_error"][-300:, 0].mean()) < 0.05

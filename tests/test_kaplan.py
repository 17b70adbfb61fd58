"""Kaplan profile tests: FLL-assisted pull-in from off-bin Doppler.

The Borre profile (Costas PLL only) cannot pull in the up-to-50 Hz Doppler
error left by the 100 Hz acquisition grid; the Kaplan profile's FLL-assisted
PLL with the PULL_IN -> WIDE -> NARROW lock-state machine can. This is the
capability the reference's alternative channel provides
(``channel_l1ca_kaplan.py``).
"""

import numpy as np
import pytest

from sydr_tpu.channels.runtime import TrackingConfig
from sydr_tpu.ops.profiles import LOCK_NARROW
from sydr_tpu.receiver.session import TrackingSession
from sydr_tpu.signal.synthetic import IQGenerator

FS = 4e6
TRUE_DOPPLER = 2345.0   # 45 Hz off the 100-Hz acquisition grid


def _run(runtime, n_ms=3000, seed=21):
    gen = IQGenerator(FS, noise=True, seed=seed)
    gen.add_satellite(9, doppler_hz=TRUE_DOPPLER, code_phase_chips=150.3,
                      cn0_dbhz=46.0)
    # Delayed-feedback stability: the batched runtime applies loop updates
    # once per block, so loop_bandwidth * block_length must stay < ~0.15.
    # The Kaplan pull-in bandwidths (25-100 Hz) need short blocks.
    block_ms = 5 if runtime == "batch" else 20
    cfg = TrackingConfig(
        sampling_frequency=FS, block_ms=block_ms, tail_ms=4,
        window_size=4224, profile="kaplan", runtime=runtime,
    )
    session = TrackingSession(cfg, [9])
    outs = []
    for _ in range(n_ms // cfg.block_ms):
        iq = gen.generate_ms(cfg.block_ms)
        outs.append(session.process_block(np.float32(iq.real),
                                          np.float32(iq.imag)))
    return session, {
        k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]
    }


@pytest.mark.parametrize("runtime", ["scan", "batch"])
def test_kaplan_pulls_in_offgrid_doppler(runtime):
    session, out = _run(runtime)
    # Acquisition lands on the grid (within 50 Hz of truth).
    assert abs(session.acq_results[0]["doppler"] - TRUE_DOPPLER) <= 60

    # The FLL pulls the carrier onto the true Doppler.
    cf = out["carrier_freq"][-300:, 0]
    assert abs(cf.mean() - TRUE_DOPPLER) < 3.0, cf.mean()

    # Lock-state machine reaches NARROW_TRACK and stays there.
    ls = out["lock_state"][-300:, 0]
    assert (ls == LOCK_NARROW).mean() > 0.95

    # Phase lock achieved after pull-in.
    assert abs(out["pll_error"][-300:, 0].mean()) < 5e-3
    assert out["pll_lock"][-1, 0] > 0.8
    assert out["fll_lock"][-1, 0] > 0.8


def test_kaplan_lock_state_progression():
    session, out = _run("scan", n_ms=2400)
    ls = out["lock_state"][:, 0]
    active = out["active"][:, 0]
    first_active = np.argmax(active)
    # Starts in PULL_IN, ends in NARROW.
    assert ls[first_active] == 0
    assert ls[-1] == LOCK_NARROW
    # Monotonic-ish: narrow reached and held.
    reached = np.argmax(ls == LOCK_NARROW)
    assert reached > first_active
    assert (ls[reached:] == LOCK_NARROW).mean() > 0.9


def test_kaplan_option_pack_3rd_order_atan2_beaulieu():
    """The wired option pack: 3rd-order DLF (fll_acc state), atan2 FLL
    discriminator, Beaulieu C/N0 — pulls in off-grid Doppler and produces a
    sane C/N0 (reference dsp/tracking.py:283-325,
    channel_l1ca_kaplan.py:465-502)."""
    gen = IQGenerator(FS, noise=True, seed=5)
    bits = np.random.default_rng(8).integers(0, 2, 300)
    gen.add_satellite(9, doppler_hz=TRUE_DOPPLER, code_phase_chips=150.3,
                      cn0_dbhz=46.0, nav_bits=bits)
    cfg = TrackingConfig(
        sampling_frequency=FS, block_ms=5, tail_ms=4,
        window_size=4224, profile="kaplan", runtime="batch",
        dlf_order=3, fll_discriminator="atan2", cn0_estimator="beaulieu",
    )
    session = TrackingSession(cfg, [9])
    outs = []
    for _ in range(4000 // cfg.block_ms):
        iq = gen.generate_ms(cfg.block_ms)
        outs.append(session.process_block(np.float32(iq.real),
                                          np.float32(iq.imag)))
    out = {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}

    cf = out["carrier_freq"][-300:, 0]
    assert abs(cf.mean() - TRUE_DOPPLER) < 3.0, cf.mean()
    ls = out["lock_state"][-300:, 0]
    assert (ls == LOCK_NARROW).mean() > 0.9
    # 3rd-order DLF actually engaged: acceleration accumulator is live.
    assert float(np.abs(np.asarray(session.state.fll_acc)[0])) > 0.0
    # Beaulieu C/N0 settles within a few dB of the simulated 46 dB-Hz.
    cn0 = out["cn0"][-200:, 0]
    assert 40.0 < cn0.mean() < 52.0, cn0.mean()

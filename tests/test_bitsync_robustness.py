"""Bit-sync declaration rules + no-bitsync failure-detector gating.

Round-4 findings (tools/reference_e2e.py): (a) the reference's first-flip
bit sync (channel_l1ca_borre.py:399-407) mis-anchors by integer code
periods, producing exact integer-millisecond pseudorange errors; (b) a
phase-locked channel can legitimately see NO data transition for seconds
(zero-heavy LNAV subframe-1 words), so "no bit sync yet" alone must not
trigger reacquisition, and a unanimous flip histogram must declare early.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from sydr_tpu.channels import runtime as rt
from sydr_tpu.channels.runtime import TrackingConfig
from sydr_tpu.receiver.receiver import Receiver, ReceiverConfig
from sydr_tpu.signal.synthetic import IQGenerator

FS = 4e6


def _cfg(**kw):
    return ReceiverConfig(
        prns=(5,),
        tracking=TrackingConfig(sampling_frequency=FS, block_ms=20,
                                tail_ms=4, window_size=4224),
        tropo_enabled=False,
        **kw,
    )


def _hist(counts):
    h = np.zeros((1, 20), np.int32)
    for b, c in counts.items():
        h[0, b] = c
    return jnp.asarray(h)


def test_bit_sync_declare_rules():
    cfg = TrackingConfig(sampling_frequency=FS, block_ms=20, tail_ms=4,
                         window_size=4224)
    # unanimous early path: 5 flips all in one bin declares, 4 does not
    assert bool(rt._bit_sync_declare(cfg, _hist({9: 5}))[0])
    assert not bool(rt._bit_sync_declare(cfg, _hist({9: 4}))[0])
    # diffuse histogram at volume threshold must NOT declare (the
    # reference's first-flip mis-anchor class)
    diffuse = _hist({k: 1 for k in range(10)})
    assert not bool(rt._bit_sync_declare(cfg, diffuse)[0])
    # dominant histogram at volume threshold declares
    assert bool(rt._bit_sync_declare(cfg, _hist({9: 7, 3: 2, 15: 1}))[0])
    # near-unanimous but below the early count: keeps counting
    assert not bool(rt._bit_sync_declare(cfg, _hist({9: 3, 3: 1}))[0])


def test_locked_channel_survives_constant_bits():
    """Constant nav bits: no flips -> no bit sync, but the channel is
    phase-locked, so the soft no-bitsync reset must NOT fire; once bits
    start flipping, the unanimous path declares within ~0.2 s."""
    cfg = _cfg(reacq_no_bitsync_epochs=1200,
               reacq_no_bitsync_hard_factor=4)
    rx = Receiver(cfg)
    gen = IQGenerator(FS, noise=True, seed=7)
    gen.add_satellite(5, doppler_hz=1200.0, code_phase_chips=321.4,
                      cn0_dbhz=47.0, nav_bits=np.ones(500))
    for _ in range(150):           # 3.0 s of constant-bit signal
        rx.process_ms(gen.generate_ms(20))
    assert rx.session.mode_host[0] == 2, "locked channel was reset"
    st = rx.session.state
    assert not (int(np.asarray(st.flags)[0]) & 2), "no flips yet -> no sync"
    assert float(np.asarray(st.pll_lock)[0]) > 0.8
    # switch to alternating bits at the same code/carrier phase
    gen._sats[0].nav_bits = np.array([1.0, -1.0] * 250)
    for k in range(40):            # up to 0.8 s more
        rx.process_ms(gen.generate_ms(20))
        if int(np.asarray(rx.session.state.flags)[0]) & 2:
            break
    assert int(np.asarray(rx.session.state.flags)[0]) & 2, \
        "unanimous histogram did not declare bit sync"
    assert rx.session.mode_host[0] == 2


def test_hard_backstop_still_fires():
    """With the PLL gate disabled (threshold 0 -> never 'weak'), a channel
    that never bit-syncs is still reset at the hard backstop."""
    from sydr_tpu.channels.state import MODE_ACQUIRING

    cfg = _cfg(reacq_no_bitsync_epochs=200,
               reacq_no_bitsync_pll=0.0,
               reacq_no_bitsync_hard_factor=3)
    rx = Receiver(cfg)
    gen = IQGenerator(FS, noise=True, seed=7)
    gen.add_satellite(5, doppler_hz=1200.0, code_phase_chips=321.4,
                      cn0_dbhz=47.0, nav_bits=np.ones(500))
    reset = False
    for _ in range(60):            # up to 1.2 s
        rx.process_ms(gen.generate_ms(20))
        if rx.session.mode_host[0] == MODE_ACQUIRING or \
                rx.channels[0].n_codes < 100:
            reset = True
            break
    assert reset, "hard backstop never fired"


def test_hatch_smoothing_math():
    """Carrier-propagated Hatch filter: converges to truth + carrier
    scale, tracks the steering adjustment, restarts on discontinuity."""
    cfg = _cfg(smoothing_time_s=20.0)
    rx = Receiver(cfg)
    lam = 299792458.0 / 1575.42e6
    rng = np.random.default_rng(0)
    true_pr = 2.2e7
    # stationary geometry encoded as constant integrated phase
    outs = []
    for k in range(40):
        raw = true_pr + rng.standard_normal() * 3.0
        outs.append(rx._smooth_pseudorange(0, raw))
    resid = np.array(outs) - true_pr
    # raw sigma is 3 m; after ~20-epoch averaging the smoothed residual
    # settles near sigma/sqrt(20) ~ 0.7 m
    assert abs(resid[-10:]).mean() < 1.2
    # moving geometry: phase decreases by 100 cycles per epoch
    # (doppler +100 Hz, approaching) -> range shrinks by lam*100
    rx2 = Receiver(cfg)
    outs = []
    for k in range(30):
        rx2._phase_cycles[0] = 100.0 * k
        raw = true_pr - lam * 100.0 * k + rng.standard_normal() * 3.0
        outs.append(rx2._smooth_pseudorange(0, raw))
    resid = np.array(outs) - (true_pr - lam * 100.0 * np.arange(30))
    assert abs(resid[-10:]).mean() < 1.5
    # discontinuity beyond the 30 m gate restarts cleanly
    out = rx2._smooth_pseudorange(0, true_pr + 5000.0)
    assert abs(out - (true_pr + 5000.0)) < 1e-6

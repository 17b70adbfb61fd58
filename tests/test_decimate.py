"""Pre-correlation decimation: track a 10 Msps stream at 2.5 Msps.

``TrackingConfig.input_decimate`` boxcar-sums the input before any
processing — the textbook SDR front-end reduction. The decimated receiver
must still lock, bit-sync and decode the same data bits as the full-rate
one, with C/N0 within the documented ~0.5 dB correlation-loss budget.
"""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-second closed-loop soaks

from sydr_tpu.channels.runtime import TrackingConfig
from sydr_tpu.channels.state import FLAG_BIT_SYNC
from sydr_tpu.receiver.session import TrackingSession
from sydr_tpu.signal.synthetic import IQGenerator

FS_IN = 8e6
DEC = 4


def _run(dec, n_ms=2000, seed=11):
    rng = np.random.default_rng(seed)
    sats = [
        dict(prn=5, doppler=1200.0, code_phase=321.4),
        dict(prn=12, doppler=-2600.0, code_phase=811.9),
    ]
    bits = rng.integers(0, 2, 200)
    gen = IQGenerator(FS_IN, noise=True, seed=seed)
    for s in sats:
        gen.add_satellite(s["prn"], doppler_hz=s["doppler"],
                          code_phase_chips=s["code_phase"], cn0_dbhz=46.0,
                          nav_bits=bits)
    fs_trk = FS_IN / dec
    cfg = TrackingConfig(sampling_frequency=fs_trk, block_ms=20, tail_ms=4,
                         window_size=round(fs_trk * 1e-3) + 240,
                         runtime="batch", input_decimate=dec)
    session = TrackingSession(cfg, [s["prn"] for s in sats])
    outs = []
    for _ in range(n_ms // cfg.block_ms):
        iq = gen.generate_ms(cfg.block_ms)
        outs.append(session.process_block(np.float32(iq.real),
                                          np.float32(iq.imag)))
    merged = {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}
    return merged, sats, bits


@pytest.fixture(scope="module")
def runs():
    return {d: _run(d) for d in (1, DEC)}


def test_decimated_tracks_and_locks(runs):
    out, sats, _ = runs[DEC]
    for i, s in enumerate(sats):
        cf = out["carrier_freq"][-200:, i]
        assert abs(cf.mean() - s["doppler"]) < 5.0, (i, cf.mean())
        assert abs(out["pll_error"][-300:, i].mean()) < 5e-3
        assert out["flags"][-1, i] & FLAG_BIT_SYNC


def test_decimated_decodes_same_bits(runs):
    out, sats, bits = runs[DEC]
    tiled = np.tile(bits * 2 - 1, 20)
    ref = "".join("1" if b > 0 else "0" for b in tiled)
    ref_inv = "".join("0" if b > 0 else "1" for b in tiled)
    for i in range(len(sats)):
        ready = out["bit_ready"][:, i]
        sums = out["bit_ip_sum"][ready, i]
        assert len(sums) > 20
        s = "".join("1" if b > 0 else "0" for b in np.sign(sums[5:]))
        assert s in ref or s in ref_inv


def test_decimated_cn0_within_budget(runs):
    """The boxcar loses <= ~1 dB of estimated C/N0 vs full-rate tracking."""
    full, _, _ = runs[1]
    deci, sats, _ = runs[DEC]
    for i in range(len(sats)):
        cn0_full = full["cn0"][-100:, i].mean()
        cn0_dec = deci["cn0"][-100:, i].mean()
        assert cn0_dec > cn0_full - 1.5, (i, cn0_full, cn0_dec)

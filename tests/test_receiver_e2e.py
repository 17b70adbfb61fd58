"""Full receiver end-to-end: scenario IQ -> acquire -> track -> decode -> PVT.

The closed loop the reference can only exercise with a private recorded
dataset: synthesize a geometrically-consistent multi-satellite signal, run
the complete receiver, and require the position fix to land on the truth.
"""

import numpy as np
import pytest

from sydr_tpu.channels.runtime import TrackingConfig
from sydr_tpu.nav import geodesy
from sydr_tpu.nav.ephemeris import Ephemeris
from sydr_tpu.receiver.receiver import Receiver, ReceiverConfig
from sydr_tpu.signal.scenario import Scenario

FS = 4e6
RX_TRUTH = np.array([2795125.165, 1236112.522, 5579646.006])  # Tampere-ish
T0 = 302400.0
WEEK = 2190


def make_sky(min_elevation_deg=15.0):
    """Six-satellite sky with good geometry over the truth position.

    (omega0, m0) pairs pre-searched for elevations 22-81 deg and azimuth
    diversity at RX_TRUTH / T0.
    """
    elements = [
        (2.094, 1.571),   # el 81, az 162
        (1.047, 1.571),   # el 52, az 283
        (3.142, 1.571),   # el 48, az 72
        (2.094, 0.785),   # el 35, az 261
        (0.000, 1.571),   # el 24, az 320
        (4.189, 1.571),   # el 22, az 35
    ]
    sats = []
    for k, (omega0, m0) in enumerate(elements):
        sats.append(Ephemeris(
            prn=k + 1, week=WEEK,
            iodc=20 + k, iode=20 + k,
            toc=T0, toe=T0,
            af0=2e-5 * ((k % 5) - 2), af1=1e-12, af2=0.0,
            tgd=1e-9 * (k % 4),
            ecc=0.003 + 0.0012 * k, sqrt_a=5153.7,
            m0=m0, omega0=omega0,
            omega=0.0, i0=0.96, deltan=4.5e-9,
            crs=15.0, crc=180.0, cuc=-8e-7, cus=7e-6,
            cic=-1e-7, cis=2e-8, omega_dot=-8e-9, i_dot=3e-10,
        ))
    from sydr_tpu.nav.kepler import satellite_position_velocity
    visible = []
    for eph in sats:
        pos, _, _ = satellite_position_velocity(eph, T0)
        el, _ = geodesy.elevation_azimuth(pos, RX_TRUTH)
        if np.rad2deg(el) > min_elevation_deg:
            visible.append(eph)
    return visible


def _run_e2e(runtime):
    sats = make_sky()
    assert len(sats) >= 5, f"scenario needs >=5 visible sats, got {len(sats)}"
    sats = sats[:6]
    scn = Scenario(
        RX_TRUTH, sats, T0, FS, cn0_dbhz=47.0, noise=True, seed=3,
    )
    cfg = ReceiverConfig(
        prns=tuple(e.prn for e in sats),
        tracking=TrackingConfig(
            sampling_frequency=FS, tail_ms=4, window_size=4224,
            runtime=runtime,
            # Batch feedback delay cannot pull in off-grid Doppler with the
            # Borre loops: batch mode pairs with the Kaplan profile at short
            # blocks (see channels/batch_runtime docstring).
            profile="kaplan" if runtime == "batch" else "borre",
            block_ms=5 if runtime == "batch" else 20,
        ),
        approx_position=tuple(RX_TRUTH + np.array([3000.0, -2000.0, 1500.0])),
        assisted_ephemerides={e.prn: e for e in sats},
        tropo_enabled=False,  # the scenario simulates a vacuum
    )
    rx = Receiver(cfg)
    total_ms = 16000
    chunk = 500
    for _ in range(total_ms // chunk):
        iq = scn.generate_ms(chunk)
        rx.process_ms(iq)
    return scn, rx, sats


@pytest.fixture(scope="module")
def e2e_run():
    return _run_e2e("scan")


@pytest.fixture(scope="module")
def e2e_run_batch():
    return _run_e2e("batch")


def test_all_channels_acquired(e2e_run):
    scn, rx, sats = e2e_run
    truth = scn.truth_state(T0)
    for i, eph in enumerate(sats):
        res = rx.session.acq_results[i]
        assert res["metric"] > 1.5, (eph.prn, res)
        true_dop = truth[i]["doppler"]
        assert abs(res["doppler"] - true_dop) <= 60.0, (eph.prn, res, true_dop)


def test_subframes_decoded(e2e_run):
    _, rx, sats = e2e_run
    n_with_tow = sum(ch.has_tow for ch in rx.channels)
    assert n_with_tow >= 4, f"only {n_with_tow} channels decoded TOW"


def test_decode_flags_mirrored_to_device(e2e_run):
    """Host decode progress must appear in the device flags (and thus the
    per-epoch ``flags`` output / DB column), mirroring the reference's
    per-ms SUBFRAME_SYNC/TOW_DECODED/EPH_DECODED logging
    (channel.py:205-228, enumerations.py:120-138)."""
    from sydr_tpu.channels.state import (
        FLAG_EPH_DECODED,
        FLAG_SUBFRAME_SYNC,
        FLAG_TOW_DECODED,
    )

    _, rx, _ = e2e_run
    flags = np.asarray(rx.session.state.flags)
    for i, ch in enumerate(rx.channels):
        if ch.has_tow:
            assert int(flags[i]) & FLAG_TOW_DECODED, (i, int(flags[i]))
            assert int(flags[i]) & FLAG_SUBFRAME_SYNC
        if ch.eph is not None:
            assert int(flags[i]) & FLAG_EPH_DECODED, (i, int(flags[i]))
    assert sum(bool(int(f) & FLAG_TOW_DECODED) for f in flags) >= 4


def test_fix_matches_truth(e2e_run):
    _, rx, _ = e2e_run
    assert len(rx.fixes) >= 1, "no PVT fix produced"
    fix = rx.fixes[-1]
    err = np.linalg.norm(fix.solution.position - RX_TRUTH)
    enu = geodesy.ecef_to_enu(fix.solution.position, RX_TRUTH)
    assert err < 2.0, f"position error {err:.2f} m (ENU {enu})"
    assert np.max(np.abs(fix.solution.residuals)) < 3.0


def test_fix_repeatability(e2e_run):
    _, rx, _ = e2e_run
    if len(rx.fixes) >= 2:
        p = np.stack([f.solution.position for f in rx.fixes])
        spread = np.linalg.norm(p - p.mean(axis=0), axis=1).max()
        assert spread < 5.0, spread


@pytest.mark.slow
def test_fix_matches_truth_batch_runtime(e2e_run_batch):
    _, rx, _ = e2e_run_batch
    n_with_tow = sum(ch.has_tow for ch in rx.channels)
    assert n_with_tow >= 4, f"only {n_with_tow} channels decoded TOW"
    assert len(rx.fixes) >= 1, "no PVT fix produced (batch runtime)"
    fix = rx.fixes[-1]
    err = np.linalg.norm(fix.solution.position - RX_TRUTH)
    assert err < 2.0, f"position error {err:.2f} m"

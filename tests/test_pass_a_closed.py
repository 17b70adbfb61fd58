"""Closed-form pass A vs the scanned recurrence (roadmap round-3 item 3).

At IF=0 / block_ms=20 (the tested production slice) the closed form
reproduces the scan's epoch geometry exactly on the integer fields
(boundaries, required, active) and to f32 rounding on the phase
remainders whenever every epoch can run. At nonzero IF (large omega per
sample) the two forms evaluate their ceil() on different operands, so an
epoch boundary within f32 rounding of an integer may tie-break ONE
sample differently; each form stays self-consistent with its own
boundary, and the nonzero-IF tests below admit exactly that one-sample
tie-break. The closed form's one intended semantic difference
(all-or-nothing block activation under a sample deficit) is pinned
separately.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sydr_tpu.channels import batch_runtime as br
from sydr_tpu.channels.runtime import TrackingConfig
from sydr_tpu.channels.state import MODE_IDLE, MODE_TRACKING, init_state
from sydr_tpu.signal.synthetic import IQGenerator

FS = 10e6


def _tracking_state(n_ch=8, seed=0, unread_ms=5.5):
    rng = np.random.default_rng(seed)
    st = init_state(n_ch)
    return dataclasses.replace(
        st,
        mode=jnp.full((n_ch,), MODE_TRACKING, jnp.int32),
        carrier_freq=jnp.asarray(
            rng.uniform(-5000, 5000, n_ch).astype(np.float32)),
        rem_code=jnp.asarray(rng.uniform(0, 1, n_ch).astype(np.float32)),
        rem_carrier=jnp.asarray(
            rng.uniform(0, 2 * np.pi, n_ch).astype(np.float32)),
        code_freq_offset=jnp.asarray(
            rng.uniform(-3, 3, n_ch).astype(np.float32)),
        unread=jnp.full((n_ch,), int(unread_ms * FS * 1e-3), jnp.int32),
    )


def _cfg(**kw):
    base = dict(sampling_frequency=FS, block_ms=20, tail_ms=4,
                window_size=10240, runtime="batch")
    base.update(kw)
    return TrackingConfig(**base)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_geometry_matches_scan(seed):
    st = _tracking_state(seed=seed)
    cfg = _cfg()
    scan = br._pass_a_scan(cfg, st)
    closed = br._pass_a_closed(dataclasses.replace(cfg, pass_a="closed"),
                               st)
    for k in ("required", "b_start", "consumed_end", "unread_end"):
        np.testing.assert_array_equal(
            np.asarray(scan[k]), np.asarray(closed[k]), err_msg=k)
    np.testing.assert_array_equal(np.asarray(scan["active"]),
                                  np.asarray(closed["active"]))
    assert np.asarray(closed["active"]).all()
    for k, tol in (("rem_code", 2e-4), ("rem_code_end", 2e-4),
                   ("rem_carrier", 2e-2), ("rem_carrier_end", 2e-2)):
        d = np.abs(np.asarray(scan[k]) - np.asarray(closed[k]))
        if "carrier" in k:  # circular
            d = np.minimum(d, 2 * np.pi - d)
        assert d.max() < tol, (k, d.max())


@pytest.mark.parametrize("if_hz,block_ms,seed", [
    (2.58e6, 20, 0), (4.13e6, 20, 1), (2.58e6, 50, 2), (1.25e6, 64, 3),
])
def test_geometry_nonzero_if_one_sample_ties(if_hz, block_ms, seed):
    """Nonzero IF: boundaries may tie-break one sample apart; each form is
    self-consistent, so phase remainders differ by at most (boundary
    diff) x (per-sample rate) on top of f32 rounding."""
    st = _tracking_state(seed=seed)
    st = dataclasses.replace(
        st, carrier_freq=st.carrier_freq + np.float32(if_hz))
    cfg = _cfg(block_ms=block_ms, intermediate_frequency=if_hz)
    scan = br._pass_a_scan(cfg, st)
    closed = br._pass_a_closed(cfg, st)
    np.testing.assert_array_equal(np.asarray(scan["active"]),
                                  np.asarray(closed["active"]))
    # cumulative boundaries within one sample everywhere
    c_scan = np.cumsum(np.asarray(scan["required"]), axis=0)
    c_closed = np.cumsum(np.asarray(closed["required"]), axis=0)
    bdiff = c_scan - c_closed
    assert np.abs(bdiff).max() <= 1, np.abs(bdiff).max()
    # phases: admit the tie-break's one-sample phase step + f32 rounding
    code_step = np.asarray(closed["code_step"])[None, :]
    omega = np.asarray(closed["omega"])[None, :]
    bprev = np.concatenate([np.zeros_like(bdiff[:1]), bdiff[:-1]], axis=0)
    d_code = np.abs(np.asarray(scan["rem_code"])
                    - np.asarray(closed["rem_code"]))
    assert (d_code <= np.abs(bprev) * code_step + 5e-4).all(), d_code.max()
    d_car = np.abs(np.asarray(scan["rem_carrier"])
                   - np.asarray(closed["rem_carrier"]))
    d_car = np.minimum(d_car, 2 * np.pi - d_car)
    # scan accumulates mod-2pi error over epochs at large omega; allow a
    # generous f32 floor on top of the tie-break term
    assert (d_car <= np.abs(bprev) * omega + 0.05).all(), d_car.max()


def test_pass_a_rejects_unknown_mode():
    st = _tracking_state(n_ch=2, seed=0)
    with pytest.raises(ValueError, match="pass_a"):
        br._pass_a(_cfg(pass_a="close"), st)


def test_unread_clamp_matches_scan():
    """unread above the availability clamp: the min() path must agree."""
    st = _tracking_state(seed=7, unread_ms=4.9)  # just under tail+1 ms
    cfg = _cfg(tail_ms=4)
    scan = br._pass_a_scan(cfg, st)
    closed = br._pass_a_closed(cfg, st)
    np.testing.assert_array_equal(np.asarray(scan["unread_after"]),
                                  np.asarray(closed["unread_after"]))
    np.testing.assert_array_equal(np.asarray(scan["unread_end"]),
                                  np.asarray(closed["unread_end"]))


def test_idle_channels_frozen():
    st = _tracking_state(n_ch=4, seed=2)
    st = dataclasses.replace(
        st, mode=st.mode.at[1].set(MODE_IDLE).at[3].set(MODE_IDLE))
    cfg = _cfg()
    closed = br._pass_a_closed(cfg, st)
    act = np.asarray(closed["active"])
    assert not act[:, 1].any() and not act[:, 3].any()
    assert act[:, 0].all() and act[:, 2].all()
    np.testing.assert_array_equal(
        np.asarray(closed["rem_code_end"])[[1, 3]],
        np.asarray(st.rem_code)[[1, 3]])
    np.testing.assert_array_equal(
        np.asarray(closed["consumed_end"])[[1, 3]], [0, 0])


def test_small_deficit_is_not_a_deficit():
    """Samples arrive at +spms per epoch BEFORE the required check, so a
    sub-ms unread deficit never starves the block: scan and closed form
    both run every epoch and agree exactly."""
    st = _tracking_state(n_ch=3, seed=4, unread_ms=0.3)
    cfg = _cfg()
    scan = br._pass_a_scan(cfg, st)
    closed = br._pass_a_closed(cfg, st)
    assert np.asarray(scan["active"]).all()
    np.testing.assert_array_equal(np.asarray(scan["active"]),
                                  np.asarray(closed["active"]))
    np.testing.assert_array_equal(np.asarray(scan["required"]),
                                  np.asarray(closed["required"]))


def test_true_deficit_is_all_or_nothing():
    """A genuine starvation (unread < 1 sample AND the epoch needs
    spms + 1) defers the WHOLE block under the closed form (documented
    all-or-nothing semantics — the scan would run a suffix instead): the
    state stays frozen, unread accumulates, and the next block runs with
    scan-identical geometry."""
    st = _tracking_state(n_ch=3, seed=4)
    st = dataclasses.replace(
        st,
        rem_code=jnp.full((3,), 0.001, jnp.float32),
        code_freq_offset=jnp.full((3,), -3.0, jnp.float32),
        carrier_freq=jnp.zeros((3,), jnp.float32),  # no aiding term
        unread=jnp.zeros((3,), jnp.int32),
    )
    cfg = _cfg()
    closed = br._pass_a_closed(cfg, st)
    req0 = np.asarray(closed["required"])[0]
    assert (req0 > cfg.samples_per_ms).all(), req0  # the starving epoch
    assert not np.asarray(closed["active"]).any()
    np.testing.assert_array_equal(np.asarray(closed["rem_code_end"]),
                                  np.asarray(st.rem_code))
    assert (np.asarray(closed["unread_end"]) > 0).all()
    st2 = dataclasses.replace(st, unread=jnp.asarray(closed["unread_end"]))
    again = br._pass_a_closed(cfg, st2)
    assert np.asarray(again["active"]).all()
    scan2 = br._pass_a_scan(cfg, st2)
    np.testing.assert_array_equal(np.asarray(scan2["required"]),
                                  np.asarray(again["required"]))


def _closed_loop(pass_a, n_ms=1200, use_pallas=False, superblock=1):
    sats = [dict(prn=5, doppler=1200.0, code_phase=321.4),
            dict(prn=12, doppler=-2600.0, code_phase=811.9)]
    gen = IQGenerator(4e6, noise=True, seed=11)
    for s in sats:
        gen.add_satellite(s["prn"], doppler_hz=s["doppler"],
                          code_phase_chips=s["code_phase"], cn0_dbhz=46.0)
    from sydr_tpu.receiver.session import TrackingSession

    cfg = TrackingConfig(sampling_frequency=4e6, block_ms=20, tail_ms=4,
                         window_size=4224, runtime="batch",
                         use_pallas=use_pallas, superblock=superblock,
                         pass_a=pass_a)
    session = TrackingSession(cfg, [s["prn"] for s in sats])
    outs = []
    step = cfg.block_ms * superblock
    for _ in range(n_ms // step):
        iq = gen.generate_ms(step)
        outs.append(session.process_block(np.float32(iq.real),
                                          np.float32(iq.imag)))
    return {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}


def test_closed_loop_trajectories_match():
    a = _closed_loop("scan")
    b = _closed_loop("closed")
    # identical activation history -> same epochs; trajectories f32-close
    np.testing.assert_array_equal(a["active"], b["active"])
    cf = np.abs(a["carrier_freq"][-200:] - b["carrier_freq"][-200:])
    assert cf.max() < 1.0, cf.max()
    ip_a = np.abs(a["i_prompt"][-300:]).mean()
    ip_b = np.abs(b["i_prompt"][-300:]).mean()
    assert abs(ip_a - ip_b) < 0.02 * ip_a

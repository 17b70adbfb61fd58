"""Pallas fused correlator kernel vs XLA dense path (interpret mode)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sydr_tpu.channels import batch_runtime
from sydr_tpu.channels.runtime import TrackingConfig
from sydr_tpu.channels.state import MODE_TRACKING, init_state
from sydr_tpu.signal.synthetic import IQGenerator

FS = 10e6  # kernel requires group size 128 (fs >= ~6.9 Msps)


def _setup(n_ch=3, block_ms=4, fs=FS):
    prns = [5, 12, 21][:n_ch]
    dops = [1200.0, -2600.0, 3900.0][:n_ch]
    gen = IQGenerator(fs, noise=True, seed=4)
    for prn, dop in zip(prns, dops):
        gen.add_satellite(prn, doppler_hz=dop, code_phase_chips=100.0,
                          cn0_dbhz=48.0)
    cfg = dict(sampling_frequency=fs, block_ms=block_ms, tail_ms=4,
               window_size=round(fs * 1e-3) + 240, runtime="batch")
    iq = gen.generate_ms(4 + block_ms)
    wre = jnp.asarray(np.float32(iq.real))
    wim = jnp.asarray(np.float32(iq.imag))

    spms = round(fs * 1e-3)
    state = init_state(n_ch)
    state = dataclasses.replace(
        state,
        mode=jnp.full((n_ch,), MODE_TRACKING, jnp.int32),
        carrier_freq=jnp.asarray(np.float32(dops)),
        rem_code=jnp.asarray(np.float32([0.02, 0.7, 0.4][:n_ch])),
        rem_carrier=jnp.asarray(np.float32([0.3, 2.1, 5.0][:n_ch])),
        code_freq_offset=jnp.asarray(np.float32([0.5, -1.2, 2.0][:n_ch])),
        unread=jnp.asarray(np.int32(
            [int(1.1 * spms), int(1.4 * spms), int(1.2345 * spms)][:n_ch])),
    )
    bits3x = jnp.asarray(batch_runtime.tiled_code_bits(prns))
    return cfg, bits3x, state, wre, wim


import pytest


@pytest.mark.parametrize("profile", ["borre", "kaplan"])
@pytest.mark.parametrize("quantize", [False, True])
@pytest.mark.parametrize("boundary", ["prefix", "rowsum"])
def test_pallas_kernel_matches_xla_dense(profile, quantize, boundary):
    cfg_args, bits3x, state, wre, wim = _setup()
    cfg_args["profile"] = profile
    cfg_args["quantize_spacing"] = quantize

    cfg_xla = TrackingConfig(**cfg_args)
    st_x, out_x = batch_runtime.run_block_batched(
        cfg_xla, bits3x, state, wre, wim)

    cfg_pl = TrackingConfig(**cfg_args, use_pallas=True,
                            pallas_interpret=True, boundary_mode=boundary)
    st_p, out_p = batch_runtime.run_block_batched(
        cfg_pl, bits3x, state, wre, wim)

    for key in ("i_early", "q_early", "i_prompt", "q_prompt", "i_late",
                "q_late"):
        a = np.asarray(out_x[key])
        b = np.asarray(out_p[key])
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=1.0), key

    np.testing.assert_allclose(np.asarray(st_p.carrier_freq),
                               np.asarray(st_x.carrier_freq), atol=0.2)
    np.testing.assert_array_equal(np.asarray(st_p.unread),
                                  np.asarray(st_x.unread))


@pytest.mark.parametrize("fs", [5e6, 2.5e6, 1.25e6])
def test_pallas_kernel_low_rate_groups(fs):
    """Sub-128 group sizes (Q = 2/4/8 quadrant word tables): the kernel
    covers any sampling rate >= ~1.05 Msps — required by the decimated
    tracking mode and sub-7 Msps front-ends."""
    cfg_args, bits3x, state, wre, wim = _setup(fs=fs)
    cfg_args["quantize_spacing"] = True

    cfg_xla = TrackingConfig(**cfg_args)
    st_x, out_x = batch_runtime.run_block_batched(
        cfg_xla, bits3x, state, wre, wim)

    cfg_pl = TrackingConfig(**cfg_args, use_pallas=True,
                            pallas_interpret=True)
    st_p, out_p = batch_runtime.run_block_batched(
        cfg_pl, bits3x, state, wre, wim)

    for key in ("i_early", "q_early", "i_prompt", "q_prompt", "i_late",
                "q_late"):
        np.testing.assert_allclose(np.asarray(out_p[key]),
                                   np.asarray(out_x[key]),
                                   rtol=2e-3, atol=1.0, err_msg=key)

"""Tracking-op tests: EPL correlator vs float64 oracle, discriminators, filters."""

import jax.numpy as jnp
import numpy as np
import pytest

from sydr_tpu.ops import tracking
from sydr_tpu.signal import cacode
from sydr_tpu.signal.synthetic import IQGenerator

FS = 10e6
SPACINGS = (-0.5, 0.0, 0.5)


def epl_oracle(window, code_padded, required, carrier_freq, rem_carrier,
               rem_code, code_step):
    """Reference EPL semantics in float64 numpy (sydr dsp/tracking.py:92-116)."""
    window = np.asarray(window, dtype=np.complex128)[:required]
    n = np.arange(required, dtype=np.float64)
    replica = np.exp(1j * (rem_carrier - 2.0 * np.pi * carrier_freq * n / FS))
    mixed = replica * window
    out = []
    for sp in SPACINGS:
        idx = np.ceil(rem_code + sp + n * code_step).astype(np.int64)
        chips = np.asarray(code_padded, dtype=np.float64)[idx]
        out.append(np.sum(chips * mixed.real))
        out.append(np.sum(chips * mixed.imag))
    return np.array(out)


def _make_window(prn=7, doppler=1800.0, n_ms=2, noise=False, cn0=None, seed=0):
    gen = IQGenerator(FS, noise=noise, seed=seed)
    gen.add_satellite(prn, doppler_hz=doppler, code_phase_chips=0.0,
                      cn0_dbhz=cn0)
    return gen.generate_ms(n_ms)


@pytest.mark.parametrize("method", ["gather", "cumsum", "local", "bitpack"])
def test_epl_matches_oracle(method):
    prn, doppler = 7, 1800.0
    iq = _make_window(prn, doppler)
    code_padded = cacode.padded_code(prn)
    code_step = 1.023e6 / FS
    rem_code = 0.0
    required = int(np.ceil((1023 - rem_code) / code_step))
    window = iq[: required + 256]  # fixed window larger than required

    got = tracking.epl_correlate(
        jnp.asarray(np.float32(window.real)), jnp.asarray(np.float32(window.imag)),
        jnp.asarray(code_padded), required,
        doppler, 0.3, rem_code, code_step,
        spacings=SPACINGS, sampling_frequency=FS, method=method,
    )
    want = epl_oracle(window, code_padded, required, doppler, 0.3,
                      rem_code, code_step)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=0.5)


def test_epl_gather_cumsum_agree():
    iq = _make_window(3, -2500.0, noise=True, cn0=50.0, seed=2)
    code_padded = cacode.padded_code(3)
    code_step = (1.023e6 - 1.66) / FS  # slight code Doppler
    rem_code = 0.071
    required = int(np.ceil((1023 - rem_code) / code_step))
    window = iq[: required + 256]
    args = (jnp.asarray(np.float32(window.real)),
            jnp.asarray(np.float32(window.imag)),
            jnp.asarray(code_padded), required, -2500.0, 1.1,
            rem_code, code_step)
    a = tracking.epl_correlate(*args, spacings=SPACINGS,
                               sampling_frequency=FS, method="gather")
    b = tracking.epl_correlate(*args, spacings=SPACINGS,
                               sampling_frequency=FS, method="cumsum")
    c = tracking.epl_correlate(*args, spacings=SPACINGS,
                               sampling_frequency=FS, method="local")
    d = tracking.epl_correlate(*args, spacings=SPACINGS,
                               sampling_frequency=FS, method="bitpack")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                               atol=1.0)
    # local uses identical ceil chip indexing to gather: near bit-identical.
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5,
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(a), np.asarray(d), rtol=1e-5,
                               atol=0.02)


def test_epl_prompt_peak_on_aligned_code():
    """With perfect alignment and no Doppler, prompt I ~ required, E=L."""
    prn = 11
    iq = _make_window(prn, 0.0)
    code_padded = cacode.padded_code(prn)
    code_step = 1.023e6 / FS
    required = int(np.ceil(1023 / code_step))
    window = iq[: required + 256]
    out = np.asarray(tracking.epl_correlate(
        jnp.asarray(np.float32(window.real)),
        jnp.asarray(np.float32(window.imag)),
        jnp.asarray(code_padded), required, 0.0, 0.0, 0.0, code_step,
        spacings=SPACINGS, sampling_frequency=FS))
    i_early, _, i_prompt, q_prompt, i_late, _ = out
    assert i_prompt > 0.99 * required
    assert abs(q_prompt) < 1e-2 * required
    # E and L amplitudes should be symmetric for a centred code.
    assert abs(i_early - i_late) < 0.02 * i_prompt
    assert i_early > 0.4 * i_prompt  # ~0.5 chip offset -> ~0.5 amplitude


def test_dll_discriminator_sign():
    # Early stronger than late -> positive error (code replica late).
    err = float(tracking.dll_nneml(3.0, 0.0, 1.0, 0.0))
    assert err == pytest.approx((3 - 1) / (3 + 1))
    assert float(tracking.dll_nneml(1.0, 0.0, 3.0, 0.0)) < 0


def test_pll_costas_values():
    assert float(tracking.pll_costas(1.0, 0.0)) == pytest.approx(0.0)
    assert float(tracking.pll_costas(1.0, 1.0)) == pytest.approx(
        np.arctan(1.0) / (2 * np.pi))
    # Costas loop is insensitive to bit flips.
    assert float(tracking.pll_costas(-1.0, -1.0)) == pytest.approx(
        float(tracking.pll_costas(1.0, 1.0)))
    assert np.isfinite(float(tracking.pll_costas(0.0, 1.0)))


def test_fll_atan_frequency_step():
    # Phase advancing pi/8 per ms -> freq = (pi/8) / 1e-3 / 2pi Hz.
    dt = 1e-3
    phi0, phi1 = 0.0, np.pi / 8
    got = float(tracking.fll_atan(np.cos(phi1), np.sin(phi1),
                                  np.cos(phi0), np.sin(phi0), dt))
    assert got == pytest.approx((np.pi / 8) / dt / (2 * np.pi), rel=1e-5)


def test_loop_filter_matches_reference_formula():
    tau1, tau2 = tracking.loop_filter_taus(1.0, 0.7, 1.0)
    wn = 1.0 * 8.0 * 0.7 / (4.0 * 0.7**2 + 1)
    assert tau1 == pytest.approx(1.0 / wn**2)
    assert tau2 == pytest.approx(2 * 0.7 / wn)
    out = float(tracking.borre_loop_filter(0.2, 0.1, tau1, tau2, 1e-3))
    assert out == pytest.approx(tau2 / tau1 * 0.1 + 1e-3 / tau1 * 0.2)


def test_fll_assisted_pll_2nd_accumulates():
    out1, vel1 = tracking.fll_assisted_pll_2nd(0.1, 5.0, 10.0, 20.0, 1.414,
                                               1e-3, 0.0)
    # Reference formula (dsp/tracking.py:246-279).
    update = (0.1 * 20.0**2 + 5.0 * 10.0) * 1e-3
    assert float(out1) == pytest.approx(update + 0.0 + 0.1 * 1.414 * 20.0)
    assert float(vel1) == pytest.approx(update)


def test_cn0_nwpr_reasonable():
    # 20 coherent prompts of amplitude a with noise-free signal: NBP/WBP = 20.
    a = 100.0
    i_sum, q_sum = 20 * a, 0.0
    i_sq, q_sq = 20 * a**2, 0.0
    cn0 = float(tracking.cn0_nwpr(i_sum, q_sum, i_sq, q_sq))
    assert cn0 > 50.0  # effectively infinite SNR saturates high


def test_lock_indicators_range():
    pll = float(tracking.pll_lock_indicator(10.0, 0.1, 0.0, alpha=1.0))
    assert 0.9 < pll <= 1.0
    fll = float(tracking.fll_lock_indicator(10.0, 0.1, 10.0, 0.1, 0.0,
                                            alpha=1.0))
    assert 0.9 < fll <= 1.0

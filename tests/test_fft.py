"""Matmul four-step DFT parity against numpy.fft."""

import numpy as np
import pytest

from sydr_tpu.ops import fft as mmfft


@pytest.mark.parametrize("n", [100, 4000, 10000, 1024, 20000])
def test_dft_matches_numpy(n, rng):
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex128
    )
    plan = mmfft.make_plan(n)
    xr, xi = np.float32(x.real), np.float32(x.imag)
    gr, gi = mmfft.dft(xr, xi, plan)
    want = np.fft.fft(x)
    got = np.asarray(gr) + 1j * np.asarray(gi)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=5e-5)


def test_idft_roundtrip(rng):
    n = 10000
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    fwd = mmfft.make_plan(n)
    inv = mmfft.make_plan(n, inverse=True)
    fr, fi = mmfft.dft(np.float32(x.real), np.float32(x.imag), fwd)
    br, bi = mmfft.idft(fr, fi, inv)
    got = np.asarray(br) + 1j * np.asarray(bi)
    np.testing.assert_allclose(got, x, atol=2e-3)


def test_batched_dft(rng):
    n = 1000
    x = rng.standard_normal((3, 4, n)).astype(np.float32)
    plan = mmfft.make_plan(n)
    gr, gi = mmfft.dft(x, np.zeros_like(x), plan)
    want = np.fft.fft(x, axis=-1)
    got = np.asarray(gr) + 1j * np.asarray(gi)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_circular_correlate_matches_numpy(rng):
    n = 4000
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    c = np.sign(rng.standard_normal(n))
    k = np.conj(np.fft.fft(c))
    want = np.fft.ifft(np.fft.fft(x) * k)
    fwd = mmfft.make_plan(n)
    inv = mmfft.make_plan(n, inverse=True)
    gr, gi = mmfft.circular_correlate(
        np.float32(x.real), np.float32(x.imag),
        np.float32(k.real), np.float32(k.imag), fwd, inv)
    got = np.asarray(gr) + 1j * np.asarray(gi)
    np.testing.assert_allclose(got, want, atol=0.05)


def test_balanced_factors():
    assert mmfft._balanced_factors(10000) == (100, 100)
    assert mmfft._balanced_factors(4000) == (50, 80)
    with pytest.raises(ValueError):
        mmfft._balanced_factors(10007)  # prime

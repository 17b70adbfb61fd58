"""C/A code generator tests against IS-GPS-200 spec properties."""

import numpy as np
import pytest

from sydr_tpu.signal import cacode

# First 10 chips (octal) from IS-GPS-200 table 3-Ia.
FIRST_10_CHIPS_OCTAL = {
    1: 1440, 2: 1620, 3: 1710, 4: 1744, 5: 1133, 6: 1455, 7: 1131,
    8: 1454, 9: 1626, 10: 1504, 11: 1642, 12: 1750, 13: 1764, 14: 1772,
    15: 1775, 16: 1776, 17: 1156, 18: 1467, 19: 1633, 20: 1715, 21: 1746,
    22: 1763, 23: 1063, 24: 1706, 25: 1743, 26: 1761, 27: 1770, 28: 1774,
    29: 1127, 30: 1453, 31: 1625, 32: 1712,
}


@pytest.mark.parametrize("prn", sorted(FIRST_10_CHIPS_OCTAL))
def test_first_10_chips_match_spec(prn):
    assert cacode.first_10_chips_octal(prn) == FIRST_10_CHIPS_OCTAL[prn]


def test_code_is_plus_minus_one():
    code = cacode.ca_code(7)
    assert code.shape == (1023,)
    assert set(np.unique(code)) == {-1.0, 1.0}


def test_code_balance():
    # Gold codes of length 1023 have 512 ones and 511 zeros.
    bits = cacode.ca_code_bits(13)
    assert bits.sum() == 512


def test_autocorrelation_peak():
    code = cacode.ca_code(5).astype(np.float64)
    acf0 = np.dot(code, code)
    assert acf0 == 1023.0
    # Off-peak circular autocorrelation of Gold codes takes values in
    # {-65, -1, 63}.
    shifted = np.roll(code, 100)
    assert np.dot(code, shifted) in (-65.0, -1.0, 63.0)


def test_cross_correlation_three_valued():
    a = cacode.ca_code(1).astype(np.float64)
    b = cacode.ca_code(2).astype(np.float64)
    vals = {np.dot(a, np.roll(b, k)) for k in range(0, 1023, 97)}
    assert vals <= {-65.0, -1.0, 63.0}


def test_upsample_length_and_rate():
    code = cacode.ca_code(9)
    fs = 10e6
    up = cacode.upsample_code(code, fs)
    assert up.shape == (cacode.samples_per_code(fs),)
    assert cacode.samples_per_code(fs) == 10000
    # Each chip should span ~fs/fc samples.
    transitions = np.count_nonzero(np.diff(up))
    chip_transitions = np.count_nonzero(np.diff(code))
    assert transitions == chip_transitions


def test_padded_code_wraparound():
    p = cacode.padded_code(3)
    c = cacode.ca_code(3)
    assert p.shape == (1025,)
    assert p[0] == c[-1]
    assert p[-1] == c[0]
    np.testing.assert_array_equal(p[1:-1], c)

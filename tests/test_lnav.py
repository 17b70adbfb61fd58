"""LNAV encoder/decoder roundtrip and parity tests."""

import numpy as np
import pytest

from sydr_tpu.decoding import lnav, lnav_encode
from sydr_tpu.nav.ephemeris import Ephemeris


def make_eph(prn=7):
    return Ephemeris(
        prn=prn,
        week=2190, ura=2, health=0, iodc=157, toc=352800.0,
        tgd=-5.122274e-09, af2=0.0, af1=-3.524292e-12, af0=2.35188e-04,
        iode=157, ecc=0.01170, sqrt_a=5153.672, toe=352800.0,
        crs=-12.84375, deltan=4.4660e-09, m0=1.51823,
        cuc=-6.4820e-07, cus=7.59959e-06,
        cic=-1.13621e-07, omega0=-2.11179, cis=1.86265e-08,
        i0=0.95672, crc=236.15625, omega=0.80089,
        omega_dot=-8.0157e-09, i_dot=4.6359e-10,
    )


def test_parity_roundtrip():
    rng = np.random.default_rng(3)
    d29s, d30s = 0, 1
    data = rng.integers(0, 2, 24).astype(np.uint8)
    parity = lnav.compute_parity(data, d29s, d30s)
    word = np.concatenate([data ^ d30s, parity])
    status = lnav.check_word(word, d29s, d30s)
    assert status == -1  # valid, inverted
    # Corrupt one bit -> parity failure.
    bad = word.copy()
    bad[5] ^= 1
    assert lnav.check_word(bad, d29s, d30s) == 0


def test_encode_subframe_valid_parity_chain():
    eph = make_eph()
    sf = lnav_encode.encode_subframe(1, 302400, eph=eph)
    assert sf.shape == (300,)
    d29s, d30s = 0, 0
    for w in range(10):
        word = sf[w * 30:(w + 1) * 30]
        assert lnav.check_word(word, d29s, d30s) != 0, f"word {w} parity"
        d29s, d30s = int(word[28]), int(word[29])
    # Words 2 and 10 end with D29=D30=0 so the next word starts clean.
    assert sf[58] == 0 and sf[59] == 0
    assert sf[298] == 0 and sf[299] == 0


def test_decode_tow_and_id():
    eph = make_eph()
    sf = lnav_encode.encode_subframe(3, 354006, eph=eph)
    tow, sid, _ = lnav.decode_tow_subframe_id(sf, 0)
    assert tow == 354006
    assert sid == 3


@pytest.mark.parametrize("invert", [False, True])
def test_stream_decoder_roundtrip(invert):
    eph = make_eph()
    week = 2190
    stream = lnav_encode.encode_message(eph, week, 302400, n_subframes=8)
    if invert:
        stream = 1 - stream
    # Prepend garbage bits to force a search.
    rng = np.random.default_rng(5)
    stream = np.concatenate([rng.integers(0, 2, 37), stream])

    dec = lnav.LnavDecoder()
    events = []
    for b in stream:
        ev = dec.push_bit(int(b))
        if ev is not None:
            events.append(ev)
    assert len(events) >= 5
    ids = [e.subframe_id for e in events]
    # Cyclic 1..5 order.
    start = ids[0]
    expect = [(start - 1 + k) % 5 + 1 for k in range(len(ids))]
    assert ids == expect
    tows = [e.tow_label for e in events]
    assert all(b - a == 6 for a, b in zip(tows, tows[1:]))

    # Ephemeris roundtrip through subframes 1-3.
    got = Ephemeris(prn=7)
    for e in events:
        if e.subframe_id in (1, 2, 3):
            got.apply_subframe(e.bits)
    assert got.complete

    # Canonical = one direct encode/decode (field values quantised to the
    # LNAV scale factors); the stream decode must match it exactly.
    ref = make_eph()
    canon = Ephemeris(prn=7)
    for sid in (1, 2, 3):
        sf = lnav_encode.encode_subframe(sid, 302400, eph=ref, week=ref.week)
        canon.apply_subframe(lnav.correct_polarity(sf, 0))
    for field in ("week", "iodc", "iode", "toc", "toe", "ura", "health"):
        assert getattr(got, field) == getattr(canon, field), field
    float_fields = ("tgd", "af2", "af1", "af0", "ecc", "sqrt_a", "crs",
                    "deltan", "m0", "cuc", "cus", "cic", "omega0", "cis",
                    "i0", "crc", "omega", "omega_dot", "i_dot")
    for field in float_fields:
        assert getattr(got, field) == getattr(canon, field), field
    # And the quantised values stay close to the originals (half-LSB).
    for field in float_fields:
        orig, quant = getattr(ref, field), getattr(canon, field)
        if orig != 0:
            assert abs(quant - orig) <= abs(orig) * 1e-3 + 1e-8, field


def test_decoder_bit_index_tracks_subframe_start():
    eph = make_eph()
    stream = lnav_encode.encode_message(eph, 2190, 302400, n_subframes=6)
    pad = 13
    stream = np.concatenate([np.zeros(pad, dtype=np.uint8), stream])
    dec = lnav.LnavDecoder()
    events = []
    for b in stream:
        ev = dec.push_bit(int(b))
        if ev:
            events.append(ev)
    # bit_index must point at the true subframe starts: pad + k*300.
    for e in events:
        assert (e.bit_index - pad) % 300 == 0

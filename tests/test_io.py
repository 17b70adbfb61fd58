"""I/O layer tests: RF file reader, SQLite database, RINEX roundtrip."""

import numpy as np
import pytest

from sydr_tpu.io.database import ResultDatabase, blob_to_array
from sydr_tpu.io import rinex
from sydr_tpu.signal.rf import RFConfig, RFFileSource
from sydr_tpu.signal.synthetic import IQGenerator


@pytest.mark.parametrize("dtype,bits", [("int8", 8), ("int16", 16)])
def test_rf_file_reader_roundtrip(tmp_path, dtype, bits):
    fs = 2e6
    gen = IQGenerator(fs, noise=True, seed=1)
    gen.add_satellite(7, doppler_hz=1000.0, cn0_dbhz=50.0)
    path = tmp_path / "iq.bin"
    gen.write_file(str(path), 20, dtype=dtype)

    src = RFFileSource(RFConfig(
        filepath=str(path), sampling_frequency=fs, data_size=bits,
        is_complex=True,
    ))
    assert src.total_samples == 20 * 2000
    re, im = src.read_ms(5)
    assert re.shape == (10000,) and re.dtype == np.float32
    assert np.abs(re).max() > 10  # scaled int samples
    assert src.sample_position == 10000
    src.skip_ms(2)
    assert src.sample_position == 14000
    re2, _ = src.read_ms(13)
    with pytest.raises(EOFError):
        src.read_ms(1)
    src.close()


def test_rf_reader_native_matches_numpy(tmp_path):
    from sydr_tpu.signal import rf as rfmod

    fs = 1e6
    gen = IQGenerator(fs, noise=True, seed=2)
    gen.add_satellite(3, cn0_dbhz=50.0)
    path = tmp_path / "iq8.bin"
    gen.write_file(str(path), 4, dtype="int8")

    cfg = RFConfig(filepath=str(path), sampling_frequency=fs, data_size=8)
    src = RFFileSource(cfg)
    re_a, im_a = src.read_ms(4)
    src.close()

    # Force the numpy fallback and compare.
    lib = rfmod._LIB
    rfmod._LIB, rfmod._LIB_TRIED = None, True
    try:
        src = RFFileSource(cfg)
        re_b, im_b = src.read_ms(4)
        src.close()
    finally:
        rfmod._LIB = lib
    np.testing.assert_array_equal(re_a, re_b)
    np.testing.assert_array_equal(im_a, im_b)


def test_database_fixed_and_dynamic(tmp_path):
    db = ResultDatabase(str(tmp_path / "run.db"))
    db.add("tracking", {"channel_id": 0, "epoch": 1, "i_prompt": 123.5,
                        "cn0": 45.0})
    db.add("tracking", {"channel_id": 1, "epoch": 1, "i_prompt": -3.0})
    # Dynamic column + array blob.
    db.add("tracking", {"channel_id": 0, "epoch": 2, "corr_map":
                        np.arange(6, dtype=np.float32)})
    db.commit()
    rows = db.fetch("tracking")
    assert len(rows) == 3
    assert rows[0]["i_prompt"] == 123.5
    arr = blob_to_array(rows[2]["corr_map"])
    np.testing.assert_array_equal(arr, np.arange(6, dtype=np.float32))
    # Dynamic table.
    db.add("custom_stage", {"foo": 1, "bar": "x"})
    assert db.fetch("custom_stage")[0]["bar"] == "x"
    db.close()


def test_database_ephemeris_store(tmp_path):
    from tests.test_lnav import make_eph

    db = ResultDatabase(str(tmp_path / "eph.db"))
    eph = make_eph()
    db.store_ephemeris(eph)
    got = db.fetch_ephemeris(eph.prn, eph.toe + 100.0)
    assert got is not None
    assert got.sqrt_a == eph.sqrt_a
    assert got.m0 == eph.m0
    assert got.complete
    assert db.fetch_ephemeris(99, 0.0) is None
    db.close()


def test_rinex_roundtrip(tmp_path):
    from tests.test_lnav import make_eph

    eph = make_eph()
    path = str(tmp_path / "brdc.rnx")
    rinex.write_nav(path, [eph])
    back = rinex.read_nav(path)
    assert len(back) == 1
    got = back[0]
    for field in ("prn", "week", "iodc", "iode"):
        assert getattr(got, field) == getattr(eph, field), field
    for field in ("af0", "af1", "ecc", "sqrt_a", "m0", "omega0", "i0",
                  "omega", "omega_dot", "toe", "toc", "tgd", "crs", "crc",
                  "cuc", "cus", "cic", "cis", "deltan", "i_dot"):
        assert getattr(got, field) == pytest.approx(
            getattr(eph, field), rel=1e-11, abs=1e-18), field
    assert got.complete

    assisted = rinex.load_assisted_ephemerides(path)
    assert eph.prn in assisted


def test_gpstime():
    from sydr_tpu.nav.gpstime import GpsTime, ReceiverClock

    t = GpsTime.from_string("2021-11-30 08:39:06")
    back = t.to_datetime()
    assert back.isoformat() == "2021-11-30T08:39:06"
    t2 = t + 604800.0
    assert t2.week == t.week + 1
    assert (t2 - t) == pytest.approx(604800.0)

    clk = ReceiverClock(10e6)
    assert not clk.initialised
    clk.initialise(2190, 302400.0, sample=10_000_000)
    at = clk.at_sample(20_000_000)
    assert at.seconds == pytest.approx(302401.0)
    clk.apply_correction(-0.5, sample=20_000_000)
    assert clk.at_sample(20_000_000).seconds == pytest.approx(302400.5)


def test_rinex_obs_roundtrip(tmp_path):
    from sydr_tpu.io import rinex_obs

    epochs = [
        {"tow": 302406.0, "obs": {2: {"C1C": 21234567.123, "D1C": 1234.5},
                                  7: {"C1C": 22345678.5, "D1C": -2345.25}}},
        {"tow": 302407.0, "obs": {2: {"C1C": 21234600.0, "D1C": 1233.0}}},
    ]
    path = str(tmp_path / "obs.rnx")
    rinex_obs.write_obs(path, epochs, week=2190)
    back = rinex_obs.read_obs(path)
    assert len(back) == 2
    assert back[0]["tow"] == pytest.approx(302406.0)
    assert back[0]["obs"][2]["C1C"] == pytest.approx(21234567.123, abs=1e-3)
    assert back[0]["obs"][7]["D1C"] == pytest.approx(-2345.25, abs=1e-2)
    assert back[1]["obs"][2]["C1C"] == pytest.approx(21234600.0, abs=1e-3)


def test_rinex_obs_export_from_db(tmp_path):
    from sydr_tpu.io import rinex_obs

    db = ResultDatabase(str(tmp_path / "m.db"))
    for tow in (1.0, 2.0):
        db.add("measurement", {"tow": tow, "channel_id": 0, "prn": 5,
                               "mtype": "pseudorange", "value": 2.1e7,
                               "raw_value": 2.1e7, "residual": 0.0})
        db.add("measurement", {"tow": tow, "channel_id": 0, "prn": 5,
                               "mtype": "doppler", "value": 1500.0,
                               "raw_value": 1500.0, "residual": 0.0})
    path = str(tmp_path / "exp.rnx")
    n = rinex_obs.export_from_database(db, path)
    assert n == 2
    assert rinex_obs.read_obs(path)[0]["obs"][5]["D1C"] == pytest.approx(1500.0)
    db.close()


def test_rinex_obs_l1c_roundtrip(tmp_path):
    """L1C writes/reads in the 3-observable layout; records with a missing
    middle observable keep later fields in their 16-char slots."""
    from sydr_tpu.io import rinex_obs

    epochs = [
        {"tow": 302406.0, "obs": {
            2: {"C1C": 21234567.123, "L1C": -12345.678, "D1C": 1234.5},
            7: {"C1C": 22345678.5, "D1C": -2345.25},   # no L1C
        }},
    ]
    path = str(tmp_path / "obs3.rnx")
    rinex_obs.write_obs(path, epochs, week=2190)
    back = rinex_obs.read_obs(path)
    o2 = back[0]["obs"][2]
    assert o2["L1C"] == pytest.approx(-12345.678, abs=1e-3)
    assert o2["D1C"] == pytest.approx(1234.5, abs=1e-2)
    o7 = back[0]["obs"][7]
    assert "L1C" not in o7
    assert o7["D1C"] == pytest.approx(-2345.25, abs=1e-2)


def test_rinex_obs_export_carrier_phase(tmp_path):
    from sydr_tpu.io import rinex_obs

    db = ResultDatabase(str(tmp_path / "m3.db"))
    for tow in (1.0, 2.0):
        for mtype, val in (("pseudorange", 2.1e7),
                           ("doppler", 1500.0),
                           ("carrier_phase", -777.125)):
            db.add("measurement", {"tow": tow, "channel_id": 0, "prn": 5,
                                   "mtype": mtype, "value": val,
                                   "raw_value": val, "residual": 0.0})
    path = str(tmp_path / "exp3.rnx")
    assert rinex_obs.export_from_database(db, path) == 2
    back = rinex_obs.read_obs(path)
    assert back[0]["obs"][5]["L1C"] == pytest.approx(-777.125, abs=1e-3)
    db.close()

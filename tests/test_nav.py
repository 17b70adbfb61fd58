"""Navigation layer tests: Kepler solver, geodesy, LSE PVT."""

import numpy as np
import pytest

from sydr_tpu.constants import SPEED_OF_LIGHT
from sydr_tpu.nav import geodesy, kepler, lse
from sydr_tpu.nav.ephemeris import Ephemeris


def make_constellation(n=6, toe=302400.0, week=2190):
    """Plausible GPS constellation: circular-ish MEO orbits, spread planes."""
    sats = []
    for k in range(n):
        sats.append(Ephemeris(
            prn=k + 1, week=week,
            iodc=10 + k, iode=10 + k,
            toc=toe, toe=toe,
            af0=1e-5 * (k - 2), af1=1e-12, af2=0.0, tgd=2e-9 * k,
            ecc=0.005 + 0.001 * k, sqrt_a=5153.7,
            m0=0.7 * k, omega0=2 * np.pi * (k % 3) / 3 + 0.3,
            omega=0.5 * k, i0=0.96, deltan=4.5e-9,
            crs=20.0, crc=200.0, cuc=-1e-6, cus=8e-6,
            cic=-1e-7, cis=2e-8, omega_dot=-8e-9, i_dot=3e-10,
        ))
    return sats


def test_kepler_orbit_radius_and_speed():
    eph = make_constellation(1)[0]
    pos, vel, clk = kepler.satellite_position_velocity(eph, 302400.0)
    r = np.linalg.norm(pos)
    assert 2.5e7 < r < 2.75e7            # GPS orbit radius ~26,560 km
    v = np.linalg.norm(vel)
    # ECEF-frame speed (inertial ~3.9 km/s minus Earth-rotation transport).
    assert 2000 < v < 4500
    assert abs(clk) < 1e-3


def test_kepler_velocity_matches_finite_difference():
    eph = make_constellation(1)[0]
    t = 302700.0
    pos1, vel, _ = kepler.satellite_position_velocity(eph, t)
    dt = 0.5
    pos2, _, _ = kepler.satellite_position_velocity(eph, t + dt)
    fd = (pos2 - pos1) / dt
    np.testing.assert_allclose(vel, fd, atol=0.5)  # m/s


def test_clock_correction_sign_and_magnitude():
    eph = make_constellation(1)[0]
    _, _, clk = kepler.satellite_position_velocity(eph, eph.toc + 100.0)
    # af0 dominates: -2e-5 s.
    assert clk == pytest.approx(eph.af0, abs=2e-7)


def test_geodetic_roundtrip():
    lat, lon, h = np.deg2rad(61.45), np.deg2rad(23.85), 150.0
    ecef = geodesy.geodetic_to_ecef(lat, lon, h)
    lat2, lon2, h2 = geodesy.ecef_to_geodetic(ecef)
    assert lat2 == pytest.approx(lat, abs=1e-11)
    assert lon2 == pytest.approx(lon, abs=1e-11)
    assert h2 == pytest.approx(h, abs=1e-6)


def test_enu_axes():
    ref = geodesy.geodetic_to_ecef(np.deg2rad(45.0), np.deg2rad(7.0), 0.0)
    up = geodesy.ecef_to_enu(ref * 1.001, ref)
    assert up[2] > 0 and abs(up[0]) < 1e-6 * up[2] + 1e-6


def test_earth_rotation_correction_magnitude():
    pos = np.array([2.6e7, 0.0, 0.0])
    rot = geodesy.correct_earth_rotation(0.07, pos)
    # ~0.07 s * omega_e * r ~ 133 km shift in y.
    assert abs(rot[1] + 2.6e7 * 7.292e-5 * 0.07) < 1.0
    assert np.linalg.norm(rot) == pytest.approx(np.linalg.norm(pos))


def test_pvt_recovers_position():
    """Synthesize exact pseudoranges from the Kepler truth; solve back."""
    sats = make_constellation(6)
    rx = geodesy.geodetic_to_ecef(np.deg2rad(61.4498), np.deg2rad(23.8595),
                                  120.0)
    t_rx = 302406.0
    clock_bias_m = 8500.0

    pr = []
    for eph in sats:
        # Solve the light-time equation iteratively against truth geometry.
        tau = 0.07
        for _ in range(8):
            pos, _, clk = kepler.satellite_position_velocity(eph, t_rx - tau)
            pos_rot = geodesy.correct_earth_rotation(tau, pos)
            rho = np.linalg.norm(pos_rot - rx)
            tau = rho / SPEED_OF_LIGHT
        # Receiver measures rho + clock bias - c*sat_clock (+ noise none).
        pr.append(rho + clock_bias_m - clk * SPEED_OF_LIGHT)
    # Corrected pseudoranges add back the satellite clock (receiver does it).
    pr_corr = [
        p + kepler.satellite_position_velocity(e, t_rx - 0.07)[2]
        * SPEED_OF_LIGHT
        for p, e in zip(pr, sats)
    ]

    sol = lse.solve_pvt(np.array(pr_corr), sats, t_rx,
                        approx_position=np.zeros(3))
    assert sol is not None and sol.converged
    err = np.linalg.norm(sol.position - rx)
    assert err < 1.0, err
    assert sol.clock_bias_m == pytest.approx(clock_bias_m, abs=1.0)
    assert np.max(np.abs(sol.residuals)) < 1.0
    assert sol.gdop < 10.0


def test_pvt_underdetermined_returns_none():
    sats = make_constellation(3)
    assert lse.solve_pvt(np.zeros(3), sats, 302400.0, np.zeros(3)) is None

"""Unit tests for PVT building blocks (pseudoranges, satpos, LSQ,
geodesy round trips)."""
import dataclasses
import math

import numpy as np
import pytest

from bds3_tpu.config import C_LIGHT, b2a_settings
from bds3_tpu.navmsg.ephemeris import Ephemeris
from bds3_tpu.pvt.geodesy import cart2geo, check_t, geo2cart, topocent
from bds3_tpu.pvt.lsq import least_square_pos
from bds3_tpu.pvt.pseudorange import transmit_times
from bds3_tpu.pvt.satpos import A_REF_MEO, MU, satpos_one


class FakeTrack:
    def __init__(self, abs_s, code_freq, rem):
        self.absolute_sample = abs_s            # (C, E)
        self.code_freq = code_freq              # (C, E)
        self.outputs = {"rem_code_phase": rem}  # (C, E)


class TestTransmitTimes:
    def test_anchoring(self):
        s = b2a_settings(sampling_freq=10e6)
        spc = s.samples_per_code
        E = 50
        # channel 0: epochs end exactly every spc samples from 100
        abs_s = (100 + spc * np.arange(1, E + 1))[None, :]
        code_freq = np.full((1, E), s.code_freq_basis)
        rem = np.zeros((1, E))
        trk = FakeTrack(abs_s, code_freq, rem)
        sub = {0: 10}
        tow = {0: 5000.0}
        # measurement point exactly at the end of epoch 20 (0-based)
        curr = int(abs_s[0, 20])
        tt = transmit_times(trk, [0], sub, tow, curr, s)
        # exact anchoring: end of epoch e is (e - sfs + 1) code periods
        # after the frame start (see pseudorange.py deviation note)
        expect = 5000.0 + (20 - 10 + 1) * 1e-3
        assert tt[0] == pytest.approx(expect, abs=1e-12)

        # half a code period later
        curr2 = curr + spc // 2
        tt2 = transmit_times(trk, [0], sub, tow, curr2, s)
        assert tt2[0] - tt[0] == pytest.approx(0.5e-3, rel=1e-6)


class TestSatpos:
    def test_circular_orbit_radius_and_clock(self):
        eph = Ephemeris()
        eph.sat_type = "MEO"
        eph.e = 0.0
        eph.i_0 = math.radians(55)
        eph.t_oe = 1000.0
        eph.t_oc = 1000.0
        eph.a_0 = 1e-5
        eph.a_1 = 1e-12
        pos, clk = satpos_one(1000.0, eph, apply_tgd=False)
        assert np.linalg.norm(pos) == pytest.approx(A_REF_MEO, rel=1e-9)
        assert clk == pytest.approx(1e-5, abs=1e-15)
        # orbital speed after 10 s consistent with circular MEO
        pos2, _ = satpos_one(1010.0, eph, apply_tgd=False)
        v = np.linalg.norm(pos2 - pos) / 10.0
        v_expect = math.sqrt(MU / A_REF_MEO)  # inertial speed
        # ECEF speed differs by earth rotation; loose bound
        assert 0.7 * v_expect < v < 1.3 * v_expect

    def test_week_crossover(self):
        assert check_t(302500.0) == pytest.approx(302500.0 - 604800.0)
        assert check_t(-302500.0) == pytest.approx(-302500.0 + 604800.0)
        assert check_t(100.0) == 100.0


class TestGeodesy:
    def test_geo2cart_roundtrip(self):
        for lat, lon, h in ((40.0, -105.2, 1600.0), (-33.9, 151.2, 30.0)):
            x, y, z = geo2cart(lat, lon, h)
            lat2, lon2, h2 = cart2geo(x, y, z, 5)
            assert lat2 == pytest.approx(lat, abs=1e-9)
            assert (lon2 % 360) == pytest.approx(lon % 360, abs=1e-9)
            assert h2 == pytest.approx(h, abs=1e-4)

    def test_topocent_zenith(self):
        rx = geo2cart(40.0, -105.0, 0.0)
        up = geo2cart(40.0, -105.0, 100000.0) - rx
        az, el, d = topocent(rx, up)
        assert el == pytest.approx(90.0, abs=0.01)
        assert d == pytest.approx(100000.0, rel=1e-6)


class TestLSQ:
    def test_recovers_position_without_corrections(self):
        rng = np.random.default_rng(0)
        truth = np.array(geo2cart(40.0, -105.0, 1600.0))
        dt = 1234.5  # receiver clock bias [m]
        sats = []
        for _ in range(6):
            u = rng.normal(size=3)
            u[2] = abs(u[2]) + 0.5
            u /= np.linalg.norm(u)
            sats.append(truth + u * 2.2e7)
        sat_pos = np.array(sats).T
        # observations consistent with earth-rotation correction applied
        from bds3_tpu.pvt.geodesy import e_r_corr

        obs = []
        for j in range(6):
            # iterate the forward model the solver inverts
            rho = np.linalg.norm(sat_pos[:, j] - truth)
            for _ in range(3):
                rot = e_r_corr(rho / C_LIGHT, sat_pos[:, j])
                rho = np.linalg.norm(rot - truth)
            obs.append(rho + dt)
        pos, el, az, dop = least_square_pos(sat_pos, np.array(obs),
                                            use_tropo=False)
        assert np.linalg.norm(pos[:3] - truth) < 1e-3
        assert pos[3] == pytest.approx(dt, abs=1e-3)
        assert np.all(el[np.isfinite(el)] >= -90)

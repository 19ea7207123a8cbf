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


class TestElevationReadmission:
    """A satellite that dips below the elevation mask must re-enter the
    solution when it rises again (the reference never re-admits,
    postNavigation.m:293-297 — solver.py's documented fix)."""

    def test_dip_and_return(self, monkeypatch):
        import bds3_tpu.pvt.solver as solver_mod
        from bds3_tpu.io.scenario import make_constellation
        from bds3_tpu.pvt.geodesy import e_r_corr
        from bds3_tpu.pvt.lsq import least_square_pos as real_lsq
        from bds3_tpu.pvt.satpos import satpos_one

        rx = np.array([-1288398.0, -4721697.0, 4078625.0])  # Boulder ECEF
        sow = 3600.0 * 3
        fs = 10.23e6                      # exactly 10230 samples/ms
        s = b2a_settings(sampling_freq=fs, intermediate_freq=2.5e6,
                         nav_sol_period_ms=100, elevation_mask_deg=10.0,
                         use_tropo_corr=False)
        spc = s.samples_per_code
        assert spc == 10230
        ephs = make_constellation(rx, 5, sow, seed=3, min_elevation=25.0)
        C, E = len(ephs), 900

        # geometry-consistent fake tracking archives: with abs_s[e] =
        # (e+1)*spc, rem=0, code_freq=basis, transmit_times gives
        # tt(curr) = curr/fs + tow; choosing tow = sow - tau(t0) makes
        # tt match the true transmit time at the first measurement
        # (range-rate drift over the short span is meters — irrelevant
        # to mask logic)
        abs_s = np.tile((1 + np.arange(E, dtype=np.int64)) * spc, (C, 1))
        track = FakeTrack(abs_s, np.full((C, E), s.code_freq_basis),
                          np.zeros((C, E)))
        track.prns = np.array([e.prn for e in ephs])
        d_ip = np.zeros((C, E))
        d_ip[:, 0] = np.arange(C)
        track.outputs["d_ip"] = d_ip

        curr0 = int(abs_s[0, 0]) + 1
        t0 = curr0 / fs
        per_ch = {}
        for ch, eph in enumerate(ephs):
            eph.id_valid = {10, 11, 30}   # pass the B2a requisite gate
            tau = 0.07
            for _ in range(4):
                pos, _ = satpos_one(sow + t0 - tau, eph, apply_tgd=False)
                tau = np.linalg.norm(e_r_corr(tau, pos) - rx) / C_LIGHT
            per_ch[ch] = (eph, 0, sow + t0 - tau - t0)

        monkeypatch.setattr(
            solver_mod, "decode_bcnav2",
            lambda ip, **kw: per_ch[int(round(ip[0]))])

        dipped = 0                        # channel forced below the mask
        calls = []

        def spy_lsq(sat_pos, obs, use_tropo):
            xyzdt, el, az, dop = real_lsq(sat_pos, obs, use_tropo)
            calls.append(len(obs))
            if len(calls) == 2 and len(obs) == C:
                el = el.copy()
                el[dipped] = s.elevation_mask_deg - 5.0  # simulated dip
            return xyzdt, el, az, dop

        monkeypatch.setattr(solver_mod, "least_square_pos", spy_lsq)
        sol = solver_mod.post_navigation(track, s)
        assert sol is not None and len(calls) >= 4, calls
        # epoch 0,1: all 5; epoch 2: dipped channel excluded; epoch 3+:
        # re-admitted (the old behavior stays at 4 forever)
        assert calls[0] == C and calls[1] == C
        assert calls[2] == C - 1
        assert calls[3] == C, (
            f"satellite not re-admitted after rising: calls={calls}")
        # the re-admission elevation recorded for the excluded epoch is
        # the true (above-mask) elevation seen from the fix
        assert sol.el[dipped, 2] > s.elevation_mask_deg
        # sanity: the first fix is exact (tt model anchored at t0); later
        # fixes drift with the frozen-range-rate approximation (~km over
        # the span — irrelevant to elevation decisions at 2e7 m range)
        ok = np.isfinite(sol.x)
        err = np.sqrt((sol.x[ok] - rx[0]) ** 2 + (sol.y[ok] - rx[1]) ** 2
                      + (sol.z[ok] - rx[2]) ** 2)
        assert err[0] < 1.0 and np.max(err) < 5e3, err


class TestCart2UtmED50:
    """ED50 parity path (`Common/cart2utm.m:48-168` behavior)."""

    def test_clenshaw_matches_direct_sum(self):
        import cmath

        from bds3_tpu.pvt.geodesy import _clenshaw_sin, _clenshaw_sin_c

        coef = [0.3, -0.05, 0.007, -0.0004]
        for x in (0.1, 1.0, 2.5):
            direct = sum(c * math.sin((t + 1) * x)
                         for t, c in enumerate(coef))
            assert _clenshaw_sin(coef, x) == pytest.approx(direct, abs=1e-15)
        z = 1.2 + 0.3j
        directc = sum(c * cmath.sin((t + 1) * z)
                      for t, c in enumerate(coef))
        got = _clenshaw_sin_c(coef, z)
        assert abs(got - directc) < 1e-14

    def test_series_coefficients_match_reference_table(self):
        # the reference hard-codes the f=1/297 evaluations of the
        # Koenig-Weise polynomials (cart2utm.m:118-137); our derived
        # coefficients must reproduce them to their printed precision
        from bds3_tpu.pvt.geodesy import _gauss_krueger_coeffs

        f = 1.0 / 297.0
        bg, gtu = _gauss_krueger_coeffs(f / (2 - f))
        ref_bg = [-3.37077907e-3, 4.73444769e-6,
                  -8.29914570e-9, 1.58785330e-11]
        ref_gtu = [8.41275991e-4, 7.67306686e-7,
                   1.21291230e-9, 2.48508228e-12]
        for got, ref in zip(bg + gtu, ref_bg + ref_gtu):
            assert got == pytest.approx(ref, rel=1e-8), (got, ref)

    def test_ed50_path_properties(self):
        from bds3_tpu.pvt.geodesy import (
            cart2utm, cart2utm_ed50, geo2cart, togeod,
        )

        # Aalborg-ish (Kai Borre's home turf), UTM zone 32
        lat, lon, h = 57.0, 10.0, 100.0
        x, y, z = geo2cart(lat, lon, h)
        e, n, u = cart2utm_ed50(x, y, z, 32)
        # dispatcher parity
        assert cart2utm(x, y, z, 32, datum="ed50") == (e, n, u)
        # height survives the datum change to within the ED50 shift
        assert abs(u - h) < 60.0
        # E/N in plausible zone-32 ranges for 57N 10E
        assert 400e3 < e < 700e3 and 6.2e6 < n < 6.4e6
        # the WGS84 path differs by the (finite, local) datum offset
        e2, n2, _ = cart2utm(x, y, z, 32)
        off = math.hypot(e - e2, n - n2)
        assert 20.0 < off < 400.0, off

    def test_ed50_local_metric_consistency(self):
        # relative displacements must agree between the ED50 and WGS84
        # paths to the differential-datum level (~1e-4): a 1 km east
        # step moves E by ~1 km in both
        import numpy as _np

        from bds3_tpu.pvt.geodesy import cart2utm, cart2utm_ed50, geo2cart

        lat, lon = 57.0, 10.0
        p0 = _np.array(geo2cart(lat, lon, 50.0))
        dtr = math.pi / 180
        east_dir = _np.array([-math.sin(lon * dtr),
                              math.cos(lon * dtr), 0.0])
        p1 = p0 + 1000.0 * east_dir
        e0, n0, _ = cart2utm_ed50(*p0, 32)
        e1, n1, _ = cart2utm_ed50(*p1, 32)
        w_e0, w_n0, _ = cart2utm(*p0, 32)
        w_e1, w_n1, _ = cart2utm(*p1, 32)
        assert (e1 - e0) == pytest.approx(w_e1 - w_e0, abs=1.5)
        assert (n1 - n0) == pytest.approx(w_n1 - w_n0, abs=1.5)
        assert e1 - e0 == pytest.approx(1000.0, abs=5.0)

    def test_southern_hemisphere_false_northing(self):
        from bds3_tpu.pvt.geodesy import cart2utm_ed50, geo2cart

        x, y, z = geo2cart(-33.9, 18.4, 0.0)   # Cape Town, zone 34
        e, n, u = cart2utm_ed50(x, y, z, 34)
        assert 1.5e7 < n < 2e7                  # 20e6 - |N|

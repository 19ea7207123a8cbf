"""Closed-loop tracking tests on synthesized IF signals with known truth."""
import numpy as np
import pytest

from bds3_tpu.acquire import acquire
from bds3_tpu.config import TrackMode, b1c_settings, b2a_settings
from bds3_tpu.io import SatParams, synthesize_if
from bds3_tpu.track import track
from bds3_tpu.track.loops import dll_coefficients, pll_coefficients
from bds3_tpu.track.state import assign_channels


def b2a_s(**kw):
    base = dict(sampling_freq=30e6, intermediate_freq=7.5e6,
                acq_noncoh_rounds=5, acq_satellite_list=(19,))
    base.update(kw)
    return b2a_settings(**base)


def b1c_s(**kw):
    base = dict(sampling_freq=12e6, intermediate_freq=3e6,
                acq_coh_ms=3, acq_step=1000 / 3 / 2,
                acq_search_band=2000.0, acq_satellite_list=(19,),
                track_mode=TrackMode.NARROWBAND)
    base.update(kw)
    return b1c_settings(**base)


class TestLoopCoefficients:
    def test_dll(self):
        tau1, tau2 = dll_coefficients(2.0, 0.7, 1.0)
        wn = 2.0 * 8 * 0.7 / (4 * 0.49 + 1)
        assert tau1 == pytest.approx(1.0 / wn**2)
        assert tau2 == pytest.approx(1.4 / wn)

    def test_pll(self):
        pf3, pf2, pf1 = pll_coefficients(20.0, 0.001)
        wn = 24.0
        assert pf3 == pytest.approx(wn**3 * 1e-6)
        assert pf2 == pytest.approx(2 * wn**2 * 1e-3)
        assert pf1 == pytest.approx(2 * wn)


def run_pipeline(s, sat, n_ms, n_epochs, noise=1.5, seed=7):
    sig = synthesize_if(s, [sat], n_ms=n_ms, noise_std=noise, seed=seed)
    acq = acquire(sig, s)
    assert acq.detected.any(), acq.peak_metric
    chans = assign_channels(acq, s)
    res = track(sig, s, chans, n_epochs=n_epochs, epochs_per_block=50)
    return acq, chans, res


class TestB2aTracking:
    def test_lock_and_bits(self):
        s = b2a_s()
        rng = np.random.default_rng(0)
        bits = (1 - 2 * rng.integers(0, 2, size=100)).astype(np.int8)
        sat = SatParams(prn=19, doppler_hz=1234.0, code_phase_chips=4100.0,
                        amplitude=0.8, nav_bits=bits, carrier_phase=0.4)
        acq, chans, res = run_pipeline(s, sat, n_ms=520.0, n_epochs=500)

        ip = res.outputs["d_ip"][0]
        qp = res.outputs["d_qp"][0]
        # PLL locked: power concentrated in I on the tail
        tail = slice(400, 500)
        assert np.mean(np.abs(ip[tail])) > 8 * np.mean(np.abs(qp[tail]))

        # carrier frequency converges to truth
        true_f = s.intermediate_freq + sat.doppler_hz
        assert abs(np.mean(res.carr_freq[0, 450:500]) - true_f) < 1.0

        # code rate converges to Doppler-scaled chipping rate
        true_code_f = s.code_freq_basis * (1 + sat.doppler_hz / s.carr_freq_basis)
        assert abs(np.mean(res.code_freq[0, 450:500]) - true_code_f) < 0.5

        # data-channel prompt sign recovers nav_bits x secondary overlay
        sec = np.array([1, 1, 1, -1, 1], dtype=np.int8)
        periods = np.arange(600)
        overlay = bits[(periods // 5) % len(bits)] * sec[periods % 5]
        signs = np.sign(ip[tail])
        best = 0.0
        for shift in range(4):
            ref = overlay[tail.start + shift : tail.stop + shift]
            best = max(best, np.mean(signs == ref), np.mean(signs == -ref))
        assert best > 0.99, best

    def test_complex_iq_capture(self):
        from bds3_tpu.config import FileType

        s = b2a_s(sampling_freq=10e6, intermediate_freq=2.5e6,
                  file_type=FileType.IQ8)
        sat = SatParams(prn=19, doppler_hz=400.0, code_phase_chips=500.0,
                        amplitude=0.8)
        raw = synthesize_if(s, [sat], n_ms=150.0, noise_std=1.5, seed=12)
        sig = raw[:, 0].astype(np.float32) + 1j * raw[:, 1].astype(np.float32)
        acq = acquire(sig, s)
        assert acq.detected.any()
        chans = assign_channels(acq, s)
        res = track(sig.astype(np.complex64), s, chans, n_epochs=120,
                    epochs_per_block=60)
        true_f = s.intermediate_freq + sat.doppler_hz
        assert abs(np.mean(res.carr_freq[0, 100:120]) - true_f) < 1.0

    def test_pilot_tracking_mode(self):
        s = b2a_s(track_mode=TrackMode.NARROWBAND)  # data+pilot joint
        sat = SatParams(prn=19, doppler_hz=-900.0, code_phase_chips=100.0,
                        amplitude=0.8)
        acq, chans, res = run_pipeline(s, sat, n_ms=220.0, n_epochs=200)
        true_f = s.intermediate_freq + sat.doppler_hz
        assert abs(np.mean(res.carr_freq[0, 150:200]) - true_f) < 1.0
        # pilot should appear in +Q when locked (pi/2 ahead convention)
        pq = res.outputs["p11_qp"][0][150:]
        pi = res.outputs["p11_ip"][0][150:]
        assert np.mean(pq) > 5 * abs(np.mean(pi))


class TestB1CTracking:
    def test_nb_lock(self):
        s = b1c_s()
        rng = np.random.default_rng(1)
        bits = (1 - 2 * rng.integers(0, 2, size=64)).astype(np.int8)
        sat = SatParams(prn=19, doppler_hz=750.0, code_phase_chips=2345.0,
                        amplitude=1.2, nav_bits=bits)
        acq, chans, res = run_pipeline(s, sat, n_ms=1200.0, n_epochs=100,
                                       noise=1.0)
        true_f = s.intermediate_freq + sat.doppler_hz
        assert abs(np.mean(res.carr_freq[0, 80:100]) - true_f) < 1.0

        # data prompt follows nav bits (one bit per 10 ms epoch)
        ip = res.outputs["d_ip"][0][60:100]
        periods = np.arange(120)
        overlay = bits[periods % len(bits)]
        best = 0.0
        for shift in range(3):
            ref = overlay[60 + shift : 100 + shift]
            best = max(best, np.mean(np.sign(ip) == ref),
                       np.mean(np.sign(ip) == -ref))
        assert best > 0.97, best

        # pilot BOC11 prompt carries the secondary code in Q
        from bds3_tpu.signals import b1c_secondary_code

        pq = res.outputs["p11_qp"][0][60:100]
        assert np.mean(np.abs(pq)) > 3 * np.mean(np.abs(res.outputs["p11_ip"][0][60:100]))

    def test_wb_qmboc_lock(self):
        # wideband mode needs the BOC(6,1) component adequately sampled
        s = b1c_s(sampling_freq=30e6, intermediate_freq=7.5e6,
                  track_mode=TrackMode.WIDEBAND)
        sat = SatParams(prn=19, doppler_hz=-600.0, code_phase_chips=777.0,
                        amplitude=1.2)
        acq, chans, res = run_pipeline(s, sat, n_ms=1700.0, n_epochs=100,
                                       noise=1.0)
        assert res.n_epochs >= 80
        true_f = s.intermediate_freq + sat.doppler_hz
        assert abs(np.mean(res.carr_freq[0, 60:80]) - true_f) < 1.0

        # composite pilot prompt power lands in composite I when locked
        w11 = np.sqrt(29.0 / 33.0)
        w61 = np.sqrt(4.0 / 33.0)
        pi = -w61 * res.outputs["p61_ip"][0] + w11 * res.outputs["p11_qp"][0]
        pq = -w61 * res.outputs["p61_qp"][0] - w11 * res.outputs["p11_ip"][0]
        tail = slice(60, 80)
        assert np.mean(np.abs(pi[tail])) > 4 * np.mean(np.abs(pq[tail]))

        # BOC(6,1) correlator actually sees power (WB-only observable):
        # its in-phase prompt should track the secondary-code sign
        p61 = res.outputs["p61_ip"][0][tail]
        assert np.mean(np.abs(p61)) > 0  # present
        # and the DLL weight is the analytic CalcWeighingFactor value
        from bds3_tpu.track.weighting import wb_dll_weight

        # pilot carries the wideband BOC(6,1) power, so the data channel
        # gets the minority DLL weight (~0.16 at 27 MHz front end)
        f = wb_dll_weight(s.code_freq_basis, s.front_end_bw)
        assert 0.05 < f < 0.5


class TestDeviceScanPath:
    def test_scan_equals_host_loop(self):
        """A device-resident capture takes the one-dispatch lax.scan
        block loop in track(); it must match the per-block host loop."""
        import jax.numpy as jnp

        s = b2a_s()
        sat = SatParams(prn=19, doppler_hz=820.0, code_phase_chips=2100.0,
                        amplitude=0.8, carrier_phase=0.2)
        sig = synthesize_if(s, [sat], n_ms=260.0, noise_std=1.5, seed=21)
        acq = acquire(sig, s)
        chans = assign_channels(acq, s)
        # multiple blocks: epochs_per_block=50, 200 epochs -> 4 blocks
        r_host = track(np.asarray(sig), s, chans, n_epochs=200,
                       epochs_per_block=50)
        r_scan = track(jnp.asarray(sig), s, chans, n_epochs=200,
                       epochs_per_block=50)
        assert r_host.n_epochs == r_scan.n_epochs
        for k in ("d_ip", "d_qp", "carr_err", "code_err", "blksize"):
            a, b = r_host.outputs[k], r_scan.outputs[k]
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-4,
                                       err_msg=k)
        np.testing.assert_array_equal(r_host.absolute_sample,
                                      r_scan.absolute_sample)

"""Golden-value acquisition tests on synthesized IF signals (scaled-down
sampling rates so the FFT search runs quickly on the CPU test mesh)."""
import numpy as np
import pytest

from bds3_tpu.acquire import acquire
from bds3_tpu.config import b1c_settings, b2a_settings
from bds3_tpu.io import SatParams, synthesize_if


def b2a_test_settings(**kw):
    base = dict(
        sampling_freq=30e6,
        intermediate_freq=7.5e6,
        acq_noncoh_rounds=5,
        acq_satellite_list=(5, 19, 32),
    )
    base.update(kw)
    return b2a_settings(**base)


def b1c_test_settings(**kw):
    base = dict(
        sampling_freq=12e6,
        intermediate_freq=3e6,
        acq_coh_ms=3,
        acq_step=1000 / 3 / 2,
        acq_search_band=2000.0,
        acq_satellite_list=(7, 19),
    )
    base.update(kw)
    return b1c_settings(**base)


def expected_code_start(sat: SatParams, s) -> float:
    """0-based sample index of the first code start (chip 0) in the capture."""
    code_rate = s.code_freq_basis * (1.0 + sat.doppler_hz / s.carr_freq_basis)
    chi0 = sat.code_phase_chips % s.code_length
    t0 = ((s.code_length - chi0) % s.code_length) / code_rate
    return t0 * s.sampling_freq


class TestB2aAcquisition:
    def test_single_prn_cold_start(self):
        s = b2a_test_settings()
        sat = SatParams(prn=19, doppler_hz=1650.0, code_phase_chips=3210.0,
                        carrier_phase=0.7, amplitude=0.8)
        sig = synthesize_if(s, [sat], n_ms=9.0, noise_std=2.0, seed=1)
        res = acquire(sig, s)

        i19 = list(res.prns).index(19)
        assert res.detected[i19], f"metric={res.peak_metric[i19]}"
        # absent PRNs must not be detected
        for prn, i in ((5, 0), (32, 2)):
            assert not res.detected[i], (prn, res.peak_metric[i])

        # code phase: any code-period ambiguity accepted
        spc = s.samples_per_code
        expect = expected_code_start(sat, s)
        err = (res.code_phase[i19] - expect) % spc
        err = min(err, spc - err)
        assert err <= 2.0, (res.code_phase[i19], expect)

        # carrier frequency within the 25 Hz fine grid of truth
        true_f = s.intermediate_freq + sat.doppler_hz
        assert abs(res.carr_freq[i19] - true_f) <= 15.0

    def test_negative_doppler(self):
        s = b2a_test_settings(acq_satellite_list=(19,))
        sat = SatParams(prn=19, doppler_hz=-3875.0, code_phase_chips=123.0,
                        amplitude=0.8)
        sig = synthesize_if(s, [sat], n_ms=9.0, noise_std=1.5, seed=2)
        res = acquire(sig, s)
        assert res.detected[0]
        true_f = s.intermediate_freq + sat.doppler_hz
        assert abs(res.carr_freq[0] - true_f) <= 15.0

    def test_multiple_sats(self):
        s = b2a_test_settings(acq_satellite_list=(3, 19, 25))
        sats = [
            SatParams(prn=3, doppler_hz=900.0, code_phase_chips=55.0, amplitude=0.7),
            SatParams(prn=25, doppler_hz=-2100.0, code_phase_chips=9000.0,
                      amplitude=0.7),
        ]
        sig = synthesize_if(s, sats, n_ms=9.0, noise_std=2.0, seed=3)
        res = acquire(sig, s)
        assert res.detected[0] and res.detected[2]
        assert not res.detected[1]


class TestB1CAcquisition:
    def test_single_prn(self):
        s = b1c_test_settings()
        sat = SatParams(prn=19, doppler_hz=1225.0, code_phase_chips=5100.0,
                        amplitude=1.2)
        sig = synthesize_if(s, [sat], n_ms=25.0, noise_std=2.0, seed=4)
        res = acquire(sig, s)
        i = list(res.prns).index(19)
        assert res.detected[i], f"metric={res.peak_metric[i]}"
        assert not res.detected[0]

        expect = expected_code_start(sat, s)
        spc = s.samples_per_code
        err = (res.code_phase[i] - expect) % spc
        err = min(err, spc - err)
        assert err <= 2.0

        true_f = s.intermediate_freq + sat.doppler_hz
        assert abs(res.carr_freq[i] - true_f) <= 15.0

    def test_iq_capture(self):
        from bds3_tpu.config import FileType

        s = b1c_test_settings(file_type=FileType.IQ8,
                              acq_satellite_list=(19,))
        sat = SatParams(prn=19, doppler_hz=-800.0, code_phase_chips=100.0,
                        amplitude=1.0)
        sig = synthesize_if(s, [sat], n_ms=25.0, noise_std=2.0, seed=5)
        x = sig[:, 0].astype(np.float32) + 1j * sig[:, 1].astype(np.float32)
        res = acquire(x, s)
        assert res.detected[0]
        true_f = s.intermediate_freq + sat.doppler_hz
        assert abs(res.carr_freq[0] - true_f) <= 15.0


class TestGLRTNoisePower:
    """The B1C GLRT denominator must use I+Q power for complex captures
    (BDS-3_B1C/acquisition.m:150); round-1 cast to float64 before the
    complex check, silently dropping Q."""

    def test_complex_uses_both_components(self):
        from bds3_tpu.acquire.pcps import glrt_noise_power

        rng = np.random.default_rng(0)
        n = 200_000
        sigma = 1.7
        x = sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
        p = glrt_noise_power(x)
        expect = np.sqrt(2.0 * sigma**2 * n)   # complex var = 2 sigma^2
        assert abs(p / expect - 1.0) < 0.01, (p, expect)
        # real path unchanged
        pr = glrt_noise_power(x.real)
        assert abs(pr / np.sqrt(sigma**2 * n) - 1.0) < 0.01

    def test_no_complex_warning(self):
        import warnings

        from bds3_tpu.acquire.pcps import glrt_noise_power

        rng = np.random.default_rng(1)
        x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            glrt_noise_power(x.astype(np.complex64))


def test_clear_acq_caches():
    """clear_acq_caches drops the device/host table caches (the
    documented release valve for multi-config runs)."""
    import numpy as np

    from bds3_tpu.acquire.pcps import (
        _device_acq_tables, clear_acq_caches, full_code_tables,
    )
    from bds3_tpu.config import b2a_settings

    s = b2a_settings(sampling_freq=5e6, intermediate_freq=1.25e6)
    full_code_tables(s, np.array([1, 2]))
    _device_acq_tables(s, (1, 2))
    assert _device_acq_tables.cache_info().currsize >= 1
    clear_acq_caches()
    assert _device_acq_tables.cache_info().currsize == 0

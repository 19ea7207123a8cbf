"""Bandpass-sampling acquisition path (reference resamplingflag)."""
import numpy as np

from bds3_tpu.acquire import acquire
from bds3_tpu.acquire.resample import plan_resample
from bds3_tpu.config import b1c_settings
from bds3_tpu.io import SatParams, synthesize_if


class TestResampledAcquisition:
    def test_plan(self):
        s = b1c_settings(sampling_freq=40e6, intermediate_freq=10e6)
        plan = plan_resample(s)
        # bandpass theorem keeps the 2.546 MHz code lobe alias-free
        assert plan.new_fs < s.sampling_freq / 4
        assert 0 < plan.new_if < plan.new_fs

    def test_detection_and_recovery(self):
        s = b1c_settings(
            sampling_freq=40e6, intermediate_freq=10e6,
            acq_coh_ms=3, acq_step=1000 / 3 / 2, acq_search_band=2000.0,
            acq_satellite_list=(19,), resampling=True,
            resampling_threshold=15e6,
        )
        sat = SatParams(prn=19, doppler_hz=850.0, code_phase_chips=4000.0,
                        amplitude=1.2)
        sig = synthesize_if(s, [sat], n_ms=25.0, noise_std=1.5, seed=8)
        res = acquire(sig.astype(np.float32), s)
        assert res.detected[0], res.peak_metric
        # carrier recovered at the ORIGINAL rate
        true_f = s.intermediate_freq + sat.doppler_hz
        assert abs(res.carr_freq[0] - true_f) <= 30.0
        # code phase recovered at the original rate (resampled resolution)
        code_rate = s.code_freq_basis * (1 + sat.doppler_hz / s.carr_freq_basis)
        chi0 = sat.code_phase_chips % s.code_length
        expect = ((s.code_length - chi0) % s.code_length) / code_rate \
            * s.sampling_freq
        spc = s.samples_per_code
        err = (res.code_phase[0] - expect) % spc
        err = min(err, spc - err)
        # resampling quantizes code phase to the decimated rate (~7 samples)
        assert err <= 12.0, (res.code_phase[0], expect)


class TestDeviceResample:
    def test_device_matches_host_interior(self):
        """The single-conv zero-phase device path must match scipy
        filtfilt away from the boundary transient (symmetric kernel:
        filtfilt == conv with the kernel autocorrelation)."""
        import numpy as np

        from bds3_tpu.acquire.resample import (
            plan_resample, resample_signal, resample_signal_device,
        )
        from bds3_tpu.config import b2a_settings

        s = b2a_settings(sampling_freq=40e6, intermediate_freq=9e6,
                         resampling=True, resampling_threshold=15e6)
        rng = np.random.default_rng(5)
        sig = rng.integers(-30, 30, 400_000).astype(np.int8)
        plan = plan_resample(s)
        host = resample_signal(sig, s, plan)
        dev = np.asarray(resample_signal_device(sig, s, plan))
        assert host.shape == dev.shape
        # boundary transient: ~3*701 input samples on each side, mapped
        # through the decimation ratio
        guard = int(3 * 701 * plan.new_fs / plan.old_fs) + 4
        h = host[guard:-guard]
        d = dev[guard:-guard]
        scale = np.abs(h).mean() + 1e-9
        np.testing.assert_allclose(d / scale, h / scale, atol=5e-3)

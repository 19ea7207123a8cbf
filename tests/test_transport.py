"""Capture transport: 4-bit packing roundtrip + device-resident receiver."""
import numpy as np
import pytest

from bds3_tpu.io.transport import pack_int4, unpack_int4, upload_capture


class TestInt4Packing:
    def test_roundtrip_exact_in_range(self):
        a = np.arange(-8, 8, dtype=np.int8)
        got = np.asarray(unpack_int4(pack_int4(a), len(a)))
        assert np.array_equal(got, a)

    def test_clipping(self):
        a = np.array([-128, -9, -8, 7, 8, 127], dtype=np.int8)
        got = np.asarray(unpack_int4(pack_int4(a), len(a)))
        assert np.array_equal(got, [-8, -8, -8, 7, 7, 7])

    def test_odd_length(self):
        a = np.array([3, -5, 7], dtype=np.int8)
        got = np.asarray(unpack_int4(pack_int4(a), len(a)))
        assert np.array_equal(got, a)

    def test_random_noise_stats(self):
        rng = np.random.default_rng(0)
        a = np.clip(rng.normal(0, 2.0, 100_000), -127, 127).astype(np.int8)
        got = np.asarray(unpack_int4(pack_int4(a), len(a)))
        # requantization only clips the >|7| tail (~0.05% at sigma=2)
        diff = got.astype(np.int32) - np.clip(a, -8, 7)
        assert np.all(diff == 0)

    def test_upload_capture_packing(self):
        rng = np.random.default_rng(1)
        a = rng.integers(-8, 8, 1001).astype(np.int8)
        assert np.array_equal(np.asarray(upload_capture(a, "int4")), a)
        assert np.array_equal(np.asarray(upload_capture(a, "none")), a)
        with pytest.raises(ValueError):
            upload_capture(a, "zstd")


class TestDeviceResidentReceiver:
    def test_forced_device_resident_matches_host_path(self):
        """run_receiver(device_resident=True) must produce the same fixes
        as the per-block host path (scan-path equivalence at the
        pipeline level)."""
        from bds3_tpu.config import b2a_settings
        from bds3_tpu.io import SatParams, synthesize_if
        from bds3_tpu.receiver import run_receiver

        s = b2a_settings(sampling_freq=30e6, intermediate_freq=7.5e6,
                         acq_noncoh_rounds=5, acq_satellite_list=(19,),
                         ms_to_process=60)
        sat = SatParams(prn=19, doppler_hz=1234.0, code_phase_chips=4100.0,
                        amplitude=0.8)
        sig = synthesize_if(s, [sat], n_ms=80.0, noise_std=1.5, seed=7)
        res_host = run_receiver(sig, s, verbose=False,
                                device_resident=False)
        res_dev = run_receiver(sig, s, verbose=False,
                               device_resident=True)
        assert "upload_s" in res_dev.timings
        a = res_host.track.outputs["d_ip"]
        b = res_dev.track.outputs["d_ip"]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-2)

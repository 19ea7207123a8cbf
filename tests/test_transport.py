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


class TestInt2Packing:
    def test_levels_and_order(self):
        from bds3_tpu.io.transport import pack_int2, unpack_int2

        a = np.array([0, 1, 2, 3, 4, -1, -3, -8, 7], dtype=np.int8)
        got = np.asarray(unpack_int2(pack_int2(a), len(a)))
        # thresh=3: |x| < 3 -> +-1, |x| >= 3 -> +-3; zero maps to +1
        assert got.tolist() == [1, 1, 1, 3, 3, -1, -3, -3, 3]

    def test_sign_preserved_random(self):
        from bds3_tpu.io.transport import pack_int2, unpack_int2

        rng = np.random.default_rng(3)
        a = np.clip(rng.normal(0, 3.0, 10_001), -127, 127).astype(np.int8)
        got = np.asarray(unpack_int2(pack_int2(a), len(a)))
        nz = a != 0
        assert np.array_equal(np.sign(got[nz]), np.sign(a[nz]))
        assert set(np.unique(got)) <= {-3, -1, 1, 3}

    def test_upload_capture_int2_tracks(self):
        """A 2-bit transported capture still tracks and locks (the 0.55 dB
        quantization loss is invisible at test C/N0)."""
        from bds3_tpu.config import b2a_settings
        from bds3_tpu.io import SatParams, synthesize_if
        from bds3_tpu.io.transport import upload_capture
        from bds3_tpu.observe.cn0 import channel_health
        from bds3_tpu.track import track
        from bds3_tpu.track.state import ChannelInit

        s = b2a_settings(sampling_freq=20e6, intermediate_freq=5e6)
        sat = SatParams(prn=7, doppler_hz=900.0, code_phase_chips=2000.0,
                        amplitude=0.8)
        sig = synthesize_if(s, [sat], n_ms=220.0, noise_std=2.0, seed=9)
        sig_dev = upload_capture(sig, "int2")
        code_rate = s.code_freq_basis * (1 + 900.0 / s.carr_freq_basis)
        start = ((s.code_length - 2000.0) % s.code_length) / code_rate
        init = ChannelInit(prn=7, acquired_freq=s.intermediate_freq + 900.0,
                           code_phase=int(round(start * s.sampling_freq)),
                           peak_metric=3.0)
        res = track(sig_dev, s, [init], n_epochs=200, epochs_per_block=100)
        h = channel_health(res)[0]
        assert h["lock_ok"], h


def test_per_block_transport_matches_clipped_plain():
    """track(transport='int4') on the host per-block path must equal
    plain tracking of the [-8,7]-clipped capture (the packing roundtrip
    is exact in range)."""
    from bds3_tpu.config import b2a_settings
    from bds3_tpu.io import SatParams, synthesize_if
    from bds3_tpu.track import track
    from bds3_tpu.track.state import ChannelInit

    s = b2a_settings(sampling_freq=20e6, intermediate_freq=5e6)
    sat = SatParams(prn=7, doppler_hz=900.0, code_phase_chips=2000.0,
                    amplitude=0.8)
    sig = synthesize_if(s, [sat], n_ms=80.0, noise_std=2.0, seed=9)
    code_rate = s.code_freq_basis * (1 + 900.0 / s.carr_freq_basis)
    start = ((s.code_length - 2000.0) % s.code_length) / code_rate
    init = ChannelInit(prn=7, acquired_freq=s.intermediate_freq + 900.0,
                       code_phase=int(round(start * s.sampling_freq)),
                       peak_metric=3.0)
    res_p = track(sig, s, [init], n_epochs=60, epochs_per_block=30,
                  transport="int4")
    res_c = track(np.clip(sig, -8, 7), s, [init], n_epochs=60,
                  epochs_per_block=30)
    np.testing.assert_allclose(res_p.outputs["d_ip"], res_c.outputs["d_ip"],
                               rtol=1e-5, atol=1e-3)

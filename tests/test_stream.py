"""StreamingCapture (native pread + lookahead) must be a drop-in signal
source for the tracking driver, matching the in-memory run exactly."""
import os
import tempfile

import numpy as np

from bds3_tpu.acquire import acquire
from bds3_tpu.config import b2a_settings
from bds3_tpu.io import SatParams, synthesize_if
from bds3_tpu.io.stream import StreamingCapture
from bds3_tpu.track.driver import track
from bds3_tpu.track.state import assign_channels


class TestStreamingCapture:
    def test_slices_match_file(self):
        rng = np.random.default_rng(0)
        raw = rng.integers(-100, 100, 300_000).astype(np.int8)
        path = os.path.join(tempfile.mkdtemp(), "cap.bin")
        raw.tofile(path)
        cap = StreamingCapture(path)
        assert len(cap) == len(raw)
        # strictly-advancing block loop (the driver's pattern) hits the
        # prefetch; the answers must match regardless
        for s in (0, 40_000, 80_000, 120_000, 299_000):
            np.testing.assert_array_equal(cap[s:s + 50_000],
                                          raw[s:s + 50_000])
        # non-monotone request falls back to a synchronous read
        np.testing.assert_array_equal(cap[10:20], raw[10:20])

    def test_track_from_stream_equals_memory(self):
        s = b2a_settings(sampling_freq=10e6, intermediate_freq=2.5e6,
                         acq_satellite_list=(19,), num_channels=2)
        sat = SatParams(prn=19, doppler_hz=600.0, code_phase_chips=321.0,
                        amplitude=0.8)
        sig = synthesize_if(s, [sat], n_ms=160.0, noise_std=1.2, seed=5)
        path = os.path.join(tempfile.mkdtemp(), "cap.bin")
        np.asarray(sig, dtype=np.int8).tofile(path)

        acq = acquire(sig, s)
        chans = assign_channels(acq, s)
        ref = track(np.asarray(sig), s, chans, n_epochs=120,
                    epochs_per_block=40)
        got = track(StreamingCapture(path), s, chans, n_epochs=120,
                    epochs_per_block=40)
        assert got.n_epochs == ref.n_epochs
        for k in ("d_ip", "d_qp", "carr_err", "blksize"):
            np.testing.assert_array_equal(got.outputs[k], ref.outputs[k],
                                          err_msg=k)


def test_synthesize_if_segmented_continuity():
    """start_sample renders phase-continuous segments: a capture built
    in file-append chunks (the 49 s streaming bench) is bit-identical
    to a single-call render."""
    import numpy as np

    from bds3_tpu.config import b2a_settings
    from bds3_tpu.io import SatParams, synthesize_if

    s = b2a_settings(sampling_freq=8e6, intermediate_freq=2e6)
    sats = [SatParams(prn=3, doppler_hz=800.0, code_phase_chips=123.0,
                      amplitude=0.8)]
    whole = synthesize_if(s, sats, n_ms=8.0, noise_std=0.0, seed=5)
    a = synthesize_if(s, sats, n_ms=5.0, noise_std=0.0, seed=5)
    b = synthesize_if(s, sats, n_ms=3.0, noise_std=0.0, seed=5,
                      start_sample=len(a))
    assert np.array_equal(whole, np.concatenate([a, b]))


def test_track_deadline_returns_partial():
    """track(deadline_s=0) with sync_each_block must return after the
    first block with partial (but valid) epochs instead of stalling a
    fixed-epoch schedule (the streaming bench's IO-collapse guard)."""
    import numpy as np

    from bds3_tpu.config import b2a_settings
    from bds3_tpu.io import SatParams, synthesize_if
    from bds3_tpu.track.driver import track
    from bds3_tpu.track.state import ChannelInit

    s = b2a_settings(sampling_freq=8e6, intermediate_freq=2e6)
    sat = SatParams(prn=7, doppler_hz=500.0, code_phase_chips=0.0,
                    amplitude=0.8)
    sig = synthesize_if(s, [sat], n_ms=130.0, noise_std=1.0, seed=4)
    init = ChannelInit(prn=7, acquired_freq=2e6 + 500.0, code_phase=0,
                      peak_metric=2.0)
    res = track(np.asarray(sig), s, [init], n_epochs=120,
                epochs_per_block=30, sync_each_block=True, deadline_s=0.0)
    # one block of 30 epochs completed, the rest cut by the deadline
    assert res.n_epochs == 30
    assert np.isfinite(res.outputs["d_ip"]).all()

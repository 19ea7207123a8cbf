"""The prefix-sum (bucket) correlator is an exact regrouping of the
per-sample gather correlator; verify both paths agree to float tolerance
over a real tracking run."""
import dataclasses

import numpy as np
import pytest

from bds3_tpu.config import b2a_settings
from bds3_tpu.io import SatParams, synthesize_if
from bds3_tpu.track.driver import track
from bds3_tpu.track.state import ChannelInit


class TestCorrelatorEquivalence:
    def test_bucket_matches_gather(self):
        s = b2a_settings(sampling_freq=10e6, intermediate_freq=2.5e6)
        sat = SatParams(prn=19, doppler_hz=777.0, code_phase_chips=123.0,
                        amplitude=0.9)
        sig = synthesize_if(s, [sat], n_ms=150.0, noise_std=1.0, seed=6)
        code_rate = s.code_freq_basis * (1 + sat.doppler_hz / s.carr_freq_basis)
        chi0 = sat.code_phase_chips % s.code_length
        start = ((s.code_length - chi0) % s.code_length) / code_rate
        init = ChannelInit(prn=19,
                           acquired_freq=s.intermediate_freq + sat.doppler_hz,
                           code_phase=int(round(start * s.sampling_freq)),
                           peak_metric=2.0)

        import bds3_tpu.track.driver as drv
        from bds3_tpu.track.state import make_track_config

        res = {}
        for corr in ("bucket", "gather", "bucket_pallas"):
            orig = drv.make_track_config

            def patched(st, complex_input=False, epochs_per_block=100,
                        correlator=corr):
                return orig(st, complex_input, epochs_per_block, corr)

            drv.make_track_config = patched
            try:
                res[corr] = track(sig, s, [init], n_epochs=100,
                                  epochs_per_block=50)
            finally:
                drv.make_track_config = orig

        for k in ("d_ip", "d_qp", "d_ie", "d_il", "p11_ip", "p11_qp"):
            a = res["bucket"].outputs[k][0]
            b = res["gather"].outputs[k][0]
            c = res["bucket_pallas"].outputs[k][0]
            scale0 = np.abs(a).mean() + 1.0
            np.testing.assert_allclose(c / scale0, a / scale0, atol=2e-2,
                                       err_msg="pallas:" + k)
            scale = np.abs(b).mean() + 1.0
            # ~1% agreement: the two index computations round a few
            # chip-boundary samples differently in f32, and the closed
            # loop compounds the tiny phase differences over epochs
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-2,
                                       err_msg=k)
        np.testing.assert_allclose(
            res["bucket"].carr_freq[0], res["gather"].carr_freq[0], atol=0.05
        )
        np.testing.assert_allclose(
            res["bucket_pallas"].carr_freq[0], res["bucket"].carr_freq[0],
            atol=0.05,
        )

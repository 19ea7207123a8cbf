"""Low-C/N0 behavior: acquisition thresholds, C/N0 estimator accuracy,
lock detectors (VERDICT r4 item 3 — the regime the published thresholds
exist for: B2a peak-ratio 1.5 `BDS-3_B2a/initSettings.m:79`, B1C GLRT 7.5
`BDS-3_B1C/initSettings.m:106`).

Measured sensitivity floors (this suite pins them): B2a's single-trial
1 ms-coherent PCPS at threshold 1.5 detects at ~44 dB-Hz but NOT at
40 dB-Hz (peak-ratio ~1.3 — the reference's 1 ms search assumes strong
open-sky satellites); B1C's 10 ms-coherent GLRT detects at 38 dB-Hz with
margin (20x the coherent energy)."""
import numpy as np
import pytest

from bds3_tpu.acquire import acquire
from bds3_tpu.config import b1c_settings, b2a_settings
from bds3_tpu.io import SatParams, amplitude_for_cn0, synthesize_if
from bds3_tpu.observe.cn0 import channel_health
from bds3_tpu.track import track
from bds3_tpu.track.state import ChannelInit

NOISE = 2.0


def b2a_s(**kw):
    base = dict(sampling_freq=20e6, intermediate_freq=5e6,
                acq_noncoh_rounds=5)
    base.update(kw)
    return b2a_settings(**base)


def truth_init(s, prn, fd, cp_chips, metric=3.0):
    """ChannelInit at the true code phase (bench make_inits recipe)."""
    code_rate = s.code_freq_basis * (1 + fd / s.carr_freq_basis)
    chi0 = cp_chips % s.code_length
    start = ((s.code_length - chi0) % s.code_length) / code_rate
    return ChannelInit(prn=prn, acquired_freq=s.intermediate_freq + fd,
                       code_phase=int(round(start * s.sampling_freq)),
                       peak_metric=metric)


class TestAcquisitionThresholds:
    def test_b2a_detection_44db_false_alarm_floor(self):
        s = b2a_s(acq_satellite_list=tuple(range(1, 11)))
        amp = amplitude_for_cn0(s, 44.0, NOISE)
        sats = [SatParams(prn=p, doppler_hz=fd, code_phase_chips=cp,
                          amplitude=amp)
                for p, fd, cp in ((2, 1500.0, 100.0), (5, -2300.0, 5000.0),
                                  (8, 400.0, 9000.0))]
        sig = synthesize_if(s, sats, n_ms=40.0, noise_std=NOISE, seed=21)
        res = acquire(sig, s)
        got = {int(p) for p, d in zip(res.prns, res.detected) if d}
        assert got == {2, 5, 8}, (got, res.peak_metric.round(2).tolist())
        absent = [m for p, m in zip(res.prns, res.peak_metric)
                  if int(p) not in (2, 5, 8)]
        # published threshold 1.5; absent PRNs must sit clearly below
        assert max(absent) < 1.5, absent

    def test_b2a_40db_is_below_the_1ms_search_floor(self):
        """Documents the reference algorithm's sensitivity limit: at
        40 dB-Hz the 1 ms PCPS peak-ratio stays under the 1.5 threshold
        (missed detection, NOT a false alarm)."""
        s = b2a_s(acq_satellite_list=(2,))
        amp = amplitude_for_cn0(s, 40.0, NOISE)
        sig = synthesize_if(
            s, [SatParams(prn=2, doppler_hz=1500.0, code_phase_chips=100.0,
                          amplitude=amp)],
            n_ms=40.0, noise_std=NOISE, seed=21)
        res = acquire(sig, s)
        assert not res.detected.any(), res.peak_metric.tolist()

    def test_b1c_glrt_threshold_38db(self):
        s = b1c_settings(
            sampling_freq=12e6, intermediate_freq=3e6, acq_coh_ms=10,
            acq_step=50.0, acq_search_band=2000.0,
            acq_satellite_list=tuple(range(1, 9)),
        )
        amp = amplitude_for_cn0(s, 38.0, NOISE)
        sats = [SatParams(prn=p, doppler_hz=fd, code_phase_chips=cp,
                          amplitude=amp)
                for p, fd, cp in ((3, 800.0, 777.0), (6, -450.0, 4321.0))]
        sig = synthesize_if(s, sats, n_ms=40.0, noise_std=NOISE, seed=4)
        res = acquire(sig, s)
        got = {int(p) for p, d in zip(res.prns, res.detected) if d}
        assert got == {3, 6}, (got, res.peak_metric.round(2).tolist())
        absent = [m for p, m in zip(res.prns, res.peak_metric)
                  if int(p) not in (3, 6)]
        assert max(absent) < 7.5, absent


class TestCn0EstimatorAndLock:
    @pytest.fixture(scope="class")
    def tracked_38db(self):
        s = b2a_s(dll_bw=1.0)
        amp = amplitude_for_cn0(s, 38.0, NOISE)
        sat = SatParams(prn=7, doppler_hz=900.0, code_phase_chips=2000.0,
                        amplitude=amp)
        sig = synthesize_if(s, [sat], n_ms=620.0, noise_std=NOISE, seed=9)
        init = truth_init(s, 7, 900.0, 2000.0)
        res = track(sig, s, [init], n_epochs=600, epochs_per_block=100)
        return s, res

    def test_cn0_estimate_accuracy(self, tracked_38db):
        s, res = tracked_38db
        h = channel_health(res)[0]
        # data-channel truth 38 dB-Hz; health reports total (data+pilot)
        # => ~41 dB-Hz.  VSM at this C/N0 should land within +-2 dB.
        assert h["cn0_db"] == pytest.approx(41.0, abs=2.0), h

    def test_lock_detector_trips_at_38db(self, tracked_38db):
        s, res = tracked_38db
        h = channel_health(res)[0]
        assert h["lock_ok"], h
        assert h["pll_lock"] > 0.5, h

    def test_lock_detector_rejects_absent_prn(self):
        """A channel pointed at a PRN that is not in the signal must be
        flagged unhealthy (the C/N0 health gate, observe/cn0.py:59),
        while the real channel at the same noise level stays healthy."""
        s = b2a_s()
        amp = amplitude_for_cn0(s, 45.0, NOISE)
        sat = SatParams(prn=7, doppler_hz=900.0, code_phase_chips=2000.0,
                        amplitude=amp)
        sig = synthesize_if(s, [sat], n_ms=240.0, noise_std=NOISE, seed=10)
        inits = [
            truth_init(s, 7, 900.0, 2000.0),
            ChannelInit(prn=23, acquired_freq=s.intermediate_freq,
                        code_phase=100, peak_metric=3.0),
        ]
        res = track(sig, s, inits, n_epochs=200, epochs_per_block=100)
        h = channel_health(res)
        assert h[0]["lock_ok"], h
        assert not h[1]["lock_ok"], h

"""Fused multi-epoch Pallas tracking kernel: equivalence to the XLA
bucket path and absolute closed-loop convergence.

The fused kernel intentionally computes the chip-boundary sample indices
with *better* f32 precision than the XLA bucket path (per-tile host-f64
rebasing of the k*frac ramp), so single-epoch correlators agree to
~1e-3 relative (a handful of one-sample bucket flips out of ~1e4), and
closed-loop trajectories stay in the same lock but wiggle at the
discriminator-noise level.  Equivalence is therefore asserted loosely
over a bounded horizon plus *exact* agreement of the integer epoch
geometry (blksize), and convergence is asserted absolutely against the
synthesized truth.
"""
import numpy as np
import pytest

from bds3_tpu.config import b2a_settings
from bds3_tpu.io import SatParams, synthesize_if
from bds3_tpu.track.driver import track
from bds3_tpu.track.state import ChannelInit, make_track_config


def _init_for(s, sat):
    code_rate = s.code_freq_basis * (1 + sat.doppler_hz / s.carr_freq_basis)
    chi0 = sat.code_phase_chips % s.code_length
    start = ((s.code_length - chi0) % s.code_length) / code_rate
    return ChannelInit(
        prn=sat.prn, acquired_freq=s.intermediate_freq + sat.doppler_hz,
        code_phase=int(round(start * s.sampling_freq)), peak_metric=2.0)


@pytest.fixture(params=["0", "1"])
def defer_lane(request, monkeypatch):
    """Force FUSED_DEFER_LANE and invalidate jit traces around the test.

    Covers BOTH the deferred-lane-prefix branch (auto-selected at CI
    scale) and the non-DEFER prefix/select branch (the production
    full-rate B1C path, otherwise only reachable via env).  The jit
    cache keys on static cfg only, so caches are cleared on entry (to
    retrace under the forced env) and on exit (so later tests don't
    reuse traces compiled under it)."""
    import jax

    monkeypatch.setenv("FUSED_DEFER_LANE", request.param)
    jax.clear_caches()
    yield request.param
    jax.clear_caches()


class TestFusedKernel:
    def test_matches_bucket(self, defer_lane):
        s = b2a_settings(sampling_freq=10e6, intermediate_freq=2.5e6)
        sats = [
            SatParams(prn=19, doppler_hz=777.0, code_phase_chips=123.0,
                      amplitude=0.9),
            SatParams(prn=20, doppler_hz=-1200.0, code_phase_chips=5000.0,
                      amplitude=0.7),
        ]
        sig = synthesize_if(s, sats, n_ms=60.0, noise_std=1.0, seed=6)
        inits = [_init_for(s, sat) for sat in sats]
        res = {c: track(sig, s, inits, n_epochs=30, epochs_per_block=30,
                        correlator=c) for c in ("bucket", "fused")}
        # integer epoch geometry must agree exactly
        np.testing.assert_array_equal(res["bucket"].outputs["blksize"],
                                      res["fused"].outputs["blksize"])
        np.testing.assert_array_equal(res["bucket"].absolute_sample,
                                      res["fused"].absolute_sample)
        for k in ("d_ip", "d_qp", "d_ie", "d_il", "p11_ip", "p11_qp"):
            a = res["bucket"].outputs[k]
            b = res["fused"].outputs[k]
            scale = np.abs(a).mean() + 1.0
            np.testing.assert_allclose(b / scale, a / scale, atol=5e-2,
                                       err_msg=k)
        np.testing.assert_allclose(res["fused"].carr_freq,
                                   res["bucket"].carr_freq, atol=0.25)

    def test_absolute_lock(self):
        s = b2a_settings(sampling_freq=8e6, intermediate_freq=2e6)
        sat = SatParams(prn=7, doppler_hz=-950.0, code_phase_chips=42.0,
                        amplitude=0.8)
        sig = synthesize_if(s, [sat], n_ms=160.0, noise_std=1.0, seed=3)
        res = track(sig, s, [_init_for(s, sat)], n_epochs=150,
                    epochs_per_block=50, correlator="fused")
        ip = res.outputs["d_ip"][0][-50:]
        qp = res.outputs["d_qp"][0][-50:]
        assert np.abs(ip).mean() > 4 * np.abs(qp).mean(), "not phase locked"
        # PLL noise jitter at Bn=20 Hz in this C/N0 is ~1 Hz RMS (the XLA
        # bucket path shows the identical wander, within 0.01 Hz)
        truth = s.intermediate_freq + sat.doppler_hz
        assert abs(res.carr_freq[0][-20:].mean() - truth) < 2.0
        # code lock: early/late balance converging (the DLL is Bn=2 Hz,
        # time constant ~80 ms, so it is still settling at 150 epochs)
        e = np.hypot(res.outputs["d_ie"][0], res.outputs["d_qe"][0])
        l = np.hypot(res.outputs["d_il"][0], res.outputs["d_ql"][0])
        eml = np.abs((e - l) / (e + l))
        assert eml[-30:].mean() < 0.15
        assert eml[-30:].mean() < eml[40:70].mean()

    def test_supported_gating(self):
        from bds3_tpu.track.pallas_fused import fused_supported

        s = b2a_settings(sampling_freq=10e6, intermediate_freq=2.5e6)
        cfg = make_track_config(s)
        assert fused_supported(cfg, 12)
        cfg_cplx = make_track_config(s, complex_input=True)
        assert fused_supported(cfg_cplx, 12)    # complex rides f32 planes
        from bds3_tpu.config import TrackMode, b1c_settings

        # B1C wideband QMBOC: the BOC(6,1) weight ring is channel-count
        # independent, so WB fits at 30 Msps and at the full dataset rate
        s_wb = b1c_settings(sampling_freq=30e6, intermediate_freq=7.5e6,
                            track_mode=TrackMode.WIDEBAND)
        cfg_wb = make_track_config(s_wb)
        assert fused_supported(cfg_wb, 12)
        s_wb_full = b1c_settings(track_mode=TrackMode.WIDEBAND)
        cfg_wb_full = make_track_config(s_wb_full)
        assert fused_supported(cfg_wb_full, 12, win_bytes=1)
        # B1C narrowband fits at every dataset rate for int8 captures —
        # the depth-2 window ring keeps window VMEM independent of C
        s_nb = b1c_settings(track_mode=TrackMode.NARROWBAND)
        cfg_nb = make_track_config(s_nb)          # 99.375 Msps, 10 ms epochs
        assert fused_supported(cfg_nb, 12, win_bytes=1)
        assert not fused_supported(cfg_nb, 12, win_bytes=4)

    def test_complex_iq_matches_bucket(self):
        """Complex IQ captures ride the window ring as two f32 planes;
        the mix must match scan.py's (I+jQ)*e^{-j theta} convention."""
        from bds3_tpu.config import FileType

        s = b2a_settings(sampling_freq=10e6, intermediate_freq=2.5e6,
                         file_type=FileType.IQ8)
        sats = [
            SatParams(prn=19, doppler_hz=400.0, code_phase_chips=500.0,
                      amplitude=0.8),
            SatParams(prn=20, doppler_hz=-1500.0, code_phase_chips=3000.0,
                      amplitude=0.7),
        ]
        raw = synthesize_if(s, sats, n_ms=60.0, noise_std=1.5, seed=12)
        sig = (raw[:, 0].astype(np.float32)
               + 1j * raw[:, 1].astype(np.float32)).astype(np.complex64)
        inits = [_init_for(s, sat) for sat in sats]
        res = {c: track(sig, s, inits, n_epochs=30, epochs_per_block=30,
                        correlator=c) for c in ("bucket", "fused")}
        np.testing.assert_array_equal(res["bucket"].outputs["blksize"],
                                      res["fused"].outputs["blksize"])
        for k in ("d_ip", "d_qp", "d_ie", "d_il", "p11_ip", "p11_qp",
                  "carr_err", "code_err"):
            a = res["bucket"].outputs[k]
            b = res["fused"].outputs[k]
            scale = np.abs(a).mean() + 1.0
            np.testing.assert_allclose(b / scale, a / scale, atol=5e-2,
                                       err_msg=k)

    def test_b1c_narrowband_matches_bucket(self):
        """B1C NB (BOC(1,1) data+pilot, 11/29 weighting, 10 ms epochs)
        through the fused kernel vs the XLA bucket path
        (NB_tracking.m:328-384 semantics)."""
        from bds3_tpu.config import TrackMode, b1c_settings

        s = b1c_settings(sampling_freq=6e6, intermediate_freq=1.5e6,
                         track_mode=TrackMode.NARROWBAND)
        sats = [
            SatParams(prn=7, doppler_hz=430.0, code_phase_chips=212.0,
                      amplitude=0.9),
            SatParams(prn=30, doppler_hz=-2100.0, code_phase_chips=8000.0,
                      amplitude=0.8),
        ]
        sig = synthesize_if(s, sats, n_ms=120.0, noise_std=1.0, seed=12)
        inits = [_init_for(s, sat) for sat in sats]
        res = {c: track(sig, s, inits, n_epochs=8, epochs_per_block=8,
                        correlator=c) for c in ("bucket", "fused")}
        np.testing.assert_array_equal(res["bucket"].outputs["blksize"],
                                      res["fused"].outputs["blksize"])
        np.testing.assert_array_equal(res["bucket"].absolute_sample,
                                      res["fused"].absolute_sample)
        for k in ("d_ip", "d_qp", "d_ie", "d_il", "p11_ip", "p11_qp",
                  "carr_err", "code_err"):
            a = res["bucket"].outputs[k]
            b = res["fused"].outputs[k]
            scale = np.abs(a).mean() + 1.0
            np.testing.assert_allclose(b / scale, a / scale, atol=5e-2,
                                       err_msg=k)

    def test_b1c_wideband_matches_bucket(self):
        """B1C wideband QMBOC (18 correlators incl. the BOC(6,1) pilot
        bank, composite-pilot discriminators, WB_tracking.m:348-419)
        through the fused kernel vs the XLA bucket path.  30 Msps keeps
        the BOC(6,1) subcarrier adequately sampled while interpret mode
        stays tractable."""
        from bds3_tpu.config import TrackMode, b1c_settings

        s = b1c_settings(sampling_freq=30e6, intermediate_freq=7.5e6,
                         track_mode=TrackMode.WIDEBAND)
        sats = [
            SatParams(prn=7, doppler_hz=430.0, code_phase_chips=212.0,
                      amplitude=0.9),
            SatParams(prn=30, doppler_hz=-2100.0, code_phase_chips=8000.0,
                      amplitude=0.8),
        ]
        sig = synthesize_if(s, sats, n_ms=60.0, noise_std=1.0, seed=12)
        inits = [_init_for(s, sat) for sat in sats]
        res = {c: track(sig, s, inits, n_epochs=4, epochs_per_block=4,
                        correlator=c) for c in ("bucket", "fused")}
        np.testing.assert_array_equal(res["bucket"].outputs["blksize"],
                                      res["fused"].outputs["blksize"])
        np.testing.assert_array_equal(res["bucket"].absolute_sample,
                                      res["fused"].absolute_sample)
        for k in ("d_ip", "d_qp", "d_ie", "d_il", "p11_ip", "p11_qp",
                  "p61_ip", "p61_qp", "p61_ie", "p61_il",
                  "p_ip", "p_qp", "carr_err", "code_err"):
            a = res["bucket"].outputs[k]
            b = res["fused"].outputs[k]
            scale = np.abs(a).mean() + 1.0
            np.testing.assert_allclose(b / scale, a / scale, atol=5e-2,
                                       err_msg=k)

    def test_half_grid_matches_bucket_full_rate(self):
        """The 2-ramp half-grid stage 2 only activates at full rate
        (spacing*m == 0.5 and enough code padding); check it against the
        XLA bucket path there.  Small epoch count: interpret mode at
        99.375 Msps is slow."""
        from bds3_tpu.track.pallas_fused import _geometry

        s = b2a_settings()          # reference dataset rate, 99.375 Msps
        cfg = make_track_config(s, complex_input=False, epochs_per_block=2)
        assert _geometry(cfg)["half_grid"]

        sat = SatParams(prn=19, doppler_hz=777.0, code_phase_chips=123.0,
                        amplitude=0.9)
        sig = synthesize_if(s, [sat], n_ms=4.0, noise_std=1.0, seed=6)
        res = {c: track(sig, s, [_init_for(s, sat)], n_epochs=2,
                        epochs_per_block=2, correlator=c)
               for c in ("bucket", "fused")}
        np.testing.assert_array_equal(res["bucket"].outputs["blksize"],
                                      res["fused"].outputs["blksize"])
        for k in ("d_ip", "d_qp", "d_ie", "d_il", "d_qe", "d_ql",
                  "p11_ip", "p11_qp", "p11_ie", "p11_il"):
            a = res["bucket"].outputs[k]
            b = res["fused"].outputs[k]
            scale = np.abs(a).mean() + 1.0
            np.testing.assert_allclose(b / scale, a / scale, atol=5e-2,
                                       err_msg=k)


def test_b1c_wideband_nb_blend_matches_bucket():
    """wb_code_blend='nb' (composite carrier + NB-style 11/29 code DLL)
    through the fused kernel vs the XLA bucket path."""
    from bds3_tpu.config import TrackMode, b1c_settings

    s = b1c_settings(sampling_freq=30e6, intermediate_freq=7.5e6,
                     track_mode=TrackMode.WIDEBAND, wb_code_blend="nb")
    sats = [SatParams(prn=7, doppler_hz=430.0, code_phase_chips=212.0,
                      amplitude=0.9)]
    sig = synthesize_if(s, sats, n_ms=60.0, noise_std=1.0, seed=12)
    inits = [_init_for(s, sat) for sat in sats]
    res = {c: track(sig, s, inits, n_epochs=4, epochs_per_block=4,
                    correlator=c) for c in ("bucket", "fused")}
    np.testing.assert_array_equal(res["bucket"].outputs["blksize"],
                                  res["fused"].outputs["blksize"])
    for k in ("d_ip", "p61_ip", "p_ip", "carr_err", "code_err"):
        a = res["bucket"].outputs[k]
        b = res["fused"].outputs[k]
        scale = np.abs(a).mean() + 1.0
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-2,
                                   err_msg=k)


def test_b1c_wideband_split_blend_matches_bucket():
    """wb_code_blend='split' (BOC(6,1) bank at its own narrow spacing,
    slope-normalized 0.3/0.7 blend) through the fused kernel vs the XLA
    bucket path — including the stage-2b ramps at spacing61."""
    from bds3_tpu.config import TrackMode, b1c_settings

    s = b1c_settings(sampling_freq=30e6, intermediate_freq=7.5e6,
                     track_mode=TrackMode.WIDEBAND, wb_code_blend="split")
    sats = [SatParams(prn=7, doppler_hz=430.0, code_phase_chips=212.0,
                      amplitude=0.9)]
    sig = synthesize_if(s, sats, n_ms=60.0, noise_std=1.0, seed=12)
    inits = [_init_for(s, sat) for sat in sats]
    res = {c: track(sig, s, inits, n_epochs=4, epochs_per_block=4,
                    correlator=c) for c in ("bucket", "fused")}
    np.testing.assert_array_equal(res["bucket"].outputs["blksize"],
                                  res["fused"].outputs["blksize"])
    for k in ("d_ip", "p61_ip", "p61_ie", "p61_il", "p_ip", "carr_err",
              "code_err"):
        a = res["bucket"].outputs[k]
        b = res["fused"].outputs[k]
        scale = np.abs(a).mean() + 1.0
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-2,
                                   err_msg=k)

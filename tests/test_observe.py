"""Smoke tests for C/N0 estimation and diagnostic plots."""
import numpy as np
import pytest

from bds3_tpu.observe.cn0 import pll_lock, vsm_cn0


class TestVSM:
    def test_cn0_scales_with_snr(self):
        rng = np.random.default_rng(0)
        n = 1000
        int_time = 1e-3
        # locked channel: I ~ A + noise, Q ~ noise
        for a, sigma in ((1000.0, 50.0), (1000.0, 200.0)):
            i_p = a + rng.normal(0, sigma, n)
            q_p = rng.normal(0, sigma, n)
            est = vsm_cn0(i_p, q_p, int_time)
            true = a**2 / (2 * sigma**2) / int_time
            assert est == pytest.approx(true, rel=0.25)

    def test_noiseless_window_is_healthy(self):
        # a perfectly clean (zero-variance) prompt window must read as a
        # large finite C/N0, not +inf/NaN — otherwise the health gate's
        # finite-median check flags a genuinely locked channel
        est = vsm_cn0(np.full(100, 1000.0), np.zeros(100), 1e-3)
        assert np.isfinite(est) and est > 1e8

    def test_lock_detector(self):
        rng = np.random.default_rng(1)
        i_p = 1000.0 * np.sign(rng.normal(size=500)) + rng.normal(0, 50, 500)
        q_p = rng.normal(0, 50, 500)
        assert pll_lock(i_p, q_p) > 0.95
        # constant 45-degree phase error: NBD/NBP -> 0
        bits = np.sign(rng.normal(size=500))
        i45 = 1000 * bits * np.cos(np.pi / 4)
        q45 = 1000 * np.sin(np.pi / 4) * np.ones(500)
        assert abs(pll_lock(i45, q45)) < 0.1


class TestPlots:
    def test_figures_build(self, tmp_path):
        from bds3_tpu.observe import plots

        class FakeAcq:
            prns = np.arange(1, 11)
            peak_metric = np.linspace(1, 10, 10)
            detected = peak_metric > 5

        fig = plots.plot_acquisition(FakeAcq(), 5.0)
        fig.savefig(tmp_path / "acq.png")

        from bds3_tpu.config import b2a_settings

        class FakeTrack:
            prns = np.array([19])
            acquired_freq = np.array([7.5e6])
            int_time = 1e-3
            E = 500
            settings = b2a_settings()
            outputs = {
                k: np.abs(np.random.default_rng(0).normal(1000, 100, (1, 500)))
                for k in ("d_ie", "d_qe", "d_ip", "d_qp", "d_il", "d_ql",
                          "p11_ip", "p11_qp", "code_err", "carr_err")
            }
            carr_freq = np.full((1, 500), 7.5e6 + 100.0)

        fig = plots.plot_tracking(FakeTrack(), 0)
        fig.savefig(tmp_path / "trk.png")
        assert (tmp_path / "trk.png").stat().st_size > 0


class TestB2aPilotSecondarySync:
    def test_recovers_phase_and_polarity(self):
        from bds3_tpu.config import b2a_settings
        from bds3_tpu.observe.secondary import b2a_pilot_secondary_sync
        from bds3_tpu.signals import b2a_pilot_secondary

        rng = np.random.default_rng(7)
        prn, phi, pol, E = 23, 37, -1, 700
        overlay = -b2a_pilot_secondary(prn).astype(np.float64)
        e = np.arange(E)
        q = pol * 800.0 * overlay[(e + phi) % 100] + rng.normal(0, 200, E)

        class FakeTrack:
            prns = np.array([prn])
            settings = b2a_settings()
            outputs = {"p11_qp": q[None, :]}

        got = b2a_pilot_secondary_sync(FakeTrack(), 0)
        assert got["shift"] == phi
        assert got["polarity"] == pol
        assert got["metric"] > 2.0
        assert got["aligned_fraction"] > 0.95

    def test_weil_structure(self):
        # balancedness / construction sanity of the Weil-1021 generator
        from bds3_tpu.signals import b2a_pilot_secondary

        for prn in (1, 30, 63):
            sec = b2a_pilot_secondary(prn)
            assert sec.shape == (100,)
            assert set(np.unique(sec)) <= {-1, 1}
        # distinct PRNs get distinct codes under the parameter table
        assert not np.array_equal(b2a_pilot_secondary(1),
                                  b2a_pilot_secondary(2))


class TestProbePanels:
    """probeData.m:86-170 parity: time-domain + Welch PSD + histogram."""

    def test_probe_stats_panels_and_welch_peak(self, tmp_path):
        import numpy as np

        from bds3_tpu.config import FileType
        from bds3_tpu.io.ifdata import IFDataFile, probe_stats, welch_psd

        fs, f0 = 4e6, 1.25e6
        t = np.arange(300_000) / fs
        rng = np.random.default_rng(0)
        x = np.clip(np.round(20 * np.cos(2 * np.pi * f0 * t)
                             + rng.normal(0, 2, len(t))), -128, 127)
        p = tmp_path / "tone.bin"
        x.astype(np.int8).tofile(p)
        st = probe_stats(IFDataFile.open(str(p), FileType.REAL8))
        assert len(st["time_snippet"]) == 2000
        assert not st["complex"]
        w = st["welch"]
        # PSD peak at the tone frequency (within one Welch bin)
        peak_cyc = w["freq_cycles"][np.argmax(w["psd"][1:]) + 1]
        assert abs(peak_cyc * fs - f0) < fs / 4096, peak_cyc * fs

    def test_welch_psd_complex_two_sided(self):
        import numpy as np

        from bds3_tpu.io.ifdata import welch_psd

        n = 100_000
        t = np.arange(n)
        x = np.exp(2j * np.pi * (-0.11) * t)  # negative-frequency tone
        w = welch_psd(x, nseg=8192, overlap=1024)
        peak = w["freq_cycles"][np.argmax(w["psd"])]
        assert abs(peak - (-0.11)) < 1e-3, peak
        assert len(w["psd"]) == 8192

    def test_plot_probe_renders(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        import numpy as np

        from bds3_tpu.config import FileType
        from bds3_tpu.io.ifdata import IFDataFile, probe_stats
        from bds3_tpu.observe.plots import plot_probe

        rng = np.random.default_rng(1)
        p = tmp_path / "n.bin"
        rng.integers(-20, 20, 200_000).astype(np.int8).tofile(p)
        st = probe_stats(IFDataFile.open(str(p), FileType.REAL8))
        fig = plot_probe(st, 4e6)
        assert len(fig.axes) == 4

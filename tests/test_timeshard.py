"""Time-sharded non-coherent acquisition: weak-signal detection across an
8-device mesh with ppermute halo exchange."""
import numpy as np
import pytest

from bds3_tpu.config import b2a_settings
from bds3_tpu.io import SatParams, synthesize_if
from bds3_tpu.parallel.mesh import make_mesh
from bds3_tpu.parallel.timeshard import noncoherent_acquire_timesharded


class TestTimeShardedAcquisition:
    def test_weak_signal_detection(self):
        s = b2a_settings(sampling_freq=10e6, intermediate_freq=2.5e6,
                         acq_search_band=2000.0)
        # amplitude low enough that a 1 ms coherent search is marginal
        sat = SatParams(prn=19, doppler_hz=1250.0, code_phase_chips=2500.0,
                        amplitude=0.22)
        n_dev, rounds = 8, 4
        spc = s.samples_per_code
        need_ms = (n_dev * rounds * spc + 2 * spc) / s.samples_per_ms
        sig = synthesize_if(s, [sat], n_ms=need_ms + 1, noise_std=2.0, seed=2)

        mesh = make_mesh(n_dev, ("channel",))
        cube, freq, phase = noncoherent_acquire_timesharded(
            mesh, sig, s, [19, 7], rounds_per_device=rounds,
        )
        # planted PRN: peak at the right Doppler bin and code phase
        true_f = s.intermediate_freq + sat.doppler_hz
        assert abs(freq[0] - true_f) <= s.acq_step / 2 + 1.0

        code_rate = s.code_freq_basis * (1 + sat.doppler_hz / s.carr_freq_basis)
        chi0 = sat.code_phase_chips % s.code_length
        expect = ((s.code_length - chi0) % s.code_length) / code_rate \
            * s.sampling_freq
        err = (phase[0] - expect) % spc
        err = min(err, spc - err)
        assert err <= 2.0

        # absent PRN's peak-to-mean must be far below the planted PRN's
        def pk_ratio(c):
            return c.max() / c.mean()

        assert pk_ratio(cube[0]) > 2.0 * pk_ratio(cube[1])

    def test_matches_unsharded_sum(self):
        """8-device psum cube == direct single-device accumulation."""
        import jax.numpy as jnp

        from bds3_tpu.acquire.pcps import (
            _code_spectra, acq_code_tables, make_acq_config,
        )
        from bds3_tpu.utils.phase import carrier_table, phase_tables

        s = b2a_settings(sampling_freq=5e6, intermediate_freq=1.25e6,
                         acq_search_band=1200.0, acq_step=400.0)
        sat = SatParams(prn=3, doppler_hz=-400.0, code_phase_chips=100.0,
                        amplitude=0.5)
        cfg = make_acq_config(s)
        n_dev, rounds = 8, 4  # rounds*spc must cover the n_fft-spc halo
        spc = cfg.samples_per_code
        total = n_dev * rounds * spc
        sig = synthesize_if(s, [sat], n_ms=(total + cfg.n_fft) / s.samples_per_ms + 1,
                            noise_std=1.0, seed=4)

        mesh = make_mesh(n_dev, ("channel",))
        cube, _, _ = noncoherent_acquire_timesharded(
            mesh, sig, s, [3], rounds_per_device=rounds)

        # direct accumulation over the same valid rounds
        d8, p8 = acq_code_tables(s, np.array([3]))
        freqs = cfg.freq_base + cfg.freq_step * np.arange(s.num_doppler_bins)
        a_b, c1_b = phase_tables(freqs, cfg.fs)
        carr = carrier_table(jnp.asarray(a_b), jnp.asarray(c1_b), cfg.n_fft)
        sd = _code_spectra(jnp.asarray(d8), cfg.n_fft, cfg.n_coh)
        sp = _code_spectra(jnp.asarray(p8), cfg.n_fft, cfg.n_coh)
        import math

        halo = cfg.n_fft - spc
        n_mask = math.ceil(halo / spc)
        acc = np.zeros((s.num_doppler_bins, cfg.n_search), np.float32)
        for g in range(n_dev * rounds):
            d, r = divmod(g, rounds)
            if d == n_dev - 1 and r >= rounds - n_mask:
                continue
            win = jnp.asarray(sig[g * spc : g * spc + cfg.n_fft], jnp.float32)
            mixed = jnp.fft.fft(carr * win[None, :], axis=-1)
            acc += np.abs(np.asarray(
                jnp.fft.ifft(mixed * sd[0][None, :], axis=-1)
            ))[:, : cfg.n_search]
            acc += np.abs(np.asarray(
                jnp.fft.ifft(mixed * sp[0][None, :], axis=-1)
            ))[:, : cfg.n_search]
        np.testing.assert_allclose(cube[0], acc, rtol=3e-4, atol=0.5)

"""Distributed-equivalence tests on the virtual 8-device CPU mesh:
N-device sharded results must equal single-device results
(SURVEY.md section 4 distributed strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bds3_tpu.acquire.pcps import (
    acq_code_tables, coarse_search, make_acq_config,
)
from bds3_tpu.config import b2a_settings
from bds3_tpu.io import SatParams, synthesize_if
from bds3_tpu.parallel.mesh import make_mesh
from bds3_tpu.parallel.sharded import (
    doppler_sharded_coarse_search,
    sharded_track_block,
)
from bds3_tpu.track.driver import channel_code_tables
from bds3_tpu.track.scan import track_block
from bds3_tpu.track.state import (
    ChannelInit, channel_consts, code_coarse_tables, initial_state,
    make_track_config,
)
from bds3_tpu.utils.phase import phase_tables


def settings():
    return b2a_settings(sampling_freq=10e6, intermediate_freq=2.5e6,
                        acq_satellite_list=tuple(range(1, 17)))


@pytest.fixture(scope="module")
def sig():
    s = settings()
    sat = SatParams(prn=5, doppler_hz=900.0, code_phase_chips=1000.0,
                    amplitude=1.0)
    return synthesize_if(s, [sat], n_ms=40.0, noise_std=1.5, seed=9)


class TestChannelShardedTracking:
    def test_matches_single_device(self, sig):
        s = settings()
        cfg = make_track_config(s, epochs_per_block=5)
        inits = [ChannelInit(prn=1 + i, acquired_freq=2.5e6 + 10.0 * i,
                             code_phase=11 * i, peak_metric=2.0)
                 for i in range(8)]
        consts = channel_consts(cfg, inits, s)
        data_t, p11_t, p61_t = channel_code_tables(cfg, inits)
        cki, ckf = code_coarse_tables(cfg, cfg.m_data)
        cursors = np.array([c.code_phase for c in inits])
        state = initial_state(cfg, inits, consts, cursors)
        n_block = int(cursors.max()) + 5 * (cfg.q0_int + 3) + cfg.n_max
        block = sig[:n_block]

        args = (jnp.asarray(block), jnp.asarray(data_t), jnp.asarray(p11_t),
                jnp.asarray(p61_t), jnp.asarray(cki), jnp.asarray(ckf),
                jnp.asarray(cki), jnp.asarray(ckf), consts, state)
        st1, out1 = track_block(cfg, *args)
        mesh = make_mesh(8, ("channel",))
        st8, out8 = sharded_track_block(mesh, cfg, *args)
        for k in out1:
            np.testing.assert_allclose(
                np.asarray(out1[k]), np.asarray(out8[k]), rtol=2e-5,
                atol=1e-3, err_msg=k,
            )
        np.testing.assert_allclose(np.asarray(st1.rem_code_phase),
                                   np.asarray(st8.rem_code_phase), atol=1e-5)


class TestDopplerShardedAcquisition:
    def test_matches_single_device(self, sig):
        s = settings()
        cfg = make_acq_config(s)
        prns = np.asarray(s.acq_satellite_list)
        d8, p8 = acq_code_tables(s, prns)

        # single-device reference
        n_bc = -(-cfg.n_bins // cfg.bin_chunk)
        bins = np.arange(n_bc * cfg.bin_chunk)
        freqs = cfg.freq_base + cfg.freq_step * bins
        a_b, c1_b = phase_tables(freqs, cfg.fs)
        v1, b1, p1 = coarse_search(jnp.asarray(sig), jnp.asarray(d8),
                                   jnp.asarray(p8), jnp.asarray(a_b),
                                   jnp.asarray(c1_b), cfg)

        # sharded: pad bins to devices * bin_chunk
        n_dev = 8
        per_dev = -(-n_bc // n_dev) * cfg.bin_chunk
        bins_pad = np.arange(n_dev * per_dev)
        freqs_pad = cfg.freq_base + cfg.freq_step * bins_pad
        a_p, c1_p = phase_tables(freqs_pad, cfg.fs)
        mesh = make_mesh(n_dev, ("channel",))
        # valid-bin masking inside each shard uses local n_bins; bins past
        # cfg.n_bins on late shards must be masked: local cfg masks only
        # per-shard tail, so give every padded bin a real frequency and
        # compare winners on the true grid only
        v8, b8, p8_ = doppler_sharded_coarse_search(
            mesh, jnp.asarray(sig), jnp.asarray(d8), jnp.asarray(p8),
            jnp.asarray(a_p), jnp.asarray(c1_p), cfg,
        )
        # the sharded search scans a slightly larger (padded) grid; the
        # detected satellite's winner must match exactly
        i5 = 4  # PRN 5
        assert int(b8[i5]) == int(b1[i5])
        assert int(p8_[i5]) == int(p1[i5])
        np.testing.assert_allclose(float(v8[i5]), float(v1[i5]), rtol=1e-5)

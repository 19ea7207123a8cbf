"""Pallas mix+prefix kernel vs a plain-numpy reference (interpret mode on
the CPU mesh)."""
import numpy as np
import pytest

from bds3_tpu.track.pallas_prefix import SPLIT, mix_prefix


class TestMixPrefix:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        C, T = 3, 4
        n = T * SPLIT
        win = rng.integers(-30, 30, (C, n)).astype(np.int8)
        base = rng.random((C, T)).astype(np.float32)
        slope = rng.random(C).astype(np.float32) * 0.2
        off = np.array([0, 37, 1000], dtype=np.int32)
        blk = np.array([n - 10, n - 2000, 9000], dtype=np.int32)

        pi, pq = mix_prefix(win, base, slope, off, blk, interpret=True)
        pi, pq = np.asarray(pi), np.asarray(pq)

        for c in range(C):
            i_all = np.arange(n)
            t_idx = i_all // SPLIT
            lin = i_all % SPLIT
            cyc = np.mod(base[c, t_idx].astype(np.float64)
                         + lin * float(slope[c]), 1.0)
            ang = 2 * np.pi * cyc
            mask = (i_all >= off[c]) & (i_all < off[c] + blk[c])
            x = win[c].astype(np.float64) * mask
            ib = x * np.cos(ang)
            qb = -x * np.sin(ang)
            ref_pi = np.concatenate([[0.0], np.cumsum(ib)])[:-1]
            ref_pq = np.concatenate([[0.0], np.cumsum(qb)])[:-1]
            # f32 kernel vs f64 reference: tolerance scales with prefix mag
            scale = np.abs(ref_pi).max() + 1.0
            np.testing.assert_allclose(pi[c] / scale, ref_pi / scale,
                                       atol=5e-4)
            np.testing.assert_allclose(pq[c] / scale, ref_pq / scale,
                                       atol=5e-4)

"""Long-horizon validation of the f32 blksize series approximation.

scan.py replaces the reference's exact f64
`blksize = ceil((L - rem)/step)` (`tracking.m:230-233`) with a
second-order series in e = d_step/step_base evaluated in f32
(`corr = 1 - e + e^2 ~= 1/(1+e)`, scan.py:125-131).  The truncation
error is O(e^3) ~ 1e-16 at worst-case Doppler, far below f32 rounding,
but the VERDICT asked for the worst case to be *pinned*: this test runs
the pure epoch-geometry recurrence (open loop, constant code Doppler)
for 100k epochs at +/-5 kHz carrier Doppler and asserts the f32
trajectory never accumulates sample drift against the exact f64
reference recurrence — per-epoch ceil flips at ties are self-correcting
(larger rem -> smaller next blksize), so any unbounded divergence means
a real bias.
"""
import numpy as np
import pytest

from bds3_tpu.config import b1c_settings, b2a_settings
from bds3_tpu.track.state import make_track_config

f32 = np.float32


def scan_recurrence(cfg, d_step_f32, n_epochs):
    """Replicates scan.py:125-131 + the rem_code update in f32."""
    rem = f32(0.0)
    d_step = f32(d_step_f32)
    step_base = f32(cfg.step_base)
    q0_frac = f32(cfg.q0_frac)
    q0_if = f32(cfg.q0_int + cfg.q0_frac)
    q0_step_minus_l = f32(cfg.q0_int * cfg.step_base - cfg.code_length)
    blks = np.empty(n_epochs, np.int64)
    for i in range(n_epochs):
        e_rel = f32(d_step / step_base)
        corr = f32(f32(1.0) - e_rel + f32(e_rel * e_rel))
        resid = f32(q0_frac - f32(f32(rem / step_base) + f32(q0_if * e_rel))
                    * corr)
        delta = int(np.ceil(resid))
        blks[i] = cfg.q0_int + delta
        rem = f32(rem + q0_step_minus_l + f32(delta) * step_base
                  + f32(blks[i]) * d_step)
    return blks


def exact_recurrence(cfg, d_step, n_epochs):
    """Reference semantics in float64 (tracking.m:230-233)."""
    L = float(cfg.code_length)
    step = cfg.step_base + d_step
    rem = 0.0
    blks = np.empty(n_epochs, np.int64)
    for i in range(n_epochs):
        blks[i] = int(np.ceil((L - rem) / step))
        rem = rem + blks[i] * step - L
    return blks


CASES = [
    ("b2a_fullrate_+5k", b2a_settings(), 5000.0, 1176.45e6),
    ("b2a_fullrate_-5k", b2a_settings(), -5000.0, 1176.45e6),
    ("b1c_6M_+5k",
     b1c_settings(sampling_freq=6e6, intermediate_freq=1.5e6), 5000.0,
     1575.42e6),
    ("b1c_6M_-5k",
     b1c_settings(sampling_freq=6e6, intermediate_freq=1.5e6), -5000.0,
     1575.42e6),
]


class TestBlksizeHorizon:
    @pytest.mark.parametrize("name,s,fd,fc", CASES,
                             ids=[c[0] for c in CASES])
    def test_no_cumulative_drift_100k_epochs(self, name, s, fd, fc):
        cfg = make_track_config(s)
        d_step = cfg.step_base * fd / fc     # worst-case code Doppler
        n = 100_000
        got = scan_recurrence(cfg, d_step, n)
        ref = exact_recurrence(cfg, d_step, n)
        # individual epochs may flip ceil ties by one sample...
        assert np.abs(got - ref).max() <= 1
        # ...but the running sample count must not drift
        cum = np.cumsum(got) - np.cumsum(ref)
        assert np.abs(cum).max() <= 1, (name, np.abs(cum).max())
        # and the mean rate must match the true code rate to < 1e-3 ppm
        rate_err = (got.mean() - ref.mean()) / ref.mean()
        assert abs(rate_err) < 1e-9, (name, rate_err)

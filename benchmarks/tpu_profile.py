"""Consolidated TPU cost breakdown for the tracking block."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bds3_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

W, C, NW = 250, 12, 99_680
BLOCK = 30_000_000


def force(x):
    return float(np.asarray(jnp.sum(x)))


def timeit(name, fn, *args, reps=3):
    t0 = time.time()
    force(fn(*args))
    t_first = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        force(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:40s} first {t_first:7.1f}s steady {dt*1e3:9.1f} ms "
          f"({dt/W*1e3:6.2f} ms/epoch)", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.integers(-30, 30, BLOCK).astype(np.int8))
    starts = jnp.asarray(
        (np.arange(W)[:, None] * 99375 + np.arange(C)[None, :] * 137)
        .astype(np.int32))

    @jax.jit
    def roundtrip(x):
        return x * 2.0

    timeit("round-trip floor (scalar)", roundtrip, jnp.float32(1.5))

    @jax.jit
    def pregather(block, starts):
        wins = jax.vmap(jax.vmap(
            lambda s0: jax.lax.dynamic_slice(block, (s0,), (NW,))
        ))(starts)
        return jnp.sum(wins.astype(jnp.float32), axis=(0, 2))

    timeit("pre-gather windows (W,C,NW)", pregather, block, starts)

    @jax.jit
    def scan_cumsum(block, starts):
        def step(acc, srow):
            win = jax.vmap(
                lambda s0: jax.lax.dynamic_slice(block, (s0,), (NW,))
            )(srow).astype(jnp.float32)
            p = jnp.cumsum(win, axis=-1)
            return acc + p[:, -1], None
        out, _ = jax.lax.scan(step, jnp.zeros(C), starts)
        return out

    timeit("scan: slice+cumsum only", scan_cumsum, block, starts)

    @jax.jit
    def scan_trig(block, starts):
        i = jnp.arange(NW, dtype=jnp.int32).astype(jnp.float32)

        def step(acc, srow):
            win = jax.vmap(
                lambda s0: jax.lax.dynamic_slice(block, (s0,), (NW,))
            )(srow).astype(jnp.float32)
            ang = jnp.mod(i[None, :] * 0.1463, 1.0) * 6.2832
            return acc + jnp.sum(win * jnp.cos(ang) - win * jnp.sin(ang),
                                 axis=-1), None
        out, _ = jax.lax.scan(step, jnp.zeros(C), starts)
        return out

    timeit("scan: slice+trig+reduce", scan_trig, block, starts)

    # two-level cumsum alternative
    @jax.jit
    def scan_cumsum2(block, starts):
        R = NW // 128

        def step(acc, srow):
            win = jax.vmap(
                lambda s0: jax.lax.dynamic_slice(block, (s0,), (NW,))
            )(srow).astype(jnp.float32)
            t = win[:, : R * 128].reshape(C, R, 128)
            within = jnp.cumsum(t, axis=-1)
            rows = jnp.cumsum(within[:, :, -1], axis=-1)
            p = within + jnp.pad(rows[:, :-1], ((0, 0), (1, 0)))[..., None]
            return acc + p[:, -1, -1], None
        out, _ = jax.lax.scan(step, jnp.zeros(C), starts)
        return out

    timeit("scan: slice+2-level cumsum", scan_cumsum2, block, starts)

    # full real kernel
    from bds3_tpu.config import b2a_settings
    from bds3_tpu.track.driver import channel_code_tables
    from bds3_tpu.track.scan import track_block
    from bds3_tpu.track.state import (
        ChannelInit, channel_consts, code_coarse_tables, initial_state,
        make_track_config,
    )

    s = b2a_settings()
    for corr in ("bucket", "gather"):
        cfg = make_track_config(s, epochs_per_block=W, correlator=corr)
        inits = [ChannelInit(prn=1 + i, acquired_freq=s.intermediate_freq + 50.0 * i,
                             code_phase=137 * i, peak_metric=2.0)
                 for i in range(C)]
        consts = channel_consts(cfg, inits, s)
        data_t, p11_t, p61_t = channel_code_tables(cfg, inits)
        cki, ckf = code_coarse_tables(cfg, cfg.m_data)
        cursors = np.array([c.code_phase for c in inits])
        state = initial_state(cfg, inits, consts, cursors)
        args = (cfg, block, jnp.asarray(data_t), jnp.asarray(p11_t),
                jnp.asarray(p61_t), jnp.asarray(cki), jnp.asarray(ckf),
                jnp.asarray(cki), jnp.asarray(ckf), consts, state)

        def fullrun(*a):
            st, outs = track_block(*a)
            return outs["d_ip"]

        timeit(f"track_block[{corr}]", fullrun, *args)


if __name__ == "__main__":
    main()

"""Second-stage bisect: cost per bucket-correlator tap inside the real
scan structure (windows pre-gathered, cumsum, monotone matmul lookup)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bds3_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bds3_tpu.track.scan import _monotone_gather2

SPLIT = 4096
W, C = 250, 12
Q0 = 99_375
NW = Q0 + 4 + W + 32
L = 10_230
BLOCK = 30_000_000


def force(x):
    return float(np.asarray(jnp.sum(x)))


def timeit(name, fn, *args, reps=3):
    t0 = time.time()
    force(fn(*args))
    tf = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        force(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:36s} first {tf:6.1f}s steady {dt*1e3:8.1f} ms "
          f"({dt/W*1e3:6.2f} ms/epoch)", flush=True)


def make_fn(n_taps, use_matmul_lookup=True, do_cumsum=True, do_trig=True):
    i32 = jnp.arange(NW, dtype=jnp.int32)
    k_idx = i32 // SPLIT
    r_f = (i32 % SPLIT).astype(jnp.float32)
    inv0 = 1.0 / 0.10294
    inv0_int = int(inv0)
    inv0_frac = inv0 - inv0_int
    k_i = jnp.arange(-16, L + 17, dtype=jnp.int32)
    k_f = k_i.astype(jnp.float32)

    @jax.jit
    def run(block, starts, tables, carr_t, a_base):
        windows = jax.vmap(jax.vmap(
            lambda s0: jax.lax.dynamic_slice(block, (s0,), (NW,))
        ))(starts)

        def step(carry, xs):
            win_row, start_row = xs

            def one(ch_win, tab, ct, ab, s0):
                win = ch_win.astype(jnp.float32)
                if do_trig:
                    cyc = jnp.mod(ct[k_idx] + r_f * ab, 1.0)
                    ang = 6.2831853 * cyc
                    ibb = win * jnp.cos(ang)
                    qbb = -win * jnp.sin(ang)
                else:
                    ibb, qbb = win, -win
                acc = jnp.float32(0)
                if n_taps and do_cumsum:
                    z = jnp.zeros(1, jnp.float32)
                    p_iq = jnp.stack([
                        jnp.concatenate([z, jnp.cumsum(ibb)]),
                        jnp.concatenate([z, jnp.cumsum(qbb)]),
                    ], axis=-1)
                for t in range(n_taps):
                    frac = k_f * inv0_frac - (0.1 * t) * inv0
                    j_k = k_i * inv0_int + jnp.floor(frac).astype(jnp.int32) + 1
                    iw = jnp.clip(j_k + 16, 0, NW)
                    if use_matmul_lookup:
                        g = _monotone_gather2(p_iq, iw, inv0_int)
                    else:
                        g = p_iq[iw]
                    b = g[1:] - g[:-1]
                    corr = jnp.dot(tab.astype(jnp.float32), b,
                                   preferred_element_type=jnp.float32)
                    acc = acc + corr[0] + corr[1]
                if not n_taps:
                    acc = jnp.sum(ibb) + jnp.sum(qbb)
                return acc

            out = jax.vmap(one)(win_row, tables, carr_t, a_base, start_row)
            return carry + out, None

        tot, _ = jax.lax.scan(step, jnp.zeros(C), (windows, starts))
        return tot

    return run


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.integers(-30, 30, BLOCK).astype(np.int8))
    starts = jnp.asarray(
        (np.arange(W)[:, None] * Q0 + np.arange(C)[None, :] * 137).astype(np.int32))
    tables = jnp.asarray((rng.integers(0, 2, (C, L + 32)) * 2 - 1).astype(np.int8))
    carr_t = jnp.asarray(rng.random((C, NW // SPLIT + 2)).astype(np.float32))
    a_base = jnp.asarray(rng.random(C).astype(np.float32))

    args = (block, starts, tables, carr_t, a_base)
    timeit("0 taps (infra+trig)", make_fn(0), *args)
    timeit("1 tap matmul-lookup", make_fn(1), *args)
    timeit("6 taps matmul-lookup", make_fn(6), *args)
    timeit("6 taps gather-lookup", make_fn(6, use_matmul_lookup=False), *args)


if __name__ == "__main__":
    main()

"""Third-stage bisect: add the real kernel's remaining features to the
fast skeleton one at a time (dynamic offset indexing, mask, outputs)."""
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
N_TAPS = 6


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
    print(f"{name:38s} first {tf:6.1f}s steady {dt*1e3:8.1f} ms "
          f"({dt/W*1e3:6.2f} ms/epoch)", flush=True)


def make_fn(dyn_off=False, mask_on=False, big_outs=False, loopf=False):
    i32s = jnp.arange(NW, dtype=jnp.int32)
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
            cursors, acc, f1, f2 = carry

            def one(cur, s0, ch_win, tab, ct, ab, f1c, f2c):
                win = ch_win.astype(jnp.float32)
                if dyn_off:
                    off = cur - s0
                    j32 = i32s - off
                    jp = jnp.maximum(j32, 0)
                    k_idx = jp // SPLIT
                    r_f = (jp % SPLIT).astype(jnp.float32)
                else:
                    off = 16
                    j32 = i32s
                    k_idx = i32s // SPLIT
                    r_f = (i32s % SPLIT).astype(jnp.float32)
                blksize = Q0 + (cur & 1)
                if mask_on:
                    m = ((j32 >= 0) & (j32 < blksize)).astype(jnp.float32)
                else:
                    m = 1.0
                cyc = jnp.mod(ct[k_idx] + r_f * ab, 1.0)
                ang = 6.2831853 * cyc
                ibb = win * jnp.cos(ang) * m
                qbb = -win * jnp.sin(ang) * m
                z = jnp.zeros(1, jnp.float32)
                p_iq = jnp.stack([
                    jnp.concatenate([z, jnp.cumsum(ibb)]),
                    jnp.concatenate([z, jnp.cumsum(qbb)]),
                ], axis=-1)
                outs = {}
                tot = jnp.float32(0)
                for t in range(N_TAPS):
                    frac = k_f * inv0_frac - (0.1 * t) * inv0
                    j_k = k_i * inv0_int + jnp.floor(frac).astype(jnp.int32) + 1
                    iw = jnp.clip(j_k + off, 0, NW)
                    g = _monotone_gather2(p_iq, iw, inv0_int)
                    b = g[1:] - g[:-1]
                    corr = jnp.dot(tab.astype(jnp.float32), b,
                                   preferred_element_type=jnp.float32)
                    outs[f"i{t}"] = corr[0]
                    outs[f"q{t}"] = corr[1]
                    tot = tot + corr[0] + corr[1]
                if loopf:
                    err = jnp.arctan(outs["q0"] / outs["i0"]) * 0.159
                    f1n = f1c + err * 0.01
                    f2n = f2c + f1n + err
                else:
                    f1n, f2n = f1c, f2c
                new_cur = cur + blksize
                if big_outs:
                    outs.update(blk=blksize.astype(jnp.float32),
                                e1=f1n, e2=f2n)
                    return new_cur, tot, f1n, f2n, outs
                return new_cur, tot, f1n, f2n, {"t": tot}

            cur2, tot, f1n, f2n, outs = jax.vmap(one)(
                cursors, start_row, win_row, tables, carr_t, a_base, f1, f2)
            return (cur2, acc + tot, f1n, f2n), outs

        init = (starts[0], jnp.zeros(C), jnp.zeros(C), jnp.zeros(C))
        (cur, acc, _, _), outs = jax.lax.scan(step, init, (windows, starts))
        return acc

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

    which = sys.argv[1] if len(sys.argv) > 1 else "dyn"
    if which == "dyn":
        timeit("baseline (static idx)", make_fn(), *args)
        timeit("+dynamic off/j", make_fn(dyn_off=True), *args)
        timeit("+mask", make_fn(dyn_off=True, mask_on=True), *args)
        timeit("+outputs+loopfilter", make_fn(True, True, True, True), *args)
    else:
        timeit("static idx baseline", make_fn(), *args)
        timeit("static +mask", make_fn(False, True), *args)
        timeit("static +mask+outs+filter", make_fn(False, True, True, True),
               *args)


if __name__ == "__main__":
    main()

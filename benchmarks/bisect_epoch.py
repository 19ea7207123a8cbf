"""Bisect the tracking-epoch cost on the current device by timing
simplified variants of the scan kernel."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SPLIT = 4096
N = 99_380          # epoch window
W = 25              # epochs per scan
C = 12
L = 10_230
BLOCK = 6_000_000


def run(name, fn, *args):
    out = fn(*args)
    float(np.asarray(out))  # force full round trip
    t0 = time.time()
    reps = 2
    for _ in range(reps):
        float(np.asarray(fn(*args)))
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.1f} ms  ({dt/W*1e3:6.2f} ms/epoch)")


def main():
    print("device:", jax.devices()[0], f" W={W} C={C} N={N}")
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.integers(-30, 30, BLOCK).astype(np.int8))
    tables = jnp.asarray((rng.integers(0, 2, (C, L)) * 2 - 1).astype(np.int8))
    carr_t = jnp.asarray(rng.random((C, N // SPLIT + 2)).astype(np.float32))
    a_base = jnp.asarray(rng.random(C).astype(np.float32))
    ck_int = jnp.asarray(rng.integers(0, L, N // SPLIT + 2).astype(np.int32))
    ck_frac = jnp.asarray(rng.random(N // SPLIT + 2).astype(np.float32))

    i32 = jnp.arange(N, dtype=jnp.int32)
    i_f = i32.astype(jnp.float32)
    k_idx = i32 // SPLIT
    r_f = (i32 % SPLIT).astype(jnp.float32)

    def scan_over(body):
        @jax.jit
        def run_fn(block, tables, carr_t, a_base):
            def step(carry, _):
                cursors, acc = carry
                out, used = body(cursors, block, tables, carr_t, a_base)
                return (cursors + 99375, acc + out), None

            init = (jnp.arange(C, dtype=jnp.int32) * 17,
                    jnp.zeros((C,), jnp.float32))
            (cur, acc), _ = jax.lax.scan(step, init, None, length=W)
            return jnp.sum(acc)
        return run_fn

    def win_of(cursors, block):
        return jax.vmap(
            lambda c: jax.lax.dynamic_slice(block, (c,), (N,))
        )(cursors).astype(jnp.float32)

    def v_full(cursors, block, tables, carr_t, a_base):
        win = win_of(cursors, block)
        cyc = jnp.mod(carr_t[:, k_idx] + r_f[None, :] * a_base[:, None], 1.0)
        ang = 2 * np.pi * cyc
        ibb = win * jnp.cos(ang)
        qbb = -win * jnp.sin(ang)
        tot = jnp.zeros((C,), jnp.float32)
        for off in (-0.5, 0.0, 0.5):
            frac = ck_frac[k_idx][None, :] + r_f[None, :] * 0.10293 + off
            idx = jnp.mod(ck_int[k_idx][None, :]
                          + jnp.ceil(frac).astype(jnp.int32) - 1, L)
            cv = jnp.take_along_axis(tables, idx, axis=-1).astype(jnp.float32)
            tot = tot + jnp.sum(cv * ibb, axis=-1) + jnp.sum(cv * qbb, axis=-1)
        return tot, None

    def v_nogather(cursors, block, tables, carr_t, a_base):
        win = win_of(cursors, block)
        cyc = jnp.mod(carr_t[:, k_idx] + r_f[None, :] * a_base[:, None], 1.0)
        ang = 2 * np.pi * cyc
        ibb = win * jnp.cos(ang)
        qbb = -win * jnp.sin(ang)
        tot = jnp.zeros((C,), jnp.float32)
        for off in (-0.5, 0.0, 0.5):
            frac = ck_frac[k_idx][None, :] + r_f[None, :] * 0.10293 + off
            cv = frac  # skip gather, use the would-be index value
            tot = tot + jnp.sum(cv * ibb, axis=-1) + jnp.sum(cv * qbb, axis=-1)
        return tot, None

    def v_notrig(cursors, block, tables, carr_t, a_base):
        win = win_of(cursors, block)
        ibb = win
        qbb = -win
        tot = jnp.zeros((C,), jnp.float32)
        for off in (-0.5, 0.0, 0.5):
            frac = ck_frac[k_idx][None, :] + r_f[None, :] * 0.10293 + off
            idx = jnp.mod(ck_int[k_idx][None, :]
                          + jnp.ceil(frac).astype(jnp.int32) - 1, L)
            cv = jnp.take_along_axis(tables, idx, axis=-1).astype(jnp.float32)
            tot = tot + jnp.sum(cv * ibb, axis=-1) + jnp.sum(cv * qbb, axis=-1)
        return tot, None

    def v_window_only(cursors, block, tables, carr_t, a_base):
        win = win_of(cursors, block)
        return jnp.sum(win, axis=-1), None

    def v_static_window(cursors, block, tables, carr_t, a_base):
        win = jnp.broadcast_to(block[:N].astype(jnp.float32), (C, N))
        cyc = jnp.mod(carr_t[:, k_idx] + r_f[None, :] * a_base[:, None], 1.0)
        ang = 2 * np.pi * cyc
        ibb = win * jnp.cos(ang)
        qbb = -win * jnp.sin(ang)
        tot = jnp.zeros((C,), jnp.float32)
        for off in (-0.5, 0.0, 0.5):
            frac = ck_frac[k_idx][None, :] + r_f[None, :] * 0.10293 + off
            idx = jnp.mod(ck_int[k_idx][None, :]
                          + jnp.ceil(frac).astype(jnp.int32) - 1, L)
            cv = jnp.take_along_axis(tables, idx, axis=-1).astype(jnp.float32)
            tot = tot + jnp.sum(cv * ibb, axis=-1) + jnp.sum(cv * qbb, axis=-1)
        return tot, None

    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    variants = {
        "full": ("full (dynslice+trig+3 gathers)", v_full),
        "nogather": ("no gathers", v_nogather),
        "notrig": ("no trig", v_notrig),
        "window": ("window only", v_window_only),
        "static": ("static window + trig + gathers", v_static_window),
    }
    for key, (name, fn) in variants.items():
        if which in ("all", key):
            run(name, scan_over(fn), block, tables, carr_t, a_base)


if __name__ == "__main__":
    main()

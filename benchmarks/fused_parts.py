"""Isolate fused-path base costs: window pre-gather vs pallas grid."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.fused_profile import setup, W
from bds3_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()


def slope_time(fn, sync, r1=3, r2=13):
    def chain(reps):
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = fn()
        sync(out)
        return time.time() - t0

    chain(1)
    t1, t2 = chain(r1), chain(r2)
    return (t2 - t1) / (r2 - r1)


def main():
    from bds3_tpu.track.scan import START_GUARD

    cfg, block, data_t, p11_t, consts, state = setup()
    pad = (-block.shape[0]) % 128
    block = jnp.pad(block, (0, pad))
    C = data_t.shape[0]
    cursor0 = jnp.asarray(state.cursor, jnp.int32)
    adv_int = jnp.asarray(consts.adv_int, jnp.int32)

    @jax.jit
    def gather(block):
        e_idx = jnp.arange(W, dtype=jnp.int32)
        s_nom = cursor0[None, :] + e_idx[:, None] * adv_int[None, :] \
            - START_GUARD
        s_al = jnp.maximum((s_nom >> 7) << 7, 0)
        win = jax.vmap(jax.vmap(
            lambda s0: jax.lax.dynamic_slice(block, (s0,), (cfg.n_win,))
        ))(s_al)
        return win.reshape(W, C, cfg.n_win // 128, 128)

    dt = slope_time(lambda: gather(block),
                    lambda w: np.asarray(w[-1, -1, -1, :4]))
    print(f"window pre-gather: {dt*1e3:8.2f} ms/block "
          f"({dt/W*1e3:7.4f} ms/epoch)")

    # gather as one reshaped copy (contiguity probe): W strided slices
    @jax.jit
    def gather_rows(block):
        e_idx = jnp.arange(W, dtype=jnp.int32)
        s_nom = cursor0[None, :] + e_idx[:, None] * adv_int[None, :] \
            - START_GUARD
        s_al = jnp.maximum((s_nom >> 7) << 7, 0) >> 7
        b2 = block.reshape(-1, 128)
        win = jax.vmap(jax.vmap(
            lambda r0: jax.lax.dynamic_slice(b2, (r0, 0),
                                             (cfg.n_win // 128, 128))
        ))(s_al)
        return win

    dt = slope_time(lambda: gather_rows(block),
                    lambda w: np.asarray(w[-1, -1, -1, :4]))
    print(f"row-sliced gather: {dt*1e3:8.2f} ms/block "
          f"({dt/W*1e3:7.4f} ms/epoch)")


if __name__ == "__main__":
    main()

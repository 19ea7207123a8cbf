"""Microbenchmark of tracking-epoch building blocks on the current device."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 99_377            # B2a epoch window
C = 12                # channels
L = 10_230


def timeit(name, fn, *args, reps=10):
    r = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        r = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:32s} {dt*1e3:8.2f} ms")
    return dt


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.integers(-30, 30, (C, N)).astype(np.float32))
    tables = jnp.asarray(rng.integers(0, 2, (C, L)).astype(np.int8) * 2 - 1)
    idx = jnp.asarray((rng.random((C, N)) * L).astype(np.int32))
    a = jnp.asarray(rng.random(C).astype(np.float32))

    @jax.jit
    def trig(block, a):
        i = jnp.arange(N, dtype=jnp.int32).astype(jnp.float32)
        cyc = jnp.mod(a[:, None] * 0.001 + i[None, :] * 0.1463, 1.0)
        ang = 2 * np.pi * cyc
        return jnp.sum(block * jnp.cos(ang) + block * jnp.sin(ang), axis=-1)

    @jax.jit
    def gather_mac(block, tables, idx):
        vals = jnp.take_along_axis(tables, idx, axis=-1).astype(jnp.float32)
        return jnp.sum(vals * block, axis=-1)

    @jax.jit
    def vmap_gather(block, tables, idx):
        def one(tab, ix, bb):
            return jnp.sum(tab[ix].astype(jnp.float32) * bb)
        return jax.vmap(one)(tables, idx, block)

    @jax.jit
    def cumsum_bucket(block, tables):
        # bucket correlator: cumsum + L boundary gathers + dot
        csum = jnp.cumsum(block, axis=-1)
        k = jnp.arange(L + 1, dtype=jnp.float32)
        bounds = jnp.clip((k[None, :] * 9.71875).astype(jnp.int32), 0, N - 1)
        cvals = jnp.take_along_axis(csum, jnp.broadcast_to(bounds, (C, L + 1)), axis=-1)
        buckets = cvals[:, 1:] - cvals[:, :-1]
        return jnp.sum(buckets * tables.astype(jnp.float32), axis=-1)

    @jax.jit
    def pure_mac(block):
        return jnp.sum(block * block, axis=-1)

    timeit("pure elementwise+reduce", pure_mac, block)
    timeit("trig (cos+sin over N)", trig, block, a)
    timeit("gather+MAC (1 tap, take_along)", gather_mac, block, tables, idx)
    timeit("gather+MAC (1 tap, vmap[])", vmap_gather, block, tables, idx)
    timeit("cumsum-bucket corr (1 tap)", cumsum_bucket, block, tables)


if __name__ == "__main__":
    main()

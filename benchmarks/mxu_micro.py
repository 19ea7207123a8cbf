"""Microbenchmark: MXU matmul throughput in a Pallas kernel at the fused
stage-2 shapes, fp32 vs split-bf16, and M-dim packing variants.

Informs the stage-2 one-hot redesign: the select matmul is
(S,128)@(128,NC) with S~32; question is (a) what fp32 costs vs bf16 on
this MXU, (b) whether M<128 wastes systolic rows, (c) whether stacking
I/Q (and two tiles) into M=128 pays.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bds3_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

ITERS = 2000


def make_bench(M, K, N, dtype, split=False):
    def kernel(a_ref, b_ref, o_ref):
        # accumulate the full result matrix and vary `a` by the loop
        # index (one cheap VPU add) so the dot cannot be hoisted
        def body(i, acc):
            a = a_ref[...] + i.astype(jnp.float32) * 1e-9
            b = b_ref[...]
            if split:
                hi = a.astype(jnp.bfloat16)
                lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                bb = b.astype(jnp.bfloat16)
                r = (jnp.dot(hi, bb, preferred_element_type=jnp.float32)
                     + jnp.dot(lo, bb, preferred_element_type=jnp.float32))
            else:
                r = jnp.dot(a.astype(dtype), b,
                            preferred_element_type=jnp.float32)
            return acc + r

        acc = jax.lax.fori_loop(0, ITERS, body,
                                jnp.zeros((M, N), jnp.float32))
        o_ref[0, 0] = jnp.sum(acc)

    a = jnp.ones((M, K), jnp.float32)
    b = jnp.ones((K, N), dtype)
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    return jax.jit(functools.partial(f)), a, b


def run(M, K, N, dtype, split=False):
    f, a, b = make_bench(M, K, N, dtype, split)
    r = f(a, b)
    r.block_until_ready()
    t0 = time.time()
    r = f(a, b)
    r.block_until_ready()
    dt = time.time() - t0
    flops = 2 * M * K * N * ITERS
    tag = f"{dtype.__name__}{'+split' if split else ''}"
    print(f"({M:4d},{K:4d})@({K:4d},{N:5d}) {tag:14s} "
          f"{dt*1e6/ITERS:8.3f} us/it  {flops/dt/1e12:6.2f} TFLOP/s")
    return dt / ITERS


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    for (M, K, N) in [(32, 128, 512), (64, 128, 512), (128, 128, 512),
                      (32, 128, 768), (128, 128, 1024),
                      (8, 128, 512), (16, 128, 512),
                      (128, 128, 128), (256, 256, 256)]:
        run(M, K, N, jnp.float32)
    for (M, K, N) in [(32, 128, 512), (128, 128, 512), (128, 128, 1024),
                      (256, 256, 256)]:
        run(M, K, N, jnp.bfloat16)
    for (M, K, N) in [(32, 128, 512), (128, 128, 1024)]:
        run(M, K, N, jnp.float32, split=True)

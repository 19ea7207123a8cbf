"""Time the fused Pallas tracking kernel on the current device, with
FUSED_BISECT stage attribution (full / nostage1 / nostage2)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bds3_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

W = int(os.environ.get("W", 250))
C = int(os.environ.get("C", 12))
FS = float(os.environ.get("FS", 99.375e6))


def setup():
    from bds3_tpu.config import TrackMode, b1c_settings, b2a_settings
    from bds3_tpu.track.driver import channel_code_tables
    from bds3_tpu.track.state import (
        ChannelInit, channel_consts, initial_state, make_track_config,
    )

    sigsel = os.environ.get("SIGNAL", "b2a")
    if sigsel == "b2a":
        s = b2a_settings(sampling_freq=FS, intermediate_freq=FS / 4)
    elif sigsel == "b1c_nb":
        s = b1c_settings(sampling_freq=FS, intermediate_freq=FS / 4,
                         track_mode=TrackMode.NARROWBAND)
    else:
        s = b1c_settings(sampling_freq=FS, intermediate_freq=FS / 4)
    cfg = make_track_config(s, complex_input=False, epochs_per_block=W)
    inits = [
        ChannelInit(prn=1 + (i % 32), acquired_freq=FS / 4 + 137.0 * i,
                    code_phase=977 * i, peak_metric=2.0)
        for i in range(C)
    ]
    consts = channel_consts(cfg, inits, s)
    data_t, p11_t, p61_t = channel_code_tables(cfg, inits)
    cursors = np.array([c.code_phase for c in inits])
    state = initial_state(cfg, inits, consts, cursors)
    n_block = int(cursors.max()) + W * (cfg.q0_int + 3) + cfg.n_max
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.integers(-30, 30, n_block).astype(np.int8))
    return cfg, block, data_t, p11_t, p61_t, consts, state


def main():
    from bds3_tpu.track.pallas_fused import fused_track_block

    print("device:", jax.devices()[0])
    cfg, block, data_t, p11_t, p61_t, consts, state = setup()
    print(f"W={W} C={C} n_win={cfg.n_win} q0={cfg.q0_int}")

    def run_chain(fn, reps, state):
        """Launch `reps` independent blocks (same initial state; the
        TensorCore executes enqueued programs serially) and sync once.

        NOTE: do NOT chain the carried state across reps with a fixed
        block — the cursor runs off the block end, stage 1's
        active-tile guard then skips every tile, and the 'kernel time'
        collapses to stage-2-only (this bug produced the bogus
        0.05 ms/epoch reading that round-2 chased for hours)."""
        t0 = time.time()
        outs = None
        for _ in range(reps):
            _st, outs = fn(block, data_t, p11_t, consts, state)
        np.asarray(outs["d_ip"][-4:, :])   # sync point
        return time.time() - t0

    for mode in sys.argv[1:] or ["full", "nostage1", "nostage2"]:
        os.environ["FUSED_BISECT"] = mode
        fn = jax.jit(functools.partial(fused_track_block, cfg,
                                       pilot61_tables=p61_t,
                                       interpret=False))
        t0 = time.time()
        run_chain(fn, 1, state)
        comp = time.time() - t0
        # two-point slope cancels the fixed download/relay latency
        r1, r2 = 3, 13
        t1 = run_chain(fn, r1, state)
        t2 = run_chain(fn, r2, state)
        dt = (t2 - t1) / (r2 - r1)
        print(f"{mode:10s} compile {comp:6.1f}s  block {dt*1e3:8.2f} ms "
              f"({dt/W*1e3:7.4f} ms/epoch, {W*cfg.int_time/dt:6.2f}x rt)")


if __name__ == "__main__":
    main()

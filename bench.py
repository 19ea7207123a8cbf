"""Benchmark: 12-channel B2a closed-loop tracking at the reference
dataset rate (99.375 Msps), real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference MATLAB receiver publishes
no numbers; its own UI shows multi-minute waitbars per channel for this
workload, i.e. aggregate 12-channel tracking runs at or well below 1x
real time on a host CPU.  vs_baseline therefore reports our real-time
factor against a 1.0x-real-time reference envelope.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from bds3_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_capture.npy")
SECONDS = 2.2
TRACK_EPOCHS = 2000  # 2 s of 1 ms epochs, ONE kernel launch per pass
CHANNELS = 12


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def get_capture(s):
    from bds3_tpu.io import SatParams, synthesize_if

    if os.path.exists(CACHE):
        sig = np.load(CACHE, mmap_mode="r")
        if sig.shape[0] == int(SECONDS * s.sampling_freq):
            return sig
    prns = [5, 12, 19, 30]
    sats = [
        SatParams(prn=p, doppler_hz=fd, code_phase_chips=cp, amplitude=0.65)
        for p, fd, cp in zip(prns, (1650.0, -2480.0, 700.0, -310.0),
                             (4100.0, 8123.0, 55.0, 9000.0))
    ]
    t0 = time.time()
    sig = synthesize_if(s, sats, n_ms=SECONDS * 1e3, noise_std=2.0, seed=11)
    log(f"[bench] synthesized {sig.nbytes/1e6:.0f} MB in {time.time()-t0:.0f}s")
    np.save(CACHE, sig)
    return sig


def main():
    from bds3_tpu.config import b2a_settings
    from bds3_tpu.track.driver import track
    from bds3_tpu.track.state import ChannelInit

    s = b2a_settings()
    sig = get_capture(s)

    # 12 channels over the 4 synthesized PRNs (channels are independent;
    # this reproduces the reference's 12-channel workload shape).
    base = [(5, 1650.0, 4100.0), (12, -2480.0, 8123.0),
            (19, 700.0, 55.0), (30, -310.0, 9000.0)]
    inits = []
    for i in range(CHANNELS):
        prn, fd, cp = base[i % 4]
        code_rate = s.code_freq_basis * (1 + fd / s.carr_freq_basis)
        chi0 = cp % s.code_length
        start = ((s.code_length - chi0) % s.code_length) / code_rate
        inits.append(ChannelInit(
            prn=prn, acquired_freq=s.intermediate_freq + fd,
            code_phase=int(round(start * s.sampling_freq)), peak_metric=2.0,
        ))

    import jax
    import jax.numpy as jnp

    # device-resident capture: a production receiver streams samples to
    # HBM once; per-block slices stay on device
    sig_dev = jnp.asarray(sig)

    log("[bench] warmup/compile run...")
    t0 = time.time()
    track(sig_dev, s, inits, n_epochs=TRACK_EPOCHS,
          epochs_per_block=TRACK_EPOCHS, download=False)
    log(f"[bench] warmup {time.time()-t0:.1f}s")

    # steady-state throughput: PASSES independent 12-channel runs chained
    # on-device (lazy outputs), one synchronizing download at the end.
    # One whole pass per kernel launch: the axon relay costs ~10-30 ms
    # per dispatched op, so per-block host orchestration must be rare.
    PASSES = 8
    t0 = time.time()
    res = None
    for i in range(PASSES):
        res = track(sig_dev, s, inits, n_epochs=TRACK_EPOCHS,
                    epochs_per_block=TRACK_EPOCHS, download=False)
    ip = np.asarray(res.outputs["d_ip"][:, -200:])   # sync point
    qp = np.asarray(res.outputs["d_qp"][:, -200:])
    wall = time.time() - t0
    tracked_s = PASSES * res.n_epochs * s.int_time
    rt = tracked_s / wall
    log(f"[bench] tracked {tracked_s:.2f}s x {CHANNELS}ch in {wall:.2f}s "
        f"-> {rt:.2f}x realtime "
        f"({rt * s.sampling_freq * CHANNELS/1e9:.2f} G corr-samples/s)")
    locked = (np.abs(ip).mean(axis=1) > 4 * np.abs(qp).mean(axis=1)).sum()
    log(f"[bench] locked channels: {locked}/{CHANNELS}")

    print(json.dumps({
        "metric": "b2a_12ch_tracking_realtime_factor",
        "value": round(rt, 3),
        "unit": "x_realtime_99.375Msps",
        "vs_baseline": round(rt / 1.0, 3),
    }))


if __name__ == "__main__":
    main()

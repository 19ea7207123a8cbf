"""Capture a jax.profiler trace of the hot paths (TensorBoard/Perfetto).

The aux-subsystem counterpart of the reference's tic/toc hooks
(`BDS-3_B1C/postProcessing.m:104-112`): wraps the fused tracking block
and the acquisition coarse search in a profiler trace so the per-op
device timeline can be inspected offline.

    python tools/profile_trace.py [outdir] [seconds]

Writes a trace under outdir (default /tmp/bds3_trace) — open with
TensorBoard's profile plugin or ui.perfetto.dev.  On the remote-relay
TPU the device timeline may be host-side only; the FUSED_BISECT modes
in benchmarks/fused_profile.py remain the ground truth for kernel-stage
attribution (docs/PERF.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bds3_trace"
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2

    import jax
    import jax.numpy as jnp

    from bds3_tpu.config import b2a_settings
    from bds3_tpu.io import SatParams, synthesize_if
    from bds3_tpu.track.driver import track

    s = b2a_settings()
    n_ms = seconds * 1e3
    sats = [SatParams(prn=p, doppler_hz=fd, code_phase_chips=cp,
                      amplitude=0.65)
            for p, fd, cp in [(5, 1650.0, 4100.0), (19, 700.0, 55.0)]]
    sig = synthesize_if(s, sats, n_ms=n_ms, noise_std=2.0, seed=1)
    sig_dev = jnp.asarray(sig)
    from bds3_tpu.track.state import ChannelInit

    inits = [ChannelInit(prn=5, acquired_freq=s.intermediate_freq + 1650.0,
                         code_phase=0, peak_metric=2.0)] * 12
    n_ep = int(n_ms) - 2

    # warm (compile outside the trace)
    res = track(sig_dev, s, inits, n_epochs=n_ep, epochs_per_block=n_ep,
                correlator="auto", download=False)
    np.asarray(res.outputs["d_ip"][:, -1:])

    with jax.profiler.trace(outdir):
        t0 = time.time()
        res = track(sig_dev, s, inits, n_epochs=n_ep,
                    epochs_per_block=n_ep, correlator="auto",
                    download=False)
        np.asarray(res.outputs["d_ip"][:, -1:])
        wall = time.time() - t0
    print(f"traced {n_ep} epochs x 12 ch in {wall*1e3:.1f} ms "
          f"(correlator={res.correlator}); trace -> {outdir}")


if __name__ == "__main__":
    main()

"""Sweep fused-kernel unroll factors: compile time vs steady-state perf.

Usage: python benchmarks/unroll_sweep.py "1,7" "1,14" ...
Each arg = FUSED_UNROLL_S1,FUSED_S2_GROUP.  Runs each config in a fresh
subprocess (env vars are baked into the traced kernel at build time).
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import jax, jax.numpy as jnp
from bds3_tpu.config import b2a_settings
from bds3_tpu.track.driver import track
from bds3_tpu.track.state import ChannelInit

s = b2a_settings()
W = 500
sig = np.load(%(cap)r, mmap_mode="r")
base = [(5, 1650.0, 4100.0), (12, -2480.0, 8123.0),
        (19, 700.0, 55.0), (30, -310.0, 9000.0)]
inits = []
for i in range(12):
    prn, fd, cp = base[i %% 4]
    code_rate = s.code_freq_basis * (1 + fd / s.carr_freq_basis)
    chi0 = cp %% s.code_length
    start = ((s.code_length - chi0) %% s.code_length) / code_rate
    inits.append(ChannelInit(prn=prn, acquired_freq=s.intermediate_freq + fd,
                             code_phase=int(round(start * s.sampling_freq)),
                             peak_metric=2.0))
sig_dev = jnp.asarray(sig[: int(1.0 * s.sampling_freq)])
t0 = time.time()
r = track(sig_dev, s, inits, n_epochs=W, epochs_per_block=W,
          correlator="fused", download=False)
np.asarray(r.outputs["d_ip"][:, -1:])
compile_s = time.time() - t0
t0 = time.time()
PASSES = 4
for _ in range(PASSES):
    r = track(sig_dev, s, inits, n_epochs=W, epochs_per_block=W,
              correlator="fused", download=False)
ip = np.asarray(r.outputs["d_ip"][:, -200:])
qp = np.asarray(r.outputs["d_qp"][:, -200:])
wall = time.time() - t0
ms_per_epoch = wall / (PASSES * W) * 1e3
locked = int((np.abs(ip).mean(axis=1) > 4 * np.abs(qp).mean(axis=1)).sum())
print("RESULT " + repr((os.environ.get("FUSED_UNROLL_S1"),
                        os.environ.get("FUSED_S2_GROUP"),
                        round(compile_s, 1), round(ms_per_epoch, 3), locked)))
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cap = os.path.join(repo, ".bench_capture.npy")
    if not os.path.exists(cap):
        sys.path.insert(0, repo)
        from bds3_tpu.config import b2a_settings
        from bds3_tpu.io import SatParams, synthesize_if
        import numpy as np
        s = b2a_settings()
        base = [(5, 1650.0, 4100.0), (12, -2480.0, 8123.0),
                (19, 700.0, 55.0), (30, -310.0, 9000.0)]
        sats = [SatParams(prn=p, doppler_hz=fd, code_phase_chips=cp,
                          amplitude=0.65)
                for p, fd, cp in base]
        sig = synthesize_if(s, sats, n_ms=2200, noise_std=2.0, seed=11)
        np.save(cap, sig)
        print(f"synthesized capture {sig.nbytes/1e6:.0f} MB", flush=True)

    script = CHILD % dict(repo=repo, cap=cap)
    for cfgstr in sys.argv[1:]:
        u1, u2 = cfgstr.split(",")
        env = dict(os.environ)
        env["FUSED_UNROLL_S1"] = u1
        env["FUSED_S2_GROUP"] = u2
        # fresh compile every time: disable persistent cache
        env["JAX_COMPILATION_CACHE_DIR"] = ""
        p = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=900)
        out = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")]
        print(out[0] if out else f"FAIL {cfgstr}: {p.stderr[-2000:]}",
              flush=True)


if __name__ == "__main__":
    main()

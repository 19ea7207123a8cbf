"""Multi-host launcher for bds3_tpu distributed runs.

The reference receiver is a single MATLAB process; this launcher is the
new framework's process-spawn story for `jax.distributed` runs
(SURVEY.md section 2.5, parallel/multihost.py).  Three backends:

  local   — spawn N co-located processes (CPU Gloo; CI / laptop): the
            same rendezvous code path a real pod uses, validated by
            tests/test_multihost.py.
  slurm   — emit (or submit with --submit) an sbatch script where each
            task initializes jax.distributed from SLURM_* variables.
  tpu-pod — emit the gcloud command that runs the program on every
            worker of a Cloud TPU pod slice; on TPU VMs
            jax.distributed.initialize() discovers coordinates from
            the metadata server, so the program needs no rank plumbing.

Every backend runs the SAME user program: the program calls
`bds3_tpu.parallel.multihost.initialize()` (argument-free on TPU pods;
env-driven under local/slurm) and then builds its global mesh.

Usage:
  python tools/launch_multihost.py local  --nproc 2 -- \
      python my_receiver.py --channels 24
  python tools/launch_multihost.py slurm --nodes 4 [--submit] -- \
      python my_receiver.py
  python tools/launch_multihost.py tpu-pod --tpu my-pod --zone us-... -- \
      python my_receiver.py
"""
from __future__ import annotations

import argparse
import os
import shlex
import socket
import subprocess
import sys
import time


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch_local(nproc: int, cmd: list[str], local_devices: int = 1,
                 env_extra: dict | None = None) -> int:
    """Spawn nproc local processes with jax.distributed env plumbing.

    Sets JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID,
    which `jax.distributed.initialize()` (and therefore
    `bds3_tpu.parallel.multihost.initialize()`) reads when called with
    no arguments.  Returns the first nonzero child exit code (0 if all
    succeeded)."""
    port = _free_port()
    procs = []
    for rank in range(nproc):
        env = dict(os.environ)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(nproc)
        env["JAX_PROCESS_ID"] = str(rank)
        # the local backend IS the CPU-Gloo dev mode: force cpu even
        # when a site config pins another platform (env_extra below can
        # still override for exotic setups).  PALLAS_AXON_POOL_IPS=""
        # stops the dev container's sitecustomize from registering its
        # remote-TPU plugin, which would re-pin the platform via jax
        # config (env alone cannot win against that).
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        # deterministic per-process device count: replace any inherited
        # host-platform flag rather than deferring to it
        flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{local_devices}").strip()
        env.update(env_extra or {})
        procs.append(subprocess.Popen(cmd, env=env))
    rc = 0
    for p in procs:
        r = p.wait()
        rc = rc or r
    return rc


SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH --job-name=bds3-tpu
#SBATCH --nodes={nodes}
#SBATCH --ntasks-per-node=1
#SBATCH --exclusive

# rank 0's node is the coordinator
COORD_HOST=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
export JAX_COORDINATOR_ADDRESS="$COORD_HOST:{port}"
export JAX_NUM_PROCESSES="$SLURM_NTASKS"

srun --export=ALL bash -c '
  export JAX_PROCESS_ID="$SLURM_PROCID"
  exec {cmd}
'
"""


def emit_slurm(nodes: int, cmd: list[str], port: int = 8476) -> str:
    return SBATCH_TEMPLATE.format(nodes=nodes, port=port,
                                  cmd=" ".join(shlex.quote(c) for c in cmd))


def emit_tpu_pod(tpu: str, zone: str, cmd: list[str]) -> list[str]:
    """gcloud invocation that runs cmd on all workers of a pod slice.

    On TPU VMs `jax.distributed.initialize()` needs no arguments — the
    runtime discovers coordinator/process counts from the pod metadata;
    the user program is unchanged between backends."""
    return [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", tpu,
        f"--zone={zone}", "--worker=all",
        "--command=" + " ".join(shlex.quote(c) for c in cmd),
    ]


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="backend", required=True)

    p_local = sub.add_parser("local")
    p_local.add_argument("--nproc", type=int, default=2)
    p_local.add_argument("--local-devices", type=int, default=1,
                         help="virtual CPU devices per process")
    p_local.add_argument("cmd", nargs=argparse.REMAINDER)

    p_slurm = sub.add_parser("slurm")
    p_slurm.add_argument("--nodes", type=int, required=True)
    p_slurm.add_argument("--port", type=int, default=8476)
    p_slurm.add_argument("--submit", action="store_true")
    p_slurm.add_argument("cmd", nargs=argparse.REMAINDER)

    p_pod = sub.add_parser("tpu-pod")
    p_pod.add_argument("--tpu", required=True)
    p_pod.add_argument("--zone", required=True)
    p_pod.add_argument("--dry-run", action="store_true")
    p_pod.add_argument("cmd", nargs=argparse.REMAINDER)

    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("missing program to launch (append: -- python ...)")

    if args.backend == "local":
        t0 = time.time()
        rc = launch_local(args.nproc, cmd, args.local_devices)
        print(f"[launch] {args.nproc} local processes finished "
              f"rc={rc} in {time.time()-t0:.1f}s", file=sys.stderr)
        return rc
    if args.backend == "slurm":
        script = emit_slurm(args.nodes, cmd, args.port)
        if args.submit:
            r = subprocess.run(["sbatch"], input=script.encode())
            return r.returncode
        print(script)
        return 0
    if args.backend == "tpu-pod":
        gcmd = emit_tpu_pod(args.tpu, args.zone, cmd)
        if args.dry_run:
            print(" ".join(shlex.quote(c) for c in gcmd))
            return 0
        return subprocess.run(gcmd).returncode
    return 2


if __name__ == "__main__":
    sys.exit(main())

"""Official benchmark harness (BASELINE.md configs) on the real TPU.

Prints ONE JSON line to stdout: the headline metric (12-channel B2a
closed-loop tracking real-time factor at the reference dataset rate,
99.375 Msps — BASELINE config 3) plus a `detail` dict carrying the other
measured configs and the execution evidence the round-1 verdict demanded:
backend, device kind, chosen correlator per stage, compile seconds, and
per-pass wall times.  If the fused Pallas kernel cannot be engaged the
run still completes on the fallback correlator but the artifact carries
`"degraded": true` and the reason.

Baseline context (BASELINE.md): the reference MATLAB receiver publishes
no numbers; its own UI shows multi-minute waitbars per channel for this
workload (well below 1x real time, single-threaded float64 CPU), so
vs_baseline reports our real-time factor against a 1.0x envelope.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from bds3_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

REPO = os.path.dirname(os.path.abspath(__file__))
SECONDS = 2.2
CHANNELS = 12
DETAIL = {"configs": {}, "degraded": False, "notes": []}

B2A_SATS = [(5, 1650.0, 4100.0), (12, -2480.0, 8123.0),
            (19, 700.0, 55.0), (30, -310.0, 9000.0)]
B1C_SATS = [(7, 1230.0, 512.0), (21, -2875.0, 7300.0),
            (30, 460.0, 3100.0), (44, -1040.0, 9755.0)]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def get_capture(s, sats, cache_name, n_ms):
    from bds3_tpu.io import SatParams, synthesize_if

    cache = os.path.join(REPO, cache_name)
    n = int(n_ms * 1e-3 * s.sampling_freq)
    if os.path.exists(cache):
        sig = np.load(cache, mmap_mode="r")
        if sig.shape[0] == n:
            return sig
    sat_params = [
        SatParams(prn=p, doppler_hz=fd, code_phase_chips=cp, amplitude=0.65)
        for p, fd, cp in sats
    ]
    t0 = time.time()
    sig = synthesize_if(s, sat_params, n_ms=n_ms, noise_std=2.0, seed=11)
    log(f"[bench] synthesized {cache_name}: {sig.nbytes/1e6:.0f} MB "
        f"in {time.time()-t0:.0f}s")
    np.save(cache, sig)
    return sig


def make_inits(s, sats, n_channels):
    from bds3_tpu.track.state import ChannelInit

    inits = []
    for i in range(n_channels):
        prn, fd, cp = sats[i % len(sats)]
        code_rate = s.code_freq_basis * (1 + fd / s.carr_freq_basis)
        chi0 = cp % s.code_length
        start = ((s.code_length - chi0) % s.code_length) / code_rate
        inits.append(ChannelInit(
            prn=prn, acquired_freq=s.intermediate_freq + fd,
            code_phase=int(round(start * s.sampling_freq)), peak_metric=2.0,
        ))
    return inits


def bench_tracking(name, s, sig_dev, inits, n_epochs, epochs_per_block,
                   passes, want="fused"):
    """Closed-loop tracking throughput; returns realtime factor."""
    import jax.numpy as jnp  # noqa: F401  (device residency via caller)

    from bds3_tpu.track.driver import track

    correlator = want
    t0 = time.time()
    try:
        res = track(sig_dev, s, inits, n_epochs=n_epochs,
                    epochs_per_block=epochs_per_block,
                    correlator=correlator, download=False)
        np.asarray(res.outputs["d_ip"][:, -1:])   # force compile+run
    except Exception as e:  # loud fallback, never silent
        log(f"[bench] !! correlator={want} failed for {name}: {e!r}")
        log(f"[bench] !! falling back to correlator=auto (DEGRADED)")
        DETAIL["degraded"] = True
        DETAIL["notes"].append(f"{name}: {want} failed: {type(e).__name__}")
        correlator = "auto"
        res = track(sig_dev, s, inits, n_epochs=n_epochs,
                    epochs_per_block=epochs_per_block,
                    correlator=correlator, download=False)
        np.asarray(res.outputs["d_ip"][:, -1:])
    compile_s = time.time() - t0
    ran = res.correlator
    log(f"[bench] {name}: correlator={ran} warmup+compile {compile_s:.1f}s")

    walls = []
    for _ in range(passes):
        t0 = time.time()
        res = track(sig_dev, s, inits, n_epochs=n_epochs,
                    epochs_per_block=epochs_per_block,
                    correlator=correlator, download=False)
        ip = np.asarray(res.outputs["d_ip"][:, -200:])  # sync each pass
        walls.append(time.time() - t0)
    qp = np.asarray(res.outputs["d_qp"][:, -200:])
    locked = int((np.abs(ip).mean(axis=1) > 4 * np.abs(qp).mean(axis=1)).sum())
    best = min(walls)
    tracked_s = res.n_epochs * s.int_time
    rt = tracked_s / best
    n_ch = len(inits)
    log(f"[bench] {name}: {tracked_s:.2f}s x {n_ch}ch in {best:.2f}s best "
        f"(walls {[round(w, 2) for w in walls]}) -> {rt:.2f}x realtime "
        f"({rt * s.sampling_freq * n_ch / 1e9:.2f} G corr-samples/s); "
        f"locked {locked}/{n_ch}")
    if want == "fused" and ran != "fused":
        DETAIL["degraded"] = True
        DETAIL["notes"].append(f"{name}: wanted fused, ran {ran}")
    DETAIL["configs"][name] = {
        "realtime_factor": round(rt, 3),
        "ms_per_epoch": round(best / res.n_epochs * 1e3, 4),
        "corr_gsamples_per_s": round(rt * s.sampling_freq * n_ch / 1e9, 2),
        "correlator": ran,
        "compile_s": round(compile_s, 1),
        "pass_walls_s": [round(w, 2) for w in walls],
        "channels": n_ch,
        "epochs": res.n_epochs,
        "locked": locked,
    }
    return rt


def bench_acquisition(s, sig, n_prns):
    """Cold-start PCPS acquisition wall time over n_prns satellites."""
    from bds3_tpu.acquire import acquire
    from bds3_tpu.receiver import acquisition_signal_length

    prns = tuple(range(1, n_prns + 1))
    win = np.asarray(sig[: acquisition_signal_length(s)])
    t0 = time.time()
    res = acquire(win, s, prns)
    compile_s = time.time() - t0
    t0 = time.time()
    res = acquire(win, s, prns)
    wall = time.time() - t0
    ndet = int(res.detected.sum())
    log(f"[bench] acquisition_b2a: {n_prns} PRNs in {wall:.2f}s warm "
        f"(compile+first {compile_s:.1f}s), detected {ndet}")
    DETAIL["configs"]["acquisition_b2a"] = {
        "prns": n_prns,
        "wall_s": round(wall, 2),
        "prn_per_s": round(n_prns / wall, 1),
        "compile_s": round(compile_s, 1),
        "detected": ndet,
    }


def bench_full_receiver(s, sig):
    """BASELINE config 4: cold-start acquisition (all 63 PRNs) ->
    channel assignment -> fused tracking -> decode attempt -> PVT gate,
    via the public run_receiver orchestration (postProcessing.m role).
    The 2.2 s capture is too short for a B-CNAV2 ephemeris set, so the
    metric is whole-pipeline throughput; fix accuracy (<1 m) is pinned
    by tests/test_e2e_pvt.py."""
    import dataclasses as _dc

    from bds3_tpu.receiver import run_receiver

    s_all = _dc.replace(s, acq_satellite_list=tuple(range(1, 64)))
    t0 = time.time()
    res = run_receiver(np.asarray(sig), s_all, n_epochs=2000,
                       epochs_per_block=2000, verbose=False)
    wall = time.time() - t0
    n_ch = len(res.channels)
    processed = res.track.n_epochs * s.int_time if res.track else 0.0
    rt = processed / wall
    corr = res.track.correlator if res.track else "none"
    log(f"[bench] full_receiver_b2a: acq(63 PRN)+track({n_ch}ch)+decode+pvt "
        f"in {wall:.1f}s cold ({processed:.1f}s tracked, {rt:.2f}x rt "
        f"incl. compile, correlator={corr})")
    DETAIL["configs"]["full_receiver_b2a"] = {
        "wall_s_cold": round(wall, 1),
        "tracked_s": round(processed, 2),
        "realtime_factor_cold": round(rt, 3),
        "channels": n_ch,
        "correlator": corr,
        "timings": {k: round(v, 2) for k, v in res.timings.items()
                    if isinstance(v, (int, float))},
    }


def main():
    import jax

    from bds3_tpu.config import b1c_settings, b2a_settings

    dev = jax.devices()[0]
    DETAIL["backend"] = jax.default_backend()
    DETAIL["device"] = str(dev)
    DETAIL["device_kind"] = getattr(dev, "device_kind", "?")
    DETAIL["platform"] = dev.platform
    log(f"[bench] device={dev} platform={dev.platform} "
        f"backend={jax.default_backend()}")
    if dev.platform != "tpu":
        DETAIL["degraded"] = True
        DETAIL["notes"].append(f"not a TPU: {dev.platform}")

    import jax.numpy as jnp

    # ---- config 3 (headline): 12-channel B2a tracking ------------------
    s2 = b2a_settings()
    sig2 = get_capture(s2, B2A_SATS, ".bench_capture.npy", SECONDS * 1e3)
    sig2_dev = jnp.asarray(sig2)
    inits2 = make_inits(s2, B2A_SATS, CHANNELS)
    rt = bench_tracking("tracking_b2a_12ch", s2, sig2_dev, inits2,
                        n_epochs=2000, epochs_per_block=2000, passes=6)

    # ---- config 1: B2a cold-start acquisition ---------------------------
    try:
        bench_acquisition(s2, sig2, n_prns=63)
    except Exception as e:
        log(f"[bench] acquisition bench failed: {e!r}")
        DETAIL["notes"].append(f"acquisition_b2a failed: {type(e).__name__}")

    # ---- config 5 (single-chip aggregate): 48-channel B2a ---------------
    # the north-star metric is aggregate correlated samples/s/chip; the
    # window-ring kernel's VMEM is channel-count independent, so one chip
    # tracks 4x the reference's channel load (multi-chip scaling of the
    # same program is validated on the virtual mesh by dryrun_multichip)
    try:
        inits48 = make_inits(s2, B2A_SATS, 48)
        bench_tracking("tracking_b2a_48ch", s2, sig2_dev, inits48,
                       n_epochs=2000, epochs_per_block=2000, passes=3)
    except Exception as e:
        log(f"[bench] 48ch bench failed: {e!r}")
        DETAIL["notes"].append(f"tracking_b2a_48ch failed: {type(e).__name__}")

    # ---- config 4: full receiver, cold start ----------------------------
    try:
        bench_full_receiver(s2, sig2)
    except Exception as e:
        log(f"[bench] full receiver bench failed: {e!r}")
        DETAIL["notes"].append(f"full_receiver_b2a failed: {type(e).__name__}")

    # ---- config 2: B1C tracking at the reference dataset rate ----------
    # the capture is synthesized with the full QMBOC pilot (wideband
    # settings = the true on-air signal); NB mode then tracks its
    # BOC(1,1) components exactly as NB_tracking.m does.
    try:
        from bds3_tpu.config import TrackMode

        # the published B1C dataset rate (README.md:99-104)
        s1 = b1c_settings(sampling_freq=99.375e6, intermediate_freq=14.58e6)
        sig1 = get_capture(s1, B1C_SATS, ".bench_capture_b1c.npy", 2200.0)
        sig1_dev = jnp.asarray(sig1)
        inits1 = make_inits(s1, B1C_SATS, CHANNELS)
        s1nb = b1c_settings(sampling_freq=99.375e6,
                            intermediate_freq=14.58e6,
                            track_mode=TrackMode.NARROWBAND)
        bench_tracking("tracking_b1c_12ch_nb", s1nb, sig1_dev, inits1,
                       n_epochs=200, epochs_per_block=200, passes=3)
        # wideband QMBOC (18 correlators incl. the BOC(6,1) bank) on the
        # fused kernel's m=12 second boundary family
        bench_tracking("tracking_b1c_12ch_wb", s1, sig1_dev, inits1,
                       n_epochs=100, epochs_per_block=100, passes=2)
        del sig1_dev
    except Exception as e:
        log(f"[bench] B1C tracking bench failed: {e!r}")
        DETAIL["notes"].append(f"tracking_b1c failed: {type(e).__name__}")

    # ---- headline JSON ---------------------------------------------------
    print(json.dumps({
        "metric": "b2a_12ch_tracking_realtime_factor",
        "value": round(rt, 3),
        "unit": "x_realtime_99.375Msps",
        "vs_baseline": round(rt / 1.0, 3),
        "detail": DETAIL,
    }))


if __name__ == "__main__":
    main()

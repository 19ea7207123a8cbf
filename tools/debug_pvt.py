"""Residual analysis for the e2e PVT scenario: compare each channel's
measured pseudorange against the geometric truth."""
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bds3_tpu.config import C_LIGHT, b2a_settings
from bds3_tpu.io.scenario import make_scenario, synthesize_scenario
from bds3_tpu.pvt.satpos import satpos_one
from bds3_tpu.receiver import run_receiver

RX = np.array([-1288398.0, -4721697.0, 4078625.0])
CACHE = "/tmp/pvt_debug.pkl"


def get():
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
    s = b2a_settings(
        sampling_freq=20e6, intermediate_freq=5e6, ms_to_process=11_500,
        use_tropo_corr=False, acq_satellite_list=tuple(range(1, 7)),
        num_channels=6,
    )
    sc = make_scenario(s, RX, n_sats=5, seed=3)
    sig_cache = "/tmp/pvt_debug_sig.npy"
    if os.path.exists(sig_cache):
        sig = np.load(sig_cache)
    else:
        sig = synthesize_scenario(sc, noise_std=2.0, amplitude=0.7, seed=1)
        np.save(sig_cache, sig)
    res = run_receiver(sig, s, epochs_per_block=250, verbose=True)
    data = {"s": s, "sc": sc, "res": res}
    with open(CACHE, "wb") as f:
        pickle.dump(data, f)
    return data


def main():
    d = get()
    s, sc, res = d["s"], d["sc"], d["res"]
    nav = res.nav
    trk = res.track
    print("PRNs:", trk.prns, "fixes:", np.isfinite(nav.x).sum())
    err = np.sqrt((nav.x - RX[0])**2 + (nav.y - RX[1])**2 + (nav.z - RX[2])**2)
    print("3D err:", np.round(err, 2))
    print("dt [m]:", np.round(nav.dt, 2))

    ephs = {e.prn: e for e in sc.ephemerides}
    # analyze epoch m=2
    for m in (1, 2, 3):
        print(f"--- measurement {m} sample {nav.meas_sample[m]}")
        t_rx_true = nav.meas_sample[m] / s.sampling_freq + sc.sow_base
        resids = []
        for ch in range(len(trk.prns)):
            prn = int(trk.prns[ch])
            raw_p = nav.raw_p[ch, m]
            if not np.isfinite(raw_p):
                continue
            eph = ephs[prn]
            # truth geometric range at true receive time (light-time iter)
            tau = 0.07
            for _ in range(3):
                pos, _ = satpos_one(t_rx_true - tau, _zero(eph), False)
                tau = np.linalg.norm(pos - RX) / C_LIGHT
            # receiver's modeled range: rawP + c*satclk - c*dt_rx
            a0, a1 = sc.sat_clock[ch] if False else (eph.a_0, eph.a_1)
            u = t_rx_true - tau
            dt_sv = a0 + a1 * (u - eph.t_oc)
            # measured transmit time check
            meas_tt = (nav.local_time[m] - raw_p / C_LIGHT) if np.isfinite(
                nav.local_time[m]) else np.nan
            true_tt_sv = u + dt_sv
            resid_t = (meas_tt - true_tt_sv)
            resids.append((prn, tau * C_LIGHT, resid_t * C_LIGHT))
        rr = np.array([r[2] for r in resids])
        for prn, rng, rt in resids:
            print(f"  PRN {prn}: range {rng/1e3:9.1f} km  tt-resid {rt:9.2f} m"
                  f"  (vs mean {rt - rr.mean():7.2f})")


def _zero(eph):
    import dataclasses
    e = dataclasses.replace(eph)
    e.a_0 = e.a_1 = e.a_2 = 0.0
    return e


if __name__ == "__main__":
    main()

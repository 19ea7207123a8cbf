"""One-shot full-chain B1C validation: scenario -> IF -> acquire ->
wideband track -> B-CNAV1 decode -> PVT vs truth.  Runs on CPU; slow
(B-CNAV1 frames are 18 s), so this lives in tools/ rather than tests/.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bds3_tpu.config import TrackMode, b1c_settings
from bds3_tpu.io.scenario import make_scenario, synthesize_scenario
from bds3_tpu.receiver import run_receiver

RX = np.array([-1288398.0, -4721697.0, 4078625.0])


def main():
    s = b1c_settings(
        sampling_freq=6e6,
        intermediate_freq=1.5e6,
        ms_to_process=40_000,
        use_tropo_corr=False,
        acq_satellite_list=tuple(range(1, 7)),
        num_channels=6,
        acq_coh_ms=3,
        acq_step=1000 / 3 / 2,
        acq_search_band=3000.0,
        track_mode=TrackMode.NARROWBAND,  # 6 MHz front end: BOC(6,1) absent
    )
    sc = make_scenario(s, RX, n_sats=5, sow_base=3600.0 * 3, seed=5)
    cache = "/tmp/b1c_chain_sig.npy"
    t0 = time.time()
    if os.path.exists(cache):
        sig = np.load(cache)
    else:
        sig = synthesize_scenario(sc, noise_std=2.0, amplitude=1.3, seed=2)
        np.save(cache, sig)
    print(f"[synth] {len(sig)/1e6:.0f} MS in {time.time()-t0:.0f}s", flush=True)

    res = run_receiver(sig, s, epochs_per_block=100, verbose=True)
    assert res.track is not None and len(res.channels) == 5
    nav = res.nav
    assert nav is not None, "B1C PVT produced no solution"
    ok = np.isfinite(nav.x)
    err = np.sqrt((nav.x[ok] - RX[0])**2 + (nav.y[ok] - RX[1])**2
                  + (nav.z[ok] - RX[2])**2)
    print(f"[pvt] fixes={ok.sum()} 3D err median={np.median(err):.2f} m "
          f"all={np.round(err, 2)}")
    assert np.median(err) < 2.0, err
    print("B1C CHAIN PASS")


if __name__ == "__main__":
    main()

"""End-to-end B2a demo at production rates: synthesize a full-rate IF
capture with real B-CNAV2 messages, then run the complete receiver
(acquire -> track -> decode) through the public API.

Usage: python examples/b2a_pipeline_demo.py [seconds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bds3_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from bds3_tpu.config import b2a_settings
from bds3_tpu.io import SatParams, synthesize_if
from bds3_tpu.navmsg.encode import bcnav2_nav_bits
from bds3_tpu.receiver import run_receiver

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    # >= 6.1 s guarantees one complete 3 s B-CNAV2 frame in the capture
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 6.5
    s = b2a_settings(acq_satellite_list=(7, 19, 30))

    from test_navmsg import sample_eph  # known ephemeris ground truth

    eph19 = sample_eph(19)
    eph30 = sample_eph(30)
    sats = [
        SatParams(prn=19, doppler_hz=1650.0, code_phase_chips=4100.0,
                  amplitude=0.65,
                  nav_bits=bcnav2_nav_bits(eph19, 3000.0, 8)),
        SatParams(prn=30, doppler_hz=-2480.0, code_phase_chips=8123.0,
                  amplitude=0.6,
                  nav_bits=bcnav2_nav_bits(eph30, 3000.0, 8)),
    ]
    cache = f"/tmp/b2a_demo_capture_{seconds:g}.npy"
    t0 = time.time()
    if os.path.exists(cache):
        sig = np.load(cache)
    else:
        sig = synthesize_if(s, sats, n_ms=seconds * 1e3, noise_std=2.0, seed=11)
        np.save(cache, sig)
    print(f"[synth] {seconds:.1f}s capture at {s.sampling_freq/1e6:.3f} MHz "
          f"-> {len(sig)/1e6:.0f} MS in {time.time()-t0:.1f}s")

    res = run_receiver(sig, s, verbose=True)

    assert res.track is not None
    prns = list(res.track.prns)
    print(f"[channels] tracking PRNs {prns}")
    for want in (19, 30):
        assert want in prns, f"PRN {want} not tracked"
    assert 7 not in prns, "phantom detection of absent PRN 7"

    # carrier convergence check
    for ch, want_fd in ((prns.index(19), 1650.0), (prns.index(30), -2480.0)):
        cf = np.mean(res.track.carr_freq[ch, -200:])
        err = cf - (s.intermediate_freq + want_fd)
        print(f"[lock] PRN {res.track.prns[ch]}: carrier err {err:+.2f} Hz")
        assert abs(err) < 1.0

    # nav decode check: a short capture holds ~1 of the 3 requisite
    # message types, so assert at least one CRC-valid message decoded
    from bds3_tpu.navmsg.bcnav2 import decode_bcnav2

    for ch, truth in ((prns.index(19), eph19), (prns.index(30), eph30)):
        eph, sfs, tow = decode_bcnav2(res.track.outputs["d_ip"][ch])
        print(f"[decode] PRN {res.track.prns[ch]}: messages={sorted(eph.id_valid)} "
              f"TOW={tow} first_frame_epoch={sfs}")
        assert eph.id_valid, "no CRC-valid B-CNAV2 message decoded"
        assert sfs is not None
        if 10 in eph.id_valid:
            assert abs(eph.m_0 - truth.m_0) < 1e-9

    # C/N0 sanity
    from bds3_tpu.observe import cn0_pld_series

    for ch in range(len(prns)):
        series = cn0_pld_series(res.track, ch)
        print(f"[cn0] PRN {res.track.prns[ch]}: data C/N0 "
              f"{np.nanmean(series['data_cn0'][2:]):.1f} dB-Hz, lock "
              f"{np.nanmean(series['data_lock'][2:]):.2f}")
    print("DEMO PASS")


if __name__ == "__main__":
    main()

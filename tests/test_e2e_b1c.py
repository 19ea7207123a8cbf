"""B1C full-chain end-to-end test (BASELINE config 2's receiver chain):
scenario -> IF -> acquisition -> narrowband tracking -> B-CNAV1 decode
(secondary-code sync, BCH, de-interleave, CRC) -> pseudoranges -> PVT.

Reference behavior matched: `BDS-3_B1C/postNavigation.m:146-298` with
NB_tracking.  26 s of signal covers one full 18 s B-CNAV1 frame plus
sync/measurement margin; 6 MHz real sampling keeps the CPU runtime sane
(BOC(1,1) main lobes only, hence NARROWBAND mode -- the 6 MHz front end
cannot carry BOC(6,1) anyway)."""
import numpy as np
import pytest

from bds3_tpu.config import TrackMode, b1c_settings
from bds3_tpu.io.scenario import make_scenario, synthesize_scenario
from bds3_tpu.receiver import run_receiver

RX_TRUTH = np.array([-1288398.0, -4721697.0, 4078625.0])


@pytest.fixture(scope="module")
def b1c_fix():
    s = b1c_settings(
        sampling_freq=6e6,
        intermediate_freq=1.5e6,
        ms_to_process=26_000,
        use_tropo_corr=False,       # scenario models no troposphere
        acq_satellite_list=tuple(range(1, 7)),
        num_channels=6,
        acq_coh_ms=3,
        acq_step=1000 / 3 / 2,
        acq_search_band=3000.0,
        track_mode=TrackMode.NARROWBAND,
    )
    sc = make_scenario(s, RX_TRUTH, n_sats=5, sow_base=3600.0 * 3, seed=5)
    sig = synthesize_scenario(sc, noise_std=2.0, amplitude=1.3, seed=2)
    res = run_receiver(sig, s, epochs_per_block=250, verbose=False)
    return s, sc, res


class TestB1CEndToEnd:
    def test_all_sats_tracked(self, b1c_fix):
        s, sc, res = b1c_fix
        assert res.track is not None
        assert len(res.channels) == 5, [c.prn for c in res.channels]

    def test_channels_locked(self, b1c_fix):
        s, sc, res = b1c_fix
        assert res.health, "no channel health computed"
        assert all(h["lock_ok"] for h in res.health), res.health
        assert all(h["cn0_db"] > 40 for h in res.health), res.health

    def test_ephemeris_decoded(self, b1c_fix):
        s, sc, res = b1c_fix
        assert res.nav is not None, "no PVT solution produced"
        assert len(res.nav.ephemerides) >= 4
        truth = {e.prn: e for e in sc.ephemerides}
        for prn, eph in res.nav.ephemerides.items():
            t = truth[prn]
            assert eph.m_0 == pytest.approx(t.m_0, abs=1e-9)
            assert eph.delta_a == pytest.approx(t.delta_a, abs=2.0**-9)

    def test_position_accuracy(self, b1c_fix):
        s, sc, res = b1c_fix
        nav = res.nav
        ok = np.isfinite(nav.x)
        assert ok.sum() >= 10, f"only {ok.sum()} fixes"
        err = np.sqrt(
            (nav.x[ok] - RX_TRUTH[0]) ** 2
            + (nav.y[ok] - RX_TRUTH[1]) ** 2
            + (nav.z[ok] - RX_TRUTH[2]) ** 2
        )
        med = np.median(err)
        # Gate at the north star's tolerance (BASELINE.md: ~1 m vs the
        # MATLAB reference; bench full_receiver_b1c measures ~1.7 m median
        # at 33 Msps WB).  3.0 m would not catch a 2.5 m regression.
        assert med < 2.0, f"median 3D error {med:.2f} m (all: {err.round(2)})"

"""Unit tests for spreading-code generation (SURVEY.md section 4 strategy:
cross-check vectorized generators against independent naive semantics, plus
structural properties implied by the ICD)."""
import numpy as np
import pytest

from bds3_tpu.signals import (
    b1c_data_boc11,
    b1c_data_chips,
    b1c_pilot_boc11,
    b1c_pilot_boc61,
    b1c_pilot_chips,
    b1c_secondary_code,
    b2a_data_code,
    b2a_data_secondary,
    b2a_pilot_code,
    sample_chips,
)
from bds3_tpu.signals import icd_tables as icd
from bds3_tpu.signals.b1c import b1c_secondary_code as sec
from bds3_tpu.signals.weil import legendre_bits, weil_code

from tests.reference_impls import slow_b2a_code, slow_legendre_bits, slow_weil


def seed_to_bits(seed: int) -> list[int]:
    return [(seed >> (12 - i)) & 1 for i in range(13)]


class TestLegendre:
    def test_against_jacobi(self):
        n = 3607
        assert legendre_bits(n).tolist() == slow_legendre_bits(n)

    def test_large_prime_spotcheck(self):
        n = 10243
        fast = legendre_bits(n)
        rng = np.random.default_rng(0)
        from tests.reference_impls import jacobi_symbol

        for i in rng.integers(1, n, size=200):
            assert fast[i] == (1 if jacobi_symbol(int(i), n) == 1 else 0)

    def test_balance(self):
        # exactly (n-1)/2 residues
        for n in (3607, 10243):
            assert int(legendre_bits(n).sum()) == (n - 1) // 2


class TestB1CWeil:
    @pytest.mark.parametrize("prn", [1, 19, 20, 63])
    def test_data_code_matches_naive(self, prn):
        w, p = icd.B1C_DATA_WP[prn - 1]
        assert b1c_data_chips(prn).tolist() == slow_weil(10243, w, p, 10230)

    @pytest.mark.parametrize("prn", [1, 30, 63])
    def test_pilot_code_matches_naive(self, prn):
        w, p = icd.B1C_PILOT_WP[prn - 1]
        assert b1c_pilot_chips(prn).tolist() == slow_weil(10243, w, p, 10230)

    @pytest.mark.parametrize("prn", [1, 19, 63])
    def test_secondary_matches_naive(self, prn):
        w, p = icd.B1C_SECONDARY_WP[prn - 1]
        assert b1c_secondary_code(prn).tolist() == slow_weil(3607, w, p, 1800)

    def test_codes_distinct_across_prn(self):
        assert not np.array_equal(b1c_data_chips(19), b1c_data_chips(20))
        assert not np.array_equal(b1c_data_chips(19), b1c_pilot_chips(19))

    def test_boc11_expansion(self):
        prn = 19
        chips = b1c_data_chips(prn)
        boc = b1c_data_boc11(prn)
        assert boc.shape == (20460,)
        assert np.array_equal(boc[0::2], -chips)
        assert np.array_equal(boc[1::2], chips)

    def test_boc61_expansion(self):
        prn = 19
        chips = b1c_pilot_chips(prn)
        boc = b1c_pilot_boc61(prn)
        assert boc.shape == (10230 * 12,)
        blocks = boc.reshape(10230, 12)
        # (-1)^(ii) for ii = 1..12 => starts at -chip and alternates
        assert np.array_equal(blocks[:, 0], -chips)
        assert np.array_equal(blocks[:, 1], chips)
        assert np.array_equal(blocks[:, 11], chips)

    def test_pilot_boc11_expansion(self):
        prn = 7
        chips = b1c_pilot_chips(prn)
        boc = b1c_pilot_boc11(prn)
        assert np.array_equal(boc.reshape(-1, 2)[:, 0], -chips)


class TestB2aCodes:
    @pytest.mark.parametrize("prn", [1, 19, 20, 63])
    def test_data_matches_naive(self, prn):
        bits = seed_to_bits(icd.B2A_DATA_G2_SEED[prn - 1])
        naive = slow_b2a_code(bits, icd.B2A_DATA_G1_TAPS, icd.B2A_DATA_G2_TAPS, 10230)
        assert b2a_data_code(prn).tolist() == naive

    @pytest.mark.parametrize("prn", [1, 19, 61, 63])
    def test_pilot_matches_naive(self, prn):
        bits = seed_to_bits(icd.B2A_PILOT_G2_SEED[prn - 1])
        naive = slow_b2a_code(
            bits, icd.B2A_PILOT_G1_TAPS, icd.B2A_PILOT_G2_TAPS, 10230
        )
        assert b2a_pilot_code(prn).tolist() == naive

    def test_bipolar_and_distinct(self):
        c = b2a_data_code(19)
        assert set(np.unique(c)) == {-1, 1}
        assert not np.array_equal(c, b2a_data_code(20))
        assert not np.array_equal(c, b2a_pilot_code(19))

    def test_autocorrelation_peak(self):
        c = b2a_data_code(19).astype(np.float64)
        f = np.fft.fft(c)
        ac = np.real(np.fft.ifft(f * np.conj(f)))
        assert np.argmax(ac) == 0
        assert ac[0] == pytest.approx(10230)
        assert np.max(np.abs(ac[1:])) < 0.2 * ac[0]

    def test_secondary(self):
        assert b2a_data_secondary().tolist() == [1, 1, 1, -1, 1]


class TestSampling:
    def test_zero_order_hold_semantics(self):
        # 4 chips at chip rate 1, fs 2.5 -> MATLAB ceil((1:10)*0.4)
        chips = np.array([10, 20, 30, 40], dtype=np.int8)
        out = sample_chips(chips, fs=2.5, chip_rate=1.0, n_samples=10)
        expect_idx = np.ceil(np.arange(1, 11) * 0.4).astype(int) - 1
        expect_idx[-1] = 3
        assert out.tolist() == chips[expect_idx].tolist()

    def test_b2a_full_period_length(self):
        from bds3_tpu.config import b2a_settings

        s = b2a_settings()
        assert s.samples_per_code == 99375
        tab = sample_chips(
            b2a_data_code(19), s.sampling_freq, s.code_freq_basis, s.samples_per_code
        )
        assert tab.shape == (99375,)
        # last sample must be the last chip (reference clamp)
        assert tab[-1] == b2a_data_code(19)[-1]

    def test_b1c_boc_sampling_rate(self):
        from bds3_tpu.config import b1c_settings

        s = b1c_settings()
        assert s.samples_per_code == 993750  # 10 ms at 99.375 MHz
        waveform = b1c_data_boc11(19)
        tab = sample_chips(
            waveform, s.sampling_freq, 2 * s.code_freq_basis, s.samples_per_code
        )
        assert tab.shape == (993750,)

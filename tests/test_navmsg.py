"""Nav-message layer tests: CRC vectors, BCH round trips, frame codecs."""
import numpy as np
import pytest

from bds3_tpu.navmsg.bch import bch21_6_decode, bch51_8_decode, bch_encode
from bds3_tpu.navmsg.bcnav1 import decode_bcnav1
from bds3_tpu.navmsg.bcnav2 import decode_bcnav2
from bds3_tpu.navmsg.crc import crc24q, crc24q_check
from bds3_tpu.navmsg.encode import (
    bcnav1_frame_symbols,
    bcnav2_nav_bits,
    build_bcnav2_message,
)
from bds3_tpu.navmsg.ephemeris import Ephemeris
from bds3_tpu.signals import b1c_secondary_code, b2a_data_secondary


def bytes_to_bits(data: bytes) -> np.ndarray:
    return np.unpackbits(np.frombuffer(data, dtype=np.uint8))


class TestCRC24Q:
    def test_standard_check_value(self):
        # CRC-24Q catalogue check value: crc("123456789") = 0xCDE703
        assert crc24q(bytes_to_bits(b"123456789")) == 0xCDE703

    def test_check_roundtrip(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 2, 264 - 24).astype(np.uint8)
        crc = crc24q(data)
        crc_bits = np.array([(crc >> (23 - i)) & 1 for i in range(24)], np.uint8)
        frame = np.concatenate([data, crc_bits])
        assert crc24q_check(frame)
        frame[17] ^= 1
        assert not crc24q_check(frame)


class TestBCH:
    @pytest.mark.parametrize("val", [0, 1, 19, 42, 63])
    def test_bch21_roundtrip(self, val):
        info = np.array([(val >> (5 - i)) & 1 for i in range(6)], np.uint8)
        code = bch_encode(info, 21).astype(np.float64)
        assert bch21_6_decode(code).tolist() == info.tolist()

    def test_bch21_rejects_symbol_error(self):
        # threshold 20 (BCH21_6Decoding.m:49) leaves no error margin: one
        # flipped symbol drops the best correlation to 19 -> decode fails
        info = np.array([0, 1, 0, 0, 1, 1], np.uint8)
        code = bch_encode(info, 21).astype(np.float64)
        code[3] = -code[3]
        assert bch21_6_decode(code) is None

    @pytest.mark.parametrize("val", [0, 7, 200, 255])
    def test_bch51_roundtrip(self, val):
        info = np.array([(val >> (7 - i)) & 1 for i in range(8)], np.uint8)
        code = bch_encode(info, 51).astype(np.float64)
        assert bch51_8_decode(code).tolist() == info.tolist()


def sample_eph(prn=19) -> Ephemeris:
    e = Ephemeris()
    e.prn = prn
    e.wn = 800
    e.sat_type = "MEO"
    e.t_oe = 345600.0
    e.delta_a = 123.5
    e.a_dot = 0.01
    e.delta_n0 = 4.5e-9
    e.delta_n0_dot = 1.0e-13
    e.m_0 = 1.2345
    e.e = 0.003
    e.omega = -2.1
    e.omega_0 = 0.5
    e.i_0 = 0.96
    e.omega_dot = -8.0e-9
    e.i_0_dot = 2.0e-10
    e.c_is = 1.5e-8
    e.c_ic = -2.0e-8
    e.c_rs = 100.25
    e.c_rc = 200.5
    e.c_us = 8.0e-6
    e.c_uc = -4.0e-6
    e.t_oc = 345600.0
    e.a_0 = 1.0e-4
    e.a_1 = 2.0e-12
    e.a_2 = 0.0
    e.iodc = 321
    e.t_gd_b1cp = 3.0e-9
    return e


ORBIT_FIELDS = [
    ("t_oe", 0), ("delta_a", 2**-9), ("a_dot", 2**-21),
    ("delta_n0", 2e-13), ("delta_n0_dot", 3e-17), ("m_0", 8e-10),
    ("e", 2**-34), ("omega", 8e-10), ("omega_0", 8e-10), ("i_0", 8e-10),
    ("omega_dot", 2e-13), ("i_0_dot", 2e-13), ("c_is", 2**-30),
    ("c_ic", 2**-30), ("c_rs", 2**-8), ("c_rc", 2**-8),
    ("c_us", 2**-30), ("c_uc", 2**-30),
    ("t_oc", 0), ("a_0", 2**-34), ("a_1", 2**-50), ("a_2", 2**-66),
]


class TestBCNAV2Codec:
    def test_message_crc_ok(self):
        eph = sample_eph()
        msg = build_bcnav2_message(eph, 10, 3000.0)
        assert len(msg) == 288
        assert crc24q_check(msg)

    def test_stream_roundtrip(self):
        eph = sample_eph()
        sym = bcnav2_nav_bits(eph, first_sow=3000.0, n_frames=6)
        sec = b2a_data_secondary().astype(np.float64)
        prompt = np.kron(sym.astype(np.float64), sec) * 1000.0
        rng = np.random.default_rng(3)
        prompt += rng.normal(0, 100.0, len(prompt))
        # arbitrary lead-in
        prompt = np.concatenate([rng.normal(0, 900.0, 137), prompt])
        got, first_sf, tow = decode_bcnav2(prompt)
        assert got.has_b2a_requisites()
        assert first_sf == 137
        assert tow == 3000.0
        for name, tol in ORBIT_FIELDS:
            assert getattr(got, name) == pytest.approx(
                getattr(eph, name), abs=max(tol, 1e-18)), name
        assert got.iodc == eph.iodc
        assert got.wn == eph.wn
        assert got.sat_type == "MEO"

    def test_inverted_polarity(self):
        eph = sample_eph()
        sym = bcnav2_nav_bits(eph, first_sow=600.0, n_frames=4)
        sec = b2a_data_secondary().astype(np.float64)
        prompt = -np.kron(sym.astype(np.float64), sec) * 500.0
        got, first_sf, tow = decode_bcnav2(prompt)
        assert got.has_b2a_requisites()


class TestBCNAV1Codec:
    def test_frame_roundtrip(self):
        eph = sample_eph(prn=19)
        eph.how = 27
        soh = 27 * 18.0  # arbitrary multiple of 18
        sym = bcnav1_frame_symbols(eph, soh)
        assert sym.shape == (1800,)
        rng = np.random.default_rng(5)
        data_prompt = sym.astype(np.float64) * 800 + rng.normal(0, 80, 1800)
        lead = rng.normal(0, 800, 53)
        data_prompt = np.concatenate([lead, data_prompt])
        sec = b1c_secondary_code(19).astype(np.float64)
        pilot_prompt = np.concatenate([
            rng.choice([-1.0, 1.0], 53), np.roll(sec, 0)
        ]) * 600.0
        # pilot secondary alignment: frame starts where the secondary starts
        got, first_sf, tow = decode_bcnav1(data_prompt, pilot_prompt, 19)
        assert got.flag
        assert first_sf == 53
        assert tow == 27 * 3600 + soh
        for name, tol in ORBIT_FIELDS:
            assert getattr(got, name) == pytest.approx(
                getattr(eph, name), abs=max(tol, 1e-18)), name
        assert got.t_gd_b1cp == pytest.approx(eph.t_gd_b1cp, abs=2**-34)
        assert got.prn == 19


class TestBCNAV2MT33MT34:
    """MT33 (Clock+BGTO) and MT34 (SISAI+Clock) decode per ICD-B2a-1.0 —
    the reference's copy-paste-broken ranges (ephemeris.m:252-289) are
    deliberately NOT reproduced; see ephemeris.py's deviation notes."""

    def _eph33(self):
        e = sample_eph()
        e.gnss_id = 3
        e.wn_0_bgto = 812
        e.t_0_bgto = 345600.0 % (2**16 * 16)
        e.a_0_bgto = 4.5e-9
        e.a_1_bgto = -2.0e-13
        e.a_2_bgto = 1.0e-19
        return e

    def test_mt33_roundtrip(self):
        from bds3_tpu.navmsg.ephemeris import parse_bcnav2_message

        e = self._eph33()
        msg = build_bcnav2_message(e, 33, 3000.0)
        assert crc24q_check(msg)
        got = parse_bcnav2_message(msg[:264], Ephemeris())
        assert 33 in got.id_valid
        assert got.iodc == e.iodc          # IODC sits AFTER the BGTO block
        assert got.gnss_id == 3
        assert got.wn_0_bgto == 812
        assert got.t_0_bgto == e.t_0_bgto
        assert got.a_0_bgto == pytest.approx(e.a_0_bgto, abs=2**-35)
        assert got.a_1_bgto == pytest.approx(e.a_1_bgto, abs=2**-51)
        assert got.a_2_bgto == pytest.approx(e.a_2_bgto, abs=2**-68)
        assert got.a_0 == pytest.approx(e.a_0, abs=2**-34)
        assert got.t_oc == e.t_oc

    def test_mt34_roundtrip(self):
        from bds3_tpu.navmsg.ephemeris import parse_bcnav2_message

        e = sample_eph()
        e.t_op = 345300.0
        e.sisai_ocb, e.sisai_oc1, e.sisai_oc2 = 21, 5, 3
        msg = build_bcnav2_message(e, 34, 3003.0)
        assert crc24q_check(msg)
        got = parse_bcnav2_message(msg[:264], Ephemeris())
        assert 34 in got.id_valid
        assert got.t_op == e.t_op
        assert (got.sisai_ocb, got.sisai_oc1, got.sisai_oc2) == (21, 5, 3)
        assert got.t_oc == e.t_oc
        assert got.a_0 == pytest.approx(e.a_0, abs=2**-34)
        assert got.a_1 == pytest.approx(e.a_1, abs=2**-50)
        assert got.iodc == e.iodc

    def test_mt30_group_delays(self):
        from bds3_tpu.navmsg.ephemeris import parse_bcnav2_message

        e = sample_eph()
        e.t_gd_b2ap = -6.2e-9
        e.isc_b2ad = 1.1e-9
        msg = build_bcnav2_message(e, 30, 3000.0)
        got = parse_bcnav2_message(msg[:264], Ephemeris())
        assert got.t_gd_b2ap == pytest.approx(e.t_gd_b2ap, abs=2**-34)
        assert got.isc_b2ad == pytest.approx(e.isc_b2ad, abs=2**-34)

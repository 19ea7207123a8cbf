"""B-CNAV2 (B2a) frame synchronization and decoding.

Parity with `BDS-3_B2a/include/BCNAV2decoding.m:62-159`: the 24-bit
preamble upsampled by the 5-chip data secondary code is correlated against
the hard-limited data prompt stream (1 ms symbols); at each hit, 3000
symbols are folded 5:1 with secondary-code wipe-off into 600 message
symbols, polarity-corrected by the preamble, CRC-24Q checked over the
systematic 288 bits (LDPC skipped as in the reference,
BCNAV2decoding.m:129-132), and parsed message-by-message.
"""
from __future__ import annotations

import numpy as np

from bds3_tpu.navmsg.crc import crc24q_check
from bds3_tpu.navmsg.ephemeris import Ephemeris, parse_bcnav2_message
from bds3_tpu.signals import b2a_data_secondary

# ICD-B2a frame preamble, bipolar (BCNAV2decoding.m:72-74)
PREAMBLE = np.array(
    [-1, -1, -1, 1, 1, 1, -1, 1, 1, -1, 1, 1,
     -1, -1, 1, -1, -1, -1, -1, 1, -1, 1, 1, 1], dtype=np.float64
)
FRAME_MS = 3000       # 600 symbols x 5 ms
MSG_SYMBOLS = 600


def _sync_candidates(data_prompt: np.ndarray) -> np.ndarray:
    signs = np.where(data_prompt > 0, 1.0, -1.0)
    sec = b2a_data_secondary().astype(np.float64)
    pattern = np.kron(PREAMBLE, sec)  # 120 ms preamble waveform
    if len(signs) < len(pattern):
        return np.array([], dtype=np.int64)
    c = np.correlate(signs, pattern, mode="valid")
    return np.nonzero(np.abs(c) > 115)[0]


def decode_bcnav2(data_prompt: np.ndarray) -> tuple[Ephemeris, int | None, float | None]:
    """Decode all messages in one channel's data prompt stream (1 ms epochs).

    Returns (eph, first_subframe_epoch (0-based), TOW)."""
    eph = Ephemeris()
    first_sf = None
    tow = None
    sec = b2a_data_secondary().astype(np.float64)
    signs = np.where(data_prompt > 0, 1.0, -1.0)
    for idx in _sync_candidates(data_prompt):
        if idx + FRAME_MS > len(signs):
            continue
        grp = signs[idx : idx + FRAME_MS].reshape(MSG_SYMBOLS, 5)
        nav = np.where((grp * sec).sum(axis=1) > 0, 1.0, -1.0)
        if not np.array_equal(nav[:24], PREAMBLE):
            nav = -nav
        if not np.array_equal(nav[:24], PREAMBLE):
            continue
        msg_bits = (nav[24 : 24 + 288] < 0).astype(np.uint8)  # -1 -> 1
        if not crc24q_check(msg_bits):
            continue
        eph = parse_bcnav2_message(msg_bits, eph)
        if first_sf is None:
            first_sf = int(idx)
            tow = eph.sow
    return eph, first_sf, tow

"""TOW-anchored transmit times and raw pseudoranges at a common receive
epoch.

Parity with `Common/calculatePseudoranges.m:63-110`: for each channel,
find the tracking epoch whose end-sample is the last not beyond the
measurement sample, propagate the code phase forward at the tracked code
frequency, and anchor the code-period count to the decoded frame start.
"""
from __future__ import annotations

import numpy as np

from bds3_tpu.config import C_LIGHT, Settings


def transmit_times(
    track, channels: list[int], sub_frame_start: dict, tow: dict,
    curr_meas_sample: int, settings: Settings,
) -> dict:
    """Per-channel transmit time [s] at curr_meas_sample."""
    out = {}
    for ch in channels:
        abs_s = track.absolute_sample[ch]
        e = int(np.searchsorted(abs_s, curr_meas_sample, side="right")) - 1
        e = max(e, 0)
        step = track.code_freq[ch, e] / settings.sampling_freq
        code_phase = track.outputs["rem_code_phase"][ch, e] \
            + step * (curr_meas_sample - abs_s[e])
        out[ch] = (
            code_phase / settings.code_length + e - sub_frame_start[ch]
        ) * settings.code_length / settings.code_freq_basis + tow[ch]
    return out


def pseudoranges(tt: dict, local_time: float) -> dict:
    return {ch: (local_time - t) * C_LIGHT for ch, t in tt.items()}

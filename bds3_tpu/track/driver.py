"""Host-side tracking driver: feeds signal blocks to the device scan and
assembles per-epoch results.

Replaces the reference's per-channel sequential file re-reading
(`tracking.m:139-254`): one contiguous signal block per outer step serves
*all* channels (each channel slices at its own cursor), uploaded once to
device HBM; the closed-loop state lives on device across the whole run.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from bds3_tpu.config import Settings, Signal
from bds3_tpu.signals.b1c import b1c_data_boc11, b1c_pilot_boc11, b1c_pilot_boc61
from bds3_tpu.signals.b2a import b2a_data_code, b2a_pilot_code
from bds3_tpu.track.scan import track_block
from bds3_tpu.track.state import (
    ChannelInit,
    TrackConfig,
    channel_consts,
    code_coarse_tables,
    initial_state,
    make_track_config,
)


@dataclasses.dataclass
class TrackResults:
    """Per-channel, per-epoch tracking archives (the reference's
    trackResults struct, tracking.m:45-96)."""

    prns: np.ndarray               # (C,)
    acquired_freq: np.ndarray      # (C,) f64
    n_epochs: int
    outputs: dict                  # name -> (C, E) f32 arrays
    absolute_sample: np.ndarray    # (C, E) int64: sample index of epoch END
    carr_freq: np.ndarray          # (C, E) f64 absolute NCO frequency
    code_freq: np.ndarray          # (C, E) f64 absolute code frequency
    int_time: float
    settings: Settings = None

    def prompt(self, name: str) -> np.ndarray:
        return self.outputs[name]


def channel_code_tables(cfg: TrackConfig, inits: list[ChannelInit]):
    if cfg.signal == Signal.B2A:
        data = np.stack([b2a_data_code(c.prn) for c in inits])
        p11 = np.stack([b2a_pilot_code(c.prn) for c in inits])
        p61 = np.zeros((len(inits), 1), np.int8)
    else:
        data = np.stack([b1c_data_boc11(c.prn) for c in inits])
        p11 = np.stack([b1c_pilot_boc11(c.prn) for c in inits])
        if cfg.wideband:
            p61 = np.stack([b1c_pilot_boc61(c.prn) for c in inits])
        else:
            p61 = np.zeros((len(inits), 1), np.int8)
    return data, p11, p61


def track(
    signal: np.ndarray,
    settings: Settings,
    inits: list[ChannelInit],
    n_epochs: int | None = None,
    epochs_per_block: int = 100,
) -> TrackResults:
    """Track all channels for n_epochs integration periods.

    signal: full IF capture, int8/float32 (real) or complex64.
    """
    complex_input = np.iscomplexobj(signal)
    cfg = make_track_config(settings, complex_input, epochs_per_block)
    if n_epochs is None:
        n_epochs = settings.int_epochs

    C = len(inits)
    consts = channel_consts(cfg, inits, settings)
    data_t, p11_t, p61_t = channel_code_tables(cfg, inits)
    ckd_i, ckd_f = code_coarse_tables(cfg, cfg.m_data)
    if cfg.m_p61:
        ck61_i, ck61_f = code_coarse_tables(cfg, cfg.m_p61)
    else:
        ck61_i, ck61_f = ckd_i, ckd_f

    cursors0 = np.array([c.code_phase for c in inits], dtype=np.int64)
    s0 = int(cursors0.min())
    state = initial_state(cfg, inits, consts, cursors0 - s0)

    data_t = jnp.asarray(data_t)
    p11_t = jnp.asarray(p11_t)
    p61_t = jnp.asarray(p61_t)
    ckd_i, ckd_f = jnp.asarray(ckd_i), jnp.asarray(ckd_f)
    ck61_i, ck61_f = jnp.asarray(ck61_i), jnp.asarray(ck61_f)

    W = cfg.epochs_per_block
    per_epoch_max = cfg.q0_int + 3
    # Fixed block length across every call: a varying length would retrace
    # and recompile the scan each block.  Channel cursor spread is bounded
    # by one code period plus slow differential drift.
    # margin: one extra code period absorbs ~50 s of differential
    # code-Doppler drift between channels (~0.8 samples/epoch at +-5 kHz)
    block_len = int(cursors0.max() - s0) + W * per_epoch_max + cfg.n_max \
        + cfg.q0_int + 4 * per_epoch_max
    chunks = []
    abs_chunks = []
    done = 0
    total = len(signal)
    while done < n_epochs:
        cursor_host = np.asarray(state.cursor, dtype=np.int64)
        need = int(cursor_host.max()) + W * per_epoch_max + cfg.n_max
        assert need <= block_len, "channel cursors drifted past block margin"
        if s0 + need > total:
            break  # out of data: return partial results (tracking.m:250-254)
        block = signal[s0 : s0 + block_len]
        if len(block) < block_len:
            block = np.concatenate(
                [block, np.zeros(block_len - len(block), block.dtype)]
            )
        if not complex_input and block.dtype != np.int8:
            block = block.astype(np.float32)
        new_state, outs = track_block(
            cfg, jnp.asarray(block), data_t, p11_t, p61_t,
            ckd_i, ckd_f, ck61_i, ck61_f, consts, state,
        )
        outs = {k: np.asarray(v) for k, v in outs.items()}  # (W, C)
        blks = outs["blksize"].astype(np.int64)
        abs_end = s0 + cursor_host[None, :] + np.cumsum(blks, axis=0)
        chunks.append(outs)
        abs_chunks.append(abs_end)
        done += W
        new_cursor = np.asarray(new_state.cursor, dtype=np.int64)
        shift = int(new_cursor.min())
        s0 += shift
        state = new_state._replace(
            cursor=(new_cursor - shift).astype(np.int32)
        )

    if not chunks:
        raise ValueError("not enough signal for a single tracking block")

    names = chunks[0].keys()
    outputs = {
        k: np.concatenate([c[k] for c in chunks], axis=0)[:n_epochs].T.copy()
        for k in names
    }  # (C, E)
    absolute_sample = np.concatenate(abs_chunks, axis=0)[:n_epochs].T.copy()
    E = outputs["d_ip"].shape[1]

    base = np.array([c.acquired_freq for c in inits], dtype=np.float64)
    carr_freq = base[:, None] + outputs["d_cyc"].astype(np.float64) * cfg.fs
    code_freq = settings.code_freq_basis \
        + outputs["d_step"].astype(np.float64) * cfg.fs
    return TrackResults(
        prns=np.array([c.prn for c in inits]),
        acquired_freq=base,
        n_epochs=E,
        outputs=outputs,
        absolute_sample=absolute_sample,
        carr_freq=carr_freq,
        code_freq=code_freq,
        int_time=settings.int_time,
        settings=settings,
    )

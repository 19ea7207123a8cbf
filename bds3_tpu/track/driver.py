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
    """(C, L*m + 2*CODE_PAD) circularly-padded chip tables per channel."""
    from bds3_tpu.track.scan import CODE_PAD

    def ext(arr):
        return np.concatenate(
            [arr[..., -CODE_PAD:], arr, arr[..., :CODE_PAD]], axis=-1
        )

    if cfg.signal == Signal.B2A:
        data = ext(np.stack([b2a_data_code(c.prn) for c in inits]))
        p11 = ext(np.stack([b2a_pilot_code(c.prn) for c in inits]))
        p61 = np.zeros((len(inits), 1), np.int8)
    else:
        data = ext(np.stack([b1c_data_boc11(c.prn) for c in inits]))
        p11 = ext(np.stack([b1c_pilot_boc11(c.prn) for c in inits]))
        if cfg.wideband:
            p61 = ext(np.stack([b1c_pilot_boc61(c.prn) for c in inits]))
        else:
            p61 = np.zeros((len(inits), 1), np.int8)
    return data, p11, p61


def track(
    signal: np.ndarray,
    settings: Settings,
    inits: list[ChannelInit],
    n_epochs: int | None = None,
    epochs_per_block: int = 100,
    correlator: str = "auto",
    download: bool = True,
) -> TrackResults:
    """Track all channels for n_epochs integration periods.

    signal: full IF capture, int8/float32 (real) or complex64.  Pass a
    device-resident jax.Array to skip the per-block host->device upload
    (blocks are sliced on-device).
    correlator: "auto" picks the fully-fused pallas kernel on TPU when
    the config supports it, else the XLA bucket correlator; explicit
    values ("fused", "bucket", "bucket_pallas", "gather") force a path.
    download: when False, TrackResults carries lazy device arrays (no
    device->host transfer) — use for throughput runs / pipelining; call
    np.asarray on the fields (or rerun with download=True) to realize.
    """
    import jax

    complex_input = np.iscomplexobj(signal)
    if complex_input:
        # complex64 windows are 8 bytes/sample: bound the pre-gathered
        # (W, C, n_win) buffer to ~1 GB
        epochs_per_block = min(epochs_per_block, 64)
    cfg = make_track_config(settings, complex_input, epochs_per_block)
    if correlator == "auto":
        # keep whatever the (possibly monkeypatched) config factory chose
        # unless it is the plain default; then prefer the fused TPU kernel
        if cfg.correlator == "bucket":
            from bds3_tpu.track.pallas_fused import fused_supported

            if jax.default_backend() == "tpu" \
                    and fused_supported(cfg, len(inits)):
                cfg = dataclasses.replace(cfg, correlator="fused")
    elif correlator != cfg.correlator:
        cfg = dataclasses.replace(cfg, correlator=correlator)
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
    # by one code period plus slow differential drift; margins below absorb
    # ~50 s of code-Doppler drift (~1 sample/epoch worst case).
    # includes the pre-gathered window extent (scan.window_length)
    block_len = int(cursors0.max() - s0) + W * per_epoch_max + cfg.n_max \
        + 2 * cfg.q0_int + 4 * per_epoch_max + W + 64
    # Analytic per-block shift (NO device->host sync in the loop: each
    # readback through a remote-device relay costs ~seconds of latency).
    # Expected epoch advance per channel = L/(step_base + init_dstep);
    # shift by the slowest channel minus a drift guard.
    exp_adv = cfg.code_length / (cfg.step_base + consts.init_dstep.astype(np.float64))
    # guard 0.1 samples/epoch >> true drift of the tracked code rate vs the
    # acquisition-aided estimate (~1e-3 samples/epoch + satellite dynamics)
    shift = max(int(np.floor(W * (exp_adv.min() - 0.1))), 0)

    out_chunks = []   # device arrays, downloaded once at the end
    names = None
    done = 0
    total = len(signal)
    spread0 = int(cursors0.max() - s0)
    while done < n_epochs:
        # conservative bound on current max cursor without a device sync
        worst = spread0 + int(
            (done // W) * (W * (exp_adv.max() - exp_adv.min()) + 0.1 * W + 2)
        )
        if worst - spread0 > 2 * cfg.q0_int:
            raise RuntimeError(
                "channel cursor spread outgrew the block margin; use a "
                "larger epochs_per_block or re-anchor (very long run)"
            )
        if s0 + worst + W * per_epoch_max + cfg.n_max > total:
            break  # out of data: return partial results (tracking.m:250-254)
        block = signal[s0 : s0 + block_len]
        if len(block) < block_len:
            pad = block_len - len(block)
            if isinstance(block, jax.Array):
                block = jnp.pad(block, (0, pad))
            else:
                block = np.concatenate(
                    [block, np.zeros(pad, block.dtype)]
                )
        if not complex_input and block.dtype != np.int8:
            block = block.astype(np.float32)
        new_state, outs = track_block(
            cfg, jnp.asarray(block), data_t, p11_t, p61_t,
            ckd_i, ckd_f, ck61_i, ck61_f, consts, state,
        )
        # pack (W, C) outputs into one (F, W, C) device array; blksize is
        # < 2^24 so float32 stacking is exact
        names = sorted(outs.keys())
        out_chunks.append(jnp.stack(
            [outs[k].astype(jnp.float32) for k in names]
        ))
        done += W
        s0 += shift
        state = new_state._replace(cursor=new_state.cursor - shift)

    if not out_chunks:
        raise ValueError("not enough signal for a single tracking block")

    stacked_dev = jnp.concatenate(out_chunks, axis=1)          # (F, E, C)
    base = np.array([c.acquired_freq for c in inits], dtype=np.float64)
    if not download:
        # lazy mode: outputs stay on device (throughput runs, pipelining);
        # the f64 derived fields need host numpy, so they are omitted
        outputs = {k: stacked_dev[i][:n_epochs].T
                   for i, k in enumerate(names)}
        return TrackResults(
            prns=np.array([c.prn for c in inits]),
            acquired_freq=base,
            n_epochs=int(outputs["d_ip"].shape[1]),
            outputs=outputs,
            absolute_sample=None, carr_freq=None, code_freq=None,
            int_time=settings.int_time,
            settings=settings,
        )

    # single packed download for the whole run
    stacked = np.asarray(stacked_dev)
    outputs = {
        k: np.ascontiguousarray(stacked[i][:n_epochs].T)
        for i, k in enumerate(names)
    }  # (C, E)
    E = outputs["d_ip"].shape[1]

    # absolute end-sample of each epoch: initial code-start position plus
    # the cumulative consumed samples (s0+cursor is shift-invariant)
    blks = stacked[names.index("blksize")][:E].astype(np.int64)  # (E, C)
    absolute_sample = np.ascontiguousarray(
        (cursors0[None, :] + np.cumsum(blks, axis=0)).T
    )

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

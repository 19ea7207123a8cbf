"""The tracking epoch scan: closed-loop DLL/PLL over `lax.scan`, channels
vmapped.

TPU-first redesign of the reference per-channel, per-epoch Python-style
loops (`BDS-3_B2a/tracking.m:195-436`, `BDS-3_B1C/WB_tracking.m:206-496`,
`NB_tracking.m`): the only true sequential dependency is the small scalar
loop state (NCO phases/frequencies, filter memories), so each scan step
does one *epoch* of work — ~1e5-1e6 samples of fused mix+correlate across
all channels at once — and `lax.scan` carries the loop state.  The
variable MATLAB `blksize` becomes a fixed n_max-sample window with a
validity mask (SURVEY.md section 7.4 item 2).

Phase generation follows the split-table scheme described in
track/state.py; behavioral parity notes for each discriminator are cited
inline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bds3_tpu.config import Signal, TrackMode
from bds3_tpu.track.state import SPLIT, ChannelConsts, ChannelState, TrackConfig

W11 = float(np.sqrt(29.0 / 33.0))  # QMBOC pilot BOC(1,1) amplitude
W61 = float(np.sqrt(4.0 / 33.0))   # QMBOC pilot BOC(6,1) amplitude


def _code_indices(cfg: TrackConfig, m: int, ck_int, ck_frac,
                  rem_code, off_chips, d_step, k_idx, r_f, i_f):
    """Per-sample gather index into an m-entries-per-chip table.

    Reproduces the reference indexing `ceil(tcode*m)` with circular wrap
    (local-code pad [end, code, first], e.g. tracking.m:156-164): 0-based
    index = (ceil(chi*m) - 1) mod (L*m)."""
    lm = cfg.code_length * m
    sm = jnp.float32(cfg.step_base * m)
    frac = (rem_code + off_chips) * m + ck_frac[k_idx] + r_f * sm \
        + i_f * (d_step * m)
    idx = ck_int[k_idx] + jnp.ceil(frac).astype(jnp.int32) - 1
    return jnp.mod(idx, lm)


def _epoch(cfg: TrackConfig, tables, consts_row, block, state_row):
    """One tracking epoch for one channel (vmapped over channels).

    tables: dict of (L*m,) int8 code arrays for this channel.
    consts_row / state_row: per-channel slices of ChannelConsts/ChannelState.
    """
    (cursor, rem_code, rem_cyc, d_cyc, d_step,
     code_nco, code_error, d1_carr, d2_carr) = state_row
    carr_t, a_base, q0_cyc, init_dstep = consts_row

    n = cfg.n_max
    i32 = jnp.arange(n, dtype=jnp.int32)
    i_f = i32.astype(jnp.float32)
    k_idx = i32 // SPLIT
    r_f = (i32 % SPLIT).astype(jnp.float32)

    # --- blksize = ceil((L - rem)/step) (tracking.m:230-233) -------------
    e_rel = d_step / jnp.float32(cfg.step_base)       # (step-base)/base
    corr = 1.0 - e_rel + e_rel * e_rel                # ~= 1/(1+e)
    resid = cfg.q0_frac - (rem_code / jnp.float32(cfg.step_base)
                           + (cfg.q0_int + cfg.q0_frac) * e_rel) * corr
    delta = jnp.ceil(resid).astype(jnp.int32)
    blksize = cfg.q0_int + delta
    mask = (i32 < blksize).astype(jnp.float32)

    # --- sample window ----------------------------------------------------
    win = jax.lax.dynamic_slice(block, (cursor,), (n,))

    # --- local carrier (WB_tracking.m:329-346, canonical e^{-j theta}) ---
    cyc = jnp.mod(carr_t[k_idx] + rem_cyc + r_f * a_base + i_f * d_cyc, 1.0)
    ang = (2.0 * np.pi) * cyc
    c, s = jnp.cos(ang), jnp.sin(ang)
    if cfg.complex_input:
        xr, xi = jnp.real(win), jnp.imag(win)
        i_bb = (xr * c + xi * s) * mask
        q_bb = (xi * c - xr * s) * mask
    else:
        x = win.astype(jnp.float32)
        i_bb = x * c * mask
        q_bb = -(x * s) * mask

    def correlate(table, m, ck, off):
        idx = _code_indices(cfg, m, ck[0], ck[1], rem_code, off,
                            d_step, k_idx, r_f, i_f)
        cv = table[idx].astype(jnp.float32)
        return jnp.sum(cv * i_bb), jnp.sum(cv * q_bb)

    ck_d = tables["ck_data"]
    spc = jnp.float32(cfg.spacing)
    out = {}
    taps = [("d", tables["data"], cfg.m_data, ck_d)]
    if cfg.use_pilot:
        taps.append(("p11", tables["pilot11"], cfg.m_data, ck_d))
    if cfg.wideband:
        taps.append(("p61", tables["pilot61"], cfg.m_p61, tables["ck_p61"]))
    for name, tab, m, ck in taps:
        out[f"{name}_ie"], out[f"{name}_qe"] = correlate(tab, m, ck, -spc)
        out[f"{name}_ip"], out[f"{name}_qp"] = correlate(tab, m, ck, 0.0)
        out[f"{name}_il"], out[f"{name}_ql"] = correlate(tab, m, ck, spc)

    # --- discriminators ---------------------------------------------------
    inv2pi = 1.0 / (2.0 * np.pi)

    def eml(ie, qe, il, ql):
        e = jnp.sqrt(ie * ie + qe * qe)
        l = jnp.sqrt(il * il + ql * ql)
        return (e - l) / (e + l)

    carr_d = jnp.arctan(out["d_qp"] / out["d_ip"]) * inv2pi
    code_d = eml(out["d_ie"], out["d_qe"], out["d_il"], out["d_ql"])
    if cfg.signal == Signal.B1C:
        code_d = code_d * (1.0 - cfg.spacing)  # WB_tracking.m:409-410

    if not cfg.use_pilot:
        carr_err, code_err = carr_d, code_d
    elif cfg.signal == Signal.B2A:
        # pilot pi/2 ahead of data; rotate back (tracking.m:341-353)
        carr_p = jnp.arctan(-out["p11_ip"] / out["p11_qp"]) * inv2pi
        code_p = eml(out["p11_ie"], out["p11_qe"], out["p11_il"], out["p11_ql"])
        carr_err = 0.5 * (carr_d + carr_p)
        code_err = 0.5 * (code_d + code_p)
    elif not cfg.wideband:
        # B1C narrowband 11/29 power weighting (NB_tracking.m:353-384)
        carr_p = jnp.arctan(-out["p11_ip"] / out["p11_qp"]) * inv2pi
        code_p = eml(out["p11_ie"], out["p11_qe"], out["p11_il"],
                     out["p11_ql"]) * (1.0 - cfg.spacing)
        carr_err = (carr_d * 11.0 + carr_p * 29.0) / 40.0
        code_err = (code_d * 11.0 + code_p * 29.0) / 40.0
    else:
        # B1C wideband QMBOC composite pilot (WB_tracking.m:374-396,414-419)
        for x in ("e", "p", "l"):
            out[f"p_i{x}"] = -W61 * out[f"p61_i{x}"] + W11 * out[f"p11_q{x}"]
            out[f"p_q{x}"] = -W61 * out[f"p61_q{x}"] - W11 * out[f"p11_i{x}"]
        carr_p = jnp.arctan(out["p_qp"] / out["p_ip"]) * inv2pi
        code_p = eml(out["p_ie"], out["p_qe"], out["p_il"],
                     out["p_ql"]) * (1.0 - cfg.spacing)
        carr_err = (carr_d + 3.0 * carr_p) / 4.0
        f = cfg.dll_factor
        code_err = code_d * f + code_p * (1.0 - f)

    # --- loop filters (tracking.m:355-389) -------------------------------
    d2_new = d2_carr + carr_err * cfg.pf3
    d1_new = d2_new + carr_err * cfg.pf2 + d1_carr
    carr_nco = d1_new + carr_err * cfg.pf1
    d_cyc_new = carr_nco / jnp.float32(cfg.fs)

    code_nco_new = code_nco + (cfg.tau2 / cfg.tau1) * (code_err - code_error) \
        + code_err * (cfg.int_time / cfg.tau1)
    d_step_new = init_dstep - code_nco_new / jnp.float32(cfg.fs)

    # --- phase remainders (tracking.m:156-164, 297-305) ------------------
    delta_f = delta.astype(jnp.float32)
    blk_f = blksize.astype(jnp.float32)
    rem_cyc_new = jnp.mod(
        rem_cyc + q0_cyc + delta_f * a_base + blk_f * d_cyc, 1.0
    )
    q0_step_minus_l = jnp.float32(cfg.q0_int * cfg.step_base - cfg.code_length)
    rem_code_new = rem_code + q0_step_minus_l \
        + delta_f * jnp.float32(cfg.step_base) \
        + blk_f * d_step

    new_state = (cursor + blksize, rem_code_new, rem_cyc_new, d_cyc_new,
                 d_step_new, code_nco_new, code_err, d1_new, d2_new)

    out.update(
        carr_err=carr_err, code_err=code_err,
        carr_nco=carr_nco, code_nco=code_nco_new,
        d_cyc=d_cyc, d_step=d_step,
        rem_code_phase=rem_code, rem_carr_cyc=rem_cyc,
        blksize=blksize,
    )
    return new_state, out


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_block(
    cfg: TrackConfig,
    block: jnp.ndarray,          # (B,) int8 (real) or complex64
    data_tables: jnp.ndarray,    # (C, L*m_data) int8
    pilot11_tables: jnp.ndarray,  # (C, L*m_data) int8 (unused if data-only)
    pilot61_tables: jnp.ndarray,  # (C, L*12) int8 (unused unless WB)
    ck_data_int: jnp.ndarray,    # (k_max,) int32
    ck_data_frac: jnp.ndarray,   # (k_max,) f32
    ck_p61_int: jnp.ndarray,
    ck_p61_frac: jnp.ndarray,
    consts: ChannelConsts,
    state: ChannelState,
):
    """Run cfg.epochs_per_block epochs for all channels; returns
    (new_state, outputs dict of (W, C) arrays)."""
    if not cfg.complex_input:
        block = block.astype(jnp.float32)

    def step(carry, _):
        def one_channel(st_row, dtab, p11tab, p61tab, c_row):
            tables = {
                "data": dtab,
                "pilot11": p11tab,
                "pilot61": p61tab,
                "ck_data": (ck_data_int, ck_data_frac),
                "ck_p61": (ck_p61_int, ck_p61_frac),
            }
            return _epoch(cfg, tables, c_row, block, st_row)

        new_state, out = jax.vmap(
            one_channel, in_axes=(0, 0, 0, 0, 0)
        )(carry, data_tables, pilot11_tables, pilot61_tables, tuple(consts))
        return new_state, out

    init = tuple(jnp.asarray(x) for x in state)
    final, outs = jax.lax.scan(step, init, None, length=cfg.epochs_per_block)
    return ChannelState(*final), outs

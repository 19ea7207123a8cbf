"""Fully-fused multi-epoch Pallas TPU tracking kernel.

One `pallas_call` runs `epochs_per_block` closed-loop tracking epochs for
all channels: grid = (epoch,), iterated sequentially on the TensorCore
with the per-channel DLL/PLL loop state carried in SMEM scratch across
grid steps and the channels iterated by an in-kernel `fori_loop` (one
grid step per epoch keeps the per-step pipeline overhead off the epoch
critical path).  Each epoch x channel fuses, entirely in VMEM:

  1. carrier mix + validity mask + exclusive prefix sums of the epoch's
     sample window: the lane-exclusive prefix is one MXU matmul against
     a strictly-upper-triangular matrix, the row offsets a ones-column
     row-total matmul followed by a block strict-lower-triangular
     matmul (everything stays on the wide MXU/VPU paths — sublane
     rolls, narrow lane slices, and scalar loop carries each cost ~1 us
     of pipeline stall per step; see docs/PERF.md for the bisects),
  2. the prefix-sum (bucket) correlator's chip-boundary lookups — a
     (row, lane) decomposition: an 8-aligned dynamic slice of the prefix
     scratch, a one-hot row-select matmul on the MXU (batched over all
     three E/P/L offsets = 768 one-hot columns), and a lane-select
     mask-reduce on the VPU,
  3. the E/P/L correlator dot products against host-precomputed
     "boundary-difference" code vectors (Abel summation of the bucket
     form: sum_k c_k (P[j_{k+1}]-P[j_k]) == sum_v (c_{v-1}-c_v) P[j_v]),
  4. the discriminators (atan via a Cephes-style polynomial — Mosaic has
     no native atan), the 2nd-order DLL / 3rd-order PLL filters, and the
     phase-remainder updates (`tracking.m:334-389`, `tracking.m:156-164`).

The only HBM traffic per epoch is the int8 window blocks in and one
packed 49 KB output row per channel out.  Numerics follow
track/scan.py's bucket correlator to float32 tolerance (the boundary
index split here is slightly *more* precise: the k*frac ramp is rebased
per boundary tile from host float64 tables).

Supported configs: B2a (all modes), B1C narrowband/data-only, and B1C
wideband QMBOC (the BOC(6,1) pilot tap runs a second stage-2 pass over
the same prefix scratch on the m=12 boundary grid, weights DMA'd from
HBM on a depth-2 per-channel ring), real or complex IQ input, within
the VMEM budget.  Others fall back to the scan path (track/scan.py
dispatches).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bds3_tpu.config import Signal
from bds3_tpu.track.state import SPLIT, ChannelState

ROWS, LANES = 32, 128        # stage-1 tile = (32, 128) = SPLIT samples
START_GUARD = 16             # must match track.scan.START_GUARD
CODE_PAD = 16                # must match track.scan.CODE_PAD
VMEM_BUDGET = 13 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _geometry(cfg) -> dict:
    m = cfg.m_data
    lm = cfg.code_length * m
    kb = lm + 2 * CODE_PAD + 1          # boundary count (scan.py k_i range)
    # Stage-2 tiles are iterated in groups of S2_GROUP (a manual partial
    # unroll: Mosaic's fori_loop only supports unroll=1 or full, and full
    # unroll costs minutes of compile for ~20% runtime).  TK is padded to
    # a group multiple; pad tiles read zero Abel weights so they
    # contribute exactly 0 (their clipped lookups stay in range).
    # group=41 measured best (B2a: 0.537 ms/epoch at 23 s compile vs
    # 0.54/143 s for a fully-unrolled fori_loop, 0.72/13 s at unroll=1)
    # default group: 41 for B2a-scale windows (TK=41 -> stage 2 is one
    # fully-unrolled group); 8 for B1C-scale windows, where the big
    # p_scr plus 41 concurrently-live (128, NR*BT) one-hot temporaries
    # overflows the 16 MB scoped-vmem stack (the vector accumulators let
    # Mosaic overlap unrolled tiles, so liveness scales with the group)
    s2_default = "41" if cfg.n_win <= 300_000 else "8"
    s2_group = int(os.environ.get("FUSED_S2_GROUP", s2_default))
    inv0 = 1.0 / (cfg.step_base * m)    # samples per table entry, host f64
    inv0_int = int(np.floor(inv0))
    inv0_frac = float(inv0 - inv0_int)
    # window length: one SPLIT tile beyond the scan path's n_win, because
    # the in-kernel window DMA must start on the int8 HBM tile boundary
    # (32 rows = 4096 samples), so `off` can reach 4095 + START_GUARD.
    # Stage 1 consumes S1R rows (S1R/32 SPLIT tiles) per loop step — a
    # bigger step amortizes the per-step cond/loop overhead over a larger
    # MXU matmul; pad n_win up to a whole number of steps (the pad tiles
    # lie beyond off+blksize, so the active-tile guard skips them).
    s1r_env = os.environ.get("FUSED_S1_ROWS")
    if s1r_env:
        s1r = int(s1r_env)
        if s1r < ROWS or s1r % ROWS != 0:
            raise ValueError(
                f"FUSED_S1_ROWS must be a positive multiple of {ROWS}, "
                f"got {s1r}")
    else:
        # biggest step whose tail padding stays under ~25% of the window
        # (big steps amortize per-step overhead; padding is dead compute)
        base = cfg.n_win + SPLIT
        s1r = ROWS
        for cand in (256, 128, 64, 32):
            if _round_up(base, cand * LANES) <= base * 1.25:
                s1r = cand
                break
    n_win = _round_up(cfg.n_win + SPLIT, s1r * LANES)
    r = n_win // LANES                  # prefix rows; n_win % 4096 == 0
    # Half-grid mode: when the E/P/L spacing is exactly half a code-table
    # slot, the late tap's boundary samples coincide with the early tap's
    # shifted by one slot: j_L(b) == j_E(b-1) exactly (real arithmetic),
    # so stage 2 needs only TWO boundary ramps (prompt + early) and the
    # late correlator is a dot against host-shifted Abel weights.  The
    # dropped b=-1 edge term w_0*P[j_E(-1)] is provably zero: the prefix
    # is zero at or below `off` (the validity mask starts there), and
    # j_E(-1) = off + 1 + floor(-(PAD+1)*inv + (spc-rem)*m*inv) <= off
    # whenever (PAD+0.5)*inv >= (|rem|+spc)*m*inv + 1, true for any
    # usable sampling ratio (|rem_code| stays under one code-phase step).
    half_grid = (
        abs(cfg.spacing * m - 0.5) < 1e-12
        and (CODE_PAD + 0.5) * inv0
        >= (0.25 + cfg.spacing) * m * inv0 + 1
    )
    n_ramps = 2 if half_grid else 3
    # row-select slice height: worst-case span of one boundary tile's rows
    # after flooring the start row to a multiple of `align` (slack
    # align*128-1), plus the early-late correlator offset spread
    # DEFER mode stores RAW mixed samples in p_scr, whose magnitude is
    # int8-scale — bf16 keeps them to 2^-8 relative (correlator error
    # ~1e-5 after accumulation), HALVES the prefix-scratch traffic and
    # runs the stage-2 select matmuls at the MXU's native bf16 rate.
    # Non-DEFER p_scr holds large prefix sums (cancellation-heavy), so
    # it stays f32.  bf16 VMEM tiles are (16, 128), so the dynamic
    # row-slice alignment rises to 16 (a wider slice of half-width
    # rows: net fewer bytes and faster matmuls).
    pscr_env = os.environ.get("FUSED_PSCR", "auto")
    # Deferred-lane-prefix gate (see the r_scr note below).  Decided
    # BEFORE the row spans from a conservative span bound (64 rows; the
    # window rows r dominate rp) because the p_scr dtype feeds the
    # slice alignment that the spans depend on.
    defer_env = os.environ.get("FUSED_DEFER_LANE", "auto")
    if defer_env == "auto":
        defer = (r + 64) * 512 <= 1 << 20
    else:
        defer = defer_env == "1"
    # measured (round 4): bf16 p_scr cuts stage-1 stores slightly but
    # the bf16 select matmuls do NOT speed stage 2 (it is per-tile
    # overhead-bound, not MXU-rate-bound) and the 16-row alignment
    # grows the slice span — net ~2% slower.  Default f32.
    pscr_bf16 = {"auto": False, "bf16": True, "f32": False}[pscr_env]
    align = int(os.environ.get("FUSED_ROW_ALIGN", "0")) \
        or (16 if pscr_bf16 else 8)

    def row_span(m_, inv_, bt_):
        span = (align * LANES - 1) + int(np.ceil((bt_ - 1) * inv_)) \
            + int(np.ceil(2.0 * cfg.spacing * m_ * inv_)) + 8
        return _round_up(span // LANES + 2, 8)

    def pick_bt(m_, inv_, kb_, env_name):
        """Per-geometry boundary-tile size (was a module constant, 256).

        Hardware sweep (docs/PERF.md round 4, B2a 12ch full rate):
        bt=256 and bt=128 run the full kernel at the same speed (the
        smaller select-matmul row span S is cancelled by the 2x tile
        count's fixed overhead) and bt=64 is ~2x SLOWER — stage 2 is
        per-tile-overhead-bound, not MXU-span-bound.  Default stays
        256; the knob remains for other geometries."""
        env = os.environ.get(env_name)
        if env:
            return int(env)
        return 256

    bt = pick_bt(m, inv0, kb, "FUSED_BT")
    # clamp the unroll group to the raw tile count: a group larger than
    # the tile count would PAD tiles (big-BT geometries have few tiles;
    # padding doubled the work at bt=512 before this clamp)
    s2_group = min(s2_group, max(_round_up(kb, bt) // bt, 1))
    tk = _round_up(_round_up(kb, bt) // bt, s2_group)
    kp = tk * bt
    s_rows = row_span(m, inv0, bt)
    # B1C wideband: a second boundary family for the BOC(6,1) pilot tap
    # (WB_tracking.m:348-381).  It reuses the SAME mixed-I/Q prefix from
    # stage 1 — only stage 2 runs again on the m=12 boundary grid, with
    # the Abel weights DMA'd per channel from HBM (~0.5 MB each, too big
    # for channel-resident VMEM at 12+ channels).
    if cfg.m_p61:
        m61 = cfg.m_p61
        lm61 = cfg.code_length * m61
        kb61 = lm61 + 2 * CODE_PAD + 1
        # the weight ring is DMA'd from HBM, so the tile-count dim must
        # be 8-aligned (Mosaic (8,128) tiling of memref slices); the
        # group size then has to divide it exactly (the group fori_loop
        # has no remainder pass), so pick the largest divisor <= the
        # data-path group
        inv61 = 1.0 / (cfg.step_base * m61)
        inv61_int = int(np.floor(inv61))
        inv61_frac = float(inv61 - inv61_int)
        bt61 = pick_bt(m61, inv61, kb61, "FUSED_BT61")
        tk61 = _round_up(_round_up(kb61, bt61) // bt61, 8)
        s2g61 = next(d for d in range(min(s2_group, tk61), 0, -1)
                     if tk61 % d == 0)
        kp61 = tk61 * bt61
        s61 = row_span(m61, inv61, bt61)
    else:
        m61 = lm61 = kb61 = tk61 = kp61 = inv61_int = 0
        inv61_frac = 0.0
        s61 = 0
        s2g61 = 1
        bt61 = 8    # dummy-ring tile width (kernel never touches it)
    # scratch rows (slice stays in range); multiple of the p_scr sublane
    # tile (16 for bf16) so the tail store shape stays tile-friendly.
    # Deferred-lane-prefix mode (gate above): stage 1 stores RAW mixed
    # tiles + per-row exclusive offsets (r_scr) instead of full
    # per-sample prefixes, and stage 2's lane select becomes a strict
    # `<` mask matmul (the lane prefix is folded into the select
    # contraction) plus a row-offset broadcast add.  Removes the big
    # lexc matmul from stage 1 at +1 VPU op per stage-2 tile.  r_scr is
    # lane-padded to 128 by Mosaic (rp*512 B) — cheap for B2a-scale
    # windows, ~4 MB for B1C, hence the size gate.
    rp = r + _round_up(max(s_rows, s61), 16 if pscr_bf16 else 8)
    # Stage-2 v-store mode: per-tile select results (vi, vq) go to a
    # (2, TK, NR*bt) VMEM scratch and the weight contraction runs ONCE
    # per channel as a full-sublane (TK, NR*bt) elementwise-reduce —
    # replacing ~24 one-sublane (1, bt) multiply/accumulate ops per
    # tile (1/8 VPU utilization each) with 2 stores.  Gated on the
    # scratch staying small (B2a / B1C-NB yes; the B1C WB BOC(6,1)
    # family would need ~3 MB, so it keeps the accumulator path).
    vst_env = os.environ.get("FUSED_S2_VSTORE", "auto")
    vst_bytes = 2 * tk * n_ramps * bt * 4
    vst = {"auto": vst_bytes <= 768 << 10, "1": True, "0": False}[vst_env]
    # Channel-pair software pipelining: with TWO ping-pong prefix
    # scratches (channel c uses buffer c%2) consecutive channels have
    # no data hazard, so an unroll-2 channel loop lets Mosaic overlap
    # channel c's MXU-heavy stage 2 with channel c+1's VPU-heavy
    # stage 1.  Gated on the doubled scratch fitting a 4 MB slice of
    # the VMEM budget (B2a-scale yes, full-rate B1C no).
    pp_env = os.environ.get("FUSED_PP", "auto")
    scratch_b = rp * 256 * (2 if pscr_bf16 else 4) \
        + (rp * 64 if defer else 0)
    pp = 2 if (pp_env == "auto" and 2 * scratch_b <= 4 << 20) \
        else (int(pp_env) if pp_env != "auto" else 1)
    return dict(m=m, lm=lm, kb=kb, kp=kp, TK=tk, S2_GROUP=s2_group,
                inv0_int=inv0_int, S1R=s1r, BT=bt, BT61=bt61,
                inv0_frac=inv0_frac, R=r, S=s_rows, RP=rp, n_win=n_win,
                T=n_win // (s1r * LANES), half_grid=half_grid,
                n_ramps=n_ramps, DEFER=defer, PSCR_BF16=pscr_bf16,
                ALIGN=align, PP=pp, VST=vst,
                m61=m61, lm61=lm61, kb61=kb61, TK61=tk61, kp61=kp61,
                S2G61=s2g61,
                inv61_int=inv61_int, inv61_frac=inv61_frac, S61=s61)


def fused_supported(cfg, n_channels: int = 12, win_bytes: int = 1) -> bool:
    """Whether this TrackConfig fits the fused kernel (shape + VMEM).

    Covers B2a (all modes) and B1C narrowband/data-only, real or complex
    IQ input, at any rate that fits the budget — the depth-2 window ring
    makes window VMEM independent of channel count, so full-rate B1C
    10 ms epochs and 24-48 channel B2a both fit.  B1C wideband QMBOC
    (WB_tracking.m's 18-correlator mode) adds a depth-2 BOC(6,1)
    weight ring, also channel-count independent."""
    geo = _geometry(cfg)
    # complex input rides the ring as two f32 planes
    win_b = 8 if cfg.complex_input else win_bytes
    n_planes = 4 if geo["half_grid"] else 2
    pscr_b = 2 if geo["PSCR_BF16"] else 4
    vmem = (geo["PP"] * geo["RP"] * 256 * pscr_b      # prefix scratch
            + (geo["PP"] * geo["RP"] * 512
               if geo["DEFER"] else 0)                # row-offset scratch
            + 2 * geo["n_win"] * win_b                # window ring (depth 2)
            + n_channels * n_planes * geo["kp"] * 4   # dcode tables
            + 2 * geo["kp61"] * 4                     # BOC(6,1) weight ring
            + 2 * n_channels * 8 * LANES * 4)         # output blocks
    return vmem <= VMEM_BUDGET


def _boundary_tile_tables(tk: int, inv_frac: float, bt: int) \
        -> tuple[np.ndarray, np.ndarray]:
    """Host-f64 split of (k_i * inv_frac) at each boundary tile start:
    g(k) = tb_frac[kt] + u*inv_frac reproduces scan.py's k_f*inv_frac
    ramp with per-tile rebasing (k_i = kt*bt + u - CODE_PAD)."""
    kt = np.arange(max(tk, 1), dtype=np.float64)
    val = (kt * bt - CODE_PAD) * inv_frac
    tb_int = np.floor(val).astype(np.int32)
    tb_frac = (val - np.floor(val)).astype(np.float32)
    return tb_int, tb_frac


def atan_poly(x):
    """float32 arctan to ~1.4e-7 abs (Cephes atanf ranges); Mosaic has no
    native atan lowering."""
    sgn = jnp.sign(x)
    ax = jnp.abs(x)
    big = ax > 2.414213562373095
    mid = ax > 0.41421356237309503
    x1 = jnp.where(big, -1.0 / jnp.where(big, ax, 1.0),
                   jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    z = x1 * x1
    p = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
          + 1.99777106478e-1) * z - 3.33329491539e-1) * z * x1 + x1
    return sgn * jnp.where(
        big, np.float32(np.pi / 2) + p,
        jnp.where(mid, np.float32(np.pi / 4) + p, p))


def _out_slots(cfg) -> list[str]:
    from bds3_tpu.track.scan import output_names

    return output_names(cfg) + [
        "st_rem_code", "st_rem_cyc", "st_d_cyc", "st_d_step",
        "st_code_nco", "st_code_err", "st_d1", "st_d2",
    ]


def _make_kernel(cfg, geo, n_channels, nrows_b2):
    NROWS_B2 = nrows_b2
    C = n_channels
    BT, BT61 = geo["BT"], geo["BT61"]
    T, TK, R, S, RP = geo["T"], geo["TK"], geo["R"], geo["S"], geo["RP"]
    S2G = geo["S2_GROUP"]
    HALF = geo["half_grid"]
    NR = geo["n_ramps"]
    W_TOTAL = cfg.epochs_per_block
    ROW_ALIGN = geo["ALIGN"]
    PDT = jnp.bfloat16 if geo["PSCR_BF16"] else jnp.float32
    m = geo["m"]
    inv0_int = geo["inv0_int"]
    inv0_frac_f = np.float32(geo["inv0_frac"])
    n_win = geo["n_win"]
    step_base = np.float32(cfg.step_base)
    sbm = np.float32(cfg.step_base * m)
    q0_int_f = np.float32(cfg.q0_int)
    q0_frac = np.float32(cfg.q0_frac)
    q0_step_minus_l = np.float32(cfg.q0_int * cfg.step_base - cfg.code_length)
    spc = float(cfg.spacing)
    # "split" blend: BOC(6,1) bank at its own narrow spacing (scan.py note)
    spc61 = float(cfg.spacing61) if cfg.wb_code_blend == "split" else spc
    inv2pi = np.float32(1.0 / (2.0 * np.pi))
    is_b1c = cfg.signal == Signal.B1C
    use_pilot = cfg.use_pilot
    cplx = cfg.complex_input
    two_pi = np.float32(2.0 * np.pi)
    bisect = os.environ.get("FUSED_BISECT", "full")
    # "bf16x2": run the big select/prefix matmuls as two bf16 passes
    # (hi + residual) instead of one fp32 pass.  The ~2^-17 relative
    # error bound holds for DEFER/raw-sample operands (values O(1));
    # in non-DEFER mode the operands are large prefix sums (up to ~1e7
    # for full-rate windows) and the Abel-weight contraction cancels
    # heavily, so the ABSOLUTE error scales with prefix magnitude —
    # exactly the long-window configs where non-DEFER is auto-selected.
    # Keep bf16x2 opt-in and prefer it only with DEFER=1.  (Measured
    # ~15% slower than fp32 on v5e anyway; knob kept for other HW.)
    prec = os.environ.get("FUSED_PREC", "f32")

    def dot_fast(a, b):
        if prec == "bf16x2":
            hi = a.astype(jnp.bfloat16)
            lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            bb = b.astype(jnp.bfloat16)
            return (jnp.dot(hi, bb, preferred_element_type=jnp.float32)
                    + jnp.dot(lo, bb, preferred_element_type=jnp.float32))
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    slots = _out_slots(cfg)
    # B1C wideband QMBOC statics (WB_tracking.m:348-419)
    WB = geo["m61"] > 0
    TK61, S61 = geo["TK61"], geo["S61"]
    S2G61 = geo["S2G61"]
    m61 = geo["m61"]
    inv61_int = geo["inv61_int"]
    inv61_frac_f = np.float32(geo["inv61_frac"])
    sbm61 = np.float32(cfg.step_base * max(m61, 1))
    dllf = np.float32(cfg.dll_factor)

    R_WIN = geo["n_win"] // LANES
    DEFER = geo["DEFER"]
    PP = geo["PP"]
    VST = geo["VST"]

    S1R = geo["S1R"]                 # stage-1 rows per loop step
    STEP = S1R * LANES               # stage-1 samples per loop step

    def kernel(cursor0_s, adv_s, carr_s, abase_s, q0cyc_s, dstep0_s,
               tbint_s, tbfrac_s, tb61int_s, tb61frac_s, statef_s,
               cursorin_s, b2_ref, dcode_ref, p61w_ref,
               out_ref, curout_s, p_scr, r_scr, stf, sti, win_scr,
               dma_sem, p61_scr, dma61_sem, v_scr):
        w = pl.program_id(0)

        # windows stream HBM->VMEM by explicit DMA on a per-(epoch,
        # channel) ring of depth 2: sequence n = w*C + c uses buffer
        # n % 2; the DMA for n+2 is issued right after sequence n's
        # stage 1 finishes reading that buffer (synchronous VPU loads,
        # so program order suffices).  Window VMEM is therefore
        # 2 * n_win bytes *independent of channel count* — the round-1
        # per-(slot, channel) buffering (2*C*n_win) was what pushed
        # B1C's 10 ms epochs and >16-channel B2a over the VMEM budget.
        # The XLA pre-gather alternative cost ~0.11 ms/epoch and
        # materialized a (W, C, n_win) HBM buffer
        # (benchmarks/fused_parts.py).
        # Window starts align to the int8 HBM tile (32 rows x (8,128)
        # packing = 4096 samples); `off` absorbs the remainder.  Unlike
        # XLA's dynamic-slice, a raw DMA does NOT clamp out-of-range
        # starts (it faults the TPU worker), so clamp to the block tail —
        # the driver never tracks past the provided block, this only
        # guards the out-of-data regime.
        r0_max = (NROWS_B2 - R_WIN) // 32 * 32
        N_SEQ = W_TOTAL * C

        def win_r0(w_, c_):
            s_nom = cursor0_s[c_] + w_ * adv_s[c_] - START_GUARD
            r0 = jnp.clip((s_nom >> 12) << 12 >> 7, 0, r0_max)
            return pl.multiple_of(r0, 32)

        def win_dma_n(n_):
            w_ = n_ // C
            c_ = jax.lax.rem(n_, C)
            if cplx:
                # two f32 planes (I, Q) per window, copied in one DMA
                src = b2_ref.at[:, pl.ds(win_r0(w_, c_), R_WIN), :]
            else:
                src = b2_ref.at[pl.ds(win_r0(w_, c_), R_WIN), :]
            return pltpu.make_async_copy(
                src,
                win_scr.at[jax.lax.rem(n_, 2)],
                dma_sem.at[jax.lax.rem(n_, 2)],
            )

        def p61_dma_n(n_):
            # BOC(6,1) Abel weights for sequence n's channel: same depth-2
            # ring protocol as the windows (per-channel ~0.5 MB f32; VMEM
            # cost is channel-count independent)
            c_ = jax.lax.rem(n_, C)
            return pltpu.make_async_copy(
                p61w_ref.at[c_],
                p61_scr.at[jax.lax.rem(n_, 2)],
                dma61_sem.at[jax.lax.rem(n_, 2)],
            )

        # hoisted constants (shared across channels)
        lin = (jax.lax.broadcasted_iota(jnp.int32, (S1R, LANES), 0) * LANES
               + jax.lax.broadcasted_iota(jnp.int32, (S1R, LANES), 1))
        # strictly-upper triangular: x @ U = per-row exclusive lane prefix
        utri = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                < jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
                ).astype(jnp.float32)
        iota_r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        iota_g4 = jax.lax.broadcasted_iota(jnp.int32, (ROWS // 8, 1), 0)
        # prefix() constants: ones column-block for row totals, block
        # strict-lower-triangular (per I/Q half) for exclusive row offsets
        ones8 = jnp.ones((LANES, 8), jnp.float32)
        rr1 = jax.lax.broadcasted_iota(jnp.int32, (S1R, S1R), 0)
        cc1 = jax.lax.broadcasted_iota(jnp.int32, (S1R, S1R), 1)
        tril = (cc1 < rr1).astype(jnp.float32)
        u_i = jax.lax.broadcasted_iota(jnp.int32, (1, BT), 1)
        u_f = u_i.astype(jnp.float32)
        iota_s3 = jax.lax.broadcasted_iota(jnp.int32, (S, NR * BT), 0)
        iota_l3 = jax.lax.broadcasted_iota(jnp.int32, (LANES, NR * BT), 0)
        iota_o = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        if WB:
            u61_i = jax.lax.broadcasted_iota(jnp.int32, (1, BT61), 1)
            u61_f = u61_i.astype(jnp.float32)
            iota_s61 = jax.lax.broadcasted_iota(jnp.int32, (S61, 3 * BT61), 0)
            iota_l61 = jax.lax.broadcasted_iota(
                jnp.int32, (LANES, 3 * BT61), 0)

        @pl.when(w == 0)
        def _():
            for i in range(8):
                for c0 in range(C):
                    stf[c0, i] = statef_s[c0, i]
            for c0 in range(C):
                sti[c0, 0] = cursorin_s[c0]
            win_dma_n(jnp.int32(0)).start()
            if N_SEQ > 1:
                win_dma_n(jnp.int32(1)).start()
            if WB:
                p61_dma_n(jnp.int32(0)).start()
                if N_SEQ > 1:
                    p61_dma_n(jnp.int32(1)).start()

        def one_channel(c, _, pbuf=0):
            # pbuf: ping-pong prefix-scratch buffer (see _geometry's PP
            # note) — a STATIC python int (the pair loop passes ui), so
            # every p_scr/r_scr access keeps a static leading index
            n_seq = w * C + c
            win_dma_n(n_seq).wait()
            if WB:
                p61_dma_n(n_seq).wait()
            rem_code = stf[c, 0]
            rem_cyc = stf[c, 1]
            d_cyc = stf[c, 2]
            d_step = stf[c, 3]
            code_nco = stf[c, 4]
            code_error = stf[c, 5]
            d1_carr = stf[c, 6]
            d2_carr = stf[c, 7]
            cursor = sti[c, 0]

            # window start: must match win_dma exactly
            s_al = win_r0(w, c) << 7
            off = cursor - s_al
            off_f = off.astype(jnp.float32)

            # --- blksize = ceil((L - rem)/step), scan.py:125-131 ---------
            e_rel = d_step / step_base
            corr1 = 1.0 - e_rel + e_rel * e_rel
            resid = q0_frac - (rem_code / step_base
                               + (q0_int_f + q0_frac) * e_rel) * corr1
            delta = jnp.ceil(resid).astype(jnp.int32)
            blksize = cfg.q0_int + delta

            a_base = abase_s[c]
            slope = a_base + d_cyc
            rem_eff = rem_cyc - off_f * slope

            # carrier trig via angle addition: phase(row, lane) =
            # (base + row*128*slope) + (lane*slope), so cos/sin of the
            # full (32, 128) tile come from 32 row + 128 lane
            # transcendentals and two outer products — the per-sample
            # cos/sin chain was ~90% of stage-1 time (the stage1 bisect:
            # 52 ms of a 54 ms block).  mod-1 before multiplying keeps
            # every f32 phase term small (precision >= the old path,
            # whose lin*slope product reached ~560 cycles).
            lane_cyc = jnp.mod(iota_o.astype(jnp.float32) * slope, 1.0)
            step_row = jnp.mod(jnp.float32(LANES) * slope, 1.0)

            # --- stage 1: mix + mask + exclusive prefix into p_scr -------
            # tiles fully outside [off, off+blksize) are all-masked: their
            # prefix rows are just the running totals (skip the trig +
            # matmul; with the 4096-sample window alignment up to ~2 of
            # the T tiles are outside on average)
            def need_mask_of(t):
                # validity masking makes fully-outside tiles contribute
                # exactly the running carry (no per-step cond needed);
                # when t is a python int (unrolled loop), tiles provably
                # inside [off_max, off_min + blksize_min) skip the mask
                # build entirely (the b2 tail is zero-padded, so even
                # the clamped out-of-data regime stays finite).  The
                # upper bound uses q0_int alone (not +START_GUARD):
                # on the first epoch of the first block the minimum-
                # cursor channel can have off = cursor0 < START_GUARD
                # (win_r0 clamps r0 to 0), so the interior window must
                # hold for off as low as 0.
                if isinstance(t, int):
                    return not (t * STEP >= SPLIT + START_GUARD + 1
                                and (t + 1) * STEP <= cfg.q0_int - 8)
                return True

            def mix(t, masked):
                """Carrier mix of step t (S1R rows = S1R/32 SPLIT
                tiles); `masked` (static) selects the edge-step path
                that zeroes samples outside [off, off+blksize) —
                interior steps skip the iota/compare/multiply chain."""
                ring = jax.lax.rem(w * C + c, 2)
                # Two-level angle addition: phase(r, l) with r = 8*r1+r2
                # splits into a WIDE (8, 128) inner factor (r2 rows x
                # lane phases — ONE native-tile cos/sin pair) and a
                # narrow (32, 1) outer factor (8-row group phases,
                # rebased per SPLIT sub-tile from the coarse carr_t
                # table exactly as before).  The previous (S1R, 1) row
                # trig cost ~32 sublane-tile transcendentals per
                # cos/sin — measured HALF of stage-1 time (s1cheaptrig
                # bisect, docs/PERF.md).
                inner_cyc = jnp.mod(
                    iota_r8.astype(jnp.float32) * step_row + lane_cyc, 1.0)
                inner_ang = two_pi * inner_cyc            # (8, 128)
                if bisect == "s1cheaptrig":   # timing probe: same shapes
                    ic = inner_cyc - 0.5      # and dataflow, no cos/sin
                    isn = 0.5 - inner_cyc
                else:
                    ic = jnp.cos(inner_ang)
                    isn = jnp.sin(inner_ang)
                step8 = jnp.mod(jnp.float32(8.0) * step_row, 1.0)
                grp = []
                for si in range(S1R // ROWS):
                    tt = t * (S1R // ROWS) + si
                    base_t = carr_s[c, tt] + rem_eff \
                        + (np.float32(tt * SPLIT) if isinstance(tt, int)
                           else (tt * SPLIT).astype(jnp.float32)) * d_cyc
                    grp.append(jnp.mod(
                        base_t + iota_g4.astype(jnp.float32) * step8, 1.0))
                outer_cyc = jnp.concatenate(grp, axis=0)  # (S1R/8, 1)
                outer_ang = two_pi * outer_cyc
                if bisect == "s1cheaptrig":
                    oc = outer_cyc - 0.5
                    osn = 0.5 - outer_cyc
                else:
                    oc = jnp.cos(outer_ang)
                    osn = jnp.sin(outer_ang)
                oc8 = jnp.repeat(oc, 8, axis=0)           # (S1R, 1)
                os8 = jnp.repeat(osn, 8, axis=0)
                ict = jnp.tile(ic, (S1R // 8, 1))         # (S1R, 128)
                ist = jnp.tile(isn, (S1R // 8, 1))
                cos_f = ict * oc8 - ist * os8             # (S1R, 128)
                sin_f = ist * oc8 + ict * os8
                if masked:
                    gidx = t * STEP + lin
                    mask = ((gidx >= off) & (gidx < off + blksize)
                            ).astype(jnp.float32)
                if cplx:
                    # (I + jQ) * e^{-j theta} (scan.py:145-148)
                    xr = win_scr[ring, 0, pl.ds(t * S1R, S1R), :]
                    xi = win_scr[ring, 1, pl.ds(t * S1R, S1R), :]
                    if masked:
                        xr = xr * mask
                        xi = xi * mask
                    ib = xr * cos_f + xi * sin_f
                    qb = xi * cos_f - xr * sin_f
                else:
                    x = win_scr[ring, pl.ds(t * S1R, S1R), :].astype(
                        jnp.float32)
                    if masked:
                        x = x * mask
                    ib = x * cos_f
                    qb = -(x * sin_f)
                return ib, qb

            def prefix(cin, ib, qb):
                # Everything stays on the MXU/VPU wide paths: the row
                # totals come from a ones-column matmul (a narrow
                # `lexc[:, 127:]` lane slice lowered to slow lane
                # shuffles) and the exclusive row-offset prefix from a
                # strict-lower-triangular matmul (the previous (S1R,1)
                # sublane log-roll pass cost ~1 us/step).  I and Q run
                # as separate (S1R, .) chains — the former
                # concatenate([ib, qb]) built a 256 KB VPU copy per
                # step for no MXU benefit (the block-diagonal trib was
                # two independent triangular matmuls anyway).
                # Carries are lane-replicated (1, 128) rows — a traced
                # scalar carry forces a vector->scalar sync per step.
                # DEFER mode returns the RAW mixed tiles plus per-row
                # exclusive offsets (rofs rows) — the lane-level prefix
                # is folded into stage 2's select matmul.
                ci2, cq2 = cin
                rtot_i = jnp.dot(ib, ones8,
                                 preferred_element_type=jnp.float32)
                rtot_q = jnp.dot(qb, ones8,
                                 preferred_element_type=jnp.float32)
                # one K=256 triangular matmul for BOTH I and Q (these
                # narrow-N matmuls are K-latency-bound, so halving
                # their count beats their tiny-N utilization)
                rt2 = jnp.concatenate([rtot_i, rtot_q], axis=1)  # (S1R, 16)
                rofs2 = jnp.dot(tril, rt2,
                                preferred_element_type=jnp.float32)
                rofs_i = rofs2[:, 0:8]
                rofs_q = rofs2[:, 8:16]
                zl = jnp.zeros((1, LANES), jnp.float32)
                ti = (rofs_i[S1R - 1:S1R, 0:1]
                      + rtot_i[S1R - 1:S1R, 0:1]) + zl    # (1, 128)
                tq = (rofs_q[S1R - 1:S1R, 0:1]
                      + rtot_q[S1R - 1:S1R, 0:1]) + zl
                if DEFER:
                    return (ib, qb,
                            rofs_i + ci2[:, 0:8],
                            rofs_q + cq2[:, 0:8],
                            ci2 + ti, cq2 + tq)
                lexc_i = dot_fast(ib, utri)
                lexc_q = dot_fast(qb, utri)
                return (lexc_i + (rofs_i[:, 0:1] + ci2),
                        lexc_q + (rofs_q[:, 0:1] + cq2),
                        None, None, ci2 + ti, cq2 + tq)

            def s1_inputs(t):
                """Mix (or the bisect-debug window load) for step t."""
                if bisect in ("s1loadonly", "s1nomix", "s1negq"):
                    ring = jax.lax.rem(w * C + c, 2)
                    if cplx:
                        return (win_scr[ring, 0, pl.ds(t * S1R, S1R), :],) * 2
                    x = win_scr[ring, pl.ds(t * S1R, S1R), :].astype(
                        jnp.float32)
                    if bisect == "s1negq":   # distinct-but-cheap I/Q
                        return x, -x
                    return x, x
                return mix(t, need_mask_of(t))

            def s1_finish(t, cin, mp):
                """Prefix + store of step t given its mixed tiles."""
                ib, qb = mp
                ri_r = rq_r = None
                if bisect == "s1loadonly":
                    tile_i, tile_q, ci_n, cq_n = \
                        ib, qb, cin[0] + ib[0:1, :], cin[1]
                elif bisect == "s1noprefix":
                    tile_i, tile_q, ci_n, cq_n = \
                        ib, qb, cin[0] + ib[0:1, :], cin[1] + qb[0:1, :]
                else:
                    tile_i, tile_q, ri_r, rq_r, ci_n, cq_n = \
                        prefix(cin, ib, qb)
                if bisect != "s1nostore":
                    p_scr[pbuf, pl.ds(t * S1R, S1R), 0:128] = \
                        tile_i.astype(PDT)
                    p_scr[pbuf, pl.ds(t * S1R, S1R), 128:256] = \
                        tile_q.astype(PDT)
                    if DEFER and ri_r is not None:
                        r_scr[pbuf, pl.ds(t * S1R, S1R), 0:8] = ri_r
                        r_scr[pbuf, pl.ds(t * S1R, S1R), 8:16] = rq_r
                return ci_n, cq_n

            def stage1(t, carry):
                return s1_finish(t, carry, s1_inputs(t))

            # measured: stage1 full unroll does not change runtime but
            # multiplies compile time (benchmarks/unroll_sweep.py)
            t1 = 1 if bisect in ("nostage1", "none") else T
            # default: full python unroll for small T (static store
            # offsets + static interior-tile masking), rolled loop for
            # long B1C windows where unroll would blow up compile time
            u1 = int(os.environ.get("FUSED_UNROLL_S1", "0" if T <= 8 else "1"))
            zc = jnp.zeros((1, LANES), jnp.float32)
            if u1 == 0 or u1 >= t1:
                # software-pipelined trace order: step t+1's (VPU-bound)
                # mix is emitted before step t's (MXU-bound) prefix so
                # the scheduler can overlap the units
                carry = (zc, zc)
                mp = s1_inputs(0) if t1 > 0 else None
                for t_py in range(t1):
                    nxt = s1_inputs(t_py + 1) if t_py + 1 < t1 else None
                    carry = s1_finish(t_py, carry, mp)
                    mp = nxt
                tot_i, tot_q = carry
            else:
                tot_i, tot_q = jax.lax.fori_loop(
                    0, t1, stage1, (zc, zc), unroll=min(u1, t1))
            # P[n_win] lives at (row R, lane 0); rows >= R must be finite
            # (0-weight x NaN would poison the row-select matmul).
            # DEFER: tail raw samples are zero and the row offsets carry
            # the block totals, so P[j >= n_win] = total exactly.
            if DEFER:
                p_scr[pbuf, pl.ds(R, RP - R), :] = jnp.zeros(
                    (RP - R, 256), PDT)
                r_scr[pbuf, pl.ds(R, RP - R), 0:8] = jnp.broadcast_to(
                    tot_i[:, 0:8], (RP - R, 8))
                r_scr[pbuf, pl.ds(R, RP - R), 8:16] = jnp.broadcast_to(
                    tot_q[:, 0:8], (RP - R, 8))
            else:
                p_scr[pbuf, pl.ds(R, RP - R), 0:128] = jnp.broadcast_to(
                    tot_i, (RP - R, 128)).astype(PDT)
                p_scr[pbuf, pl.ds(R, RP - R), 128:256] = jnp.broadcast_to(
                    tot_q, (RP - R, 128)).astype(PDT)

            # stage 1 was this sequence's last read of its window buffer;
            # start refilling it with sequence n+2's window (the VPU loads
            # above are synchronous, so program order is a real barrier)
            @pl.when(n_seq + 2 < N_SEQ)
            def _():
                win_dma_n(n_seq + 2).start()

            # --- stage 2: boundary lookups + correlator dots -------------
            smm = sbm + d_step * m
            inv = 1.0 / smm
            dinv = inv - jnp.float32(inv0_int) - inv0_frac_f
            # per-channel hoists: g(kt, u) = g0(kt) + u*(inv0_frac+dinv)
            # — the u-ramp factor is tile-independent, so the per-tile
            # vector chain shrinks to add/floor/add/add (the rest rides
            # the scalar unit)
            u_fr = u_f * (inv0_frac_f + dinv)             # (1, BT)
            u_int = u_i * inv0_int                        # static

            # one iteration = one BT-boundary tile x NR ramps batched as
            # NR*BT one-hot columns through one matmul.  3-ramp mode: one
            # ramp per E/P/L tap.  Half-grid mode (see _geometry): ramps
            # are (prompt, early) and the late tap reuses the early
            # ramp's lookups against weights host-shifted by one slot.
            ramp_offs = (0.0, -spc) if HALF else (-spc, 0.0, spc)

            def stage2(kt, acc):
                ki0 = kt * BT - CODE_PAD
                ki0_f = ki0.astype(jnp.float32)
                tbf = tbfrac_s[kt]
                tbi = tbint_s[kt]
                jbase = ki0 * inv0_int + tbi + 1 + off

                j_parts, j0s = [], []
                for r_off in ramp_offs:
                    base = rem_code + r_off
                    bmi = (base * m) * inv
                    g0 = tbf + ki0_f * dinv - bmi          # scalar
                    j0s.append(jbase + jnp.floor(g0).astype(jnp.int32))
                    g = g0 + u_fr
                    j_parts.append((u_int + jbase)
                                   + jnp.floor(g).astype(jnp.int32))
                j0 = jnp.clip(jnp.minimum(j0s[0], j0s[-1]), 0, n_win)
                if ROW_ALIGN > 1:
                    q0a = pl.multiple_of(
                        ((j0 >> 7) // ROW_ALIGN) * ROW_ALIGN, ROW_ALIGN)
                else:
                    q0a = j0 >> 7
                j3 = jnp.clip(jnp.concatenate(j_parts, axis=1), 0, n_win)
                row_rel = (j3 >> 7) - q0a                       # (1, NR*BT)
                lane = j3 & 127

                # (row, lane) select, lane first: the lane select matmul
                # contracts over 128 lanes (full MXU pipe; the round-1
                # row-first order contracted over S=32 rows, <=25%
                # utilization), then the row select is a cheap (S, NR*BT)
                # mask-reduce on the VPU.  DEFER mode: p_scr holds RAW
                # mixed samples, so the select mask is the strict `<`
                # lane prefix and the per-row exclusive offsets (r_scr)
                # are broadcast-added before the row reduce.
                sel = (iota_l3 < lane) if DEFER else (iota_l3 == lane)
                lane_oh = sel.astype(PDT)                # (128, NR*BT)
                if bisect == "s2idxonly":
                    # bisect probe: index math + weight accumulate only
                    vi = row_rel.astype(jnp.float32) + lane.astype(
                        jnp.float32)
                    vq = vi + 1.0
                else:
                    sl = p_scr[pbuf, pl.ds(q0a, S), :]           # (S, 256)
                    if bisect == "s2nosel":
                        # bisect probe: skip the two select matmuls
                        tmp_i = jnp.broadcast_to(sl[:, 0:1],
                                                 (S, NR * BT)) * 1.0
                        tmp_q = jnp.broadcast_to(sl[:, 128:129],
                                                 (S, NR * BT)) * 1.0
                    else:
                        tmp_i = dot_fast(sl[:, 0:128], lane_oh)
                        tmp_q = dot_fast(sl[:, 128:256], lane_oh)
                    if DEFER:
                        rof = r_scr[pbuf, pl.ds(q0a, S), :]      # (S, 16)
                        tmp_i = tmp_i + rof[:, 0:1]
                        tmp_q = tmp_q + rof[:, 8:9]
                    if bisect == "s2norowm":
                        # bisect probe: skip the row compare+mask
                        vi = jnp.sum(tmp_i, axis=0, keepdims=True)
                        vq = jnp.sum(tmp_q, axis=0, keepdims=True)
                    else:
                        row_m = (iota_s3 == row_rel).astype(
                            jnp.float32)                     # (S, NR*BT)
                        vi = jnp.sum(tmp_i * row_m, axis=0, keepdims=True)
                        vq = jnp.sum(tmp_q * row_m, axis=0, keepdims=True)

                if VST:
                    # defer the weight contraction: park this tile's
                    # select results; the bulk (TK, NR*BT) weighted
                    # reduce runs once per channel after the loop
                    v_scr[0, pl.ds(kt, 1), :] = vi
                    v_scr[1, pl.ds(kt, 1), :] = vq
                    return acc
                wd = dcode_ref[c, 0, pl.ds(kt, 1), :]           # (1, BT)
                if use_pilot:
                    wp = dcode_ref[c, 1, pl.ds(kt, 1), :]
                cont = []
                if HALF:
                    pr = slice(0, BT)                 # prompt ramp values
                    er = slice(BT, 2 * BT)            # early ramp values
                    wds = dcode_ref[c, 2, pl.ds(kt, 1), :]  # w shifted by 1
                    if use_pilot:
                        wps = dcode_ref[c, 3, pl.ds(kt, 1), :]
                    # tap-major (E, P, L) to match the unpack below.
                    # contributions accumulate as (1, BT) vectors — the
                    # lane reduction to a scalar happens ONCE per channel
                    # after the tile loop (a per-tile jnp.sum forced a
                    # vector->scalar sync every iteration)
                    tap_w = [(wd, er), (wd, pr), (wds, er)]
                    tap_wp = ([(wp, er), (wp, pr), (wps, er)]
                              if use_pilot else [None] * 3)
                    for (w_t, seg), pw in zip(tap_w, tap_wp):
                        cont += [w_t * vi[:, seg], w_t * vq[:, seg]]
                        if use_pilot:
                            cont += [pw[0] * vi[:, seg],
                                     pw[0] * vq[:, seg]]
                else:
                    for d_idx in range(3):
                        seg = slice(d_idx * BT, (d_idx + 1) * BT)
                        cont += [wd * vi[:, seg], wd * vq[:, seg]]
                        if use_pilot:
                            cont += [wp * vi[:, seg], wp * vq[:, seg]]
                return tuple(a + cn for a, cn in zip(acc, cont))

            nper = 4 if use_pilot else 2
            zv = jnp.zeros((1, BT), jnp.float32)
            acc0 = tuple(zv for _ in range(3 * nper))
            skip_s2 = bisect in ("nostage2", "none") or bisect.startswith("s1")
            n_s2 = 0 if skip_s2 else TK

            def stage2_group(g, acc):
                for ui in range(S2G):
                    acc = stage2(g * S2G + ui, acc)
                return acc

            acc = jax.lax.fori_loop(0, n_s2 // S2G, stage2_group, acc0,
                                    unroll=1)
            if skip_s2:
                acc = tuple(a + tot_i[:, 0:1] for a in acc)
            o = {}
            tapn = ("e", "p", "l")
            if VST and not skip_s2:
                # bulk weighted contraction over the parked (TK, NR*BT)
                # select results: full-sublane elementwise + reduce,
                # one pass per (tap, plane, I/Q)
                vi_all = v_scr[0]                          # (TK, NR*BT)
                vq_all = v_scr[1]
                if HALF:
                    pr = slice(0, BT)
                    er = slice(BT, 2 * BT)
                    planes = [("d", 0)] + ([("p11", 1)] if use_pilot
                                           else [])
                    for name, pidx in planes:
                        w_t = dcode_ref[c, pidx]           # (TK, BT)
                        ws = dcode_ref[c, pidx + 2]        # shifted
                        o[f"{name}_ie"] = jnp.sum(w_t * vi_all[:, er])
                        o[f"{name}_qe"] = jnp.sum(w_t * vq_all[:, er])
                        o[f"{name}_ip"] = jnp.sum(w_t * vi_all[:, pr])
                        o[f"{name}_qp"] = jnp.sum(w_t * vq_all[:, pr])
                        o[f"{name}_il"] = jnp.sum(ws * vi_all[:, er])
                        o[f"{name}_ql"] = jnp.sum(ws * vq_all[:, er])
                else:
                    planes = [("d", 0)] + ([("p11", 1)] if use_pilot
                                           else [])
                    for name, pidx in planes:
                        w_t = dcode_ref[c, pidx]           # (TK, BT)
                        for t_i, x in enumerate(tapn):
                            seg = slice(t_i * BT, (t_i + 1) * BT)
                            o[f"{name}_i{x}"] = jnp.sum(
                                w_t * vi_all[:, seg])
                            o[f"{name}_q{x}"] = jnp.sum(
                                w_t * vq_all[:, seg])
                if not use_pilot:
                    for x in tapn:
                        o[f"p11_i{x}"] = o[f"d_i{x}"] * 0.0
                        o[f"p11_q{x}"] = o[f"d_q{x}"] * 0.0
            else:
                # unpack: [early(d_i,d_q[,p_i,p_q]), prompt(...),
                # late(...)]; the (1, BT) vector accumulators reduce to
                # scalars here — the only vector->scalar sync of the
                # whole channel
                for t_i in range(3):
                    o[f"d_i{tapn[t_i]}"] = jnp.sum(acc[t_i * nper + 0])
                    o[f"d_q{tapn[t_i]}"] = jnp.sum(acc[t_i * nper + 1])
                    if use_pilot:
                        o[f"p11_i{tapn[t_i]}"] = jnp.sum(
                            acc[t_i * nper + 2])
                        o[f"p11_q{tapn[t_i]}"] = jnp.sum(
                            acc[t_i * nper + 3])

            if WB:
                # --- stage 2b: BOC(6,1) pilot boundary family -------------
                # same prefix scratch, m=12 boundary grid, 3 E/P/L ramps;
                # weights from this sequence's p61 ring buffer
                # (WB_tracking.m:348-381's third correlator bank)
                smm61 = sbm61 + d_step * m61
                inv61 = 1.0 / smm61
                dinv61 = inv61 - jnp.float32(inv61_int) - inv61_frac_f
                ring61 = jax.lax.rem(n_seq, 2)
                u61_fr = u61_f * (inv61_frac_f + dinv61)   # (1, BT61)
                u61_int = u61_i * inv61_int                # static

                def stage2_61(kt, acc61):
                    ki0 = kt * BT61 - CODE_PAD
                    ki0_f = ki0.astype(jnp.float32)
                    tbf = tb61frac_s[kt]
                    tbi = tb61int_s[kt]
                    jbase = ki0 * inv61_int + tbi + 1 + off

                    j_parts, j0s = [], []
                    for r_off in (-spc61, 0.0, spc61):
                        base = rem_code + r_off
                        bmi = (base * m61) * inv61
                        g0 = tbf + ki0_f * dinv61 - bmi    # scalar
                        j0s.append(jbase + jnp.floor(g0).astype(jnp.int32))
                        g = g0 + u61_fr
                        j_parts.append((u61_int + jbase)
                                       + jnp.floor(g).astype(jnp.int32))
                    j0 = jnp.clip(jnp.minimum(j0s[0], j0s[-1]), 0, n_win)
                    if ROW_ALIGN > 1:
                        q0a = pl.multiple_of(
                            ((j0 >> 7) // ROW_ALIGN) * ROW_ALIGN, ROW_ALIGN)
                    else:
                        q0a = j0 >> 7
                    j3 = jnp.clip(jnp.concatenate(j_parts, axis=1), 0, n_win)
                    row_rel = (j3 >> 7) - q0a                  # (1, 3*BT)
                    lane = j3 & 127

                    sel61 = ((iota_l61 < lane) if DEFER
                             else (iota_l61 == lane))
                    lane_oh = sel61.astype(PDT)
                    sl = p_scr[pbuf, pl.ds(q0a, S61), :]       # (S61, 256)
                    tmp_i = dot_fast(sl[:, 0:128], lane_oh)
                    tmp_q = dot_fast(sl[:, 128:256], lane_oh)
                    row_m = (iota_s61 == row_rel).astype(jnp.float32)
                    if DEFER:
                        rof = r_scr[pbuf, pl.ds(q0a, S61), :]  # (S61, 16)
                        tmp_i = tmp_i + rof[:, 0:1]
                        tmp_q = tmp_q + rof[:, 8:9]
                    vi = jnp.sum(tmp_i * row_m, axis=0, keepdims=True)
                    vq = jnp.sum(tmp_q * row_m, axis=0, keepdims=True)

                    w61 = p61_scr[ring61, pl.ds(kt, 1), :]     # (1, BT61)
                    cont = []
                    for d_idx in range(3):
                        seg = slice(d_idx * BT61, (d_idx + 1) * BT61)
                        cont += [w61 * vi[:, seg], w61 * vq[:, seg]]
                    return tuple(a + cn for a, cn in zip(acc61, cont))

                def stage2_61_group(g, acc61):
                    for ui in range(S2G61):
                        acc61 = stage2_61(g * S2G61 + ui, acc61)
                    return acc61

                n_s61 = 0 if skip_s2 else TK61
                zv61 = jnp.zeros((1, BT61), jnp.float32)
                acc61 = jax.lax.fori_loop(
                    0, n_s61 // S2G61, stage2_61_group,
                    tuple(zv61 for _ in range(6)), unroll=1)
                for t_i in range(3):
                    o[f"p61_i{tapn[t_i]}"] = jnp.sum(acc61[t_i * 2 + 0])
                    o[f"p61_q{tapn[t_i]}"] = jnp.sum(acc61[t_i * 2 + 1])

                # stage 2b was the last read of this sequence's p61 ring
                # buffer; refill it with sequence n+2's weights
                @pl.when(n_seq + 2 < N_SEQ)
                def _():
                    p61_dma_n(n_seq + 2).start()

            # --- discriminators (scan.py:211-249) -------------------------
            def eml(ie, qe, il, ql):
                e = jnp.sqrt(ie * ie + qe * qe)
                l = jnp.sqrt(il * il + ql * ql)
                return (e - l) / (e + l)

            carr_d = atan_poly(o["d_qp"] / o["d_ip"]) * inv2pi
            code_d = eml(o["d_ie"], o["d_qe"], o["d_il"], o["d_ql"])
            if is_b1c:
                code_d = code_d * (1.0 - spc)
            if not use_pilot:
                carr_err, code_err = carr_d, code_d
            elif WB:
                # QMBOC composite pilot (scan.py:239-249,
                # WB_tracking.m:374-396,414-419)
                from bds3_tpu.track.scan import W11, W61

                w11f, w61f = np.float32(W11), np.float32(W61)
                for x in tapn:
                    o[f"p_i{x}"] = (-w61f * o[f"p61_i{x}"]
                                    + w11f * o[f"p11_q{x}"])
                    o[f"p_q{x}"] = (-w61f * o[f"p61_q{x}"]
                                    - w11f * o[f"p11_i{x}"])
                carr_p = atan_poly(o["p_qp"] / o["p_ip"]) * inv2pi
                carr_err = (carr_d + 3.0 * carr_p) / 4.0
                if cfg.wb_code_blend == "nb":
                    # NB-style 11/29 code DLL, composite carrier kept
                    # (scan.py's wb_code_blend note)
                    code_p11 = eml(o["p11_ie"], o["p11_qe"],
                                   o["p11_il"], o["p11_ql"]) * (1.0 - spc)
                    code_err = (code_d * 11.0 + code_p11 * 29.0) / 40.0
                elif cfg.wb_code_blend == "split":
                    # per-component envelopes, slope-normalized 0.3/0.7
                    # blend with the BOC(6,1) bank at spc61 (scan.py
                    # "split" note)
                    g61 = np.float32(
                        3.0 * (1.0 - spc) * (1.0 - 23.0 * spc61)
                        / (23.0 * (1.0 - 3.0 * spc)))
                    code_p11 = eml(o["p11_ie"], o["p11_qe"],
                                   o["p11_il"], o["p11_ql"]) * (1.0 - spc)
                    code_p61 = eml(o["p61_ie"], o["p61_qe"],
                                   o["p61_il"], o["p61_ql"]) * g61
                    code_p = 0.3 * code_p11 + 0.7 * code_p61
                    code_err = code_d * dllf + code_p * (1.0 - dllf)
                elif cfg.wb_code_blend == "dotprod":
                    # coherent normalized dot-product on the composite
                    # (scan.py "dotprod" note)
                    dp_num = (o["p_ie"] - o["p_il"]) * o["p_ip"] \
                        + (o["p_qe"] - o["p_ql"]) * o["p_qp"]
                    dp_den = o["p_ip"] ** 2 + o["p_qp"] ** 2
                    code_p = 0.25 * dp_num / dp_den * (1.0 - spc)
                    code_err = code_d * dllf + code_p * (1.0 - dllf)
                else:
                    code_p = eml(o["p_ie"], o["p_qe"],
                                 o["p_il"], o["p_ql"]) * (1.0 - spc)
                    code_err = code_d * dllf + code_p * (1.0 - dllf)
            else:
                carr_p = atan_poly(-o["p11_ip"] / o["p11_qp"]) * inv2pi
                code_p = eml(o["p11_ie"], o["p11_qe"],
                             o["p11_il"], o["p11_ql"])
                if is_b1c:
                    code_p = code_p * (1.0 - spc)
                    carr_err = (carr_d * 11.0 + carr_p * 29.0) / 40.0
                    code_err = (code_d * 11.0 + code_p * 29.0) / 40.0
                else:
                    carr_err = 0.5 * (carr_d + carr_p)
                    code_err = 0.5 * (code_d + code_p)

            # --- loop filters + remainders (scan.py:251-273) --------------
            d2_new = d2_carr + carr_err * jnp.float32(cfg.pf3)
            d1_new = d2_new + carr_err * jnp.float32(cfg.pf2) + d1_carr
            carr_nco = d1_new + carr_err * jnp.float32(cfg.pf1)
            d_cyc_new = carr_nco / jnp.float32(cfg.fs)

            code_nco_new = code_nco \
                + jnp.float32(cfg.tau2 / cfg.tau1) * (code_err - code_error) \
                + code_err * jnp.float32(cfg.int_time / cfg.tau1)
            d_step_new = dstep0_s[c] - code_nco_new / jnp.float32(cfg.fs)

            delta_f = delta.astype(jnp.float32)
            blk_f = blksize.astype(jnp.float32)
            rem_cyc_new = jnp.mod(
                rem_cyc + q0cyc_s[c] + delta_f * a_base + blk_f * d_cyc, 1.0)
            rem_code_new = rem_code + q0_step_minus_l \
                + delta_f * step_base + blk_f * d_step

            stf[c, 0] = rem_code_new
            stf[c, 1] = rem_cyc_new
            stf[c, 2] = d_cyc_new
            stf[c, 3] = d_step_new
            stf[c, 4] = code_nco_new
            stf[c, 5] = code_err
            stf[c, 6] = d1_new
            stf[c, 7] = d2_new
            sti[c, 0] = cursor + blksize
            curout_s[c] = cursor + blksize

            o.update(
                carr_err=carr_err, code_err=code_err,
                carr_nco=carr_nco, code_nco=code_nco_new,
                d_cyc=d_cyc, d_step=d_step,
                rem_code_phase=rem_code, rem_carr_cyc=rem_cyc,
                blksize=blk_f,
                st_rem_code=rem_code_new, st_rem_cyc=rem_cyc_new,
                st_d_cyc=d_cyc_new, st_d_step=d_step_new,
                st_code_nco=code_nco_new, st_code_err=code_err,
                st_d1=d1_new, st_d2=d2_new,
            )
            row = jnp.zeros((1, LANES), jnp.float32)
            for idx, name in enumerate(slots):
                row = row + jnp.where(iota_o == idx, o[name], 0.0)
            out_ref[0, c] = jnp.broadcast_to(row, (8, LANES))
            return 0

        # Channel-pair manual unroll (Mosaic's fori_loop supports only
        # unroll=1 or full): when ping-pong scratches remove the p_scr
        # hazard, tracing PP channels per iteration lets Mosaic overlap
        # channel c's MXU-heavy stage 2 with channel c+1's VPU-heavy
        # stage 1.
        full_unroll = os.environ.get("FUSED_UNROLL_CH") == "1"
        if full_unroll:
            jax.lax.fori_loop(0, C, one_channel, 0, unroll=True)
        elif PP > 1 and C % PP == 0:
            def channel_group(g, _):
                for ui in range(PP):
                    one_channel(g * PP + ui, 0, pbuf=ui)
                return 0

            jax.lax.fori_loop(0, C // PP, channel_group, 0, unroll=1)
        else:
            jax.lax.fori_loop(0, C, one_channel, 0, unroll=1)

    return kernel


def fused_track_block(cfg, block, data_tables, pilot11_tables,
                      consts, state, pilot61_tables=None, interpret=None):
    """Drop-in replacement for the scan path: returns
    (new ChannelState, outputs dict of (W, C) float32 arrays).

    block: (B,) int8/float32 real samples.
    data_tables/pilot11_tables: (C, lm + 2*CODE_PAD) circularly padded
    chips (track.driver.channel_code_tables layout).
    pilot61_tables: (C, lm61 + 2*CODE_PAD) BOC(6,1) chips for B1C
    wideband configs (ignored otherwise).
    """
    if interpret is None:
        # device platform, not default_backend(): backend *names* vary
        # under plugin/relay platforms (e.g. 'axon') while the device
        # platform is still 'tpu'
        interpret = jax.devices()[0].platform != "tpu"
    geo = _geometry(cfg)
    slots = _out_slots(cfg)
    if len(slots) > LANES:
        raise ValueError("too many output slots for one lane row")

    C = data_tables.shape[0]
    W = cfg.epochs_per_block
    tb_int, tb_frac = _boundary_tile_tables(geo["TK"], geo["inv0_frac"],
                                            geo["BT"])
    tb61_int, tb61_frac = _boundary_tile_tables(geo["TK61"],
                                                geo["inv61_frac"],
                                                geo["BT61"])

    # Abel-summation weights: w_v = ext_{v-1} - ext_v over the padded
    # chip table (zeros outside), padded to TK*BT boundary slots.
    def dcode_of(tab, kb=None, kp=None):
        kb = geo["kb"] if kb is None else kb
        kp = geo["kp"] if kp is None else kp
        ext = tab.astype(jnp.float32)                     # (C, lm+2*PAD)
        z = jnp.zeros((C, 1), jnp.float32)
        wv = jnp.concatenate([z, ext], axis=1) \
            - jnp.concatenate([ext, z], axis=1)           # (C, kb)
        return jnp.pad(wv, ((0, 0), (0, kp - kb)))

    wd = dcode_of(data_tables)
    wp = (dcode_of(pilot11_tables) if cfg.use_pilot
          else jnp.zeros((C, geo["kp"]), jnp.float32))
    if geo["m61"]:
        w61 = dcode_of(pilot61_tables, geo["kb61"], geo["kp61"]).reshape(
            C, geo["TK61"], geo["BT61"])
    else:
        # 1-tile dummies keep the kernel signature uniform; the non-WB
        # kernel never touches them
        w61 = jnp.zeros((C, 1, geo["BT61"]), jnp.float32)
    planes = [wd, wp]
    if geo["half_grid"]:
        # late-tap weights shifted one slot (w_shift[b] = w[b+1]); the
        # last slot reads past kb where the pad is zero
        shift1 = lambda w: jnp.pad(w[:, 1:], ((0, 0), (0, 1)))
        planes += [shift1(wd), shift1(wp)]
    n_planes = len(planes)
    dcode = jnp.stack(planes, axis=1).reshape(C, n_planes, geo["TK"],
                                              geo["BT"])

    cursor0 = jnp.asarray(state.cursor, jnp.int32)
    adv_int = jnp.asarray(consts.adv_int, jnp.int32)

    # the kernel DMAs its own 4096-sample-aligned epoch windows from the
    # raw block rows (see win_dma_n); tail pad so the slice never runs
    # off the end of the array
    r_win = geo["n_win"] // LANES
    pad = (-block.shape[0]) % LANES + geo["n_win"] + SPLIT
    if cfg.complex_input:
        # complex64 -> two f32 planes (I, Q); the window ring then holds
        # f32 planes and stage 1 mixes both components
        planes2 = jnp.stack([jnp.real(block), jnp.imag(block)])
        b2 = jnp.pad(planes2, ((0, 0), (0, pad))).reshape(2, -1, LANES)
        nrows_b2 = int(b2.shape[1])
    else:
        b2 = jnp.pad(block, (0, pad)).reshape(-1, LANES)
        nrows_b2 = int(b2.shape[0])

    statef = jnp.stack([
        jnp.asarray(state.rem_code_phase, jnp.float32),
        jnp.asarray(state.rem_carr_cyc, jnp.float32),
        jnp.asarray(state.d_cyc, jnp.float32),
        jnp.asarray(state.d_step, jnp.float32),
        jnp.asarray(state.code_nco, jnp.float32),
        jnp.asarray(state.code_error, jnp.float32),
        jnp.asarray(state.d1_carr, jnp.float32),
        jnp.asarray(state.d2_carr, jnp.float32),
    ], axis=1)                                            # (C, 8)

    kernel = _make_kernel(cfg, geo, C, nrows_b2)

    # geo['n_win'] can exceed cfg.n_win (rounded up to whole S1R steps);
    # the kernel reads carr_s[c, tt] for tt < n_win/SPLIT, so pad the
    # coarse phase table with edge values (pad sub-tiles are fully
    # masked, any finite value is correct)
    carr_t = jnp.asarray(consts.carr_t, jnp.float32)
    k_need = geo["n_win"] // SPLIT
    if carr_t.shape[1] < k_need:
        carr_t = jnp.pad(carr_t, ((0, 0), (0, k_need - carr_t.shape[1])),
                         mode="edge")

    out4, cur_out = pl.pallas_call(
        kernel,
        grid=(W,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # cursor0 (C,)
            pl.BlockSpec(memory_space=pltpu.SMEM),        # adv (C,)
            pl.BlockSpec(memory_space=pltpu.SMEM),        # carr_t (C, kmax)
            pl.BlockSpec(memory_space=pltpu.SMEM),        # a_base (C,)
            pl.BlockSpec(memory_space=pltpu.SMEM),        # q0_cyc (C,)
            pl.BlockSpec(memory_space=pltpu.SMEM),        # init_dstep (C,)
            pl.BlockSpec(memory_space=pltpu.SMEM),        # tb_int (TK,)
            pl.BlockSpec(memory_space=pltpu.SMEM),        # tb_frac (TK,)
            pl.BlockSpec(memory_space=pltpu.SMEM),        # tb61_int
            pl.BlockSpec(memory_space=pltpu.SMEM),        # tb61_frac
            pl.BlockSpec(memory_space=pltpu.SMEM),        # statef (C, 8)
            pl.BlockSpec(memory_space=pltpu.SMEM),        # cursor (C,)
            pl.BlockSpec(memory_space=pltpu.HBM),         # raw block rows
            pl.BlockSpec((C, n_planes, geo["TK"], geo["BT"]),
                         lambda wi: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # dcode
            pl.BlockSpec(memory_space=pltpu.HBM),         # p61 weights
        ],
        out_specs=[
            pl.BlockSpec((1, C, 8, LANES),
                         lambda wi: (wi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((W, C, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((C,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((geo["PP"], geo["RP"], 256),
                       jnp.bfloat16 if geo["PSCR_BF16"] else jnp.float32),
            pltpu.VMEM((geo["PP"], geo["RP"] if geo["DEFER"] else 8, 16),
                       jnp.float32),                       # row offsets
            pltpu.SMEM((C, 10), jnp.float32),
            pltpu.SMEM((C, 2), jnp.int32),
            (pltpu.VMEM((2, 2, r_win, LANES), jnp.float32)
             if cfg.complex_input else
             pltpu.VMEM((2, r_win, LANES), b2.dtype)),    # window ring
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, max(geo["TK61"], 1), geo["BT61"]),
                       jnp.float32),                      # p61 weight ring
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM(((2, geo["TK"], geo["n_ramps"] * geo["BT"])
                        if geo["VST"] else (2, 8, 128)),
                       jnp.float32),                      # v-store scratch
        ],
        interpret=interpret,
    )(cursor0, adv_int,
      carr_t,
      jnp.asarray(consts.a_base, jnp.float32),
      jnp.asarray(consts.q0_cyc, jnp.float32),
      jnp.asarray(consts.init_dstep, jnp.float32),
      jnp.asarray(tb_int), jnp.asarray(tb_frac),
      jnp.asarray(tb61_int), jnp.asarray(tb61_frac),
      statef, cursor0, b2, dcode, w61)

    rows = out4[:, :, 0, :]                               # (W, C, LANES)
    from bds3_tpu.track.scan import output_names

    names = output_names(cfg)
    outs = {k: rows[:, :, i] for i, k in enumerate(names)}
    st = rows[W - 1, :, len(names):len(names) + 8]        # (C, 8)
    new_state = ChannelState(
        cursor=cur_out,
        rem_code_phase=st[:, 0], rem_carr_cyc=st[:, 1],
        d_cyc=st[:, 2], d_step=st[:, 3],
        code_nco=st[:, 4], code_error=st[:, 5],
        d1_carr=st[:, 6], d2_carr=st[:, 7],
    )
    return new_state, outs

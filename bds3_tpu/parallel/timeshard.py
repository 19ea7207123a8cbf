"""Time-axis sharding of acquisition: non-coherent PCPS accumulation over
many code periods, with the IF stream sharded across devices and the
correlation window's tail fetched from the right-hand neighbor via
`ppermute` (the overlap-save halo exchange of SURVEY.md section 2.5).

This extends the reference receiver, whose only non-coherent accumulation
is the 15-round B2a *fine* search (`BDS-3_B2a/acquisition.m:292-322`):
here the full (Doppler x code-phase) search itself integrates
non-coherently across K = rounds_per_device * n_devices code periods,
giving cold-start sensitivity for weak signals while each device touches
only its resident slice of the sample stream.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from bds3_tpu.acquire.pcps import AcqConfig, _code_spectra, make_acq_config
from bds3_tpu.config import Settings
from bds3_tpu.utils.phase import carrier_table, phase_tables


def _local_noncoh(local, d8, p8, a_bins, c1_bins, *, cfg: AcqConfig,
                  rounds: int, axis: str, n_dev: int):
    """Per-device worker: halo exchange + local non-coherent cube + psum."""
    seg = local.shape[0]
    halo_len = cfg.n_fft - cfg.samples_per_code
    # fetch the start of the right neighbor's segment (wraps at the end;
    # wrapped rounds are masked out below)
    perm = [((d + 1) % n_dev, d) for d in range(n_dev)]
    halo = jax.lax.ppermute(local[:halo_len], axis, perm)
    ext = jnp.concatenate([local, halo])

    dev = jax.lax.axis_index(axis)
    n_mask = math.ceil(halo_len / cfg.samples_per_code)

    spec_d = _code_spectra(d8, cfg.n_fft, cfg.n_coh)   # (P, n_fft)
    spec_p = _code_spectra(p8, cfg.n_fft, cfg.n_coh)
    carr = carrier_table(a_bins, c1_bins, cfg.n_fft)   # (B, n_fft)

    def round_step(acc, r):
        win = jax.lax.dynamic_slice(
            ext, (r * cfg.samples_per_code,), (cfg.n_fft,)
        ).astype(jnp.float32)
        mixed = jnp.fft.fft(carr * win[None, :], axis=-1)      # (B, N)
        corr_d = jnp.abs(jnp.fft.ifft(
            mixed[None] * spec_d[:, None, :], axis=-1))[:, :, : cfg.n_search]
        corr_p = jnp.abs(jnp.fft.ifft(
            mixed[None] * spec_p[:, None, :], axis=-1))[:, :, : cfg.n_search]
        # rounds whose window crosses into the wrapped halo on the last
        # device contribute nothing
        valid = jnp.where(
            (dev == n_dev - 1) & (r >= rounds - n_mask), 0.0, 1.0
        )
        return acc + valid * (corr_d + corr_p), None

    init = jnp.zeros((d8.shape[0], a_bins.shape[0], cfg.n_search), jnp.float32)
    cube, _ = jax.lax.scan(round_step, init, jnp.arange(rounds, dtype=jnp.int32))
    return jax.lax.psum(cube, axis)


def noncoherent_acquire_timesharded(
    mesh: Mesh,
    signal: np.ndarray,
    settings: Settings,
    prns,
    rounds_per_device: int,
    axis: str = "channel",
):
    """Time-sharded deep non-coherent search.

    Returns (metric cube (P, B, n_search) as numpy, best (freq, phase) per
    PRN).  signal must cover n_devices * rounds_per_device code periods
    plus one n_fft window.
    """
    from bds3_tpu.acquire.pcps import acq_code_tables

    cfg = make_acq_config(settings)
    n_dev = int(np.prod([mesh.shape[a] for a in (axis,)]))
    seg = rounds_per_device * cfg.samples_per_code
    halo = cfg.n_fft - cfg.samples_per_code
    if seg < halo:
        raise ValueError(
            f"rounds_per_device * samples_per_code ({seg}) must cover the "
            f"halo ({halo}): neighbors only hold one segment"
        )
    total = n_dev * seg
    assert len(signal) >= total, "signal too short for the requested rounds"
    local_all = np.asarray(signal[:total], dtype=np.float32)

    prns = np.asarray(prns)
    d8, p8 = acq_code_tables(settings, prns)
    n_bins = settings.num_doppler_bins
    freqs = cfg.freq_base + cfg.freq_step * np.arange(n_bins)
    a_b, c1_b = phase_tables(freqs, cfg.fs)

    fn = jax.shard_map(
        functools.partial(_local_noncoh, cfg=cfg, rounds=rounds_per_device,
                          axis=axis, n_dev=n_dev),
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    cube = np.asarray(jax.jit(fn)(
        jnp.asarray(local_all), jnp.asarray(d8), jnp.asarray(p8),
        jnp.asarray(a_b), jnp.asarray(c1_b),
    ))
    flat = cube.reshape(len(prns), -1)
    best = flat.argmax(axis=1)
    best_bin = best // cfg.n_search
    best_phase = best % cfg.n_search
    best_freq = cfg.freq_base + cfg.freq_step * best_bin
    return cube, best_freq, best_phase

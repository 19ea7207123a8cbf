"""Sharded variants of the receiver's device entry points.

Channel/PRN axes are pure fan-out, so sharding is expressed by placing
the leading axis of the per-channel inputs on the "channel" mesh axis
and jitting the *same* kernels — XLA partitions the vmapped lanes with
no communication (the domain's data parallelism, SURVEY.md section 2.5).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bds3_tpu.acquire.pcps import AcqConfig, coarse_search
from bds3_tpu.track.scan import track_block
from bds3_tpu.track.state import ChannelConsts, ChannelState, TrackConfig


def sharded_coarse_search(mesh: Mesh, signal, data_codes, pilot_codes,
                          a_bins, c1_bins, cfg: AcqConfig,
                          axis: str = "channel"):
    """Coarse PCPS with the PRN axis sharded across the mesh.

    PRN count must be a multiple of (mesh size * cfg.prn_chunk) for even
    lanes; the caller pads.  Signal and Doppler tables are replicated.
    """
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    signal = jax.device_put(signal, rep)
    data_codes = jax.device_put(data_codes, shard)
    pilot_codes = jax.device_put(pilot_codes, shard)
    a_bins = jax.device_put(a_bins, rep)
    c1_bins = jax.device_put(c1_bins, rep)
    return coarse_search(signal, data_codes, pilot_codes, a_bins, c1_bins, cfg)


def sharded_track_block(mesh: Mesh, cfg: TrackConfig, block,
                        data_tables, pilot11_tables, pilot61_tables,
                        ck_data_int, ck_data_frac, ck_p61_int, ck_p61_frac,
                        consts: ChannelConsts, state: ChannelState,
                        axis: str = "channel"):
    """One tracking block with channels sharded across the mesh.

    The signal block and code-phase coarse tables are replicated; all
    per-channel arrays (code tables, carrier tables, loop states) are
    sharded on their leading axis.  The epoch scan then runs fully
    parallel lanes; the only cross-device traffic is the initial
    placement.
    """
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    block = jax.device_put(block, rep)
    data_tables = jax.device_put(data_tables, shard)
    pilot11_tables = jax.device_put(pilot11_tables, shard)
    pilot61_tables = jax.device_put(pilot61_tables, shard)
    ck = [jax.device_put(x, rep) for x in
          (ck_data_int, ck_data_frac, ck_p61_int, ck_p61_frac)]
    consts = ChannelConsts(*(jax.device_put(x, shard) for x in consts))
    state = ChannelState(*(jax.device_put(x, shard) for x in state))
    return track_block(cfg, block, data_tables, pilot11_tables,
                       pilot61_tables, *ck, consts, state)

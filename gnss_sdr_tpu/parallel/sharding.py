"""Multi-chip channel sharding (SURVEY.md §2.4 P2/P10).

The dominant parallelism in a GNSS receiver is the satellite-channel axis:
tracking state is channel-local (no cross-channel communication in the hot
loop), so channels shard perfectly across a device mesh. The sample window
is replicated (every channel correlates against the same antenna stream);
per-epoch observables are tiny [C]-rows gathered to the host for PVT — the
all-gather the reference never needed (single-process) but a pod slice
does.

Acquisition shards the same way: its batch axis is (channel/PRN), with the
Doppler×code-phase grid dense inside each shard.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnss_sdr_tpu.tracking.conf import DllPllConf
from gnss_sdr_tpu.tracking.dll_pll import TrackingState, track_block

CHANNEL_AXIS = "ch"


def make_channel_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (CHANNEL_AXIS,))


def state_shardings(mesh: Mesh) -> TrackingState:
    """NamedSharding pytree for TrackingState: leaf axis 0 = channel."""
    row = NamedSharding(mesh, P(CHANNEL_AXIS))
    mat = NamedSharding(mesh, P(CHANNEL_AXIS, None))
    mat3 = NamedSharding(mesh, P(CHANNEL_AXIS, None, None))
    return TrackingState(
        enabled=row, pos=row, rem_code_phase=row, code_freq=row,
        carrier_phase=row, carrier_doppler=row, carrier_offset=row,
        pll_state=mat, dll_state=mat,
        prev_prompt=mat, fll_active=row, narrow=row, use_atan2=row,
        integ_len=row, integ_count=row, acc_taps=mat, acc_samples=row,
        sec_idx=row, sec_active=row, acc_data=mat, acc_data_count=row,
        kf_x=mat, kf_P=mat3, kf_pc=row,
    )


def make_sharded_track_block(conf: DllPllConf, mesh: Mesh):
    """Jit track_block with channels sharded over the mesh.

    Layout: state/codes sharded on the channel axis, the sample window
    replicated to every device (each device correlates its channel shard
    against the full stream — no collectives in the hot loop). Outputs
    stay sharded; the caller gathers the small per-period rows.
    """
    st_sh = state_shardings(mesh)
    win_sh = NamedSharding(mesh, P())                 # replicated
    codes_sh = NamedSharding(mesh, P(CHANNEL_AXIS, None))

    def fn(state, window_ri, codes):
        # window crosses the boundary as f32 [W, 2] re/im lanes
        # (see utils/cplx.py)
        from gnss_sdr_tpu.utils.cplx import dev_combine

        return track_block(conf, state, dev_combine(window_ri), codes)

    return jax.jit(
        fn,
        in_shardings=(st_sh, win_sh, codes_sh),
    )


def shard_state(state: TrackingState, mesh: Mesh) -> TrackingState:
    sh = state_shardings(mesh)
    return jax.tree_util.tree_map(jax.device_put, state, sh)

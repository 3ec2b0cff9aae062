"""Multi-process (multi-host) channel sharding — SURVEY.md §2.4 P10.

Single-process GSPMD (parallel/sharding.py) covers one host's chips; a
pod slice spans processes, where JAX requires `jax.distributed.initialize`
plus *global* arrays assembled across processes. The receiver maps onto
that cleanly:

- the channel axis shards over the GLOBAL device list (every process runs
  the same SPMD program on its local chips);
- the sample window is replicated (every channel correlates the same
  antenna stream — on hardware the stream would be broadcast once over
  DCN and ride ICI within each host);
- per-epoch observables are tiny [S, C] rows; `process_allgather` brings
  every process's channel shard to the PVT host (the cross-process analog
  of the epoch gather in gnss_flowgraph.cc's single-process world).

This module is exercised by a real 2-process CPU run
(tools/dist_worker.py, spawned by tests/test_distributed.py and by
__graft_entry__.dryrun_multichip) — not just by virtual-device sharding.
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the process group (call before any backend use).

    The caller must set JAX_PLATFORMS / XLA_FLAGS (e.g.
    ``--xla_force_host_platform_device_count=N``) before importing jax —
    this function only wires the coordination service."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def distributed_dryrun(steps_per_block: int = 4, blocks: int = 3,
                       channels_per_device: int = 1) -> np.ndarray:
    """One signal group's channels sharded over ALL processes' devices.

    Runs `blocks` sharded tracking blocks on deterministic inputs and
    returns the full [S, C] carrier-Doppler rows, allgathered so every
    process (in particular process 0, the PVT host) holds them.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
    from gnss_sdr_tpu.parallel.sharding import (
        CHANNEL_AXIS,
        make_channel_mesh,
        make_sharded_track_block,
        state_shardings,
    )
    from gnss_sdr_tpu.tracking.conf import DllPllConf
    from gnss_sdr_tpu.tracking.dll_pll import init_state
    from gnss_sdr_tpu.utils.cplx import host_to_ri

    devices = jax.devices()                     # GLOBAL device list
    mesh = make_channel_mesh(devices)
    c = channels_per_device * len(devices)
    conf = DllPllConf(
        fs=1.023e6 * 1.25,
        code_length_chips=1023,
        code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6,
        max_channels=c,
        steps_per_block=steps_per_block,
    )

    st_sh = state_shardings(mesh)
    rep = NamedSharding(mesh, P())
    row2 = NamedSharding(mesh, P(CHANNEL_AXIS, None))

    def _init():
        state = init_state(conf)
        return state._replace(
            enabled=jnp.ones((c,), bool),
            carrier_doppler=jnp.linspace(-2000.0, 2000.0, c).astype(
                jnp.float32),
        )

    state = jax.jit(_init, out_shardings=st_sh)()

    # identical host data on every process -> global arrays via jit
    # constant folding (the window is tiny here; real streams would be fed
    # per-host and broadcast on device)
    rng = np.random.default_rng(0)
    win_np = host_to_ri(
        (rng.normal(size=conf.window_samples)
         + 1j * rng.normal(size=conf.window_samples)).astype(np.complex64))
    codes_np = gps_l1_ca_code_table()[np.arange(c) % 32]
    window_ri = jax.jit(lambda: jnp.asarray(win_np), out_shardings=rep)()
    codes = jax.jit(lambda: jnp.asarray(codes_np), out_shardings=row2)()

    fn = make_sharded_track_block(conf, mesh)
    pos0 = state.pos
    new_state, outs = fn(state, window_ri, codes)
    for _ in range(blocks - 1):
        new_state, outs = fn(
            new_state._replace(pos=pos0), window_ri, codes)

    # epoch gather to every process (PVT runs on process 0)
    rows = multihost_utils.process_allgather(
        outs.carrier_doppler.astype(jnp.float32), tiled=True)
    return np.asarray(rows)

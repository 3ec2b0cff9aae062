"""Channel-sharding scaling harness (BASELINE.md north star: >=80%
efficiency at 2 hosts).

Runs the sharded batched tracker over a 1/2/4/8-device mesh and reports
wall-clock per block and the implied scaling efficiency. On real multi-chip
hardware this measures ICI scaling directly; on the CPU host-platform
virtual devices it measures the *sharding overhead* (all virtual devices
share the same cores, so ideal scaling is flat wall-clock — any rise is
partitioning/collective overhead). The driver's multichip dryrun compiles
and executes the same program; this tool puts numbers on it.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/scaling.py [--channels 32] [--steps 20] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# multi-device scaling needs >1 device; outside a real pod slice, force
# the virtual-device CPU platform BEFORE backend initialization (this
# environment preloads jax with a single-chip TPU platform)
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def bench_mesh(n_dev: int, channels: int, steps: int, iters: int) -> float:
    import jax.numpy as jnp

    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
    from gnss_sdr_tpu.parallel.sharding import (
        NamedSharding,
        P,
        make_channel_mesh,
        make_sharded_track_block,
        shard_state,
    )
    from gnss_sdr_tpu.tracking.conf import DllPllConf
    from gnss_sdr_tpu.tracking.dll_pll import init_state
    from gnss_sdr_tpu.utils.cplx import host_to_ri

    conf = DllPllConf(
        fs=2.6e6, code_length_chips=1023, code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6, max_channels=channels,
        steps_per_block=steps,
    )
    mesh = make_channel_mesh(jax.devices()[:n_dev])

    def _init():
        st = init_state(conf)
        return st._replace(
            enabled=jnp.ones((channels,), bool),
            carrier_doppler=jnp.linspace(-4000, 4000, channels).astype(
                jnp.float32),
        )

    state = shard_state(jax.jit(_init)(), mesh)
    rng = np.random.default_rng(0)
    window = jax.device_put(
        jnp.asarray(host_to_ri(
            (rng.normal(size=conf.window_samples)
             + 1j * rng.normal(size=conf.window_samples)
             ).astype(np.complex64))),
        NamedSharding(mesh, P()),
    )
    codes = jax.device_put(
        jnp.asarray(gps_l1_ca_code_table()[np.arange(channels) % 32]),
        NamedSharding(mesh, P("ch", None)),
    )
    fn = make_sharded_track_block(conf, mesh)
    pos0 = state.pos
    st, outs = fn(state, window, codes)
    jax.block_until_ready(outs.carrier_doppler)
    t0 = time.perf_counter()
    for _ in range(iters):
        st, outs = fn(st._replace(pos=pos0), window, codes)
    jax.block_until_ready(outs.carrier_doppler)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tpu", action="store_true",
                    help="use the configured TPU platform (pod slice)")
    args = ap.parse_args()

    n_avail = len(jax.devices())
    print(f"backend {jax.default_backend()}, {n_avail} devices")
    results = {}
    for n in (1, 2, 4, 8):
        if n > n_avail or args.channels % n:
            continue
        dt = bench_mesh(n, args.channels, args.steps, args.iters)
        results[n] = dt
        samples = args.channels * args.steps * 2600
        print(f"mesh={n}: {dt*1e3:7.2f} ms/block  "
              f"{samples/dt/1e6:8.1f} Msamples/s", flush=True)
    if 1 in results:
        base = results[1]
        for n, dt in results.items():
            if n == 1:
                continue
            # virtual devices share cores: ideal wall is FLAT; report the
            # overhead ratio (real multi-chip would divide wall by n)
            print(f"mesh={n}: wall ratio vs 1-device {dt/base:5.2f} "
                  f"(sharding overhead {100*(dt/base-1):+.0f}%)")


if __name__ == "__main__":
    main()

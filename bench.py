"""Tracking-correlator throughput benchmark (driver-run, real chip).

Metric: aggregate tracking throughput in Msamples/s across a 32-channel
batch (carrier wipeoff + 3-tap soft-replica correlation + loop closure per
PRN period — the receiver's hot path). vs_baseline is the real-time factor
for a 32-channel 2.6 Msps receiver: value / (32 * 2.6), i.e. how many
fully-loaded receivers one chip sustains (the reference's qualitative
baseline is ~1x real time on a desktop CPU core set, README.md:1170-1176).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
    from gnss_sdr_tpu.tracking.conf import DllPllConf
    from gnss_sdr_tpu.tracking.dll_pll import init_state, track_block

    fs = 2.6e6
    channels = 32
    steps = 50
    conf = DllPllConf(
        fs=fs,
        code_length_chips=1023,
        code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6,
        max_channels=channels,
        steps_per_block=steps,
    )
    state = init_state(conf)
    state = state._replace(
        enabled=jnp.ones((channels,), bool),
        carrier_doppler=jnp.linspace(-4000, 4000, channels).astype(jnp.float32),
    )
    rng = np.random.default_rng(0)
    # device arrays must be jit *arguments*, not closure constants (this
    # runtime cannot transfer committed buffers back to host for embedding)
    window = jnp.asarray(
        (rng.normal(size=conf.window_samples)
         + 1j * rng.normal(size=conf.window_samples)).astype(np.complex64)
    )
    codes = jnp.asarray(gps_l1_ca_code_table()[np.arange(channels) % 32])
    pos0 = state.pos

    def run_once(st, window, codes, pos0):
        new_state, outs = track_block(
            conf, st._replace(pos=pos0), window, codes
        )
        # keep outputs tiny on device; return only what forces the work
        return new_state, outs.n_samples.astype(jnp.int32)

    run = jax.jit(run_once)

    # compile + warmup
    st, n = run(state, window, codes, pos0)
    jax.block_until_ready(n)

    iters = 40
    t0 = time.perf_counter()
    total_samples = 0
    for _ in range(iters):
        st, n = run(st, window, codes, pos0)      # rewind window pointer
    st = jax.block_until_ready(st)
    dt = time.perf_counter() - t0
    # samples consumed: steps * ~samples_per_code per channel per call
    total_samples = iters * channels * steps * conf.samples_per_code

    msps = total_samples / dt / 1e6
    realtime_32ch = msps / (channels * fs / 1e6)
    print(json.dumps({
        "metric": "tracking_throughput_32ch",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(realtime_32ch, 2),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "tracking_throughput_32ch",
            "value": 0.0,
            "unit": "Msamples/s",
            "vs_baseline": 0.0,
            "error": str(e)[:200],
        }))
        sys.exit(1)

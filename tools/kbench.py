"""Kernel variant micro-benchmark (TPU): ablate the fused tracker's cost.

Measures the production full kernel against the simple kernel and replica
variants with the honest d2h-checksum barrier (BASELINE.md: block_until_ready
is not a reliable barrier on this runtime).

Usage: python tools/kbench.py [variant ...]
Variants: full-qloop full-window2 simple-qloop simple-window2
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
from gnss_sdr_tpu.ops.correlator import pack_code_table
from gnss_sdr_tpu.ops.track_kernel import (
    S_ACC0,
    make_fused_tracker,
    make_fused_tracker_full,
    pack_code_table_ext,
)
from gnss_sdr_tpu.tracking.conf import DllPllConf
from gnss_sdr_tpu.tracking.dll_pll import tap_offsets_chips

FS = 2.6e6
CHANNELS = 32
STEPS = 200
ITERS = 10


def build(kind: str, replica: str):
    conf = DllPllConf(
        fs=FS, code_length_chips=1023, code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6, max_channels=CHANNELS,
        steps_per_block=STEPS,
    )
    interp = jax.default_backend() not in ("tpu",)
    kw = dict(fs=FS, code_rate_cps=1.023e6, carrier_freq_hz=1575.42e6,
              pll_order=conf.pll_filter_order,
              dll_order=conf.dll_filter_order,
              interp_code=conf.interp_code, replica=replica,
              interpret=interp)
    taps = np.asarray(tap_offsets_chips(conf))
    if kind == "full":
        fused = make_fused_tracker_full(
            STEPS, conf.max_step_samples, 1023, conf.num_taps, taps, **kw)
        ns = S_ACC0 + 2 * conf.num_taps + 1
    else:
        fused = make_fused_tracker(
            STEPS, conf.max_step_samples, 1023, conf.num_taps, taps,
            pll_bw_hz=35.0, dll_bw_hz=2.0, **kw)
        ns = 10
    return conf, fused, ns, replica


def run(kind: str, replica: str) -> float:
    conf, fused, ns, replica = build(kind, replica)
    n_win = conf.window_samples
    npadw = ((n_win + 127) // 128 + 32) * 128
    rng = np.random.default_rng(0)
    wr = jnp.asarray(rng.normal(size=(npadw // 128, 128)).astype(np.float32))
    wi = jnp.asarray(rng.normal(size=(npadw // 128, 128)).astype(np.float32))
    codes = gps_l1_ca_code_table()[np.arange(CHANNELS) % 32].astype(np.float32)
    if replica == "window2":
        codes_q = jnp.asarray(pack_code_table_ext(codes))
    else:
        codes_q = jnp.asarray(pack_code_table(codes))
    scal0 = np.zeros((CHANNELS, ns), np.float32)
    scal0[:, 1] = 0.3
    scal0[:, 4] = np.linspace(-4000, 4000, CHANNELS)
    if kind == "full":
        scal0[:, 7] = 1
        scal0[:, 10] = 1
        scal0[:, 17] = 35.0
        scal0[:, 18] = 2.0
    else:
        scal0[:, 7] = 1
    scal0 = jnp.asarray(scal0)

    def run_once(chk, scal):
        out = fused(wr, wi, codes_q, scal)
        last = out[:, -1, :]
        cols = [jnp.zeros((CHANNELS,), jnp.float32),
                last[:, 13], last[:, 12], last[:, 14], last[:, 11],
                last[:, 15], last[:, 16],
                jnp.ones((CHANNELS,), jnp.float32)]
        if ns > 8:
            cols += [last[:, 18], last[:, 19]]
        cols += [scal[:, j] for j in range(10, ns)]
        scal2 = jnp.stack(cols, axis=1).astype(jnp.float32)
        chk2 = (chk + jnp.sum(out[:, :, 2])
                + jnp.sum(out[:, :, 10])).astype(jnp.float32)
        return chk2, scal2

    runj = jax.jit(run_once)
    t0 = time.perf_counter()
    chk, scal = runj(jnp.zeros((), jnp.float32), scal0)
    _ = np.asarray(chk)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    chk = jnp.zeros((), jnp.float32)
    scal = scal0
    for _ in range(ITERS):
        chk, scal = runj(chk, scal)
    _ = np.asarray(chk)
    dt = time.perf_counter() - t0
    msps = ITERS * CHANNELS * STEPS * conf.samples_per_code / dt / 1e6
    us_per_chper = dt / (ITERS * CHANNELS * STEPS) * 1e6
    print(f"{kind}-{replica}: {msps:8.1f} Msps  "
          f"{us_per_chper:6.3f} us/ch-period  (compile {compile_s:.1f}s)")
    return msps


if __name__ == "__main__":
    variants = sys.argv[1:] or ["full-qloop", "full-window2",
                                "simple-qloop", "simple-window2"]
    for v in variants:
        kind, replica = v.split("-", 1)
        run(kind, replica)

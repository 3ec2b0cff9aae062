"""Micro-benchmark suite mirroring the reference's tests/benchmarks/.

Reference analogs (Google Benchmark binaries, tests/benchmarks/):
  benchmark_copy         -> packed-capture sample decode (io/formats.py)
  benchmark_atan2        -> PLL/FLL discriminators (tracking/discriminators.py)
  benchmark_detector     -> acquisition peak statistic over a PCPS grid
  benchmark_preamble     -> LNAV preamble correlation over a symbol stream
  benchmark_crypto       -> OSNMA primitives (SHA-256, HMAC-SHA-256, ECDSA)
  benchmark_osnma        -> TESLA key chain walk
  benchmark_reed_solomon -> Galileo CED RS(255,223) encode + decode

Each prints one JSON line: {"bench": ..., "value": ..., "unit": ...}.
Run: python tools/bench_micro.py [--reps N]
"""

from __future__ import annotations

import argparse
import hashlib
import hmac as hmac_mod
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, reps: int) -> float:
    fn()  # warm-up (JIT compile / cache)
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def bench_copy(reps: int):
    from gnss_sdr_tpu.io.formats import decode_samples, encode_samples

    n = 1 << 20
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    raw2 = encode_samples(x, "2bit_cpx")
    dt = timeit(lambda: decode_samples(raw2, "2bit_cpx"), reps)
    yield {"bench": "copy_decode_2bit", "value": n / dt / 1e6,
           "unit": "Msamples/s"}
    raw8 = encode_samples(x, "ibyte")
    dt = timeit(lambda: decode_samples(raw8, "ibyte"), reps)
    yield {"bench": "copy_decode_ibyte", "value": n / dt / 1e6,
           "unit": "Msamples/s"}


def bench_atan2(reps: int):
    import jax
    import jax.numpy as jnp

    from gnss_sdr_tpu.tracking.discriminators import (
        pll_atan2,
        pll_costas_atan,
    )

    n = 1 << 16
    key = jax.random.PRNGKey(0)
    p_i = jax.random.normal(key, (n,))
    p_q = jax.random.normal(jax.random.PRNGKey(1), (n,))
    f_costas = jax.jit(pll_costas_atan)
    f_atan2 = jax.jit(pll_atan2)

    def run(f):
        return lambda: jax.block_until_ready(f(p_i, p_q))

    dt = timeit(run(f_costas), reps)
    yield {"bench": "atan_costas", "value": n / dt / 1e6, "unit": "Mops/s"}
    dt = timeit(run(f_atan2), reps)
    yield {"bench": "atan2_4quad", "value": n / dt / 1e6, "unit": "Mops/s"}


def bench_detector(reps: int):
    """Peak statistic over a PCPS grid: max + CFAR normalization
    (pcps_acquisition.cc compute_statistics analog)."""
    import jax
    import jax.numpy as jnp

    grid = np.abs(np.random.default_rng(2).standard_normal(
        (8, 25, 4096))).astype(np.float32)
    g = jnp.asarray(grid)

    @jax.jit
    def detect(g):
        flat = g.reshape(g.shape[0], -1)
        idx = jnp.argmax(flat, axis=1)
        peak = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
        power = jnp.mean(flat, axis=1)
        return idx, peak / power

    dt = timeit(lambda: jax.block_until_ready(detect(g)), reps)
    cells = grid.size
    yield {"bench": "detector_cfar", "value": cells / dt / 1e6,
           "unit": "Mcells/s"}


def bench_preamble(reps: int):
    from gnss_sdr_tpu.telemetry.lnav import PREAMBLE_BITS

    sym = np.random.default_rng(3).choice(
        [-1.0, 1.0], size=1 << 16).astype(np.float32)
    pre = (PREAMBLE_BITS * 2 - 1).astype(np.float32)

    def corr():
        return np.convolve(sym, pre[::-1], mode="valid")

    dt = timeit(corr, reps)
    yield {"bench": "preamble_corr", "value": len(sym) / dt / 1e6,
           "unit": "Msymbols/s"}


def bench_crypto(reps: int):
    data = bytes(range(256)) * 16
    key = b"k" * 32
    dt = timeit(lambda: hashlib.sha256(data).digest(), reps)
    yield {"bench": "sha256_4k", "value": len(data) / dt / 1e6, "unit": "MB/s"}
    dt = timeit(
        lambda: hmac_mod.new(key, data, hashlib.sha256).digest(), reps)
    yield {"bench": "hmac_sha256_4k", "value": len(data) / dt / 1e6,
           "unit": "MB/s"}


def bench_osnma(reps: int):
    from gnss_sdr_tpu.telemetry.osnma import ChainParams, tesla_previous_key

    params = ChainParams(hash_func=0, mac_func=0, key_size_bits=128,
                         tag_size_bits=40, alpha=0x25D9E58)

    def walk():
        k = b"\x42" * 16
        for i in range(100):
            k = tesla_previous_key(params, k, 100 - i)
        return k

    dt = timeit(walk, max(1, reps // 4))
    yield {"bench": "tesla_chain_walk", "value": 100 / dt / 1e3,
           "unit": "kkeys/s"}


def bench_reed_solomon(reps: int):
    from gnss_sdr_tpu.telemetry.reed_solomon import ReedSolomon

    rs = ReedSolomon()          # Galileo CED RS(255,32)
    info = (np.arange(rs.k, dtype=np.uint8) * 7 + 3).astype(np.uint8)
    code = rs.encode(info)
    corrupted = code.copy()
    corrupted[5] ^= 0xA5
    corrupted[40] ^= 0x5A
    dt = timeit(lambda: rs.encode(info), max(1, reps // 4))
    yield {"bench": "rs_encode_ced", "value": 1 / dt, "unit": "codewords/s"}
    dt = timeit(lambda: rs.decode(corrupted), max(1, reps // 4))
    yield {"bench": "rs_decode_2err", "value": 1 / dt, "unit": "codewords/s"}


ALL = [bench_copy, bench_atan2, bench_detector, bench_preamble,
       bench_crypto, bench_osnma, bench_reed_solomon]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--only", default="")
    args = ap.parse_args(argv)
    for b in ALL:
        if args.only and args.only not in b.__name__:
            continue
        for row in b(args.reps):
            print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Probe Mosaic primitive costs inside a K-iteration fori_loop.

Calibrates the channel-blocked tracking-kernel design: dynamic-slice
staging copies, lane gathers, small matmuls, transcendentals, and
narrow-vector op chains, each measured as marginal cost over a baseline
loop. Every variant's result is consumed by a full jnp.sum (slicing a
single element lets Mosaic narrow the whole computation to that element)
and gather indices vary per lane (a lane-uniform index lowers to a cheap
broadcast, not a real gather).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 2000         # periods per launch
C = 32           # channels
ROWS_P = 22      # sample rows per period per channel
BR = C * ROWS_P  # blocked rows
ITERS = 30


def timed(name, build, reps=2):
    f = build()
    x = np.random.default_rng(0).normal(size=(4096, 128)).astype(np.float32)
    xj = jnp.asarray(x)
    out = f(xj)
    _ = np.asarray(out)[0, 0]
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f(xj)
        _ = np.asarray(out)[0, 0]
        best = min(best, (time.perf_counter() - t0) / (ITERS * K) * 1e9)
    print(f"{name:36s} {best:10.1f} ns/period")
    return best


def pcall(kernel, scratch=()):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
    )


def _consume(x):
    return jnp.sum(x) * jnp.float32(1e-20)


def make_variant(extra):
    """Common harness: preloaded (BR,128) scratch, per-iteration consume."""
    def build():
        def kernel(x_ref, o_ref, scr):
            scr[...] = x_ref[0:BR, :]

            def body(i, acc):
                src = scr[...]
                v = extra(i, acc, src, x_ref, scr)
                return acc + _consume(v) + 1.0

            acc = jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
            o_ref[...] = jnp.full((8, 128), acc)
        return pcall(kernel, [pltpu.VMEM((BR, 128), jnp.float32)])
    return build


def baseline(i, acc, src, x_ref, scr):
    return src + acc


def lane_idx(src, i):
    """Per-lane-varying int index in [0, 128)."""
    base = jax.lax.broadcasted_iota(
        jnp.int32, (BR, 128), 1).astype(jnp.float32) * 0.97
    idxf = base + jnp.float32(1.0) * (i % 31)
    idxf = idxf - 128.0 * jnp.floor(idxf * (1.0 / 128.0))
    return idxf


def gather1(i, acc, src, x_ref, scr):
    idx = lane_idx(src, i).astype(jnp.int32)
    return jnp.take_along_axis(src + acc, idx, axis=1)


def gather3(i, acc, src, x_ref, scr):
    idxf = lane_idx(src, i)
    idx = idxf.astype(jnp.int32)
    s = src + acc
    g0 = jnp.take_along_axis(s, idx, axis=1)
    g1 = jnp.take_along_axis(s, jnp.clip(idx + 1, 0, 127), axis=1)
    g2 = jnp.take_along_axis(s, jnp.clip(idx + 2, 0, 127), axis=1)
    return g0 + g1 + g2


def qloop8(i, acc, src, x_ref, scr):
    idxf = lane_idx(src, i) * 8.0          # 0..1023
    q = jnp.floor(idxf * (1.0 / 128.0))
    r = (idxf - q * 128.0).astype(jnp.int32)
    s = src + acc
    out = jnp.zeros((BR, 128), jnp.float32)
    for qq in range(8):
        g = jnp.take_along_axis(s, r, axis=1)
        out = out + jnp.where(q == jnp.float32(qq), g, 0.0)
    return out


def sincos(i, acc, src, x_ref, scr):
    s = src + acc
    return jnp.cos(s) + jnp.sin(s)


def vec20(i, acc, src, x_ref, scr):
    v = src + acc
    for _ in range(20):
        v = v * jnp.float32(1.000001) + jnp.float32(1e-8)
    return v


def matreduce(i, acc, src, x_ref, scr):
    rsel = (jax.lax.broadcasted_iota(jnp.int32, (C, BR), 1) // ROWS_P
            == jax.lax.broadcasted_iota(jnp.int32, (C, BR), 0)
            ).astype(jnp.float32)
    return jax.lax.dot_general(rsel, src + acc, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def lanereduce8(i, acc, src, x_ref, scr):
    s = src + acc
    cols = [jnp.sum(s * jnp.float32(1.0 + j), axis=1, keepdims=True)
            for j in range(8)]
    return jnp.concatenate(cols, axis=1)


def build_staging():
    def kernel(x_ref, o_ref, scr, scr2, pos_scr):
        def body(i, acc):
            pos_scr[...] = jnp.full((C, 1), 100.0) + acc * jnp.float32(1e-20)

            def cp(c, a):
                r0 = pos_scr[c, 0].astype(jnp.int32)
                scr[pl.ds(c * ROWS_P, ROWS_P), :] = x_ref[pl.ds(r0, ROWS_P), :]
                scr2[pl.ds(c * ROWS_P, ROWS_P), :] = (
                    x_ref[pl.ds(r0 + 1, ROWS_P), :])
                return a
            jax.lax.fori_loop(0, C, cp, 0)
            return acc + _consume(scr[...]) + 1.0
        acc = jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        o_ref[...] = jnp.full((8, 128), acc) + scr2[0:8, :]
    return pcall(kernel, [pltpu.VMEM((BR, 128), jnp.float32),
                          pltpu.VMEM((BR, 128), jnp.float32),
                          pltpu.VMEM((C, 1), jnp.float32)])


def build_narrow(n_ops=150):
    def kernel(x_ref, o_ref):
        def body(i, carry):
            v = carry
            for _ in range(n_ops):
                v = v * jnp.float32(1.000001) + jnp.float32(1e-8)
            return v
        v = jax.lax.fori_loop(0, K, body, x_ref[0:C, 0:1])
        o_ref[...] = jnp.broadcast_to(v[0:8], (8, 1)) * jnp.ones((8, 128))
    return pcall(kernel)


def build_outstore():
    def kernel(x_ref, o_ref, big):
        def body(i, acc):
            row = x_ref[0:C, :] + acc
            big[:, pl.ds(i % 200, 1), :] = row[:, None, :]
            return acc + 1.0
        acc = jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        o_ref[...] = jnp.full((8, 128), acc) + big[0, 0:8, :]
    return pcall(kernel, [pltpu.VMEM((C, 200, 128), jnp.float32)])


if __name__ == "__main__":
    rows = [("baseline load+sum (704,128)", make_variant(baseline))]
    rows += [
        ("1 lane-gather", make_variant(gather1)),
        ("3 lane-gathers (consecutive)", make_variant(gather3)),
        ("qloop8 gather", make_variant(qloop8)),
        ("sin+cos", make_variant(sincos)),
        ("20 vec ops", make_variant(vec20)),
        ("matmul reduce (32,704)@(704,128)", make_variant(matreduce)),
        ("8 lane-reduces + concat", make_variant(lanereduce8)),
        ("staging 2C x 22-row copies", build_staging),
        ("150 narrow ops (32,1)", build_narrow),
        ("out store (32,1,128)", build_outstore),
    ]
    for name, b in rows:
        timed(name, b)

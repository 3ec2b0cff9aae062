"""Sample-rate conversion (reference: src/algorithms/resampler/).

- direct_resample  <- Direct_Resampler (nearest input sample per output tick,
  adapters/direct_resampler_conditioner.cc)
- polyphase_resample <- Mmse_Resampler (GR's 8-tap MMSE fractional
  interpolator, adapters/mmse_resampler_conditioner.cc). Re-expressed as a
  windowed-sinc polyphase gather: each output sample is a T-tap dot product
  at a fractional input position — the gather+dot lowers to one fused pass
  on the TPU's VPU, with all output positions computed in parallel instead
  of GR's sequential sample loop.

Both are pure block functions: given a block and the resampling ratio they
produce the fixed number of output samples that fit, plus the carry position
for streaming continuity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def direct_resample(
    x: jnp.ndarray, ratio_in_per_out: float, n_out: int, frac0: float = 0.0
) -> jnp.ndarray:
    """Nearest-sample decimation/interpolation.

    x: [N] input block; output[k] = x[round(frac0 + k * ratio)].
    """
    pos = frac0 + ratio_in_per_out * jnp.arange(n_out, dtype=jnp.float64)
    idx = jnp.clip(jnp.round(pos).astype(jnp.int32), 0, x.shape[0] - 1)
    return x[idx]


@partial(jax.jit, static_argnames=("n_out", "num_taps"))
def polyphase_resample(
    x: jnp.ndarray,
    ratio_in_per_out: jnp.ndarray | float,
    n_out: int,
    frac0: jnp.ndarray | float = 0.0,
    num_taps: int = 8,
) -> jnp.ndarray:
    """Fractional resampling with an on-the-fly windowed-sinc kernel.

    Rather than precomputing GR's 128-phase MMSE tap bank and snapping to the
    nearest phase, the taps are evaluated *exactly* at each output's
    fractional offset (vectorized sinc x raised-cosine window), so there is
    no phase-quantization noise. x must provide ``num_taps`` guard samples
    beyond the last read position.
    """
    half = num_taps // 2
    pos = jnp.asarray(frac0, jnp.float64) + jnp.asarray(
        ratio_in_per_out, jnp.float64
    ) * jnp.arange(n_out, dtype=jnp.float64)
    base = jnp.floor(pos).astype(jnp.int32)
    mu = (pos - base).astype(jnp.float32)                     # [n_out]
    k = jnp.arange(-half + 1, half + 1, dtype=jnp.float32)    # [T]
    t = k[None, :] - mu[:, None]                              # [n_out, T]
    window = jnp.cos(np.pi * t / (2 * half)) ** 2
    h = jnp.sinc(t) * jnp.where(jnp.abs(t) < half, window, 0.0)
    h = h / jnp.sum(h, axis=1, keepdims=True)
    idx = jnp.clip(base[:, None] + k.astype(jnp.int32)[None, :], 0, x.shape[0] - 1)
    windows = x[idx]                                          # [n_out, T]
    re = jnp.sum(windows.real * h, axis=1)
    im = jnp.sum(windows.imag * h, axis=1)
    return jax.lax.complex(re, im).astype(jnp.complex64)

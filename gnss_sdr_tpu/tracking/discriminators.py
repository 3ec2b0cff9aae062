"""Tracking discriminators, vectorized over channels.

Standard GNSS discriminators (Kaplan & Hegarty ch. 5); the reference
implements the same set in
src/algorithms/tracking/libs/tracking_discriminators.cc and calls them from
dll_pll_veml_tracking.cc:1260-1349 (run_dll_pll).

All functions take/return arrays of shape [C] and are jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-20


def pll_costas_atan(p_i: jnp.ndarray, p_q: jnp.ndarray) -> jnp.ndarray:
    """Two-quadrant Costas discriminator, rad (insensitive to bit flips)."""
    return jnp.arctan(p_q / jnp.where(jnp.abs(p_i) < _EPS, _EPS, p_i))


def pll_atan2(p_i: jnp.ndarray, p_q: jnp.ndarray) -> jnp.ndarray:
    """Four-quadrant discriminator, rad (pilot / secondary-code-locked)."""
    return jnp.arctan2(p_q, p_i)


def fll_atan2(p1: jnp.ndarray, p2: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    """Frequency discriminator from consecutive prompts, Hz.

    cross/dot four-quadrant atan over the interval dt between prompt
    midpoints (reference fll_four_quadrant_atan). Bit-SENSITIVE: only valid
    once data/secondary-code wipeoff is in place.
    """
    dot = p1.real * p2.real + p1.imag * p2.imag
    cross = p1.real * p2.imag - p1.imag * p2.real
    return jnp.arctan2(cross, dot) / (2.0 * jnp.pi * jnp.maximum(dt, _EPS))


def fll_atan(p1: jnp.ndarray, p2: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    """Bit-insensitive two-quadrant frequency discriminator, Hz (reference
    fll_diff_atan): a nav-bit flip rotates the prompt by ~pi, which the
    cross/dot ratio cancels — required during pre-bit-sync pull-in."""
    dot = p1.real * p2.real + p1.imag * p2.imag
    cross = p1.real * p2.imag - p1.imag * p2.real
    return jnp.arctan(
        cross / jnp.where(jnp.abs(dot) < _EPS, _EPS, dot)
    ) / (2.0 * jnp.pi * jnp.maximum(dt, _EPS))


def dll_nelp(e_i, e_q, l_i, l_q, spacing_chips: float) -> jnp.ndarray:
    """Normalized early-minus-late power discriminator, chips.

    For spacing d (early at -d/2... here d = early->late distance in chips),
    the linear region gain gives chips error = (E-L)/(E+L) * (1 - d/2) is the
    coherent form; the standard normalized envelope form used by the
    reference (dll_nc_e_minus_l_normalized) is 0.5*(E-L)/(E+L) scaled by the
    correlation slope. We use the classic 0.5*(1 - d/2)-free form
    0.5*(E-L)/(E+L), exact for d=1, adequate within the pull-in range.
    """
    e = jnp.sqrt(e_i * e_i + e_q * e_q)
    l = jnp.sqrt(l_i * l_i + l_q * l_q)
    return 0.5 * (e - l) / jnp.maximum(e + l, _EPS)


def dll_veml(ve, e, l, vl) -> jnp.ndarray:
    """VEML power discriminator for BOC signals, chips
    (reference uses (E-L)/(E+L) over VE+E vs L+VL magnitudes)."""
    early = jnp.abs(ve) + jnp.abs(e)
    late = jnp.abs(l) + jnp.abs(vl)
    return 0.5 * (early - late) / jnp.maximum(early + late, _EPS)

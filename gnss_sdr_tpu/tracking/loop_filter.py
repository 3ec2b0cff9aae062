"""Digital tracking-loop filters, vectorized over channels.

Classic 1st/2nd/3rd-order loop filters with boxcar integration
(Kaplan & Hegarty Table 5.6 natural-frequency scalings). The reference
implements equivalent filters in
src/algorithms/tracking/libs/tracking_loop_filter.cc (controlled-root
formulation) and tracking_2nd_DLL_filter.cc / tracking_2nd_PLL_filter.cc.

State is a [C, 2] array of integrator values (order-1 uses none, order-2
uses one, order-3 uses two); bandwidth may be per-channel [C] (wide/narrow
switching without recompilation).
"""

from __future__ import annotations

import jax.numpy as jnp


def loop_filter_init(num_channels: int) -> jnp.ndarray:
    return jnp.zeros((num_channels, 2), dtype=jnp.float32)


def loop_filter_set_state(state: jnp.ndarray, out0: jnp.ndarray, order: int) -> jnp.ndarray:
    """Seed the filter so its next output starts from out0 (e.g. acq Doppler)."""
    if order == 1:
        return state
    return state.at[:, 0].set(out0.astype(jnp.float32))


def loop_filter_step(
    state: jnp.ndarray,      # [C, 2]
    err: jnp.ndarray,        # [C] discriminator output
    bw_hz: jnp.ndarray,      # [C] noise bandwidth
    dt: jnp.ndarray,         # [C] integration time, s
    order: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One filter update; returns (new_state, output)."""
    err = err.astype(jnp.float32)
    bw = bw_hz.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    if order == 1:
        w0 = 4.0 * bw
        return state, w0 * err
    if order == 2:
        w0 = bw / 0.53
        i1 = state[:, 0] + w0 * w0 * err * dt
        out = i1 + 1.414 * w0 * err
        return state.at[:, 0].set(i1), out
    if order == 3:
        w0 = bw / 0.7845
        i2 = state[:, 1] + (w0**3) * err * dt
        i1 = state[:, 0] + dt * (i2 + 1.1 * w0 * w0 * err)
        out = i1 + 2.4 * w0 * err
        return state.at[:, 0].set(i1).at[:, 1].set(i2), out
    raise ValueError(f"loop filter order must be 1..3, got {order}")


def fll_assist_step(
    state: jnp.ndarray,      # [C, 2] PLL filter state (order >= 2)
    freq_err_hz: jnp.ndarray,
    fll_bw_hz: jnp.ndarray,
    dt: jnp.ndarray,
    enabled: jnp.ndarray,    # [C] bool
) -> jnp.ndarray:
    """Inject an FLL error into the PLL's first integrator (FLL-assisted PLL).

    Equivalent in effect to the reference's FLL-aided carrier loop
    (dll_pll_veml_tracking.cc run_dll_pll with enable_fll_*)."""
    w0f = fll_bw_hz.astype(jnp.float32) / 0.53
    delta = (
        w0f * w0f * freq_err_hz.astype(jnp.float32) * 2.0 * jnp.pi * dt.astype(jnp.float32)
    )
    return state.at[:, 0].add(jnp.where(enabled, delta, 0.0))

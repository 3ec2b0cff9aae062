"""Device-side data-type adapters (reference: src/algorithms/data_type_adapter/).

The reference converts capture integer formats to gr_complex on the CPU
(Ibyte_To_Complex, Ishort_To_Complex, Byte_To_Short, Cshort_To_Gr_Complex
adapters). Here the raw integer stream is shipped to the TPU *as integers*
(1/8th to 1/4th the host->device bytes of complex64) and widened on device —
these jitted casts are the first stage of the fused conditioner pipeline and
XLA fuses them into the following filter.
"""

from __future__ import annotations

import jax.numpy as jnp


def ibyte_to_complex(iq: jnp.ndarray) -> jnp.ndarray:
    """Interleaved int8 I,Q [2N] -> complex64 [N] (Ibyte_To_Complex)."""
    x = iq.astype(jnp.float32).reshape(-1, 2)
    return (x[:, 0] + 1j * x[:, 1]).astype(jnp.complex64)


def ishort_to_complex(iq: jnp.ndarray) -> jnp.ndarray:
    """Interleaved int16 I,Q [2N] -> complex64 [N] (Ishort_To_Complex)."""
    x = iq.astype(jnp.float32).reshape(-1, 2)
    return (x[:, 0] + 1j * x[:, 1]).astype(jnp.complex64)


def byte_to_complex(b: jnp.ndarray) -> jnp.ndarray:
    """Real int8 [N] -> complex64 [N] with zero Q (Byte_To_Short + hilbert-less
    complexification; real IF streams get shifted to baseband by the
    freq-xlating filter which handles the negative image)."""
    return b.astype(jnp.float32).astype(jnp.complex64)


def short_to_complex(s: jnp.ndarray) -> jnp.ndarray:
    """Real int16 [N] -> complex64 [N]."""
    return s.astype(jnp.float32).astype(jnp.complex64)


def cshort_to_complex(iq: jnp.ndarray) -> jnp.ndarray:
    """[N, 2] or interleaved [2N] int16 -> complex64 (Cshort_To_Gr_Complex)."""
    x = iq.reshape(-1, 2).astype(jnp.float32)
    return (x[:, 0] + 1j * x[:, 1]).astype(jnp.complex64)


ADAPTERS = {
    "ibyte": ibyte_to_complex,
    "cbyte": ibyte_to_complex,
    "ishort": ishort_to_complex,
    "cshort": cshort_to_complex,
    "byte": byte_to_complex,
    "short": short_to_complex,
    "passthrough": lambda x: x.astype(jnp.complex64),
}

"""Complex arrays at host<->device boundaries, as real/imag float32 lanes.

The TPU runtime used here does not implement host<->device copies of
complex64 buffers in either direction (UNIMPLEMENTED at transfer time; see
utils/hostpack.py for the device->host case). Complex math *inside* a
compiled program is fully supported. So the framework's convention is:

- every jitted program takes and returns REAL dtypes only;
- complex sample data crosses the boundary as float32 with a trailing
  [..., 2] re/im axis, combined with ``jax.lax.complex`` as the program's
  first op and split back as its last;
- on host, the conversion is free: complex64 and float32[..., 2] are the
  same memory (numpy ``view``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def host_to_ri(x: np.ndarray) -> np.ndarray:
    """complex64 [...] -> float32 [..., 2] without copying."""
    x = np.ascontiguousarray(x, dtype=np.complex64)
    return x.view(np.float32).reshape(*x.shape, 2)


def host_from_ri(a: np.ndarray) -> np.ndarray:
    """float32 [..., 2] -> complex64 [...] without copying."""
    a = np.ascontiguousarray(a, dtype=np.float32)
    return a.view(np.complex64).reshape(a.shape[:-1])


def dev_combine(a: jnp.ndarray) -> jnp.ndarray:
    """Traced: float32 [..., 2] -> complex64 [...]."""
    return jax.lax.complex(a[..., 0], a[..., 1])


def dev_split(z: jnp.ndarray) -> jnp.ndarray:
    """Traced: complex [...] -> float32 [..., 2]."""
    return jnp.stack(
        [jnp.real(z).astype(jnp.float32), jnp.imag(z).astype(jnp.float32)],
        axis=-1,
    )


@jax.jit
def _combine(a):
    return dev_combine(a)


@jax.jit
def _split(z):
    return dev_split(z)


def put_complex(x: np.ndarray) -> jnp.ndarray:
    """Host complex -> device complex64 array (transfers f32, combines on
    device)."""
    return _combine(jnp.asarray(host_to_ri(x)))


def get_complex(z) -> np.ndarray:
    """Device complex array -> host complex64 (splits on device, transfers
    f32)."""
    from gnss_sdr_tpu.utils.transfer import fetch

    return host_from_ri(fetch(_split(z)))

"""Device-resident sample stream buffer.

The receiver's hot loop slides overlapping windows over the sample
stream. Re-uploading each window (tens of MB/s, mostly redundant) is the
dominant cost on a remote TPU link — so each conditioned chunk is
uploaded ONCE (as f32 re/im lanes, utils/cplx.py) into a fixed-length
rolling device buffer, and the batched tracker slices windows on device
(Tracker.process_device).

Reference framing: this is the TPU re-expression of GNU Radio's
double-mapped circular buffers between blocks (SURVEY.md §2.4 P1) — the
ring lives in HBM and the "read pointers" are the per-channel sample
positions inside the tracking kernel."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.utils.cplx import host_to_ri


@jax.jit
def _roll_append(buf: jnp.ndarray, chunk: jnp.ndarray) -> jnp.ndarray:
    n = chunk.shape[0]
    return jnp.concatenate([buf[n:], chunk])


class DeviceStream:
    """Rolling [L, 2] f32 device buffer holding the last L stream samples.

    Absolute indexing: stream sample ``s`` lives at ``buf[s - base]`` for
    ``base <= s < end``; the region before the first fed sample reads as
    zeros (base goes negative until the buffer fills)."""

    def __init__(self, length_samples: int) -> None:
        self.length = int(length_samples)
        self._buf = jnp.zeros((self.length, 2), jnp.float32)
        self.end = 0                      # absolute end of fed samples

    @property
    def base(self) -> int:
        return self.end - self.length

    def append(self, chunk: np.ndarray) -> None:
        """Append one conditioned chunk (complex host array)."""
        n = len(chunk)
        if n == 0:
            return
        ri = jnp.asarray(host_to_ri(np.asarray(chunk, np.complex64)))
        if n >= self.length:
            self._buf = ri[-self.length:]
        else:
            self._buf = _roll_append(self._buf, ri)
        self.end += n

    @property
    def window(self) -> jnp.ndarray:
        return self._buf

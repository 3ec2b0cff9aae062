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


@jax.jit
def _roll_append_i8(buf: jnp.ndarray, chunk_i8: jnp.ndarray,
                    scale: jnp.ndarray) -> jnp.ndarray:
    """Append an int8 [N, 2] chunk, widening on device (the int8 upload is
    1/4 the bytes of the f32 re/im lanes — host->device bandwidth is a
    first-order cost on a remote TPU link)."""
    n = chunk_i8.shape[0]
    widened = chunk_i8.astype(jnp.float32) * scale
    return jnp.concatenate([buf[n:], widened])


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

    def append(self, chunk: np.ndarray, quantize_i8: bool = False) -> None:
        """Append one conditioned chunk (complex host array).

        ``quantize_i8``: ship the chunk as int8 I/Q and widen on device —
        4x less host->device traffic; the quantization scale locks on the
        first chunk's RMS (tracking is scale-invariant; a per-chunk scale
        would amplitude-modulate the stream mid-block)."""
        n = len(chunk)
        if n == 0:
            return
        chunk = np.asarray(chunk, np.complex64)
        if quantize_i8:
            if not hasattr(self, "_i8_scale"):
                rms = float(np.sqrt(np.mean(np.abs(chunk) ** 2))) or 1.0
                # +-4 sigma spans the int8 range
                self._i8_scale = 4.0 * rms / 127.0
            s = self._i8_scale
            i8 = np.empty((n, 2), np.int8)
            i8[:, 0] = np.clip(np.round(chunk.real / s), -127, 127)
            i8[:, 1] = np.clip(np.round(chunk.imag / s), -127, 127)
            if n >= self.length:
                i8 = i8[-self.length:]
                widened = jnp.asarray(i8).astype(jnp.float32) * s
                self._buf = widened
            else:
                self._buf = _roll_append_i8(
                    self._buf, jnp.asarray(i8), jnp.float32(s))
            self.end += n
            return
        ri = jnp.asarray(host_to_ri(chunk))
        if n >= self.length:
            self._buf = ri[-self.length:]
        else:
            self._buf = _roll_append(self._buf, ri)
        self.end += n

    @property
    def window(self) -> jnp.ndarray:
        return self._buf

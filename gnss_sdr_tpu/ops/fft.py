"""MXU-native FFT: Cooley-Tukey four-step recursion expressed as matmuls.

The reference computes acquisition correlations with FFTW through GNU Radio's
wrapper (src/algorithms/libs/gnss_sdr_fft.h:27-57, used by
pcps_acquisition.cc:522-560). XLA does expose an FFT op, but on the TPU
runtime used here it compiles pathologically slowly and fails at execution
time with UNIMPLEMENTED — and even where it works, a DFT-by-matmul
formulation is the idiomatic way to put this work on the systolic array.

Design: a length-``n`` transform is factored recursively as ``n = n1 * n2``
(factors capped at 128 so every direct DFT is a [<=128, <=128] matrix that
tiles the MXU exactly):

    X[k1 + n1*k2] = sum_{n2'} W_n^{k1 n2'} W_{n2}^{k2 n2'}
                    sum_{n1'} x[n1'*n2 + n2'] W_{n1}^{k1 n1'}

i.e. reshape -> DFT matmul over axis 1 -> twiddle (elementwise) -> DFT
matmul over axis 2 -> transpose. Complex arithmetic is carried as separate
float32 real/imag planes (this backend's complex matmul support is not
trusted), with ``Precision.HIGHEST`` so the MXU runs the 6-pass f32 mode —
error stays ~1e-6 relative even at n=2^20.

Non-power-of-two lengths go through Bluestein's chirp-z algorithm (the
transform becomes a circular convolution of length >= 2n-1, evaluated with
the power-of-two path), so any length is supported.

All DFT/twiddle/chirp tables are numpy constants baked into the traced
program at the call site's shape — nothing here ever triggers a
device->host transfer.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_MAX_RADIX = 128
_PREC = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _dft_mats(n: int, inverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """Direct DFT matrix of order n as (cos, sin) float32 planes."""
    k = np.arange(n)
    sign = 2.0 if inverse else -2.0
    ang = sign * np.pi * np.outer(k, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=None)
def _twiddle(n1: int, n2: int, inverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """Twiddle W_n^{k1*n2'} laid out [n2, n1] to match the recursion's
    intermediate [..., n2, k1] orientation."""
    n = n1 * n2
    sign = 2.0 if inverse else -2.0
    ang = sign * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _split(n: int) -> int:
    """First factor n1 for the four-step split: the largest divisor of n
    that fits a direct DFT matrix. Returns n itself when n is prime."""
    for cand in range(min(_MAX_RADIX, n - 1), 1, -1):
        if n % cand == 0:
            return cand
    return n  # prime


def _fft_last(re: jnp.ndarray, im: jnp.ndarray, inverse: bool):
    """DFT over the last axis; re/im are float32 [..., n]."""
    n = re.shape[-1]
    if n == 1:
        return re, im
    if n <= _MAX_RADIX or _split(n) == n:
        cr, ci = _dft_mats(n, inverse)
        rr = jnp.einsum("...i,ij->...j", re, cr, precision=_PREC) - jnp.einsum(
            "...i,ij->...j", im, ci, precision=_PREC
        )
        ii = jnp.einsum("...i,ij->...j", re, ci, precision=_PREC) + jnp.einsum(
            "...i,ij->...j", im, cr, precision=_PREC
        )
        return rr, ii
    n1 = _split(n)
    n2 = n // n1
    shp = re.shape[:-1]
    a_re = re.reshape(*shp, n1, n2).swapaxes(-1, -2)  # [..., n2, n1]
    a_im = im.reshape(*shp, n1, n2).swapaxes(-1, -2)
    b_re, b_im = _fft_last(a_re, a_im, inverse)       # [..., n2, k1]
    tw_re, tw_im = _twiddle(n1, n2, inverse)          # [n2, n1]
    c_re = b_re * tw_re - b_im * tw_im
    c_im = b_re * tw_im + b_im * tw_re
    c_re = c_re.swapaxes(-1, -2)                      # [..., k1, n2]
    c_im = c_im.swapaxes(-1, -2)
    d_re, d_im = _fft_last(c_re, c_im, inverse)       # [..., k1, k2]
    out_re = d_re.swapaxes(-1, -2).reshape(*shp, n)   # k = k1 + n1*k2
    out_im = d_im.swapaxes(-1, -2).reshape(*shp, n)
    return out_re, out_im


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@lru_cache(maxsize=None)
def _bluestein_tables(n: int, inverse: bool):
    """Chirp and pre-transformed kernel for Bluestein's algorithm."""
    m = 1 << (2 * n - 1).bit_length()
    sign = 1.0 if inverse else -1.0
    k = np.arange(n)
    ang = sign * np.pi * (k.astype(np.float64) ** 2 % (2 * n)) / n
    chirp = np.exp(1j * ang)                          # a_k multiplier
    b = np.zeros(m, dtype=np.complex128)
    b[:n] = np.conj(chirp)
    b[m - n + 1:] = np.conj(chirp[1:][::-1])
    bf = np.fft.fft(b)
    return (
        m,
        chirp.real.astype(np.float32), chirp.imag.astype(np.float32),
        bf.real.astype(np.float32), bf.imag.astype(np.float32),
    )


def _fft_bluestein(re: jnp.ndarray, im: jnp.ndarray, inverse: bool):
    n = re.shape[-1]
    m, ar, ai, bfr, bfi = _bluestein_tables(n, inverse)
    xr = re * ar - im * ai
    xi = re * ai + im * ar
    pad = [(0, 0)] * (re.ndim - 1) + [(0, m - n)]
    xr = jnp.pad(xr, pad)
    xi = jnp.pad(xi, pad)
    fr, fi = _fft_last(xr, xi, False)
    pr = fr * bfr - fi * bfi
    pi = fr * bfi + fi * bfr
    cr, ci = _fft_last(pr, pi, True)                  # un-normalized inverse
    cr = cr[..., :n] / m
    ci = ci[..., :n] / m
    out_re = cr * ar - ci * ai
    out_im = cr * ai + ci * ar
    return out_re, out_im


def _dispatch(re: jnp.ndarray, im: jnp.ndarray, inverse: bool):
    n = re.shape[-1]
    if n <= _MAX_RADIX or _split(n) != n:
        # composite (or small): mixed-radix matmul recursion. Note the
        # recursion only needs *some* factor <= _MAX_RADIX at every level,
        # which any composite of primes <= 128 provides.
        return _fft_last(re, im, inverse)
    return _fft_bluestein(re, im, inverse)


def fft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Forward DFT along ``axis``. Accepts real or complex input; returns
    complex64. Drop-in for ``jnp.fft.fft`` (no ``n`` padding argument)."""
    x = jnp.asarray(x)
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    re = jnp.real(x).astype(jnp.float32)
    im = (jnp.imag(x).astype(jnp.float32) if jnp.iscomplexobj(x)
          else jnp.zeros_like(re))
    rr, ii = _dispatch(re, im, False)
    out = jax.lax.complex(rr, ii)
    if axis != -1 and axis != out.ndim - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def ifft(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inverse DFT along ``axis`` (normalized by 1/n), complex64 out."""
    x = jnp.asarray(x)
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    re = jnp.real(x).astype(jnp.float32)
    im = (jnp.imag(x).astype(jnp.float32) if jnp.iscomplexobj(x)
          else jnp.zeros_like(re))
    rr, ii = _dispatch(re, im, True)
    out = jax.lax.complex(rr / n, ii / n)
    if axis != -1 and axis != out.ndim - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out

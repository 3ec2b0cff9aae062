"""Input filters: FIR, frequency-translating FIR, notch, pulse blanking.

Reference components (src/algorithms/input_filter/, SURVEY.md §2.2):
- Fir_Filter / Freq_Xlating_Fir_Filter (adapters/freq_xlating_fir_filter.cc):
  band-pass FIR designed from config bands; the xlating variant shifts the IF
  to baseband and decimates in the same pass.
- Notch_Filter / Notch_Filter_Lite (gnuradio_blocks/notch_cc.cc,
  notch_lite_cc.cc): adaptive CW-interference rejection. The reference uses a
  time-domain adaptive IIR; sequential IIR recursion is hostile to a vector
  machine, so here notching is done in the frequency domain per block (FFT ->
  attenuate detected CW bins -> IFFT), which XLA maps to batched FFTs on the
  TPU — same capability (CW rejection with automatic detection via the same
  power-ratio test), different algorithm by design.
- Pulse_Blanking_Filter (pulse_blanking_cc.cc): zero samples whose magnitude
  exceeds a threshold over the noise floor — pure elementwise VPU work.

All filters are pure functions over a fixed-size block plus a small carry
(filter tail), so the streaming conditioner can jit one program and feed
blocks through it (overlap-save).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sp_signal

from gnss_sdr_tpu.ops.fft import fft as mxu_fft, ifft as mxu_ifft


# --------------------------------------------------------------------- design
def design_fir(
    num_taps: int,
    fs: float,
    passband_hz: tuple[float, float] | float,
    window: str = "hamming",
) -> np.ndarray:
    """Linear-phase FIR design (host-side, at build time).

    The reference designs Parks-McClellan taps from config bands
    (freq_xlating_fir_filter.cc, conf example
    conf/File_input/GPS/gnss-sdr_GPS_L1_CA_ibyte.conf:22-41); windowed-sinc
    via scipy.firwin is equivalent capability with monotone stopband.
    """
    if isinstance(passband_hz, tuple):
        lo, hi = passband_hz
        if lo <= 0:
            return sp_signal.firwin(num_taps, hi, fs=fs, window=window)
        return sp_signal.firwin(
            num_taps, [lo, hi], fs=fs, pass_zero=False, window=window
        )
    return sp_signal.firwin(num_taps, passband_hz, fs=fs, window=window)


# ------------------------------------------------------------------ FIR block
def fir_apply(x: jnp.ndarray, taps: jnp.ndarray, decim: int = 1) -> jnp.ndarray:
    """Causal FIR + decimation on one block.

    x: [N + T - 1] complex64 (block prepended with the previous tail)
    taps: [T] float32
    returns [N // decim] complex64 aligned so output[k] uses x[k*decim : k*decim+T].

    Implemented as a dot product against a [T]-tap window gather — XLA turns
    the stacked windows into an im2col matmul that lands on the MXU for the
    real and imaginary planes.
    """
    t = taps.shape[0]
    n_out = (x.shape[0] - (t - 1)) // decim
    idx = jnp.arange(n_out)[:, None] * decim + jnp.arange(t)[None, :]
    windows = x[idx]                                   # [n_out, T]
    rt = taps[::-1].astype(jnp.float32)
    re = jnp.dot(windows.real, rt, preferred_element_type=jnp.float32)
    im = jnp.dot(windows.imag, rt, preferred_element_type=jnp.float32)
    return jax.lax.complex(re, im)


def freq_xlating_fir_apply(
    x: jnp.ndarray,
    taps: jnp.ndarray,
    phase0: jnp.ndarray,
    fs: float,
    if_freq_hz: float,
    decim: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Frequency-translating FIR: x * exp(-j 2π f_if t) -> FIR -> decimate.

    ``phase0`` (scalar, radians) carries the LO phase across blocks so the
    translation is continuous. Returns (output, next_phase0).
    """
    n = x.shape[0]
    w = -2.0 * np.pi * if_freq_hz / fs
    ph = phase0 + w * jnp.arange(n, dtype=jnp.float64)
    lo = jax.lax.complex(
        jnp.cos(ph).astype(jnp.float32), jnp.sin(ph).astype(jnp.float32)
    )
    y = fir_apply(x * lo, taps, decim)
    next_phase = jnp.mod(phase0 + w * n, 2.0 * np.pi)
    return y, next_phase


# -------------------------------------------------------------------- notch
@jax.jit
def notch_filter_block(x: jnp.ndarray, pfa_ratio: float = 10.0) -> jnp.ndarray:
    """Frequency-domain CW notch with automatic detection.

    Detection mirrors the reference's power-ratio test (notch_cc.cc computes
    the ratio of peak spectral power to average power and engages the filter
    past a threshold): every bin whose power exceeds ``pfa_ratio`` x the
    median bin power is attenuated down to the noise floor. The vectorized
    mask covers a CW's full leakage skirt and any number of interferers in
    one elementwise pass — no per-peak loop.
    """
    spec = mxu_fft(x)
    p = jnp.abs(spec) ** 2
    floor = jnp.median(p.astype(jnp.float32))
    hit = p > pfa_ratio * floor
    scale = jnp.where(hit, jnp.sqrt(floor / jnp.maximum(p, floor)), 1.0)
    spec = spec * scale.astype(spec.dtype)
    return mxu_ifft(spec).astype(jnp.complex64)


# ----------------------------------------------------------- pulse blanking
@jax.jit
def pulse_blanking_block(
    x: jnp.ndarray, pfa_sigmas: float = 4.0
) -> jnp.ndarray:
    """Zero samples above ``pfa_sigmas`` x the robust noise scale
    (Pulse_Blanking_Filter analog, pulse_blanking_cc.cc)."""
    mag2 = jnp.abs(x) ** 2
    noise = jnp.median(mag2)  # robust to the pulses themselves
    keep = mag2 <= (pfa_sigmas ** 2) * noise
    return jnp.where(keep, x, 0.0).astype(jnp.complex64)

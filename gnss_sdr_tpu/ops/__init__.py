"""Device compute kernels that replace backend ops this TPU runtime lacks
(or that map better to the MXU than the stock lowering).

- ``fft`` / ``ifft``: mixed-radix Cooley-Tukey DFT as MXU matmuls with
  Bluestein fallback for awkward lengths (ops/fft.py) — the acquisition
  engine's FFT path.
"""

from gnss_sdr_tpu.ops.fft import fft, ifft

__all__ = ["fft", "ifft"]

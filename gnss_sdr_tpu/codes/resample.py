"""Generic nearest-chip code resampling (host/NumPy side).

Device-side resampling lives in the tracking correlator
(gnss_sdr_tpu/tracking/correlator.py) where it is fused with the carrier
wipeoff; this host version is shared by the simulator and tests.

Reference analog: volk_gnsssdr 32f_xn_resampler kernels
(volk_gnsssdr_32f_xn_resampler_32f_xn.h).
"""

from __future__ import annotations

import numpy as np


def resample_code(
    code: np.ndarray,
    fs: float,
    code_rate_cps: float,
    num_samples: int,
    chip_shift: float = 0.0,
) -> np.ndarray:
    """Sample ``code`` (one period, any dtype) at ``fs`` with nearest-chip lookup."""
    length = code.shape[0]
    n = np.arange(num_samples, dtype=np.float64)
    idx = np.floor(n * (code_rate_cps / fs) + chip_shift).astype(np.int64) % length
    return code[idx]

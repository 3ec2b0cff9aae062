"""C/N0 estimation and lock detection (host-side, NumPy).

Mirrors src/algorithms/tracking/libs/lock_detectors.cc:
- cn0_m2m4_estimator / cn0_svn_estimator: signal-to-noise-variance C/N0
  estimate from a window of prompt correlator outputs;
- carrier_lock_detector: cos(2*phase_err) estimate from narrowband
  difference/power ratio (NBD/NBP).

These run on the host between device blocks over the small per-period
prompt history (SURVEY.md §5 failure detection).
"""

from __future__ import annotations

import numpy as np


def cn0_svn_estimator(prompts: np.ndarray, coh_time_s: float) -> float:
    """Signal-to-noise-variance C/N0 estimate in dB-Hz.

    prompts: complex prompt correlations (one per coherent interval).
    """
    if prompts.size < 2:
        return 0.0
    p_sig = np.mean(np.abs(prompts.real)) ** 2
    p_tot = np.mean(np.abs(prompts) ** 2)
    noise = p_tot - p_sig
    if noise <= 0:
        noise = 1e-12
    snr = p_sig / noise
    return float(10.0 * np.log10(max(snr, 1e-12) / coh_time_s))


def carrier_lock_detector(prompts: np.ndarray) -> float:
    """Estimate of cos(2*carrier_phase_error) in [-1, 1]; ~1 when locked."""
    if prompts.size == 0:
        return 0.0
    i = prompts.real
    q = prompts.imag
    nbd = float(np.sum(i * i - q * q))
    nbp = float(np.sum(i * i + q * q))
    if nbp <= 0:
        return 0.0
    return nbd / nbp

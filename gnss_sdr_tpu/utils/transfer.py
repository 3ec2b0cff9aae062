"""Robust device->host fetch.

Remote TPU runtimes (device behind a tunnel) can fail transfers transiently
(UNIMPLEMENTED / timeouts) even for supported f32 buffers. All production
device->host reads go through `fetch`, which retries with backoff; the
buffer itself is immutable on device so a retry is always safe.
"""

from __future__ import annotations

import time

import numpy as np


def fetch(x, retries: int = 5, base_delay_s: float = 0.3) -> np.ndarray:
    last: Exception | None = None
    for attempt in range(retries):
        try:
            return np.asarray(x)
        except Exception as e:  # jax runtime errors don't share a base class
            last = e
            time.sleep(base_delay_s * (2.0**attempt))
    raise last

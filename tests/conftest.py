"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4 implication; the driver
separately dry-runs the multichip path on the real backend).

Note: this environment preloads jax (sitecustomize) with the 'axon' TPU
platform selected, so JAX_PLATFORMS env vars set here are too late; we
switch the platform through jax.config before any backend initialization.
"""

import hashlib
import os
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------- captures
# Re-simulating 30 s scenarios dominates suite wall time; cache generated
# captures on disk, keyed by the scenario parameters plus a hash of the
# simulator/codes/telemetry sources (stale on any generator change).

_CACHE_DIR = Path(__file__).parent / "_capture_cache"
_SRC_ROOT = Path(__file__).parent.parent / "gnss_sdr_tpu"


def _source_salt() -> str:
    h = hashlib.sha256()
    for sub in ("simulate", "codes", "telemetry"):
        for f in sorted((_SRC_ROOT / sub).glob("**/*")):
            if f.is_file():
                h.update(f.read_bytes())
    return h.hexdigest()[:16]


_SALT = None


def cached_capture(key: str, gen_fn) -> np.ndarray:
    """Return gen_fn()'s complex64 capture, memoized to disk by key."""
    global _SALT
    if _SALT is None:
        _SALT = _source_salt()
    _CACHE_DIR.mkdir(exist_ok=True)
    path = _CACHE_DIR / f"{key}-{_SALT}.npy"
    if path.exists():
        return np.load(path)
    x = np.asarray(gen_fn(), dtype=np.complex64)
    tmp = path.with_suffix(".tmp.npy")
    np.save(tmp, x)
    tmp.rename(path)
    # drop stale entries for this key
    for old in _CACHE_DIR.glob(f"{key}-*.npy"):
        if old != path:
            old.unlink(missing_ok=True)
    return x

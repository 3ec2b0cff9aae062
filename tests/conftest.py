"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4 implication; the driver
separately dry-runs the multichip path on the real backend).

Note: this environment preloads jax (sitecustomize) with the 'axon' TPU
platform selected, so JAX_PLATFORMS env vars set here are too late; we
switch the platform through jax.config before any backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

"""Two-process jax.distributed channel sharding (SURVEY.md §2.4 P10).

Spawns two REAL processes, each with 4 virtual CPU devices, that join a
jax.distributed group and run one signal group's channels sharded over
the 8 global devices; per-channel Doppler rows allgather to process 0.
The gathered rows must match a single-process unsharded run bit-for-bit
(the same guarantee tests/test_sharding.py gives within one process).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_channel_sharding():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "dist_worker.py"),
             str(pid), "2", str(port), "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"
    rows = None
    for so, _ in outs:
        for line in so.splitlines():
            if line.startswith("DIST_ROWS "):
                rows = np.asarray(json.loads(line[len("DIST_ROWS "):]))
    assert rows is not None, "process 0 printed no rows"
    assert rows.shape == (4, 8)             # [steps, channels]

    # single-process unsharded reference on the same deterministic inputs
    import jax
    import jax.numpy as jnp

    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
    from gnss_sdr_tpu.tracking.conf import DllPllConf
    from gnss_sdr_tpu.tracking.dll_pll import init_state, track_block
    from gnss_sdr_tpu.utils.cplx import dev_combine, host_to_ri

    c = 8
    conf = DllPllConf(
        fs=1.023e6 * 1.25, code_length_chips=1023, code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6, max_channels=c, steps_per_block=4)

    def _init():
        state = init_state(conf)
        return state._replace(
            enabled=jnp.ones((c,), bool),
            carrier_doppler=jnp.linspace(-2000.0, 2000.0, c).astype(
                jnp.float32))

    state = jax.jit(_init)()
    rng = np.random.default_rng(0)
    win = jnp.asarray(host_to_ri(
        (rng.normal(size=conf.window_samples)
         + 1j * rng.normal(size=conf.window_samples)).astype(np.complex64)))
    codes = jnp.asarray(gps_l1_ca_code_table()[np.arange(c) % 32])
    pos0 = state.pos
    new_state, outs = track_block(conf, state, dev_combine(win), codes)
    for _ in range(2):
        new_state, outs = track_block(
            conf, new_state._replace(pos=pos0), dev_combine(win), codes)
    ref = np.asarray(outs.carrier_doppler.astype(jnp.float32))
    np.testing.assert_array_equal(rows, ref)

"""Worker process for the 2-process distributed dryrun.

Usage: python tools/dist_worker.py <process_id> <num_processes> <port>
       <local_device_count>

Forces the CPU platform with N virtual devices BEFORE importing jax,
joins the jax.distributed process group, runs the channel-sharded
tracking dryrun (gnss_sdr_tpu/parallel/distributed.py), and prints the
gathered Doppler rows as one JSON line (process 0 only).

Spawned by tests/test_distributed.py and __graft_entry__.dryrun_multichip
— the missing multi-HOST half of SURVEY.md §2.4 P10 that virtual-device
GSPMD alone cannot exercise.
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    ndev = int(sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}"
    ).strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    # some environments preload jax (sitecustomize) with a hardware
    # platform selected before env vars can take effect; re-select CPU
    # through the config API before any backend initialization (same
    # trick as tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gnss_sdr_tpu.parallel import distributed

    distributed.initialize(f"localhost:{port}", nproc, pid)

    assert len(jax.devices()) == nproc * ndev, (
        f"global devices {len(jax.devices())} != {nproc}x{ndev}")
    rows = distributed.distributed_dryrun()
    if pid == 0:
        print("DIST_ROWS " + json.dumps(rows.tolist()))


if __name__ == "__main__":
    main()

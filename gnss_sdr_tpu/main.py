"""Command-line receiver entry point.

Reference: src/main/main.cc:108-299 (flag parsing, ControlThread run, run
time report). Usage:

    python -m gnss_sdr_tpu.main -c receiver.conf

Builds the role chain from the INI config via the block factory
(SignalSource -> SignalConditioner -> batched channels -> Observables ->
PVT -> writers) and streams the source to completion.
"""

from __future__ import annotations

import argparse
import sys
import time
from dataclasses import replace

import numpy as np

from gnss_sdr_tpu.conditioner import SignalConditioner

from gnss_sdr_tpu.config.configuration import FileConfiguration
from gnss_sdr_tpu.receiver.factory import (
    get_acquisition_conf,
    get_channel_counts,
    get_pvt_outputs,
    get_signal_conditioner,
    get_signal_source,
    get_tracking_conf,
)
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig


def run_from_config(cfg, max_seconds: float | None = None):
    """Run the full receiver from a ConfigurationInterface; returns status."""
    source = get_signal_source(cfg)
    conditioner = get_signal_conditioner(cfg)
    # sources decode their item format to complex64 already, so the
    # conditioner's dtype adapter must not re-interpret the stream (the
    # adapter stage exists for pipelines that ship raw integers to device)
    if isinstance(conditioner, SignalConditioner) and (
        conditioner.cfg.input_format != "passthrough"
    ):
        conditioner = SignalConditioner(
            replace(conditioner.cfg, input_format="passthrough")
        )
    fs_internal = cfg.property("GNSS-SDR.internal_fs_sps", source.fs)
    counts = get_channel_counts(cfg)
    n_channels = sum(counts.values())
    acq_conf = get_acquisition_conf(cfg, fs=fs_internal)
    trk_conf = get_tracking_conf(cfg, fs=fs_internal, max_channels=n_channels)

    rx_cfg = ReceiverConfig(
        fs=fs_internal,
        num_channels=n_channels,
        doppler_max_hz=acq_conf.doppler_max_hz,
        doppler_step_hz=acq_conf.doppler_step_hz,
        acq_dwells=acq_conf.max_dwells,
        acq_pfa=acq_conf.pfa,
        obs_interval_ms=cfg.property("GNSS-SDR.observable_interval_ms", 20),
        pvt_interval_ms=cfg.property("PVT.output_rate_ms", 100),
        extend_correlation_symbols=trk_conf.extend_correlation_symbols,
        pll_bw_hz=trk_conf.pll_bw_hz,
        dll_bw_hz=trk_conf.dll_bw_hz,
        pll_bw_narrow_hz=trk_conf.pll_bw_narrow_hz,
        dll_bw_narrow_hz=trk_conf.dll_bw_narrow_hz,
        enable_fll_pull_in=trk_conf.enable_fll_pull_in,
        fll_bw_hz=trk_conf.fll_bw_hz,
    )
    receiver = Receiver(rx_cfg)
    outputs = get_pvt_outputs(cfg)

    chunk = 1 << 17
    acq_done = False
    reacq_at = 0
    budget = int(max_seconds * fs_internal) if max_seconds else None
    printed = 0
    while not source.exhausted():
        raw = source.read(chunk)
        if not len(raw):
            break
        x = conditioner.process(raw)
        receiver.feed(x.astype(np.complex64))
        if budget and receiver._stream_end > budget:
            break
        if not acq_done and receiver._stream_end >= receiver.acq_conf.input_samples:
            receiver.acquire()
            acq_done = True
            reacq_at = receiver._stream_end
        receiver.run()
        # periodic re-acquisition on idle channels (acquisition_manager idle
        # tick analog, gnss_flowgraph.cc:1698)
        if acq_done and receiver._stream_end - reacq_at > int(2.0 * fs_internal):
            reacq_at = receiver._stream_end
            if receiver._idle_channel() is not None:
                try:
                    receiver.acquire()
                except ValueError:
                    pass  # not enough contiguous samples buffered yet
        for sol in receiver.status.fixes[printed:]:
            outputs.print_position(sol)
        printed = len(receiver.status.fixes)
    outputs.close()
    return receiver.status


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="GNSS-SDR-TPU software receiver")
    ap.add_argument("-c", "--config_file", required=True,
                    help="receiver configuration (.conf INI)")
    ap.add_argument("--max_seconds", type=float, default=None,
                    help="stop after this much signal time")
    args = ap.parse_args(argv)

    t0 = time.time()
    cfg = FileConfiguration(args.config_file)
    status = run_from_config(cfg, max_seconds=args.max_seconds)
    dt = time.time() - t0
    n_fix = len(status.fixes)
    print(f"Processed in {dt:.1f} s; {n_fix} fixes; TTFF "
          f"{status.ttff_s if status.ttff_s is not None else 'n/a'} s")
    if status.fixes:
        last = status.fixes[-1]
        print(f"Last fix: lat {np.degrees(last.lat_rad):.6f} "
              f"lon {np.degrees(last.lon_rad):.6f} h {last.height_m:.1f} m")
    return 0


if __name__ == "__main__":
    sys.exit(main())

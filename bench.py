"""Receiver benchmark (driver-run, real chip). Prints ONE JSON line.

Metrics in the single line:
- value/metric: aggregate tracking throughput in Msamples/s across a
  32-channel batch of the PRODUCTION fused kernel (the same
  make_fused_tracker_full program tracking/fused.py runs in the live
  receiver: carrier wipeoff + 3-tap soft-replica correlation + loop
  closure per PRN period, K=200 periods per launch on-chip).
- vs_baseline: ratio of that throughput to the reference's own C/VOLK
  correlator kernel (volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn, AVX
  variant, compiled from the reference tree and timed on this host's CPU
  by bench_volk/build.sh) — BASELINE.md's ">= 10x the C++/VOLK baseline".
- volk_msps: that measured baseline (0 if the reference tree is absent).
- e2e: realtime factors for the BASELINE.json config matrix —
    gps6   : GPS L1 6ch @ 2.6 Msps (round-2..4 continuity config)
    gps8   : GPS L1 8ch full PVT @ 2.6 Msps           (config 2)
    gal8   : Galileo E1b 8ch @ 4.0 Msps               (config 3)
    dual16 : GPS L1 8ch @ 2.6 + Galileo E5a 8ch @10.4 (config 4)
    mc64   : GPS+GAL (shared L1 @4.0) + GLO G1 @3.6 + BDS B1 @2.6,
             16 channels each = 64                    (config 5)
  Each value is (seconds of signal)/(wall seconds) with a 2 s compile
  warmup excluded; < 1.0 means sub-realtime and is reported as such.
- acq_ms: steady-state wall time of one full-constellation acquisition
  pass on the gps8 config (32-PRN batched PCPS grid).
- est_tflops / mfu_pct: counted-flop model (~88 flop/sample/channel) —
  the correlator is a gather/VPU workload, MFU is expected tiny; the
  meaningful target is the VOLK ratio.

A wall-clock budget (BENCH_BUDGET_S, default 1800) guards the driver:
configs that would exceed it are skipped and reported as null.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FLOPS_PER_SAMPLE = 88.0
NOMINAL_PEAK_TFLOPS = 197.0
T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1800"))


def volk_baseline_msps() -> float:
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_volk", "build.sh")
    if not (os.path.exists(script) and os.path.isdir("/root/reference")):
        return 0.0
    try:
        out = subprocess.run(
            ["bash", script], capture_output=True, text=True, timeout=300
        ).stdout.strip().splitlines()
        return float(json.loads(out[-1])["msamples_per_s"])
    except Exception:
        return 0.0


def kernel_bench() -> float:
    """Fused on-chip tracking loop: K=500 code periods x 32 channels per
    launch with DLL/PLL closure in-kernel — the exact production
    channel-blocked kernel (make_fused_tracker_blocked) the live
    receiver runs, not a benchmark special."""
    import jax
    import jax.numpy as jnp

    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
    from gnss_sdr_tpu.ops.track_kernel import S_ACC0
    from gnss_sdr_tpu.ops.track_kernel_blocked import (
        make_fused_tracker_blocked,
    )
    from gnss_sdr_tpu.tracking.conf import DllPllConf
    from gnss_sdr_tpu.tracking.dll_pll import tap_offsets_chips

    fs = 2.6e6
    channels = 32
    steps = 500
    conf = DllPllConf(
        fs=fs, code_length_chips=1023, code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6, max_channels=channels,
        steps_per_block=steps,
    )
    fused = make_fused_tracker_blocked(
        steps, conf.max_step_samples, 1023, conf.num_taps,
        np.asarray(tap_offsets_chips(conf)), fs=fs,
        code_rate_cps=1.023e6, carrier_freq_hz=1575.42e6,
        pll_order=conf.pll_filter_order, dll_order=conf.dll_filter_order,
        interp_code=conf.interp_code,
        interpret=jax.default_backend() not in ("tpu",),
    )
    ns = S_ACC0 + 2 * conf.num_taps + 1
    n_win = conf.window_samples
    npadw = ((n_win + 127) // 128 + fused.pad_rows + 8) * 128
    rng = np.random.default_rng(0)
    wr = jnp.asarray(rng.normal(size=(npadw // 128, 128)).astype(np.float32))
    wi = jnp.asarray(rng.normal(size=(npadw // 128, 128)).astype(np.float32))
    codes_q = jnp.asarray(fused.pack(
        gps_l1_ca_code_table()[np.arange(channels) % 32].astype(np.float32)))
    scal0 = np.zeros((channels, ns), np.float32)
    scal0[:, 1] = 0.3
    scal0[:, 4] = np.linspace(-4000, 4000, channels)
    scal0[:, 7] = 1                        # enabled
    scal0[:, 10] = 1                       # integ_len
    scal0[:, 17] = 35.0                    # pll_bw
    scal0[:, 18] = 2.0                     # dll_bw
    scal0 = jnp.asarray(scal0)

    def run_once(chk, scal):
        out = fused(wr, wi, codes_q, scal)
        last = out[:, -1, :]
        # rewind pos (reuse the window), carry the loop state forward —
        # the checksum depends on every period of every iteration, so one
        # final d2h fetch is an honest barrier for the whole chain
        cols = [jnp.zeros((channels,), jnp.float32),
                last[:, 13], last[:, 12], last[:, 14], last[:, 11],
                last[:, 15], last[:, 16],
                jnp.ones((channels,), jnp.float32),
                last[:, 18], last[:, 19]]
        cols += [scal[:, j] for j in range(10, ns)]
        scal2 = jnp.stack(cols, axis=1).astype(jnp.float32)
        chk2 = (chk + jnp.sum(out[:, :, 2])
                + jnp.sum(out[:, :, 10])).astype(jnp.float32)
        return chk2, scal2

    run = jax.jit(run_once)
    chk, scal = run(jnp.zeros((), jnp.float32), scal0)
    _ = np.asarray(chk)

    # CAUTION: jax.block_until_ready is NOT a reliable barrier on the
    # axon TPU runtime (it can return before execution completes,
    # discovered round 4) — a d2h fetch of a value depending on the whole
    # chain is the only trustworthy sync. The fetch itself costs
    # ~10-40 ms of tunnel round trip, so it is paid once per repetition
    # and amortized over a 40-launch chain (the checksum depends on every
    # period of every launch, so the chain cannot complete early).
    iters = 40
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        chk = jnp.zeros((), jnp.float32)
        scal = scal0
        for _ in range(iters):
            chk, scal = run(chk, scal)
        _ = np.asarray(chk)
        dt = time.perf_counter() - t0
        best = max(best,
                   iters * channels * steps * conf.samples_per_code / dt
                   / 1e6)
    return best


def _run_e2e(rx, feeds, dur, warm=2):
    """Feed per-band 1 s chunks, measuring wall time after `warm` s."""
    for i in range(warm):
        for band, chunks in feeds.items():
            rx.feed(chunks[i], band=band)
        if i == 0:
            rx.acquire()
        rx.run()
    t0 = time.perf_counter()
    for i in range(warm, dur):
        for band, chunks in feeds.items():
            rx.feed(chunks[i], band=band)
        rx.run()
    dt = time.perf_counter() - t0
    return (dur - warm) / dt


def e2e_matrix() -> dict:
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.receiver import plans as P
    from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig

    out = {}
    dur = 6

    def budget_left() -> bool:
        return time.perf_counter() - T0 < BUDGET_S - 120

    def gen_gps(fs, max_sats, seed=1):
        scen = GpsScenario(ScenarioConfig(
            fs=fs, tow_start_s=7314.0, duration_s=float(dur),
            cn0_dbhz=46.0, max_sats=max_sats, seed=seed))
        return [scen.generate(i * int(fs), int(fs)) for i in range(dur)]

    # ---- gps6 (continuity config) + acquisition latency ----------------
    try:
        chunks = gen_gps(2.6e6, 6)
        rx = Receiver(ReceiverConfig(fs=2.6e6, num_channels=6,
                                     steps_per_block=1000, int8_stream=True))
        out["gps6"] = round(_run_e2e(rx, {"L1": chunks}, dur), 2)
    except Exception as e:
        out["gps6"] = None
        print(f"gps6 failed: {e}", file=sys.stderr)

    # ---- gps8: full PVT, 8 channels ------------------------------------
    try:
        if not budget_left():
            raise TimeoutError("budget")
        chunks = gen_gps(2.6e6, 8, seed=2)
        plan = P.gps_l1ca_plan(fs=2.6e6, num_channels=8,
                               steps_per_block=1000)
        rx = Receiver(ReceiverConfig(fs=2.6e6, num_channels=8,
                                     steps_per_block=1000, int8_stream=True),
                      plans=[plan])
        out["gps8"] = round(_run_e2e(rx, {"L1": chunks}, dur), 2)
        t0 = time.perf_counter()
        rx.acquire()
        out["acq_ms"] = round(1000.0 * (time.perf_counter() - t0), 1)
    except Exception as e:
        out["gps8"] = None
        print(f"gps8 failed: {e}", file=sys.stderr)

    # ---- gal8: Galileo E1b ---------------------------------------------
    try:
        if not budget_left():
            raise TimeoutError("budget")
        from gnss_sdr_tpu.simulate.galileo import (
            GalileoScenario,
            GalileoScenarioConfig,
        )

        fs = 4.0e6
        scen = GalileoScenario(GalileoScenarioConfig(
            fs=fs, tow_start_s=7310.0, duration_s=float(dur),
            cn0_dbhz=46.0, max_sats=8, seed=3))
        chunks = [scen.generate(i * int(fs), int(fs)) for i in range(dur)]
        plan = P.galileo_e1b_plan(fs=fs, num_channels=8,
                                  steps_per_block=250)
        rx = Receiver(ReceiverConfig(fs=fs, num_channels=8,
                                     int8_stream=True), plans=[plan])
        out["gal8"] = round(_run_e2e(rx, {"L1": chunks}, dur), 2)
    except Exception as e:
        out["gal8"] = None
        print(f"gal8 failed: {e}", file=sys.stderr)

    # ---- dual16: GPS L1 + Galileo E5a ----------------------------------
    try:
        if not budget_left():
            raise TimeoutError("budget")
        from gnss_sdr_tpu.simulate.galileo import (
            GalileoScenario,
            GalileoScenarioConfig,
        )
        from gnss_sdr_tpu.simulate.multiband import GalileoE5aBand

        fs1, fs5 = 2.6e6, 10.4e6
        g1 = gen_gps(fs1, 8, seed=4)
        gal = GalileoScenario(GalileoScenarioConfig(
            fs=fs1, tow_start_s=7310.0, duration_s=float(dur),
            cn0_dbhz=46.0, max_sats=8, seed=4))
        e5a = GalileoE5aBand(gal, fs=fs5, cn0_dbhz=47.0)
        g5 = [e5a.generate(i * int(fs5), int(fs5)) for i in range(dur)]
        plans = [
            P.gps_l1ca_plan(fs=fs1, num_channels=8, steps_per_block=1000),
            # 500 x 1 ms periods per device call (the f32
            # position guard caps E5a below 1 s at 10.4 Msps)
            P.galileo_e5a_plan(fs=fs5, num_channels=8,
                               steps_per_block=500),
        ]
        rx = Receiver(ReceiverConfig(fs=fs1, num_channels=8,
                                     int8_stream=True), plans=plans)
        out["dual16"] = round(
            _run_e2e(rx, {"L1": g1, "L5": g5}, dur), 2)
    except Exception as e:
        out["dual16"] = None
        print(f"dual16 failed: {e}", file=sys.stderr)

    # ---- mc64: GPS+GAL+GLO+BDS, 16 channels each -----------------------
    try:
        if not budget_left():
            raise TimeoutError("budget")
        from gnss_sdr_tpu.simulate.beidou import (
            BeidouScenario,
            BeidouScenarioConfig,
        )
        from gnss_sdr_tpu.simulate.galileo import (
            GalileoScenario,
            GalileoScenarioConfig,
        )
        from gnss_sdr_tpu.simulate.glonass import (
            GlonassScenario,
            GlonassScenarioConfig,
        )

        fs_l1, fs_g1, fs_b1 = 4.0e6, 3.6e6, 2.6e6
        gps = GpsScenario(ScenarioConfig(
            fs=fs_l1, tow_start_s=7314.0, duration_s=float(dur),
            cn0_dbhz=46.0, max_sats=16, seed=5))
        gal = GalileoScenario(GalileoScenarioConfig(
            fs=fs_l1, tow_start_s=7314.0, duration_s=float(dur),
            cn0_dbhz=46.0, max_sats=16, seed=5))
        glo = GlonassScenario(GlonassScenarioConfig(
            fs=fs_g1, tow_start_s=7335.0, duration_s=float(dur),
            cn0_dbhz=46.0, max_sats=16, seed=5))
        bds = BeidouScenario(BeidouScenarioConfig(
            fs=fs_b1, duration_s=float(dur), cn0_dbhz=46.0,
            max_sats=16, seed=5))
        l1 = [gps.generate(i * int(fs_l1), int(fs_l1))
              + gal.generate(i * int(fs_l1), int(fs_l1))
              for i in range(dur)]
        g1 = [glo.generate(i * int(fs_g1), int(fs_g1)) for i in range(dur)]
        b1 = [bds.generate(i * int(fs_b1), int(fs_b1)) for i in range(dur)]
        plans = [
            P.gps_l1ca_plan(fs=fs_l1, num_channels=16, steps_per_block=1000),
            P.galileo_e1b_plan(fs=fs_l1, num_channels=16,
                               steps_per_block=250),
            P.glonass_l1_ca_plan(fs=fs_g1, num_channels=16,
                                 steps_per_block=1000),
            P.beidou_b1i_plan(fs=fs_b1, num_channels=16,
                              steps_per_block=1000),
        ]
        rx = Receiver(ReceiverConfig(fs=fs_l1, num_channels=16,
                                     int8_stream=True), plans=plans)
        out["mc64"] = round(
            _run_e2e(rx, {"L1": l1, "G1": g1, "B1": b1}, dur), 2)
    except Exception as e:
        out["mc64"] = None
        print(f"mc64 failed: {e}", file=sys.stderr)
    return out


def main() -> None:
    volk = volk_baseline_msps()
    msps = kernel_bench()
    e2e = e2e_matrix()
    est_tflops = msps * 1e6 * FLOPS_PER_SAMPLE / 1e12
    acq_ms = e2e.pop("acq_ms", None)
    print(json.dumps({
        "metric": "tracking_throughput_32ch",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / volk, 1) if volk > 0 else 0.0,
        "volk_msps": round(volk, 1),
        "e2e_msps": round((e2e.get("gps6") or 0.0) * 2.6, 2),
        "e2e_realtime": e2e.get("gps6"),
        "e2e": e2e,
        "acq_ms": acq_ms,
        "est_tflops": round(est_tflops, 3),
        "mfu_pct": round(100.0 * est_tflops / NOMINAL_PEAK_TFLOPS, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "tracking_throughput_32ch",
            "value": 0.0,
            "unit": "Msamples/s",
            "vs_baseline": 0.0,
            "error": str(e)[:200],
        }))
        sys.exit(1)

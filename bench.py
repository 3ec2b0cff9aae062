"""Receiver benchmark (driver-run, real chip). Prints ONE JSON line.

Metrics in the single line:
- value/metric: aggregate tracking-kernel throughput in Msamples/s across a
  32-channel batch (carrier wipeoff + 3-tap soft-replica correlation + loop
  closure per PRN period — the receiver's hot path).
- vs_baseline: ratio of that throughput to the reference's own C/VOLK
  correlator kernel (volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn, AVX
  variant, compiled from the reference tree and timed on this host's CPU by
  bench_volk/build.sh) — BASELINE.md's ">= 10x the C++/VOLK baseline".
- volk_msps: that measured baseline (0 if the reference tree is absent).
- e2e_msps / e2e_realtime: full-receiver throughput (feed -> batched
  tracking -> telemetry -> observables -> PVT) over a simulated 6-satellite
  capture, and its real-time factor at 2.6 Msps.
- est_tflops / mfu_pct: achieved FLOP/s from a counted per-sample flop
  model of the kernel (~88 flop/sample/channel), and the fraction of a
  nominal 197 Tflop/s chip. The correlator is gather/VPU-bound by nature —
  MFU is expected to be small; the meaningful target is the VOLK ratio.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# flop model per (sample, channel): carrier phase+sincos ~14, complex
# rotate+mask 8, per-tap (3): interp ramps ~12 + mul-acc 4 -> 48, data sums
# + loop updates amortized ~18.
FLOPS_PER_SAMPLE = 88.0
NOMINAL_PEAK_TFLOPS = 197.0


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
    """Fused on-chip tracking loop (ops/track_kernel.py): K=200 code
    periods x 32 channels per launch with DLL/PLL closure in-kernel.
    This is the receiver's true hot path — correlation AND loop feedback —
    not a bare correlator, so the number is directly comparable to what a
    full receiver channel consumes per second of signal."""
    import jax
    import jax.numpy as jnp

    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
    from gnss_sdr_tpu.ops.correlator import pack_code_table
    from gnss_sdr_tpu.ops.track_kernel import make_fused_tracker
    from gnss_sdr_tpu.tracking.conf import DllPllConf
    from gnss_sdr_tpu.tracking.dll_pll import tap_offsets_chips

    fs = 2.6e6
    channels = 32
    steps = 200
    conf = DllPllConf(
        fs=fs,
        code_length_chips=1023,
        code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6,
        max_channels=channels,
        steps_per_block=steps,
    )
    fused = make_fused_tracker(
        steps, conf.max_step_samples, 1023, conf.num_taps,
        np.asarray(tap_offsets_chips(conf)), fs=fs,
        code_rate_cps=1.023e6, carrier_freq_hz=1575.42e6,
        pll_bw_hz=conf.pll_bw_hz, dll_bw_hz=conf.dll_bw_hz,
        pll_order=conf.pll_filter_order, dll_order=conf.dll_filter_order,
        interp_code=conf.interp_code, replica="qloop",
        interpret=jax.default_backend() not in ("tpu",),
    )
    n_win = conf.window_samples
    npadw = ((n_win + 127) // 128 + 32) * 128
    rng = np.random.default_rng(0)
    wr = jnp.asarray(rng.normal(size=(npadw // 128, 128)).astype(np.float32))
    wi = jnp.asarray(rng.normal(size=(npadw // 128, 128)).astype(np.float32))
    codes_q = jnp.asarray(pack_code_table(
        gps_l1_ca_code_table()[np.arange(channels) % 32].astype(np.float32)))
    scal0 = np.zeros((channels, 10), np.float32)
    scal0[:, 1] = 0.3
    scal0[:, 4] = np.linspace(-4000, 4000, channels)
    scal0[:, 7] = 1
    scal0 = jnp.asarray(scal0)

    def run_once(chk, scal):
        out = fused(wr, wi, codes_q, scal)
        last = out[:, -1, :]
        # rewind pos (reuse the window), carry the loop state forward —
        # the checksum depends on every period of every iteration, so one
        # final d2h fetch is an honest barrier for the whole chain
        scal2 = jnp.stack([
            jnp.zeros((channels,), jnp.float32),
            last[:, 13], last[:, 12], last[:, 14], last[:, 11],
            last[:, 15], last[:, 16],
            jnp.ones((channels,), jnp.float32),
            last[:, 18], last[:, 19],
        ], axis=1).astype(jnp.float32)
        chk2 = (chk + jnp.sum(out[:, :, 2])
                + jnp.sum(out[:, :, 10])).astype(jnp.float32)
        return chk2, scal2

    run = jax.jit(run_once)
    chk, scal = run(jnp.zeros((), jnp.float32), scal0)
    _ = np.asarray(chk)

    iters = 10
    t0 = time.perf_counter()
    chk = jnp.zeros((), jnp.float32)
    scal = scal0
    for _ in range(iters):
        chk, scal = run(chk, scal)
    _ = np.asarray(chk)                               # true barrier, once
    dt = time.perf_counter() - t0
    return iters * channels * steps * conf.samples_per_code / dt / 1e6


def kernel_bench_xla() -> float:
    import jax
    import jax.numpy as jnp

    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
    from gnss_sdr_tpu.tracking.conf import DllPllConf
    from gnss_sdr_tpu.tracking.dll_pll import init_state, track_block

    fs = 2.6e6
    channels = 32
    steps = 200
    conf = DllPllConf(
        fs=fs,
        code_length_chips=1023,
        code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6,
        max_channels=channels,
        steps_per_block=steps,
    )
    from gnss_sdr_tpu.utils.cplx import dev_combine, host_to_ri

    # complex state leaves are born on device inside a compiled program and
    # the sample window crosses the boundary as f32 re/im lanes — this
    # runtime cannot transfer complex64 host<->device (utils/cplx.py)
    def _init():
        state = init_state(conf)
        return state._replace(
            enabled=jnp.ones((channels,), bool),
            carrier_doppler=jnp.linspace(-4000, 4000, channels).astype(
                jnp.float32
            ),
        )

    state = jax.jit(_init)()
    rng = np.random.default_rng(0)
    window = jnp.asarray(host_to_ri(
        (rng.normal(size=conf.window_samples)
         + 1j * rng.normal(size=conf.window_samples)).astype(np.complex64)
    ))
    codes = jnp.asarray(gps_l1_ca_code_table()[np.arange(channels) % 32])
    pos0 = state.pos

    def run_once(st, chk, window_ri, codes, pos0):
        new_state, outs = track_block(
            conf, st._replace(pos=pos0), dev_combine(window_ri), codes
        )
        # one scalar that depends on the full per-step output set (forces
        # every step's correlations AND survives as a cheap d2h barrier)
        chk = chk + (jnp.sum(outs.acc_prompt.real) + jnp.sum(outs.n_samples)
                     + jnp.sum(outs.carrier_doppler))
        return new_state, chk

    run = jax.jit(run_once)
    chk0 = jnp.zeros((), jnp.float32)
    st, n = run(state, chk0, window, codes, pos0)
    _ = np.asarray(n)

    # CAUTION: jax.block_until_ready is NOT a reliable barrier on the axon
    # TPU runtime (it can return before execution completes, inflating
    # throughput by orders of magnitude — discovered round 4). A device->
    # host fetch of a value that depends on the computation is the only
    # trustworthy sync. The checksum is threaded through the iteration
    # chain, so ONE readback at the end depends on every step of every
    # iteration — the ~10-30 ms tunnel round trip is paid once and
    # amortized, while each call's launch still overlaps the previous
    # call's execution (that is the throughput regime the receiver runs
    # in: back-to-back 200-period blocks per signal-second).
    iters = 10
    t0 = time.perf_counter()
    chk = chk0
    for _ in range(iters):
        st, chk = run(st, chk, window, codes, pos0)  # rewind window pointer
    _ = np.asarray(chk)                              # true barrier, once
    dt = time.perf_counter() - t0
    total_samples = iters * channels * steps * conf.samples_per_code
    return total_samples / dt / 1e6


def e2e_bench() -> tuple[float, float]:
    """Full-chain throughput: Msamples/s through the Receiver and the
    real-time factor at the capture rate."""
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig

    fs = 2.6e6
    dur = 8
    scen = GpsScenario(ScenarioConfig(
        fs=fs, tow_start_s=7314.0, duration_s=float(dur), cn0_dbhz=46.0,
        max_sats=6, seed=1,
    ))
    chunks = [scen.generate(i * int(fs), int(fs)) for i in range(dur)]
    # 500 ms tracking blocks: the remote-TPU link is round-trip bound
    # (~60-200 ms per synchronization), so a handful of large device calls
    # per signal-second dominates e2e throughput (plans steps_per_block)
    # 1 s tracking blocks: the remote-TPU link is round-trip bound, so
    # one device call + one fetch per signal-second maximizes throughput
    rx = Receiver(ReceiverConfig(fs=fs, num_channels=6,
                                 steps_per_block=1000, int8_stream=True))
    # warmup: feed two seconds (a 1 s tracking block needs > 1 s buffered)
    # so acquisition + tracking programs compile outside the timed region
    rx.feed(chunks[0])
    rx.feed(chunks[1])
    rx.acquire()
    rx.run()
    t0 = time.perf_counter()
    for i in range(2, dur):
        rx.feed(chunks[i])
        rx.run()
    dt = time.perf_counter() - t0
    samples = (dur - 2) * fs
    return samples / dt / 1e6, (samples / fs) / dt


def main() -> None:
    volk = volk_baseline_msps()
    msps = kernel_bench()
    e2e_msps, e2e_rt = e2e_bench()
    est_tflops = msps * 1e6 * FLOPS_PER_SAMPLE / 1e12
    print(json.dumps({
        "metric": "tracking_throughput_32ch",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / volk, 1) if volk > 0 else 0.0,
        "volk_msps": round(volk, 1),
        "e2e_msps": round(e2e_msps, 2),
        "e2e_realtime": round(e2e_rt, 2),
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

"""TPU backend smoke test: runs every device-facing subsystem on the real
chip and reports per-stage timings.

The axon TPU runtime has sharp edges (no complex64/bool host<->device
transfers, no usable XLA FFT op, minutes-long first-op warmup): this script
is the fast way to prove the framework's boundary conventions
(utils/cplx.py, utils/hostpack.py, ops/fft.py) actually hold on hardware.

Run: python tools/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


RESULTS: list[bool] = []


def stage(name):
    def deco(fn):
        t0 = time.perf_counter()
        try:
            msg = fn()
            dt = time.perf_counter() - t0
            print(f"[OK]   {name:28s} {dt:7.1f}s  {msg or ''}", flush=True)
            RESULTS.append(True)
        except Exception as e:
            dt = time.perf_counter() - t0
            print(f"[FAIL] {name:28s} {dt:7.1f}s  {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            RESULTS.append(False)

    return deco


def main() -> int:
    import jax
    import jax.numpy as jnp

    import gnss_sdr_tpu  # noqa: F401  (sets jax_enable_x64 — f64 state)

    print("devices:", jax.devices(), flush=True)
    failures = 0

    @stage("warmup (first op)")
    def _():
        return f"val={float(np.asarray(jnp.ones(()) * 2.0)):.0f}"

    @stage("eager state ops (f32/f64/bool)")
    def _():
        # the eager patterns Tracker.start_channel relies on (complex64 is
        # deliberately absent: it cannot exist outside compiled programs on
        # this runtime, which is why TrackingState carries re/im f32 lanes)
        ri = jnp.zeros((8, 2), jnp.float32).at[3].set(1.5)
        f = jnp.zeros((8,), jnp.float64).at[1].set(2.5)
        b = jnp.zeros((8,), bool).at[2].set(True)
        r = ri.sum() + f.astype(jnp.float32).sum() + b.sum()
        return f"r={float(np.asarray(r.astype(jnp.float32))):.1f}"

    @stage("mxu fft golden 4096")
    def _():
        from gnss_sdr_tpu.ops.fft import fft
        from gnss_sdr_tpu.utils.cplx import get_complex, put_complex

        rng = np.random.default_rng(0)
        x = (rng.normal(size=(4, 4096))
             + 1j * rng.normal(size=(4, 4096))).astype(np.complex64)
        got = get_complex(jax.jit(fft)(put_complex(x)))
        ref = np.fft.fft(x, axis=-1)
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert err < 1e-4, f"fft rel err {err}"
        return f"rel_err={err:.1e}"

    @stage("acquisition (3ch PCPS)")
    def _():
        from gnss_sdr_tpu.acquisition import AcqConfig, PcpsAcquisition
        from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
        from gnss_sdr_tpu.simulate import (
            SatelliteSignalParams,
            generate_baseband,
        )

        fs = 2.046e6
        conf = AcqConfig(fs=fs, code_length_chips=1023,
                         code_rate_cps=1.023e6, doppler_max_hz=5000.0,
                         doppler_step_hz=250.0, max_dwells=2, pfa=1e-3)
        eng = PcpsAcquisition(conf, gps_l1_ca_code_table(),
                              list(range(1, 33)))
        sats = [SatelliteSignalParams(prn=7, cn0_dbhz=46.0,
                                      doppler_hz=1000.0, delay_chips=300.25)]
        x = generate_baseband(sats, fs, conf.input_samples, seed=1)
        res = eng.acquire(np.stack([x, x, x]), np.array([6, 11, 19]))
        assert res.detected[0] and not res.detected[2]
        assert abs(res.delay_samples[0] - 600.5) <= 1.0
        assert abs(res.doppler_hz[0] - 1000.0) <= 125.0
        return (f"stat={res.test_statistic[0]:.1f} "
                f"delay={res.delay_samples[0]:.1f} "
                f"dop={res.doppler_hz[0]:+.0f}")

    @stage("tracking (8ch, 3 blocks)")
    def _():
        from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
        from gnss_sdr_tpu.simulate import (
            SatelliteSignalParams,
            generate_baseband,
        )
        from gnss_sdr_tpu.tracking import Tracker
        from gnss_sdr_tpu.tracking.conf import DllPllConf

        fs = 2.046e6
        conf = DllPllConf(
            fs=fs, code_length_chips=1023, code_rate_cps=1.023e6,
            carrier_freq_hz=1575.42e6, max_channels=8, steps_per_block=20,
        )
        trk = Tracker(conf, gps_l1_ca_code_table())
        sats = [SatelliteSignalParams(prn=1, cn0_dbhz=48.0,
                                      doppler_hz=750.0, delay_chips=100.0)]
        n = conf.window_samples + 40 * conf.samples_per_code
        x = generate_baseband(sats, fs, n, seed=2)
        trk.start_channel(0, 1, 0, acq_delay_samples=200.0,
                          acq_doppler_hz=750.0, acq_samplestamp=0,
                          current_abs_sample=0)
        dops = []
        for _ in range(3):
            base, w = trk.window_request()
            res = trk.process(x[base: base + w], base)
            dops.append(float(res.outputs["carrier_doppler"][-1, 0]))
        assert abs(dops[-1] - 750.0) < 100.0, f"doppler {dops}"
        return f"doppler={dops[-1]:+.1f} Hz"

    @stage("conditioner (ibyte+fir+decim)")
    def _():
        from gnss_sdr_tpu.conditioner import (
            ConditionerConfig,
            SignalConditioner,
        )

        cfg = ConditionerConfig(input_format="ibyte", fs_in=4.092e6,
                                fir_taps=33, decimation=2)
        sc = SignalConditioner(cfg)
        rng = np.random.default_rng(3)
        raw = rng.integers(-127, 127, size=2 * 8192).astype(np.int8)
        y = sc.process(raw)
        assert y.dtype == np.complex64 and len(y) > 3000
        return f"out={len(y)} samples"

    @stage("hostpack round trip")
    def _():
        import jax

        from gnss_sdr_tpu.utils.hostpack import (
            make_spec,
            pack_tree,
            unpack_tree,
        )

        tree = {
            "c": np.arange(6, dtype=np.complex64).reshape(2, 3) * (1 + 2j),
            "f": np.linspace(0, 1, 6).reshape(2, 3).astype(np.float64),
            "b": np.array([[True, False, True], [False, True, False]]),
            "i": np.arange(6, dtype=np.int32).reshape(2, 3),
        }
        spec = make_spec(tree, batch_ndim=2)

        # complex leaves must be BORN on device (they cannot cross the
        # boundary) — build them inside the program, as production does
        import jax.numpy as jnp

        @jax.jit
        def build_and_pack(cri, f, b, i):
            t = {"c": jax.lax.complex(cri[..., 0], cri[..., 1]),
                 "f": f.astype(jnp.float64), "b": b, "i": i}
            return pack_tree(t, spec)

        from gnss_sdr_tpu.utils.cplx import host_to_ri

        packed = np.asarray(build_and_pack(
            host_to_ri(tree["c"]), tree["f"].astype(np.float32),
            tree["b"], tree["i"],
        ))
        out = unpack_tree(packed, spec)
        assert np.allclose(out["c"], tree["c"])
        assert np.allclose(out["f"], tree["f"])
        assert (out["b"] == tree["b"]).all() and (out["i"] == tree["i"]).all()
        return "c64/f64/bool/i32 exact"

    failures = RESULTS.count(False)
    print(f"\n{len(RESULTS) - failures}/{len(RESULTS)} stages passed",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""Channel-blocked fused kernel vs the per-channel full kernel.

The blocked kernel (ops/track_kernel_blocked.py) must reproduce
make_fused_tracker_full's per-period outputs to f32 rounding across
every mode the live receiver uses: plain CDMA, VEML pilot+secondary with
extended integration, long-code NH pilot, FDMA, order-3 filters, and
back-to-back launches (state round-trip). Reference analog:
dll_pll_veml_tracking.cc states 2-4 (:1898-2260).
"""

import numpy as np
import jax.numpy as jnp

from gnss_sdr_tpu.ops.correlator import pack_code_table
from gnss_sdr_tpu.ops.track_kernel import (
    S_ACC0,
    make_fused_tracker_full,
    pack_code_table_ext,
)
from gnss_sdr_tpu.ops.track_kernel_blocked import make_fused_tracker_blocked

CHECK_LANES = [0, 1, 2, 3, 10, 11, 12, 13, 14, 17, 20, 21, 22, 23,
               32, 33, 34, 35, 36, 37]


def _build_pair(C, K, L, t, taps, fs, **kw):
    nmax = int(np.ceil(fs * L / 1.023e6)) + 64
    args = (K, nmax, L, t, np.asarray(taps, np.float32))
    kw = dict(fs=fs, code_rate_cps=1.023e6, carrier_freq_hz=1575.42e6,
              interpret=True, **kw)
    return (make_fused_tracker_full(*args, **kw),
            make_fused_tracker_blocked(*args, **kw), nmax)


def _run_pair(full, blk, C, L, nmax, K, *, pilot=False, sp=1, sdn=1,
              lcm=1, fdma=False, extend=1, seed=0, launches=1):
    rng = np.random.default_rng(seed)
    codes = np.sign(rng.normal(size=(C, L))).astype(np.float32)
    codes[codes == 0] = 1.0
    dcodes = np.sign(rng.normal(size=(C, L))).astype(np.float32)
    dcodes[dcodes == 0] = 1.0
    if full.replica == "window2":
        cq, dq = jnp.asarray(pack_code_table_ext(codes)), jnp.asarray(
            pack_code_table_ext(dcodes))
    else:
        cq, dq = jnp.asarray(pack_code_table(codes)), jnp.asarray(
            pack_code_table(dcodes))
    cb, db = jnp.asarray(blk.pack(codes)), jnp.asarray(blk.pack(dcodes))
    wrows = (nmax * (K * launches + 2)) // 128 + blk.pad_rows + 8
    wr = jnp.asarray(rng.normal(size=(wrows, 128)).astype(np.float32))
    wi = jnp.asarray(rng.normal(size=(wrows, 128)).astype(np.float32))
    ns = blk.num_scalars
    ntaps = (ns - S_ACC0 - 1) // 2
    scal = np.zeros((C, ns), np.float32)
    scal[:, 0] = np.arange(C) * 37 + 5
    scal[:, 1] = 0.2
    scal[:, 3] = 0.5
    scal[:, 4] = np.linspace(-2500, 2500, C)
    scal[:, 7] = 1
    scal[:, 10] = extend
    scal[:, 13] = np.arange(C) % max(1, lcm)
    scal[:, 14] = 1 if pilot else 0
    scal[:, 15] = 1 if pilot else 0
    scal[:, 16] = 1
    scal[:, 17] = 25.0
    scal[:, 18] = 2.0
    if fdma:
        scal[:, S_ACC0 + 2 * ntaps] = np.linspace(-0.5, 0.5, C)
    secp = jnp.asarray(
        np.sign(rng.normal(size=(C, sp))).astype(np.float32)) if pilot \
        else None
    secd = jnp.asarray(
        np.sign(rng.normal(size=(C, sdn))).astype(np.float32)) if pilot \
        else None

    outs1, outs2 = [], []
    s1 = s2 = jnp.asarray(scal)
    for _ in range(launches):
        if pilot:
            o1 = np.asarray(full(wr, wi, cq, s1, dq, secp, secd))
            o2 = np.asarray(blk(wr, wi, cb, s2, db, secp, secd))
        else:
            o1 = np.asarray(full(wr, wi, cq, s1))
            o2 = np.asarray(blk(wr, wi, cb, s2))
        outs1.append(o1)
        outs2.append(o2)

        def carry(prev, o):
            last = o[:, -1, :]
            s = np.asarray(prev).copy()
            s[:, 0] = last[:, 17]
            s[:, 1] = last[:, 13]
            s[:, 2] = last[:, 12]
            s[:, 3] = last[:, 14]
            s[:, 4] = last[:, 11]
            s[:, 5] = last[:, 15]
            s[:, 6] = last[:, 16]
            s[:, 8] = last[:, 18]
            s[:, 9] = last[:, 19]
            s[:, 11] = last[:, 37]
            s[:, 12] = last[:, 21] * (1.0 - last[:, 20])
            s[:, 13] = last[:, 36]
            s[:, 19] = last[:, 38]
            s[:, 20] = last[:, 39]
            s[:, 21] = last[:, 32] * (1.0 - last[:, 34])
            s[:, 22] = last[:, 33] * (1.0 - last[:, 34])
            s[:, 23] = last[:, 35] * (1.0 - last[:, 34])
            for ti in range(ntaps):
                s[:, S_ACC0 + 2 * ti] = (
                    last[:, 22 + 2 * ti] * (1.0 - last[:, 20]))
                s[:, S_ACC0 + 2 * ti + 1] = (
                    last[:, 22 + 2 * ti + 1] * (1.0 - last[:, 20]))
            return jnp.asarray(s)

        s1 = carry(s1, o1)
        s2 = carry(s2, o2)
    return np.concatenate(outs1, axis=1), np.concatenate(outs2, axis=1)


def _assert_close(o1, o2, tol=5e-5):
    for ln in CHECK_LANES:
        a, b = o1[:, :, ln], o2[:, :, ln]
        scale = max(1e-6, float(np.abs(a).max()))
        rel = float(np.abs(a - b).max()) / scale
        assert rel < tol, f"lane {ln}: rel diff {rel:.3e}"


def test_blocked_matches_full_gps():
    full, blk, nmax = _build_pair(6, 8, 1023, 3, [-0.25, 0, 0.25], 2.6e6)
    o1, o2 = _run_pair(full, blk, 6, 1023, nmax, 8)
    _assert_close(o1, o2)


def test_blocked_matches_full_two_launch_carry():
    full, blk, nmax = _build_pair(5, 6, 1023, 3, [-0.25, 0, 0.25], 2.6e6)
    o1, o2 = _run_pair(full, blk, 5, 1023, nmax, 6, launches=2, extend=2)
    _assert_close(o1, o2)


def test_blocked_matches_full_e1bc_pilot_veml():
    full, blk, nmax = _build_pair(
        6, 10, 8184, 5, [-0.5, -0.25, 0, 0.25, 0.5], 4.0e6,
        track_pilot=True, sec_len_pilot=25, sec_len_data=4, sec_lcm=100)
    o1, o2 = _run_pair(full, blk, 6, 8184, nmax, 10, pilot=True, sp=25,
                       sdn=4, lcm=100, extend=4)
    _assert_close(o1, o2)


def test_blocked_matches_full_l5_pilot_long_code():
    full, blk, nmax = _build_pair(
        4, 8, 10230, 3, [-0.5, 0, 0.5], 12.5e6,
        track_pilot=True, sec_len_pilot=100, sec_len_data=10, sec_lcm=100)
    o1, o2 = _run_pair(full, blk, 4, 10230, nmax, 8, pilot=True, sp=100,
                       sdn=10, lcm=100, extend=2, seed=3)
    # 125k samples/period: f32 reduction-order noise scales with sqrt(N)
    # and feeds back through the DLL over 8 periods (a wrong chip would
    # show ~1e-2 in the first period alone)
    _assert_close(o1[:, :2], o2[:, :2], tol=2e-4)
    _assert_close(o1, o2, tol=2e-3)


def test_blocked_matches_full_fdma():
    full, blk, nmax = _build_pair(
        6, 8, 511, 3, [-0.25, 0, 0.25], 3.6e6, fdma=True)
    o1, o2 = _run_pair(full, blk, 6, 511, nmax, 8, fdma=True, seed=5)
    _assert_close(o1, o2)


def test_blocked_matches_full_order3():
    full, blk, nmax = _build_pair(
        6, 8, 1023, 3, [-0.25, 0, 0.25], 2.6e6, pll_order=3, dll_order=3)
    o1, o2 = _run_pair(full, blk, 6, 1023, nmax, 8, seed=7)
    _assert_close(o1, o2)


def test_blocked_pads_odd_channel_count():
    # C=5 is padded to 8 sublanes internally; outputs slice back to 5
    full, blk, nmax = _build_pair(5, 4, 1023, 3, [-0.25, 0, 0.25], 2.6e6)
    o1, o2 = _run_pair(full, blk, 5, 1023, nmax, 4, seed=9)
    assert o2.shape[0] == 5
    _assert_close(o1, o2)

"""Pallas fused tracking correlator: carrier wipeoff + interpolated code
replica + multi-tap dot products, one kernel launch per scan step.

Why this exists: XLA on this TPU runtime lowers `take_along_axis` (the
code-replica lookup, [C, T, N] indices into per-channel code tables) to a
~10 ns/element serial gather — 2.5 ms per tracking step, 1000x the cost
of every other op in the step and the entire receiver's bottleneck.
Mosaic's lane-wise gather (`take_along_axis` on the 128-lane axis) is a
true VPU shuffle; decomposing the chip index as (row q = idx // 128,
lane r = idx % 128) turns the table lookup into Q row-broadcast lane
gathers + selects, measured ~1000x faster than the XLA path.

The kernel reproduces dll_pll.track_block's correlation math exactly
(soft chip-transition ramps included); loop closure, accumulation, and
the f64 NCO bookkeeping stay in XLA.

Reference analog: the volk_gnsssdr rotator-dot-product kernels
(volk_gnsssdr_32fc_32f_high_dynamic_rotator_dot_prod_32fc_xn) — this is
the TPU's version of "the one hand-written kernel that matters".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pad128(n: int) -> int:
    return ((n + LANES - 1) // LANES) * LANES


def pack_code_table(codes: np.ndarray) -> np.ndarray:
    """[C, L] chips -> [C, Q, 128] row-major padded table (pad chips 0)."""
    c, l = codes.shape
    lp = _pad128(l)
    out = np.zeros((c, lp), dtype=np.float32)
    out[:, :l] = codes
    return out.reshape(c, lp // LANES, LANES)


def make_correlator(
    n_samples: int,          # max samples per step (conf.max_step_samples)
    code_len: int,           # chips per code period
    num_taps: int,
    tap_offsets: np.ndarray,  # [T] chips
    track_pilot: bool = False,
    interp_code: bool = True,
    interpret: bool | None = None,
):
    """Build the fused correlator.

    Returns f(xr [C, NPAD], xi [C, NPAD], codes [C, Q, 128],
    data_codes [C, Q, 128], scalars [C, 8]) -> [C, 1, 128] f32 with lanes
    [2t, 2t+1] = corr[t].re/.im and lanes [2T, 2T+1] = data prompt.

    scalars lanes: [rem_code_phase chips, code_step chips/sample,
    phase0 rad, ph_step rad/sample, n_valid, 0, 0, 0].
    """
    npad = _pad128(n_samples)
    rows = npad // LANES
    lpad = _pad128(code_len)
    q_rows = lpad // LANES
    t = num_taps
    offs = [float(o) for o in np.asarray(tap_offsets, np.float32)]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def _replica(code_ref, tap_ph):
        """Chip lookup for [rows, 128] code phases via the (row, lane)
        decomposition; returns (chips, floor(tap_ph))."""
        ph_floor = jnp.floor(tap_ph)
        # floored mod entirely in f32 (integer //-promotion recurses in
        # the Mosaic tracer); chip counts stay far below f32's 2^24 exact
        # integer range
        lf = jnp.float32(code_len)
        idx = ph_floor - jnp.floor(ph_floor / lf) * lf
        q = jnp.floor(idx * jnp.float32(1.0 / LANES))
        r = (idx - q * LANES).astype(jnp.int32)
        out = jnp.zeros(tap_ph.shape, jnp.float32)
        for qq in range(q_rows):
            opr = jnp.broadcast_to(code_ref[0, qq, :][None, :],
                                   (tap_ph.shape[0], LANES))
            g = jnp.take_along_axis(opr, r, axis=1)
            out = out + jnp.where(q == jnp.float32(qq), g, 0.0)
        return out, ph_floor

    def kernel(s_ref, xr_ref, xi_ref, code_ref, dcode_ref, o_ref):
        ch = pl.program_id(0)
        rem = s_ref[ch, 0]
        step = s_ref[ch, 1]
        phase0 = s_ref[ch, 2]
        ph_step = s_ref[ch, 3]
        n_valid = s_ref[ch, 4]

        k = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
             + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
             ).astype(jnp.float32)
        mask = (k < n_valid).astype(jnp.float32)

        ph = phase0 + ph_step * k
        cw = jnp.cos(ph)
        sw = jnp.sin(ph)
        xr = xr_ref[0]                              # [rows, 128]
        xi = xi_ref[0]
        # x * e^{-j ph}: (xr + j xi)(cos - j sin)
        wr = (xr * cw + xi * sw) * mask
        wi = (xi * cw - xr * sw) * mask

        cph = rem + step * k                        # chips

        # stacking all (tap, interp-position) phases into one big tensor
        # amortizes the Q-row gather set (the VPU is issue-bound on small
        # tiles), but its VMEM footprint scales with 3*T*rows — long
        # windows (E1 at 8 Msps: 251 rows) must fall back to per-tap
        # processing or the kernel blows the 16 MB scoped-VMEM limit
        stack_ok = 3 * t * rows <= 192

        def tap_single(code_block, off):
            # row-chunked: the Q-row gather loop's live buffers scale with
            # chunk_rows * Q — chunking keeps long windows (E1/L5) inside
            # the 16 MB scoped-VMEM budget
            chunk = max(8, min(rows, 2048 // max(q_rows, 1)))
            re_acc = jnp.float32(0.0)
            im_acc = jnp.float32(0.0)
            for r0 in range(0, rows, chunk):
                r1 = min(r0 + chunk, rows)
                tap_ph = cph[r0:r1] + off
                c0, ph_floor = _replica(code_block, tap_ph)
                if interp_code:
                    cm, _ = _replica(code_block, tap_ph - 1.0)
                    cp, _ = _replica(code_block, tap_ph + 1.0)
                    frac = tap_ph - ph_floor
                    ramp_in = jnp.clip(frac / step + 0.5, 0.0, 1.0)
                    ramp_out = jnp.clip((frac - 1.0) / step + 0.5, 0.0, 1.0)
                    ctap = (cm + (c0 - cm) * ramp_in
                            + (cp - c0) * ramp_out)
                else:
                    ctap = c0
                re_acc = re_acc + jnp.sum(wr[r0:r1] * ctap)
                im_acc = im_acc + jnp.sum(wi[r0:r1] * ctap)
            return re_acc, im_acc

        def multi_corr(code_block, offsets_list):
            if not stack_ok:
                return [tap_single(code_block, off) for off in offsets_list]
            nt = len(offsets_list)
            tap_ph = jnp.concatenate(
                [cph + off for off in offsets_list], axis=0)  # [nt*rows,128]
            if interp_code:
                big_ph = jnp.concatenate(
                    [tap_ph - 1.0, tap_ph, tap_ph + 1.0], axis=0)
                big, big_floor = _replica(code_block, big_ph)
                m = nt * rows
                cm = big[0:m]
                c0 = big[m:2 * m]
                cp = big[2 * m:3 * m]
                ph_floor = big_floor[m:2 * m]
                frac = tap_ph - ph_floor
                ramp_in = jnp.clip(frac / step + 0.5, 0.0, 1.0)
                ramp_out = jnp.clip((frac - 1.0) / step + 0.5, 0.0, 1.0)
                ctap = cm + (c0 - cm) * ramp_in + (cp - c0) * ramp_out
            else:
                ctap, _ = _replica(code_block, tap_ph)
            res = []
            for ti in range(nt):
                blk = ctap[ti * rows:(ti + 1) * rows]
                res.append((jnp.sum(wr * blk), jnp.sum(wi * blk)))
            return res

        # scalar results scattered to lanes via iota masks (Mosaic has no
        # scatter primitive)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1
                                        ).astype(jnp.float32)
        out = jnp.zeros((1, LANES), jnp.float32)
        taps_ri = multi_corr(code_ref, offs)
        for ti, (re, im) in enumerate(taps_ri):
            out = (out + jnp.where(lane == 2 * ti, re, 0.0)
                   + jnp.where(lane == 2 * ti + 1, im, 0.0))
        if track_pilot:
            (re, im), = multi_corr(dcode_ref, [offs[t // 2]])
            out = (out + jnp.where(lane == 2 * t, re, 0.0)
                   + jnp.where(lane == 2 * t + 1, im, 0.0))
        o_ref[0] = out

    def build(c_channels: int):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((c_channels, 1, LANES),
                                           jnp.float32),
            grid=(c_channels,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [C, 8]
                pl.BlockSpec((1, rows, LANES), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, LANES), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q_rows, LANES), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q_rows, LANES), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, LANES), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    calls: dict[int, object] = {}

    def correlate(xr, xi, codes_q, dcodes_q, scalars):
        """xr/xi: [C, NPAD] f32; codes_q/dcodes_q: [C, Q, 128] f32;
        scalars: [C, 8] f32 -> [C, 1, 128] f32 lane-packed results."""
        c = xr.shape[0]
        if c not in calls:
            calls[c] = build(c)
        # trace the whole kernel with x64 disabled: the package enables
        # jax x64 globally, which turns grid index maps and gather iotas
        # into int64 ops that Mosaic cannot lower
        with jax.enable_x64(False):
            return calls[c](
                scalars,
                xr.reshape(c, rows, LANES),
                xi.reshape(c, rows, LANES),
                codes_q,
                dcodes_q,
            )

    correlate.npad = npad
    correlate.num_taps = t
    correlate.q_rows = q_rows
    return correlate


# NOTE: a channel-batched single-grid-cell variant (G channels' rows
# stacked into one [G*rows, 128] tensor per vector op) was prototyped and
# validated in interpret mode, but the compiled kernel trips a
# FAILED_PRECONDITION fault in this TPU runtime (suspected jnp.repeat /
# non-128 lane block lowering); see git history (make_correlator_batched)
# to revive it on a runtime where it executes.

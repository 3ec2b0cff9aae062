"""Batched PCPS (parallel code-phase search) acquisition.

The reference engine (src/algorithms/acquisition/gnuradio_blocks/
pcps_acquisition.cc) loops serially over Doppler bins per channel
(doppler_grid(), pcps_acquisition.cc:522-560): wipeoff -> FFT -> x conj(code
FFT) -> IFFT -> |.|^2, then CFAR / peak-ratio detection
(pcps_acquisition.cc:409-516).

Here the whole (channel, doppler) hypothesis grid is one batched tensor
program (SURVEY.md §2.4 P3/P4): a single jitted call computes

    grid[c, d, :] = |IFFT( FFT(x[c] * wipeoff[d]) * conj(CODE_FFT[prn[c]]) )|^2

for all channels and Doppler bins at once, chunked over the Doppler axis with
``lax.scan`` to bound HBM usage. PRN selection is a gather into a precomputed
code-FFT table, so satellite reassignment never triggers recompilation.

Supported reference features: coherent integration over multiple code
periods, non-coherent dwell accumulation (``max_dwells``), the
``bit_transition_flag`` double-length zero-padded-code FFT
(pcps_acquisition.cc:142-156), both detection statistics
(``max_to_input_power_statistic`` and ``first_vs_second_peak_statistic``),
Pfa-derived thresholds, and the two-step fine-Doppler zoom
(``make_2_steps`` / Acq_Conf doppler_step2, acq_conf.h:50,62,74).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.codes.resample import resample_code
from gnss_sdr_tpu.ops.fft import fft as mxu_fft, ifft as mxu_ifft
from gnss_sdr_tpu.utils.cplx import dev_combine, host_to_ri
from gnss_sdr_tpu.utils.transfer import fetch


@dataclass(frozen=True)
class AcqConfig:
    """Acquisition parameters (reference: acquisition/libs/acq_conf.h:38-86)."""

    fs: float
    code_length_chips: int
    code_rate_cps: float
    doppler_max_hz: float = 5000.0
    doppler_step_hz: float = 250.0
    doppler_min_hz: float | None = None  # default: -doppler_max
    coherent_integration_periods: int = 1
    max_dwells: int = 1
    bit_transition_flag: bool = False
    threshold: float = 0.0               # 0 -> derive from pfa
    pfa: float = 1e-3
    statistic: str = "max_to_input_power"  # or "peak1_peak2"
    make_two_steps: bool = False
    doppler_step2_hz: float = 125.0
    num_doppler_bins_step2: int = 4
    doppler_chunk: int = 8               # doppler bins per scan chunk

    @property
    def samples_per_code(self) -> int:
        return int(round(self.fs * self.code_length_chips / self.code_rate_cps))

    @property
    def coherent_samples(self) -> int:
        return self.samples_per_code * self.coherent_integration_periods

    @property
    def fft_size(self) -> int:
        """Correlation FFT length, rounded up to a power of two.

        XLA's TPU FFT lowers non-power-of-two lengths through a dense DFT
        matmul (O(N^2) HBM — a 20 ms L2C window at 2.046 Msps would
        materialize a 26 GB [81840, 81840] matrix); power-of-two lengths
        take the O(N log N) path. The local code is zero-padded to the FFT
        length (linear correlation), so the extra bins only add unsearched
        lags — peak search stays within one code period and the Pfa cell
        count is unchanged.

        Without bit_transition the window must still cover ncoh + one code
        period of signal so every searched lag is a full linear correlation
        (the classic circular trick is only exact when the FFT length is a
        whole number of code periods, which power-of-two lengths aren't).
        """
        n = self.coherent_samples
        base = 2 * n if self.bit_transition_flag else n + self.samples_per_code
        return 1 << (base - 1).bit_length()

    @property
    def dwell_stride(self) -> int:
        """Sample stride between non-coherent dwell windows: the largest
        whole number of code periods <= fft_size. A stride that is not a
        whole number of periods would shift the correlation peak's lag from
        dwell to dwell (fft_size is rounded up to a power of two, which is
        never a whole period count), smearing the accumulated peak."""
        return self.samples_per_code * (self.fft_size // self.samples_per_code)

    @property
    def input_samples(self) -> int:
        """Samples consumed per acquisition attempt (all dwells)."""
        return self.fft_size * self.max_dwells

    def doppler_grid_hz(self) -> np.ndarray:
        dmin = -self.doppler_max_hz if self.doppler_min_hz is None else self.doppler_min_hz
        return np.arange(dmin, self.doppler_max_hz + self.doppler_step_hz / 2,
                         self.doppler_step_hz, dtype=np.float64)


@dataclass
class AcqResults:
    """Per-channel acquisition outcome (-> Gnss_Synchro Acq_* fields)."""

    detected: np.ndarray        # [C] bool
    test_statistic: np.ndarray  # [C] float
    delay_samples: np.ndarray   # [C] float, code delay in samples [0, spc)
    doppler_hz: np.ndarray      # [C] float
    input_power: np.ndarray     # [C] float
    threshold: float


def threshold_from_pfa(conf: AcqConfig, num_bins: int) -> float:
    """Detection threshold for the normalized max statistic at the given Pfa.

    Under H0 each normalized grid cell is the sum of ``max_dwells`` unit
    exponentials (chi^2 with 2K dof, scaled); the max over N cells crosses
    ``th`` with prob pfa when P(cell > th) = 1-(1-pfa)^(1/N) ~= pfa/N.
    Reference analog: pcps_acquisition.cc threshold from Pfa + the adapters'
    calculate_threshold().
    """
    num_cells = num_bins * conf.samples_per_code
    p_cell = 1.0 - (1.0 - conf.pfa) ** (1.0 / num_cells)
    k = conf.max_dwells
    # invert regularized upper incomplete gamma Q(k, th) = p_cell by bisection
    lo, hi = 0.0, 2000.0

    def q_upper(x: float) -> float:
        # Q(k, x) for integer k: e^-x * sum_{i<k} x^i/i!
        s = 0.0
        term = 1.0
        for i in range(k):
            if i > 0:
                term *= x / i
            s += term
        return math.exp(-x) * s

    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if q_upper(mid) > p_cell:
            lo = mid
        else:
            hi = mid
    # normalize: statistic is per-dwell-average, threshold likewise
    return 0.5 * (lo + hi) / k


class PcpsAcquisition:
    """Batched PCPS engine over a fixed PRN table.

    Build once per (signal, sampling-rate, config); call with a [C, input]
    sample block and per-channel PRN indices into the table.
    """

    def __init__(
        self,
        conf: AcqConfig,
        code_table: np.ndarray,   # [P, code_length] chips (+-1), float
        prns: list[int],          # PRN id per table row (for reporting)
        mesh=None,
        freq_offset_table: np.ndarray | None = None,  # [P] Hz (FDMA)
    ) -> None:
        """`mesh`: optional jax.sharding.Mesh with a "ch" axis — the
        (channel/PRN) hypothesis batch shards across devices with the code
        FFT table and Doppler grid replicated (SURVEY.md §2.4 P3/P10);
        the caller pads the batch to a multiple of the mesh size.

        `freq_offset_table`: for FDMA signals (GLONASS), the per-table-row
        carrier offset from band center; the search grid for row p becomes
        offset[p] + doppler_grid, with the reported Doppler excluding the
        deterministic offset."""
        self.conf = conf
        self.prns = list(prns)
        self.mesh = mesh
        self._offsets = (
            None if freq_offset_table is None
            else jax.device_put(
                np.asarray(freq_offset_table, dtype=np.float32)
            )
        )
        spc = conf.samples_per_code
        ncoh = conf.coherent_samples
        fft_size = conf.fft_size

        sampled = np.stack(
            [
                np.tile(
                    resample_code(code_table[p], conf.fs, conf.code_rate_cps, spc),
                    conf.coherent_integration_periods,
                )
                for p in range(code_table.shape[0])
            ]
        ).astype(np.float32)
        if fft_size != ncoh:  # bit_transition: zero-pad the local code
            pad = np.zeros((sampled.shape[0], fft_size - ncoh), dtype=np.float32)
            sampled = np.concatenate([sampled, pad], axis=1)
        # Kept on device as float32 re/im lanes and passed as jit *arguments*
        # (complex64 cannot cross the host<->device boundary on this runtime,
        # and tracing a committed device array as a closure constant forces a
        # device->host copy — see utils/cplx.py).
        self._codes_fft_conj = jax.device_put(
            host_to_ri(np.conj(np.fft.fft(sampled, axis=1)).astype(np.complex64))
        )

        dop = conf.doppler_grid_hz()
        self._doppler_hz = dop
        # pad doppler grid to a multiple of the chunk size with repeats
        chunk = conf.doppler_chunk
        n_pad = (-len(dop)) % chunk
        dop_padded = np.concatenate([dop, np.repeat(dop[-1:], n_pad)])
        self._dop_padded = jax.device_put(dop_padded.astype(np.float32))
        self._num_chunks = len(dop_padded) // chunk

        nb = len(dop)
        if conf.threshold > 0:
            self.threshold = conf.threshold
        elif conf.statistic == "peak1_peak2":
            # H0 model: M1 = max over ALL (bin, lag) cells ~ Gumbel around
            # ln(Nall); M2 = max over the winning bin's lags only ~ Gumbel
            # around ln(Nbin). P(M1 > r*M2) ~= Gamma(1+r) * Nall *
            # Nbin^-r (integrating the Gumbel density of M2); solve for r
            # by fixed point.
            nbin = conf.samples_per_code
            nall = nb * nbin
            r = 2.0
            for _ in range(16):
                r = (
                    math.log(nall)
                    + math.log(math.gamma(1.0 + r) / conf.pfa)
                ) / math.log(nbin)
            self.threshold = r
        else:
            self.threshold = threshold_from_pfa(conf, nb)
        if mesh is None:
            self._jit_acquire = jax.jit(self._acquire)
            self._jit_refine = jax.jit(self._refine)
            self._jit_second_peak = jax.jit(self._second_peak)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            row = NamedSharding(mesh, P("ch"))
            row2 = NamedSharding(mesh, P("ch", None))
            rep = NamedSharding(mesh, P())
            off_sh = (rep,) if self._offsets is not None else (None,)
            self._jit_acquire = jax.jit(
                self._acquire,
                in_shardings=(row2, row, rep, rep) + off_sh,
                out_shardings=(row, row, row, row),
            )
            self._jit_refine = jax.jit(
                self._refine,
                in_shardings=(row2, row, row, rep) + off_sh,
                out_shardings=(row, row, row),
            )
            self._jit_second_peak = jax.jit(
                self._second_peak,
                in_shardings=(row2, row, row, row, rep) + off_sh,
                out_shardings=row,
            )

    # ------------------------------------------------------------------ core
    def _dwell_windows(self, x: jnp.ndarray) -> jnp.ndarray:
        """[C, input] -> [C, K, F] dwell windows at whole-code-period stride
        (see AcqConfig.dwell_stride)."""
        conf = self.conf
        if conf.max_dwells == 1:
            return x[:, None, : conf.fft_size]
        s = conf.dwell_stride
        return jnp.stack(
            [x[:, k * s : k * s + conf.fft_size]
             for k in range(conf.max_dwells)],
            axis=1,
        )

    def _grid_chunk(self, x: jnp.ndarray, cfc: jnp.ndarray, dop: jnp.ndarray,
                    off: jnp.ndarray | None = None) -> jnp.ndarray:
        """Correlation grid for one Doppler chunk.

        x:   [C, K, F] complex64 input blocks (K dwells)
        cfc: [C, F] conj code FFT
        dop: [B] doppler bins
        off: optional [C] per-channel FDMA carrier offsets (Hz)
        returns [C, B, spc] non-coherently accumulated magnitude^2 (f32).
        """
        conf = self.conf
        n = jnp.arange(conf.fft_size, dtype=jnp.float32)
        if off is None:
            phase = (
                -2.0 * jnp.pi / np.float32(conf.fs)
            ) * dop[:, None] * n[None, :]
            wipe = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))  # [B, F]
            xw = x[:, :, None, :] * wipe[None, None, :, :]      # [C, K, B, F]
        else:
            f = dop[None, :, None] + off[:, None, None]         # [C, B, 1]
            phase = (-2.0 * jnp.pi / np.float32(conf.fs)) * f * n[None, None, :]
            wipe = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))  # [C, B, F]
            xw = x[:, :, None, :] * wipe[:, None, :, :]         # [C, K, B, F]
        # MXU-matmul FFTs (ops/fft.py): XLA's FFT op is unusable on this
        # backend, and the matmul formulation puts the O(N log N) work on
        # the systolic array anyway.
        corr = mxu_ifft(mxu_fft(xw) * cfc[:, None, None, :])
        mag2 = jnp.abs(corr.astype(jnp.complex64)) ** 2         # [C, K, B, F]
        mag2 = mag2.sum(axis=1)                                 # [C, B, F] dwell accumulate
        # valid code delays: first samples_per_code lags (peak repeats each
        # code period; bit_transition pad region excluded)
        return mag2[:, :, : conf.samples_per_code]

    def _acquire(self, x_ri: jnp.ndarray, prn_idx: jnp.ndarray,
                 codes_fft_conj: jnp.ndarray, dop_padded: jnp.ndarray,
                 offsets: jnp.ndarray | None = None):
        """Full coarse search. x_ri: [C, K*F, 2] f32, prn_idx: [C] int32."""
        conf = self.conf
        x = dev_combine(x_ri)
        C = x.shape[0]
        xk = self._dwell_windows(x)
        cfc = dev_combine(codes_fft_conj)[prn_idx]  # [C, F]
        off = None if offsets is None else offsets[prn_idx]
        chunk = conf.doppler_chunk
        dop_chunks = dop_padded.reshape(self._num_chunks, chunk)

        def step(carry, dop):
            best_val, best_dop, best_lag = carry
            g = self._grid_chunk(xk, cfc, dop, off)            # [C, B, spc]
            flat = g.reshape(C, -1)
            idx = jnp.argmax(flat, axis=1)
            val = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
            d_i = idx // conf.samples_per_code
            lag = (idx % conf.samples_per_code).astype(jnp.int32)
            better = val > best_val
            return (
                jnp.where(better, val, best_val),
                jnp.where(better, dop[d_i], best_dop),
                jnp.where(better, lag, best_lag),
            ), None

        init = (
            jnp.full((C,), -jnp.inf, dtype=jnp.float32),
            jnp.zeros((C,), dtype=jnp.float32),
            jnp.zeros((C,), dtype=jnp.int32),
        )
        (best_val, best_dop, best_lag), _ = jax.lax.scan(step, init, dop_chunks)
        input_power = jnp.mean(jnp.abs(x) ** 2, axis=1)        # [C]
        return best_val, best_dop, best_lag, input_power

    def _second_peak(self, x_ri: jnp.ndarray, prn_idx: jnp.ndarray,
                     best_dop: jnp.ndarray, best_lag: jnp.ndarray,
                     codes_fft_conj: jnp.ndarray,
                     offsets: jnp.ndarray | None = None) -> jnp.ndarray:
        """Second-largest delay-domain peak in each channel's best Doppler
        bin, excluding +-1 chip around the main peak (reference
        first_vs_second_peak_statistic, pcps_acquisition.cc:452-516)."""
        conf = self.conf
        x = dev_combine(x_ri)
        C = x.shape[0]
        xk = self._dwell_windows(x)
        cfc = dev_combine(codes_fft_conj)[prn_idx]
        off = (jnp.zeros((C,), jnp.float32) if offsets is None
               else offsets[prn_idx])
        excl = int(np.ceil(conf.fs / conf.code_rate_cps))  # 1 chip, samples
        spc = conf.samples_per_code
        lags = jnp.arange(spc, dtype=jnp.int32)

        def one(xc, cf, d, lag, o):
            g = self._grid_chunk(
                xc[None], cf[None], (d + o)[None]
            )[0, 0]                                            # [spc]
            dist = jnp.minimum((lags - lag) % spc, (lag - lags) % spc)
            return jnp.max(jnp.where(dist <= excl, -jnp.inf, g))

        return jax.vmap(one)(xk, cfc, best_dop, best_lag, off)

    def _refine(self, x_ri: jnp.ndarray, prn_idx: jnp.ndarray, center_dop: jnp.ndarray,
                codes_fft_conj: jnp.ndarray,
                offsets: jnp.ndarray | None = None,
                step2_hz: jnp.ndarray | float | None = None):
        """Second-step narrow Doppler zoom around per-channel coarse peaks
        (reference make_2_steps / num_doppler_bins_step2). `step2_hz`
        optionally overrides the configured fine step at call time (used by
        the iterative fine-doppler engine, acquisition/engines.py)."""
        conf = self.conf
        x = dev_combine(x_ri)
        C = x.shape[0]
        xk = self._dwell_windows(x)
        cfc = dev_combine(codes_fft_conj)[prn_idx]
        fdma_off = (jnp.zeros((C,), jnp.float32) if offsets is None
                    else offsets[prn_idx])
        nb2 = 2 * conf.num_doppler_bins_step2 + 1
        step = (np.float32(conf.doppler_step2_hz) if step2_hz is None
                else jnp.asarray(step2_hz, jnp.float32))
        offs = (jnp.arange(nb2, dtype=jnp.float32)
                - conf.num_doppler_bins_step2) * step
        dops = center_dop[:, None] + fdma_off[:, None] + offs[None, :]  # [C, B2]

        def one(xc, cf, dc, o):
            g = self._grid_chunk(xc[None], cf[None], dc)[0]    # [B2, spc]
            flat = g.reshape(-1)
            idx = jnp.argmax(flat)
            # reported Doppler excludes the deterministic FDMA offset
            return (flat[idx], dc[idx // conf.samples_per_code] - o,
                    (idx % conf.samples_per_code).astype(jnp.int32))

        return jax.vmap(one)(xk, cfc, dops, fdma_off)

    # ------------------------------------------------------------------- API
    def acquire(self, x, prn_idx) -> AcqResults:
        """Run acquisition. x: [C, input_samples] c64; prn_idx: [C] into table."""
        conf = self.conf
        x = np.asarray(x, dtype=np.complex64)
        prn_idx = np.asarray(prn_idx, dtype=np.int32)
        n_real = x.shape[0]
        # bucket the hypothesis batch to multiples of 8: the number of
        # untracked PRNs changes as channels fill, and every distinct
        # batch size would otherwise recompile the grid program (seconds
        # per shape on a remote-compile runtime)
        pad8 = (-n_real) % 8
        if pad8 and n_real > 0:
            x = np.concatenate([x, np.repeat(x[-1:], pad8, axis=0)])
            prn_idx = np.concatenate(
                [prn_idx, np.repeat(prn_idx[-1:], pad8)])
        if self.mesh is not None:
            # pad the hypothesis batch to the mesh size (repeat the last
            # row; the surplus results are dropped below)
            n_dev = self.mesh.devices.size
            pad = (-x.shape[0]) % n_dev
            if pad:
                x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
                prn_idx = np.concatenate(
                    [prn_idx, np.repeat(prn_idx[-1:], pad)])
        x = jnp.asarray(host_to_ri(x))          # [C, N, 2] f32 on device
        prn_idx = jnp.asarray(prn_idx)
        val, dop, lag, power = self._jit_acquire(
            x, prn_idx, self._codes_fft_conj, self._dop_padded, self._offsets
        )
        if conf.make_two_steps:
            val, dop, lag = self._jit_refine(
                x, prn_idx, dop, self._codes_fft_conj, self._offsets
            )
        val_np = fetch(val).astype(np.float64)[:n_real]
        power = fetch(power).astype(np.float64)[:n_real]
        if conf.statistic == "peak1_peak2":
            # first vs second delay-domain peak in the winning Doppler bin
            # (reference first_vs_second_peak_statistic)
            p2 = self._jit_second_peak(
                x, prn_idx, dop, lag, self._codes_fft_conj, self._offsets
            )
            p2 = fetch(p2).astype(np.float64)[:n_real]
            stat = val_np / np.maximum(p2, 1e-30)
        else:
            # normalized CFAR statistic: peak / (sigma^2 * N_coh * K);
            # ~Exp(1)-max under H0
            norm = power * conf.coherent_samples * conf.max_dwells
            stat = val_np / np.maximum(norm, 1e-30)
        return AcqResults(
            detected=stat > self.threshold,
            test_statistic=stat,
            delay_samples=fetch(lag).astype(np.float64)[:n_real],
            doppler_hz=fetch(dop).astype(np.float64)[:n_real],
            input_power=power,
            threshold=self.threshold,
        )

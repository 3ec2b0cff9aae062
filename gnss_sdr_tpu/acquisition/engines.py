"""Acquisition engine variants beyond plain PCPS.

Reference analogs (src/algorithms/acquisition/gnuradio_blocks/):
- ``pcps_acquisition_fine_doppler_cc.cc`` — coarse PCPS then an iterative
  Doppler zoom that halves the bin width each pass.
- ``pcps_tong_acquisition_cc.cc`` — Tong sequential detector: an up/down
  counter per cell crossing; declares on ``tong_max``, dismisses on 0.
- ``pcps_quicksync_acquisition_cc.cc`` — QuickSync folding: the coherent
  window is folded by summing segments, shrinking the correlation FFT by
  the folding factor; the delay ambiguity is resolved by direct
  correlation at the candidate lags.
- ``pcps_cccwsr_acquisition_cc.cc`` — CCCWSR (coherent combining of code
  with subcarrier-reconstructed replicas) for Galileo E1 CBOC: correlates
  against code x cos-subcarrier and code x sin-subcarrier replicas and
  combines C_cos +- j C_sin coherently.
- ``gps_l1_ca_pcps_assisted_acquisition.cc`` — narrow Doppler search
  around per-satellite predicted Doppler (A-GNSS assistance).

All variants are thin schedulers over the batched PCPS tensor program
(pcps.py): the (channel x doppler) grid stays one jitted call; the
variant logic (counters, zoom iterations, fold/disambiguate) runs on the
tiny per-channel summaries.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.acquisition.pcps import (
    AcqConfig,
    AcqResults,
    PcpsAcquisition,
    threshold_from_pfa,
)
from gnss_sdr_tpu.codes.resample import resample_code
from gnss_sdr_tpu.ops.fft import fft as mxu_fft, ifft as mxu_ifft
from gnss_sdr_tpu.utils.cplx import dev_combine, host_to_ri
from gnss_sdr_tpu.utils.transfer import fetch


class FineDopplerAcquisition:
    """Iterative Doppler zoom (pcps_acquisition_fine_doppler_cc analog).

    Coarse PCPS at ``conf.doppler_step_hz``, then ``iterations`` refine
    passes, each sweeping ``2*num_doppler_bins_step2+1`` bins around the
    current peak with the step halved every pass. Final Doppler resolution
    is ``doppler_step / 2**iterations``.
    """

    def __init__(self, conf: AcqConfig, code_table: np.ndarray,
                 prns: list[int], iterations: int = 4, mesh=None,
                 freq_offset_table: np.ndarray | None = None) -> None:
        self.iterations = iterations
        self.inner = PcpsAcquisition(
            replace(conf, make_two_steps=False), code_table, prns,
            mesh=mesh, freq_offset_table=freq_offset_table)
        self.conf = self.inner.conf
        self.prns = self.inner.prns
        self.threshold = self.inner.threshold

    def acquire(self, x, prn_idx) -> AcqResults:
        inner = self.inner
        conf = inner.conf
        x = np.asarray(x, dtype=np.complex64)
        prn_idx_np = np.asarray(prn_idx, dtype=np.int32)
        x_ri = jnp.asarray(host_to_ri(x))
        prn_j = jnp.asarray(prn_idx_np)
        val, dop, lag, power = inner._jit_acquire(
            x_ri, prn_j, inner._codes_fft_conj, inner._dop_padded,
            inner._offsets)
        step = conf.doppler_step_hz
        for _ in range(self.iterations):
            step *= 0.5
            val, dop, lag = inner._jit_refine(
                x_ri, prn_j, dop, inner._codes_fft_conj, inner._offsets,
                np.float32(step))
        val_np = fetch(val).astype(np.float64)
        power_np = fetch(power).astype(np.float64)
        norm = power_np * conf.coherent_samples * conf.max_dwells
        stat = val_np / np.maximum(norm, 1e-30)
        return AcqResults(
            detected=stat > self.threshold,
            test_statistic=stat,
            delay_samples=fetch(lag).astype(np.float64),
            doppler_hz=fetch(dop).astype(np.float64),
            input_power=power_np,
            threshold=self.threshold,
        )


class TongAcquisition:
    """Tong sequential detector (pcps_tong_acquisition_cc analog).

    Per attempt (one coherent window), the per-channel counter K increments
    when the normalized peak crosses the per-dwell threshold and decrements
    otherwise. K == ``tong_max`` declares; K == 0 dismisses. The per-dwell
    threshold uses a relaxed Pfa (the sequential test, not the single
    crossing, sets the overall false-alarm rate).
    """

    def __init__(self, conf: AcqConfig, code_table: np.ndarray,
                 prns: list[int], tong_init: int = 1, tong_max: int = 8,
                 max_attempts: int | None = None, mesh=None,
                 freq_offset_table: np.ndarray | None = None) -> None:
        self.tong_init = tong_init
        self.tong_max = tong_max
        self.max_attempts = max_attempts or (4 * tong_max)
        inner_conf = replace(conf, max_dwells=1)
        self.inner = PcpsAcquisition(inner_conf, code_table, prns, mesh=mesh,
                                     freq_offset_table=freq_offset_table)
        self.prns = self.inner.prns
        # per-dwell threshold at a relaxed pfa: each H0 dwell must be likely
        # to decrement (pfa_dwell ~ 0.1 keeps E[K] drifting to 0 fast while
        # an H1 dwell at the design C/N0 crosses nearly always)
        self.dwell_threshold = threshold_from_pfa(
            replace(inner_conf, pfa=0.1), len(inner_conf.doppler_grid_hz()))
        self.threshold = self.dwell_threshold
        self.conf = replace(
            inner_conf,
            max_dwells=self.max_attempts)  # .input_samples covers all attempts

    def acquire(self, x, prn_idx) -> AcqResults:
        """x: [C, >= max_attempts * window] samples; early-exits when all
        channels have declared or dismissed."""
        inner = self.inner
        win = inner.conf.input_samples
        x = np.asarray(x, dtype=np.complex64)
        prn_idx = np.asarray(prn_idx, dtype=np.int32)
        C = x.shape[0]
        K = np.full(C, self.tong_init, dtype=np.int64)
        decided = np.zeros(C, dtype=bool)
        detected = np.zeros(C, dtype=bool)
        best = None
        spc = inner.conf.samples_per_code
        n_attempts = min(self.max_attempts, x.shape[1] // win)
        for a in range(n_attempts):
            res = inner.acquire(x[:, a * win:(a + 1) * win], prn_idx)
            # refer the code delay back to the first sample of x (each
            # attempt window starts a non-integer number of code periods in)
            res.delay_samples = np.mod(res.delay_samples + a * win, spc)
            hit = res.test_statistic > self.dwell_threshold
            K = np.where(~decided & hit, K + 1, K)
            K = np.where(~decided & ~hit, K - 1, K)
            if best is None:
                best = res
            else:  # keep the strongest attempt's delay/Doppler per channel
                better = (res.test_statistic > best.test_statistic) & ~decided
                best.test_statistic = np.where(
                    better, res.test_statistic, best.test_statistic)
                best.delay_samples = np.where(
                    better, res.delay_samples, best.delay_samples)
                best.doppler_hz = np.where(
                    better, res.doppler_hz, best.doppler_hz)
                best.input_power = np.where(
                    better, res.input_power, best.input_power)
            newly_declared = ~decided & (K >= self.tong_max)
            newly_dismissed = ~decided & (K <= 0)
            detected |= newly_declared
            decided |= newly_declared | newly_dismissed
            if decided.all():
                break
        return AcqResults(
            detected=detected,
            test_statistic=best.test_statistic,
            delay_samples=best.delay_samples,
            doppler_hz=best.doppler_hz,
            input_power=best.input_power,
            threshold=self.dwell_threshold,
        )


class QuickSyncAcquisition:
    """Folding acquisition (pcps_quicksync_acquisition_cc analog).

    The coherent window (``folding_factor`` code periods, sampled) is folded
    by summing ``folding_factor`` equal segments, so the correlation FFT is
    ``folding_factor``x shorter; the folded peak gives the code delay modulo
    the segment length, and the true delay is recovered by direct
    correlation of the unfolded window at the candidate lags.
    """

    def __init__(self, conf: AcqConfig, code_table: np.ndarray,
                 prns: list[int], folding_factor: int = 2) -> None:
        self.conf = conf
        self.prns = list(prns)
        f = int(folding_factor)
        self.fold = f
        spc = conf.samples_per_code
        self.seg = spc // f                 # folded segment length
        self.win = self.seg * f             # samples consumed (remainder dropped)
        self.fft_size = 1 << (2 * self.seg - 1).bit_length()
        sampled = np.stack([
            resample_code(code_table[p], conf.fs, conf.code_rate_cps, spc)
            for p in range(code_table.shape[0])
        ]).astype(np.float32)
        self._codes = jax.device_put(sampled)                    # [P, spc]
        # folded local code: sum of the f segments of the sampled period
        folded_code = sampled[:, : self.win].reshape(
            sampled.shape[0], f, self.seg).sum(axis=1)
        pad = np.zeros((sampled.shape[0], self.fft_size - self.seg), np.float32)
        self._codes_fft_conj = jax.device_put(host_to_ri(
            np.conj(np.fft.fft(np.concatenate([folded_code, pad], 1), axis=1))
            .astype(np.complex64)))
        dop = conf.doppler_grid_hz()
        self._doppler_hz = dop
        self._dop = jax.device_put(dop.astype(np.float32))
        # H0 cells = doppler bins x folded lags; folding raises the noise
        # floor (code self-noise), so derive the threshold on the
        # DISAMBIGUATED full-length statistic (standard cell count)
        self.threshold = threshold_from_pfa(
            replace(conf, max_dwells=1), len(dop))
        self._jit = jax.jit(self._acquire)

    def _acquire(self, x_ri, prn_idx, codes_fft_conj, codes, dop):
        conf = self.conf
        x = dev_combine(x_ri)                      # [C, win]
        C = x.shape[0]
        f, seg, spc = self.fold, self.seg, conf.samples_per_code
        n = jnp.arange(self.win, dtype=jnp.float32)
        # wipe off each Doppler hypothesis BEFORE folding (the fold sums
        # across segments, so residual carrier must be removed first)
        phase = (-2.0 * jnp.pi / np.float32(conf.fs)) * dop[:, None] * n[None, :]
        wipe = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))   # [B, win]
        xw = x[:, None, :] * wipe[None, :, :]                    # [C, B, win]
        folded = xw.reshape(C, dop.shape[0], f, seg).sum(axis=2)
        folded = jnp.pad(folded,
                         ((0, 0), (0, 0), (0, self.fft_size - seg)))
        cfc = dev_combine(codes_fft_conj)[prn_idx]               # [C, F]
        corr = mxu_ifft(mxu_fft(folded) * cfc[:, None, :])
        mag2 = jnp.abs(corr.astype(jnp.complex64))[..., :seg] ** 2
        flat = mag2.reshape(C, -1)
        idx = jnp.argmax(flat, axis=1)
        d_i = idx // seg
        lag_mod = (idx % seg).astype(jnp.int32)                  # delay mod seg
        best_dop = dop[d_i]
        # ---- disambiguate: direct correlation at the f candidate lags -----
        ph1 = (-2.0 * jnp.pi / np.float32(conf.fs)) * best_dop[:, None] * n[None, :]
        xw1 = x * jax.lax.complex(jnp.cos(ph1), jnp.sin(ph1))    # [C, win]
        code_c = codes[prn_idx]                                  # [C, spc]
        m = jnp.arange(f, dtype=jnp.int32)
        cand = lag_mod[:, None] + m[None, :] * seg               # [C, f]
        k_idx = jnp.arange(self.win, dtype=jnp.int32)
        gather_idx = jnp.mod(
            k_idx[None, None, :] - cand[:, :, None], spc)        # [C, f, win]
        creps = jnp.take_along_axis(
            code_c[:, None, :].repeat(f, axis=1), gather_idx, axis=2)
        cm = jnp.abs(jnp.sum(xw1[:, None, :] * creps, axis=-1)) ** 2  # [C, f]
        mi = jnp.argmax(cm, axis=1)
        val = jnp.take_along_axis(cm, mi[:, None], axis=1)[:, 0]
        lag = jnp.take_along_axis(cand, mi[:, None], axis=1)[:, 0]
        power = jnp.mean(jnp.abs(x) ** 2, axis=1)
        return val, best_dop, lag, power

    def acquire(self, x, prn_idx) -> AcqResults:
        x = np.asarray(x, dtype=np.complex64)[:, : self.win]
        prn_idx = np.asarray(prn_idx, dtype=np.int32)
        val, dop, lag, power = self._jit(
            jnp.asarray(host_to_ri(x)), jnp.asarray(prn_idx),
            self._codes_fft_conj, self._codes, self._dop)
        val_np = fetch(val).astype(np.float64)
        power_np = fetch(power).astype(np.float64)
        # disambiguation statistic: full-length direct correlation
        norm = power_np * self.win
        stat = val_np / np.maximum(norm, 1e-30)
        return AcqResults(
            detected=stat > self.threshold,
            test_statistic=stat,
            delay_samples=fetch(lag).astype(np.float64),
            doppler_hz=fetch(dop).astype(np.float64),
            input_power=power_np,
            threshold=self.threshold,
        )


class CccwsrAcquisition:
    """CCCWSR for Galileo E1 CBOC (pcps_cccwsr_acquisition_cc analog).

    Correlates against code x cos-subcarrier (the sinBOC(1,1) replica) and
    code x sin-subcarrier (the quadrature subcarrier replica) and combines
    max(|C_cos + j C_sin|, |C_cos - j C_sin|) per cell — reconstructing the
    BOC subcarrier sign without squaring loss.
    """

    def __init__(self, conf: AcqConfig, chips_table: np.ndarray,
                 prns: list[int]) -> None:
        """chips_table: [P, 4092] raw E1-B code chips (+-1), WITHOUT
        subcarrier; the two replicas are built here."""
        self.conf = conf
        self.prns = list(prns)
        spc = conf.samples_per_code
        fs = conf.fs
        t = np.arange(spc) / fs
        chip_phase = t * conf.code_rate_cps               # chips (fractional)
        idx = np.floor(chip_phase).astype(np.int64) % chips_table.shape[1]
        # sinBOC(1,1): sign(sin(2*pi*f_sub*t)), f_sub = code rate;
        # quadrature: sign(cos(...)) — the "W" replica of CCCWSR
        sub_sin = np.sign(np.sin(2 * np.pi * conf.code_rate_cps * t) + 1e-12)
        sub_cos = np.sign(np.cos(2 * np.pi * conf.code_rate_cps * t) + 1e-12)
        cos_tab = (chips_table[:, idx] * sub_sin[None, :]).astype(np.float32)
        sin_tab = (chips_table[:, idx] * sub_cos[None, :]).astype(np.float32)
        self.fft_size = 1 << (2 * spc - 1).bit_length()
        pad = np.zeros((cos_tab.shape[0], self.fft_size - spc), np.float32)
        self._fft_cos = jax.device_put(host_to_ri(np.conj(
            np.fft.fft(np.concatenate([cos_tab, pad], 1), axis=1)
        ).astype(np.complex64)))
        self._fft_sin = jax.device_put(host_to_ri(np.conj(
            np.fft.fft(np.concatenate([sin_tab, pad], 1), axis=1)
        ).astype(np.complex64)))
        dop = conf.doppler_grid_hz()
        self._doppler_hz = dop
        self._dop = jax.device_put(dop.astype(np.float32))
        self.threshold = (conf.threshold if conf.threshold > 0 else
                          threshold_from_pfa(replace(conf, max_dwells=1),
                                             len(dop)))
        self.win = self.fft_size
        self._jit = jax.jit(self._acquire)

    def _acquire(self, x_ri, prn_idx, fft_cos, fft_sin, dop):
        conf = self.conf
        x = dev_combine(x_ri)                       # [C, F]
        C = x.shape[0]
        spc = conf.samples_per_code
        n = jnp.arange(self.fft_size, dtype=jnp.float32)
        phase = (-2.0 * jnp.pi / np.float32(conf.fs)) * dop[:, None] * n[None, :]
        wipe = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        xw = x[:, None, :] * wipe[None, :, :]       # [C, B, F]
        xf = mxu_fft(xw)
        cc = dev_combine(fft_cos)[prn_idx][:, None, :]
        cs = dev_combine(fft_sin)[prn_idx][:, None, :]
        corr_c = mxu_ifft(xf * cc).astype(jnp.complex64)[..., :spc]
        corr_s = mxu_ifft(xf * cs).astype(jnp.complex64)[..., :spc]
        plus = jnp.abs(corr_c + 1j * corr_s)
        minus = jnp.abs(corr_c - 1j * corr_s)
        mag = jnp.maximum(plus, minus) ** 2         # [C, B, spc]
        flat = mag.reshape(C, -1)
        idx = jnp.argmax(flat, axis=1)
        val = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
        d_i = idx // spc
        lag = (idx % spc).astype(jnp.int32)
        power = jnp.mean(jnp.abs(x) ** 2, axis=1)
        return val, dop[d_i], lag, power

    def acquire(self, x, prn_idx) -> AcqResults:
        x = np.asarray(x, dtype=np.complex64)[:, : self.win]
        if x.shape[1] < self.win:
            x = np.pad(x, ((0, 0), (0, self.win - x.shape[1])))
        val, dop, lag, power = self._jit(
            jnp.asarray(host_to_ri(x)), jnp.asarray(np.asarray(prn_idx, np.int32)),
            self._fft_cos, self._fft_sin, self._dop)
        val_np = fetch(val).astype(np.float64)
        power_np = fetch(power).astype(np.float64)
        # the +/- combining doubles the H0 max population; fold that into the
        # normalization (2 correlators' noise adds in the combined cell)
        norm = power_np * self.conf.samples_per_code * 2.0
        stat = val_np / np.maximum(norm, 1e-30)
        return AcqResults(
            detected=stat > self.threshold,
            test_statistic=stat,
            delay_samples=fetch(lag).astype(np.float64),
            doppler_hz=fetch(dop).astype(np.float64),
            input_power=power_np,
            threshold=self.threshold,
        )


class AssistedAcquisition:
    """Assisted acquisition (gps_l1_ca_pcps_assisted_acquisition analog).

    Searches a narrow window (+-``window_hz``) around per-satellite
    predicted Doppler from A-GNSS assistance, reusing the batched engine's
    per-PRN frequency-offset path; reported Doppler includes the
    prediction.
    """

    def __init__(self, conf: AcqConfig, code_table: np.ndarray,
                 prns: list[int], predicted_doppler_hz: dict[int, float],
                 window_hz: float = 500.0, mesh=None) -> None:
        offsets = np.array(
            [predicted_doppler_hz.get(p, 0.0) for p in prns], np.float64)
        narrow = replace(conf, doppler_max_hz=window_hz, doppler_min_hz=None)
        self.inner = PcpsAcquisition(narrow, code_table, prns, mesh=mesh,
                                     freq_offset_table=offsets)
        self.conf = self.inner.conf
        self.prns = self.inner.prns
        self.threshold = self.inner.threshold
        self._offsets_np = offsets

    def set_predicted_doppler(self, offsets_hz: np.ndarray) -> None:
        """Update the per-row predicted Doppler between calls.

        Offsets are jit INPUTS to the inner engine's acquire program, so
        this recompiles nothing. Owns the device mirror the inner engine
        reads — callers must not poke ``inner._offsets`` directly."""
        import jax

        offsets_hz = np.asarray(offsets_hz, np.float64)
        if offsets_hz.shape != self._offsets_np.shape:
            raise ValueError(
                f"expected {self._offsets_np.shape} offsets, "
                f"got {offsets_hz.shape}")
        self._offsets_np = offsets_hz
        self.inner._offsets = jax.device_put(offsets_hz.astype(np.float32))

    def acquire(self, x, prn_idx) -> AcqResults:
        res = self.inner.acquire(x, prn_idx)
        # the engine reports Doppler excluding the deterministic offset;
        # assistance offsets ARE Doppler — add them back
        res.doppler_hz = res.doppler_hz + self._offsets_np[
            np.asarray(prn_idx, np.int64)]
        return res


class NoncoherentIQAcquisition:
    """Noncoherent I/Q-combining acquisition for QPSK pilot+data signals
    (galileo_e5a_noncoherent_iq_acquisition_caf_cc analog): correlates the
    input against BOTH the data (I) and pilot (Q) primary codes and sums
    the two magnitude-squared grids per (Doppler, lag) cell — capturing
    the full signal power regardless of the unknown secondary-code/symbol
    phases of either component.
    """

    def __init__(self, conf: AcqConfig, data_table: np.ndarray,
                 pilot_table: np.ndarray, prns: list[int]) -> None:
        self.conf = conf
        self.prns = list(prns)
        spc = conf.samples_per_code
        self.fft_size = 1 << (2 * spc - 1).bit_length()
        self.win = self.fft_size

        def make_fft(tbl):
            sampled = np.stack([
                resample_code(tbl[p], conf.fs, conf.code_rate_cps, spc)
                for p in range(tbl.shape[0])
            ]).astype(np.float32)
            pad = np.zeros((sampled.shape[0], self.fft_size - spc), np.float32)
            return jax.device_put(host_to_ri(np.conj(
                np.fft.fft(np.concatenate([sampled, pad], 1), axis=1)
            ).astype(np.complex64)))

        self._fft_i = make_fft(data_table)
        self._fft_q = make_fft(pilot_table)
        dop = conf.doppler_grid_hz()
        self._doppler_hz = dop
        self._dop = jax.device_put(dop.astype(np.float32))
        # H0: sum of two independent Exp(1) cells -> chi^2(4)/2 ==
        # the max_dwells=2 statistic of the standard engine
        self.threshold = (conf.threshold if conf.threshold > 0 else
                          threshold_from_pfa(replace(conf, max_dwells=2),
                                             len(dop)))
        self._jit = jax.jit(self._acquire)

    def _acquire(self, x_ri, prn_idx, fft_i, fft_q, dop):
        conf = self.conf
        x = dev_combine(x_ri)
        C = x.shape[0]
        spc = conf.samples_per_code
        n = jnp.arange(self.fft_size, dtype=jnp.float32)
        phase = (-2.0 * jnp.pi / np.float32(conf.fs)) * dop[:, None] * n[None, :]
        wipe = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        xw = x[:, None, :] * wipe[None, :, :]
        xf = mxu_fft(xw)
        ci = dev_combine(fft_i)[prn_idx][:, None, :]
        cq = dev_combine(fft_q)[prn_idx][:, None, :]
        gi = jnp.abs(mxu_ifft(xf * ci).astype(jnp.complex64)[..., :spc]) ** 2
        gq = jnp.abs(mxu_ifft(xf * cq).astype(jnp.complex64)[..., :spc]) ** 2
        mag = gi + gq
        flat = mag.reshape(C, -1)
        idx = jnp.argmax(flat, axis=1)
        val = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
        d_i = idx // spc
        lag = (idx % spc).astype(jnp.int32)
        power = jnp.mean(jnp.abs(x) ** 2, axis=1)
        return val, dop[d_i], lag, power

    def acquire(self, x, prn_idx) -> AcqResults:
        x = np.asarray(x, dtype=np.complex64)[:, : self.win]
        if x.shape[1] < self.win:
            x = np.pad(x, ((0, 0), (0, self.win - x.shape[1])))
        val, dop, lag, power = self._jit(
            jnp.asarray(host_to_ri(x)),
            jnp.asarray(np.asarray(prn_idx, np.int32)),
            self._fft_i, self._fft_q, self._dop)
        val_np = fetch(val).astype(np.float64)
        power_np = fetch(power).astype(np.float64)
        # per-code-correlation normalization; /2 folds the two-cell sum
        # into the per-dwell-average convention of threshold_from_pfa
        norm = power_np * self.conf.samples_per_code * 2.0
        stat = val_np / np.maximum(norm, 1e-30)
        return AcqResults(
            detected=stat > self.threshold,
            test_statistic=stat,
            delay_samples=fetch(lag).astype(np.float64),
            doppler_hz=fetch(dop).astype(np.float64),
            input_power=power_np,
            threshold=self.threshold,
        )

"""Signal conditioner: DataTypeAdapter -> InputFilter -> Resampler as a
fused jitted block program.

Reference: Signal_Conditioner composes three separately-scheduled GR blocks
(src/algorithms/conditioner/adapters/signal_conditioner.cc); Pass_Through can
replace any stage. Here the dtype widen, interference filters, LO mix and
FIR+decimation are one XLA program per block — the widen fuses into the
FIR's im2col matmul and the only HBM round trips are block in / block out
(SURVEY.md §2.4 P1: static block-synchronous pipeline). The optional
fractional resampler runs as a second jitted call with a host-managed carry
of unconsumed samples (its output length varies block to block).

Streaming state: FIR tail (overlap-save), LO phase, resampler position.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.conditioner.adapters import ADAPTERS
from gnss_sdr_tpu.conditioner.filters import (
    design_fir,
    fir_apply,
    notch_filter_block,
    pulse_blanking_block,
)
from gnss_sdr_tpu.conditioner.resampler import polyphase_resample
from gnss_sdr_tpu.utils.cplx import (
    dev_combine,
    dev_split,
    host_from_ri,
    host_to_ri,
)
from gnss_sdr_tpu.utils.transfer import fetch

_RES_TAPS = 8  # polyphase interpolator taps (GR MMSE interpolator is 8-tap)


@dataclass(frozen=True)
class ConditionerConfig:
    """One config covers the reference's DataTypeAdapter/InputFilter/Resampler
    role properties (SURVEY.md §2.2 signal conditioner)."""

    input_format: str = "passthrough"  # ADAPTERS key
    fs_in: float = 4e6
    fs_out: float | None = None        # None -> no fractional resampling
    if_freq_hz: float = 0.0            # freq-xlating LO (0 -> plain FIR)
    fir_taps: int = 0                  # 0 -> no FIR stage
    fir_band_hz: tuple[float, float] | float | None = None
    decimation: int = 1
    enable_notch: bool = False
    notch_pfa_ratio: float = 10.0
    enable_pulse_blanking: bool = False
    pulse_blanking_sigmas: float = 4.0

    @property
    def fs_final(self) -> float:
        fs = self.fs_in / self.decimation
        return self.fs_out if self.fs_out else fs


class SignalConditioner:
    """Streaming conditioner; ``process(block)`` -> conditioned complex64."""

    def __init__(self, cfg: ConditionerConfig) -> None:
        self.cfg = cfg
        adapter = ADAPTERS[cfg.input_format]
        if cfg.fir_taps:
            band = cfg.fir_band_hz or (0.0, 0.45 * cfg.fs_in / cfg.decimation)
            taps = jnp.asarray(
                design_fir(cfg.fir_taps, cfg.fs_in, band), dtype=jnp.float32
            )
        else:
            taps = jnp.ones((1,), jnp.float32)
        self.taps = taps
        # FIR tail carried as f32 re/im lanes (complex64 arrays cannot be
        # created outside a compiled program on this runtime)
        self._tail = jnp.zeros((taps.shape[0] - 1, 2), jnp.float32)
        self._lo_phase = jnp.zeros((), jnp.float64)
        # fractional-resampler carry: unconsumed mid-rate samples + position
        self._res_carry = np.zeros(0, dtype=np.complex64)
        self._res_pos = 0.0
        self._ratio = (cfg.fs_in / cfg.decimation) / cfg.fs_final

        @jax.jit
        def _run(raw, tail, lo_phase):
            # complex blocks arrive as f32 [N, 2] re/im lanes (complex64
            # cannot cross the host->device boundary on this runtime);
            # integer capture formats go through their dtype adapter
            if raw.ndim == 2 and raw.dtype == jnp.float32:
                x = dev_combine(raw)
            else:
                x = adapter(raw)
            if cfg.enable_pulse_blanking:
                x = pulse_blanking_block(x, cfg.pulse_blanking_sigmas)
            if cfg.enable_notch:
                x = notch_filter_block(x, cfg.notch_pfa_ratio)
            if cfg.if_freq_hz:
                n = x.shape[0]
                w = -2.0 * np.pi * cfg.if_freq_hz / cfg.fs_in
                ph = lo_phase + w * jnp.arange(n, dtype=jnp.float64)
                lo = jax.lax.complex(
                    jnp.cos(ph).astype(jnp.float32),
                    jnp.sin(ph).astype(jnp.float32),
                )
                x = x * lo
                lo_phase = jnp.mod(lo_phase + w * n, 2.0 * np.pi)
            xt = jnp.concatenate([dev_combine(tail), x])
            y = fir_apply(xt, taps, cfg.decimation)
            # carry the FULL unconsumed residue: the next block's first
            # output must use xt[n_out*decim:], so when the block length is
            # not a multiple of the decimation factor the tail grows by the
            # leftover samples (keeps the decimation phase continuous for
            # arbitrary-length FIFO/UDP blocks; tail length is static per
            # trace — at most `decimation` distinct lengths get compiled)
            n_out = (xt.shape[0] - (taps.shape[0] - 1)) // cfg.decimation
            new_tail = dev_split(xt[n_out * cfg.decimation:])
            return dev_split(y), new_tail, lo_phase

        self._run = _run

        @partial(jax.jit, static_argnames=("n_out",))
        def _resample_ri(buf_ri, ratio, n_out, frac0):
            y = polyphase_resample(
                dev_combine(buf_ri), ratio, n_out, frac0, _RES_TAPS
            )
            return dev_split(y)

        self._resample_ri = _resample_ri

    # ------------------------------------------------------------- streaming
    def process(self, raw: np.ndarray) -> np.ndarray:
        """Condition one raw block; returns the final-rate complex64 chunk."""
        raw = np.asarray(raw)
        if np.iscomplexobj(raw):
            raw = host_to_ri(raw)
        y_ri, self._tail, self._lo_phase = self._run(
            jnp.asarray(raw), self._tail, self._lo_phase
        )
        y = host_from_ri(fetch(y_ri))
        if not self.cfg.fs_out:
            return y
        return self._resample(y)

    def _resample(self, y_mid: np.ndarray) -> np.ndarray:
        half = _RES_TAPS // 2
        buf = np.concatenate([self._res_carry, y_mid])
        pos = self._res_pos
        # outputs k at pos + k*ratio need input up to floor(.)+half
        n_out = int((len(buf) - 1 - half - pos) / self._ratio) + 1
        if n_out <= 0:
            self._res_carry = buf
            return np.zeros(0, dtype=np.complex64)
        out = host_from_ri(fetch(self._resample_ri(
            jnp.asarray(host_to_ri(buf)), self._ratio, n_out, pos
        )))
        end_pos = pos + n_out * self._ratio
        start = max(int(np.floor(end_pos)) - (half - 1), 0)
        self._res_carry = buf[start:]
        self._res_pos = end_pos - start
        return out


class PassThrough:
    """Pass_Through analog (algorithms/libs/pass_through.cc)."""

    def process(self, raw: np.ndarray) -> np.ndarray:
        return np.asarray(raw, dtype=np.complex64)

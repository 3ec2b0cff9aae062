"""Signal conditioner tests: adapters, FIR/xlating filter, notch, pulse
blanking, resamplers, and the fused streaming pipeline.

Mirrors the reference's input-filter and resampler unit tests
(tests/unit-tests/signal-processing-blocks/filter/,
 .../resampler/direct_resampler_conditioner_test.cc): known tones through
each stage, streaming continuity across block boundaries.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gnss_sdr_tpu.conditioner import (
    ADAPTERS,
    ConditionerConfig,
    SignalConditioner,
    design_fir,
    direct_resample,
    fir_apply,
    notch_filter_block,
    polyphase_resample,
    pulse_blanking_block,
)

RNG = np.random.default_rng(3)


def _tone(fs, f, n, amp=1.0, phase=0.0):
    t = np.arange(n) / fs
    return (amp * np.exp(2j * np.pi * f * t + 1j * phase)).astype(np.complex64)


# ------------------------------------------------------------------ adapters
def test_adapter_ibyte():
    iq = np.array([1, -2, 3, 4], dtype=np.int8)
    out = np.asarray(ADAPTERS["ibyte"](jnp.asarray(iq)))
    np.testing.assert_allclose(out, [1 - 2j, 3 + 4j])


def test_adapter_ishort():
    iq = np.array([1000, -2000, 300, 40], dtype=np.int16)
    out = np.asarray(ADAPTERS["ishort"](jnp.asarray(iq)))
    np.testing.assert_allclose(out, [1000 - 2000j, 300 + 40j])


def test_adapter_real_formats():
    b = np.array([5, -7], dtype=np.int8)
    out = np.asarray(ADAPTERS["byte"](jnp.asarray(b)))
    np.testing.assert_allclose(out, [5 + 0j, -7 + 0j])


# ----------------------------------------------------------------------- FIR
def test_fir_matches_numpy_convolve():
    taps = design_fir(31, 1e6, (0.0, 2e5))
    x = (RNG.normal(size=512) + 1j * RNG.normal(size=512)).astype(np.complex64)
    y = np.asarray(fir_apply(jnp.asarray(x), jnp.asarray(taps, jnp.float32)))
    ref = np.convolve(x, taps, mode="full")[len(taps) - 1 : len(x)]
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_fir_passband_stopband():
    fs = 1e6
    taps = design_fir(127, fs, (0.0, 1e5))
    x_pass = _tone(fs, 3e4, 4096)
    x_stop = _tone(fs, 3e5, 4096)
    yp = np.asarray(fir_apply(jnp.asarray(x_pass), jnp.asarray(taps, jnp.float32)))
    ys = np.asarray(fir_apply(jnp.asarray(x_stop), jnp.asarray(taps, jnp.float32)))
    assert np.abs(yp[500:]).mean() > 0.9
    assert np.abs(ys[500:]).mean() < 0.01


# --------------------------------------------------------------------- notch
def test_notch_removes_cw_keeps_noise():
    fs = 4e6
    n = 1 << 14
    noise = (RNG.normal(size=n) + 1j * RNG.normal(size=n)).astype(np.complex64)
    cw = _tone(fs, 1.1e6, n, amp=30.0)
    y = np.asarray(notch_filter_block(jnp.asarray(noise + cw)))
    spec = np.abs(np.fft.fft(y)) ** 2
    k = int(round(1.1e6 / fs * n))
    floor = np.median(spec)
    assert spec[k] < 20 * floor            # CW crushed to near the floor
    # noise floor preserved; only the sub-threshold leakage skirt remains
    # of the CW's original 900x noise power
    assert np.mean(np.abs(y) ** 2) < 3.0


def test_notch_leaves_clean_signal_alone():
    # the max of N exponential bin powers is ~ln(N)~8x the mean, so a
    # threshold above that leaves pure noise untouched
    n = 1 << 12
    noise = (RNG.normal(size=n) + 1j * RNG.normal(size=n)).astype(np.complex64)
    y = np.asarray(notch_filter_block(jnp.asarray(noise), pfa_ratio=40.0))
    np.testing.assert_allclose(y, noise, atol=1e-3)


# ------------------------------------------------------------ pulse blanking
def test_pulse_blanking():
    n = 4096
    x = (RNG.normal(size=n) + 1j * RNG.normal(size=n)).astype(np.complex64)
    pulse_idx = np.array([100, 200, 300])
    x[pulse_idx] = 100.0
    y = np.asarray(pulse_blanking_block(jnp.asarray(x)))
    assert np.all(y[pulse_idx] == 0)
    untouched = np.setdiff1d(np.arange(n), pulse_idx)
    frac_kept = np.mean(y[untouched] == x[untouched])
    assert frac_kept > 0.98


# ---------------------------------------------------------------- resamplers
def test_direct_resample_decimation():
    x = jnp.arange(100, dtype=jnp.complex64)
    y = np.asarray(direct_resample(x, 4.0, 25))
    np.testing.assert_allclose(y.real, np.arange(25) * 4)


def test_polyphase_resample_tone_fidelity():
    fs_in, fs_out = 4e6, 2.6e6
    f = 2e5
    n_in = 8192
    x = _tone(fs_in, f, n_in)
    ratio = fs_in / fs_out
    n_out = int((n_in - 10) / ratio)
    y = np.asarray(polyphase_resample(jnp.asarray(x), ratio, n_out, 4.0))
    t_out = (4.0 + ratio * np.arange(n_out)) / fs_in
    expected = np.exp(2j * np.pi * f * t_out)
    # ignore ends (window edge effects)
    err = np.abs(y[16:-16] - expected[16:-16])
    assert err.max() < 0.02


# ------------------------------------------------------- streaming pipeline
def test_conditioner_ibyte_xlating_decimation_streaming():
    """Real-IF int8 capture -> baseband complex at fs/4, streamed in blocks,
    must equal the same pipeline run in one shot (block-boundary continuity).
    """
    fs = 8e6
    f_if = 2e6
    n = 1 << 15
    t = np.arange(n) / fs
    base = np.cos(2 * np.pi * (f_if + 5e4) * t)  # signal 50 kHz above IF
    raw = np.round(base * 100).astype(np.int8)

    cfg = ConditionerConfig(
        input_format="byte", fs_in=fs, if_freq_hz=f_if,
        fir_taps=65, fir_band_hz=(0.0, 8e5), decimation=4,
    )
    one = SignalConditioner(cfg)
    y_once = one.process(raw)

    two = SignalConditioner(cfg)
    y_stream = np.concatenate(
        [two.process(raw[: n // 2]), two.process(raw[n // 2:])]
    )
    np.testing.assert_allclose(y_stream, y_once, atol=1e-2)

    # downconverted tone lands at +50 kHz at the output rate
    y = y_once[200:]
    fs_out = fs / 4
    spec = np.abs(np.fft.fft(y))
    k = np.argmax(spec)
    f_peak = k / len(y) * fs_out
    assert abs(f_peak - 5e4) < fs_out / len(y) * 2


def test_conditioner_fractional_resample_streaming():
    fs_in, fs_out = 4e6, 2.6e6
    f = 1e5
    n = 1 << 14
    x = _tone(fs_in, f, n)
    cfg = ConditionerConfig(
        input_format="passthrough", fs_in=fs_in, fs_out=fs_out
    )
    cond = SignalConditioner(cfg)
    chunks = [cond.process(x[i: i + 2048]) for i in range(0, n, 2048)]
    y = np.concatenate(chunks)
    t_out = np.arange(len(y)) / fs_out
    expected = np.exp(2j * np.pi * f * t_out)
    err = np.abs(y[8:-8] - expected[8: len(y) - 8])
    assert err.max() < 0.03


def test_conditioner_decimation_irregular_block_lengths():
    """Arbitrary-length blocks (FIFO/UDP sources) must keep the decimation
    phase continuous across block boundaries: streamed output == one-shot."""
    fs = 4e6
    cfg = ConditionerConfig(
        input_format="passthrough", fs_in=fs, fir_taps=17,
        fir_band_hz=(0.0, 0.4e6), decimation=4,
    )
    x = _tone(fs, 0.1e6, 4096) + 0.05 * (
        RNG.normal(size=4096) + 1j * RNG.normal(size=4096)
    ).astype(np.complex64)

    one = SignalConditioner(cfg).process(x)

    streamed = SignalConditioner(cfg)
    parts, i = [], 0
    for n in (1000, 37, 511, 1025, 999, 524):
        parts.append(streamed.process(x[i:i + n]))
        i += n
    y = np.concatenate(parts)
    np.testing.assert_allclose(y, one[: len(y)], rtol=0, atol=1e-4)
    assert len(y) >= len(one) - 1

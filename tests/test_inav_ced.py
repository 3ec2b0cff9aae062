"""Galileo INAV reduced CED (word 16) and FEC2 RS CED assembly.

Reference analogs: galileo_inav_message.cc case 16 (:1232-1259) +
galileo_reduced_ced.cc compute_eph (:22); FEC2 erasure correction
(:240-347) with RS(255,195) fcr=195 over words 1-4 / 17-20
(:42, :850-1010, :1261-1350).
"""

import numpy as np
import pytest

from gnss_sdr_tpu.telemetry.inav import (
    GalileoEphemeris,
    GalileoIono,
    GalileoReducedCed,
    InavDecoder,
    InavEncoder,
)


def _test_eph(prn=11):
    return GalileoEphemeris(
        prn=prn, iod_nav=37,
        toe=7200.0, toc=7200.0,
        sqrt_a=np.sqrt(29600800.0), ecc=2.5e-4, m0=0.8,
        omega0=1.1, i0=0.97, omega=0.4, idot=3e-10,
        omega_dot=-5.3e-9, delta_n=3.2e-9,
        cuc=2e-6, cus=8e-6, crc=150.0, crs=25.0,
        cic=3e-8, cis=-2e-8,
        af0=4.2e-4, af1=-2.5e-12, af2=0.0,
        week=1250, sisa=107,
    )


def _feed(dec, enc, pages, start=0):
    syms = enc.symbols(pages, start)
    signs = 1.0 - 2.0 * syms.astype(np.float64)
    stamps = np.arange(len(signs)) * 16000 // 4
    return dec.push_symbols(signs, stamps)


def test_reduced_ced_roundtrip():
    eph = _test_eph()
    enc = InavEncoder(eph, GalileoIono(ai0=30.0), tow0_s=7314.0,
                      schedule=(5, 16))
    dec = InavDecoder(prn=11)
    _feed(dec, enc, 8)
    ced = dec.reduced_ced
    assert ced is not None
    # quantization: DeltaAred LSB is 2^8 m, angles 2^-22 semicircles
    assert ced.delta_a_red == pytest.approx(800.0, abs=300.0)
    assert ced.ex_red == pytest.approx(eph.ecc * np.cos(eph.omega),
                                       abs=2 ** -21)
    assert ced.ey_red == pytest.approx(eph.ecc * np.sin(eph.omega),
                                       abs=2 ** -21)
    r = ced.compute_eph()
    assert r.sqrt_a == pytest.approx(eph.sqrt_a, abs=0.05)
    assert r.ecc == pytest.approx(eph.ecc, abs=1e-6)
    assert r.omega0 == pytest.approx(eph.omega0, abs=1e-5)
    assert r.i0 == pytest.approx(eph.i0, abs=1e-5)
    # lambda = M0 + omega recovers M0 given omega
    assert (r.m0 + r.omega) == pytest.approx(eph.m0 + eph.omega, abs=1e-5)
    assert r.af0 == pytest.approx(eph.af0, abs=2 ** -26)
    assert r.complete
    # TOTRedCED anchored to the last WT5 GST
    assert r.week == 1250


@pytest.mark.parametrize("missing", [(1, 2), (3, 4), (2, 4)])
def test_rs_ced_assembles_from_four_pages(missing):
    """Any 4 of the 8 CED pages recover the ephemeris: transmit the two
    non-missing info words plus two parity words."""
    eph = _test_eph(prn=19)
    info_words = [w for w in (1, 2, 3, 4) if w not in missing]
    schedule = (5,) + tuple(info_words) + (17, 18)
    enc = InavEncoder(eph, tow0_s=5000.0, schedule=schedule)
    dec = InavDecoder(prn=19)
    dec.enable_reed_solomon()
    _feed(dec, enc, len(schedule) + 2)
    assert dec.ced_from_rs
    assert dec.eph.complete
    got = dec.eph
    for f in ("toe", "m0", "ecc", "sqrt_a", "omega0", "i0", "omega",
              "omega_dot", "delta_n", "cuc", "cus", "crc", "crs",
              "cic", "cis", "toc", "af0", "af1"):
        ref = getattr(eph, f)
        tol = max(1e-12, abs(ref) * 1e-9)
        assert getattr(got, f) == pytest.approx(ref, abs=tol + 1e-9), f
    assert got.iod_nav == 37


def test_rs_ced_all_parity_pages():
    """Extreme case: CED from the four parity words alone."""
    eph = _test_eph(prn=3)
    enc = InavEncoder(eph, tow0_s=5000.0, schedule=(5, 17, 18, 19, 20))
    dec = InavDecoder(prn=3)
    dec.enable_reed_solomon()
    _feed(dec, enc, 7)
    # words 17-20 don't carry the 8 IODnav MSBs; the decoder can still
    # assemble once it has seen any info word... with zero info words the
    # buffer's IODnav guess is 0, which the regenerated words inherit.
    # The ICD guarantees only "any 4 pages"; with 4 parity pages the CED
    # bits themselves still decode:
    assert dec.ced_from_rs
    assert dec.eph.has_w1 and dec.eph.has_w4
    assert dec.eph.sqrt_a == pytest.approx(eph.sqrt_a, abs=1e-6)
    # the corrected buffer carries the true IODnav even though no info
    # word was ever received directly
    assert dec.eph.iod_nav == 37


def test_rs_not_engaged_when_full_ephemeris():
    eph = _test_eph(prn=7)
    enc = InavEncoder(eph, tow0_s=5000.0)   # nominal schedule, words 1-5
    dec = InavDecoder(prn=7)
    dec.enable_reed_solomon()
    _feed(dec, enc, 12)
    assert dec.eph.complete
    assert not dec.ced_from_rs

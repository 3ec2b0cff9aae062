"""LNAV encode/decode tests.

Golden strategy mirrors the reference's gps_l1ca_telemetry_decoder_test and
gps_navigation_message tests: bit-exact parity math, encode->decode
roundtrip of ephemeris, preamble sync from arbitrary offsets and polarity,
TOW bookkeeping.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.telemetry.lnav import (
    BITS_PER_SUBFRAME,
    GpsEphemeris,
    LnavDecoder,
    check_parity_word,
    compute_parity,
    parse_subframe,
)
from gnss_sdr_tpu.telemetry.lnav_encode import LnavEncoder, encode_subframe


def _test_eph() -> GpsEphemeris:
    """Realistic GPS ephemeris values (magnitudes from a typical almanac)."""
    return GpsEphemeris(
        prn=7, week=245, sv_health=0, ura_index=1, iodc=0x155,
        iode_sf2=0x55, iode_sf3=0x55,
        tgd=-4.656612873077393e-09,
        toc=302400.0, af0=-3.1205e-04, af1=-2.273e-12, af2=0.0,
        crs=-12.34375, delta_n=4.908e-09, m0=1.23456789,
        cuc=-6.4373e-07, ecc=0.0123456789, cus=7.62939e-06,
        sqrt_a=5153.6548, toe=302400.0,
        cic=-7.4506e-08, omega0=-2.7182818, cis=1.1175e-07,
        i0=0.9616, crc=221.40625, omega=1.5707963,
        omega_dot=-8.1461e-09, idot=4.2003e-10, fit_interval=0,
    )


def test_parity_self_consistent():
    rng = np.random.default_rng(0)
    for _ in range(50):
        d24 = rng.integers(0, 2, 24).astype(np.int8)
        d29s, d30s = map(int, rng.integers(0, 2, 2))
        par = compute_parity(d24, d29s, d30s)
        word32 = np.concatenate(
            [[d29s, d30s], d24 ^ d30s, par]
        ).astype(np.int8)
        assert check_parity_word(word32)
        # flip any single bit -> parity fails
        flip = int(rng.integers(2, 32))
        bad = word32.copy()
        bad[flip] ^= 1
        assert not check_parity_word(bad)


def test_encode_subframe_parity_and_tail():
    eph = _test_eph()
    for sf_id in (1, 2, 3, 4, 5):
        bits = encode_subframe(eph, sf_id, 6.0 * (sf_id + 1))
        assert bits.shape == (300,)
        # every word parity-checks with chaining; word 2/10 end in D29=D30=0
        d29s = d30s = 0
        for wi in range(10):
            word32 = np.concatenate(
                [[d29s, d30s], bits[wi * 30 : (wi + 1) * 30]]
            ).astype(np.int8)
            assert check_parity_word(word32), (sf_id, wi)
            d29s, d30s = int(bits[wi * 30 + 28]), int(bits[wi * 30 + 29])
            if wi in (1, 9):
                assert (d29s, d30s) == (0, 0)


def test_ephemeris_roundtrip():
    eph = _test_eph()
    enc = LnavEncoder(eph)
    dec = GpsEphemeris(prn=7)
    for epoch in (0, 1, 2):  # subframes 1, 2, 3
        bits = enc.subframe(epoch)
        # strip parity via the word decoder path
        from gnss_sdr_tpu.telemetry.lnav import decode_word

        data = np.empty(240, dtype=np.int8)
        d29s = d30s = 0
        for wi in range(10):
            word32 = np.concatenate(
                [[d29s, d30s], bits[wi * 30 : (wi + 1) * 30]]
            ).astype(np.int8)
            d = decode_word(word32)
            assert d is not None
            data[wi * 24 : (wi + 1) * 24] = d
            d29s, d30s = int(bits[wi * 30 + 28]), int(bits[wi * 30 + 29])
        sf_id, tow = parse_subframe(data, dec)
        assert sf_id == epoch + 1
        assert tow == 6.0 * (epoch + 1)

    assert dec.complete
    # quantization-bounded roundtrip
    assert dec.week == eph.week
    assert dec.iodc == eph.iodc
    assert abs(dec.af0 - eph.af0) <= 2.0**-31
    assert abs(dec.m0 - eph.m0) <= 2.0**-31 * 3.1415927
    assert abs(dec.ecc - eph.ecc) <= 2.0**-33
    assert abs(dec.sqrt_a - eph.sqrt_a) <= 2.0**-19
    assert abs(dec.omega0 - eph.omega0) <= 2.0**-31 * 3.1415927
    assert abs(dec.i0 - eph.i0) <= 2.0**-31 * 3.1415927
    assert abs(dec.omega - eph.omega) <= 2.0**-31 * 3.1415927
    assert abs(dec.crc - eph.crc) <= 2.0**-5
    assert abs(dec.omega_dot - eph.omega_dot) <= 2.0**-43 * 3.1415927
    assert abs(dec.toe - eph.toe) < 1e-9
    assert abs(dec.toc - eph.toc) < 1e-9
    assert abs(dec.tgd - eph.tgd) <= 2.0**-31


@pytest.mark.parametrize("offset,invert", [(0, False), (17, False), (5, True), (123, True)])
def test_streaming_decoder_sync(offset, invert):
    eph = _test_eph()
    enc = LnavEncoder(eph)
    # the first subframe can never decode (the parity chain needs 2 bits of
    # history before its preamble), so cover >5 subframes
    nbits = 7 * BITS_PER_SUBFRAME + offset
    idx = np.arange(nbits)
    signs = enc.bits_at(idx)
    if invert:
        signs = -signs
    signs = signs[offset:]
    # sample stamps: bit k of the week ends at sample (k+1)*fs*0.02
    fs = 2.6e6
    stamps = ((idx[offset:] + 1) * 0.02 * fs).astype(np.int64)

    dec = LnavDecoder(prn=7)
    events = dec.push_bits(signs, stamps)
    assert dec.synced
    assert dec.inverted == invert
    sfs = [e["subframe"] for e in events]
    # subframes 1,2,3 present -> ephemeris complete
    assert {1, 2, 3} <= set(sfs)
    assert dec.eph.complete
    assert abs(dec.eph.sqrt_a - eph.sqrt_a) <= 2.0**-19
    # TOW bookkeeping: at the last decoded subframe boundary, the TOW equals
    # the HOW value and maps back through tow_at_stamp
    ev = events[-1]
    tow = dec.tow_at_stamp(ev["sample_stamp"], fs)
    assert abs(tow - ev["tow_s"]) < 1e-9


def test_decoder_rejects_garbage():
    rng = np.random.default_rng(4)
    dec = LnavDecoder(prn=3)
    signs = rng.choice([-1.0, 1.0], size=1200)
    stamps = np.arange(1200) * 52000
    events = dec.push_bits(signs, stamps)
    assert events == []
    assert not dec.eph.complete

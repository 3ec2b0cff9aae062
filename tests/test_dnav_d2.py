"""BeiDou D2 NAV (GEO, 500 bps) codec: page encode/decode roundtrip,
split-field assembly across pages, streaming decoder frame sync.

Reference analog: beidou_dnav_navigation_message.cc d2_subframe_decoder.
"""

import numpy as np

from gnss_sdr_tpu.telemetry.dnav import BeidouEphemeris
from gnss_sdr_tpu.telemetry.dnav_d2 import (
    D2Decoder,
    D2Encoder,
    D2EphemerisAssembler,
    GEO_PRNS,
    SUBFRAME_BITS,
    decode_word,
    encode_d2_page,
    is_geo_prn,
)


def _test_eph(prn=3):
    return BeidouEphemeris(
        prn=prn, week=810, sv_health=0, ura_index=2, aodc=5, aode=7,
        tgd=-4.3e-9, toc=246400.0, af0=3.1e-4, af1=-1.8e-11, af2=2.0e-19,
        crs=87.3, delta_n=1.2e-9, m0=0.7654, cuc=4.2e-6, ecc=0.0034,
        cus=7.9e-6, sqrt_a=6493.41, toe=246400.0, cic=-6.1e-8,
        omega0=-1.93, cis=1.3e-7, i0=0.0971, crc=201.9, omega=0.42,
        omega_dot=-1.9e-9, idot=2.9e-10,
    )


IONO = {"alpha0": 1.2e-8, "alpha1": -7.5e-9, "alpha2": 6.0e-8,
        "alpha3": -6.0e-8, "beta0": 94208.0, "beta1": -81920.0,
        "beta2": 131072.0, "beta3": -131072.0}


def test_geo_prn_set():
    assert is_geo_prn(1) and is_geo_prn(5) and is_geo_prn(60)
    assert not is_geo_prn(6) and not is_geo_prn(30)


def test_d2_page_roundtrip_all_fields():
    eph = _test_eph()
    asm = D2EphemerisAssembler(prn=3)
    for page in range(1, 11):
        tx = encode_d2_page(eph, IONO, page, sow_bdt=1000.2 + 0.6 * page)
        dec = np.empty(SUBFRAME_BITS, dtype=np.int8)
        for w in range(10):
            dec[w * 30:(w + 1) * 30] = decode_word(
                tx[w * 30:(w + 1) * 30], w + 1)
        got_page, _ = asm.push_page(dec)
        assert got_page == page
    assert asm.complete
    e = asm.eph
    t = _test_eph()
    # quantization-limited equality on every broadcast field
    for name, tol in (("toc", 8.0), ("tgd", 0.1e-9), ("af0", 2**-32),
                      ("af1", 2**-49), ("af2", 2**-65), ("delta_n", 1e-11),
                      ("cuc", 2**-30), ("m0", 1e-8), ("cus", 2**-30),
                      ("ecc", 2**-32), ("sqrt_a", 2**-18), ("cic", 2**-30),
                      ("cis", 2**-30), ("toe", 8.0), ("i0", 1e-8),
                      ("crc", 2**-5), ("crs", 2**-5), ("omega_dot", 1e-11),
                      ("omega0", 1e-8), ("omega", 1e-8), ("idot", 1e-11)):
        assert abs(getattr(e, name) - getattr(t, name)) <= tol, name
    assert e.week == t.week and e.aodc == t.aodc and e.aode == t.aode
    for k, v in IONO.items():
        assert abs(asm.iono[k] - v) <= abs(v) * 1e-2 + 1e-12, k


def test_d2_streaming_decoder():
    eph = _test_eph(prn=2)
    enc = D2Encoder(eph, IONO)
    # 35 s of symbols from mid-stream (bit 1234): covers > one page cycle
    start_bit = 1234
    n_bits = int(35.0 / 0.002)
    idx = np.arange(start_bit, start_bit + n_bits)
    signs = enc.bits_at(idx)
    dec = D2Decoder(prn=2)
    events = []
    for i in range(0, n_bits, 250):
        events += dec.push_symbols(signs[i:i + 250], idx[i:i + 250])
    assert dec.subframes_ok > 40
    assert dec.subframes_bad == 0
    assert any(ev["ephemeris_complete"] for ev in events)
    # TOW events consistent with the bit timeline: event at stamp s (bit
    # index of subframe end) has tow_gps = 0.002*(s+1) + 14
    for ev in events[:10]:
        expect = 0.002 * (ev["sample_stamp"] + 1) + 14.0
        assert abs(ev["tow_s"] - expect) < 1e-6
    e = dec.eph
    assert abs(e.sqrt_a - eph.sqrt_a) < 1e-3
    assert abs(e.m0 - eph.m0) < 1e-8
    assert abs(dec.iono["alpha0"] - IONO["alpha0"]) < 1e-9

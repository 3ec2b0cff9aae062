"""GPS CNAV (L5) and Galileo FNAV (E5a) codec tests: encode -> symbol
stream -> streaming decode roundtrips with noise, TOW semantics, and
ephemeris assembly (reference analogs: libswiftcnav cnav_msg decode,
galileo_fnav_message.cc)."""

import numpy as np

from gnss_sdr_tpu.telemetry.cnav import (
    MSG_SECONDS,
    CnavDecoder,
    CnavEncoder,
    encode_message,
    parse_message,
)
from gnss_sdr_tpu.telemetry.fnav import (
    PAGE_SECONDS,
    PAGE_SYMBOLS,
    FnavDecoder,
    FnavEncoder,
    encode_page,
    parse_page,
    _page_frame,
)
from gnss_sdr_tpu.telemetry.inav import GalileoEphemeris, GalileoIono
from gnss_sdr_tpu.telemetry.lnav import GpsEphemeris


def _gps_eph():
    return GpsEphemeris(
        prn=6, week=1250, sv_health=0, ura_index=2,
        toc=7200.0, toe=7200.0,
        af0=2.5e-4, af1=-1.8e-12, af2=0.0, tgd=-4.65e-9,
        m0=0.7331, ecc=0.0123, sqrt_a=5153.6, omega0=-1.2, i0=0.958,
        omega=0.6, omega_dot=-8.1e-9, delta_n=4.3e-9, idot=2.2e-10,
        cuc=1.2e-6, cus=7.4e-6, crc=221.3, crs=-45.0,
        cic=-6.5e-8, cis=1.1e-7,
    )


def _gal_eph():
    return GalileoEphemeris(
        prn=11, iod_nav=37, week=1250, toe=7200.0, toc=7200.0,
        m0=0.3, ecc=0.002, sqrt_a=5440.6, omega0=1.1, i0=0.97, omega=0.4,
        omega_dot=-5.6e-9, delta_n=3.1e-9, idot=4.1e-10, cuc=2e-6, cus=3e-6,
        crc=150.0, crs=30.0, cic=1e-7, cis=2e-7, af0=3e-4, af1=-2e-12,
        bgd_e1e5a=3.2e-9, sisa=107,
    )


# -------------------------------------------------------------------- CNAV
def test_cnav_message_field_roundtrip():
    eph = _gps_eph()
    for mtype in (10, 11, 30):
        bits = encode_message(eph, mtype, tow_next_s=7206.0, prn=eph.prn)
        f = parse_message(bits)
        assert f["prn"] == eph.prn and f["msg_type"] == mtype
        assert f["tow_s"] == 7206.0
    f10 = parse_message(encode_message(eph, 10, 7206.0, eph.prn))
    assert abs(f10["sqrt_a"] - eph.sqrt_a) < 1e-4
    assert abs(f10["m0"] - eph.m0) < 1e-8
    f11 = parse_message(encode_message(eph, 11, 7206.0, eph.prn))
    assert abs(f11["omega_dot"] - eph.omega_dot) < 2e-13
    assert abs(f11["crc"] - eph.crc) < 0.01
    f30 = parse_message(encode_message(eph, 30, 7206.0, eph.prn))
    assert abs(f30["af0"] - eph.af0) < 1e-10
    assert abs(f30["tgd"] - eph.tgd) < 1e-10


def test_cnav_stream_decode_with_noise_and_offset():
    """Decoder locks onto a continuously-encoded stream starting at an
    arbitrary symbol offset and polarity, assembling the full ephemeris."""
    eph = _gps_eph()
    enc = CnavEncoder(eph, tow0_s=7200.0)
    sym = enc.symbols(6).astype(np.float64)     # 36 s
    signs = -(1.0 - 2.0 * sym)                  # inverted polarity
    rng = np.random.default_rng(4)
    signs = np.sign(signs + rng.normal(0, 0.35, len(signs)))
    offset = 137                                # mid-message start
    signs = signs[offset:]
    stamps = np.arange(offset, offset + len(signs)) * 100 + 99

    dec = CnavDecoder(prn=6)
    events = []
    for i in range(0, len(signs), 50):
        events.extend(dec.push_symbols(signs[i:i+50], stamps[i:i+50]))
    assert dec.msgs_ok >= 4
    assert dec.ephemeris_complete
    assert abs(dec.eph.sqrt_a - eph.sqrt_a) < 1e-4
    assert abs(dec.eph.af0 - eph.af0) < 1e-10
    # TOW semantics: event tow = start of NEXT message; the stamp is the
    # last symbol of the message, i.e. 600 symbols per 6 s message
    for ev in events:
        k = (ev["tow_s"] - 7200.0) / MSG_SECONDS    # message index + 1
        # message k-1 spans symbols [600(k-1), 600k); its last symbol's
        # stamp (100 units/symbol here) is 600k*100 - 1
        assert ev["sample_stamp"] == int(600 * k) * 100 - 1


# -------------------------------------------------------------------- FNAV
def test_fnav_page_field_roundtrip():
    eph = _gal_eph()
    iono = GalileoIono(ai0=30.25, ai1=0.16, ai2=0.002)
    eph2 = GalileoEphemeris(prn=11)
    iono2 = GalileoIono()
    for ptype, tow in ((1, 7200.0), (2, 7210.0), (3, 7220.0), (4, 7230.0)):
        data = encode_page(eph, iono, ptype, tow)
        ev = parse_page(data, eph2, iono2)
        assert ev["page_type"] == ptype
        assert ev["tow_s"] == tow
    assert eph2.complete
    assert abs(eph2.sqrt_a - eph.sqrt_a) < 1e-5
    assert abs(eph2.m0 - eph.m0) < 1e-9
    assert abs(eph2.af0 - eph.af0) < 1e-10
    assert abs(eph2.bgd_e1e5a - eph.bgd_e1e5a) < 1.5e-10  # half of the 2^-32 LSB
    assert abs(iono2.ai0 - iono.ai0) < 0.25
    assert eph2.iod_nav == eph.iod_nav


def test_fnav_stream_decode_with_noise():
    eph = _gal_eph()
    enc = FnavEncoder(eph, GalileoIono(), tow0_s=7200.0)
    sym = enc.symbols(6).astype(np.float64)     # 60 s: pages 1..5,1
    signs = 1.0 - 2.0 * sym
    rng = np.random.default_rng(9)
    soft = signs + rng.normal(0, 0.45, len(signs))
    offset = 213
    soft = soft[offset:]
    stamps = np.arange(offset, offset + len(soft)) * 250 + 249

    dec = FnavDecoder(prn=11)
    events = []
    for i in range(0, len(soft), 40):
        events.extend(dec.push_symbols(np.sign(soft[i:i+40]),
                                       stamps[i:i+40]))
    assert dec.pages_ok >= 4
    assert dec.eph.complete
    assert abs(dec.eph.sqrt_a - eph.sqrt_a) < 1e-5
    assert any(ev["ephemeris_complete"] for ev in events)
    # TOW semantics: tow_s = page-start TOW + 10 s at the page's last symbol
    for ev in events:
        page_start = ev["tow_s"] - PAGE_SECONDS
        k = (page_start - 7200.0) / PAGE_SECONDS
        assert ev["sample_stamp"] == (
            int((k + 1) * PAGE_SYMBOLS) * 250 - 1
        )


def test_fnav_frame_length():
    data = encode_page(_gal_eph(), GalileoIono(), 1, 7200.0)
    frame = _page_frame(data)
    assert frame.shape == (PAGE_SYMBOLS,)

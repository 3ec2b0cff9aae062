"""Galileo E6-B (HAS/CNAV) tests: codes, page codec, HAS assembly,
acquisition, factory (reference galileo_e6_signal_replica.cc,
galileo_cnav_message.cc, galileo_e6_has_msg_receiver.cc analogs)."""

import numpy as np

from gnss_sdr_tpu.codes.galileo_e6 import (
    galileo_e6b_code,
    galileo_e6c_code,
    galileo_e6c_secondary,
)
from gnss_sdr_tpu.constants import galileo_e6 as E6
from gnss_sdr_tpu.telemetry.hascnav import (
    CnavStreamDecoder,
    build_has_header,
    decode_page,
    encode_page,
    parse_has_header,
)


def test_e6_code_properties():
    for prn in (1, 25, 50):
        b = galileo_e6b_code(prn)
        c = galileo_e6c_code(prn)
        assert b.shape == (5115,) and c.shape == (5115,)
        assert set(np.unique(b)) <= {-1, 1}
        assert not np.array_equal(b, c)
    s = galileo_e6c_secondary(7)
    assert s.shape == (100,) and set(np.unique(s)) <= {-1, 1}
    assert not np.array_equal(galileo_e6b_code(1), galileo_e6b_code(2))


def test_page_codec_roundtrip_and_crc():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 448).astype(np.uint8)
    syms = encode_page(bits)
    assert syms.shape == (1000,)
    out = decode_page(syms)
    assert out is not None and np.array_equal(out, bits)
    # flip enough symbols to break the FEC -> CRC must reject
    bad = syms.copy()
    bad[100:240] = -bad[100:240]
    assert decode_page(bad) is None


def test_has_header_roundtrip():
    h = build_has_header(status=1, mt=1, mid=17, ms=6, pid=250)
    d = parse_has_header(h)
    assert d == {"status": 1, "mt": 1, "mid": 17, "ms": 6, "pid": 250}


def test_stream_decoder_assembles_message():
    rng = np.random.default_rng(1)
    syms = []
    for pid in range(1, 4):
        hdr = build_has_header(0, 1, 9, 3, pid)
        syms.append(encode_page(np.concatenate(
            [hdr, rng.integers(0, 2, 424).astype(np.uint8)])))
    dec = CnavStreamDecoder(3)
    evs = dec.push_symbols(np.concatenate(syms),
                           np.arange(3000) * 5115)
    assert dec.pages_ok == 3
    assert any(e["has_message_complete"] for e in evs)
    assert dec.assembler.messages[0].mid == 9


def test_e6_acquisition():
    from gnss_sdr_tpu.acquisition import PcpsAcquisition
    from gnss_sdr_tpu.codes.galileo_e6 import galileo_e6b_code_table
    from gnss_sdr_tpu.receiver.plans import galileo_e6b_plan

    fs = 10.23e6
    plan = galileo_e6b_plan(fs=fs, doppler_max_hz=3000.0,
                            doppler_step_hz=500.0)
    conf = plan.acq_conf
    rng = np.random.default_rng(4)
    n = conf.input_samples
    t = np.arange(n) / fs
    code = galileo_e6b_code(11).astype(np.float64)
    chip = np.floor((t - 1000.5 / E6.CODE_RATE_CPS)
                    * E6.CODE_RATE_CPS).astype(np.int64)
    x = np.sqrt(10 ** 4.7 / fs) * code[chip % 5115] * np.exp(
        2j * np.pi * 1200.0 * t)
    x = (x + rng.normal(scale=np.sqrt(0.5), size=n)
         + 1j * rng.normal(scale=np.sqrt(0.5), size=n)).astype(np.complex64)
    eng = PcpsAcquisition(conf, galileo_e6b_code_table(),
                          list(plan.search_prns))
    res = eng.acquire(x[None], np.array([10]))
    assert res.detected[0]
    assert abs(res.doppler_hz[0] - 1200.0) <= 250.0
    sps = fs / E6.CODE_RATE_CPS
    assert abs(res.delay_samples[0] - 1000.5 * sps) <= 2.0


def test_factory_builds_e6_and_glonass_l2():
    from gnss_sdr_tpu.config.configuration import InMemoryConfiguration
    from gnss_sdr_tpu.receiver.factory import get_signal_plans

    cfg = InMemoryConfiguration({
        "Channels_E6.count": "2",
        "Channels_2G.count": "3",
    })
    plans = get_signal_plans(cfg, {"E6": 10.23e6, "G2": 5.11e6})
    names = {p.name for p in plans}
    assert names == {"E6", "2G"}
    g2 = next(p for p in plans if p.name == "2G")
    assert g2.trk_conf.fdma and g2.carrier_offset_hz(10) == -7 * 437500.0

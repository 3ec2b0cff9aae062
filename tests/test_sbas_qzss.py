"""SBAS L1 and QZSS L1/L5: codes, telemetry codec, acquisition, factory.

Reference analogs: sbas_l1_telemetry_decoder_gs.cc, qzss_signal_replica.cc
and their adapters. Full end-to-end PVT is exercised by the GPS path (the
QZSS chain is GPS-identical); here the new pieces are validated:
C/A-family code extensions, the 250 bps SBAS message codec, and the
acquisition of both signal types from synthetic baseband."""

import numpy as np

from gnss_sdr_tpu.acquisition import PcpsAcquisition
from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code
from gnss_sdr_tpu.receiver.plans import qzss_l1_ca_plan, sbas_l1_plan
from gnss_sdr_tpu.telemetry.sbas import (
    SbasDecoder,
    SbasEncoder,
    encode_message,
    parse_message,
)

FS = 2.046e6


def test_ca_family_codes_balanced():
    for prn in (120, 129, 138, 193, 202):
        c = gps_l1_ca_code(prn).astype(np.int64)
        assert c.shape == (1023,)
        assert abs(int(c.sum())) == 1            # Gold-code balance
    # distinct codes across the family
    assert not np.array_equal(gps_l1_ca_code(120), gps_l1_ca_code(121))
    assert not np.array_equal(gps_l1_ca_code(193), gps_l1_ca_code(1))


def test_sbas_message_codec():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2, 212).astype(np.uint8)
    bits = encode_message(63, data, preamble_idx=2)
    msg = parse_message(bits)
    assert msg is not None and msg["msg_type"] == 63
    assert np.array_equal(msg["data"], data)
    bad = bits.copy()
    bad[100] ^= 1
    assert parse_message(bad) is None


def test_sbas_stream_decode_with_polarity_flip():
    enc = SbasEncoder(prn=131)
    syms = enc.symbols(8)
    dec = SbasDecoder(131)
    evs = dec.push_symbols(-syms, np.arange(len(syms)) * 2046)
    assert dec.msgs_ok >= 5
    types = [e["msg_type"] for e in evs]
    assert set(types) <= {0, 2, 3, 4, 9}


def _acquire_one(plan, prn, doppler, delay_chips, seed=0):
    conf = plan.acq_conf
    rng = np.random.default_rng(seed)
    n = conf.input_samples
    t = np.arange(n) / conf.fs
    code = gps_l1_ca_code(prn).astype(np.float64)
    chip = np.floor(
        (t - delay_chips / 1.023e6) * 1.023e6).astype(np.int64)
    x = np.sqrt(10 ** 4.6 / conf.fs) * code[chip % 1023] * np.exp(
        2j * np.pi * doppler * t)
    x = x + rng.normal(scale=np.sqrt(0.5), size=n) + 1j * rng.normal(
        scale=np.sqrt(0.5), size=n)
    eng = PcpsAcquisition(conf, plan.code_table, list(plan.search_prns))
    row = plan.prn_row(prn)
    res = eng.acquire(x[None].astype(np.complex64), np.array([row]))
    return res


def test_qzss_l1_acquisition():
    plan = qzss_l1_ca_plan(fs=FS)
    res = _acquire_one(plan, 197, doppler=1500.0, delay_chips=222.0)
    assert res.detected[0]
    assert abs(res.doppler_hz[0] - 1500.0) <= 125.0
    assert abs(res.delay_samples[0] - 222.0 * 2) <= 1.5


def test_sbas_l1_acquisition():
    plan = sbas_l1_plan(fs=FS)
    res = _acquire_one(plan, 131, doppler=-300.0, delay_chips=700.5)
    assert res.detected[0]
    assert abs(res.doppler_hz[0] - (-300.0)) <= 125.0
    assert abs(res.delay_samples[0] - 700.5 * 2) <= 1.5


def test_factory_builds_qzss_sbas_plans():
    from gnss_sdr_tpu.config.configuration import InMemoryConfiguration
    from gnss_sdr_tpu.receiver.factory import get_signal_plans

    cfg = InMemoryConfiguration({
        "Channels_J1.count": "2",
        "Channels_SBAS.count": "1",
    })
    plans = get_signal_plans(cfg, 2.046e6)
    names = {p.name for p in plans}
    assert names == {"J1", "1S"}
    sb = next(p for p in plans if p.name == "1S")
    assert sb.trk_conf.extend_correlation_symbols == 2
    assert sb.prn_row(120) == 0

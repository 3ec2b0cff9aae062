"""RTCM 2.3 codec round-trips (reference rtklib_rtcm2.cc +
rtklib_rtcm.cc input_rtcm2 + rtklib_rtkcmn.cc decode_word)."""

import numpy as np
import pytest

from gnss_sdr_tpu.outputs.rtcm2 import (
    DgpsCorrection,
    Rtcm2Decoder,
    Rtcm2Encoder,
    apply_dgps_corrections,
    decode_word,
    _parity6,
)


def test_parity_word_roundtrip():
    # construct a word manually and verify decode_word recovers the bytes
    data = 0x123456
    w = (0 << 31) | (0 << 30) | (data << 6)
    w |= _parity6(w)
    assert decode_word(w) == bytes((0x12, 0x34, 0x56))
    # single bit flip fails parity
    assert decode_word(w ^ (1 << 12)) is None


def test_type1_corrections_roundtrip():
    enc = Rtcm2Encoder(staid=321)
    corr = {
        3: DgpsCorrection(prc=12.34, rrc=0.016, iod=45, udre=1),
        17: DgpsCorrection(prc=-8.22, rrc=-0.01, iod=46, udre=0),
        32: DgpsCorrection(prc=250.0, rrc=0.1, iod=47, udre=2),  # fact=1
    }
    stream = enc.type1(corr, zcnt_s=1234.2)
    dec = Rtcm2Decoder(approx_tow_s=1234.0)
    types = dec.push(stream)
    assert types == [7]
    st = dec.state
    assert st.staid == 321
    assert set(st.dgps) == {3, 17, 32}
    assert st.dgps[3].prc == pytest.approx(12.34, abs=0.02)
    assert st.dgps[3].rrc == pytest.approx(0.016, abs=0.002)
    assert st.dgps[3].iod == 45 and st.dgps[3].udre == 1
    assert st.dgps[17].prc == pytest.approx(-8.22, abs=0.02)
    # fact=1 scaling (0.32 m LSB)
    assert st.dgps[32].prc == pytest.approx(250.0, abs=0.32)
    assert st.zcnt_s == pytest.approx(1234.2, abs=0.6)


def test_type3_station_and_type14_time_and_type16_text():
    enc = Rtcm2Encoder(staid=7)
    pos = (4027892.12, -307045.93, 4919478.51)
    dec = Rtcm2Decoder(approx_tow_s=100.0)
    assert dec.push(enc.type3(pos, zcnt_s=100.2)) == [5]
    got = dec.state.station_pos
    assert got == pytest.approx(pos, abs=0.011)
    assert dec.push(enc.type14(week=2345 % 1024, hour=12, leaps=18,
                               zcnt_s=100.8)) == [6]
    assert dec.state.week == 2345 % 1024
    assert dec.state.leaps == 18
    assert dec.push(enc.type16("GNSS SDR TPU", zcnt_s=101.4)) == [9]
    assert dec.state.message == "GNSS SDR TPU"


def test_stream_resync_after_garbage():
    """A decoder joining mid-stream locks onto the first message whose
    leading word's D29*/D30* chain it has seen — i.e. the second message
    after garbage (words chain parity across message boundaries)."""
    enc = Rtcm2Encoder(staid=1)
    msg1 = enc.type16("FIRST", zcnt_s=10.2)
    msg2 = enc.type16("OK", zcnt_s=10.8)
    dec = Rtcm2Decoder(approx_tow_s=10.0)
    garbage = bytes([0x40 | (i % 64) for i in range(40)])
    types = dec.push(garbage + msg1 + msg2)
    assert 9 in types
    assert dec.state.message == "OK"


def test_satellite_problem_flag_skipped():
    # prc = -0x8000 marks an unusable satellite (rtklib_rtcm2.cc:131)
    enc = Rtcm2Encoder()
    bits = []
    bits += enc._bits(0, 1) + enc._bits(0, 2) + enc._bits(5, 5)
    bits += enc._bits(-0x8000, 16) + enc._bits(0, 8) + enc._bits(9, 8)
    stream = enc._frame(1, bits, zcnt_s=0.0)
    dec = Rtcm2Decoder()
    assert dec.push(stream) == [7]
    assert 5 not in dec.state.dgps


def test_apply_dgps_corrections():
    st = Rtcm2Decoder().state
    st.dgps[9] = DgpsCorrection(prc=5.0, rrc=0.5, iod=1, udre=0, t0=100.0)
    prs = {9: 2.0e7, 11: 2.1e7}
    out = apply_dgps_corrections(prs, st, t=102.0)
    assert out[9] == pytest.approx(2.0e7 + 5.0 + 1.0)
    assert out[11] == 2.1e7                     # no correction
    stale = apply_dgps_corrections(prs, st, t=300.0)
    assert stale[9] == 2.0e7                    # age-gated

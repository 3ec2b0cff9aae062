"""SUPL/RRLP wire-format interop vs the reference's asn1c codecs.

The oracle (tests/oracle/supl_oracle.c) compiles the reference's own
generated SUPL/RRLP UPER codecs at test time. Validation layers:

1. Oracle DECODE of our encoded ULP messages + XER field assertions
   (authoritative for every type).
2. Byte-exact uper re-encode round-trips where the reference snapshot's
   encoder works (its uper encoder is bit-rotted for extensible
   all-mandatory SEQUENCEs — SUPL-POS/END/RRLP are unaffected).
3. Oracle-built golden RRLP assistance-data bytes -> our decoder ->
   our re-encode must reproduce the golden bytes exactly.
4. A mock-transport SUPL session exercising the full SET-initiated flow.

Skipped when the reference mount or gcc is unavailable.
"""

import ctypes
import shutil
import subprocess
from pathlib import Path

import pytest

from gnss_sdr_tpu.receiver.supl import (
    SuplClient,
    SuplConfig,
    decode_rrlp,
    decode_ulp,
    encode_rrlp,
    encode_ulp,
    extract_assistance,
)

SUPL_REF = Path("/root/reference/src/core/libs/supl")
SRC = Path(__file__).parent / "oracle" / "supl_oracle.c"

pytestmark = pytest.mark.skipif(
    not SUPL_REF.exists() or shutil.which("gcc") is None,
    reason="reference SUPL tree or gcc unavailable",
)


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    build = tmp_path_factory.mktemp("supl_oracle")
    lib_path = build / "libsupl_oracle.so"
    srcs = (sorted((SUPL_REF / "asn-supl").glob("*.c"))
            + sorted((SUPL_REF / "asn-rrlp").glob("*.c"))
            + sorted((SUPL_REF / "types").glob("*.c")))
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-O1", "-w", "-fcommon",
         "-o", str(lib_path), str(SRC)] + [str(s) for s in srcs]
        + [f"-I{SUPL_REF / d}" for d in ("asn-supl", "asn-rrlp", "types")],
        check=True, capture_output=True)
    lib = ctypes.CDLL(str(lib_path))
    return lib


def _xer(lib, fn, data: bytes) -> str:
    out = ctypes.create_string_buffer(1 << 17)
    n = fn(data, len(data), out, 1 << 17)
    assert n > 0, f"oracle decode failed rc={n}"
    return out.raw[:n].decode()


def _roundtrip(lib, fn, data: bytes):
    out = ctypes.create_string_buffer(1 << 16)
    n = fn(data, len(data), out, 1 << 16)
    return (out.raw[:n] if n > 0 else None), n


def test_oracle_decodes_supl_start(oracle):
    c = SuplClient(SuplConfig(mcc=244, mnc=5, lac=0x59E2, ci=0x31D2))
    xer = _xer(oracle, oracle.ulp_to_xer, c.make_start())
    assert "<msSUPLSTART>" in xer
    assert "<refMCC>244</refMCC>" in xer
    assert "<refLAC>23010</refLAC>" in xer
    assert "<agpsSETBased><true/></agpsSETBased>" in xer
    assert "<rrlp><true/></rrlp>" in xer
    assert "<agpsSETBasedPreferred/>" in xer
    assert "<current/>" in xer
    assert "<imsi>09 91 42 35 71 99 22 F0</imsi>" in xer


def test_oracle_decodes_supl_pos_init(oracle):
    c = SuplClient(SuplConfig(request=1))
    xer = _xer(oracle, oracle.ulp_to_xer, c.make_pos_init())
    assert "<msSUPLPOSINIT>" in xer
    assert ("<navigationModelRequested><true/>"
            "</navigationModelRequested>") in xer
    assert ("<referenceTimeRequested><true/>"
            "</referenceTimeRequested>") in xer
    assert "<almanacRequested><false/></almanacRequested>" in xer


def test_byte_exact_roundtrips_where_oracle_encoder_works(oracle):
    c = SuplClient()
    for name, b in [("ack", c.make_rrlp_ack(3)), ("end", c.make_end())]:
        rt, n = _roundtrip(oracle, oracle.ulp_roundtrip, b)
        assert rt == b, f"{name}: oracle re-encode differs (rc={n})"
    rr = encode_rrlp({"referenceNumber": 5,
                      "component": ("assistanceDataAck", None)})
    rt, n = _roundtrip(oracle, oracle.rrlp_roundtrip, rr)
    assert rt == rr


def test_golden_assistance_data_decodes_and_reencodes(oracle):
    out = ctypes.create_string_buffer(4096)
    n = oracle.rrlp_assist_golden(out, 4096)
    assert n > 0
    golden = out.raw[:n]
    d = decode_rrlp(golden)
    assert d["referenceNumber"] == 2
    a = extract_assistance(d)
    assert a["ref_time"] == pytest.approx((98765.36, 345))
    eph = a["ephemerides"][("G", 7)]
    assert eph.sqrt_a == pytest.approx(2702000000 * 2.0 ** -19)
    assert eph.iodc == 321
    assert eph.ecc == pytest.approx(40000000 * 2.0 ** -33)
    assert eph.crs == pytest.approx(251 * 2.0 ** -5)
    assert eph.af0 == pytest.approx(123456 * 2.0 ** -31)
    assert a["iono"].alpha[0] == pytest.approx(10 * 2.0 ** -30)
    assert a["iono"].beta[1] == pytest.approx(-21 * 2.0 ** 14)
    # byte-exact inverse
    assert encode_rrlp(d) == golden


def test_self_roundtrip_all_messages():
    c = SuplClient()
    for b in (c.make_start(), c.make_pos_init(), c.make_rrlp_ack(0),
              c.make_end()):
        d = decode_ulp(b)
        assert encode_ulp({k: v for k, v in d.items()
                           if k != "length"}) == b


class _MockSlp:
    """Scripted SLP: RESPONSE, one assistance POS (more), one final POS,
    then END."""

    def __init__(self, oracle):
        out = ctypes.create_string_buffer(4096)
        n = oracle.rrlp_assist_golden(out, 4096)
        self.golden = out.raw[:n]
        self.sent: list[bytes] = []
        self._step = 0

    def send(self, data: bytes) -> None:
        self.sent.append(data)

    def recv(self) -> bytes:
        self._step += 1
        sid = {"setSessionID": {"sessionId": 1,
                                "setId": ("imsi", b"\x09" * 8)},
               "slpSessionID": {
                   "sessionID": b"\x00\x00\x00\x07",
                   "slpId": ("iPAddress",
                             ("ipv4Address", b"\x7f\x00\x00\x01"))}}
        ver = {"maj": 1, "min": 0, "servind": 0}
        if self._step == 1:
            return encode_ulp({
                "version": ver, "sessionID": sid,
                "message": ("msSUPLRESPONSE", {
                    "posMethod": "agpsSETbased", "sLPAddress": None,
                    "sETAuthKey": None, "keyIdentity4": None})})
        if self._step == 2:
            rrlp = decode_rrlp(self.golden)
            rrlp["component"][1]["moreAssDataToBeSent"] = \
                "moreMessagesOnTheWay"
            return encode_ulp({
                "version": ver, "sessionID": sid,
                "message": ("msSUPLPOS", {
                    "posPayLoad": ("rrlpPayload", encode_rrlp(rrlp)),
                    "velocity": None})})
        if self._step == 3:
            return encode_ulp({
                "version": ver, "sessionID": sid,
                "message": ("msSUPLPOS", {
                    "posPayLoad": ("rrlpPayload", self.golden),
                    "velocity": None})})
        return encode_ulp({
            "version": ver, "sessionID": sid,
            "message": ("msSUPLEND", {
                "position": None, "statusCode": None, "ver": None})})


def test_full_session_flow(oracle):
    slp = _MockSlp(oracle)
    client = SuplClient(SuplConfig(request=1), transport=slp)
    assist = client.get_assistance()
    # START, POSINIT, ACK (after "more"), END
    kinds = [decode_ulp(b)["message"][0] for b in slp.sent]
    assert kinds == ["msSUPLSTART", "msSUPLPOSINIT", "msSUPLPOS",
                     "msSUPLEND"]
    assert ("G", 7) in assist["ephemerides"]
    assert assist["iono"] is not None
    assert assist["ref_time"][1] == 345
    # slpSessionID harvested from the RESPONSE rides in later messages
    posinit = decode_ulp(slp.sent[1])
    assert posinit["sessionID"]["slpSessionID"] is not None

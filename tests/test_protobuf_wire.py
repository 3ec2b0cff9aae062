"""Protobuf monitor wire-format parity with the reference.

The hand-rolled proto3 codec (monitor/protobuf.py) must produce bytes
the reference's own schema decodes: these tests compile
docs/protobuf/gnss_synchro.proto and monitor_pvt.proto from the
read-only reference tree with protoc at test time (same oracle pattern
as tests/test_reference_oracle.py) and round-trip both directions.
Skipped when protoc / google.protobuf / the reference mount are absent.
"""

import importlib
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

from gnss_sdr_tpu.monitor.protobuf import (
    decode_gnss_synchro,
    decode_monitor_pvt_pb,
    decode_observables,
    encode_gnss_synchro,
    encode_message,
    encode_monitor_pvt_pb,
    encode_observables,
    GNSS_SYNCHRO_FIELDS,
    MONITOR_PVT_FIELDS,
)
from gnss_sdr_tpu.monitor.synchro import GnssSynchro

REF_PROTO = Path("/root/reference/docs/protobuf")


def _gen_bindings(tmp_path):
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable")
    if shutil.which("protoc") is None or not REF_PROTO.is_dir():
        pytest.skip("protoc or reference tree unavailable")
    out = tmp_path / "pb"
    out.mkdir()
    subprocess.run(
        ["protoc", f"-I{REF_PROTO}", f"--python_out={out}",
         "gnss_synchro.proto", "monitor_pvt.proto"],
        check=True)
    sys.path.insert(0, str(out))
    try:
        gs = importlib.import_module("gnss_synchro_pb2")
        mp = importlib.import_module("monitor_pvt_pb2")
    finally:
        sys.path.pop(0)
    return gs, mp


SAMPLE = GnssSynchro(
    system="E", signal="1B", prn=19, channel_id=3,
    acq_delay_samples=512.25, acq_doppler_hz=-1250.0,
    acq_samplestamp_samples=1234567, fs_hz=4.0e6,
    prompt_i=101.5, prompt_q=-3.25, cn0_db_hz=44.7,
    carrier_doppler_hz=-1248.8, carrier_phase_rads=2.5,
    code_phase_samples=511.75, tracking_sample_counter=99999999,
    flag_valid_symbol_output=True, correlation_length_ms=4,
    flag_valid_word=True, tow_at_current_symbol_ms=7314000,
    pseudorange_m=22123456.789, rx_time_s=7314.08,
    flag_valid_pseudorange=True, interp_tow_ms=7313999.5,
)


def test_reference_schema_decodes_our_synchro(tmp_path):
    gs, _ = _gen_bindings(tmp_path)
    msg = gs.GnssSynchro()
    msg.ParseFromString(encode_gnss_synchro(SAMPLE))
    assert msg.system == "E" and msg.signal == "1B"
    assert msg.prn == 19 and msg.channel_id == 3
    assert msg.fs == 4000000
    assert msg.cn0_db_hz == pytest.approx(44.7)
    assert msg.pseudorange_m == pytest.approx(22123456.789)
    assert msg.rx_time == pytest.approx(7314.08)
    assert msg.flag_valid_word and msg.flag_valid_pseudorange
    assert msg.tow_at_current_symbol_ms == 7314000


def test_our_decoder_reads_reference_bytes(tmp_path):
    gs, _ = _gen_bindings(tmp_path)
    msg = gs.GnssSynchro(
        system="G", signal="1C", prn=7, channel_id=-2,
        carrier_doppler_hz=321.5, cn0_db_hz=41.0,
        tracking_sample_counter=42, flag_valid_symbol_output=True,
        pseudorange_m=20123.5, fs=-1)
    d = decode_gnss_synchro(msg.SerializeToString())
    assert d["system"] == "G" and d["signal"] == "1C"
    assert d["prn"] == 7 and d["channel_id"] == -2
    assert d["fs"] == -1                     # negative int64 varint
    assert d["carrier_doppler_hz"] == pytest.approx(321.5)
    assert d["flag_valid_symbol_output"] is True


def test_observables_wrapper(tmp_path):
    gs, _ = _gen_bindings(tmp_path)
    buf = encode_observables([SAMPLE, SAMPLE])
    obs = gs.Observables()
    obs.ParseFromString(buf)
    assert len(obs.observable) == 2
    assert obs.observable[1].prn == 19
    back = decode_observables(buf)
    assert len(back) == 2 and back[0]["prn"] == 19


def test_monitor_pvt_against_reference_schema(tmp_path):
    _, mp = _gen_bindings(tmp_path)

    class Sol:
        tow_s = 7314.2
        pos_ecef = (4027892.1, 307045.9, 4919478.5)
        vel_ecef = (0.1, -0.2, 0.05)
        lat_rad = 0.8863
        lon_rad = 0.0761
        height_m = 181.5
        clock_bias_s = 1.3e-4
        num_sats = 8
        gdop = 2.1
        pdop = 1.8
        hdop = 1.0
        vdop = 1.5

    buf = encode_monitor_pvt_pb(Sol(), week=2345)
    msg = mp.MonitorPvt()
    msg.ParseFromString(buf)
    assert msg.week == 2345
    assert msg.pos_x == pytest.approx(4027892.1)
    assert msg.latitude == pytest.approx(50.78, abs=0.1)
    assert msg.valid_sats == 8
    assert msg.gdop == pytest.approx(2.1)
    d = decode_monitor_pvt_pb(buf)
    assert d["height"] == pytest.approx(181.5)


def test_roundtrip_without_reference():
    # pure self-test (runs even without protoc): encode -> decode
    d = decode_gnss_synchro(encode_gnss_synchro(SAMPLE))
    assert d["prn"] == 19
    assert d["acq_delay_samples"] == pytest.approx(512.25)
    assert d["interp_tow_ms"] == pytest.approx(7313999.5)
    # negative varints survive
    buf = encode_message(GNSS_SYNCHRO_FIELDS, {"channel_id": -5})
    assert decode_gnss_synchro(buf)["channel_id"] == -5
    buf = encode_message(MONITOR_PVT_FIELDS, {"week": 2345})
    assert decode_monitor_pvt_pb(buf)["week"] == 2345


def test_monitor_sink_protobuf_mode():
    import socket

    from gnss_sdr_tpu.monitor.sinks import GnssSynchroMonitor

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    mon = GnssSynchroMonitor([("127.0.0.1", port)], mode="protobuf")
    mon.push(SAMPLE)
    data = rx.recv(4096)
    mon.close()
    rx.close()
    d = decode_gnss_synchro(data)
    assert d["prn"] == 19 and d["signal"] == "1B"

"""Output writer + monitor tests (reference: PVT printer classes and
core/monitor serdes tests, e.g. tests/unit-tests/control-plane/protobuf_test.cc
and rinex_printer usage in system tests)."""

import json
import math
import socket
import xml.etree.ElementTree as ET

import numpy as np

from gnss_sdr_tpu.monitor import (
    GnssSynchro,
    GnssSynchroMonitor,
    MonitorPvtUdpSink,
    decode_monitor_pvt,
    decode_synchro,
    encode_synchro,
)
from gnss_sdr_tpu.outputs import (
    GeoJsonPrinter,
    GpxPrinter,
    KmlPrinter,
    NmeaPrinter,
    RinexNavWriter,
    RinexObsWriter,
    geohash_encode,
)
from gnss_sdr_tpu.outputs.gpstime import datetime_to_gps, gps_to_datetime
from gnss_sdr_tpu.pvt.solver import PvtSolution
from gnss_sdr_tpu.telemetry.lnav import GpsEphemeris


def _sol(lat_deg=41.275, lon_deg=1.9876, h=80.0, tow=345600.0):
    return PvtSolution(
        valid=True,
        pos_ecef=np.array([4797680.0, 166506.0, 4185424.0]),
        vel_ecef=np.array([1.0, 2.0, 0.5]),
        clock_bias_s=1e-6,
        clock_drift_ss=1e-9,
        lat_rad=math.radians(lat_deg),
        lon_rad=math.radians(lon_deg),
        height_m=h,
        gdop=2.5, pdop=2.0, hdop=1.2, vdop=1.6,
        num_sats=7,
        tow_s=tow,
    )


# ----------------------------------------------------------------- gps time
def test_gps_time_roundtrip():
    t = gps_to_datetime(2340, 345600.0)
    wk, tow = datetime_to_gps(t)
    assert wk == 2340 and abs(tow - 345600.0) < 1e-6


# --------------------------------------------------------------------- NMEA
def test_nmea_sentences():
    p = NmeaPrinter(week=2340)
    out = p.print_position(_sol())
    assert len(out) == 4
    gga = out[0]
    # checksum valid
    body, cs = gga[1:].split("*")
    c = 0
    for ch in body:
        c ^= ord(ch)
    assert f"{c:02X}" == cs
    assert body.startswith("GPGGA")
    # lat 41.275 -> 4116.5 minutes format
    fields = body.split(",")
    assert fields[2].startswith("4116.5")
    assert fields[3] == "N"
    assert fields[5] == "E"
    assert fields[6] == "1"
    assert fields[7] == "07"


def test_nmea_southern_western():
    p = NmeaPrinter()
    out = p.print_position(_sol(lat_deg=-33.9, lon_deg=-70.8))
    fields = out[0][1:].split("*")[0].split(",")
    assert fields[3] == "S" and fields[5] == "W"


# ------------------------------------------------------------- track files
def test_kml_gpx_geojson(tmp_path):
    sols = [_sol(tow=345600.0 + i) for i in range(5)]

    kml = KmlPrinter(str(tmp_path / "t.kml"))
    gpx = GpxPrinter(str(tmp_path / "t.gpx"), week=2340)
    gj = GeoJsonPrinter(str(tmp_path / "t.geojson"))
    for s in sols:
        kml.print_position(s)
        gpx.print_position(s)
        gj.print_position(s)
    kml.close(); gpx.close(); gj.close()

    root = ET.parse(tmp_path / "t.kml").getroot()
    coords = root.find(".//{http://www.opengis.net/kml/2.2}coordinates").text
    assert len(coords.strip().splitlines()) == 5

    root = ET.parse(tmp_path / "t.gpx").getroot()
    pts = root.findall(".//{http://www.topografix.com/GPX/1/1}trkpt")
    assert len(pts) == 5
    assert abs(float(pts[0].get("lat")) - 41.275) < 1e-9

    doc = json.loads((tmp_path / "t.geojson").read_text())
    assert doc["geometry"]["type"] == "LineString"
    assert len(doc["geometry"]["coordinates"]) == 5


# ------------------------------------------------------------------ geohash
def test_geohash_known_values():
    # canonical test vector: Jutland ~ u4pruydqqvj
    assert geohash_encode(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geohash_encode(0.0, 0.0, 5) == "s0000"


# -------------------------------------------------------------------- RINEX
def test_rinex_obs(tmp_path):
    path = tmp_path / "obs.rnx"
    w = RinexObsWriter(str(path), week=2340, approx_pos=(4797680, 166506, 4185424))
    w.write_epoch(345600.0, [
        {"prn": 3, "pseudorange_m": 21234567.123,
         "carrier_phase_cycles": 111222333.25,
         "doppler_hz": -1234.5, "cn0_dbhz": 44.0},
        {"prn": 17, "pseudorange_m": 23456789.5},
    ])
    w.write_epoch(345600.1, [{"prn": 3, "pseudorange_m": 21234568.0}])
    w.close()
    text = path.read_text().splitlines()
    hdr_end = [i for i, l in enumerate(text) if "END OF HEADER" in l][0]
    hdr = text[: hdr_end + 1]
    assert any("RINEX VERSION / TYPE" in l and "3.02" in l for l in hdr)
    assert any("SYS / # / OBS TYPES" in l and "C1C" in l for l in hdr)
    assert any("TIME OF FIRST OBS" in l for l in hdr)
    body = text[hdr_end + 1:]
    assert body[0].startswith("> 2024") or body[0].startswith("> 2")
    assert body[0].rstrip().endswith("2")  # 2 sats
    assert body[1].startswith("G03")
    assert "21234567.123" in body[1]
    assert body[2].startswith("G17")


def test_rinex_nav(tmp_path):
    path = tmp_path / "nav.rnx"
    eph = GpsEphemeris(
        prn=5, week=2340, toc=345600.0, toe=345600.0,
        af0=1.2e-4, af1=-3.4e-12, af2=0.0,
        sqrt_a=5153.7, ecc=0.012, m0=1.0, omega0=2.0, i0=0.95,
        omega=0.5, omega_dot=-8.1e-9, delta_n=4.3e-9, idot=2.2e-10,
        cuc=1e-6, cus=2e-6, crc=200.0, crs=50.0, cic=1e-7, cis=-1e-7,
        tgd=4.6e-9, iodc=44, iode_sf2=44, iode_sf3=44,
    )
    w = RinexNavWriter(str(path))
    w.write_ephemeris(eph)
    w.close()
    lines = path.read_text().splitlines()
    body = lines[[i for i, l in enumerate(lines) if "END OF HEADER" in l][0] + 1:]
    assert body[0].startswith("G05")
    assert len(body) == 8
    # sqrt_a is the 4th field of the 3rd line (broadcast orbit 2)
    assert "5.153700000000E+03" in body[2]
    # every nav field is 19 chars: 4-space indent + 4*19
    assert all(len(l) == 4 + 4 * 19 for l in body[1:])


# ------------------------------------------------------------------ monitor
def test_synchro_serdes_roundtrip():
    s = GnssSynchro(
        system="G", signal="1C", prn=17, channel_id=3,
        acq_delay_samples=1024.5, acq_doppler_hz=-2500.0,
        acq_samplestamp_samples=123456789,
        fs_hz=2.6e6, prompt_i=1234.5, prompt_q=-67.8,
        cn0_db_hz=43.2, carrier_doppler_hz=-2498.7,
        carrier_phase_rads=12345.678, code_phase_samples=512.25,
        tracking_sample_counter=987654321,
        flag_valid_symbol_output=True, correlation_length_ms=20,
        flag_valid_word=True, tow_at_current_symbol_ms=345600000,
        pseudorange_m=21234567.89, carrier_phase_cycles=111.5,
        rx_time_s=345600.02, flag_valid_pseudorange=True,
        interp_tow_ms=345600020.0,
    )
    out = decode_synchro(encode_synchro(s))
    assert out == s


def test_synchro_monitor_udp():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]

    mon = GnssSynchroMonitor([("127.0.0.1", port)], decimation=2)
    for i in range(4):
        mon.push(GnssSynchro(prn=i + 1, cn0_db_hz=40.0 + i))
    got = [decode_synchro(rx.recv(4096)) for _ in range(2)]
    assert [g.prn for g in got] == [2, 4]  # decimation by 2
    mon.close(); rx.close()


def test_pvt_monitor_udp():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    sink = MonitorPvtUdpSink([("127.0.0.1", port)], week=2340)
    sink.push(_sol())
    rec = decode_monitor_pvt(rx.recv(4096))
    assert abs(rec["height_m"] - 80.0) < 1e-9
    assert rec["num_sats"] == 7
    sink.close(); rx.close()

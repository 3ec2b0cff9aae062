"""AN packet printer (Advanced Navigation INS link) and HAS simple
printer (reference an_packet_printer.cc / has_simple_printer.cc).
"""

import numpy as np

from gnss_sdr_tpu.outputs import (
    AnPacketPrinter,
    HasSimplePrinter,
    decode_sdr_gnss_packet,
    encode_sdr_gnss_packet,
)
from gnss_sdr_tpu.outputs.an_packet import crc16_ccitt
from gnss_sdr_tpu.pvt.solver import PvtSolution


def _sol():
    return PvtSolution(
        valid=True, pos_ecef=np.zeros(3), vel_ecef=np.zeros(3),
        clock_bias_s=0.0, clock_drift_ss=0.0,
        lat_rad=np.deg2rad(41.275), lon_rad=np.deg2rad(1.9876),
        height_m=80.0, num_sats=7)


def test_crc16_known_vector():
    # CRC16-CCITT(0xFFFF) of "123456789" is 0x29B1
    assert crc16_ccitt(b"123456789") == 0x29B1


def test_an_packet_roundtrip(tmp_path):
    sats = [
        {"system": "G", "prn": 7, "cn0_dbhz": 45, "doppler_hz": 1234.6},
        {"system": "G", "prn": 12, "cn0_dbhz": 41, "doppler_hz": -2850.2},
        {"system": "E", "prn": 11, "cn0_dbhz": 44, "doppler_hz": 40000.0},
    ]
    buf = encode_sdr_gnss_packet(_sol(), sats, elapsed_us=123456)
    assert len(buf) == 4 + 113
    got = decode_sdr_gnss_packet(buf)
    assert got is not None
    assert got["status"] == 15
    assert got["nsvfix"] == 7
    assert got["num_gps"] == 2 and got["num_gal"] == 1
    assert abs(got["lat_rad"] - np.deg2rad(41.275)) < 1e-12
    assert got["sats"][0]["prn"] == 7 and got["sats"][0]["doppler_hz"] == 1235
    assert got["sats"][2]["prn"] == 111          # Galileo +100
    assert got["sats"][2]["doppler_hz"] == 32767  # clipped to i16
    # corrupting a byte must fail the CRC
    bad = bytearray(buf)
    bad[20] ^= 0xFF
    assert decode_sdr_gnss_packet(bytes(bad)) is None

    p = tmp_path / "an.bin"
    pr = AnPacketPrinter(str(p))
    pr.print_solution(_sol(), sats)
    pr.print_solution(_sol(), sats)
    pr.close()
    raw = p.read_bytes()
    assert len(raw) == 2 * (4 + 113)
    assert decode_sdr_gnss_packet(raw[:117]) is not None


def test_has_simple_printer(tmp_path):
    from gnss_sdr_tpu.telemetry.hascnav import HasMessage

    rng = np.random.default_rng(0)
    msg = HasMessage(mid=5, data=rng.integers(0, 2, 424 * 2))
    p = tmp_path / "has.txt"
    pr = HasSimplePrinter(str(p))
    pr.print_message(msg)
    pr.print_message(msg)
    pr.close()
    text = p.read_text()
    assert text.count("=== HAS message") == 2
    assert "mid: 5" in text
    assert "848 bits" in text

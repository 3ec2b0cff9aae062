"""Cross-validation against the reference's own code generators.

The oracle binary (tests/oracle/oracle_codes.cc) compiles the upstream
reference's PRN generators straight from the read-only mount and dumps chip
levels — independent truth that breaks the self-referential-simulator loop
(round-1 verdict weak #6). Skipped when the reference tree or a C++
toolchain is unavailable.
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src/algorithms/libs")
SP = Path("/root/reference/src/core/system_parameters")
SRC = Path(__file__).parent / "oracle" / "oracle_codes.cc"

pytestmark = pytest.mark.skipif(
    not REF.exists() or shutil.which("g++") is None,
    reason="reference tree or g++ unavailable",
)


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    build = tmp_path_factory.mktemp("oracle")
    shim = build / "shim" / "gnuradio"
    shim.mkdir(parents=True)
    (shim / "gr_complex.h").write_text(
        "#pragma once\n#include <complex>\n"
        "typedef std::complex<float> gr_complex;\n"
    )
    glog_shim = build / "shim" / "glog"
    glog_shim.mkdir(parents=True)
    (glog_shim / "logging.h").write_text(
        "#pragma once\n"
        "struct OracleNullLog { template <class T>"
        " OracleNullLog& operator<<(const T&) { return *this; } };\n"
        "#define LOG(severity) OracleNullLog()\n"
    )
    exe = build / "oracle_codes"
    subprocess.run(
        ["g++", "-std=c++20", "-O2", "-DHAS_STD_SPAN=1",
         "-DUSE_GLOG_AND_GFLAGS=1",
         "-I", str(REF), "-I", str(SP), "-I", str(build / "shim"),
         "-o", str(exe), str(SRC),
         str(REF / "beidou_b1i_signal_replica.cc"),
         str(REF / "beidou_b3i_signal_replica.cc"),
         str(REF / "gps_sdr_signal_replica.cc"),
         str(REF / "gps_l2c_signal_replica.cc"),
         str(REF / "gps_l5_signal_replica.cc"),
         str(REF / "galileo_e5_signal_replica.cc"),
         str(REF / "glonass_l1_signal_replica.cc"),
         str(REF / "qzss_signal_replica.cc")],
        check=True, capture_output=True,
    )

    def run(family: str, prn: int) -> np.ndarray:
        out = subprocess.run(
            [str(exe), family, str(prn)], check=True, capture_output=True,
            text=True,
        ).stdout.split()
        vals = np.asarray([int(v) for v in out], dtype=np.float64)
        if family in ("l5i", "l5q", "e5ai", "e5aq", "e5bi", "e5bq"):
            pairs = vals.reshape(-1, 2)
            # the component rides whichever axis the reference put it on
            col = int(np.argmax(np.abs(pairs).sum(axis=0)))
            return pairs[:, col]
        return vals

    return run


def test_b1i_codes_match_reference(oracle):
    from gnss_sdr_tpu.codes.beidou_b1i import beidou_b1i_code

    for prn in (1, 6, 14, 25, 37):
        ours = beidou_b1i_code(prn)
        ref = oracle("b1i", prn)
        assert np.array_equal(ours, ref), f"B1I PRN {prn} mismatch"


def test_gps_ca_codes_match_reference(oracle):
    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code

    for prn in (1, 7, 19, 32):
        ours = gps_l1_ca_code(prn)
        ref = oracle("gpsca", prn)
        # sign convention may differ globally; accept exact or inverted
        assert (np.array_equal(ours, ref)
                or np.array_equal(ours, -ref)), f"C/A PRN {prn}"


def test_gps_l5_codes_match_reference(oracle):
    from gnss_sdr_tpu.codes.gps_l5 import gps_l5i_code, gps_l5q_code

    for prn in (1, 5, 17):
        for fam, gen in (("l5i", gps_l5i_code), ("l5q", gps_l5q_code)):
            ours = gen(prn)
            ref = oracle(fam, prn)
            assert (np.array_equal(ours, ref)
                    or np.array_equal(ours, -ref)), f"{fam} PRN {prn}"


def test_galileo_e5a_codes_match_reference(oracle):
    from gnss_sdr_tpu.codes.galileo_e5a import (
        galileo_e5ai_code,
        galileo_e5aq_code,
    )

    for prn in (1, 11, 30):
        for fam, gen in (("e5ai", galileo_e5ai_code),
                         ("e5aq", galileo_e5aq_code)):
            ours = gen(prn)
            ref = oracle(fam, prn)
            assert (np.array_equal(ours, ref)
                    or np.array_equal(ours, -ref)), f"{fam} PRN {prn}"


def test_galileo_e5b_codes_match_reference(oracle):
    from gnss_sdr_tpu.codes.galileo_e5b import (
        galileo_e5bi_code,
        galileo_e5bq_code,
    )

    for prn in (1, 11, 30):
        for fam, gen in (("e5bi", galileo_e5bi_code),
                         ("e5bq", galileo_e5bq_code)):
            ours = gen(prn)
            ref = oracle(fam, prn)
            assert (np.array_equal(ours, ref)
                    or np.array_equal(ours, -ref)), f"{fam} PRN {prn}"


def test_gps_l2cm_codes_match_reference(oracle):
    from gnss_sdr_tpu.codes.gps_l2c import gps_l2cm_code

    for prn in (1, 8, 24, 32):
        ours = gps_l2cm_code(prn)
        ref = oracle("l2cm", prn)
        assert (np.array_equal(ours, ref)
                or np.array_equal(ours, -ref)), f"L2 CM PRN {prn}"


def test_beidou_b3i_codes_match_reference(oracle):
    from gnss_sdr_tpu.codes.beidou_b3i import beidou_b3i_code

    for prn in (1, 6, 19, 37):
        ours = beidou_b3i_code(prn)
        ref = oracle("b3i", prn)
        assert np.array_equal(ours, ref), f"B3I PRN {prn} mismatch"


def test_glonass_ca_code_matches_reference(oracle):
    from gnss_sdr_tpu.codes.glonass_ca import glonass_ca_code

    ours = glonass_ca_code()
    ref = oracle("gloca", 0)
    assert np.array_equal(ours, ref), "GLONASS C/A m-sequence mismatch"


def test_qzss_l1_codes_match_reference(oracle):
    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code

    for prn in (193, 197, 202):
        ours = gps_l1_ca_code(prn)
        ref = oracle("qzssl1", prn)
        # binary->level mapping differs globally (our bit1 -> -1)
        assert (np.array_equal(ours, ref)
                or np.array_equal(ours, -ref)), f"QZSS L1 PRN {prn}"


def test_sbas_l1_codes_match_reference(oracle):
    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code

    for prn in (120, 127, 138):
        ours = gps_l1_ca_code(prn)
        ref = oracle("gpsca", prn)
        assert (np.array_equal(ours, ref)
                or np.array_equal(ours, -ref)), f"SBAS PRN {prn}"


def test_qzss_l5_codes_match_reference(oracle):
    from gnss_sdr_tpu.codes.gps_l5 import qzss_l5i_code, qzss_l5q_code

    for prn in (193, 199):
        for fam, gen in (("qzssl5i", qzss_l5i_code),
                         ("qzssl5q", qzss_l5q_code)):
            ours = gen(prn)
            ref = oracle(fam, prn)
            assert (np.array_equal(ours, ref)
                    or np.array_equal(ours, -ref)), f"{fam} PRN {prn}"

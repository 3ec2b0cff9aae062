"""Golden tests for PRN code generation.

Mirrors the reference's tests/unit-tests/arithmetic/code_generation_test.cc
strategy: check generated codes against ICD-published check values.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.codes.gps_l1_ca import (
    CODE_LENGTH,
    first_10_chips_octal,
    gps_l1_ca_code,
    gps_l1_ca_code_sampled,
)

# IS-GPS-200 Table 3-Ia: first 10 chips (octal) per PRN.
FIRST_10_CHIPS_OCTAL = {
    1: 1440, 2: 1620, 3: 1710, 4: 1744, 5: 1133, 6: 1455, 7: 1131, 8: 1454,
    9: 1626, 10: 1504, 11: 1642, 12: 1750, 13: 1764, 14: 1772, 15: 1775,
    16: 1776, 17: 1156, 18: 1467, 19: 1633, 20: 1715, 21: 1746, 22: 1763,
    23: 1063, 24: 1706, 25: 1743, 26: 1761, 27: 1770, 28: 1774, 29: 1127,
    30: 1453, 31: 1625, 32: 1712,
}


@pytest.mark.parametrize("prn", list(range(1, 33)))
def test_first_10_chips_match_icd(prn):
    assert first_10_chips_octal(prn) == FIRST_10_CHIPS_OCTAL[prn]


def test_code_properties():
    for prn in (1, 7, 22, 32):
        code = gps_l1_ca_code(prn)
        assert code.shape == (CODE_LENGTH,)
        assert set(np.unique(code)) <= {-1, 1}
        # Gold codes are nearly balanced: 512 ones (binary), 511 zeros.
        assert np.sum(code == -1) == 512


def test_codes_distinct_and_low_cross_correlation():
    c1 = gps_l1_ca_code(1).astype(np.float64)
    c2 = gps_l1_ca_code(2).astype(np.float64)
    # circular cross-correlation of Gold codes is bounded by 65/1023
    x1 = np.fft.fft(c1)
    x2 = np.fft.fft(c2)
    cc = np.fft.ifft(x1 * np.conj(x2)).real
    assert np.max(np.abs(cc)) <= 65.0 + 1e-6


def test_autocorrelation_peak():
    c = gps_l1_ca_code(5).astype(np.float64)
    x = np.fft.fft(c)
    ac = np.fft.ifft(x * np.conj(x)).real
    assert abs(ac[0] - 1023.0) < 1e-6
    assert np.max(np.abs(ac[1:])) <= 65.0 + 1e-6


def test_sampled_code_round_trip():
    fs = 4.092e6  # exactly 4 samples per chip
    s = gps_l1_ca_code_sampled(1, fs)
    assert s.shape == (4092,)
    code = gps_l1_ca_code(1)
    assert np.array_equal(s[::4].astype(np.int8), code)
    # chip_shift shifts the sampled sequence
    s_shift = gps_l1_ca_code_sampled(1, fs, chip_shift=1.0)
    assert np.array_equal(s_shift[: 4 * 1022 : 4].astype(np.int8), code[1:])


# ------------------------------------------------------------------ GPS L5
def test_l5_codes_match_reference_generator():
    """Bit-exact vs the reference gps_l5_signal_replica.cc generators
    (md5 over the {0,1} chips of PRNs 1..37, I then Q, computed from a
    compiled dump of the reference implementation)."""
    import hashlib

    from gnss_sdr_tpu.codes.gps_l5 import _code_table_bits

    mine = np.concatenate([_code_table_bits("I"), _code_table_bits("Q")])
    assert mine.shape == (74, 10230)
    digest = hashlib.md5(mine.astype(np.uint8).tobytes()).hexdigest()
    assert digest == "3d3b74dd7dd8a9e80064ae5e4f46d3ec"


def test_l5_code_properties():
    from gnss_sdr_tpu.codes.gps_l5 import (
        gps_l5i_code,
        gps_l5q_code,
        nh10_levels,
        nh20_levels,
    )

    i1 = gps_l5i_code(1).astype(np.float64)
    q1 = gps_l5q_code(1).astype(np.float64)
    assert i1.shape == (10230,) and set(np.unique(i1)) == {-1.0, 1.0}
    # I and Q components are distinct codes
    assert np.count_nonzero(gps_l5i_code(1) != gps_l5q_code(1)) > 4000
    # autocorrelation peak
    x = np.fft.fft(i1)
    ac = np.fft.ifft(x * np.conj(x)).real
    assert abs(ac[0] - 10230.0) < 1e-6
    assert np.max(np.abs(ac[1:])) < 0.05 * 10230
    # cross-correlation between PRNs stays low
    x2 = np.fft.fft(gps_l5i_code(7).astype(np.float64))
    cc = np.fft.ifft(x * np.conj(x2)).real
    assert np.max(np.abs(cc)) < 0.05 * 10230
    assert nh10_levels().shape == (10,) and nh20_levels().shape == (20,)
    # NH10 = 0000110101 -> levels + + + + - - + - + -
    np.testing.assert_array_equal(
        nh10_levels(), [1, 1, 1, 1, -1, -1, 1, -1, 1, -1])


# -------------------------------------------------------------- Galileo E5a
def test_e5a_codes_tables():
    from gnss_sdr_tpu.codes.galileo_e5a import (
        e5ai_secondary_levels,
        e5aq_secondary_levels,
        galileo_e5ai_code,
        galileo_e5aq_code,
    )

    c = galileo_e5ai_code(1)
    assert c.shape == (10230,)
    # ICD Annex C PRN1 E5a-I begins 3CEA... = 0011 1100 1110 1010 (bit 0 ->
    # +1 level)
    np.testing.assert_array_equal(
        c[:16],
        1 - 2 * np.array([0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 1, 0, 1, 0, 1, 0]),
    )
    q = galileo_e5aq_code(1).astype(np.float64)
    x = np.fft.fft(q)
    ac = np.fft.ifft(x * np.conj(x)).real
    assert abs(ac[0] - 10230.0) < 1e-6
    assert np.max(np.abs(ac[1:])) < 0.06 * 10230
    sec = e5aq_secondary_levels(1)
    assert sec.shape == (100,) and set(np.unique(sec)) <= {-1.0, 1.0}
    assert e5ai_secondary_levels().shape == (20,)

"""GPS LNAV (L1 C/A 50 bps) navigation message: frame sync, parity, parsing.

Independent implementation from IS-GPS-200 (§20.3.2-20.3.3): 30-bit words
with (32,26) Hamming parity chained through D29*/D30*, 300-bit subframes,
8-bit preamble 10001011, HOW with truncated TOW and subframe ID; subframes
1-3 carry clock + ephemeris, 4/5 almanac/iono/UTC.

Reference analog: gps_l1_ca_telemetry_decoder_gs.cc (frame sync/parity,
:216-233,270,623) + core/system_parameters/gps_navigation_message.cc
(subframe_decoder). Host-side bit logic per SURVEY.md §7 (control-heavy,
not worth device cycles).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

PREAMBLE_BITS = np.array([1, 0, 0, 0, 1, 0, 1, 1], dtype=np.int8)
BITS_PER_WORD = 30
WORDS_PER_SUBFRAME = 10
BITS_PER_SUBFRAME = 300
SUBFRAME_SECONDS = 6.0
BIT_SECONDS = 0.02

# Parity tap sets (IS-GPS-200 Table 20-XIV): data bits d1..d24 feeding
# D25..D30. Each row lists 1-based source-bit indices.
_PARITY_TAPS = [
    [1, 2, 3, 5, 6, 10, 11, 12, 13, 14, 17, 18, 20, 23],          # D25 (+D29*)
    [2, 3, 4, 6, 7, 11, 12, 13, 14, 15, 18, 19, 21, 24],          # D26 (+D30*)
    [1, 3, 4, 5, 7, 8, 12, 13, 14, 15, 16, 19, 20, 22],           # D27 (+D29*)
    [2, 4, 5, 6, 8, 9, 13, 14, 15, 16, 17, 20, 21, 23],           # D28 (+D30*)
    [1, 3, 5, 6, 7, 9, 10, 14, 15, 16, 17, 18, 21, 22, 24],       # D29 (+D30*)
    [3, 5, 6, 8, 9, 10, 11, 13, 15, 19, 22, 23, 24],              # D30 (+D29*)
]
_PARITY_PREV = [0, 1, 0, 1, 1, 0]  # 0 -> D29*, 1 -> D30*


def compute_parity(d24: np.ndarray, d29s: int, d30s: int) -> np.ndarray:
    """Parity bits D25..D30 for source bits d24 (len 24) given D29*/D30*."""
    prev = (d29s, d30s)
    out = np.empty(6, dtype=np.int8)
    for i, taps in enumerate(_PARITY_TAPS):
        p = prev[_PARITY_PREV[i]]
        for t in taps:
            p ^= int(d24[t - 1])
        out[i] = p
    return out


def check_parity_word(word32: np.ndarray) -> bool:
    """Check one transmitted word given [D29*, D30*, D1..D30] (len 32).

    Transmitted data bits are XORed with D30* on air
    (gps_word_parityCheck analog, gps_l1_ca_telemetry_decoder_gs.cc:216).
    """
    d29s, d30s = int(word32[0]), int(word32[1])
    rx = word32[2:]
    d24 = rx[:24] ^ d30s                # undo the D30* encoding inversion
    par = compute_parity(d24, d29s, d30s)
    return bool(np.array_equal(par, rx[24:30]))


def decode_word(word32: np.ndarray) -> np.ndarray | None:
    """Return the 24 decoded source bits, or None on parity failure."""
    if not check_parity_word(word32):
        return None
    return (word32[2:26] ^ int(word32[1])).astype(np.int8)


def _bits_to_uint(bits: np.ndarray) -> int:
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def _bits_to_int(bits: np.ndarray) -> int:
    v = _bits_to_uint(bits)
    if bits[0]:
        v -= 1 << len(bits)
    return v


@dataclass
class GpsEphemeris:
    """GPS clock + ephemeris parameters (IS-GPS-200 Table 20-III scalings
    applied; angles in radians, times in seconds of week).

    Reference analog: core/system_parameters/gps_ephemeris.h."""

    prn: int = 0
    week: int = 0
    sv_health: int = 0
    ura_index: int = 0
    iodc: int = 0
    iode_sf2: int = 0
    iode_sf3: int = 0
    tgd: float = 0.0
    toc: float = 0.0
    af0: float = 0.0
    af1: float = 0.0
    af2: float = 0.0
    crs: float = 0.0
    delta_n: float = 0.0
    m0: float = 0.0
    cuc: float = 0.0
    ecc: float = 0.0
    cus: float = 0.0
    sqrt_a: float = 0.0
    toe: float = 0.0
    cic: float = 0.0
    omega0: float = 0.0
    cis: float = 0.0
    i0: float = 0.0
    crc: float = 0.0
    omega: float = 0.0
    omega_dot: float = 0.0
    idot: float = 0.0
    fit_interval: int = 0

    # decode progress
    has_sf1: bool = False
    has_sf2: bool = False
    has_sf3: bool = False

    @property
    def complete(self) -> bool:
        return (
            self.has_sf1 and self.has_sf2 and self.has_sf3
            and self.iode_sf2 == self.iode_sf3
        )


@dataclass
class GpsIonoUtc:
    """Klobuchar iono + UTC parameters (subframe 4 page 18; IS-GPS-200
    20.3.3.5.1.7-9). Reference analog: gps_iono.h + gps_utc_model.h."""

    alpha0: float = 0.0
    alpha1: float = 0.0
    alpha2: float = 0.0
    alpha3: float = 0.0
    beta0: float = 0.0
    beta1: float = 0.0
    beta2: float = 0.0
    beta3: float = 0.0
    a0: float = 0.0               # UTC bias (s)
    a1: float = 0.0               # UTC drift (s/s)
    tot: float = 0.0              # reference time of UTC data (s)
    wn_t: int = 0
    delta_t_ls: int = 0           # current leap seconds
    wn_lsf: int = 0
    dn: int = 0
    delta_t_lsf: int = 0
    has_iono: bool = False
    has_utc: bool = False

    @property
    def alpha(self) -> np.ndarray:
        return np.array([self.alpha0, self.alpha1, self.alpha2, self.alpha3])

    @property
    def beta(self) -> np.ndarray:
        return np.array([self.beta0, self.beta1, self.beta2, self.beta3])


@dataclass
class GpsAlmanac:
    """Almanac entry (subframes 4/5 pages; IS-GPS-200 20.3.3.5.1.2).
    Reference analog: gps_almanac.h."""

    prn: int = 0
    ecc: float = 0.0
    toa: float = 0.0
    delta_i: float = 0.0          # rad, offset from 0.30 semicircles
    omega_dot: float = 0.0
    sv_health: int = 0
    sqrt_a: float = 0.0
    omega0: float = 0.0
    omega: float = 0.0
    m0: float = 0.0
    af0: float = 0.0
    af1: float = 0.0


PI_GPS = 3.1415926535898  # semicircle->rad factor fixed by the ICD


def parse_subframe(data: np.ndarray, eph: GpsEphemeris) -> tuple[int, float]:
    """Parse one subframe's 240 decoded source bits into `eph` (in place).

    Returns (subframe_id, tow_seconds) where tow is the transmit time of the
    *start of the next subframe* per the HOW definition.
    """
    assert data.shape == (240,)
    words = data.reshape(10, 24)
    how = words[1]
    tow_trunc = _bits_to_uint(how[:17])
    tow = float(tow_trunc) * SUBFRAME_SECONDS
    sf_id = _bits_to_uint(how[19:22])

    w = lambda i, a, b: words[i][a - 1 : b]          # 1-based bit slices

    if sf_id == 1:
        eph.week = _bits_to_uint(w(2, 1, 10))
        eph.ura_index = _bits_to_uint(w(2, 13, 16))
        eph.sv_health = _bits_to_uint(w(2, 17, 22))
        iodc_msb = _bits_to_uint(w(2, 23, 24))
        eph.tgd = _bits_to_int(w(6, 17, 24)) * 2.0**-31
        iodc_lsb = _bits_to_uint(w(7, 1, 8))
        eph.iodc = (iodc_msb << 8) | iodc_lsb
        eph.toc = _bits_to_uint(w(7, 9, 24)) * 2.0**4
        eph.af2 = _bits_to_int(w(8, 1, 8)) * 2.0**-55
        eph.af1 = _bits_to_int(w(8, 9, 24)) * 2.0**-43
        eph.af0 = _bits_to_int(w(9, 1, 22)) * 2.0**-31
        eph.has_sf1 = True
    elif sf_id == 2:
        eph.iode_sf2 = _bits_to_uint(w(2, 1, 8))
        eph.crs = _bits_to_int(w(2, 9, 24)) * 2.0**-5
        eph.delta_n = _bits_to_int(w(3, 1, 16)) * 2.0**-43 * PI_GPS
        m0 = (_bits_to_uint(w(3, 17, 24)) << 24) | _bits_to_uint(w(4, 1, 24))
        eph.m0 = _twos(m0, 32) * 2.0**-31 * PI_GPS
        eph.cuc = _bits_to_int(w(5, 1, 16)) * 2.0**-29
        ecc = (_bits_to_uint(w(5, 17, 24)) << 24) | _bits_to_uint(w(6, 1, 24))
        eph.ecc = ecc * 2.0**-33
        eph.cus = _bits_to_int(w(7, 1, 16)) * 2.0**-29
        sqa = (_bits_to_uint(w(7, 17, 24)) << 24) | _bits_to_uint(w(8, 1, 24))
        eph.sqrt_a = sqa * 2.0**-19
        eph.toe = _bits_to_uint(w(9, 1, 16)) * 2.0**4
        eph.fit_interval = int(words[9][16])
        eph.has_sf2 = True
    elif sf_id == 3:
        eph.cic = _bits_to_int(w(2, 1, 16)) * 2.0**-29
        om0 = (_bits_to_uint(w(2, 17, 24)) << 24) | _bits_to_uint(w(3, 1, 24))
        eph.omega0 = _twos(om0, 32) * 2.0**-31 * PI_GPS
        eph.cis = _bits_to_int(w(4, 1, 16)) * 2.0**-29
        i0 = (_bits_to_uint(w(4, 17, 24)) << 24) | _bits_to_uint(w(5, 1, 24))
        eph.i0 = _twos(i0, 32) * 2.0**-31 * PI_GPS
        eph.crc = _bits_to_int(w(6, 1, 16)) * 2.0**-5
        om = (_bits_to_uint(w(6, 17, 24)) << 24) | _bits_to_uint(w(7, 1, 24))
        eph.omega = _twos(om, 32) * 2.0**-31 * PI_GPS
        eph.omega_dot = _bits_to_int(w(8, 1, 24)) * 2.0**-43 * PI_GPS
        eph.iode_sf3 = _bits_to_uint(w(9, 1, 8))
        eph.idot = _bits_to_int(w(9, 9, 22)) * 2.0**-43 * PI_GPS
        eph.has_sf3 = True
    return sf_id, tow


def _twos(v: int, nbits: int) -> int:
    return v - (1 << nbits) if v & (1 << (nbits - 1)) else v


def parse_subframe45(
    data: np.ndarray,
    sf_id: int,
    iono_utc: GpsIonoUtc,
    almanacs: dict[int, GpsAlmanac],
    health: dict[int, int],
) -> int:
    """Parse a subframe 4/5 page's 240 source bits into the given stores
    (gps_navigation_message.cc:204-281 subframe 4/5 branches).
    Returns the page's SV ID."""
    words = data.reshape(10, 24)
    w = lambda i, a, b: words[i][a - 1 : b]
    sv_id = _bits_to_uint(w(2, 3, 8))

    if sf_id == 4 and sv_id == 56:          # page 18: iono + UTC
        iono_utc.alpha0 = _bits_to_int(w(2, 9, 16)) * 2.0**-30
        iono_utc.alpha1 = _bits_to_int(w(2, 17, 24)) * 2.0**-27
        iono_utc.alpha2 = _bits_to_int(w(3, 1, 8)) * 2.0**-24
        iono_utc.alpha3 = _bits_to_int(w(3, 9, 16)) * 2.0**-24
        iono_utc.beta0 = _bits_to_int(w(3, 17, 24)) * 2.0**11
        iono_utc.beta1 = _bits_to_int(w(4, 1, 8)) * 2.0**14
        iono_utc.beta2 = _bits_to_int(w(4, 9, 16)) * 2.0**16
        iono_utc.beta3 = _bits_to_int(w(4, 17, 24)) * 2.0**16
        iono_utc.a1 = _bits_to_int(w(5, 1, 24)) * 2.0**-50
        a0 = (_bits_to_uint(w(6, 1, 24)) << 8) | _bits_to_uint(w(7, 1, 8))
        iono_utc.a0 = _twos(a0, 32) * 2.0**-30
        iono_utc.tot = _bits_to_uint(w(7, 9, 16)) * 2.0**12
        iono_utc.wn_t = _bits_to_uint(w(7, 17, 24))
        iono_utc.delta_t_ls = _bits_to_int(w(8, 1, 8))
        iono_utc.wn_lsf = _bits_to_uint(w(8, 9, 16))
        iono_utc.dn = _bits_to_uint(w(8, 17, 24))
        iono_utc.delta_t_lsf = _bits_to_int(w(9, 1, 8))
        iono_utc.has_iono = True
        iono_utc.has_utc = True
    elif 1 <= sv_id <= 32:                  # almanac page
        alm = GpsAlmanac(prn=sv_id)
        alm.ecc = _bits_to_uint(w(2, 9, 24)) * 2.0**-21
        alm.toa = _bits_to_uint(w(3, 1, 8)) * 2.0**12
        alm.delta_i = _bits_to_int(w(3, 9, 24)) * 2.0**-19 * PI_GPS
        alm.omega_dot = _bits_to_int(w(4, 1, 16)) * 2.0**-38 * PI_GPS
        alm.sv_health = _bits_to_uint(w(4, 17, 24))
        alm.sqrt_a = _bits_to_uint(w(5, 1, 24)) * 2.0**-11
        alm.omega0 = _bits_to_int(w(6, 1, 24)) * 2.0**-23 * PI_GPS
        alm.omega = _bits_to_int(w(7, 1, 24)) * 2.0**-23 * PI_GPS
        alm.m0 = _bits_to_int(w(8, 1, 24)) * 2.0**-23 * PI_GPS
        af0 = (_bits_to_uint(w(9, 1, 8)) << 3) | _bits_to_uint(w(9, 20, 22))
        alm.af0 = _twos(af0, 11) * 2.0**-20
        alm.af1 = _bits_to_int(w(9, 9, 19)) * 2.0**-38
        almanacs[sv_id] = alm
        health[sv_id] = alm.sv_health
    elif sf_id == 5 and sv_id == 51:        # page 25: health SV 1-24 + WNa
        for k in range(24):                 # 6-bit fields, words 4-9
            wi = 2 + 1 + k // 4
            off = (k % 4) * 6
            health[k + 1] = _bits_to_uint(words[wi][off : off + 6])
    return sv_id


class LnavDecoder:
    """Streaming LNAV decoder for one channel.

    Feed ±1 bit decisions (one per 20 ms symbol) with their sample stamps;
    the decoder finds the preamble (either polarity), validates subframe
    parity, parses ephemeris, and reports TOW for the bit stream
    (gps_l1_ca_telemetry_decoder_gs.cc general_work :623 analog).
    """

    def __init__(self, prn: int) -> None:
        self.prn = prn
        self.eph = GpsEphemeris(prn=prn)
        self.iono_utc = GpsIonoUtc()
        self.almanacs: dict[int, GpsAlmanac] = {}
        self.health: dict[int, int] = {}
        self.bits: list[int] = []          # 0/1 history
        self.stamps: list[int] = []        # sample stamp per bit (end of bit)
        self.synced = False
        self.inverted = False
        self.frame_start: int | None = None   # index into self.bits
        self.tow_at_frame_start: float | None = None
        self.last_tow: float | None = None
        self.last_tow_stamp: int | None = None
        self.subframes_ok = 0
        self.parity_fail = 0

    def push_bits(self, signs: np.ndarray, stamps: np.ndarray) -> list[dict]:
        """Feed new bit decisions; returns list of decoded-subframe events."""
        events = []
        for s, st in zip(signs, stamps):
            # BPSK convention: +amplitude <-> bit 0 (matches lnav_encode
            # bits_at); either way _find_preamble resolves polarity
            self.bits.append(0 if s > 0 else 1)
            self.stamps.append(int(st))
        while True:
            ev = self._try_decode()
            if ev is None:
                break
            events.append(ev)
        # bound memory
        if len(self.bits) > 4 * BITS_PER_SUBFRAME and self.frame_start is None:
            drop = len(self.bits) - 2 * BITS_PER_SUBFRAME
            self.bits = self.bits[drop:]
            self.stamps = self.stamps[drop:]
        return events

    # ------------------------------------------------------------------ sync
    def _find_preamble(self) -> None:
        """Scan for a preamble with a parity-valid TLM+HOW behind it.

        Vectorized: one +-1 correlation against the 8-bit preamble flags
        the few candidate offsets (|corr| = 8, either polarity); only those
        pay the parity check (the reference's symbol-correlation frame sync,
        gps_l1_ca_telemetry_decoder_gs.cc)."""
        b = np.asarray(self.bits, dtype=np.int8)
        n = len(b)
        if n < 2 + 2 * BITS_PER_WORD:
            return
        x = 1.0 - 2.0 * b
        pre = (1.0 - 2.0 * PREAMBLE_BITS).astype(np.float64)
        corr = np.correlate(x, pre)            # [n-7]
        cand = np.flatnonzero(np.abs(corr) > 7.5)
        # need 2 bits of history for D29*/D30* and 60 bits of TLM+HOW
        for i in cand:
            if i < 2 or i > n - 2 * BITS_PER_WORD:
                continue
            inv = 1 if corr[i] < 0 else 0
            words = b[i - 2 : i + 2 * BITS_PER_WORD] ^ inv
            tlm = words[0:32]
            how = words[BITS_PER_WORD : BITS_PER_WORD + 32]
            if check_parity_word(tlm) and check_parity_word(how):
                self.synced = True
                self.inverted = bool(inv)
                self.frame_start = int(i)
                return

    def _try_decode(self) -> dict | None:
        if not self.synced:
            self._find_preamble()
            if not self.synced:
                return None
        i = self.frame_start
        if i is None or len(self.bits) < i + BITS_PER_SUBFRAME:
            return None
        b = np.asarray(
            self.bits[i - 2 : i + BITS_PER_SUBFRAME], dtype=np.int8
        ) ^ (1 if self.inverted else 0)

        data = np.empty(240, dtype=np.int8)
        ok = True
        for wi in range(WORDS_PER_SUBFRAME):
            word32 = b[wi * BITS_PER_WORD : wi * BITS_PER_WORD + 32]
            dec = decode_word(word32)
            if dec is None:
                ok = False
                break
            data[wi * 24 : (wi + 1) * 24] = dec
        if not ok:
            # lost sync; rescan from one bit past the failed preamble
            self.parity_fail += 1
            self.synced = False
            self.frame_start = None
            drop = i + 1
            self.bits = self.bits[drop:]
            self.stamps = self.stamps[drop:]
            return self._try_decode_nonrecursive_guard()

        sf_id, tow = parse_subframe(data, self.eph)
        if sf_id in (4, 5):
            parse_subframe45(data, sf_id, self.iono_utc, self.almanacs,
                             self.health)
        self.subframes_ok += 1
        # HOW TOW = start of NEXT subframe; the last bit of this subframe
        # ends exactly at that epoch
        end_stamp = self.stamps[i + BITS_PER_SUBFRAME - 1]
        self.last_tow = tow
        self.last_tow_stamp = end_stamp
        # advance to next subframe
        self.frame_start = i + BITS_PER_SUBFRAME
        # trim consumed history (keep 2 parity bits + preamble margin)
        keep_from = self.frame_start - 2
        self.bits = self.bits[keep_from:]
        self.stamps = self.stamps[keep_from:]
        self.frame_start = 2
        return {
            "prn": self.prn,
            "subframe": sf_id,
            "tow_s": tow,
            "sample_stamp": end_stamp,
            "ephemeris_complete": self.eph.complete,
        }

    def _try_decode_nonrecursive_guard(self) -> dict | None:
        # after a parity failure we only rescan (no infinite recursion risk:
        # _find_preamble either syncs on later data or returns None)
        self._find_preamble()
        return None

    def tow_at_stamp(self, sample_stamp: float, fs: float) -> float | None:
        """Transmit-time TOW of the signal at the given receiver sample."""
        if self.last_tow is None:
            return None
        return self.last_tow + (sample_stamp - self.last_tow_stamp) / fs

"""Multi-satellite baseband GNSS signal synthesis (host-side, NumPy f64).

Signal model, per satellite (complex baseband at sampling rate fs):

    s(t) = A * d(t) * c(t) * exp(j*(2*pi*(fd*t + 0.5*fd_rate*t^2) + phi0))

where c(t) is the PRN code sequence evaluated at the code phase

    phase_chips(t) = (t - tau(t)) * code_rate_eff,   tau(0) = delay_chips/code_rate

with code_rate_eff = code_rate * (1 + fd/f_carrier) (code Doppler coherent
with carrier Doppler, as for a real moving satellite), and d(t) the data bit
active during the code period (bit edges aligned to code-period boundaries,
CODES_PER_BIT periods per bit, as transmitted).

Amplitude from C/N0: with unit-variance complex AWGN (total variance
sigma^2 = 1 across I+Q), the noise density is N0 = 1/fs, so
A = sqrt(10^(cn0_dbhz/10) / fs).

Reference analog: signal_generator_c.cc generate_codes()/work().
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code
from gnss_sdr_tpu.constants import gps_l1_ca


@dataclass
class SatelliteSignalParams:
    """One simulated satellite signal component."""

    prn: int
    cn0_dbhz: float = 44.0
    doppler_hz: float = 0.0
    doppler_rate_hz_s: float = 0.0
    delay_chips: float = 0.0          # code delay at t=0, in chips
    carrier_phase_rad: float = 0.0
    system: str = "GPS"
    signal: str = "1C"
    # data bits (+1/-1), one per CODES_PER_BIT code periods; None -> all +1.
    nav_bits: np.ndarray | None = None
    # index of the bit active at transmit-time code period 0
    nav_bit_offset: int = 0

    def code(self) -> np.ndarray:
        if self.system == "GPS" and self.signal == "1C":
            return gps_l1_ca_code(self.prn).astype(np.float64)
        raise NotImplementedError(f"simulator: {self.system}/{self.signal}")

    def code_rate(self) -> float:
        return gps_l1_ca.CODE_RATE_CPS

    def carrier_freq(self) -> float:
        return gps_l1_ca.FREQ_HZ

    def codes_per_bit(self) -> int:
        return gps_l1_ca.CODES_PER_BIT


def generate_baseband(
    sats: list[SatelliteSignalParams],
    fs: float,
    num_samples: int,
    noise: bool = True,
    seed: int = 0,
    t0: float = 0.0,
    chunk: int = 1 << 20,
) -> np.ndarray:
    """Synthesize ``num_samples`` of complex64 baseband starting at time t0."""
    rng = np.random.default_rng(seed)
    out = np.empty(num_samples, dtype=np.complex64)
    for start in range(0, num_samples, chunk):
        n = min(chunk, num_samples - start)
        t = t0 + (start + np.arange(n, dtype=np.float64)) / fs
        acc = np.zeros(n, dtype=np.complex128)
        for sat in sats:
            acc += _sat_component(sat, t, fs)
        if noise:
            acc += rng.normal(scale=np.sqrt(0.5), size=n) + 1j * rng.normal(
                scale=np.sqrt(0.5), size=n
            )
        out[start : start + n] = acc.astype(np.complex64)
    return out


def _sat_component(sat: SatelliteSignalParams, t: np.ndarray, fs: float) -> np.ndarray:
    code = sat.code()
    code_len = code.shape[0]
    fc = sat.carrier_freq()
    code_rate_eff = sat.code_rate() * (1.0 + sat.doppler_hz / fc)

    phase_chips = t * code_rate_eff - sat.delay_chips
    chip_idx = np.floor(phase_chips).astype(np.int64)
    chips = code[chip_idx % code_len]

    if sat.nav_bits is not None:
        period_idx = np.floor_divide(chip_idx, code_len)
        bit_idx = (
            np.floor_divide(period_idx, sat.codes_per_bit()) + sat.nav_bit_offset
        ) % len(sat.nav_bits)
        chips = chips * sat.nav_bits[bit_idx]

    carrier_phase = (
        2.0 * np.pi * (sat.doppler_hz * t + 0.5 * sat.doppler_rate_hz_s * t * t)
        + sat.carrier_phase_rad
    )
    amp = np.sqrt(10.0 ** (sat.cn0_dbhz / 10.0) / fs)
    return amp * chips * np.exp(1j * carrier_phase)

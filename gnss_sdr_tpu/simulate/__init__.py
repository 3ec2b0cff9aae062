"""Synthetic GNSS signal generation for tests and benchmarks.

Covers two reference components:
- the SignalGenerator source block
  (src/algorithms/signal_generator/gnuradio_blocks/signal_generator_c.cc):
  multi-satellite baseband synthesis with configurable PRN/CN0/Doppler/delay;
- the external gnss-sim simulator used by the system tests (SURVEY.md §4):
  geometry-consistent signal + LNAV message from a simulated constellation.
"""

from gnss_sdr_tpu.simulate.generator import SatelliteSignalParams, generate_baseband

__all__ = ["SatelliteSignalParams", "generate_baseband"]

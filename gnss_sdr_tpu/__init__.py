"""gnss_sdr_tpu — a TPU-native GNSS software-defined receiver framework.

A from-scratch reimplementation of the capabilities of gnss-sdr/gnss-sdr
(reference: /root/reference) designed for TPU hardware with JAX/XLA/Pallas:

- the GNU Radio thread-per-block dataflow graph of the reference
  (``src/core/receiver/gnss_flowgraph.cc``) is replaced by a *batched,
  block-synchronous array program*: one jitted device step processes a fixed
  sample segment for all channels at once;
- per-satellite "channels" are a batch axis (vmap / shard_map), not threads;
- PCPS acquisition is one batched FFT circular correlation over
  (channel, doppler) axes rather than a serial per-bin loop
  (cf. ``pcps_acquisition.cc:522-560``);
- DLL/PLL tracking is a ``jax.lax.scan`` over PRN-period steps carrying a
  ``ChannelState`` pytree of shape ``[num_channels, ...]``
  (cf. ``dll_pll_veml_tracking.cc``);
- telemetry decoding, observables and PVT close the chain host-side (bit
  logic and f64 geodesy), mirroring the reference's decoupling of control
  and streaming planes.

Dtype policy: bulk per-sample arrays are float32/complex64 (TPU-native);
per-channel scalar state (carrier/code phase accumulators, time stamps) is
float64 (XLA emulates f64 on TPU; the per-channel scalar volume is tiny).
"""

import jax as _jax

# f64 is required for carrier/code phase accumulators and time bookkeeping
# (the reference keeps these in C++ double; see e.g. d_acc_carrier_phase_rad
# in dll_pll_veml_tracking.h). Bulk sample math remains explicitly f32/c64.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

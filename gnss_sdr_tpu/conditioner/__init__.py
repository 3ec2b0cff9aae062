"""Signal conditioner role: adapters, filters, resamplers (SURVEY.md §2.2)."""

from gnss_sdr_tpu.conditioner.adapters import ADAPTERS
from gnss_sdr_tpu.conditioner.conditioner import (
    ConditionerConfig,
    PassThrough,
    SignalConditioner,
)
from gnss_sdr_tpu.conditioner.filters import (
    design_fir,
    fir_apply,
    freq_xlating_fir_apply,
    notch_filter_block,
    pulse_blanking_block,
)
from gnss_sdr_tpu.conditioner.resampler import direct_resample, polyphase_resample
from gnss_sdr_tpu.conditioner.beamformer import (
    ArrayConditioner,
    Beamformer,
    steering_weights,
)

__all__ = [
    "ADAPTERS",
    "ArrayConditioner",
    "Beamformer",
    "steering_weights",
    "ConditionerConfig",
    "PassThrough",
    "SignalConditioner",
    "design_fir",
    "direct_resample",
    "fir_apply",
    "freq_xlating_fir_apply",
    "notch_filter_block",
    "polyphase_resample",
    "pulse_blanking_block",
]

"""Tracking engines (reference: src/algorithms/tracking/)."""

from gnss_sdr_tpu.tracking.conf import DllPllConf
from gnss_sdr_tpu.tracking.dll_pll import (
    StepOutputs,
    TrackingState,
    init_state,
    track_block,
)
from gnss_sdr_tpu.tracking.tracker import (
    BlockResult,
    ChannelPhase,
    Tracker,
)

__all__ = [
    "BlockResult",
    "ChannelPhase",
    "DllPllConf",
    "StepOutputs",
    "Tracker",
    "TrackingState",
    "init_state",
    "track_block",
]

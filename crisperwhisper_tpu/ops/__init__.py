from .alignment import (attention_to_jump_times, dtw_jump_times, dtw_trace,
                        median_filter, znorm_tokens)
from .int8_reference import dequant_reference
# NOTE: the fused_attention FUNCTION is deliberately not re-exported here —
# it would shadow the `ops.fused_attention` submodule on the package
# (import-as resolves attributes first); use
# `from crisperwhisper_tpu.ops.fused_attention import fused_attention`.
from .fused_attention import supports_pallas
from .pallas_dtw import pallas_dtw_jump_times

__all__ = ["attention_to_jump_times", "dtw_jump_times", "dtw_trace",
           "median_filter", "znorm_tokens", "dequant_reference",
           "supports_pallas",
           "pallas_dtw_jump_times"]

from .alignment import (attention_to_jump_times, dtw_jump_times, dtw_trace,
                        median_filter, znorm_tokens)
from .decode_attention import dequant_reference
from .decode_attention_v2 import cross_attention_int8_v2
from .fused_attention import fused_attention, supports_pallas
from .pallas_dtw import pallas_dtw_jump_times

__all__ = ["attention_to_jump_times", "dtw_jump_times", "dtw_trace",
           "median_filter", "znorm_tokens", "dequant_reference",
           "cross_attention_int8_v2", "fused_attention",
           "supports_pallas", "pallas_dtw_jump_times"]

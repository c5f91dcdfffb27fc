from .assisted import assisted_decode, assisted_decode_jit
from .beam import BeamResult, beam_decode, beam_decode_jit
from .fallback import compression_ratio, need_fallback
from .generate import ShortFormOutput, build_prompt, generate_short_form
from .longform import GenerateOutput, generate
from .segments import pad_segments_to_max_length, retrieve_segment
from .greedy import DecodeResult, greedy_decode, greedy_decode_jit
from .processors import (TimestampState, apply_begin_suppress,
                         apply_suppress, apply_timestamp_rules,
                         process_scores, suppress_tokens_mask)

__all__ = ["assisted_decode", "assisted_decode_jit", "BeamResult", "beam_decode", "beam_decode_jit",
           "ShortFormOutput", "build_prompt", "generate_short_form",
           "GenerateOutput", "generate", "compression_ratio",
           "need_fallback", "pad_segments_to_max_length",
           "retrieve_segment", "DecodeResult", "greedy_decode",
           "greedy_decode_jit", "TimestampState", "apply_begin_suppress",
           "apply_suppress", "apply_timestamp_rules", "process_scores",
           "suppress_tokens_mask"]

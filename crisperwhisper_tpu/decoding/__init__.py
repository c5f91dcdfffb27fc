from .generate import ShortFormOutput, build_prompt, generate_short_form
from .greedy import DecodeResult, greedy_decode, greedy_decode_jit
from .processors import (TimestampState, apply_begin_suppress,
                         apply_suppress, apply_timestamp_rules,
                         process_scores, suppress_tokens_mask)

__all__ = ["ShortFormOutput", "build_prompt", "generate_short_form",
           "DecodeResult", "greedy_decode", "greedy_decode_jit",
           "TimestampState", "apply_begin_suppress", "apply_suppress",
           "apply_timestamp_rules", "process_scores",
           "suppress_tokens_mask"]

from .alignment import (attention_to_jump_times, dtw_jump_times, dtw_trace,
                        median_filter, znorm_tokens)

__all__ = ["attention_to_jump_times", "dtw_jump_times", "dtw_trace",
           "median_filter", "znorm_tokens"]

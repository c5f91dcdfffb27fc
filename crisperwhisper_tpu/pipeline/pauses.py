"""Pause-aware word-boundary redistribution — bit-exact port.

The one algorithmic contribution hosted in the reference repo itself
(ref:utils.py:1-29 `adjust_pauses_for_hf_pipeline_output`): for each
adjacent word pair with a positive gap, extend the current word's end and
the next word's start toward each other by min(gap, split_threshold)/2,
converting pause time absorbed into (space) tokens into symmetric word
boundaries.
"""

from __future__ import annotations

from typing import Any


def adjust_pauses(pipeline_output: dict[str, Any],
                  split_threshold: float = 0.12) -> dict[str, Any]:
    """Mutates and returns pipeline_output, same contract as the reference."""
    adjusted_chunks = pipeline_output["chunks"].copy()

    for i in range(len(adjusted_chunks) - 1):
        current_chunk = adjusted_chunks[i]
        next_chunk = adjusted_chunks[i + 1]

        current_start, current_end = current_chunk["timestamp"]
        next_start, next_end = next_chunk["timestamp"]
        pause_duration = next_start - current_end

        if pause_duration > 0:
            if pause_duration > split_threshold:
                distribute = split_threshold / 2
            else:
                distribute = pause_duration / 2
            adjusted_chunks[i]["timestamp"] = (current_start,
                                               current_end + distribute)
            adjusted_chunks[i + 1]["timestamp"] = (next_start - distribute,
                                                   next_end)
    pipeline_output["chunks"] = adjusted_chunks
    return pipeline_output


# reference-compatible alias
adjust_pauses_for_hf_pipeline_output = adjust_pauses

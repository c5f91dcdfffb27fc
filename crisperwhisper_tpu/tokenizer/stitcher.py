"""Chunk stitching: the `_decode_asr` state machine and LCS overlap merge.

Behavioral ports of hf tokenization_whisper.py:
  * _decode_asr                  :913-1162 — classifies every token
    (language / special / timestamp / text), skips timestamps inside
    stride-overlap regions, splits chunks on end timestamps, merges
    overlapping token runs, emits {"text", "timestamp"} chunks (or
    per-word chunks in word mode).
  * _find_longest_common_sequence :1165-1282 — sliding-window best match
    with an epsilon bonus for long matches; conflicts resolved by
    splitting the overlap at its midpoint.

Corner cases preserved deliberately (SURVEY.md §7 hard parts (c)):
stride-timestamp skipping, duplicate-timestamp bug-workaround, and the
>30 s rollover bookkeeping.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from .languages import LANGUAGES
from .whisper_tokenizer import WhisperTokenizer
from .words import collate_word_timestamps


def find_longest_common_sequence(sequences: list[list[int]],
                                 token_timestamp_sequences: list | None = None
                                 ):
    left_sequence = list(sequences[0])
    left_length = len(left_sequence)
    total_sequence: list[int] = []

    use_ts = bool(token_timestamp_sequences)
    if use_ts:
        left_ts = list(token_timestamp_sequences[0])
        total_ts: list = []

    for seq_idx, right_sequence in enumerate(sequences[1:]):
        right_sequence = list(right_sequence)
        max_ = 0.0
        max_indices = (left_length, left_length, 0, 0)
        right_length = len(right_sequence)
        for i in range(1, left_length + right_length):
            eps = i / 10000.0
            left_start = max(0, left_length - i)
            left_stop = min(left_length, left_length + right_length - i)
            left = np.array(left_sequence[left_start:left_stop])
            right_start = max(0, i - left_length)
            right_stop = min(right_length, i)
            right = np.array(right_sequence[right_start:right_stop])
            if len(left) != len(right):
                raise RuntimeError("stitcher: window mismatch — bug")
            if use_ts:
                matches = sum(
                    1 for idx, elem in enumerate(left)
                    if (elem == right[idx]
                        and left_ts[left_start + idx]
                        <= token_timestamp_sequences[seq_idx + 1][
                            right_start + idx]))
            else:
                matches = int(np.sum(left == right))
            matching = matches / i + eps
            if matches > 1 and matching > max_:
                max_ = matching
                max_indices = (left_start, left_stop, right_start,
                               right_stop)
        left_start, left_stop, right_start, right_stop = max_indices
        left_mid = (left_stop + left_start) // 2
        right_mid = (right_stop + right_start) // 2
        total_sequence.extend(left_sequence[:left_mid])
        left_sequence = right_sequence[right_mid:]
        left_length = len(left_sequence)
        if use_ts:
            total_ts.extend(left_ts[:left_mid])
            left_ts = list(token_timestamp_sequences[seq_idx + 1][right_mid:])

    total_sequence.extend(left_sequence)
    if token_timestamp_sequences is None:
        return total_sequence
    if use_ts:
        total_ts.extend(left_ts)
        return total_sequence, total_ts
    return total_sequence, []


def decode_asr(tok: WhisperTokenizer, model_outputs: list[dict[str, Any]],
               *, return_timestamps, return_language,
               time_precision: float, segment_size: int = 1500):
    """Stitch per-chunk model outputs into (full_text, {"chunks": ...}).

    model_outputs: list of dicts with keys "tokens" ([1, T] array),
    optionally "token_timestamps" ([1, T] seconds) and
    "stride" ((chunk_len_s, left_s, right_s)).
    """
    last_language = None

    def new_chunk():
        return {"language": last_language, "timestamp": [None, None],
                "text": ""}

    chunks: list[dict] = []
    chunk = new_chunk()
    time_offset = 0.0
    timestamp_begin = tok.timestamp_begin
    previous_tokens: list[list[int]] = []
    previous_token_timestamps: list[list] = []
    skip = False
    right_stride_start = None
    all_special_ids = set(tok.all_special_ids)

    for output in model_outputs:
        token_ids = [int(t) for t in np.asarray(output["tokens"][0])]
        token_ids = tok.strip_prompt(token_ids)
        if return_timestamps == "word":
            token_timestamps = [float(t) for t in
                                np.asarray(output["token_timestamps"][0])]

        last_timestamp = None
        first_timestamp = timestamp_begin
        cur_max_timestamp = 0.0
        prev_segments_len = 0.0
        penultimate_timestamp = 0.0

        if "stride" in output:
            chunk_len, stride_left, stride_right = output["stride"]
            time_offset -= stride_left
            right_stride_start = chunk_len - stride_right
            if stride_left:
                first_timestamp = stride_left / time_precision \
                    + timestamp_begin
            if stride_right:
                for token in reversed(token_ids):
                    if token >= timestamp_begin:
                        if (last_timestamp is not None
                                and (token - timestamp_begin)
                                * time_precision < right_stride_start):
                            break
                        last_timestamp = token

        current_tokens: list[int] = []
        current_token_timestamps: list = []

        for i, token in enumerate(token_ids):
            if token in all_special_ids:
                text = tok.decode([token])
                text = text[2:-2]
                language = LANGUAGES.get(text)
                if language is not None:
                    if (last_language and language != last_language
                            and not return_timestamps):
                        previous_tokens.append(current_tokens)
                        resolved_tokens = find_longest_common_sequence(
                            previous_tokens)
                        chunk["text"] = tok.decode(resolved_tokens)
                        chunks.append(chunk)
                        previous_tokens = []
                        current_tokens = []
                        chunk = new_chunk()
                    chunk["language"] = language
                    last_language = language
                # other specials ignored
            elif token >= timestamp_begin:
                timestamp = float((token - timestamp_begin) * time_precision)
                if timestamp < cur_max_timestamp:
                    last_was_single_ending = i >= 2 and not (
                        token_ids[i - 1] >= timestamp_begin
                        and token_ids[i - 2] >= timestamp_begin)
                    if last_was_single_ending:
                        prev_segments_len += time_precision * segment_size
                    else:
                        cur_max_timestamp = penultimate_timestamp
                        prev_segments_len += penultimate_timestamp
                penultimate_timestamp = cur_max_timestamp
                cur_max_timestamp = timestamp
                time = (token - timestamp_begin) * time_precision \
                    + time_offset + prev_segments_len
                time = round(time, 2)
                if last_timestamp and token >= last_timestamp:
                    skip = True
                elif skip or (previous_tokens and token < first_timestamp):
                    skip = False
                elif chunk["timestamp"][0] is None:
                    chunk["timestamp"][0] = time
                else:
                    if time == chunk["timestamp"][0]:
                        # duplicate-timestamp bug workaround: treat as start
                        pass
                    else:
                        chunk["timestamp"][1] = time
                        previous_tokens.append(current_tokens)
                        if return_timestamps == "word":
                            previous_token_timestamps.append(
                                current_token_timestamps)
                        resolved_tokens, resolved_ts = \
                            find_longest_common_sequence(
                                previous_tokens, previous_token_timestamps)
                        chunk["text"] = tok.decode(resolved_tokens)
                        if return_timestamps == "word":
                            chunk["words"] = collate_word_timestamps(
                                tok, resolved_tokens, resolved_ts,
                                last_language, return_language)
                        chunks.append(chunk)
                        previous_tokens = []
                        current_tokens = []
                        previous_token_timestamps = []
                        current_token_timestamps = []
                        chunk = new_chunk()
            else:
                current_tokens.append(token)
                if return_timestamps == "word":
                    if i == 0:
                        start_time = round(0.0 + time_offset, 2)
                    else:
                        start_time = round(token_timestamps[i - 1]
                                           + time_offset, 2)
                    end_time = round(token_timestamps[i] + time_offset, 2)
                    current_token_timestamps.append((start_time, end_time))

        if "stride" in output:
            time_offset += chunk_len - stride_right

        if current_tokens:
            previous_tokens.append(current_tokens)
            if return_timestamps == "word":
                previous_token_timestamps.append(current_token_timestamps)
        elif not any(p for p in previous_tokens):
            chunk = new_chunk()
            previous_tokens = []
            current_tokens = []
            previous_token_timestamps = []
            current_token_timestamps = []

    if previous_tokens:
        resolved_tokens, resolved_ts = find_longest_common_sequence(
            previous_tokens, previous_token_timestamps)
        chunk["text"] = tok.decode(resolved_tokens)
        if return_timestamps == "word":
            chunk["words"] = collate_word_timestamps(
                tok, resolved_tokens, resolved_ts, last_language,
                return_language)
        chunks.append(chunk)

    full_text = "".join(c["text"] for c in chunks)
    if return_timestamps or return_language:
        for c in chunks:
            if not return_timestamps:
                c.pop("timestamp")
            else:
                c["timestamp"] = tuple(c["timestamp"])
            if not return_language:
                c.pop("language")
        if return_timestamps == "word":
            new_chunks = []
            for c in chunks:
                new_chunks.extend(c["words"])
            optional = {"chunks": new_chunks}
        else:
            optional = {"chunks": chunks}
    else:
        optional = {}
    return full_text, optional

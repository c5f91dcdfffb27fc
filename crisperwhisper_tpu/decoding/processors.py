"""Logits processors as pure, batch-vectorized functions.

Reimplements the reference's Whisper processor stack
(hf generation/logits_process.py, applied in the order built by
generation_whisper.py:1797-1836: no-speech capture on raw scores ->
begin-suppress -> suppress -> timestamp grammar) with masks instead of the
reference's per-row Python loops (logits_process.py:2013-2058), so the
whole stack jits into the decode step.

State is explicit and static-shape: instead of re-scanning `input_ids`
every step like the reference, the decode loop carries per-row scalars
(last/penultimate-was-timestamp flags, the last timestamp token id).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GenerationOptions, SpecialTokens

NEG_INF = jnp.float32(-jnp.inf)


class TimestampState(NamedTuple):
    """Per-row grammar state (all [B])."""
    last_was_ts: jax.Array       # bool: seq[-1] is a timestamp token
    penult_was_ts: jax.Array     # bool: len(seq)<2 or seq[-2] is timestamp
    last_ts: jax.Array           # int32: most recent timestamp token id (or -1)
    num_generated: jax.Array     # int32: tokens generated past begin_index

    @classmethod
    def init(cls, batch: int) -> "TimestampState":
        return cls(last_was_ts=jnp.zeros((batch,), bool),
                   penult_was_ts=jnp.ones((batch,), bool),
                   last_ts=jnp.full((batch,), -1, jnp.int32),
                   num_generated=jnp.zeros((batch,), jnp.int32))

    def update(self, token: jax.Array, ts_begin: int) -> "TimestampState":
        is_ts = token >= ts_begin
        # reference: penultimate_was_timestamp = len(seq) < 2 or seq[-2] >= ts
        # (logits_process.py:2029); after this update len(seq) =
        # num_generated+1, so "len < 2" means num_generated == 0 here.
        return TimestampState(
            last_was_ts=is_ts,
            penult_was_ts=(self.num_generated < 1) | self.last_was_ts,
            last_ts=jnp.where(is_ts, token.astype(jnp.int32), self.last_ts),
            num_generated=self.num_generated + 1)


def suppress_tokens_mask(vocab_size: int, tokens: tuple[int, ...]
                         ) -> np.ndarray:
    mask = np.zeros((vocab_size,), bool)
    for t in tokens:
        mask[t] = True
    return mask


def apply_suppress(scores: jax.Array, mask: jax.Array) -> jax.Array:
    """SuppressTokensLogitsProcessor (logits_process.py:1883-1920)."""
    return jnp.where(mask[None, :], NEG_INF, scores)


def apply_begin_suppress(scores: jax.Array, mask: jax.Array,
                         is_begin: jax.Array) -> jax.Array:
    """SuppressTokensAtBeginLogitsProcessor (:1830-1880); is_begin is a
    scalar or [B] bool for 'we are at begin_index'."""
    is_begin = jnp.broadcast_to(is_begin, scores.shape[:1])
    return jnp.where(is_begin[:, None] & mask[None, :], NEG_INF, scores)


def apply_timestamp_rules(scores: jax.Array, state: TimestampState,
                          specials: SpecialTokens,
                          max_initial_timestamp_index: int | None,
                          detect_from_logprob: bool = True) -> jax.Array:
    """WhisperTimeStampLogitsProcessor (logits_process.py:2013-2058),
    vectorized. `scores` [B, V] f32; returns processed scores."""
    b, v = scores.shape
    vocab = jnp.arange(v)
    ts_begin = specials.timestamp_begin
    eos = specials.eot

    # 1. always suppress <|notimestamps|>
    scores = jnp.where(vocab[None, :] == specials.no_timestamps, NEG_INF,
                       scores)

    has_generated = state.num_generated >= 1
    # 2. pairing rules
    last, penult = state.last_was_ts, state.penult_was_ts
    # last ts & penult ts -> next must be non-timestamp
    force_text = has_generated & last & penult
    scores = jnp.where(force_text[:, None] & (vocab[None, :] >= ts_begin),
                       NEG_INF, scores)
    # last ts & penult not ts -> only eos or timestamps (suppress < eos)
    force_close = has_generated & last & ~penult
    scores = jnp.where(force_close[:, None] & (vocab[None, :] < eos),
                       NEG_INF, scores)

    # 3. monotonic timestamps: suppress [ts_begin, ts_last) where ts_last is
    # the last emitted timestamp (exclusive) if we're inside an open pair,
    # else last+1 (avoid re-emitting it).
    has_ts = state.last_ts >= 0
    inside_pair = last & ~penult
    ts_last = jnp.where(inside_pair, state.last_ts, state.last_ts + 1)
    mono = (has_ts[:, None] & (vocab[None, :] >= ts_begin)
            & (vocab[None, :] < ts_last[:, None]))
    scores = jnp.where(mono, NEG_INF, scores)

    # 4. first generated token: force a timestamp, bounded by
    # max_initial_timestamp_index
    is_begin = state.num_generated == 0
    scores = jnp.where(is_begin[:, None] & (vocab[None, :] < ts_begin),
                       NEG_INF, scores)
    if max_initial_timestamp_index is not None:
        last_allowed = ts_begin + max_initial_timestamp_index
        scores = jnp.where(is_begin[:, None] & (vocab[None, :] > last_allowed),
                           NEG_INF, scores)

    # 5. if P(any timestamp) > max P(text token): force timestamp
    if detect_from_logprob:
        logprobs = jax.nn.log_softmax(scores, axis=-1)
        ts_lp = jax.nn.logsumexp(
            jnp.where(vocab[None, :] >= ts_begin, logprobs, NEG_INF), axis=-1)
        max_text_lp = jnp.max(
            jnp.where(vocab[None, :] < ts_begin, logprobs, NEG_INF), axis=-1)
        force_ts = ts_lp > max_text_lp
        scores = jnp.where(force_ts[:, None] & (vocab[None, :] < ts_begin),
                           NEG_INF, scores)
    return scores


def process_scores(raw_scores: jax.Array, state: TimestampState,
                   specials: SpecialTokens, opts: GenerationOptions,
                   suppress: jax.Array | None,
                   begin_suppress: jax.Array | None,
                   return_timestamps: bool = True) -> jax.Array:
    """Apply the full processor stack in the reference's order."""
    scores = raw_scores
    is_begin = state.num_generated == 0
    if begin_suppress is not None:
        scores = apply_begin_suppress(scores, begin_suppress, is_begin)
    if suppress is not None:
        scores = apply_suppress(scores, suppress)
    if return_timestamps:
        scores = apply_timestamp_rules(
            scores, state, specials, opts.max_initial_timestamp_index)
    return scores

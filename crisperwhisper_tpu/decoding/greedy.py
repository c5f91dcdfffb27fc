"""Single-program autoregressive decode loop.

The reference decodes with a Python per-token loop over `model.forward`
(hf generation/utils.py:2688 `_sample`), stashing per-step attention
tensors on the host. Here the whole decode — prompt feed, logits
processing, sampling, grammar state, alignment capture, EOS bookkeeping —
is ONE `lax.while_loop` inside ONE jitted program; nothing leaves the
device until the loop exits (SURVEY.md §7 design rules).

Prompt tokens are streamed through the same single-token step as generated
tokens (cache prefill), so shapes stay static for any prompt content.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import GenerationOptions, SpecialTokens, WhisperArch
from ..models.whisper import (DecoderCache, decode_step, decode_step_multi,
                              init_cache)
from .processors import TimestampState, process_scores


class DecodeResult(NamedTuple):
    """All [B]-leading outputs of one decode call.

    sequences: [B, P + max_new] int32 — prompt + generated, eot-padded.
    num_generated: [B] int32 — generated tokens incl. the final eot.
    sum_logprobs: [B] f32 — sum of chosen-token logprobs (processed scores),
      matching the accumulation consumed by _retrieve_avg_logprobs.
    no_speech_probs: [B] f32 — P(<|nospeech|>) from the raw logits of the
      first generated position (logits_process.py:2063-2121 semantics).
    align_probs: [B, A, max_new, K] — alignment-head cross-attention rows
      for query tokens g_1..g_{G-1} (the rows the reference keeps after
      dropping decoder_input_ids at generation_whisper.py:336-337).
    """
    sequences: jax.Array
    num_generated: jax.Array
    sum_logprobs: jax.Array
    no_speech_probs: jax.Array
    align_probs: jax.Array


class _Carry(NamedTuple):
    t: jax.Array                      # scalar int32 current feed position
    tokens: jax.Array                 # [B, T_total]
    self_k: jax.Array                 # mutable cache halves only — the
    self_v: jax.Array                 # loop-invariant cross K/V stays a
    self_ks: jax.Array | None         # closure constant (no carry copies);
    self_vs: jax.Array | None         # _ks/_vs ride along iff self ring
    state: TimestampState             # is quantized (else None)
    finished: jax.Array               # [B] bool
    sum_logprobs: jax.Array           # [B] f32
    no_speech: jax.Array              # [B] f32
    align_buf: jax.Array              # [B, A, max_new, K]
    key: jax.Array


def greedy_decode(params: Any, arch: WhisperArch, specials: SpecialTokens,
                  opts: GenerationOptions, encoder_out: jax.Array,
                  prompt: jax.Array, *,
                  max_new_tokens: int,
                  suppress_mask: jax.Array | None = None,
                  begin_suppress_mask: jax.Array | None = None,
                  align_sel: jax.Array | None = None,
                  return_timestamps: bool = True,
                  temperature: jax.Array | float = 0.0,
                  rng: jax.Array | None = None,
                  align_dtype: jnp.dtype = jnp.float32,
                  cross_cache_dtype: jnp.dtype | None = None,
                  self_cache_dtype: jnp.dtype | None = None,
                  prompt_mask: jax.Array | None = None,
                  sot_position: int = 0,
                  pos_offset: jax.Array | None = None) -> DecodeResult:
    """Decode a batch against precomputed encoder states.

    prompt: [B, P] int32 forced prefix (e.g. [sot, lang, task]); same
      static length per batch (the reference's per-batch init tokens,
      generation_whisper.py:1467-1620). For condition-on-prev prompts,
      left-pad to the static P and pass `prompt_mask` (False on pads —
      the decoder_attention_mask analog).
    temperature: 0 => greedy argmax; > 0 => categorical sampling (the
      fallback ladder re-invokes this with higher temperatures).
    pos_offset: optional int32 [B] — per-row left-pad count of the
      conditioned prompt; subtracted from the ring slot for the learned
      positional-embedding lookup only. This is the dynamic
      condition-on-prev mode (HF padding='longest' + mask-aware
      decoder_position_ids, hf generation/utils.py
      prepare_inputs_for_generation): real tokens take positions
      0..len-1 regardless of padding. None = static 'max_length'
      semantics (pads consume positions), identical programs to before.
    """
    b, p = prompt.shape
    k_frames = encoder_out.shape[1]
    t_total = p + max_new_tokens
    if t_total > arch.max_target_positions:
        raise ValueError(f"prompt {p} + max_new {max_new_tokens} exceeds "
                         f"max_target_positions {arch.max_target_positions}")
    n_align = align_sel.shape[-1] if align_sel is not None else 1
    eot = specials.eot

    cache = init_cache(params, arch, encoder_out,
                       cross_dtype=cross_cache_dtype, cache_len=t_total,
                       self_dtype=self_cache_dtype)
    key_mask = None
    if prompt_mask is not None:
        key_mask = jnp.concatenate(
            [jnp.asarray(prompt_mask, bool),
             jnp.ones((b, max_new_tokens), bool)], axis=1)
    tokens0 = jnp.concatenate(
        [prompt.astype(jnp.int32),
         jnp.full((b, max_new_tokens), eot, jnp.int32)], axis=1)

    # block prefill: feed prompt[:, :P-1] through ONE multi-token step
    # instead of P-1 serial single-token steps (a conditioned prompt is up
    # to 224 tokens, hf generation_whisper.py:1895). The no-speech capture
    # happens here when the SOT position falls inside the prefill block.
    no_speech0 = jnp.zeros((b,), jnp.float32)
    t_start = 0
    if p > 1:
        prefill_logits, cache, _ = decode_step_multi(
            params, arch, prompt.astype(jnp.int32)[:, :p - 1], jnp.int32(0),
            cache, key_mask=key_mask, align_dtype=align_dtype,
            pos_offset=pos_offset)
        # sot_position may be traced (conditioned prompts pass it per
        # call): gather its row dynamically and keep zero when the SOT
        # step falls outside the prefill block (then the loop captures it)
        sp_idx = jnp.clip(jnp.asarray(sot_position, jnp.int32), 0, p - 2)
        lg = jax.lax.dynamic_index_in_dim(prefill_logits, sp_idx, 1,
                                          keepdims=False)
        in_prefill = jnp.asarray(sot_position) <= p - 2
        no_speech0 = jnp.where(
            in_prefill,
            jnp.exp(lg[:, specials.no_speech]
                    - jax.nn.logsumexp(lg, axis=-1)),
            0.0)
        t_start = p - 1

    carry = _Carry(
        t=jnp.int32(t_start),
        tokens=tokens0,
        self_k=cache.self_k,
        self_v=cache.self_v,
        self_ks=cache.self_k_scale,
        self_vs=cache.self_v_scale,
        state=TimestampState.init(b),
        finished=jnp.zeros((b,), bool),
        sum_logprobs=jnp.zeros((b,), jnp.float32),
        no_speech=no_speech0,
        align_buf=jnp.zeros((b, n_align, max_new_tokens, k_frames),
                            align_dtype),
        key=rng if rng is not None else jax.random.PRNGKey(0),
    )
    temperature = jnp.asarray(temperature, jnp.float32)

    # batch-1 whole-step Pallas kernel (ops/pallas_decode_b1): decided at
    # trace time — the single-stream step is weight-bandwidth-bound and
    # the fused kernel removes the per-op scheduling bubbles of the
    # scanned XLA step (measured ~2.4 ms -> see scripts/b1_kernel_bench)
    from ..ops import pallas_decode_b1 as _b1k
    use_b1_kernel = (getattr(opts, "b1_decode_kernel", False) and b == 1
                     and key_mask is None and pos_offset is None
                     and _b1k.supported(params, arch, cache, key_mask, 1,
                                        jnp.int32(0), prompt[:, 0]))
    # small-batch (2..8 rows) multi-stream variant: per-row cross caches
    # via the R-phase cross schedule; covers the compacted seek-loop
    # tails and short interactive files under the same numerics gate
    use_rows_kernel = (getattr(opts, "b1_decode_kernel", False)
                       and not use_b1_kernel
                       and key_mask is None and pos_offset is None
                       and _b1k.supported_rows(params, arch, cache,
                                               key_mask, jnp.int32(0),
                                               prompt[:, 0]))

    def cond(c: _Carry):
        return (c.t < t_total - 1) & ~jnp.all(c.finished)

    def body(c: _Carry) -> _Carry:
        feed = c.tokens[:, c.t]
        step_cache = cache._replace(self_k=c.self_k, self_v=c.self_v,
                                    self_k_scale=c.self_ks,
                                    self_v_scale=c.self_vs)
        if use_b1_kernel:
            logits, new_cache, align = _b1k.decode_step_b1(
                params, arch, feed, c.t, step_cache, align_sel=align_sel,
                align_dtype=align_dtype)
        elif use_rows_kernel:
            logits, new_cache, align = _b1k.decode_step_rows(
                params, arch, feed, c.t, step_cache, align_sel=align_sel,
                align_dtype=align_dtype)
        else:
            logits, new_cache, align = decode_step(params, arch, feed, c.t,
                                                   step_cache,
                                                   align_sel=align_sel,
                                                   key_mask=key_mask,
                                                   align_dtype=align_dtype,
                                                   pos_offset=pos_offset)
        # record alignment rows for generated-query steps (t >= P)
        slot = jnp.maximum(c.t - p, 0)
        record = (c.t >= p) & ~c.finished
        align_buf = jax.lax.dynamic_update_slice(
            c.align_buf,
            jnp.where(record[:, None, None, None],
                      align[:, :, None, :],
                      jax.lax.dynamic_slice(
                          c.align_buf, (0, 0, slot, 0),
                          (b, n_align, 1, k_frames))).astype(c.align_buf.dtype),
            (0, 0, slot, 0))

        is_sampling_step = c.t >= p - 1
        # no-speech prob from RAW logits AT THE SOT POSITION — the
        # reference reads logits[:, begin_index - start_of_trans_offset],
        # i.e. the step whose input token is <|startoftranscript|>
        # (logits_process.py:2099-2105) — not the last prompt position.
        # lax.cond + single-column softmax (exp(x_ns - logsumexp)) so the
        # [B, V] softmax is never materialized and runs on ONE step only.
        no_speech = jax.lax.cond(
            c.t == sot_position,
            lambda lg: jnp.exp(lg[:, specials.no_speech]
                               - jax.nn.logsumexp(lg, axis=-1)),
            lambda lg: c.no_speech,
            logits)

        scores = process_scores(logits, c.state, specials, opts,
                                suppress_mask, begin_suppress_mask,
                                return_timestamps)
        key, subkey = jax.random.split(c.key)
        # lax.cond keeps the categorical's per-step [B, V] gumbel draw
        # (millions of threefry blocks) out of greedy decodes entirely
        next_tok = jax.lax.cond(
            temperature > 0,
            lambda s: jax.random.categorical(
                subkey, s / jnp.maximum(temperature, 1e-6), axis=-1
            ).astype(jnp.int32),
            lambda s: jnp.argmax(s, axis=-1).astype(jnp.int32),
            scores)
        # forced prompt feed for t < P-1; frozen eot after finish
        next_tok = jnp.where(is_sampling_step, next_tok,
                             c.tokens[:, jnp.minimum(c.t + 1, t_total - 1)])
        next_tok = jnp.where(c.finished, eot, next_tok)

        # log_softmax gather == gather - logsumexp; avoids writing the
        # full [B, V] logprob tensor every step
        chosen_lp = (jnp.take_along_axis(scores, next_tok[:, None],
                                         axis=-1)[:, 0]
                     - jax.nn.logsumexp(scores, axis=-1))
        active = is_sampling_step & ~c.finished
        sum_logprobs = c.sum_logprobs + jnp.where(active, chosen_lp, 0.0)

        new_state = c.state.update(next_tok, specials.timestamp_begin)
        state = jax.tree.map(
            lambda new, old: jnp.where(active, new, old), new_state, c.state)

        finished = c.finished | (active & (next_tok == eot))
        tokens = jax.lax.dynamic_update_slice(
            c.tokens, next_tok[:, None], (0, c.t + 1))

        return _Carry(t=c.t + 1, tokens=tokens,
                      self_k=new_cache.self_k, self_v=new_cache.self_v,
                      self_ks=new_cache.self_k_scale,
                      self_vs=new_cache.self_v_scale,
                      state=state, finished=finished,
                      sum_logprobs=sum_logprobs,
                      no_speech=no_speech, align_buf=align_buf, key=key)

    # ---- staged ring growth (opts.staged_ring_quantum > 0) ----
    # The self-attention read costs the ALLOCATED ring width every step,
    # but only slots <= t are live. Run the SAME body over progressively
    # wider ring views (multiples of the quantum), zero-padding the rings
    # between stages: each stage is its own while_loop trace, so the
    # early steps read a fraction of the ring. Padded slots contribute
    # exact zeros to the reductions (scores masked to -1e9 -> exp == 0.0,
    # zero-block subtree sums), so outputs are bit-identical to the
    # single full-width loop (tests/test_staged_ring.py). Gated off
    # under key_mask (its width is the full ring) and the fused kernels
    # (they take the whole ring).
    quantum = getattr(opts, "staged_ring_quantum", 0)
    ring_len = cache.self_k.shape[-1]
    use_staged = (quantum > 0 and key_mask is None
                  and not use_b1_kernel and not use_rows_kernel
                  and ring_len > quantum)
    if not use_staged:
        final = jax.lax.while_loop(cond, body, carry)
    else:
        # first stage must hold every prefill column (slots < p) and the
        # initial write at t_start
        widths = [w for w in range(quantum, ring_len, quantum)
                  if w > t_start] + [ring_len]

        def ring_view(x, w):
            return None if x is None else x[..., :w]

        def ring_pad(x, w_to):
            if x is None:
                return None
            pad = [(0, 0)] * (x.ndim - 1) + [(0, w_to - x.shape[-1])]
            return jnp.pad(x, pad)

        final = carry._replace(
            self_k=ring_view(carry.self_k, widths[0]),
            self_v=ring_view(carry.self_v, widths[0]),
            self_ks=ring_view(carry.self_ks, widths[0]),
            self_vs=ring_view(carry.self_vs, widths[0]))
        for i, w in enumerate(widths):
            if i > 0:
                final = final._replace(
                    self_k=ring_pad(final.self_k, w),
                    self_v=ring_pad(final.self_v, w),
                    self_ks=ring_pad(final.self_ks, w),
                    self_vs=ring_pad(final.self_vs, w))
            stage_cond = (lambda c, _w=w:
                          (c.t < min(_w, t_total - 1)) & cond(c))
            final = jax.lax.while_loop(stage_cond, body, final)

    return DecodeResult(
        sequences=final.tokens,
        num_generated=final.state.num_generated,
        sum_logprobs=final.sum_logprobs,
        no_speech_probs=final.no_speech,
        align_probs=final.align_buf,
    )


_GREEDY_STATIC = ("arch", "specials", "opts", "max_new_tokens",
                  "return_timestamps", "align_dtype",
                  "cross_cache_dtype", "self_cache_dtype")


def _greedy_decode_entry(params, arch: WhisperArch, specials: SpecialTokens,
                         opts: GenerationOptions, encoder_out, prompt,
                         max_new_tokens: int, suppress_mask=None,
                         begin_suppress_mask=None, align_sel=None,
                         return_timestamps: bool = True,
                         temperature=0.0, rng=None,
                         align_dtype: jnp.dtype = jnp.float32,
                         cross_cache_dtype: jnp.dtype | None = None,
                         self_cache_dtype: jnp.dtype | None = None,
                         prompt_mask=None, sot_position: int = 0,
                         pos_offset=None) -> DecodeResult:
    return greedy_decode(params, arch, specials, opts, encoder_out, prompt,
                         max_new_tokens=max_new_tokens,
                         suppress_mask=suppress_mask,
                         begin_suppress_mask=begin_suppress_mask,
                         align_sel=align_sel,
                         return_timestamps=return_timestamps,
                         temperature=temperature, rng=rng,
                         align_dtype=align_dtype,
                         cross_cache_dtype=cross_cache_dtype,
                         self_cache_dtype=self_cache_dtype,
                         prompt_mask=prompt_mask,
                         sot_position=sot_position, pos_offset=pos_offset)


greedy_decode_jit = functools.partial(
    jax.jit, static_argnames=_GREEDY_STATIC)(_greedy_decode_entry)

# NOTE (round-5 measured refutation): donating encoder_out here does NOT
# free its HBM. TPU/XLA buffer donation is input->output ALIASING only —
# with no same-shaped output the donation is ignored ("Some donated
# buffers were not usable: bfloat16[B,1500,1280]"), B=128 still OOMs,
# and the donated-variant program measured 16% SLOWER at the headline
# shape (348.7 vs 416.7 device RTFx) besides one compiler subprocess
# crash on the longform program. Do not re-add donate_argnames without
# re-measuring. (NOTES_ROUND5.md)

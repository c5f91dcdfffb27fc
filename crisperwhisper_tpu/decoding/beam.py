"""Beam-search decode loop (num_beams > 1, deterministic).

Semantics mirror the reference stack: hf generation/utils.py `_beam_search`
(:3113) with `BeamSearchScorer`-style bookkeeping — 2*NB candidates per
step, EOS candidates only accepted from the top-NB ranks, finished-beam
pool with worst-eviction, `early_stopping=False` attainability stopping,
`length_penalty` applied as score/len**penalty — restructured as a single
`lax.while_loop` with static shapes (no Python per-batch loops).

Alignment-head capture under beam search: the reference stores every
step's cross-attentions for all beams and gathers them by `beam_indices`
on the host afterwards (generation_whisper.py:268-304). Here the running
buffers (tokens, grammar state, alignment rows) are gathered along the
beam axis at each reorder step, so the returned top beam's rows are
already correctly ordered.

Whisper specifics: the timestamp grammar is applied per-beam before
scoring (same processor stack as greedy), and the per-step logprobs used
for beam scores are the processed ones, matching the reference order of
operations.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import GenerationOptions, SpecialTokens, WhisperArch
from ..models.whisper import decode_step, decode_step_multi, init_cache
from .processors import TimestampState, process_scores

NEG_INF = jnp.float32(-1e9)


class BeamResult(NamedTuple):
    sequences: jax.Array          # [B, P+max_new] int32 — top beam, eot-pad
    num_generated: jax.Array      # [B] incl. final eot
    sequences_scores: jax.Array   # [B] score/len**penalty of top beam
    no_speech_probs: jax.Array    # [B]
    align_probs: jax.Array        # [B, A, max_new, K] top beam's rows


class _Carry(NamedTuple):
    t: jax.Array
    tokens: jax.Array             # [B, NB, T_total]
    self_k: jax.Array             # mutable cache halves only (cross K/V is
    self_v: jax.Array             # a loop-invariant closure constant)
    self_ks: Any                  # per-position ring scales (int8/int4
    self_vs: Any                  # self ring) or None (bf16 ring)
    state: TimestampState         # leaves [B*NB]
    beam_scores: jax.Array        # [B, NB] running sum-logprob
    fin_tokens: jax.Array         # [B, NB, T_total]
    fin_scores: jax.Array         # [B, NB] score/len**penalty (-inf empty)
    fin_lens: jax.Array           # [B, NB]
    fin_count: jax.Array          # [B]
    fin_align: jax.Array          # [B, NB, A, max_new, K] row snapshots
    no_speech: jax.Array          # [B]
    align_buf: jax.Array          # [B, NB, A, max_new, K]
    done: jax.Array               # [B]


def beam_decode(params: Any, arch: WhisperArch, specials: SpecialTokens,
                opts: GenerationOptions, encoder_out: jax.Array,
                prompt: jax.Array, *, max_new_tokens: int, num_beams: int,
                length_penalty: float = 1.0,
                suppress_mask: jax.Array | None = None,
                begin_suppress_mask: jax.Array | None = None,
                align_sel: jax.Array | None = None,
                return_timestamps: bool = True,
                align_dtype: jnp.dtype = jnp.float32,
                prompt_mask: jax.Array | None = None,
                cross_cache_dtype: jnp.dtype | None = None,
                self_cache_dtype: jnp.dtype | None = None,
                sot_position: int = 0,
                pos_offset: jax.Array | None = None) -> BeamResult:
    # pos_offset: optional int32 [B] per-row left-pad count of the
    # conditioned prompt — learned-position lookups are shifted so real
    # tokens take positions 0..len-1 (HF padding='longest' + mask-aware
    # decoder_position_ids); beams of one item share the offset, so the
    # loop gets it repeated per beam. See greedy.py / decode_step.
    b, p = prompt.shape
    nb = num_beams
    k_frames = encoder_out.shape[1]
    t_total = p + max_new_tokens
    if t_total > arch.max_target_positions:
        raise ValueError("prompt + max_new exceeds max_target_positions")
    n_align = align_sel.shape[-1] if align_sel is not None else 1
    eot = specials.eot
    flat = b * nb

    # beams SHARE the cross-K/V (one copy per source item); only the self
    # ring is per-beam. decode_step(beam_groups=nb) routes beams through
    # the cross attention as extra query rows.
    cache = init_cache(params, arch, encoder_out, cache_len=t_total,
                       cross_dtype=cross_cache_dtype, self_batch=flat,
                       self_dtype=self_cache_dtype)
    key_mask = None
    if prompt_mask is not None:
        key_mask = jnp.repeat(jnp.concatenate(
            [jnp.asarray(prompt_mask, bool),
             jnp.ones((b, max_new_tokens), bool)], axis=1), nb, axis=0)
    pos_offset_flat = (None if pos_offset is None
                       else jnp.repeat(pos_offset, nb, axis=0))

    tokens0 = jnp.concatenate(
        [jnp.broadcast_to(prompt[:, None, :], (b, nb, p)).astype(jnp.int32),
         jnp.full((b, nb, max_new_tokens), eot, jnp.int32)], axis=2)
    beam_scores0 = jnp.where(jnp.arange(nb)[None, :] == 0, 0.0, NEG_INF
                             ) * jnp.ones((b, 1))

    # block prefill at batch B (beams share the identical prompt): ONE
    # multi-token step, then the per-item self-ring columns are repeated
    # per beam — NB x cheaper than feeding the prompt beam-wise, and P-1
    # fewer serial steps (see greedy.py prefill note).
    self_k0, self_v0 = cache.self_k, cache.self_v
    self_ks0, self_vs0 = cache.self_k_scale, cache.self_v_scale
    no_speech0 = jnp.zeros((b,), jnp.float32)
    t_start = 0
    if p > 1:
        ring_shape = (arch.decoder_layers, b,
                      arch.decoder_attention_heads, arch.head_dim, t_total)
        scale_shape = (arch.decoder_layers, b,
                       arch.decoder_attention_heads, t_total)
        pre_cache = cache._replace(
            self_k=jnp.zeros(ring_shape, cache.self_k.dtype),
            self_v=jnp.zeros(ring_shape, cache.self_v.dtype),
            self_k_scale=(None if cache.self_k_scale is None
                          else jnp.zeros(scale_shape,
                                         cache.self_k_scale.dtype)),
            self_v_scale=(None if cache.self_v_scale is None
                          else jnp.zeros(scale_shape,
                                         cache.self_v_scale.dtype)))
        pre_key_mask = None
        if prompt_mask is not None:
            pre_key_mask = jnp.concatenate(
                [jnp.asarray(prompt_mask, bool),
                 jnp.ones((b, max_new_tokens), bool)], axis=1)
        pre_logits, pre_cache, _ = decode_step_multi(
            params, arch, prompt.astype(jnp.int32)[:, :p - 1], jnp.int32(0),
            pre_cache, key_mask=pre_key_mask, align_dtype=align_dtype,
            pos_offset=pos_offset)
        self_k0 = jnp.repeat(pre_cache.self_k, nb, axis=1)
        self_v0 = jnp.repeat(pre_cache.self_v, nb, axis=1)
        if pre_cache.self_k_scale is not None:
            self_ks0 = jnp.repeat(pre_cache.self_k_scale, nb, axis=1)
            self_vs0 = jnp.repeat(pre_cache.self_v_scale, nb, axis=1)
        sp_idx = jnp.clip(jnp.asarray(sot_position, jnp.int32), 0, p - 2)
        lg = jax.lax.dynamic_index_in_dim(pre_logits, sp_idx, 1,
                                          keepdims=False)
        no_speech0 = jnp.where(
            jnp.asarray(sot_position) <= p - 2,
            jnp.exp(lg[:, specials.no_speech]
                    - jax.nn.logsumexp(lg, axis=-1)),
            0.0)
        t_start = p - 1

    carry = _Carry(
        t=jnp.int32(t_start), tokens=tokens0,
        self_k=self_k0, self_v=self_v0,
        self_ks=self_ks0, self_vs=self_vs0,
        state=TimestampState.init(flat),
        beam_scores=beam_scores0,
        fin_tokens=jnp.full((b, nb, t_total), eot, jnp.int32),
        fin_scores=jnp.full((b, nb), NEG_INF),
        fin_lens=jnp.zeros((b, nb), jnp.int32),
        fin_count=jnp.zeros((b,), jnp.int32),
        fin_align=jnp.zeros((b, nb, n_align, max_new_tokens, k_frames),
                            align_dtype),
        no_speech=no_speech0,
        align_buf=jnp.zeros((b, nb, n_align, max_new_tokens, k_frames),
                            align_dtype),
        done=jnp.zeros((b,), bool),
    )

    def cond(c: _Carry):
        return (c.t < t_total - 1) & ~jnp.all(c.done)

    def length_pen(length):
        return jnp.power(length.astype(jnp.float32), length_penalty)

    # beam-rows whole-step Pallas kernel (ops/pallas_decode_b1): the hf
    # ASR pipeline's DEFAULT decode is num_beams=5 at batch 1
    # (pipelines/base.py:1493 run_single) — the same weight-stream
    # bubbles the batch-1 greedy kernel removes dominate here too, since
    # beams only add query rows while the weight stream is batch
    # -invariant. Decided at trace time; same numerics-gated opt-in.
    from ..ops import pallas_decode_b1 as _b1k
    use_bR_kernel = (getattr(opts, "b1_decode_kernel", False) and b == 1
                     and key_mask is None and pos_offset is None
                     and _b1k.supported_beams(
                         params, arch, cache, key_mask, jnp.int32(0),
                         jnp.zeros((flat,), jnp.int32)))

    def body(c: _Carry) -> _Carry:
        feed = c.tokens.reshape(flat, t_total)[:, c.t]
        step_cache = cache._replace(self_k=c.self_k, self_v=c.self_v,
                                    self_k_scale=c.self_ks,
                                    self_v_scale=c.self_vs)
        if use_bR_kernel:
            logits, new_cache, align = _b1k.decode_step_b1_beams(
                params, arch, feed, c.t, step_cache, align_sel=align_sel,
                align_dtype=align_dtype)
        else:
            logits, new_cache, align = decode_step(
                params, arch, feed, c.t, step_cache, align_sel=align_sel,
                key_mask=key_mask, beam_groups=nb,
                pos_offset=pos_offset_flat)
        # record alignment rows of the query tokens (t >= p)
        slot = jnp.maximum(c.t - p, 0)
        record = c.t >= p
        align_r = align.reshape(b, nb, n_align, k_frames)
        old_slice = jax.lax.dynamic_slice(
            c.align_buf, (0, 0, 0, slot, 0),
            (b, nb, n_align, 1, k_frames))
        align_buf = jax.lax.dynamic_update_slice(
            c.align_buf,
            jnp.where(record, align_r[:, :, :, None, :],
                      old_slice).astype(c.align_buf.dtype),
            (0, 0, 0, slot, 0))

        # no-speech prob from RAW logits AT THE SOT POSITION (see
        # greedy.py — logits_process.py:2099-2105 semantics); lax.cond +
        # single-column softmax so the [flat, V] softmax runs on ONE step
        no_speech = jax.lax.cond(
            c.t == sot_position,
            lambda lg: jnp.exp(
                lg[:, specials.no_speech]
                - jax.nn.logsumexp(lg, axis=-1)).reshape(b, nb)[:, 0],
            lambda lg: c.no_speech,
            logits)

        # hf _beam_search order (generation/utils.py:3113): log_softmax the
        # raw logits FIRST, then run the processor stack on the logprobs and
        # use them UNrenormalized — masking must not shift survivor scores.
        logprobs = process_scores(
            jax.nn.log_softmax(logits, axis=-1), c.state, specials, opts,
            suppress_mask, begin_suppress_mask, return_timestamps)
        v = logprobs.shape[-1]

        is_sampling = c.t >= p - 1

        # ---------------- prompt phase: feed forced tokens ----------------
        def prompt_phase():
            next_tok = c.tokens[:, :, jnp.minimum(c.t + 1, t_total - 1)]
            tokens = jax.lax.dynamic_update_slice(
                c.tokens, next_tok[:, :, None], (0, 0, c.t + 1))
            return (tokens, c.beam_scores, c.fin_tokens, c.fin_scores,
                    c.fin_lens, c.fin_count, c.fin_align, c.state,
                    align_buf,
                    jnp.arange(nb)[None, :] * jnp.ones((b, 1), jnp.int32),
                    c.done)

        # ---------------- beam phase ----------------
        def beam_phase():
            cand = c.beam_scores[:, :, None] + logprobs.reshape(b, nb, v)
            cand = cand.reshape(b, nb * v)
            k2 = 2 * nb
            top_scores, top_idx = jax.lax.top_k(cand, k2)   # [B, 2NB]
            src_beam = top_idx // v                          # [B, 2NB]
            tok = (top_idx % v).astype(jnp.int32)
            is_eos = tok == eot
            gen_len = c.t - p + 2        # tokens incl. this one

            # --- finished-pool update: eos candidates from top-NB ranks
            rank = jnp.arange(k2)[None, :]
            eos_ok = is_eos & (rank < nb) & ~c.done[:, None]
            fin_cand_score = top_scores / length_pen(gen_len)

            def add_finished(carry_fin, i):
                ftok, fsc, flen, fcnt, falign = carry_fin
                sc = jnp.where(eos_ok[:, i], fin_cand_score[:, i], NEG_INF)
                # evict current worst if new is better and pool full
                worst_idx = jnp.argmin(fsc, axis=1)            # [B]
                worst = jnp.take_along_axis(fsc, worst_idx[:, None],
                                            axis=1)[:, 0]
                accept = (sc > worst) | (fcnt < nb)
                use_slot = jnp.where(fcnt < nb, fcnt, worst_idx)
                do = (sc > NEG_INF) & accept
                # gather the finished sequence: src beam tokens + eos at t+1
                src = src_beam[:, i]
                seq = jnp.take_along_axis(
                    c.tokens, src[:, None, None], axis=1)[:, 0]  # [B, T]
                seq = jax.lax.dynamic_update_slice(
                    seq, jnp.full((b, 1), eot, jnp.int32), (0, c.t + 1))
                onehot = (jnp.arange(nb)[None, :] ==
                          use_slot[:, None]) & do[:, None]
                ftok = jnp.where(onehot[:, :, None], seq[:, None, :], ftok)
                fsc = jnp.where(onehot, sc[:, None], fsc)
                flen = jnp.where(onehot, gen_len, flen)
                fcnt = fcnt + jnp.where(do & (fcnt < nb), 1, 0)
                # snapshot this hypothesis' alignment rows (pre-reorder
                # buffer indexed by its source beam) — the in-graph
                # equivalent of the reference's beam_indices gather
                # (generation_whisper.py:268-304)
                src_align = jnp.take_along_axis(
                    align_buf, src[:, None, None, None, None], axis=1)
                falign = jnp.where(onehot[:, :, None, None, None],
                                   src_align, falign)
                return (ftok, fsc, flen, fcnt, falign), None

            (fin_tokens, fin_scores, fin_lens, fin_count, fin_align), _ = \
                jax.lax.scan(
                    add_finished,
                    (c.fin_tokens, c.fin_scores, c.fin_lens, c.fin_count,
                     c.fin_align),
                    jnp.arange(k2))

            # --- pick NB continuing (non-eos) candidates in rank order
            live_ok = ~is_eos
            live_rank = jnp.cumsum(live_ok.astype(jnp.int32), axis=1) - 1
            # selection index for continuing slot j: first candidate with
            # live_rank == j
            sel = jnp.argmax(
                (live_rank[:, None, :] == jnp.arange(nb)[None, :, None])
                & live_ok[:, None, :], axis=2)               # [B, NB]
            new_scores = jnp.take_along_axis(top_scores, sel, axis=1)
            new_tok = jnp.take_along_axis(tok, sel, axis=1)
            new_src = jnp.take_along_axis(src_beam, sel, axis=1)

            # frozen rows for finished batches
            keep = c.done[:, None]
            new_scores = jnp.where(keep, c.beam_scores, new_scores)
            new_tok = jnp.where(keep, eot, new_tok)
            new_src = jnp.where(keep, jnp.arange(nb)[None, :], new_src)

            # --- reorder running buffers by src beam
            tokens = jnp.take_along_axis(c.tokens, new_src[:, :, None],
                                         axis=1)
            tokens = jax.lax.dynamic_update_slice(
                tokens, new_tok[:, :, None], (0, 0, c.t + 1))
            albuf = jnp.take_along_axis(
                align_buf, new_src[:, :, None, None, None], axis=1)

            flat_src = (new_src + jnp.arange(b)[:, None] * nb).reshape(flat)
            state = jax.tree.map(lambda x: x[flat_src], c.state)
            state = state._replace()  # keep type
            new_state = state.update(new_tok.reshape(flat),
                                     specials.timestamp_begin)
            state = jax.tree.map(
                lambda new, old: jnp.where(c.done[:, None].repeat(nb, 1)
                                           .reshape(flat), old, new),
                new_state, state)

            # --- done check (early_stopping=False attainability,
            # hf BeamHypotheses.is_done: best_sum_logprobs / cur_len**pen)
            best_running = jnp.max(new_scores, axis=1)
            attainable = best_running / length_pen(gen_len)
            worst_fin = jnp.where(fin_count >= nb,
                                  jnp.min(fin_scores, axis=1), NEG_INF)
            done = c.done | (worst_fin >= attainable)

            return (tokens, new_scores, fin_tokens, fin_scores, fin_lens,
                    fin_count, fin_align, state, albuf, new_src, done)

        (tokens, beam_scores, fin_tokens, fin_scores, fin_lens, fin_count,
         fin_align, state, albuf, new_src, done) = jax.lax.cond(
            is_sampling, beam_phase, prompt_phase)

        # reorder self-attention cache (and ring scales) by src beam
        flat_src = (new_src + jnp.arange(b)[:, None] * nb).reshape(flat)
        self_k = new_cache.self_k[:, flat_src]
        self_v = new_cache.self_v[:, flat_src]
        self_ks = (None if new_cache.self_k_scale is None
                   else new_cache.self_k_scale[:, flat_src])
        self_vs = (None if new_cache.self_v_scale is None
                   else new_cache.self_v_scale[:, flat_src])

        return _Carry(t=c.t + 1, tokens=tokens, self_k=self_k,
                      self_v=self_v, self_ks=self_ks, self_vs=self_vs,
                      state=state,
                      beam_scores=beam_scores, fin_tokens=fin_tokens,
                      fin_scores=fin_scores, fin_lens=fin_lens,
                      fin_count=fin_count, fin_align=fin_align,
                      no_speech=no_speech, align_buf=albuf, done=done)

    # staged ring growth (opts.staged_ring_quantum, see greedy.py): the
    # per-BEAM rings make the self read NB x greedy's, so capping the
    # ring view at the live prefix pays even more here. Bit-identical
    # (padded slots reduce as exact zeros); same gates as greedy.
    quantum = getattr(opts, "staged_ring_quantum", 0)
    ring_len = self_k0.shape[-1]
    use_staged = (quantum > 0 and key_mask is None
                  and not use_bR_kernel and ring_len > quantum)
    if not use_staged:
        final = jax.lax.while_loop(cond, body, carry)
    else:
        widths = [w for w in range(quantum, ring_len, quantum)
                  if w > t_start] + [ring_len]

        def ring_view(x, w):
            return None if x is None else x[..., :w]

        def ring_pad(x, w_to):
            if x is None:
                return None
            pad = [(0, 0)] * (x.ndim - 1) + [(0, w_to - x.shape[-1])]
            return jnp.pad(x, pad)

        final = carry._replace(self_k=ring_view(carry.self_k, widths[0]),
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

    # length-stopped: fold still-running beams into the candidate pool.
    # Reference semantics (BeamSearchScorer.finalize): for batches NOT
    # marked done, every running beam is added to the hypothesis pool with
    # worst-eviction — so the overall best of (finished ∪ running) wins;
    # for done batches the running beams are skipped.
    run_len = jnp.int32(max_new_tokens)
    run_scores = final.beam_scores / length_pen(run_len)
    all_scores = jnp.concatenate([final.fin_scores, run_scores], axis=1)
    all_lens = jnp.concatenate(
        [final.fin_lens, jnp.full((b, nb), run_len, jnp.int32)], axis=1)
    all_tokens = jnp.concatenate([final.fin_tokens, final.tokens], axis=1)
    run_mask = jnp.broadcast_to(~final.done[:, None], (b, nb))
    valid = jnp.concatenate(
        [final.fin_scores > NEG_INF, run_mask], axis=1)
    masked_scores = jnp.where(valid, all_scores, NEG_INF)
    best = jnp.argmax(masked_scores, axis=1)                  # [B]

    sequences = jnp.take_along_axis(all_tokens, best[:, None, None],
                                    axis=1)[:, 0]
    seq_scores = jnp.take_along_axis(masked_scores, best[:, None],
                                     axis=1)[:, 0]
    num_gen = jnp.take_along_axis(all_lens, best[:, None], axis=1)[:, 0]
    # align rows: finished pool stores exact snapshots; running beams use
    # the (already reordered) live buffer
    all_align = jnp.concatenate([final.fin_align, final.align_buf], axis=1)
    align_probs = jnp.take_along_axis(
        all_align, best[:, None, None, None, None], axis=1)[:, 0]

    return BeamResult(sequences=sequences, num_generated=num_gen,
                      sequences_scores=seq_scores,
                      no_speech_probs=final.no_speech,
                      align_probs=align_probs.astype(jnp.float32))


_BEAM_STATIC = ("arch", "specials", "opts", "max_new_tokens",
                "num_beams", "length_penalty", "return_timestamps",
                "align_dtype", "cross_cache_dtype", "self_cache_dtype")


@functools.partial(jax.jit, static_argnames=_BEAM_STATIC)
def beam_decode_jit(params, arch, specials, opts, encoder_out, prompt,
                    max_new_tokens: int, num_beams: int,
                    length_penalty: float = 1.0, suppress_mask=None,
                    begin_suppress_mask=None, align_sel=None,
                    return_timestamps: bool = True,
                    align_dtype: jnp.dtype = jnp.float32,
                    prompt_mask=None,
                    cross_cache_dtype: jnp.dtype | None = None,
                    self_cache_dtype: jnp.dtype | None = None,
                    sot_position: int = 0, pos_offset=None) -> BeamResult:
    return beam_decode(params, arch, specials, opts, encoder_out, prompt,
                       max_new_tokens=max_new_tokens, num_beams=num_beams,
                       length_penalty=length_penalty,
                       suppress_mask=suppress_mask,
                       begin_suppress_mask=begin_suppress_mask,
                       align_sel=align_sel,
                       return_timestamps=return_timestamps,
                       align_dtype=align_dtype, prompt_mask=prompt_mask,
                       cross_cache_dtype=cross_cache_dtype,
                       self_cache_dtype=self_cache_dtype,
                       sot_position=sot_position, pos_offset=pos_offset)

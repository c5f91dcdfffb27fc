"""Assisted (speculative) decoding: draft model proposes, main verifies.

The reference ships WhisperForCausalLM explicitly as the assistant model
for assisted generation (hf modeling_whisper.py:1359, used via
`model.generate(assistant_model=...)`, generation/utils.py candidate
generators) — the consumer the round-1 review flagged as missing. This is
the TPU-native rebuild: both the draft chain and the verification forward
run inside ONE `lax.while_loop` program; the verify pass is a
`decode_step_multi` block, so the main model's cross-KV cache — the
dominant HBM read of autoregressive decode — is read ONCE per window of
`spec_len` tokens instead of once per token. With an accepting draft
(e.g. a distil-Whisper decoder sharing the encoder), decode bandwidth
per committed token drops by ~the mean accepted-window length.

Exactness contract (tested): for ANY draft, greedy assisted output ==
greedy_decode output (sequences, logprobs, alignment rows, no-speech).
Greedy only, like the reference — but BATCHED (the reference's assisted
path is batch_size == 1, generation/utils.py candidate generators): each
row keeps its own committed length, the draft chain and the verify block
run at per-row cache positions (models/whisper decode_step /
decode_step_multi position vectors), and rows accept independently.

Draft model requirements: any Whisper decoder (same tokenizer); it runs
against its own encoder output (same audio, its own geometry — pass
`draft_encoder_out`). `spec_len` is the static speculation window.

DRAFT-FREE mode (draft_params=None): candidates come from PROMPT-LOOKUP
n-gram matching instead of a model — the TPU-native rebuild of hf
PromptLookupCandidateGenerator (generation/candidate_generator.py,
enabled by `generate(prompt_lookup_num_tokens=...)`): the trailing
n-gram of the committed tokens is matched against earlier positions
(first match wins, largest n first) and the tokens that followed it are
proposed. No second model, no extra memory; windows without a match
propose rejected filler and cost one ordinary step. Useful for
repetitive speech (dictation with corrections, verbatim disfluencies).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..config import GenerationOptions, SpecialTokens, WhisperArch
from ..models.whisper import decode_step, decode_step_multi, init_cache
from .greedy import DecodeResult
from .processors import TimestampState, process_scores


def make_self_draft(params: Any, arch: WhisperArch, num_layers: int
                    ) -> tuple[Any, WhisperArch]:
    """Layer-truncated SELF-draft: the first `num_layers` decoder layers
    of the main checkpoint (plus its embeddings and final LN) act as the
    assistant — no second trained model needed, and the draft shares the
    MAIN encoder output (its cross-attention weights were trained against
    exactly those states). This is the deployment answer to "speculation
    needs a distil draft": any real checkpoint self-drafts.

    Returns (draft_params, draft_arch). draft_params has NO "encoder"
    entry — decoding/longform._decode_window detects that and reuses the
    main encoder output instead of running a second encoder.

    The layer stack is stacked on a leading axis (models/whisper.py), so
    truncation is one slice per leaf; works on quantized layouts too
    (w_q/w_q4 carry the same leading layer axis)."""
    if not 1 <= num_layers <= arch.decoder_layers:
        raise ValueError(f"num_layers {num_layers} out of range "
                         f"(decoder has {arch.decoder_layers})")
    dec = dict(params["decoder"])
    dec["layers"] = jax.tree.map(lambda x: x[:num_layers], dec["layers"])
    draft_arch = dataclasses.replace(arch, decoder_layers=num_layers)
    return {"decoder": dec}, draft_arch


def ngram_propose(tokens: jax.Array, lengths: jax.Array, spec_len: int,
                  ngram_sizes: tuple[int, ...] = (3, 2),
                  fill: int = 0) -> jax.Array:
    """Prompt-lookup candidates: for each row, match the trailing n-gram
    of tokens[:lengths] against earlier window starts (largest n first,
    FIRST match wins — hf candidate_generator.py semantics) and return
    the `spec_len` tokens that followed the match. Rows with no match get
    `fill` (the verify pass rejects them; exactness is never at stake).

    tokens: int32 [B, TT] (committed prefix + filler tail);
    lengths: int32 [B]. Returns drafts int32 [B, spec_len].
    """
    b, tt = tokens.shape
    idx = jnp.arange(tt)
    drafts = jnp.full((b, spec_len), fill, jnp.int32)
    have = jnp.zeros((b,), bool)
    for n in ngram_sizes:                        # static, largest first
        # trailing n-gram per row: tokens[lengths-n : lengths]
        tgt = jnp.take_along_axis(
            tokens, jnp.clip(lengths[:, None] - n + jnp.arange(n)[None, :],
                             0, tt - 1), axis=1)            # [B, n]
        # window match at start i: all_j tokens[i+j] == tgt[j], for
        # i + n <= lengths - 1 (at least one continuation token exists,
        # and the trailing n-gram itself is excluded)
        match = jnp.ones((b, tt), bool)
        for j in range(n):
            shifted = jnp.take_along_axis(
                tokens, jnp.clip(idx[None, :] + j, 0, tt - 1), axis=1)
            match = match & (shifted == tgt[:, j:j + 1])
        valid = idx[None, :] + n <= lengths[:, None] - 1
        match = match & valid & (lengths[:, None] >= n + 1)
        found = jnp.any(match, axis=1)
        i_star = jnp.argmax(match, axis=1)       # first True
        cand = jnp.take_along_axis(
            tokens, jnp.clip(i_star[:, None] + n + jnp.arange(spec_len),
                             0, tt - 1), axis=1).astype(jnp.int32)
        use = found & ~have
        drafts = jnp.where(use[:, None], cand, drafts)
        have = have | found
    return drafts


def assisted_decode(params: Any, arch: WhisperArch,
                    draft_params: Any, draft_arch: WhisperArch,
                    specials: SpecialTokens, opts: GenerationOptions,
                    encoder_out: jax.Array, draft_encoder_out: jax.Array,
                    prompt: jax.Array, *,
                    max_new_tokens: int,
                    spec_len: int = 4,
                    suppress_mask: jax.Array | None = None,
                    begin_suppress_mask: jax.Array | None = None,
                    align_sel: jax.Array | None = None,
                    return_timestamps: bool = True,
                    align_dtype: jnp.dtype = jnp.float32,
                    cross_cache_dtype: jnp.dtype | None = None,
                    self_cache_dtype: jnp.dtype | None = None,
                    prompt_mask: jax.Array | None = None,
                    sot_position: int = 0,
                    pos_offset: jax.Array | None = None,
                    draft_script: jax.Array | None = None) -> DecodeResult:
    """pos_offset: optional int32 [B] per-row left-pad count of the
    conditioned prompt — shifts the learned-position gather only (the
    dynamic condition-on-prev mode; see models/whisper.decode_step).
    Applied identically to the draft chain and the verify block, so the
    exactness contract vs greedy_decode(pos_offset=...) holds unchanged.

    draft_script: optional int32 [B, >= p + max_new] BENCH/TEST-ONLY
    candidate table aligned with the token buffer — the draft for window
    position t is draft_script[b, t]. Feeding the model's own greedy
    output gives acceptance 1.0; corrupting a fraction of positions
    sweeps the acceptance rate while exactness stays pinned (rejected
    rows fall back to the verified token). Used by
    scripts/spec_accept_bench.py to publish the RTFx-vs-acceptance curve
    without a trained draft."""
    b, p = prompt.shape
    s = spec_len
    use_draft_model = draft_params is not None   # else: script / lookup
    k_frames = encoder_out.shape[1]
    t_total = p + max_new_tokens
    if t_total > arch.max_target_positions:
        raise ValueError("prompt + max_new exceeds max_target_positions")
    # Overshoot contract: the draft chain / verify block index learned
    # positions up to t_total + spec_len - 2 — up to spec_len - 1 PAST
    # the position table when t_total == max_target_positions (only on
    # rows that are never committed). Make that in-bounds by EXTENDING
    # the table with spec_len - 1 copies of its last row (matching XLA's
    # OOB-gather clamp the code used to rely on implicitly). A clamp
    # inside decode_step is NOT an option (jnp.minimum on the position
    # scalar breaks XLA's in-place ring aliasing — measured 23x decode
    # regression), and shrinking max_new would change the ring length vs
    # plain greedy, perturbing attention rounding enough to flip DTW
    # timestamp ties (breaks the exactness contract).
    if s > 1:
        def _extend_pos(prm):
            d = dict(prm["decoder"])
            pe = d["pos_emb"]
            d["pos_emb"] = jnp.concatenate(
                [pe, jnp.repeat(pe[-1:], s - 1, axis=0)])
            return {**prm, "decoder": d}
        params = _extend_pos(params)
        if use_draft_model:
            draft_params = _extend_pos(draft_params)
    n_align = align_sel.shape[-1] if align_sel is not None else 1
    eot = specials.eot
    ts_begin = specials.timestamp_begin

    # caches sized with spec overshoot room (verify writes past the last
    # committed token; those columns are masked and later overwritten)
    cache = init_cache(params, arch, encoder_out,
                       cross_dtype=cross_cache_dtype,
                       cache_len=t_total + s, self_dtype=self_cache_dtype)
    # Draft chain through the batch-1 kernel (single-stream serving with
    # a REAL draft, e.g. make_self_draft): eligible when the kernel gate
    # is requested at B=1 and the draft weights are fused+quantized (a
    # self-draft sliced from quantized main params always is). The draft
    # cache is then built in the kernel's gated layout (quantized cross
    # + int8 self ring). Draft numerics only move the ACCEPTANCE RATE —
    # the verify pass pins the output — so this is a pure perf option;
    # when ineligible the draft chain stays on the bf16 XLA step.
    def _quantized_fused(prm):
        lay = prm["decoder"]["layers"]
        return ("qkv" in lay["self"] and "w_q" in lay["self"]["qkv"]
                and "w_q" in lay["mlp"]["fc1"])
    draft_quant = (use_draft_model and b == 1
                   and getattr(opts, "b1_decode_kernel", False)
                   and pos_offset is None and prompt_mask is None
                   and cross_cache_dtype in (jnp.int8, jnp.int4)
                   and _quantized_fused(draft_params))
    if use_draft_model:
        draft_cache = init_cache(
            draft_params, draft_arch, draft_encoder_out,
            cross_dtype=cross_cache_dtype if draft_quant else None,
            cache_len=t_total + s,
            self_dtype=jnp.int8 if draft_quant else None)
    else:
        # structural placeholder so the while-loop carry keeps one shape
        draft_cache = cache._replace(
            self_k=jnp.zeros((1,), cache.self_k.dtype),
            self_v=jnp.zeros((1,), cache.self_v.dtype))

    prompt = prompt.astype(jnp.int32)
    key_mask = None
    if prompt_mask is not None:
        key_mask = jnp.concatenate(
            [jnp.asarray(prompt_mask, bool),
             jnp.ones((b, t_total + s - p), bool)], axis=1)
    no_speech0 = jnp.zeros((b,), jnp.float32)
    if p > 1:
        pre_logits, cache, _ = decode_step_multi(
            params, arch, prompt[:, :p - 1], jnp.int32(0), cache,
            key_mask=key_mask, align_dtype=align_dtype,
            pos_offset=pos_offset)
        if use_draft_model:
            _, draft_cache, _ = decode_step_multi(
                draft_params, draft_arch, prompt[:, :p - 1], jnp.int32(0),
                draft_cache, key_mask=key_mask, pos_offset=pos_offset)
        if sot_position <= p - 2:          # static here (no traced callers)
            lg = pre_logits[:, sot_position]
            no_speech0 = jnp.exp(lg[:, specials.no_speech]
                                 - jax.nn.logsumexp(lg, axis=-1))

    # token buffer with overshoot tail; align buffer with ONE leading junk
    # slot so the first verify block's prompt row has a writable target
    tokens0 = jnp.concatenate(
        [prompt, jnp.full((b, max_new_tokens + s), eot, jnp.int32)], axis=1)
    align_buf0 = jnp.zeros((b, n_align, 1 + max_new_tokens + s, k_frames),
                           align_dtype)

    def proc(logits, state):
        return process_scores(logits, state, specials, opts, suppress_mask,
                              begin_suppress_mask, return_timestamps)

    # batch-1 whole-step Pallas kernel for the VERIFY block (the whole
    # device cost of draft-free speculation): same gate as greedy's
    # per-token use — the two levers compound at B=1. With a draft
    # MODEL, the draft chain additionally runs on the kernel when its
    # params/cache fit the gated layout (draft_quant above).
    from ..ops import pallas_decode_b1 as _b1k
    use_b1_kernel = (getattr(opts, "b1_decode_kernel", False) and b == 1
                     and key_mask is None and pos_offset is None
                     and _b1k.supported(params, arch, cache, key_mask, 1,
                                        jnp.int32(0), prompt[:, 0]))
    use_b1_draft_kernel = (use_b1_kernel and draft_quant
                           and _b1k.supported(draft_params, draft_arch,
                                              draft_cache, None, 1,
                                              jnp.int32(0), prompt[:, 0]))

    rows = jnp.arange(b)

    def _pos(v):
        """Cache positions for decode_step/_multi: at batch 1 the rows
        share one offset, so pass a SCALAR to keep the fast
        dynamic-update-slice cache-write path (the vector form scatters)."""
        return v[0] if b == 1 else v

    def cond(c):
        (tokens, lengths, state, finished, *_rest) = c
        return jnp.any(~finished & (lengths < t_total))

    def body(c):
        (tokens, lengths, state, finished, sum_lp, no_speech, align_buf,
         self_k, self_v, self_ks, self_vs, d_self_k, d_self_v,
         d_self_ks, d_self_vs) = c
        mcache = cache._replace(self_k=self_k, self_v=self_v,
                                self_k_scale=self_ks, self_v_scale=self_vs)
        if draft_quant:
            dcache = draft_cache._replace(
                self_k=d_self_k, self_v=d_self_v,
                self_k_scale=d_self_ks, self_v_scale=d_self_vs)
        else:
            dcache = draft_cache._replace(self_k=d_self_k, self_v=d_self_v)

        feed0 = jnp.take_along_axis(tokens, lengths[:, None] - 1,
                                    axis=1)[:, 0]
        if use_draft_model:
            # ---- draft chain: propose d_1..d_s greedily w/ the grammar
            # (on the fused B=1 kernel when the draft fits its gate)
            def draft_body(carry, i):
                dc_k, dc_v, dc_ks, dc_vs, dstate, tok = carry
                if draft_quant:
                    dc = draft_cache._replace(
                        self_k=dc_k, self_v=dc_v,
                        self_k_scale=dc_ks, self_v_scale=dc_vs)
                else:
                    dc = draft_cache._replace(self_k=dc_k, self_v=dc_v)
                if use_b1_draft_kernel:
                    lgt, dc, _ = _b1k.decode_step_b1(
                        draft_params, draft_arch, tok,
                        _pos(lengths - 1 + i), dc)
                else:
                    lgt, dc, _ = decode_step(draft_params, draft_arch, tok,
                                             _pos(lengths - 1 + i), dc,
                                             key_mask=key_mask,
                                             pos_offset=pos_offset)
                nxt = jnp.argmax(proc(lgt, dstate),
                                 axis=-1).astype(jnp.int32)
                new_ks = dc.self_k_scale if draft_quant else dc_ks
                new_vs = dc.self_v_scale if draft_quant else dc_vs
                return (dc.self_k, dc.self_v, new_ks, new_vs,
                        dstate.update(nxt, ts_begin), nxt), nxt

            (d_self_k, d_self_v, d_self_ks, d_self_vs, _, _), drafts = (
                jax.lax.scan(
                    draft_body,
                    (dcache.self_k, dcache.self_v, d_self_ks, d_self_vs,
                     state, feed0),
                    jnp.arange(s)))
            drafts = jnp.swapaxes(drafts, 0, 1)        # [B, S]
        elif draft_script is not None:
            # ---- scripted candidates (forced-acceptance harness):
            # propose the script's tokens for positions lengths..+s-1
            drafts = jnp.take_along_axis(
                draft_script.astype(jnp.int32),
                jnp.clip(lengths[:, None] + jnp.arange(s)[None, :],
                         0, draft_script.shape[1] - 1), axis=1)
        else:
            # ---- prompt lookup: n-gram continuation of the committed
            # tokens (hf PromptLookupCandidateGenerator analog) ----
            drafts = ngram_propose(tokens, lengths, s, fill=eot)

        # ---- verify: ONE multi-token step over [tok[L-1], d_1..d_{S-1}] --
        block = jnp.concatenate([feed0[:, None], drafts[:, :s - 1]],
                                axis=1) if s > 1 else feed0[:, None]
        if use_b1_kernel:
            logits, mcache, align = _b1k.decode_step_b1_multi(
                params, arch, block, _pos(lengths - 1), mcache,
                align_sel=align_sel, align_dtype=align_dtype)
        else:
            logits, mcache, align = decode_step_multi(
                params, arch, block, _pos(lengths - 1), mcache,
                align_sel=align_sel, key_mask=key_mask,
                align_dtype=align_dtype,
                pos_offset=pos_offset)      # [B, S, V], [B, A, S, K]

        # ---- sequential accept over the block (vectorized over rows) ----
        def ver_body(carry, i):
            vstate, alive, fin, lp_acc, ns = carry
            lg = logits[:, i]
            scores = proc(lg, vstate)
            tgt = jnp.argmax(scores, axis=-1).astype(jnp.int32)
            commit = alive & ~fin & (lengths + i < t_total)
            lp = (jnp.take_along_axis(scores, tgt[:, None], axis=-1)[:, 0]
                  - jax.nn.logsumexp(scores, axis=-1))
            lp_acc = lp_acc + jnp.where(commit, lp, 0.0)
            ns = jnp.where((lengths - 1 + i) == sot_position,
                           jnp.exp(lg[:, specials.no_speech]
                                   - jax.nn.logsumexp(lg, axis=-1)), ns)
            new_state = vstate.update(tgt, ts_begin)
            vstate = jax.tree.map(
                lambda new, old: jnp.where(commit, new, old),
                new_state, vstate)
            fin = fin | (commit & (tgt == eot))
            # a row's chain survives to block row i+1 iff its target
            # equals its own next input, which is draft d_{i+1}
            alive = commit & (tgt == drafts[:, i]) & (i + 1 < s)
            return (vstate, alive, fin, lp_acc, ns), (tgt, commit)

        (state, _, finished, sum_lp, no_speech), (tgts, commits) = (
            jax.lax.scan(ver_body,
                         (state, jnp.ones((b,), bool), finished, sum_lp,
                          no_speech),
                         jnp.arange(s)))
        tgts = jnp.swapaxes(tgts, 0, 1)                # [B, S]
        commits = jnp.swapaxes(commits, 0, 1)          # [B, S]
        n_new = jnp.sum(commits.astype(jnp.int32), axis=1)   # [B]

        # ---- commit tokens at per-row offsets (uncommitted slots hold
        # eot; overwritten by a later window) ----
        block_new = jnp.where(commits, tgts, eot)
        slot = lengths[:, None] + jnp.arange(s)[None, :]     # [B, S]
        tokens = tokens.at[rows[:, None], slot].set(block_new)

        # ---- record alignment rows for committed input queries ----
        # block row i of batch row r is the query at input position
        # lengths[r]-1+i; it is committed exactly when commits[r, i], and
        # must be a generated token (>= p). align slot = position - p + 1
        # (one leading junk slot).
        row_pos = lengths[:, None] - 1 + jnp.arange(s)[None, :]
        row_committed = commits & (row_pos >= p)
        base = (lengths - p)[:, None] + jnp.arange(s)[None, :]  # [B, S]
        align_bsak = jnp.swapaxes(align.astype(align_buf.dtype), 1, 2)
        # NON-committed rows' writes are redirected to the leading junk
        # slot 0 (sliced off on return) instead of read-merge-writing the
        # old values back: committed slots are written exactly once (by
        # the window that commits them) and never-committed slots keep
        # their zero init, so the final buffer is identical while the
        # [B, S, A, K] gather the merge formulation paid disappears.
        safe_base = jnp.where(row_committed, base, 0)
        align_buf = align_buf.at[rows[:, None], :, safe_base].set(
            align_bsak)

        return (tokens, lengths + n_new, state, finished, sum_lp, no_speech,
                align_buf, mcache.self_k, mcache.self_v,
                mcache.self_k_scale, mcache.self_v_scale,
                d_self_k, d_self_v, d_self_ks, d_self_vs)

    if draft_quant:
        d_scales0 = (draft_cache.self_k_scale, draft_cache.self_v_scale)
    else:       # structural placeholders (bf16 draft ring has no scales)
        d_scales0 = (jnp.zeros((1,), jnp.bfloat16),
                     jnp.zeros((1,), jnp.bfloat16))
    init = (tokens0, jnp.full((b,), p, jnp.int32), TimestampState.init(b),
            jnp.zeros((b,), bool), jnp.zeros((b,), jnp.float32), no_speech0,
            align_buf0, cache.self_k, cache.self_v, cache.self_k_scale,
            cache.self_v_scale, draft_cache.self_k, draft_cache.self_v,
            *d_scales0)

    # staged ring growth (opts.staged_ring_quantum, see greedy.py): the
    # verify block's self read scales with the allocated ring; run the
    # block loop over 128-slot ring views. A block writes rows at
    # [lengths-1, lengths-1+s), so stage w admits rows while
    # max(lengths) <= w - s + 1. Both the main rings and a REAL draft's
    # rings (same allocated length) stage; [1]-shaped structural
    # placeholders are excluded by shape. Bit-identical (padded slots
    # reduce as exact zeros) — tests/test_staged_ring.py.
    quantum = getattr(opts, "staged_ring_quantum", 0)
    ring_len = cache.self_k.shape[-1]
    use_staged = (quantum > 0 and key_mask is None
                  and not use_b1_kernel and ring_len > quantum)
    if not use_staged:
        final = jax.lax.while_loop(cond, body, init)
    else:
        def _stageable(x):
            return (x is not None and hasattr(x, "ndim") and x.ndim >= 4
                    and x.shape[-1] == ring_len)
        ring_idx = [i for i in range(7, 15) if _stageable(init[i])]
        widths = [w for w in range(quantum, ring_len, quantum)
                  if w >= p + s - 1] + [ring_len]

        def ring_view(x, w):
            return x[..., :w]

        def ring_pad(x, w_to):
            pad = [(0, 0)] * (x.ndim - 1) + [(0, w_to - x.shape[-1])]
            return jnp.pad(x, pad)

        cur = list(init)
        for idx in ring_idx:
            cur[idx] = ring_view(cur[idx], widths[0])
        final = tuple(cur)
        for i, w in enumerate(widths):
            if i > 0:
                cur = list(final)
                for idx in ring_idx:
                    cur[idx] = ring_pad(cur[idx], w)
                final = tuple(cur)
            stage_cond = (lambda c, _w=w:
                          (jnp.max(c[1]) <= _w - s + 1) & cond(c))
            final = jax.lax.while_loop(stage_cond, body, final)

    (tokens, lengths, state, finished, sum_lp, no_speech, align_buf,
     *_rest) = final

    return DecodeResult(
        sequences=tokens[:, :t_total],
        num_generated=state.num_generated,
        sum_logprobs=sum_lp,
        no_speech_probs=no_speech,
        align_probs=align_buf[:, :, 1:1 + max_new_tokens, :],
    )


@functools.partial(
    jax.jit,
    static_argnames=("arch", "draft_arch", "specials", "opts",
                     "max_new_tokens", "spec_len", "return_timestamps",
                     "align_dtype", "cross_cache_dtype", "self_cache_dtype",
                     "sot_position"))
def assisted_decode_jit(params, arch, draft_params, draft_arch, specials,
                        opts, encoder_out, draft_encoder_out, prompt,
                        max_new_tokens: int, spec_len: int = 4,
                        suppress_mask=None, begin_suppress_mask=None,
                        align_sel=None, return_timestamps: bool = True,
                        align_dtype: jnp.dtype = jnp.float32,
                        cross_cache_dtype: jnp.dtype | None = None,
                        self_cache_dtype: jnp.dtype | None = None,
                        prompt_mask=None,
                        sot_position: int = 0,
                        pos_offset=None,
                        draft_script=None) -> DecodeResult:
    return assisted_decode(params, arch, draft_params, draft_arch, specials,
                           opts, encoder_out, draft_encoder_out, prompt,
                           max_new_tokens=max_new_tokens, spec_len=spec_len,
                           suppress_mask=suppress_mask,
                           begin_suppress_mask=begin_suppress_mask,
                           align_sel=align_sel,
                           return_timestamps=return_timestamps,
                           align_dtype=align_dtype,
                           cross_cache_dtype=cross_cache_dtype,
                           self_cache_dtype=self_cache_dtype,
                           prompt_mask=prompt_mask,
                           sot_position=sot_position,
                           pos_offset=pos_offset,
                           draft_script=draft_script)

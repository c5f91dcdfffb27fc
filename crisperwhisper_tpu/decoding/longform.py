"""Sequential seek-loop generation with temperature fallback.

TPU-native equivalent of the reference's `generate()` orchestration
(hf generation_whisper.py:796-914 seek loop, :981-1127 fallback ladder):
the device work per iteration is ONE jitted batched decode; everything
per-row and data-dependent (segment splitting, seek advancing, fallback
bookkeeping, zlib gates) runs on small host arrays between iterations.

Batch shrink (hf generation_whisper.py:1837-1851 _maybe_reduce_batch) is
implemented as power-of-2 COMPACTION rather than true dynamic shapes:
finished rows are dropped and the live rows re-packed into the next
power-of-2 bucket (see the compaction block further down in `generate`),
so at most log2(B) compiled program shapes exist and XLA never sees a
dynamic batch. Batched output is pinned equal to per-row decoding by
tests/test_batch_shrink.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GenerationOptions, SpecialTokens, WhisperArch
from ..models.whisper import alignment_selector, encode_jit
from ..ops.alignment import attention_to_jump_times
from .fallback import need_fallback
from .greedy import greedy_decode_jit
from .processors import suppress_tokens_mask
from .generate import build_prompt
from .segments import pad_segments_to_max_length, retrieve_segment

INPUT_STRIDE = 2                      # conv stem downsample (SURVEY.md §2.3)


TIME_PRECISION_FEATURES = 0.01        # seconds per mel frame


def _kv_dtype(opts: GenerationOptions):
    if opts.kv_cache_int4:
        return jnp.int4
    return jnp.int8 if opts.kv_cache_int8 else None


def _self_kv_dtype(opts: GenerationOptions):
    if opts.self_kv_cache_int4:
        return jnp.int4
    return jnp.int8 if opts.self_kv_cache_int8 else None


@dataclass
class GenerateOutput:
    sequences: np.ndarray                       # [B, L] int64 eot-padded
    token_timestamps: np.ndarray | None         # [B, L] f32 seconds
    segments: list[list[dict[str, Any]]]        # per item


def _decode_window(params, arch, specials, opts, segment_features,
                   prompt, max_new, suppress, begin_suppress, align_sel,
                   temperature, rng, dtw_frames, prompt_mask=None,
                   sot_position: int = 0, assistant=None, pos_offset=None):
    """One batched decode of 30 s windows + on-device DTW. Returns host
    arrays: sequences, num_generated, avg_logprob_or_score, no_speech,
    jump_times.

    Dispatch matches generate_with_fallback (:1013-1016): beam search only
    at temperature 0; any sampling temperature forces num_beams=1. With
    beams, the returned score is sequences_scores (already
    length-normalized) — the quantity _need_fallback consumes (:1266)."""
    encoder_out = encode_jit(params, arch, segment_features)
    pos_off_j = (jnp.asarray(pos_offset, jnp.int32)
                 if pos_offset is not None else None)
    use_beams = opts.num_beams > 1 and temperature == 0.0
    # assisted runs at ANY batch size (per-row cache positions; beyond
    # the reference's batch-1 assisted generation)
    use_assisted = (assistant is not None and not use_beams
                    and temperature == 0.0)
    if use_assisted:
        # speculative path: the draft proposes, the main model verifies a
        # whole window per forward (hf assistant_model analog — exactness
        # vs greedy is test-pinned, so fallback gates see identical
        # tokens/scores). assistant="prompt_lookup" uses the draft-free
        # n-gram candidate generator instead of a model (hf
        # prompt_lookup_num_tokens analog).
        from .assisted import assisted_decode_jit
        if assistant == "prompt_lookup":
            draft_params = draft_arch = draft_enc = None
        else:
            draft_params, draft_arch = assistant
            if "encoder" in draft_params:
                draft_enc = encode_jit(draft_params, draft_arch,
                                       segment_features)
            else:
                # layer-truncated SELF-draft (assisted.make_self_draft):
                # the draft's cross-attention was trained against the
                # main encoder states — share them, no second encoder run
                draft_enc = encoder_out
        res = assisted_decode_jit(
            params, arch, draft_params, draft_arch, specials, opts,
            encoder_out, draft_enc, jnp.asarray(prompt), max_new,
            opts.assistant_spec_len, suppress_mask=suppress,
            begin_suppress_mask=begin_suppress, align_sel=align_sel,
            return_timestamps=opts.return_timestamps,
            cross_cache_dtype=_kv_dtype(opts),
            self_cache_dtype=_self_kv_dtype(opts),
            prompt_mask=(jnp.asarray(prompt_mask)
                         if prompt_mask is not None else None),
            sot_position=sot_position, pos_offset=pos_off_j)
        score_dev = res.sum_logprobs
        is_normalized = False
    elif use_beams:
        from .beam import beam_decode_jit
        res = beam_decode_jit(
            params, arch, specials, opts, encoder_out, jnp.asarray(prompt),
            max_new, opts.num_beams, suppress_mask=suppress,
            begin_suppress_mask=begin_suppress, align_sel=align_sel,
            return_timestamps=opts.return_timestamps,
            prompt_mask=(jnp.asarray(prompt_mask)
                         if prompt_mask is not None else None),
            cross_cache_dtype=_kv_dtype(opts),
            self_cache_dtype=_self_kv_dtype(opts),
            sot_position=sot_position, pos_offset=pos_off_j)
        score_dev = res.sequences_scores
        is_normalized = True
    else:
        res = greedy_decode_jit(
            params, arch, specials, opts, encoder_out, jnp.asarray(prompt),
            max_new, suppress_mask=suppress,
            begin_suppress_mask=begin_suppress,
            align_sel=align_sel, return_timestamps=opts.return_timestamps,
            temperature=temperature, rng=rng,
            prompt_mask=(jnp.asarray(prompt_mask)
                         if prompt_mask is not None else None),
            cross_cache_dtype=_kv_dtype(opts),
            self_cache_dtype=_self_kv_dtype(opts),
            sot_position=sot_position, pos_offset=pos_off_j)
        score_dev = res.sum_logprobs
        is_normalized = False
    # --- single overlapped readback ---------------------------------
    # Every per-window output crosses device->host in ONE device_get:
    # jax issues copy_to_host_async for all leaves before blocking, so
    # the five transfers overlap instead of paying five serial
    # dispatch+sync round trips (the round-5 pipeline probe attributed
    # ~3 s/call of residual latency to host round-trips on a
    # slow-readback link; on local PCIe this still removes 4 sync
    # points per window batch).
    jumps_dev = None
    crop = None
    if align_sel is not None:
        n_tokens = jnp.maximum(res.num_generated - 1, 0)
        # full-width rows (every non-final chunk) take the fused Pallas
        # prep kernel. A batch with SOME cropped rows (one final chunk in
        # a 96-chunk group is typical) used to demote the WHOLE batch to
        # the XLA prep — ~2 s vs 0.07 s at B=96 (round-5 chip probe).
        # Now: fused prep runs for all rows, and only the cropped rows
        # are recomputed exactly on the XLA path at a small power-of-2
        # bucket (static shapes; per-row results identical to before).
        full_mask = (np.asarray(dtw_frames) == arch.max_source_positions)
        dtw_j = jnp.asarray(dtw_frames, jnp.int32)
        probs_f32 = res.align_probs.astype(jnp.float32)
        if full_mask.all() or not full_mask.any():
            jumps_dev = attention_to_jump_times(
                probs_f32, opts.median_filter_width, n_tokens, dtw_j,
                full_frames=bool(full_mask.all()))
        else:
            jumps_dev = attention_to_jump_times(
                probs_f32, opts.median_filter_width, n_tokens, dtw_j,
                full_frames=True)
            crop = np.nonzero(~full_mask)[0]
            bucket = 1 << max(len(crop) - 1, 0).bit_length()
            rows_c = np.concatenate([crop, np.repeat(crop[:1],
                                                     bucket - len(crop))])
            jumps_dev = (jumps_dev, attention_to_jump_times(
                probs_f32[rows_c], opts.median_filter_width,
                n_tokens[rows_c], dtw_j[rows_c], full_frames=False))
    seqs, ngen, score, no_sp, jumps = jax.device_get(
        (res.sequences, res.num_generated, score_dev,
         res.no_speech_probs, jumps_dev))
    jump_times = None
    if jumps is not None:
        if crop is not None:                  # mixed full/cropped batch
            jumps, jumps_c = np.array(jumps[0]), jumps[1]
            jumps[crop] = jumps_c[:len(crop)]
        jump_times = jumps.astype(np.float32) * opts.time_precision
    return seqs, ngen, score, is_normalized, no_sp, jump_times


def generate(params: Any, arch: WhisperArch, specials: SpecialTokens,
             opts: GenerationOptions, input_features: np.ndarray,
             num_frames: np.ndarray | None = None,
             max_frames: np.ndarray | None = None,
             language_token: int | None = None,
             task_token: int | None = None,
             detect_language_first: bool = False,
             rng: jax.Array | None = None,
             monitor_progress: Any | None = None,
             assistant: tuple[Any, WhisperArch] | str | None = None,
             batch_sharding: Any | None = None
             ) -> GenerateOutput:
    """Transcribe batched (possibly >30 s) mel features.

    input_features: [B, n_mels, total_frames] f32.
    num_frames: [B] true (unpadded) frame counts — used ONLY to crop the
      DTW key axis (the reference's attention-mask-derived
      generation_config.num_frames, hf generation_whisper.py:1697-1705).
    max_frames: [B] per-row seek bound; defaults to total_frames (the
      reference's _retrieve_max_frames_and_seek: attention-mask bound for
      batched long-form, full window for short-form, :1782-1795).
    assistant: optional (draft_params, draft_arch) pair — the reference's
      generate(assistant_model=...) analog — or the string
      "prompt_lookup" for the draft-free n-gram candidate generator (hf
      generate(prompt_lookup_num_tokens=...) analog). Greedy windows run
      the speculative draft-and-verify path; output is exactness-pinned
      to plain greedy, so fallback gating is unaffected.
    batch_sharding: optional NamedSharding over a ("data", ...) mesh —
      each 30 s window batch is device_put with it before encode/decode
      so the whole compute path runs data-parallel (multi-chip pipeline
      serving). Batches whose row count does not divide the data axis
      (seek-loop compaction buckets) fall back to the default placement.
    """
    # Features may arrive as a DEVICE array (the chunked pipeline's mel
    # frontend runs on device) and STAY on device: the seek loop's
    # per-row windows are sliced with an on-device gather + dynamic-slice
    # windower instead of the host. The old eager np.asarray cost a
    # [B, n_mels, 3000] device->host readback per batch (147 MB at
    # B=96/128 mels) plus re-upload of every window — on slow-readback
    # links that is catastrophic (measured: RESOURCE_EXHAUSTED through
    # the product pipeline on the dev tunnel; round-5 finding), and on
    # any hardware it is two pointless PCIe crossings per batch.
    feats_dev = input_features
    b, n_mels, total_frames = feats_dev.shape
    num_segment_frames = INPUT_STRIDE * arch.max_source_positions
    _feats_pad: list[Any] = [None]

    def _device_window(rows: np.ndarray, seeks: np.ndarray,
                       lengths: np.ndarray) -> jax.Array:
        """[len(rows), n_mels, num_segment_frames] window per row, sliced
        on device: feats right-padded once with a zero window so every
        dynamic_slice is in-bounds; positions >= lengths[j] masked to 0
        (rows bounded by max_frames must not attend past it)."""
        if _feats_pad[0] is None:
            _feats_pad[0] = jnp.pad(
                jnp.asarray(feats_dev),
                ((0, 0), (0, 0), (0, num_segment_frames)))
        fp = _feats_pad[0][jnp.asarray(rows)]
        win = jax.vmap(lambda f, s: jax.lax.dynamic_slice(
            f, (0, s), (n_mels, num_segment_frames)))(
                fp, jnp.asarray(seeks, jnp.int32))
        mask = (jnp.arange(num_segment_frames)[None, :]
                < jnp.asarray(lengths)[:, None])
        return win * mask[:, None, :].astype(win.dtype)

    def _put_batch(x):
        if (batch_sharding is not None
                and x.shape[0] % batch_sharding.mesh.shape["data"] == 0):
            return jax.device_put(x, batch_sharding)
        if isinstance(x, np.ndarray):
            return jnp.asarray(np.ascontiguousarray(x))
        return x
    max_frames = (np.asarray(max_frames, np.int64) if max_frames is not None
                  else np.full((b,), total_frames, np.int64))
    num_frames = (np.asarray(num_frames, np.int64) if num_frames is not None
                  else None)
    seek = np.zeros((b,), np.int64)

    if detect_language_first and language_token is None:
        # one batched detection on the first 30 s window per row
        # (hf _retrieve_init_tokens :1584 detects once, not per seek)
        from .language import detect_language_jit
        if (total_frames == num_segment_frames
                and bool(np.all(max_frames >= num_segment_frames))):
            first: Any = feats_dev          # already one full window/row
        else:
            first = _device_window(
                np.arange(b), np.zeros((b,), np.int64),
                np.minimum(np.minimum(max_frames, num_segment_frames),
                           total_frames))
        lang_ids = np.asarray(detect_language_jit(
            params, arch, specials, encode_jit(params, arch,
                                               _put_batch(first))))
        init_tokens = np.stack([
            np.concatenate([
                np.asarray([specials.sot, int(lang_ids[i]),
                            task_token if task_token is not None
                            else specials.transcribe], np.int32),
                (np.asarray([], np.int32) if opts.return_timestamps
                 else np.asarray([specials.no_timestamps], np.int32))])
            for i in range(b)])
    else:
        init_tokens = build_prompt(
            specials, b, language_token=language_token,
            task_token=task_token,
            return_timestamps=opts.return_timestamps,
            forced_tokens=opts.forced_tokens)
    conditioning = bool(opts.condition_on_prev_tokens)
    # --- user prompt injection (hf generate(prompt_ids=...),
    # generation_whisper.py:1875-1943 + _prepare_segments :1130-1139) ---
    prompt_ids = (np.asarray(opts.prompt_ids, np.int32)
                  if opts.prompt_ids is not None else None)
    if opts.prompt_condition_type not in ("first-segment", "all-segments"):
        raise ValueError(
            f"prompt_condition_type={opts.prompt_condition_type!r} does not "
            "exist; use 'first-segment' or 'all-segments'")
    if (prompt_ids is not None
            and opts.prompt_condition_type == "all-segments"
            and not conditioning):
        raise ValueError(
            "Make sure to set condition_on_prev_tokens=True when setting "
            "prompt_condition_type='all-segments'.")
    # When conditioning applies, the prompt region is a STATIC cut_off+1
    # slot left-padded window; iterations without prev context use the
    # bare init tokens, exactly like the reference (:1900 condition). Two
    # prompt widths => two compiled decode programs, both reused every
    # window. opts.condition_mode picks the positional semantics inside
    # that fixed window: "static" = pads consume learned positions (the
    # reference's padding='max_length' static-cache mode, hf
    # _prepare_decoder_input_ids :1913-1921); "dynamic" = mask-aware
    # positions (the reference's DEFAULT padding='longest' +
    # decoder_position_ids = cumsum(mask)-1) via a per-row pos_offset on
    # the embedding gather — no dynamic shapes either way.
    cut_off = arch.max_target_positions // 2 - 1
    # the conditioned prefix begins with <|startofprev|> — or, in
    # all-segments prompt mode, with the FULL user prompt — so the static
    # window widens by the bos length (hf _pad_to_max_length never trims
    # the bos_token_tensor)
    cond_bos = (prompt_ids.astype(np.int64)
                if (prompt_ids is not None
                    and opts.prompt_condition_type == "all-segments")
                else np.asarray([specials.sot_prev], np.int64))
    prev_width = (cut_off + len(cond_bos)) if conditioning else 0
    # rows start out willing to condition (hf generation_whisper.py:1316);
    # window 1 still decodes bare unless segments were prompt-seeded below
    do_condition = np.full((b,), conditioning, bool)

    want_ts = opts.return_token_timestamps and len(opts.alignment_heads) > 0
    suppress = (jnp.asarray(suppress_tokens_mask(arch.vocab_size,
                                                 opts.suppress_tokens))
                if opts.suppress_tokens else None)
    begin_suppress = (
        jnp.asarray(suppress_tokens_mask(arch.vocab_size,
                                         opts.begin_suppress_tokens))
        if opts.begin_suppress_tokens else None)
    align_sel = (jnp.asarray(alignment_selector(arch, opts.alignment_heads))
                 if want_ts else None)

    rng = rng if rng is not None else jax.random.PRNGKey(opts.prompt_seed)
    current_segments: list[list[dict[str, Any]]] = [[] for _ in range(b)]
    prompt_seeded = False
    if prompt_ids is not None and opts.prompt_condition_type == \
            "first-segment":
        # the prompt seeds the previous-context buffer as a synthetic
        # first "segment" (leading <|startofprev|> stripped — the
        # conditioned prefix re-adds it as the bos); trimmed back out of
        # the returned segments below (hf :920 final_segments)
        seed = (prompt_ids[1:] if len(prompt_ids) and
                prompt_ids[0] == specials.sot_prev else prompt_ids)
        current_segments = [[{"tokens": seed.astype(np.int64),
                              "token_timestamps":
                                  np.zeros(len(seed), np.float32)}]
                            for _ in range(b)]
        prompt_seeded = True

    while (seek < max_frames).any():
        if monitor_progress is not None:
            # per-iteration (seek, max_frames) pairs — the reference's
            # monitor_progress callback (hf generation_whisper.py:796-798)
            monitor_progress(np.stack([seek, max_frames], axis=1))
        active = seek < max_frames
        time_offset = seek.astype(np.float64) * opts.time_precision \
            / INPUT_STRIDE
        seek_num_frames = np.minimum(max_frames - seek, num_segment_frames)

        # --- dynamic batch shrink (hf _maybe_reduce_batch :1837-1851) ---
        # finished rows are compacted out and the window decodes a
        # power-of-2 BUCKET of the active rows: static shapes bound the
        # number of compiled programs to log2(B) sizes while long-tail
        # rows stop paying for finished ones. Filler slots (bucket >
        # n_active) repeat the first active row and are discarded.
        idx = np.nonzero(active)[0]
        nact = len(idx)
        bucket = 1
        while bucket < nact:
            bucket *= 2
        bucket = min(bucket, b)
        rows = np.concatenate([idx, np.repeat(idx[:1], bucket - nact)])

        # per-row current window. FAST PATH (every chunked-pipeline call):
        # the input is exactly one full window per row and all rows are
        # at seek 0 — the whole feature batch IS the segment, zero work.
        # Otherwise the on-device windower gathers + dynamic-slices each
        # row's window; features never visit the host either way.
        if (total_frames == num_segment_frames and nact == b
                and not seek.any()
                and bool(np.all(seek_num_frames == num_segment_frames))):
            # nact == b and seek == 0 imply rows == arange(b): the batch
            # maps 1:1 onto the feature rows
            segment: Any = feats_dev
        else:
            segment = _device_window(rows, seek[rows],
                                     seek_num_frames[rows])

        if num_frames is not None:
            dtw_frames = np.minimum((num_frames - seek) // 2,
                                    arch.max_source_positions)
            dtw_frames = np.maximum(dtw_frames, 1)
        else:
            dtw_frames = np.full((b,), arch.max_source_positions, np.int64)
        dtw_frames_bucket = dtw_frames[rows]

        # --- conditioned decoder prompt (hf _prepare_decoder_input_ids) ---
        iter_prompt = init_tokens[rows]
        iter_mask = None
        iter_pos_offset = None
        if (conditioning and do_condition[rows].any()
                and any(len(current_segments[i]) for i in rows)):
            from .segments import pad_segments_to_max_length as _pad
            prev_tok = _pad(
                [current_segments[i] if do_condition[i] else []
                 for i in rows],
                specials.eot, padding_side="left", cut_off_length=cut_off,
                bos_token=cond_bos,
                skip_ending_double_timestamps=True,
                timestamp_begin=specials.timestamp_begin,
                fixed_total_length=prev_width)
            iter_prompt = np.concatenate(
                [prev_tok.astype(np.int32), iter_prompt], axis=1)
            iter_mask = np.concatenate(
                [prev_tok != specials.eot,
                 np.ones_like(init_tokens[rows], bool)], axis=1)
            if opts.condition_mode == "dynamic":
                # mask-aware positions (HF padding='longest' default:
                # decoder_position_ids = cumsum(mask)-1): left-pad slots
                # consume no learned positions, so real tokens sit at
                # 0..len-1. Pads are CONTIGUOUS on the left, so the
                # per-row offset is just the pad count; shapes stay
                # static — only the pos_emb gather shifts.
                iter_pos_offset = (~iter_mask).sum(axis=1).astype(np.int32)
        elif prompt_ids is not None:
            # non-conditioned prompt injection: the raw prompt prefixes
            # the init tokens with NO attention mask — prompt slots are
            # attended and consume positions (hf :1932-1936)
            iter_prompt = np.concatenate(
                [np.tile(prompt_ids, (len(rows), 1)), iter_prompt], axis=1)
        p = iter_prompt.shape[1]
        max_new = min(opts.max_new_tokens, arch.max_target_positions - p)
        # the SOT slot inside the (possibly prev-conditioned) prompt — the
        # position whose raw logits carry P(<|nospeech|>)
        sot_position = p - init_tokens.shape[1]

        # --- temperature fallback ladder (generate_with_fallback) ---
        resolved = np.zeros((bucket,), bool)
        resolved[nact:] = True                         # filler slots
        results: list[Any] = [None] * bucket
        for t_idx, temperature in enumerate(opts.temperatures):
            rng, sub = jax.random.split(rng)
            seqs, ngen, score, normalized, no_sp, jt = _decode_window(
                params, arch, specials, opts, _put_batch(segment),
                iter_prompt, max_new, suppress, begin_suppress, align_sel,
                float(temperature), sub, dtw_frames_bucket,
                prompt_mask=iter_mask, sot_position=sot_position,
                assistant=assistant, pos_offset=iter_pos_offset)
            is_last = t_idx == len(opts.temperatures) - 1
            for j in range(nact):
                if resolved[j]:
                    continue
                i = rows[j]
                g = int(ngen[j])
                seq_with_eos = seqs[j, p:p + g]
                avg_lp = (score[j] if normalized
                          else (score[j] / g) if g > 0 else 0.0)
                nf, skip = need_fallback(seq_with_eos, avg_lp, no_sp[j],
                                         arch.vocab_size, opts)
                if not nf or is_last:
                    results[j] = (seq_with_eos, jt[j] if jt is not None
                                  else None, skip)
                    resolved[j] = True
                    # condition the NEXT window only on low-temperature
                    # results (generate_with_fallback :1100-1103)
                    do_condition[i] = conditioning and temperature < 0.5
            if resolved.all():
                break

        # --- segment extraction & seek advance ---
        for j in range(nact):
            i = rows[j]
            seq_with_eos, jt_row, skip = results[j]
            if skip:
                seek[i] += int(seek_num_frames[i])
                continue
            seq = seq_with_eos
            if len(seq) > 0 and seq[-1] == specials.eot:
                seq = seq[:-1]
            tok_ts = jt_row[:len(seq)] if jt_row is not None else None
            if tok_ts is not None and len(tok_ts) < len(seq):
                tok_ts = np.pad(tok_ts, (0, len(seq) - len(tok_ts)),
                                mode="edge")
            segs, offset = retrieve_segment(
                seq, tok_ts, float(time_offset[i]), specials.timestamp_begin,
                int(seek_num_frames[i]), opts.time_precision,
                TIME_PRECISION_FEATURES, INPUT_STRIDE)
            seek[i] += offset
            current_segments[i] += segs

        if opts.force_unique_generate_call:
            # exactly one seek pass, remainder windows dropped
            # (hf generation_whisper.py:913)
            break

    # first-segment prompt mode: the seeded prompt "segment" is context,
    # not output — trim it before padding (hf :918-922 final_segments)
    final_segments = ([segs[1:] for segs in current_segments]
                      if prompt_seeded else current_segments)
    if want_ts:
        sequences, token_ts = pad_segments_to_max_length(
            final_segments, specials.eot, return_token_timestamps=True)
    else:
        sequences = pad_segments_to_max_length(final_segments,
                                               specials.eot)
        token_ts = None
    return GenerateOutput(sequences=sequences, token_timestamps=token_ts,
                          segments=final_segments)

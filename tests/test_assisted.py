"""Assisted (speculative) decoding exactness: for ANY draft model, the
greedy assisted output must equal plain greedy decode — sequences,
logprob accumulation, no-speech capture, and alignment rows. Matches the
reference's assisted-generation contract (hf generation/utils.py
candidate-generator path; WhisperForCausalLM as assistant,
modeling_whisper.py:1359)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import assisted_decode_jit, greedy_decode_jit
from crisperwhisper_tpu.decoding.processors import suppress_tokens_mask
from crisperwhisper_tpu.models import alignment_selector, encode, init_params
from helpers import TINY_SPECIALS, rand_mel, tiny_arch

MAX_NEW = 14


def _setup(seed_main=0, seed_draft=0):
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(seed_main))
    draft = (params if seed_draft == seed_main
             else init_params(arch, jax.random.PRNGKey(seed_draft)))
    mel = rand_mel(batch=1, seed=5)
    enc = encode(params, arch, jnp.asarray(mel))
    denc = enc if seed_draft == seed_main else encode(draft, arch,
                                                      jnp.asarray(mel))
    opts = GenerationOptions(max_initial_timestamp_index=50)
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 2))))
    return arch, params, draft, enc, denc, opts, sel


def _compare(ref, got, align_atol=1e-5):
    np.testing.assert_array_equal(np.asarray(got.sequences),
                                  np.asarray(ref.sequences))
    np.testing.assert_array_equal(np.asarray(got.num_generated),
                                  np.asarray(ref.num_generated))
    np.testing.assert_allclose(np.asarray(got.sum_logprobs),
                               np.asarray(ref.sum_logprobs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.no_speech_probs),
                               np.asarray(ref.no_speech_probs), atol=1e-5)
    # alignment rows: compare each row's recorded region
    # (num_generated - 1 rows)
    for r, g in enumerate(np.asarray(ref.num_generated)):
        rows = max(int(g) - 1, 0)
        np.testing.assert_allclose(
            np.asarray(got.align_probs)[r, :, :rows],
            np.asarray(ref.align_probs)[r, :, :rows], atol=align_atol)


@pytest.mark.parametrize("spec_len", [1, 2, 4, 7])
def test_assisted_equals_greedy_accepting_draft(spec_len):
    """Draft == main: near-total acceptance; output must be identical."""
    arch, params, draft, enc, denc, opts, sel = _setup()
    prompt = jnp.full((1, 1), TINY_SPECIALS.sot, jnp.int32)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            MAX_NEW, align_sel=sel)
    got = assisted_decode_jit(params, arch, draft, arch, TINY_SPECIALS,
                              opts, enc, denc, prompt, MAX_NEW,
                              spec_len=spec_len, align_sel=sel)
    _compare(ref, got)


def test_assisted_equals_greedy_garbage_draft():
    """Disagreeing draft (different random init): acceptance collapses to
    ~0 but the committed output must STILL equal plain greedy."""
    arch, params, draft, enc, denc, opts, sel = _setup(seed_draft=7)
    prompt = jnp.full((1, 1), TINY_SPECIALS.sot, jnp.int32)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            MAX_NEW, align_sel=sel)
    got = assisted_decode_jit(params, arch, draft, arch, TINY_SPECIALS,
                              opts, enc, denc, prompt, MAX_NEW,
                              spec_len=4, align_sel=sel)
    _compare(ref, got)


def test_assisted_multi_token_prompt_and_suppress():
    """Longer forced prompt + suppress mask (the serving processor set)."""
    arch, params, draft, enc, denc, opts, sel = _setup(seed_draft=3)
    sp = TINY_SPECIALS
    prompt = jnp.asarray([[sp.sot, sp.sot + 1, sp.no_timestamps - 1]],
                         jnp.int32)
    supp = jnp.asarray(suppress_tokens_mask(arch.vocab_size, (17, 23)))
    ref = greedy_decode_jit(params, arch, sp, opts, enc, prompt, MAX_NEW,
                            suppress_mask=supp, align_sel=sel,
                            sot_position=0)
    got = assisted_decode_jit(params, arch, draft, arch, sp, opts, enc,
                              denc, prompt, MAX_NEW, spec_len=3,
                              suppress_mask=supp, align_sel=sel,
                              sot_position=0)
    _compare(ref, got)


@pytest.mark.parametrize("seed_draft", [0, 7])
def test_assisted_pos_offset_equals_greedy(seed_draft):
    """Dynamic condition mode (per-row pos_offset on the learned-position
    gather): assisted output must still equal plain greedy with the SAME
    left-padded prompt + mask + offsets — the exactness contract covers
    the draft chain, the verify block, and the prefill."""
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    draft = (params if seed_draft == 0
             else init_params(arch, jax.random.PRNGKey(seed_draft)))
    mel = rand_mel(batch=2, seed=13)
    enc = encode(params, arch, jnp.asarray(mel))
    denc = enc if seed_draft == 0 else encode(draft, arch, jnp.asarray(mel))
    opts = GenerationOptions(max_initial_timestamp_index=50)
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 2))))
    sp = TINY_SPECIALS
    # left-padded conditioned prompts with ragged pad counts (eot pads)
    prompt = jnp.asarray(
        [[sp.eot, sp.eot, sp.sot_prev, sp.sot],
         [sp.eot, sp.sot_prev, sp.no_timestamps - 2, sp.sot]], jnp.int32)
    mask = jnp.asarray([[False, False, True, True],
                        [False, True, True, True]])
    pos_off = jnp.asarray([2, 1], jnp.int32)
    ref = greedy_decode_jit(params, arch, sp, opts, enc, prompt, MAX_NEW,
                            align_sel=sel, prompt_mask=mask,
                            sot_position=3, pos_offset=pos_off)
    got = assisted_decode_jit(params, arch, draft, arch, sp, opts, enc,
                              denc, prompt, MAX_NEW, spec_len=3,
                              align_sel=sel, prompt_mask=mask,
                              sot_position=3, pos_offset=pos_off)
    _compare(ref, got, align_atol=5e-5)
    # offset of zeros must be byte-identical to no offset at all
    ref0 = greedy_decode_jit(params, arch, sp, opts, enc, prompt, MAX_NEW,
                             align_sel=sel, prompt_mask=mask,
                             sot_position=3)
    refz = greedy_decode_jit(params, arch, sp, opts, enc, prompt, MAX_NEW,
                             align_sel=sel, prompt_mask=mask,
                             sot_position=3,
                             pos_offset=jnp.zeros((2,), jnp.int32))
    _compare(ref0, refz)
    # and a real offset must CHANGE the decode (positions matter)
    assert (np.asarray(ref.sequences) != np.asarray(ref0.sequences)).any()


@pytest.mark.parametrize("seed_draft,spec_len", [(0, 3), (7, 4)])
def test_assisted_batched_equals_greedy(seed_draft, spec_len):
    """BATCHED speculation (beyond the reference's batch-1 assisted
    generation): rows with different audio accept independently — ragged
    committed lengths, per-row cache positions — and every row's output
    must equal plain batched greedy."""
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    draft = (params if seed_draft == 0
             else init_params(arch, jax.random.PRNGKey(seed_draft)))
    mel = rand_mel(batch=3, seed=13)
    enc = encode(params, arch, jnp.asarray(mel))
    denc = enc if seed_draft == 0 else encode(draft, arch, jnp.asarray(mel))
    opts = GenerationOptions(max_initial_timestamp_index=50)
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 2))))
    prompt = jnp.full((3, 1), TINY_SPECIALS.sot, jnp.int32)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            MAX_NEW, align_sel=sel)
    got = assisted_decode_jit(params, arch, draft, arch, TINY_SPECIALS,
                              opts, enc, denc, prompt, MAX_NEW,
                              spec_len=spec_len, align_sel=sel)
    _compare(ref, got, align_atol=5e-5)


def test_generate_with_assistant_equals_plain():
    """generate(assistant=...) on a single-row multi-window audio must
    produce the same sequences/segments as plain generate (the assisted
    path is exactness-pinned, so the seek loop sees identical windows)."""
    from crisperwhisper_tpu.decoding import generate

    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    draft = init_params(arch, jax.random.PRNGKey(9))
    opts = GenerationOptions(max_initial_timestamp_index=50,
                             max_new_tokens=20, temperatures=(0.0,),
                             compression_ratio_threshold=None,
                             logprob_threshold=None,
                             no_speech_threshold=None,
                             assistant_spec_len=3)
    frames = 1100
    mel = rand_mel(batch=1, seed=41, frames=frames)
    lens = np.array([frames])
    plain = generate(params, arch, TINY_SPECIALS, opts, jnp.asarray(mel),
                     num_frames=lens, max_frames=lens)
    assisted = generate(params, arch, TINY_SPECIALS, opts, jnp.asarray(mel),
                        num_frames=lens, max_frames=lens,
                        assistant=(draft, arch))
    np.testing.assert_array_equal(assisted.sequences, plain.sequences)
    assert len(assisted.segments[0]) == len(plain.segments[0])


def test_ngram_propose_unit():
    """Crafted buffers: continuation of the first (earliest) match of the
    trailing n-gram, largest n preferred; no match -> fill."""
    from crisperwhisper_tpu.decoding.assisted import ngram_propose
    F = 99
    # row 0: ... 5 6 7 ... 5 6 | frontier; trailing 2-gram (5,6) matched
    #        at i=1 -> continuation 7 8
    # row 1: no repetition -> fill
    toks = jnp.asarray([
        [0, 5, 6, 7, 8, 5, 6, F, F, F],
        [0, 1, 2, 3, 4, 5, 6, F, F, F],
    ], jnp.int32)
    lengths = jnp.asarray([7, 7], jnp.int32)
    drafts = np.asarray(ngram_propose(toks, lengths, 2, ngram_sizes=(2,),
                                      fill=F))
    np.testing.assert_array_equal(drafts[0], [7, 8])
    np.testing.assert_array_equal(drafts[1], [F, F])
    # larger n wins when it matches: trailing 3-gram (6,7,8) at i=1 ->
    # continuation 9; the 2-gram (7,8) would match the same spot anyway
    toks3 = jnp.asarray([[0, 6, 7, 8, 9, 2, 6, 7, 8, F, F]], jnp.int32)
    drafts3 = np.asarray(ngram_propose(toks3, jnp.asarray([9]), 2,
                                       ngram_sizes=(3, 2), fill=F))
    np.testing.assert_array_equal(drafts3[0], [9, 2])
    # trailing n-gram must not match ITSELF (frontier exclusion): the
    # only occurrence of (8, 9) is at the frontier -> no match
    toks4 = jnp.asarray([[0, 1, 2, 3, 8, 9, F, F]], jnp.int32)
    drafts4 = np.asarray(ngram_propose(toks4, jnp.asarray([6]), 2,
                                       ngram_sizes=(2,), fill=F))
    np.testing.assert_array_equal(drafts4[0], [F, F])


@pytest.mark.parametrize("batch", [1, 2])
def test_prompt_lookup_equals_greedy(batch):
    """Draft-free prompt-lookup speculation must STILL equal greedy
    exactly (the lookup only changes which candidates get verified)."""
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    mel = rand_mel(batch=batch, seed=21)
    enc = encode(params, arch, jnp.asarray(mel))
    opts = GenerationOptions(max_initial_timestamp_index=50)
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 2))))
    prompt = jnp.full((batch, 1), TINY_SPECIALS.sot, jnp.int32)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            MAX_NEW, align_sel=sel)
    got = assisted_decode_jit(params, arch, None, None, TINY_SPECIALS,
                              opts, enc, None, prompt, MAX_NEW,
                              spec_len=3, align_sel=sel)
    _compare(ref, got, align_atol=5e-5)


def test_generate_prompt_lookup_equals_plain():
    from crisperwhisper_tpu.decoding import generate

    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    opts = GenerationOptions(max_initial_timestamp_index=50,
                             max_new_tokens=12, temperatures=(0.0,),
                             compression_ratio_threshold=None,
                             logprob_threshold=None,
                             no_speech_threshold=None,
                             assistant_spec_len=3)
    mel = rand_mel(batch=1, seed=31)
    lens = np.array([500])
    plain = generate(params, arch, TINY_SPECIALS, opts, jnp.asarray(mel),
                     num_frames=lens, max_frames=lens)
    looked = generate(params, arch, TINY_SPECIALS, opts, jnp.asarray(mel),
                      num_frames=lens, max_frames=lens,
                      assistant="prompt_lookup")
    np.testing.assert_array_equal(looked.sequences, plain.sequences)


def test_ngram_propose_fuzz_vs_python_reference():
    """Randomized differential: the vectorized matcher must agree with a
    direct python implementation of the lookup rule."""
    from crisperwhisper_tpu.decoding.assisted import ngram_propose

    def py_ref(row, length, s, sizes, fill):
        for n in sizes:
            if length < n + 1:
                continue
            tgt = row[length - n:length]
            for i in range(0, length - n):
                if row[i:i + n] == tgt:
                    cand = row[i + n:i + n + s]
                    cand = cand + [row[-1]] * (s - len(cand))
                    return cand[:s]
        return [fill] * s

    rng = np.random.default_rng(0)
    F, TT, S = 77, 24, 3
    for trial in range(40):
        b = int(rng.integers(1, 4))
        vocab = int(rng.integers(3, 7))     # small vocab => many repeats
        toks = rng.integers(0, vocab, (b, TT)).astype(np.int32)
        lengths = rng.integers(1, TT - S + 1, (b,)).astype(np.int32)
        got = np.asarray(ngram_propose(jnp.asarray(toks),
                                       jnp.asarray(lengths), S,
                                       ngram_sizes=(3, 2), fill=F))
        for r in range(b):
            want = py_ref(list(toks[r]), int(lengths[r]), S, (3, 2), F)
            np.testing.assert_array_equal(got[r], want,
                                          err_msg=f"trial {trial} row {r}")


def test_scripted_draft_exactness_and_acceptance():
    """Forced-acceptance harness (scripts/spec_accept_bench.py machinery):
    a draft_script equal to the model's own greedy output is fully
    accepted; a corrupted script still yields exactly the greedy output
    (rejected positions fall back to the verified token)."""
    arch, params, _, enc, _, opts, sel = _setup()
    prompt = jnp.full((1, 1), TINY_SPECIALS.sot, jnp.int32)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            MAX_NEW, align_sel=sel)
    script = jnp.asarray(ref.sequences, jnp.int32)        # acceptance 1.0
    got = assisted_decode_jit(params, arch, None, None, TINY_SPECIALS,
                              opts, enc, None, prompt, MAX_NEW,
                              spec_len=4, align_sel=sel,
                              draft_script=script)
    _compare(ref, got)
    # corrupt every third scripted position: exactness must hold
    bad = np.asarray(script).copy()
    bad[:, ::3] = (bad[:, ::3] + 11) % arch.vocab_size
    got2 = assisted_decode_jit(params, arch, None, None, TINY_SPECIALS,
                               opts, enc, None, prompt, MAX_NEW,
                               spec_len=4, align_sel=sel,
                               draft_script=jnp.asarray(bad))
    _compare(ref, got2)


def test_self_draft_truncated_layers_equals_greedy():
    """Layer-truncated SELF-draft (make_self_draft): the first K decoder
    layers of the main model propose against the MAIN encoder output;
    committed output must equal plain greedy."""
    from crisperwhisper_tpu.decoding.assisted import make_self_draft

    arch, params, _, enc, _, opts, sel = _setup()
    draft_params, draft_arch = make_self_draft(params, arch, 2)
    assert "encoder" not in draft_params
    assert draft_arch.decoder_layers == 2
    prompt = jnp.full((1, 1), TINY_SPECIALS.sot, jnp.int32)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            MAX_NEW, align_sel=sel)
    got = assisted_decode_jit(params, arch, draft_params, draft_arch,
                              TINY_SPECIALS, opts, enc, enc, prompt,
                              MAX_NEW, spec_len=4, align_sel=sel)
    _compare(ref, got)


def test_pipeline_speculation_under_seek_and_fallback(tmp_path):
    """Pipeline-level contract: a full ASRPipeline with a self-draft
    assistant — seek loop, temperature-fallback gates ON, stitcher, word
    timestamps — produces byte-identical transcripts to the plain
    pipeline (the fallback ladder sees identical tokens/scores because
    the assisted path is exactness-pinned)."""
    from vocab_fixture import build_model_vocab_dir, our_tokenizer

    from crisperwhisper_tpu.config import FeatureConfig, PipelineOptions
    from crisperwhisper_tpu.decoding.assisted import make_self_draft
    from crisperwhisper_tpu.pipeline.asr import ASRPipeline

    vocab_dir = str(tmp_path / "vocab")
    build_model_vocab_dir(vocab_dir)
    tok = our_tokenizer(vocab_dir)
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    opts = GenerationOptions(max_initial_timestamp_index=50,
                             max_new_tokens=16,
                             temperatures=(0.0, 0.5),
                             assistant_spec_len=3,
                             alignment_heads=((0, 1), (1, 2)))
    popts = PipelineOptions(chunk_length_s=5.0, batch_size=4,
                            return_timestamps="word")
    feat = FeatureConfig(feature_size=arch.num_mel_bins, chunk_length=5)
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(11 * 16000) * 0.1).astype(np.float32)
    plain = ASRPipeline(params, arch, tok, specials=TINY_SPECIALS,
                        gen_opts=opts, pipe_opts=popts, feat_cfg=feat)(
        {"raw": audio, "sampling_rate": 16000}, return_timestamps="word")
    spec = ASRPipeline(params, arch, tok, specials=TINY_SPECIALS,
                       gen_opts=opts, pipe_opts=popts, feat_cfg=feat,
                       assistant=make_self_draft(params, arch, 2))(
        {"raw": audio, "sampling_rate": 16000}, return_timestamps="word")
    assert spec["text"] == plain["text"]
    assert spec["chunks"] == plain["chunks"]


def test_pipeline_assistant_max_batch_gating(tmp_path, monkeypatch):
    """PipelineOptions.assistant_max_batch routes the assistant only to
    small device batches (the measured TPU crossover: speculation wins at
    batch 1, loses at large batch). Multi-chunk groups above the limit
    must decode plain; a single-chunk request must get the assistant —
    and both must produce transcripts identical to the ungated pipeline
    (the exactness contract makes the gate a pure perf policy)."""
    from vocab_fixture import build_model_vocab_dir, our_tokenizer

    from crisperwhisper_tpu.config import FeatureConfig, PipelineOptions
    from crisperwhisper_tpu.pipeline import asr as asr_mod
    from crisperwhisper_tpu.pipeline.asr import ASRPipeline

    vocab_dir = str(tmp_path / "vocab")
    build_model_vocab_dir(vocab_dir)
    tok = our_tokenizer(vocab_dir)
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    opts = GenerationOptions(max_initial_timestamp_index=50,
                             max_new_tokens=16, temperatures=(0.0,),
                             compression_ratio_threshold=None,
                             logprob_threshold=None,
                             no_speech_threshold=None,
                             assistant_spec_len=3,
                             alignment_heads=((0, 1), (1, 2)))
    feat = FeatureConfig(feature_size=arch.num_mel_bins, chunk_length=5)
    rng = np.random.default_rng(3)
    long_audio = (rng.standard_normal(11 * 16000) * 0.1).astype(np.float32)
    short_audio = long_audio[: 4 * 16000]

    seen: list = []
    real_generate = asr_mod.generate

    def spy(*args, **kwargs):
        seen.append(kwargs.get("assistant"))
        return real_generate(*args, **kwargs)

    monkeypatch.setattr(asr_mod, "generate", spy)

    def run(audio, **popts_kw):
        pipe = ASRPipeline(
            params, arch, tok, specials=TINY_SPECIALS, gen_opts=opts,
            pipe_opts=PipelineOptions(chunk_length_s=5.0, batch_size=2,
                                      return_timestamps="word",
                                      **popts_kw),
            feat_cfg=feat, assistant="prompt_lookup")
        return pipe({"raw": audio, "sampling_rate": 16000},
                    return_timestamps="word")

    # multi-chunk: groups compile at batch 2 > limit -> plain decode
    seen.clear()
    gated_long = run(long_audio, assistant_max_batch=1)
    assert seen and all(a is None for a in seen)
    # single chunk: batch 1 <= limit -> assistant engaged
    seen.clear()
    gated_short = run(short_audio, assistant_max_batch=1)
    assert seen == ["prompt_lookup"]
    # ungated reference: assistant everywhere; transcripts must match
    seen.clear()
    ref_long = run(long_audio)
    ref_short = run(short_audio)
    assert all(a == "prompt_lookup" for a in seen)
    assert gated_long["text"] == ref_long["text"]
    assert gated_long["chunks"] == ref_long["chunks"]
    assert gated_short["text"] == ref_short["text"]
    assert gated_short["chunks"] == ref_short["chunks"]

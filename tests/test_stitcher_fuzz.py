"""Randomized decode_asr fuzz: arbitrary chunk streams (timestamp pairs,
rollovers, strides, specials, duplicates) must stitch identically to HF."""

import numpy as np
import pytest

from vocab_fixture import build_vocab_dir, hf_tokenizer, our_tokenizer


@pytest.fixture(scope="module")
def toks(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fuzzvocab"))
    build_vocab_dir(path)
    return hf_tokenizer(path), our_tokenizer(path)


def _random_chunk(rng, ours, n_segments, max_t=28.0):
    """Random plausible generate output: timestamp-paired segments with
    occasional single endings and duplicate timestamps."""
    tsb = ours.timestamp_begin
    ids, tts = [], []
    t = round(float(rng.uniform(0, 1.0)), 2)
    for _ in range(n_segments):
        start = t
        n_tok = int(rng.integers(1, 6))
        toks = rng.integers(256, 280, size=n_tok).tolist()
        dur = round(float(rng.uniform(0.1, 3.0)), 2)
        end = min(round(start + dur, 2), max_t)
        ids.append(tsb + int(round(start / 0.02)))
        tts.append(start)
        for k, tok in enumerate(toks):
            ids.append(int(tok))
            tts.append(round(start + (end - start) * (k + 1) / n_tok, 2))
        ids.append(tsb + int(round(end / 0.02)))
        tts.append(end)
        if rng.random() < 0.5:  # paired ending (next segment starts there)
            ids.append(tsb + int(round(end / 0.02)))
            tts.append(end)
        t = min(round(end + float(rng.uniform(0, 0.5)), 2), max_t)
        if t >= max_t:
            break
    return {"tokens": np.asarray([ids]),
            "token_timestamps": np.asarray([tts], np.float64)}


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("mode", [True, "word"])
def test_decode_asr_fuzz(toks, seed, mode):
    from transformers.models.whisper.tokenization_whisper import _decode_asr
    from crisperwhisper_tpu.tokenizer import decode_asr
    hf, ours = toks
    rng = np.random.default_rng(seed)
    n_chunks = int(rng.integers(1, 4))
    outputs = []
    for c in range(n_chunks):
        out = _random_chunk(rng, ours, n_segments=int(rng.integers(1, 5)))
        left = 0.0 if c == 0 else 5.0
        right = 0.0 if c == n_chunks - 1 else 5.0
        out["stride"] = (30.0, left, right)
        outputs.append(out)
    golden = _decode_asr(hf, [dict(o) for o in outputs],
                         return_timestamps=mode, return_language=False,
                         time_precision=0.02)
    got = decode_asr(ours, outputs, return_timestamps=mode,
                     return_language=False, time_precision=0.02)
    assert got == golden

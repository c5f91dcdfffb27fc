"""Evaluation metric tests (WER, segmentation F1/IOU)."""

import numpy as np

from crisperwhisper_tpu.utils.evaluation import (
    SegmentationResult, align_matched_words, chunks_to_words,
    segmentation_scores, word_error_rate)


def test_wer_basics():
    from crisperwhisper_tpu.utils.evaluation import wer
    assert wer(["a b c"], ["a b c"]) == 0.0
    assert wer(["a b c"], ["a x c"]) == 1 / 3
    assert wer(["a b c"], ["a b"]) == 1 / 3
    assert wer(["a b"], ["a b c"]) == 1 / 2
    # with normalizer: fillers dropped on both sides
    from crisperwhisper_tpu.tokenizer.normalizers import \
        EnglishTextNormalizer
    norm = EnglishTextNormalizer({})
    assert wer(["the [UH] cat"], ["the um cat"], normalizer=norm) == 0.0


def test_segmentation_score():
    from crisperwhisper_tpu.utils.evaluation import word_segmentation_score
    ref = [{"text": " hello", "timestamp": (0.0, 0.5)},
           {"text": " world", "timestamp": (0.6, 1.0)}]
    hyp_exact = [dict(x) for x in ref]
    s = word_segmentation_score(ref, hyp_exact, collar=0.05)
    assert s.f1 == 1.0 and s.avg_iou == 1.0
    hyp_shifted = [{"text": " hello", "timestamp": (0.2, 0.7)},
                   {"text": " world", "timestamp": (0.6, 1.01)}]
    s2 = word_segmentation_score(ref, hyp_shifted, collar=0.05)
    assert s2.recall == 0.5 and 0 < s2.avg_iou < 1.0


def test_compute_offsets_matches_hf(tmp_path):
    """decode(output_offsets) segment offsets parity."""
    from vocab_fixture import build_vocab_dir, hf_tokenizer, our_tokenizer
    path = str(tmp_path)
    build_vocab_dir(path)
    hf = hf_tokenizer(path)
    ours = our_tokenizer(path)
    tsb = ours.timestamp_begin
    h = hf(" hello", add_special_tokens=False)["input_ids"]
    w = hf(" world", add_special_tokens=False)["input_ids"]
    ids = [ours.sot, tsb + 0, *h, tsb + 100, tsb + 100, *w, tsb + 200,
           ours.eot]
    golden = hf._compute_offsets(__import__("torch").tensor(ids))
    got = ours.compute_offsets(ids)
    assert len(got) == len(golden)
    for g, o in zip(golden, got):
        assert o["text"] == g["text"]
        assert tuple(o["timestamp"]) == tuple(g["timestamp"])


# --- alignment-based API ---


def test_wer_counts():
    r = word_error_rate("a b c", "a x c")
    assert (r.wer, r.substitutions, r.deletions, r.insertions) == \
        (1 / 3, 1, 0, 0)
    r = word_error_rate("a b c", "a c")
    assert (r.wer, r.deletions) == (1 / 3, 1)
    r = word_error_rate("a b c", "a b x c")
    assert (r.wer, r.insertions) == (1 / 3, 1)
    assert word_error_rate("a b c", "a b c").wer == 0.0
    assert word_error_rate("", "x y").insertions == 2
    # classic mixed case: ref 5 words, 1 sub + 1 del + 1 ins
    r = word_error_rate("the quick brown fox jumps",
                        "the quack brown jumps over")
    assert r.num_ref_words == 5
    assert r.wer == (r.substitutions + r.deletions + r.insertions) / 5
    assert r.wer == 3 / 5


def test_wer_with_normalizer():
    from crisperwhisper_tpu.tokenizer.normalizers import \
        EnglishTextNormalizer
    norm = EnglishTextNormalizer({})
    r = word_error_rate("It's twenty-two, okay?", "it is 22 okay",
                        normalizer=norm)
    assert r.wer == 0.0, r


def test_normalizer_without_spelling_map_fails_loudly():
    """Parity with HF: a missing normalizer.json must FAIL at the
    spelling step, not silently skip (VERDICT r3 item 8 — silent skip
    skews WER). HF's EnglishTextNormalizer(None) raises AttributeError
    at the same point; `{}` is the explicit opt-out."""
    import pytest
    from crisperwhisper_tpu.tokenizer.normalizers import \
        EnglishTextNormalizer
    norm = EnglishTextNormalizer()          # no mapping supplied
    with pytest.raises(ValueError, match="normalizer.json"):
        norm("the colour of humour")
    # HF raises too (pin that the reference behaves the same)
    from transformers.models.whisper.english_normalizer import \
        EnglishTextNormalizer as HFNorm
    with pytest.raises(AttributeError):
        HFNorm(None)("the colour of humour")
    # explicit {} opts out; a real map applies word-level
    assert EnglishTextNormalizer({})("the colour") == "the colour"
    ours = EnglishTextNormalizer({"colour": "color", "humour": "humor"})
    hf = HFNorm({"colour": "color", "humour": "humor"})
    for text in ("the colour of humour", "Colour me surprised!",
                 "humour, colour and valour."):
        assert ours(text) == hf(text), text


def test_align_matched_words():
    pairs = align_matched_words(["a", "b", "c", "d"], ["a", "x", "c"])
    assert pairs == [(0, 0), (2, 2)]


def test_segmentation_exact_match():
    words = [("hello", 0.0, 0.4), ("world", 0.5, 0.9)]
    s = segmentation_scores(words, words, collar=0.05)
    assert s == SegmentationResult(1.0, 1.0, 1.0, 1.0, 2, 2)


def test_segmentation_collar_and_iou():
    ref = [("a", 0.0, 1.0), ("b", 2.0, 3.0)]
    hyp = [("a", 0.04, 1.04),      # within 50 ms collar, IOU 0.96/1.04
           ("b", 2.2, 3.2)]        # outside collar, IOU 0.8/1.2
    s = segmentation_scores(ref, hyp, collar=0.05)
    assert s.true_positives == 1 and s.matched == 2
    assert s.precision == 0.5 and s.recall == 0.5 and s.f1 == 0.5
    np.testing.assert_allclose(
        s.avg_iou, ((0.96 / 1.04) + (0.8 / 1.2)) / 2, atol=1e-9)


def test_segmentation_insertions_hurt_precision():
    ref = [("a", 0.0, 1.0)]
    hyp = [("a", 0.0, 1.0), ("zz", 1.0, 2.0)]
    s = segmentation_scores(ref, hyp, collar=0.05)
    assert s.precision == 0.5 and s.recall == 1.0


def test_segmentation_normalize_word():
    ref = [("Hello,", 0.0, 1.0)]
    hyp = [("hello", 0.0, 1.0)]
    s = segmentation_scores(
        ref, hyp, normalize_word=lambda w: w.lower().strip(",.?!"))
    assert s.true_positives == 1


def test_chunks_adapter():
    chunks = [{"text": " hi", "timestamp": (0.0, 0.5)},
              {"text": " there", "timestamp": (0.6, 1.0)}]
    assert chunks_to_words(chunks) == [("hi", 0.0, 0.5),
                                       ("there", 0.6, 1.0)]

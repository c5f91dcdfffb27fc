"""Evaluation metric tests (WER, segmentation F1/IOU)."""

import numpy as np


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

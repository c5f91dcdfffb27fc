"""Evaluation metrics: WER and word-segmentation F1 / IOU.

The reference's published numbers (BASELINE.md) are WER (with the English
normalizer applied to both sides) and word-segmentation F1 at a 50 ms
collar plus average IOU (ref:README.md:59-92, methodology from the
CrisperWhisper paper). These are the tools to reproduce those tables.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence


def _edit_distance(ref: Sequence[str], hyp: Sequence[str]) -> int:
    n, m = len(ref), len(hyp)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ref[i - 1] != hyp[j - 1]))
        prev = cur
    return prev[m]


def wer(references: Sequence[str], hypotheses: Sequence[str],
        normalizer: Callable[[str], str] | None = None) -> float:
    """Corpus word error rate; normalizer applied to both sides."""
    errors = 0
    words = 0
    for ref, hyp in zip(references, hypotheses):
        if normalizer is not None:
            ref, hyp = normalizer(ref), normalizer(hyp)
        r, h = ref.split(), hyp.split()
        errors += _edit_distance(r, h)
        words += len(r)
    return errors / max(words, 1)


@dataclass
class SegmentationScore:
    f1: float
    precision: float
    recall: float
    avg_iou: float


def _iou(a: tuple[float, float], b: tuple[float, float]) -> float:
    inter = max(0.0, min(a[1], b[1]) - max(a[0], b[0]))
    union = max(a[1], b[1]) - min(a[0], b[0])
    return inter / union if union > 0 else 0.0


def word_segmentation_score(
        reference: list[dict], hypothesis: list[dict],
        collar: float = 0.05,
        normalizer: Callable[[str], str] | None = None
        ) -> SegmentationScore:
    """Greedy one-to-one matching of word chunks ({"text", "timestamp"})
    — a hypothesis word is correct when an unmatched reference word has
    the same (normalized) text and both boundaries within `collar`.
    avg IOU is over matched-by-text pairs (boundary-quality measure)."""
    def norm(t: str) -> str:
        t = t.strip().lower()
        return normalizer(t) if normalizer else t

    used = [False] * len(reference)
    tp = 0
    ious: list[float] = []
    for h in hypothesis:
        hs, he = h["timestamp"]
        best = None
        for i, r in enumerate(reference):
            if used[i] or norm(r["text"]) != norm(h["text"]):
                continue
            rs, re_ = r["timestamp"]
            if abs(hs - rs) <= collar and abs(he - re_) <= collar:
                best = i
                break
        if best is not None:
            used[best] = True
            tp += 1
        # IOU over text-matched nearest reference (collar-independent)
        cands = [(_iou((hs, he), r["timestamp"]), i)
                 for i, r in enumerate(reference)
                 if norm(r["text"]) == norm(h["text"])]
        if cands:
            ious.append(max(cands)[0])
    precision = tp / max(len(hypothesis), 1)
    recall = tp / max(len(reference), 1)
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return SegmentationScore(f1=f1, precision=precision, recall=recall,
                             avg_iou=(sum(ious) / len(ious)) if ious
                             else 0.0)

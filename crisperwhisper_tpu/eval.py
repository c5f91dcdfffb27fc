"""Offline evaluation: WER and word-segmentation quality.

The reference publishes quality numbers as README tables — WER
(ref:README.md:65-76) and word-segmentation F1 / avg IOU at a boundary
collar (ref:README.md:83-90, the CrisperWhisper paper's verbatim-
timestamp metrics) — but ships no evaluation code (its
`run_experiments/plots` pointer is absent from the repo snapshot,
ref:README.md:92; see SURVEY.md §4/§6). This module is the missing
tool: the same metrics, computed the way the tables define them, so a
user can reproduce the comparison against their own datasets.

Metric definitions implemented here:

* WER — Levenshtein distance over word lists, (S + D + I) / N. Texts
  should be normalized first; pass `normalizer=EnglishTextNormalizer()`
  (tokenizer/normalizers.py) to match the reference's WER protocol
  (Open ASR leaderboard convention).
* Segmentation F1 @ collar — hypothesis and reference word lists are
  aligned by Levenshtein over the word strings; an aligned,
  string-equal pair counts as a true positive iff BOTH its start and
  end boundaries lie within `collar` seconds of the reference's.
  Precision = TP / len(hyp), recall = TP / len(ref).
* Avg IOU — mean interval intersection-over-union over the aligned
  string-equal pairs (boundary quality independent of the collar).

Pure numpy — this is host-side tooling, not a TPU path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np

Word = tuple[str, float, float]          # (text, start_s, end_s)


def _to_words(text_or_words) -> list[str]:
    if isinstance(text_or_words, str):
        return text_or_words.split()
    return list(text_or_words)


def _levenshtein_matrix(ref: list[str], hyp: list[str]) -> np.ndarray:
    """DP cost matrix [len(ref)+1, len(hyp)+1]; substitutions, deletions
    and insertions all cost 1 (standard WER)."""
    n, m = len(ref), len(hyp)
    d = np.zeros((n + 1, m + 1), np.int32)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    hyp_arr = np.asarray(hyp, object)
    for i in range(1, n + 1):
        sub = d[i - 1, :-1] + (hyp_arr != ref[i - 1])
        # vectorized over j except the running insertion minimum, which
        # is inherently sequential — keep that scalar loop tight
        dele = d[i - 1, 1:] + 1
        best = np.minimum(sub, dele)
        run = d[i, 0]
        row = d[i]
        for j in range(1, m + 1):
            run = min(best[j - 1], run + 1)
            row[j] = run
    return d


@dataclass
class WerResult:
    wer: float
    substitutions: int
    deletions: int
    insertions: int
    num_ref_words: int


def word_error_rate(reference, hypothesis,
                    normalizer: Callable[[str], str] | None = None
                    ) -> WerResult:
    """WER between reference and hypothesis (strings or word lists)."""
    if normalizer is not None:
        if not isinstance(reference, str) or not isinstance(hypothesis, str):
            raise ValueError("normalizer requires string inputs")
        reference, hypothesis = normalizer(reference), normalizer(hypothesis)
    ref, hyp = _to_words(reference), _to_words(hypothesis)
    if not ref:
        return WerResult(float(len(hyp) > 0), 0, 0, len(hyp), 0)
    d = _levenshtein_matrix(ref, hyp)
    # backtrace for S/D/I counts
    i, j = len(ref), len(hyp)
    s = dele = ins = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] \
                and ref[i - 1] == hyp[j - 1]:
            i, j = i - 1, j - 1
        elif i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + 1:
            s += 1
            i, j = i - 1, j - 1
        elif i > 0 and d[i, j] == d[i - 1, j] + 1:
            dele += 1
            i -= 1
        else:
            ins += 1
            j -= 1
    return WerResult((s + dele + ins) / len(ref), s, dele, ins, len(ref))


def align_matched_words(ref: Sequence[str], hyp: Sequence[str]
                        ) -> list[tuple[int, int]]:
    """(ref_idx, hyp_idx) pairs of STRING-EQUAL words on the Levenshtein
    alignment path (substituted pairs are not matches)."""
    ref, hyp = list(ref), list(hyp)
    d = _levenshtein_matrix(ref, hyp)
    pairs: list[tuple[int, int]] = []
    i, j = len(ref), len(hyp)
    while i > 0 and j > 0:
        if d[i, j] == d[i - 1, j - 1] and ref[i - 1] == hyp[j - 1]:
            pairs.append((i - 1, j - 1))
            i, j = i - 1, j - 1
        elif d[i, j] == d[i - 1, j - 1] + 1:
            i, j = i - 1, j - 1
        elif d[i, j] == d[i - 1, j] + 1:
            i -= 1
        else:
            j -= 1
    pairs.reverse()
    return pairs


@dataclass
class SegmentationResult:
    f1: float
    precision: float
    recall: float
    avg_iou: float
    matched: int                  # aligned string-equal pairs
    true_positives: int           # matched AND both boundaries in collar


def segmentation_scores(ref_words: Sequence[Word],
                        hyp_words: Sequence[Word],
                        collar: float = 0.05,
                        normalize_word: Callable[[str], str] | None = None
                        ) -> SegmentationResult:
    """Word-boundary F1 @ `collar` seconds + avg IOU
    (ref:README.md:83-90 metric family; collar 0.05 = the table's 50 ms).

    `normalize_word` (e.g. str.lower with punctuation stripping) is
    applied to word strings before alignment so boundary scoring is not
    hostage to casing/punctuation mismatches.
    """
    norm = normalize_word or (lambda w: w)
    ref_txt = [norm(w) for w, _, _ in ref_words]
    hyp_txt = [norm(w) for w, _, _ in hyp_words]
    pairs = align_matched_words(ref_txt, hyp_txt)
    tp = 0
    ious: list[float] = []
    for ri, hi in pairs:
        _, rs, re = ref_words[ri]
        _, hs, he = hyp_words[hi]
        if abs(hs - rs) <= collar and abs(he - re) <= collar:
            tp += 1
        inter = max(0.0, min(re, he) - max(rs, hs))
        union = max(re, he) - min(rs, hs)
        ious.append(inter / union if union > 0 else 0.0)
    precision = tp / len(hyp_words) if hyp_words else 0.0
    recall = tp / len(ref_words) if ref_words else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return SegmentationResult(f1, precision, recall,
                              float(np.mean(ious)) if ious else 0.0,
                              len(pairs), tp)


def chunks_to_words(chunks: Sequence[dict]) -> list[Word]:
    """Adapt the pipeline's word-chunk output
    ({"text": ..., "timestamp": (s, e)}) to (word, start, end) tuples."""
    out: list[Word] = []
    for c in chunks:
        s, e = c["timestamp"]
        out.append((c["text"].strip(), float(s), float(e)))
    return out

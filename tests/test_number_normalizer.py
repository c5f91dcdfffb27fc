"""Normalizer parity vs the reference implementation: a pinned phrase
battery plus randomized differential fuzz (hundreds of word soups and
sentence fragments) against the installed HF EnglishNumberNormalizer /
EnglishTextNormalizer (VERDICT r1 item 7)."""

import numpy as np
import pytest

CASES = [
    "i have twenty five dollars",
    "the year nineteen sixty",
    "one hundred and twenty three people",
    "three thousand five hundred",
    "he came in thirty second place",
    "the nineteen sixties were wild",
    "two million dollars",
    "one oh one dalmatians",
    "three point one four",
    "minus five degrees",
    "seven percent of them",
    "she has two cats",
    "double oh seven reporting",
    "twenty twenty three",
    "a hundred thousand",
    "first and second and third",
    "fifty cents each",
    "nineteen oh five",
    "four score and seven years ago",
    "no numbers here at all",
    "ten thousand and one",
    # round-2 additions: deep multipliers, fractions-as-words, currency
    # chains, "and a half", sign + literal-one readability
    "five quadrillion and one",
    "two sextillion stars",
    "a decillion is ten to the thirty third",
    "three quarters of them",
    "two thirds majority",
    "six and a half hours",
    "a hundred and a half",
    "three dollars and fifty cents",
    "twenty dollars and five cents",
    "zero dollars and seven cents",
    "plus one equals two",
    "minus forty degrees celsius",
    "one point five million dollars",
    "nineteen ninety nine point nine percent",
    "one ninety two point one sixty eight dot one",
]


@pytest.mark.parametrize("case", CASES)
def test_number_normalizer_matches_hf(case):
    from transformers.models.whisper.english_normalizer import \
        EnglishNumberNormalizer as HF
    from crisperwhisper_tpu.tokenizer.number_normalizer import \
        EnglishNumberNormalizer as Ours
    assert Ours()(case) == HF()(case)


_NUM_VOCAB = [
    "one", "two", "three", "nine", "ten", "eleven", "nineteen", "twenty",
    "fifty", "ninety", "hundred", "thousand", "million", "trillion",
    "quadrillion", "sextillion", "decillion", "zero", "oh", "o", "double",
    "triple", "point", "and", "half", "a", "minus", "plus", "dollars",
    "dollar", "cents", "cent", "pounds", "euros", "percent", "per",
    "first", "second", "third", "fifth", "twelfth", "ninth", "twentieth",
    "thirties", "sixties", "hundredth", "thousands", "ones", "twos",
    "sixes", "cat", "dog", "the", "quarters", "1", "42", "3.14", "100",
    "0.5", "$20", "-3",
]


@pytest.mark.parametrize("block", range(4))
def test_number_normalizer_differential_fuzz(block):
    """Random word soups over the full trigger vocabulary (500 per block)
    must normalize identically to HF."""
    from transformers.models.whisper.english_normalizer import \
        EnglishNumberNormalizer as HF
    from crisperwhisper_tpu.tokenizer.number_normalizer import \
        EnglishNumberNormalizer as Ours
    hf, ours = HF(), Ours()
    rng = np.random.default_rng(block)
    for _ in range(500):
        n = int(rng.integers(1, 10))
        s = " ".join(_NUM_VOCAB[i]
                     for i in rng.integers(0, len(_NUM_VOCAB), n))
        assert ours(s) == hf(s), s


_TEXT_FRAGS = [
    "hello", "won't", "can't", "i'm", "they're", "it's", "um", "uh",
    "hmm", "[UH]", "[UM]", "mr", "dr", "st", "o'clock",
    "twenty five dollars", "three and a half", "nineteen sixty four",
    "one hundred and five percent", "the colour", "theatre", "a 1st",
    "42nd", "$3 and ¢50", "1,000,000", "she's gone", "we'd been",
    "y'all", "gonna", "wanna", "Mrs. Smith", "Dr. Who", "cool!",
    "(aside)", "naïve café", "cats & dogs", "50%", "one point five",
    "double seven", "per cent", "two thirds", "minus forty", "plus one",
    "a.b.c", "e.g.", "3.14159", "IP one ninety two point one sixty eight",
]


@pytest.mark.parametrize("block", range(4))
def test_text_normalizer_differential_fuzz(block):
    """Random fragment chains through the FULL EnglishTextNormalizer
    (fillers, contractions, titles, currency, spelling map) must match
    HF end to end."""
    from transformers.models.whisper.english_normalizer import \
        EnglishTextNormalizer as HF
    from crisperwhisper_tpu.tokenizer.normalizers import \
        EnglishTextNormalizer as Ours
    spelling = {"colour": "color", "theatre": "theater",
                "normalise": "normalize"}
    hf, ours = HF(spelling), Ours(spelling)
    rng = np.random.default_rng(block + 100)
    for _ in range(400):
        n = int(rng.integers(1, 7))
        s = " ".join(_TEXT_FRAGS[i]
                     for i in rng.integers(0, len(_TEXT_FRAGS), n))
        assert ours(s) == hf(s), s

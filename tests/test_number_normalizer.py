"""Number normalizer vs the reference implementation on a phrase battery."""

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
]


@pytest.mark.parametrize("case", CASES)
def test_number_normalizer_matches_hf(case):
    from transformers.models.whisper.english_normalizer import \
        EnglishNumberNormalizer as HF
    from crisperwhisper_tpu.tokenizer.number_normalizer import \
        EnglishNumberNormalizer as Ours
    assert Ours()(case) == HF()(case)

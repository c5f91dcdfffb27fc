"""Word grouping and punctuation merging.

Behavioral ports of hf tokenization_whisper.py:
  * _split_tokens_on_unicode   :1327-1355 (incremental decode with
    replacement-char guard)
  * _split_tokens_on_spaces    :1358-1379 (word boundary iff special,
    leading space, or punctuation — this is what the CrisperWhisper
    adjusted vocab makes clean, SURVEY.md §2.9)
  * _merge_punctuations        :1382-1417
  * _combine_tokens_into_words :1301-1324
  * _collate_word_timestamps   :1285-1298
"""

from __future__ import annotations

from typing import Sequence

from .languages import NO_SPACE_LANGUAGES
from .whisper_tokenizer import WhisperTokenizer

PREPEND_PUNCTUATIONS = "\"'“¡¿([{-"
APPEND_PUNCTUATIONS = "\"'.。,，!！?？:：”)]}、"
_PUNCT = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"


def split_tokens_on_unicode(tok: WhisperTokenizer, tokens: Sequence[int]):
    decoded_full = tok.decode(tokens, decode_with_timestamps=True)
    replacement_char = "�"
    words, word_tokens, token_indices = [], [], []
    current_tokens: list[int] = []
    current_indices: list[int] = []
    unicode_offset = 0
    for token_idx, token in enumerate(tokens):
        current_tokens.append(int(token))
        current_indices.append(token_idx)
        decoded = tok.decode(current_tokens, decode_with_timestamps=True)
        if (replacement_char not in decoded
                or decoded_full[unicode_offset + decoded.index(
                    replacement_char)] == replacement_char):
            words.append(decoded)
            word_tokens.append(current_tokens)
            token_indices.append(current_indices)
            current_tokens, current_indices = [], []
            unicode_offset += len(decoded)
    return words, word_tokens, token_indices


def split_tokens_on_spaces(tok: WhisperTokenizer, tokens: Sequence[int]):
    subwords, subword_tokens_list, subword_indices_list = \
        split_tokens_on_unicode(tok, tokens)
    words, word_tokens, token_indices = [], [], []
    for subword, stoks, sidx in zip(subwords, subword_tokens_list,
                                    subword_indices_list):
        special = stoks[0] >= tok.eot
        with_space = subword.startswith(" ")
        punctuation = subword.strip() in _PUNCT
        if special or with_space or punctuation or len(words) == 0:
            words.append(subword)
            word_tokens.append(stoks)
            token_indices.append(sidx)
        else:
            words[-1] = words[-1] + subword
            word_tokens[-1].extend(stoks)
            token_indices[-1].extend(sidx)
    return words, word_tokens, token_indices


def merge_punctuations(words, tokens, indices,
                       prepended=PREPEND_PUNCTUATIONS,
                       appended=APPEND_PUNCTUATIONS) -> None:
    i, j = len(words) - 2, len(words) - 1
    while i >= 0:
        if words[i].startswith(" ") and words[i].strip() in prepended:
            words[j] = words[i] + words[j]
            tokens[j] = tokens[i] + tokens[j]
            indices[j] = indices[i] + indices[j]
            words[i], tokens[i], indices[i] = "", [], []
        else:
            j = i
        i -= 1
    i, j = 0, 1
    while j < len(words):
        if not words[i].endswith(" ") and words[j] in appended:
            words[i] += words[j]
            tokens[i] += tokens[j]
            indices[i] += indices[j]
            words[j], tokens[j], indices[j] = "", [], []
        else:
            i = j
        j += 1
    words[:] = [w for w in words if w]
    tokens[:] = [t for t in tokens if t]
    indices[:] = [x for x in indices if x]


def combine_tokens_into_words(tok: WhisperTokenizer, tokens: Sequence[int],
                              language: str | None = None,
                              prepend_punctuations=PREPEND_PUNCTUATIONS,
                              append_punctuations=APPEND_PUNCTUATIONS):
    if language is None:
        language = tok.language or "english"
    if language in NO_SPACE_LANGUAGES:
        words, word_tokens, token_indices = split_tokens_on_unicode(
            tok, tokens)
    else:
        words, word_tokens, token_indices = split_tokens_on_spaces(
            tok, tokens)
    merge_punctuations(words, word_tokens, token_indices,
                       prepend_punctuations, append_punctuations)
    return words, word_tokens, token_indices


def collate_word_timestamps(tok: WhisperTokenizer, tokens: Sequence[int],
                            token_timestamps: Sequence[tuple[float, float]],
                            language: str | None = None,
                            return_language: bool = False):
    words, _, token_indices = combine_tokens_into_words(tok, tokens,
                                                        language)
    optional = {"language": language} if return_language else {}
    return [{"text": word,
             "timestamp": (token_timestamps[idx[0]][0],
                           token_timestamps[idx[-1]][1]),
             **optional}
            for word, idx in zip(words, token_indices)]

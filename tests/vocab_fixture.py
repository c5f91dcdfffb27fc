"""Synthetic whisper-style vocabulary for offline tokenizer parity tests.

Builds a small byte-level BPE vocab (256 bytes + a few merged word pieces)
plus the full whisper special-token layout (sot, 100 language tokens,
task tokens, etc.) so the HF slow WhisperTokenizer and our tokenizer load
bit-identical data. Includes CrisperWhisper-style verbatim filler tokens
([UH]/[UM]) as plain vocab entries.
"""

import json
import os

from crisperwhisper_tpu.tokenizer.bpe import bytes_to_unicode
from crisperwhisper_tpu.tokenizer.languages import LANGUAGE_CODES

# merge chains building a handful of words (each pair must be mergeable
# left-to-right from existing symbols)
MERGES = [
    ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
    ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d"),
    ("Ġ", "hello"), ("Ġ", "world"),
    ("t", "h"), ("th", "e"), ("Ġ", "the"),
    ("u", "m"), ("u", "h"),
    ("i", "n"), ("Ġ", "in"), ("Ġin", "g"),
    ("[", "U"), ("[U", "H"), ("[UH", "]"),
    ("[U", "M"), ("[UM", "]"),
    ("c", "a"), ("ca", "t"), ("Ġ", "cat"),
    ("d", "o"), ("do", "g"), ("Ġ", "dog"),
]


def build_vocab_dir(path: str) -> dict:
    """Write vocab.json/merges.txt/added_tokens.json; return layout info."""
    os.makedirs(path, exist_ok=True)
    byte_vocab = list(bytes_to_unicode().values())
    vocab = {tok: i for i, tok in enumerate(byte_vocab)}
    for a, b in MERGES:
        merged = a + b
        if merged not in vocab:
            vocab[merged] = len(vocab)
    base_size = len(vocab)

    specials = ["<|endoftext|>", "<|startoftranscript|>"]
    specials += [f"<|{c}|>" for c in LANGUAGE_CODES]
    specials += ["<|translate|>", "<|transcribe|>", "<|startofprev|>",
                 "<|nospeech|>", "<|notimestamps|>"]
    added = {tok: base_size + i for i, tok in enumerate(specials)}

    with open(os.path.join(path, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(path, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in MERGES:
            f.write(f"{a} {b}\n")
    with open(os.path.join(path, "added_tokens.json"), "w",
              encoding="utf-8") as f:
        json.dump(added, f, ensure_ascii=False)

    sot = added["<|startoftranscript|>"]
    return {
        "base_size": base_size,
        "eot": added["<|endoftext|>"],
        "sot": sot,
        "language_begin": sot + 1,
        "translate": added["<|translate|>"],
        "transcribe": added["<|transcribe|>"],
        "sot_prev": added["<|startofprev|>"],
        "no_speech": added["<|nospeech|>"],
        "no_timestamps": added["<|notimestamps|>"],
        "timestamp_begin": added["<|notimestamps|>"] + 1,
        "added": added,
    }


def build_model_vocab_dir(path: str) -> dict:
    """Vocabulary aligned to the tiny *model*'s special-token layout
    (helpers.TINY_SPECIALS: eot=900, sot=901, ..., timestamp_begin=907):
    byte+merge vocab padded with filler tokens to exactly 900 entries,
    then the 7 specials as added tokens. No language tokens (English-only
    style), so both tokenizers see timestamp_begin == 907 == the model's."""
    os.makedirs(path, exist_ok=True)
    byte_vocab = list(bytes_to_unicode().values())
    vocab = {tok: i for i, tok in enumerate(byte_vocab)}
    for a, b in MERGES:
        merged = a + b
        if merged not in vocab:
            vocab[merged] = len(vocab)
    i = 0
    while len(vocab) < 900:
        filler = f"<unused{i}>"
        if filler not in vocab:
            vocab[filler] = len(vocab)
        i += 1
    specials = ["<|endoftext|>", "<|startoftranscript|>", "<|translate|>",
                "<|transcribe|>", "<|startofprev|>", "<|nospeech|>",
                "<|notimestamps|>"]
    added = {tok: 900 + i for i, tok in enumerate(specials)}
    with open(os.path.join(path, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(path, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in MERGES:
            f.write(f"{a} {b}\n")
    with open(os.path.join(path, "added_tokens.json"), "w",
              encoding="utf-8") as f:
        json.dump(added, f, ensure_ascii=False)
    return {"added": added, "timestamp_begin": 907}


def hf_tokenizer(path: str):
    """HF slow WhisperTokenizer over the same files, with the added
    specials registered in the exact same id order."""
    from transformers import WhisperTokenizer as HFWhisperTokenizer
    with open(os.path.join(path, "added_tokens.json"), encoding="utf-8") as f:
        added = json.load(f)
    tok = HFWhisperTokenizer(
        vocab_file=os.path.join(path, "vocab.json"),
        merges_file=os.path.join(path, "merges.txt"))
    ordered = sorted(added.items(), key=lambda kv: kv[1])
    tok.add_special_tokens(
        {"additional_special_tokens": [k for k, _ in ordered
                                       if k != "<|endoftext|>"]})
    # sanity: layout must match the file
    for k, v in added.items():
        assert tok.convert_tokens_to_ids(k) == v, (k, v,
                                                   tok.convert_tokens_to_ids(k))
    return tok


def our_tokenizer(path: str, **kw):
    from crisperwhisper_tpu.tokenizer import WhisperTokenizer
    return WhisperTokenizer.from_dir(path, **kw)

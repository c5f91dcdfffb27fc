"""Synthetic large-v3 checkpoint DIRECTORY for product-API benches.

Writes everything hub.load_pipeline reads from disk — config.json,
generation_config.json, preprocessor_config.json, vocab.json/merges.txt/
added_tokens.json — at the REAL large-v3 geometry and the standard
multilingual special-token layout (config.SpecialTokens defaults), with
full text-id coverage (every id < eot decodes to a plausible space-led
word) so host postprocessing pays realistic cost on random-model tokens.

Weights are NOT written by default: on this dev host the host<->device
link is a tunnel, so benches inject device-initialized params via
load_pipeline(params=...) (the file-load path is covered at tiny scale
by tests/test_export.py). Pass write_weights=True on a real TPU VM to
get the full safetensors too.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crisperwhisper_tpu.config import SpecialTokens, WhisperArch
from crisperwhisper_tpu.tokenizer.bpe import bytes_to_unicode

N_ALIGN_HEADS = 15


def bench_alignment_heads(arch: WhisperArch) -> list[list[int]]:
    """The bench's 15-head selection (CrisperWhisper fine-tunes 15 heads,
    ref:README.md:295)."""
    return [[(2 + 2 * i) % arch.decoder_layers,
             i % arch.decoder_attention_heads] for i in range(N_ALIGN_HEADS)]


def _base36(n: int) -> str:
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    out = ""
    while True:
        out = digits[n % 36] + out
        n //= 36
        if n == 0:
            return out


def ensure_bench_checkpoint(path: str,
                            arch: WhisperArch | None = None,
                            sp: SpecialTokens | None = None,
                            write_weights: bool = False,
                            seed: int = 0) -> str:
    arch = arch or WhisperArch.large_v3()
    sp = sp or SpecialTokens()
    marker = os.path.join(path, ".bench_ckpt_v1")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)

    # --- tokenizer: full text-id coverage -----------------------------
    byte_vocab = list(bytes_to_unicode().values())
    vocab = {tok: i for i, tok in enumerate(byte_vocab)}
    i = len(vocab)
    while i < sp.eot:
        vocab[f"Ġw{_base36(i)}"] = i       # "Ġw<base36>": space-led word
        i += 1
    with open(os.path.join(path, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(path, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
    added = {"<|endoftext|>": sp.eot, "<|startoftranscript|>": sp.sot}
    from crisperwhisper_tpu.tokenizer.languages import LANGUAGE_CODES
    for j, code in enumerate(LANGUAGE_CODES[:sp.num_languages]):
        added[f"<|{code}|>"] = sp.language_begin + j
    added.update({"<|translate|>": sp.translate,
                  "<|transcribe|>": sp.transcribe,
                  "<|startofprev|>": sp.sot_prev,
                  "<|nospeech|>": sp.no_speech,
                  "<|notimestamps|>": sp.no_timestamps})
    with open(os.path.join(path, "added_tokens.json"), "w",
              encoding="utf-8") as f:
        json.dump(added, f, ensure_ascii=False)

    # --- configs --------------------------------------------------------
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({**arch.to_hf_config(), "median_filter_width": 7}, f)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({
            "alignment_heads": bench_alignment_heads(arch),
            "max_initial_timestamp_index": 50,
            "no_timestamps_token_id": sp.no_timestamps,
            "eos_token_id": sp.eot,
            "pad_token_id": sp.eot,
            "decoder_start_token_id": sp.sot,
            "is_multilingual": True,
        }, f)
    with open(os.path.join(path, "preprocessor_config.json"), "w") as f:
        json.dump({"feature_size": arch.num_mel_bins,
                   "sampling_rate": 16000, "n_fft": 400,
                   "hop_length": 160, "chunk_length": 30}, f)

    if write_weights:
        import jax
        import jax.numpy as jnp
        from crisperwhisper_tpu.models import init_params
        from crisperwhisper_tpu.models.loader import save_hf_checkpoint
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = init_params(arch, jax.random.PRNGKey(seed),
                                 dtype=jnp.bfloat16)
        save_hf_checkpoint(path, params, arch,
                           config_extra={"median_filter_width": 7})
    with open(marker, "w") as f:
        f.write("ok\n")
    return path


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cw_bench_ckpt"
    ensure_bench_checkpoint(target,
                            write_weights="--weights" in sys.argv)
    print(target)

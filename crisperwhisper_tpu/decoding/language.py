"""Language detection — one decoder step from <|startoftranscript|>.

Parity contract: hf generation_whisper.py:1622-1685 `detect_language`:
a single forward from [sot], logits restricted to the language-token id
range, argmax per batch row.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import SpecialTokens, WhisperArch
from ..models.whisper import decode_step, init_cache


def detect_language(params: Any, arch: WhisperArch, specials: SpecialTokens,
                    encoder_out: jax.Array,
                    num_languages: int | None = None) -> jax.Array:
    """[B, K, d] encoder states -> [B] int32 language token ids."""
    b = encoder_out.shape[0]
    n_lang = num_languages or specials.num_languages
    cache = init_cache(params, arch, encoder_out, cache_len=8)
    tokens = jnp.full((b,), specials.sot, jnp.int32)
    logits, _, _ = decode_step(params, arch, tokens, jnp.int32(0), cache)
    vocab = jnp.arange(logits.shape[-1])
    lang_mask = ((vocab >= specials.language_begin)
                 & (vocab < specials.language_begin + n_lang))
    masked = jnp.where(lang_mask[None, :], logits, -jnp.inf)
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


# jitted entry (static arch/specials/num_languages): detection is one
# decode step, but the eager form pays per-op dispatch for the whole
# step (see models/whisper.encode_jit note)
import functools  # noqa: E402

detect_language_jit = functools.partial(
    jax.jit, static_argnames=("arch", "specials", "num_languages"))(
        detect_language)

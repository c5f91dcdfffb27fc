"""Shared test fixtures: offline random-init torch Whisper models.

No network access in this sandbox, so golden parity runs against
seed-pinned randomly initialized HF torch models (same weights loaded into
both frameworks) instead of hub checkpoints. This exercises every code
path the pretrained models use.
"""

import numpy as np

from crisperwhisper_tpu.config import SpecialTokens, WhisperArch

# A miniature whisper-like geometry, large enough to exercise multi-head
# attention / mel frontend / timestamp vocab, small enough for 1-CPU CI.
# max_source_positions is shrunk 1500->250 (i.e. 500-frame / 5 s windows):
# algorithm under test is length-generic, and the small window keeps the
# seek-loop parity tests tractable on one CPU.
TINY = dict(
    vocab_size=1000,
    d_model=64,
    encoder_layers=2,
    decoder_layers=2,
    encoder_attention_heads=4,
    decoder_attention_heads=4,
    encoder_ffn_dim=128,
    decoder_ffn_dim=128,
    max_source_positions=250,
    max_target_positions=96,
    num_mel_bins=80,
)

# Special-token layout for the tiny vocab (mirrors whisper's tail layout:
# the last 1501 slots can't fit in vocab 1000, so we scale down: timestamps
# occupy the tail above timestamp_begin).
TINY_SPECIALS = SpecialTokens(
    eot=900, sot=901, translate=902, transcribe=903, sot_prev=904,
    no_speech=905, no_timestamps=906, timestamp_begin=907,
    language_begin=908, num_languages=0)


def tiny_arch() -> WhisperArch:
    return WhisperArch(**TINY)


def torch_tiny_model(seed: int = 0):
    """Random-init HF torch model with pinned seed."""
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = WhisperConfig(
        **TINY,
        pad_token_id=TINY_SPECIALS.eot,
        bos_token_id=TINY_SPECIALS.eot,
        eos_token_id=TINY_SPECIALS.eot,
        decoder_start_token_id=TINY_SPECIALS.sot,
        suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    # the reference forces eager attention when token timestamps are
    # requested (hf generation_whisper.py:717-718); we need it so
    # output_attentions=True returns cross-attention weights.
    cfg._attn_implementation = "eager"
    torch.manual_seed(seed)
    model = WhisperForConditionalGeneration(cfg)
    model.eval()
    return model


def state_dict_numpy(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def rand_mel(batch: int = 1, seed: int = 0, n_mels: int = 80,
             frames: int = 500) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, n_mels, frames)).astype(np.float32)

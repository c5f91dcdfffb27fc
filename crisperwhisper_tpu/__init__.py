"""crisperwhisper_tpu — a TPU-native verbatim-ASR framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
nyrahealth/CrisperWhisper: verbatim transcription with filler tokens,
DTW word-level timestamps from alignment-head cross-attention, pause-aware
timestamp redistribution, hallucination mitigation, and batched long-form
chunked inference. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

"""Chunked long-form ASR pipeline — the primary serving path.

TPU-native re-design of the reference's L5 orchestration
(hf pipelines/automatic_speech_recognition.py + ChunkPipeline machinery,
SURVEY.md §2.6): overlapping 30 s windows (stride chunk/6 each side,
:447-448), batched ACROSS chunks and audios into fixed-size device
batches, one jitted mel+encode+decode program per batch, then the
`decode_asr` stitcher merges overlap regions back into one transcript.

Where the reference threads chunks through a torch DataLoader with pad
collation (hf pipelines/base.py:1501-1519), we build static [B, 480000]
sample batches directly: every chunk window is padded to exactly 30 s, so
one XLA program serves every batch — the TPU answer to dynamic batching.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.io import load_audio
from ..audio.mel import extract_features
from ..config import (FeatureConfig, GenerationOptions, PipelineOptions,
                      SpecialTokens, WhisperArch)
from ..decoding.longform import generate
from ..tokenizer.stitcher import decode_asr
from ..tokenizer.whisper_tokenizer import WhisperTokenizer
from .pauses import adjust_pauses


@dataclass
class Chunk:
    audio_idx: int
    samples: np.ndarray            # raw window (<= n_samples)
    stride: tuple[int, int, int]   # (chunk_samples, left, right) in samples
    is_last: bool


def chunk_iter(audio: np.ndarray, audio_idx: int, n_samples: int,
               stride_left: int, stride_right: int) -> Iterable[Chunk]:
    """Overlapping window generator (hf chunk_iter :61-84): step =
    chunk - left - right; first chunk has no left stride, last no right."""
    inputs_len = audio.shape[0]
    step = n_samples - stride_left - stride_right
    for chunk_start in range(0, inputs_len, step):
        chunk = audio[chunk_start:chunk_start + n_samples]
        _stride_left = 0 if chunk_start == 0 else stride_left
        is_last = chunk_start + n_samples >= inputs_len
        _stride_right = 0 if is_last else stride_right
        if chunk.shape[0] > _stride_left:
            yield Chunk(audio_idx, chunk,
                        (chunk.shape[0], _stride_left, _stride_right),
                        is_last)
        if is_last:
            break


class ASRPipeline:
    """`pipe(audio, return_timestamps="word")` equivalent of
    ref:transcribe.py:21-33."""

    def __init__(self, params: Any, arch: WhisperArch,
                 tokenizer: WhisperTokenizer,
                 specials: SpecialTokens | None = None,
                 gen_opts: GenerationOptions = GenerationOptions(),
                 pipe_opts: PipelineOptions = PipelineOptions(),
                 feat_cfg: FeatureConfig | None = None,
                 mesh: Any | None = None,
                 assistant: Any | None = None):
        """mesh: optional jax.sharding.Mesh ("data", "model") — serve the
        pipeline multi-chip: params are expected TP-sharded over "model"
        (parallel/mesh.shard_params; hub.load_pipeline(mesh=...) does it)
        and each chunk batch is device_put sharded over "data". The
        reference has no multi-device serving at all (SURVEY.md §2.8).

        assistant: optional speculative-decoding assistant passed through
        to generate(): a (draft_params, draft_arch) tuple (e.g.
        decoding.assisted.make_self_draft) or "prompt_lookup". When None,
        gen_opts.prompt_lookup still enables the draft-free mode."""
        self.params = params
        self.arch = arch
        self.tokenizer = tokenizer
        self.specials = specials or specials_from_tokenizer(tokenizer)
        self.gen_opts = gen_opts
        self.pipe_opts = pipe_opts
        self.feat_cfg = feat_cfg or FeatureConfig(
            feature_size=arch.num_mel_bins)
        self.mesh = mesh
        self.assistant = assistant
        if mesh is not None:
            data = mesh.shape["data"]
            if pipe_opts.batch_size % data:
                raise ValueError(
                    f"batch_size {pipe_opts.batch_size} must be a multiple "
                    f"of the mesh data axis ({data})")
        from ..utils.tracing import RTFMeter
        self.meter = RTFMeter()
        # persistent XLA compile cache: makes the SECOND process's
        # warmup ~free (each power-of-2 batch program otherwise pays a
        # multi-minute axon compile per process — see warmup()).
        from ..utils.compile_cache import enable_persistent_cache
        enable_persistent_cache(tpu_only=True)
        # auto language detection for multilingual checkpoints when no
        # language is pinned (hf _retrieve_init_tokens :1560-1590)
        self.detect_language = False

    # ------------------------------------------------------------------
    def warmup(self, return_timestamps: str | bool = "word") -> list[int]:
        """Precompile every chunked-path program the pipeline can emit —
        the power-of-2 batch sizes up to batch_size (the _run_chunks
        grouping contract) — so serving never pays an XLA compile
        mid-request: a fresh batch size is a multi-minute remote compile
        on the axon backend. Returns the warmed batch sizes."""
        bs = self.pipe_opts.batch_size
        n_samples = int(round(self.pipe_opts.chunk_length_s
                              * self.feat_cfg.sampling_rate))
        sizes, s = [], 1
        while s < bs:
            sizes.append(s)
            s <<= 1
        sizes.append(bs)
        zeros = np.zeros((n_samples,), np.float32)
        for s in sizes:
            chunks = [Chunk(0, zeros, (n_samples, 0, 0), i == s - 1)
                      for i in range(s)]
            self._run_chunks(chunks, n_samples, return_timestamps)
        return sizes

    def __call__(self, inputs: Any, return_timestamps: str | bool | None
                 = None, adjust_pauses_threshold: float | None = None,
                 return_language: bool = False,
                 prompt: Any | None = None):
        """prompt: optional per-call domain-vocabulary bias — a string
        (tokenized via tokenizer.get_prompt_ids) or a prompt-id array
        (hf pipeline generate_kwargs={'prompt_ids': ...})."""
        single = not isinstance(inputs, (list, tuple))
        audios = [inputs] if single else list(inputs)
        results = self.transcribe_batch(
            audios,
            return_timestamps=(return_timestamps
                               if return_timestamps is not None
                               else self.pipe_opts.return_timestamps),
            return_language=return_language,
            adjust_pauses_threshold=adjust_pauses_threshold,
            prompt=prompt)
        return results[0] if single else results

    def transcribe_batch(self, audios: Sequence[Any], return_timestamps,
                         return_language=False,
                         adjust_pauses_threshold: float | None = None,
                         prompt: Any | None = None):
        cfg = self.feat_cfg
        sr = cfg.sampling_rate
        sl_s, sr_s = self.pipe_opts.strides()
        # window/stride sample counts (hf automatic_speech_recognition.py
        # :447-455 rounds to config.inputs_to_logits_ratio — which
        # WhisperConfig does not define, so align_to == 1 for whisper)
        n_samples = int(round(self.pipe_opts.chunk_length_s * sr))
        stride_left = int(round(sl_s * sr))
        stride_right = int(round(sr_s * sr))

        chunks: list[Chunk] = []
        total_audio_s = 0.0
        for idx, a in enumerate(audios):
            audio = load_audio(a, sr)
            total_audio_s += audio.shape[0] / sr
            chunks.extend(chunk_iter(audio, idx, n_samples, stride_left,
                                     stride_right))

        with self.meter.measure(total_audio_s, "pipeline"):
            chunk_outputs = self._run_chunks(chunks, n_samples,
                                             return_timestamps,
                                             prompt=prompt)

        results = []
        for idx in range(len(audios)):
            model_outputs = [co for c, co in zip(chunks, chunk_outputs)
                             if c.audio_idx == idx]
            # stride samples -> seconds (postprocess :616-623)
            for out in model_outputs:
                cl, left, right = out["stride"]
                out["stride"] = (cl / sr, left / sr, right / sr)
            time_precision = cfg.chunk_length / self.arch.max_source_positions
            text, optional = decode_asr(
                self.tokenizer, model_outputs,
                return_timestamps=return_timestamps,
                return_language=return_language,
                time_precision=time_precision)
            result = {"text": text, **optional}
            if adjust_pauses_threshold is not None and \
                    return_timestamps == "word":
                result = adjust_pauses(result, adjust_pauses_threshold)
            results.append(result)
        return results

    # ------------------------------------------------------------------
    def _run_chunks(self, chunks: list[Chunk], n_samples: int,
                    return_timestamps, prompt: Any | None = None
                    ) -> list[dict]:
        """Batch chunk windows into static [B, 480000] device batches and
        decode each with the seek-loop generate."""
        bs = self.pipe_opts.batch_size
        want_words = return_timestamps == "word"
        opts = self.gen_opts
        if not want_words and opts.return_token_timestamps:
            opts = GenerationOptions(
                **{**opts.__dict__, "return_token_timestamps": False})
        if prompt is not None:
            ids = (self.tokenizer.get_prompt_ids(prompt)
                   if isinstance(prompt, str) else np.asarray(prompt))
            opts = GenerationOptions(
                **{**opts.__dict__,
                   "prompt_ids": tuple(int(t) for t in ids)})

        data_shard = None
        if self.mesh is not None:
            from ..parallel import data_sharding
            data_shard = data_sharding(self.mesh)

        outputs: list[dict] = [None] * len(chunks)  # type: ignore
        for start in range(0, len(chunks), bs):
            group = chunks[start:start + bs]
            # pad the tail group to the full static batch (dummy rows are
            # dropped below) — ONE compiled program serves every group.
            # A single short group (len(chunks) <= bs: short files, the
            # serving batcher at low load) rounds up to the next POWER OF
            # 2 instead of running at its exact size: every distinct
            # batch is its own XLA program (a fresh multi-minute compile
            # on the axon backend), so this bounds the compiled-size set
            # to log2(bs) programs — and 2/4/8-row programs ride the
            # fused small-batch decode kernel when it is enabled.
            if len(chunks) > bs:
                gb = bs
            else:
                gb = min(1 << max(len(group) - 1, 0).bit_length(), bs)
            if self.mesh is not None:
                # batch dim is sharded over "data": round up so every
                # device gets equal rows
                data = self.mesh.shape["data"]
                gb = -(-gb // data) * data
            batch = np.zeros((gb, n_samples), np.float32)
            num_frames = np.full((gb,), n_samples // self.feat_cfg.hop_length,
                                 np.int64)
            for i, c in enumerate(group):
                batch[i, :len(c.samples)] = c.samples
                num_frames[i] = len(c.samples) // self.feat_cfg.hop_length
            batch_j = (jnp.asarray(batch) if data_shard is None
                       else jax.device_put(batch, data_shard))
            feats = extract_features(batch_j, self.feat_cfg)
            lang_tok = self._language_token()
            assistant = (self.assistant if self.assistant is not None
                         else ("prompt_lookup" if opts.prompt_lookup
                               else None))
            # latency-adaptive speculation (PipelineOptions
            # .assistant_max_batch): speculation wins at small batch and
            # loses at large batch on TPU, so gate the assistant on the
            # compiled batch size of THIS group
            amb = self.pipe_opts.assistant_max_batch
            if amb is not None and gb > amb:
                assistant = None
            gen = generate(self.params, self.arch, self.specials, opts,
                           feats, num_frames=num_frames,
                           language_token=lang_tok,
                           detect_language_first=(self.detect_language
                                                  and lang_tok is None),
                           batch_sharding=data_shard,
                           assistant=assistant)
            for i, c in enumerate(group):
                segs = gen.segments[i]
                toks = (np.concatenate([np.asarray(s["tokens"])
                                        for s in segs])
                        if segs else np.zeros(0, np.int64))
                out = {"tokens": toks[None], "stride": c.stride}
                if want_words:
                    tts = (np.concatenate(
                        [np.asarray(s["token_timestamps"]) for s in segs])
                        if segs else np.zeros(0, np.float32))
                    out["token_timestamps"] = tts[None]
                outputs[start + i] = out
        return outputs

    def _language_token(self) -> int | None:
        if self.gen_opts.language is None:
            return None
        return self.tokenizer.language_token_id(self.gen_opts.language)


def specials_from_tokenizer(tok: WhisperTokenizer) -> SpecialTokens:
    return SpecialTokens(
        eot=tok.eot, sot=tok.sot, translate=tok.translate,
        transcribe=tok.transcribe, sot_prev=tok.sot_prev,
        no_speech=tok.no_speech, no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin,
        language_begin=tok.sot + 1)

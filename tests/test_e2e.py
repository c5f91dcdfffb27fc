"""End-to-end: checkpoint dir -> load_pipeline -> CLI / serving batcher.

Exercises the from_pretrained-equivalent glue (hub.py), the safetensors
loader on a real on-disk checkpoint, the CLI (ref:transcribe.py surface),
and the multi-stream batcher (BASELINE config 5)."""

import json
import os

import numpy as np
import pytest

from helpers import TINY, TINY_SPECIALS, state_dict_numpy, torch_tiny_model
from vocab_fixture import build_model_vocab_dir

ALIGN_HEADS = [[0, 1], [1, 3], [0, 2]]
CHUNK_S = 5


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """Write a complete HF-format checkpoint directory for the tiny model."""
    import torch
    from safetensors.torch import save_file

    path = str(tmp_path_factory.mktemp("ckpt"))
    build_model_vocab_dir(path)
    tm = torch_tiny_model(seed=0)
    sd = {k: v.contiguous() for k, v in tm.state_dict().items()
          if k != "proj_out.weight"}
    save_file(sd, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({**TINY, "model_type": "whisper",
                   "median_filter_width": 7}, f)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({
            "alignment_heads": ALIGN_HEADS,
            "max_initial_timestamp_index": 50,
            "no_timestamps_token_id": TINY_SPECIALS.no_timestamps,
            "eos_token_id": TINY_SPECIALS.eot,
            "decoder_start_token_id": TINY_SPECIALS.sot,
            "temperature": 0.0,
        }, f)
    with open(os.path.join(path, "preprocessor_config.json"), "w") as f:
        json.dump({"feature_size": 80, "sampling_rate": 16000,
                   "n_fft": 400, "hop_length": 160,
                   "chunk_length": CHUNK_S}, f)
    return path


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    from scipy.io import wavfile
    rng = np.random.default_rng(0)
    n = 7 * 16000
    t = np.arange(n) / 16000.0
    audio = (0.2 * np.sin(2 * np.pi * 300 * t)
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("audio") / "test.wav")
    wavfile.write(path, 16000, (audio * 32767).astype(np.int16))
    return path


@pytest.fixture(scope="module")
def pipe(ckpt_dir):
    import jax.numpy as jnp
    from crisperwhisper_tpu.config import PipelineOptions
    from crisperwhisper_tpu.hub import load_pipeline
    return load_pipeline(
        ckpt_dir, dtype=jnp.float32,
        pipe_opts=PipelineOptions(chunk_length_s=CHUNK_S, batch_size=4,
                                  return_timestamps="word"))


def test_load_pipeline_and_transcribe(pipe, wav_path):
    out = pipe(wav_path, return_timestamps="word")
    assert isinstance(out["text"], str)
    assert len(out["chunks"]) > 0
    for c in out["chunks"]:
        s, e = c["timestamp"]
        # random-model outputs can have locally non-monotonic merged
        # boundaries (the HF stitcher has the same property); just check
        # the values are sane floats within the audio span
        assert 0.0 <= s <= 60.0 and 0.0 <= e <= 60.0


def test_cli(ckpt_dir, wav_path, capsys):
    from crisperwhisper_tpu.cli import main
    rc = main(["--f", wav_path, "--model", ckpt_dir,
               "--chunk-length-s", str(CHUNK_S), "--batch-size", "4",
               "--adjust-pauses", "0.12", "--json"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert "text" in result and "chunks" in result


def test_cli_missing_file(ckpt_dir, capsys):
    from crisperwhisper_tpu.cli import main
    assert main(["--f", "/nonexistent.wav", "--model", ckpt_dir]) == 1


def test_pipeline_list_input(pipe, wav_path):
    """Batched multi-audio call: list in -> list of results, each equal to
    the single-audio result."""
    from crisperwhisper_tpu.audio.io import read_wav
    _, audio = read_wav(wav_path)
    short = audio[: 3 * 16000]
    single_a = pipe({"raw": audio, "sampling_rate": 16000},
                    return_timestamps="word")
    single_b = pipe({"raw": short, "sampling_rate": 16000},
                    return_timestamps="word")
    batch = pipe([{"raw": audio, "sampling_rate": 16000},
                  {"raw": short, "sampling_rate": 16000}],
                 return_timestamps="word")
    assert isinstance(batch, list) and len(batch) == 2
    assert batch[0]["text"] == single_a["text"]
    assert batch[1]["text"] == single_b["text"]


def test_streaming_batcher_multi_stream(pipe, wav_path):
    from crisperwhisper_tpu.audio.io import read_wav
    from crisperwhisper_tpu.serving import StreamingBatcher
    _, audio = read_wav(wav_path)
    # reference single-shot results
    ref = pipe({"raw": audio, "sampling_rate": 16000},
               return_timestamps="word")
    batcher = StreamingBatcher(pipe)
    try:
        handles = [batcher.submit({"raw": audio, "sampling_rate": 16000})
                   for _ in range(4)]
        results = [h.result(timeout=300) for h in handles]
    finally:
        batcher.shutdown()
    for r in results:
        assert r["text"] == ref["text"]
        assert len(r["chunks"]) == len(ref["chunks"])


def test_streaming_batcher_live_partials(pipe, ckpt_dir):
    """BASELINE config 5 "live word-level timestamps": a client observes
    prefix-stable partial words BEFORE the stream completes
    (StreamingBatcher.submit(on_partial=...)). The batch size is shrunk
    below the chunk count so the stream spans several device batches."""
    import threading

    import jax.numpy as jnp
    import numpy as np

    from crisperwhisper_tpu.config import PipelineOptions
    from crisperwhisper_tpu.hub import load_pipeline
    from crisperwhisper_tpu.serving import StreamingBatcher

    small = load_pipeline(
        ckpt_dir, dtype=jnp.float32,
        pipe_opts=PipelineOptions(chunk_length_s=CHUNK_S, batch_size=1,
                                  return_timestamps="word"))
    rng = np.random.default_rng(3)
    n = 14 * 16000                      # ~4 chunks at 5 s / (5/6 s strides)
    t = np.arange(n) / 16000.0
    audio = (0.2 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * rng.standard_normal(n)).astype(np.float32)

    partials: list[dict] = []
    saw_before_done = threading.Event()
    batcher = StreamingBatcher(small, max_batch_delay_s=0.01)
    try:
        def on_partial(p):
            partials.append(p)
            saw_before_done.set()

        h = batcher.submit({"raw": audio, "sampling_rate": 16000},
                           on_partial=on_partial)
        final = h.result(timeout=600)
    finally:
        batcher.shutdown()

    assert saw_before_done.is_set() and partials, "no live partials seen"
    assert all(p["is_partial"] for p in partials)
    ns = [p["n_chunks_done"] for p in partials]
    assert ns == sorted(ns) and ns[-1] < partials[-1]["n_chunks"] + 1
    assert any(p["n_chunks_done"] < p["n_chunks"] for p in partials)
    # prefix stability: every partial\'s words except the LAST (the open
    # boundary word, which the next chunk may extend — see the submit
    # docstring contract) appear verbatim in the final word list
    final_words = [(c["text"], c["timestamp"]) for c in final["chunks"]]
    for p in partials:
        words = [(c["text"], c["timestamp"]) for c in p["chunks"]][:-1]
        assert words == final_words[:len(words)], (words, final_words)
    # polling surface: the handle retains the last partial
    assert h.partial() is not None and h.partial()["is_partial"]


def test_pipeline_prompt_lookup_matches_plain(pipe, ckpt_dir, wav_path):
    """GenerationOptions(prompt_lookup=True) routes the pipeline through
    the draft-free speculation path; transcripts must be identical."""
    from dataclasses import replace
    import jax.numpy as jnp
    from crisperwhisper_tpu.config import PipelineOptions
    from crisperwhisper_tpu.hub import load_pipeline

    ref = pipe(wav_path, return_timestamps="word")
    pl_pipe = load_pipeline(
        ckpt_dir, dtype=jnp.float32,
        pipe_opts=PipelineOptions(chunk_length_s=CHUNK_S, batch_size=4,
                                  return_timestamps="word"))
    pl_pipe.gen_opts = replace(pl_pipe.gen_opts, prompt_lookup=True,
                               assistant_spec_len=3)
    got = pl_pipe(wav_path, return_timestamps="word")
    assert got["text"] == ref["text"]
    assert [c["timestamp"] for c in got["chunks"]] == \
        [c["timestamp"] for c in ref["chunks"]]


def test_pipeline_self_draft_b1_kernel_serving(ckpt_dir, wav_path,
                                               monkeypatch):
    """The full compound single-stream serving config through the real
    surface — load_pipeline(quantize=True, assistant="self:1") with
    GenerationOptions(b1_decode_kernel=True, self_kv_cache_int8=True) at
    batch_size=1: the DRAFT chain and the verify block must both run on
    the batch-1 Pallas kernel (draft_quant gate), and the transcript
    must equal the same pipeline decoding plain greedy on the kernel
    (exactness contract end-to-end)."""
    from dataclasses import replace
    import jax.numpy as jnp
    from crisperwhisper_tpu.config import PipelineOptions
    from crisperwhisper_tpu.hub import load_pipeline
    from crisperwhisper_tpu.ops import pallas_decode_b1 as _b1k

    pipe_opts = PipelineOptions(chunk_length_s=CHUNK_S, batch_size=1,
                                return_timestamps="word")

    # record which archs hit the kernel (draft has 1 decoder layer,
    # main has 2) — called at trace time, so counters survive jit
    seen_layers: list[int] = []
    real_single, real_multi = _b1k.decode_step_b1, _b1k.decode_step_b1_multi
    multi_hits: list[int] = []

    def spy_single(params, arch, *a, **kw):
        seen_layers.append(arch.decoder_layers)
        return real_single(params, arch, *a, **kw)

    def spy_multi(params, arch, *a, **kw):
        multi_hits.append(arch.decoder_layers)
        return real_multi(params, arch, *a, **kw)

    monkeypatch.setattr(_b1k, "decode_step_b1", spy_single)
    monkeypatch.setattr(_b1k, "decode_step_b1_multi", spy_multi)

    spec_pipe = load_pipeline(ckpt_dir, dtype=jnp.float32, quantize=True,
                              assistant="self:1", pipe_opts=pipe_opts)
    spec_pipe.gen_opts = replace(spec_pipe.gen_opts,
                                 b1_decode_kernel=True,
                                 self_kv_cache_int8=True,
                                 assistant_spec_len=3)
    got = spec_pipe(wav_path, return_timestamps="word")

    assert 1 in seen_layers, "draft chain did not route to the B=1 kernel"
    assert 2 in multi_hits, "verify block did not route to the B=1 kernel"

    ref_pipe = load_pipeline(ckpt_dir, dtype=jnp.float32, quantize=True,
                             pipe_opts=pipe_opts)
    ref_pipe.gen_opts = replace(ref_pipe.gen_opts,
                                b1_decode_kernel=True,
                                self_kv_cache_int8=True)
    ref = ref_pipe(wav_path, return_timestamps="word")

    assert got["text"] == ref["text"]
    assert [c["timestamp"] for c in got["chunks"]] == \
        [c["timestamp"] for c in ref["chunks"]]


def test_pipeline_rows_kernel_small_batch(ckpt_dir, wav_path, monkeypatch):
    """A quantized pipeline at batch_size=4 with
    GenerationOptions(b1_decode_kernel=True, self_kv_cache_int8=True)
    must route its decode loop through the SMALL-BATCH rows kernel
    (decode_step_rows engages for 2..8 streams via supported_rows) and
    produce a well-formed word-timestamped transcript. Numerics parity
    for the kernel is pinned at the decoder level
    (tests/test_b1_kernel.py::test_b1_kernel_rows_greedy_integration);
    this pins the SERVING surface wiring."""
    from dataclasses import replace
    import jax.numpy as jnp
    from crisperwhisper_tpu.config import PipelineOptions
    from crisperwhisper_tpu.hub import load_pipeline
    from crisperwhisper_tpu.ops import pallas_decode_b1 as _b1k

    rows_hits: list[int] = []
    real_rows = _b1k.decode_step_rows

    def spy_rows(params, arch, tokens, *a, **kw):
        rows_hits.append(int(tokens.shape[0]))
        return real_rows(params, arch, tokens, *a, **kw)

    monkeypatch.setattr(_b1k, "decode_step_rows", spy_rows)

    pipe = load_pipeline(
        ckpt_dir, dtype=jnp.float32, quantize=True,
        pipe_opts=PipelineOptions(chunk_length_s=CHUNK_S, batch_size=4,
                                  return_timestamps="word"))
    pipe.gen_opts = replace(pipe.gen_opts, b1_decode_kernel=True,
                            self_kv_cache_int8=True)
    out = pipe(wav_path, return_timestamps="word")

    assert rows_hits and all(1 < r <= 8 for r in rows_hits), rows_hits
    assert isinstance(out["text"], str)
    assert len(out["chunks"]) > 0
    for c in out["chunks"]:
        assert c["timestamp"][0] is not None


def test_pipeline_warmup_precompiles_pow2_sizes(pipe, wav_path):
    """warmup() must compile every power-of-2 chunk-batch program up to
    batch_size (the serving batcher's precompile hook) and leave the
    pipeline's outputs unchanged."""
    sizes = pipe.warmup()
    bs = pipe.pipe_opts.batch_size
    assert sizes[-1] == bs
    assert sizes[:-1] == [1 << i for i in range(len(sizes) - 1)]
    out = pipe(wav_path, return_timestamps="word")
    assert isinstance(out["text"], str) and len(out["chunks"]) > 0


def test_streaming_batcher_partials_multi_stream(pipe, wav_path):
    """Partials under concurrency: several streams with callbacks share
    the finalizer thread; every stream still gets ordered partials and
    a final result identical to the single-shot pipeline."""
    import threading
    from collections import defaultdict

    from crisperwhisper_tpu.audio.io import read_wav
    from crisperwhisper_tpu.serving import StreamingBatcher

    _, audio = read_wav(wav_path)
    ref = pipe({"raw": audio, "sampling_rate": 16000},
               return_timestamps="word")
    partials = defaultdict(list)
    lock = threading.Lock()
    batcher = StreamingBatcher(pipe, max_batch_delay_s=0.01)
    try:
        def cb(i):
            def on_partial(p):
                with lock:
                    partials[i].append(p["n_chunks_done"])
            return on_partial

        handles = [batcher.submit({"raw": audio, "sampling_rate": 16000},
                                  on_partial=cb(i)) for i in range(3)]
        results = [h.result(timeout=300) for h in handles]
    finally:
        batcher.shutdown()
    for r in results:
        assert r["text"] == ref["text"]
    for i in range(3):
        assert partials[i] == sorted(partials[i])   # ordered, no dupes
        assert len(set(partials[i])) == len(partials[i])


def test_live_session_matches_offline_pipeline(pipe, wav_path):
    """LiveSession equivalence contract: feeding the audio in arbitrary
    block sizes then finish() returns EXACTLY the offline pipeline's
    result (same chunk boundaries as chunk_iter; batched-vs-single
    decode parity pinned elsewhere). Partials arrive while feeding and
    are prefix-stable except the open boundary word."""
    import numpy as np

    from crisperwhisper_tpu.audio.io import read_wav
    from crisperwhisper_tpu.serving import LiveSession

    _, audio = read_wav(wav_path)
    ref = pipe({"raw": audio, "sampling_rate": 16000},
               return_timestamps="word", adjust_pauses_threshold=0.12)

    partials = []
    sess = LiveSession(pipe, adjust_pauses_threshold=0.12,
                       on_partial=partials.append)
    rng = np.random.default_rng(5)
    i = 0
    while i < len(audio):
        n = int(rng.integers(1000, 40000))      # ragged live blocks
        sess.feed(audio[i:i + n])
        i += n
    final = sess.finish()

    assert final == ref                          # bit-identical result
    assert partials, "no live partials during feed"
    assert all(p["is_partial"] for p in partials)
    ns = [p["n_chunks_done"] for p in partials]
    assert ns == sorted(ns)
    final_words = [(c["text"], c["timestamp"]) for c in ref["chunks"]]
    # NOTE: the final result above is pause-adjusted; compare partial
    # prefixes against the unadjusted stitch instead
    raw = pipe({"raw": audio, "sampling_rate": 16000},
               return_timestamps="word")
    raw_words = [(c["text"], c["timestamp"]) for c in raw["chunks"]]
    for p in partials:
        words = [(c["text"], c["timestamp"]) for c in p["chunks"]][:-1]
        assert words == raw_words[:len(words)], (words, raw_words)

    import pytest
    with pytest.raises(RuntimeError):
        sess.feed(audio[:100])


def test_live_session_empty_stream(pipe):
    from crisperwhisper_tpu.serving import LiveSession
    sess = LiveSession(pipe)
    assert sess.finish() == {"text": "", "chunks": []}

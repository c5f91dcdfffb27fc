"""End-to-end smoke test on the real TPU chip.

CI (tests/) runs on a virtual CPU mesh; this script drives the FULL
pipeline — checkpoint dir -> load_pipeline -> chunked transcription with
word timestamps + pause adjustment — on the actual device, in bf16, with
serving quantization on, using the tiny seed-pinned checkpoint.

Run: python scripts/tpu_smoke.py
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    import jax
    print("devices:", jax.devices(), flush=True)

    from helpers import TINY, TINY_SPECIALS, torch_tiny_model
    from vocab_fixture import build_model_vocab_dir
    from safetensors.torch import save_file

    ckpt = tempfile.mkdtemp(prefix="cw_smoke_")
    build_model_vocab_dir(ckpt)
    tm = torch_tiny_model(seed=0)
    sd = {k: v.contiguous() for k, v in tm.state_dict().items()
          if k != "proj_out.weight"}
    save_file(sd, os.path.join(ckpt, "model.safetensors"))
    with open(os.path.join(ckpt, "config.json"), "w") as f:
        json.dump({**TINY, "model_type": "whisper",
                   "median_filter_width": 7}, f)
    with open(os.path.join(ckpt, "generation_config.json"), "w") as f:
        json.dump({"alignment_heads": [[0, 1], [1, 3]],
                   "max_initial_timestamp_index": 50,
                   "temperature": 0.0}, f)
    with open(os.path.join(ckpt, "preprocessor_config.json"), "w") as f:
        json.dump({"feature_size": 80, "sampling_rate": 16000,
                   "n_fft": 400, "hop_length": 160, "chunk_length": 5}, f)

    import jax.numpy as jnp
    from crisperwhisper_tpu.config import PipelineOptions
    from crisperwhisper_tpu.hub import load_pipeline

    pipe = load_pipeline(
        ckpt, dtype=jnp.bfloat16, quantize=True,
        pipe_opts=PipelineOptions(chunk_length_s=5, batch_size=4,
                                  return_timestamps="word"))
    rng = np.random.default_rng(0)
    n = 12 * 16000
    t = np.arange(n) / 16000.0
    audio = (0.2 * np.sin(2 * np.pi * 300 * t)
             + 0.1 * rng.standard_normal(n)).astype(np.float32)

    out = pipe({"raw": audio, "sampling_rate": 16000},
               return_timestamps="word", adjust_pauses_threshold=0.12)
    assert isinstance(out["text"], str) and len(out["chunks"]) > 0
    print("text:", out["text"][:120])
    print("words:", len(out["chunks"]))
    print("meter:", pipe.meter.summary())
    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()

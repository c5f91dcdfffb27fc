"""Long-form stress: many-chunk pipeline run (BASELINE config 3 shape).

Pushes N minutes of synthetic audio through the chunked pipeline on the
tiny checkpoint and reports stage timing — validates memory stability over
many batch groups and measures the host-side stitcher cost at scale.

Run: python scripts/longform_stress.py [minutes]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    from helpers import TINY, TINY_SPECIALS, torch_tiny_model
    from vocab_fixture import build_model_vocab_dir
    from safetensors.torch import save_file

    ckpt = tempfile.mkdtemp(prefix="cw_stress_")
    build_model_vocab_dir(ckpt)
    tm = torch_tiny_model(seed=0)
    sd = {k: v.contiguous() for k, v in tm.state_dict().items()
          if k != "proj_out.weight"}
    save_file(sd, os.path.join(ckpt, "model.safetensors"))
    json.dump({**TINY, "model_type": "whisper", "median_filter_width": 7},
              open(os.path.join(ckpt, "config.json"), "w"))
    json.dump({"alignment_heads": [[0, 1], [1, 3]],
               "max_initial_timestamp_index": 50, "temperature": 0.0},
              open(os.path.join(ckpt, "generation_config.json"), "w"))
    json.dump({"feature_size": 80, "sampling_rate": 16000, "n_fft": 400,
               "hop_length": 160, "chunk_length": 5},
              open(os.path.join(ckpt, "preprocessor_config.json"), "w"))

    import jax.numpy as jnp
    from crisperwhisper_tpu.config import PipelineOptions
    from crisperwhisper_tpu.hub import load_pipeline

    pipe = load_pipeline(
        ckpt, dtype=jnp.bfloat16, quantize=True,
        pipe_opts=PipelineOptions(chunk_length_s=5, batch_size=8,
                                  return_timestamps="word"))
    rng = np.random.default_rng(0)
    n = int(minutes * 60 * 16000)
    t = np.arange(n) / 16000.0
    audio = (0.2 * np.sin(2 * np.pi * 300 * t)
             + 0.1 * rng.standard_normal(n)).astype(np.float32)

    t0 = time.perf_counter()
    out = pipe({"raw": audio, "sampling_rate": 16000},
               return_timestamps="word", adjust_pauses_threshold=0.12)
    wall = time.perf_counter() - t0
    print(f"audio: {minutes:.1f} min  wall: {wall:.1f} s  "
          f"RTFx: {minutes * 60 / wall:.1f}")
    print(f"words: {len(out['chunks'])}  text chars: {len(out['text'])}")
    print("meter:", pipe.meter.summary())
    print("LONGFORM STRESS OK")


if __name__ == "__main__":
    main()

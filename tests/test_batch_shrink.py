"""Dynamic batch shrink in the long-form seek loop (hf _maybe_reduce_batch
:1837-1851 analog): heterogeneous-length rows are compacted into
power-of-2 buckets once rows finish. The contract: batched output is
IDENTICAL to running each row alone."""

import numpy as np

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import generate
from crisperwhisper_tpu.models import init_params
from helpers import TINY_SPECIALS, rand_mel, tiny_arch


def test_batched_heterogeneous_equals_per_row():
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    opts = GenerationOptions(max_initial_timestamp_index=50,
                             max_new_tokens=24, temperatures=(0.0,),
                             compression_ratio_threshold=None,
                             logprob_threshold=None,
                             no_speech_threshold=None)
    frames = 1250                      # 2.5 windows of the 500-frame tiny
    mel = rand_mel(batch=3, seed=31, frames=frames)
    # row lengths: 1 window, ~1.5 windows, 2.5 windows -> the bucket
    # shrinks 3 -> 2 -> 1 as rows finish
    lens = np.array([500, 800, 1250])

    batched = generate(params, arch, TINY_SPECIALS, opts, jnp.asarray(mel),
                       num_frames=lens, max_frames=lens)
    for i in range(3):
        solo = generate(params, arch, TINY_SPECIALS, opts,
                        jnp.asarray(mel[i:i + 1]),
                        num_frames=lens[i:i + 1],
                        max_frames=lens[i:i + 1])
        bi = batched.sequences[i]
        si = solo.sequences[0]
        L = min(len(bi), len(si))
        np.testing.assert_array_equal(bi[:L], si[:L])
        # padding beyond the shorter one must be eot
        assert (bi[L:] == TINY_SPECIALS.eot).all()
        assert (si[L:] == TINY_SPECIALS.eot).all()
        assert len(batched.segments[i]) == len(solo.segments[0])

"""Property tests (SURVEY.md §4.2): timestamp-grammar invariants on
generated sequences, and LCS order preservation in the stitcher."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import greedy_decode_jit
from crisperwhisper_tpu.models import encode, init_params
from helpers import TINY_SPECIALS, rand_mel, tiny_arch


@pytest.mark.parametrize("seed", range(4))
def test_timestamp_grammar_invariants(seed):
    """Every generated sequence: starts with a timestamp <= max_initial,
    timestamps non-decreasing, timestamps appear in pairs except a single
    final one, text never follows an unclosed final timestamp."""
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(seed))
    mel = rand_mel(batch=3, seed=100 + seed)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.full((3, 1), TINY_SPECIALS.sot, jnp.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50)
    res = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            24)
    tsb = TINY_SPECIALS.timestamp_begin
    eot = TINY_SPECIALS.eot
    seqs = np.asarray(res.sequences)
    ngen = np.asarray(res.num_generated)
    for i in range(3):
        g = int(ngen[i])
        seq = [int(t) for t in seqs[i, 1:1 + g]]
        if seq and seq[-1] == eot:
            seq = seq[:-1]
        if not seq:
            continue
        # starts with a bounded initial timestamp
        assert seq[0] >= tsb
        assert seq[0] <= tsb + opts.max_initial_timestamp_index
        # non-decreasing timestamps
        ts = [t for t in seq if t >= tsb]
        assert ts == sorted(ts), seq
        # pairing: consecutive runs of timestamps have length 1 or 2,
        # except a possibly-single final timestamp
        runs = []
        run = 0
        for t in seq:
            if t >= tsb:
                run += 1
            elif run:
                runs.append(run)
                run = 0
        if run:
            runs.append(run)
        # first run is the opening timestamp (1); middle runs are pairs
        interior = runs[1:-1] if len(runs) > 2 else []
        assert all(r == 2 for r in interior), (runs, seq)
        # <|notimestamps|> is never emitted
        assert TINY_SPECIALS.no_timestamps not in seq


@pytest.mark.parametrize("seed", range(5))
def test_lcs_preserves_order_and_membership(seed):
    """Merged sequence is formed of a prefix of the left and a suffix of
    the right around the overlap split — order is preserved and no new
    tokens are invented."""
    from crisperwhisper_tpu.tokenizer import find_longest_common_sequence
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 40, size=50).tolist()
    left, right = base[:32], base[20:]
    merged = find_longest_common_sequence([left, right])
    # no invented tokens
    assert set(merged) <= set(left) | set(right)
    # merged = left-prefix + right-suffix
    for cut in range(len(merged) + 1):
        pre, suf = merged[:cut], merged[cut:]
        if (pre == left[:len(pre)]
                and suf == right[len(right) - len(suf):]):
            break
    else:
        raise AssertionError((left, right, merged))

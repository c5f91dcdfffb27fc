"""Native C++ components: build, BPE decode parity, WAV decode parity."""

import numpy as np
import pytest

from vocab_fixture import build_vocab_dir, our_tokenizer


@pytest.fixture(scope="module")
def lib():
    from crisperwhisper_tpu.native_bindings import get_lib
    lib = get_lib()
    if lib is None:
        pytest.skip("g++ unavailable — native library not built")
    return lib


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nvocab"))
    build_vocab_dir(path)
    return our_tokenizer(path)


def test_native_bpe_decode_parity(lib, tok, tmp_path):
    from crisperwhisper_tpu.native_bindings import NativeBPEDecoder
    dec = NativeBPEDecoder(tok.bpe, cache_path=str(tmp_path / "v.cwvb"))
    assert dec.available
    rng = np.random.default_rng(0)
    for trial in range(5):
        ids = rng.integers(0, len(tok.bpe.encoder), size=50).tolist()
        golden = tok.bpe.decode_tokens(
            tok.bpe.decoder[i] for i in ids if i in tok.bpe.decoder)
        assert dec.decode(ids) == golden
    # multibyte utf-8 via byte tokens
    text = " héllo wörld 你好"
    ids = tok.bpe.encode(text)
    assert dec.decode(ids) == text


def test_native_wav_parity(lib, tmp_path):
    import io
    from scipy.io import wavfile
    from crisperwhisper_tpu.native_bindings import native_read_wav
    rng = np.random.default_rng(1)
    audio = np.clip(rng.standard_normal(4000) * 0.3, -0.95,
                    0.95).astype(np.float32)

    for dtype, scale in [(np.int16, 32767), (np.float32, 1.0),
                         (np.int32, 2147483647)]:
        buf = io.BytesIO()
        wavfile.write(buf, 16000, (audio * scale).astype(dtype))
        out = native_read_wav(buf.getvalue())
        assert out is not None, dtype
        sr, data = out
        assert sr == 16000
        np.testing.assert_allclose(data, audio, atol=2e-4, err_msg=str(dtype))

    # stereo mixdown
    buf = io.BytesIO()
    wavfile.write(buf, 8000, np.stack(
        [(audio * 32767).astype(np.int16)] * 2, axis=1))
    sr, data = native_read_wav(buf.getvalue())
    assert sr == 8000
    np.testing.assert_allclose(data, audio, atol=2e-4)


def test_tokenizer_uses_native_transparently(tok):
    """bpe.decode routes through C++ when available and must equal the
    pure-Python path either way."""
    ids = tok.bpe.encode(" hello world the cat")
    via_decode = tok.bpe.decode(ids)
    pure = tok.bpe.decode_tokens(tok.bpe.decoder[i] for i in ids)
    assert via_decode == pure == " hello world the cat"


def test_native_bpe_encode_parity(lib, tok, tmp_path):
    """C++ cw_encode (pre-tokenize + merge loop) against the pure-Python
    oracle — closes the encode half of the fast-tokenizer replacement
    (hf models/whisper/tokenization_whisper_fast.py is the Rust-backed
    original; VERDICT r3 §2.5 'partial')."""
    import random
    from crisperwhisper_tpu.native_bindings import NativeBPEEncoder
    enc = NativeBPEEncoder(tok.bpe, cache_path=str(tmp_path / "e.cweb"))
    assert enc.available

    texts = [
        "hello world", " leading space", "it's a test, isn't it?  two",
        "don't stop 123 456.78 [UH] um", "tabs\tand\nnewlines \t mix",
        "ünïcödé tëst ß 漢字テスト  мир", "a'b'll'd x", "", " ", "   ", "'",
        "CamelCase WORDS lower", "e=mc^2 + 3.14*r", "emoji 🙂 test 🎉!",
    ]
    rng = random.Random(0)
    alphabet = (list("abc ABC 0123 .,!?'\t\n  ")
                + ["é", "漢", "🙂", "ß", "'s", "'ll"])
    texts += ["".join(rng.choice(alphabet)
                      for _ in range(rng.randrange(0, 40)))
              for _ in range(200)]
    for t in texts:
        assert enc.encode(t) == tok.bpe.encode_python(t), repr(t)


def test_native_encode_routed_and_optout(tok, monkeypatch):
    """bpe.encode routes through C++ transparently; CW_NATIVE_ENCODE=0
    keeps it on the oracle. Both must agree."""
    text = " it's 42 worlds  🙂"
    via_encode = tok.bpe.encode(text)
    assert via_encode == tok.bpe.encode_python(text)
    import crisperwhisper_tpu.tokenizer.bpe as bpe_mod
    fresh = bpe_mod.ByteLevelBPE(tok.bpe.encoder, tok.bpe.bpe_ranks)
    monkeypatch.setenv("CW_NATIVE_ENCODE", "0")
    assert fresh._native_encoder() is None
    assert fresh.encode(text) == via_encode


def test_native_encode_oov_falls_back_to_python(lib, tok, tmp_path):
    """A symbol with no vocab id makes the native call fail (-2) and
    encode() fall through to the Python path, which raises the same
    KeyError HF's slow tokenizer would."""
    import crisperwhisper_tpu.tokenizer.bpe as bpe_mod
    from crisperwhisper_tpu.native_bindings import NativeBPEEncoder
    # vocab missing most single bytes: keep only ascii letters + space
    keep = {k: v for k, v in tok.bpe.encoder.items()
            if all(ch.isalpha() or ch == "Ġ" or ch == " "
                   for ch in k)}
    small = bpe_mod.ByteLevelBPE(keep, tok.bpe.bpe_ranks)
    enc = NativeBPEEncoder(small, cache_path=str(tmp_path / "s.cweb"))
    assert enc.available
    with pytest.raises(RuntimeError):
        enc.encode("%%%")          # '%' byte has no id in `keep`
    with pytest.raises(KeyError):
        small.encode("%%%")        # full path surfaces the Python error


def test_encoder_load_rejects_malformed_blob(lib, tmp_path):
    """cw_encoder_load must return NULL on corrupt offset tables instead
    of throwing std::out_of_range across the extern-C boundary (ADVICE
    r4 item 4): non-monotonic offsets, truncated data, absurd counts."""
    import numpy as np

    def load(payload: bytes):
        p = tmp_path / "bad.cweb"
        p.write_bytes(payload)
        return lib.cw_encoder_load(str(p).encode())

    u32 = lambda v: np.uint32(v).tobytes()
    head = b"CWEB" + u32(1)
    # non-monotonic token offsets: substr would see pos > size
    bad_toff = (head + u32(2) + u32(0) + u32(10) + u32(4) + b"abcd")
    assert load(bad_toff) is None
    # absurd token count (allocation bomb)
    assert load(head + u32(0xFFFFFFF0)) is None
    # truncated: claims 3 tokens, offsets table missing
    assert load(head + u32(3) + u32(0)) is None
    # valid empty tables but non-monotonic MERGE offsets
    bad_moff = (head + u32(1) + u32(0) + u32(1) + b"a"
                + u32(1) + u32(0) + u32(8) + u32(2) + b"ab")
    assert load(bad_moff) is None
    # wrong magic
    assert load(b"NOPE" + u32(1)) is None

// Native runtime helpers for crisperwhisper_tpu.
//
// Replaces the Rust `tokenizers` backend of the reference's fast tokenizer
// (SURVEY.md §2.7) with a C++ codec, plus a first-party RIFF/WAV decoder
// for the no-ffmpeg ingestion path. Exposed through a plain C ABI consumed
// via ctypes (no pybind11 in this environment).
//
// Vocabulary format ("cwvb1"): Python pre-resolves the byte-level BPE
// unicode indirection and writes id -> raw bytes:
//   magic "CWVB" | u32 n | u32 offsets[n+1] | u8 data[]
// Decode is then pure concatenation — the hot direction for ASR output.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// BPE vocab
// ---------------------------------------------------------------------------

struct CwVocab {
  std::vector<uint32_t> offsets;
  std::vector<uint8_t> data;
  uint32_t n = 0;
};

void* cw_vocab_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  char magic[4];
  if (std::fread(magic, 1, 4, f) != 4 || std::memcmp(magic, "CWVB", 4)) {
    std::fclose(f);
    return nullptr;
  }
  auto* v = new CwVocab();
  uint32_t n = 0;
  if (std::fread(&n, 4, 1, f) != 1) { delete v; std::fclose(f); return nullptr; }
  v->n = n;
  v->offsets.resize(n + 1);
  if (std::fread(v->offsets.data(), 4, n + 1, f) != n + 1) {
    delete v; std::fclose(f); return nullptr;
  }
  uint32_t total = v->offsets[n];
  v->data.resize(total);
  if (total && std::fread(v->data.data(), 1, total, f) != total) {
    delete v; std::fclose(f); return nullptr;
  }
  std::fclose(f);
  return v;
}

void cw_vocab_free(void* vocab) { delete static_cast<CwVocab*>(vocab); }

// Decode `n_ids` token ids into `out` (caller-allocated, cap bytes).
// Ids outside the vocab are skipped (specials/timestamps are handled in
// Python). Returns bytes written, or -1 if `cap` is too small.
int64_t cw_decode(void* vocab, const int32_t* ids, int64_t n_ids,
                  uint8_t* out, int64_t cap) {
  auto* v = static_cast<CwVocab*>(vocab);
  int64_t w = 0;
  for (int64_t i = 0; i < n_ids; ++i) {
    int32_t id = ids[i];
    if (id < 0 || static_cast<uint32_t>(id) >= v->n) continue;
    uint32_t a = v->offsets[id], b = v->offsets[id + 1];
    int64_t len = b - a;
    if (w + len > cap) return -1;
    std::memcpy(out + w, v->data.data() + a, len);
    w += len;
  }
  return w;
}

// ---------------------------------------------------------------------------
// WAV reader: RIFF PCM16/24/32 + float32/64 -> mono f32
// ---------------------------------------------------------------------------

// Parses `buf` and fills header info. Returns 0 on success.
int cw_wav_info(const uint8_t* buf, int64_t len, int32_t* sample_rate,
                int32_t* channels, int32_t* bits, int32_t* is_float,
                int64_t* data_off, int64_t* data_len) {
  if (len < 44 || std::memcmp(buf, "RIFF", 4) || std::memcmp(buf + 8, "WAVE", 4))
    return -1;
  int64_t p = 12;
  int32_t fmt = 0, ch = 0, sr = 0, bps = 0;
  int64_t doff = -1, dlen = 0;
  while (p + 8 <= len) {
    uint32_t sz;
    std::memcpy(&sz, buf + p + 4, 4);
    if (!std::memcmp(buf + p, "fmt ", 4) && p + 8 + 16 <= len) {
      uint16_t w;
      std::memcpy(&w, buf + p + 8, 2); fmt = w;
      std::memcpy(&w, buf + p + 10, 2); ch = w;
      std::memcpy(&sr, buf + p + 12, 4);
      std::memcpy(&w, buf + p + 22, 2); bps = w;
      // WAVE_FORMAT_EXTENSIBLE: the sub-format lives past the base fmt
      // body; a truncated buffer whose fmt chunk *claims* sz>=40 must not
      // be read past `len`.
      if (fmt == 0xFFFE && sz >= 40 && p + 8 + 26 <= len) {
        uint16_t sub;
        std::memcpy(&sub, buf + p + 8 + 24, 2);
        fmt = sub;
      }
    } else if (!std::memcmp(buf + p, "data", 4)) {
      doff = p + 8;
      dlen = sz;
      if (doff + dlen > len) dlen = len - doff;
      break;
    }
    p += 8 + sz + (sz & 1);
  }
  if (doff < 0 || ch <= 0 || sr <= 0) return -2;
  *sample_rate = sr;
  *channels = ch;
  *bits = bps;
  *is_float = (fmt == 3) ? 1 : 0;
  *data_off = doff;
  *data_len = dlen;
  return 0;
}

// Decode samples to mono f32. Returns frames written or <0 on error.
int64_t cw_wav_decode(const uint8_t* buf, int64_t len, float* out,
                      int64_t max_frames) {
  int32_t sr, ch, bits, isf;
  int64_t off, dlen;
  int rc = cw_wav_info(buf, len, &sr, &ch, &bits, &isf, &off, &dlen);
  if (rc != 0) return rc;
  int64_t bytes_per = (bits / 8) * ch;
  if (bytes_per <= 0) return -3;
  int64_t frames = dlen / bytes_per;
  if (frames > max_frames) frames = max_frames;
  const uint8_t* d = buf + off;
  for (int64_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int32_t c = 0; c < ch; ++c) {
      const uint8_t* s = d + i * bytes_per + c * (bits / 8);
      double val = 0.0;
      if (isf && bits == 32) {
        float fv; std::memcpy(&fv, s, 4); val = fv;
      } else if (isf && bits == 64) {
        double dv; std::memcpy(&dv, s, 8); val = dv;
      } else if (bits == 16) {
        int16_t iv; std::memcpy(&iv, s, 2); val = iv / 32768.0;
      } else if (bits == 32) {
        int32_t iv; std::memcpy(&iv, s, 4); val = iv / 2147483648.0;
      } else if (bits == 24) {
        int32_t iv = (s[0] | (s[1] << 8) | (s[2] << 16));
        if (iv & 0x800000) iv |= ~0xFFFFFF;
        val = iv / 8388608.0;
      } else if (bits == 8) {
        val = (s[0] - 128) / 128.0;
      } else {
        return -4;
      }
      acc += val;
    }
    out[i] = static_cast<float>(acc / ch);
  }
  return frames;
}

}  // extern "C"

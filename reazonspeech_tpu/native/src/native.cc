// reazonspeech_tpu native host-side kernels (C++17, no external deps).
//
// The reference delegates these to external native packages (SURVEY.md §2.2):
// editdistance (C++) for CER, libsndfile/librosa (C) for PCM decode, and its
// pure-Python MPEG-TS scan is flagged as a C++ candidate for corpus-building
// throughput (SURVEY.md §2.1 O1). Exposed via a plain C ABI for ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Levenshtein distance over UTF-32 code points (matches editdistance.eval
// and the reference's Wagner-Fischer, pkg/espnet-oneseg/src/text.py:16-32).
int64_t rs_edit_distance(const uint32_t* a, int64_t na, const uint32_t* b,
                         int64_t nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    cur[0] = i;
    const uint32_t ai = a[i - 1];
    for (int64_t j = 1; j <= nb; ++j) {
      if (ai == b[j - 1]) {
        cur[j] = prev[j - 1];
      } else {
        cur[j] = std::min({prev[j], cur[j - 1], prev[j - 1]}) + 1;
      }
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// PCM int16 -> float32 (the hot loop of WAV decode).
void rs_pcm16_to_f32(const int16_t* in, int64_t n, float* out) {
  constexpr float kScale = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kScale;
}

// PCM int24 (packed 3-byte little-endian) -> float32.
void rs_pcm24_to_f32(const uint8_t* in, int64_t n_samples, float* out) {
  constexpr float kScale = 1.0f / 8388608.0f;
  for (int64_t i = 0; i < n_samples; ++i) {
    const uint8_t* p = in + 3 * i;
    int32_t v = p[0] | (p[1] << 8) | (p[2] << 16);
    if (v & 0x800000) v -= 0x1000000;
    out[i] = v * kScale;
  }
}

// MPEG-TS scan: find 188-byte-aligned packets of a given PID with PUSI set.
// Writes packet byte-offsets into `offsets` (capacity `max_out`), returns the
// count. A fast pre-filter for the Python caption demuxer: only caption-PID
// payload starts cross back into Python.
int64_t rs_ts_scan_pid(const uint8_t* data, int64_t size, int32_t pid,
                       int32_t require_pusi, int64_t* offsets,
                       int64_t max_out) {
  int64_t count = 0;
  for (int64_t pos = 0; pos + 188 <= size; pos += 188) {
    const uint8_t* pkt = data + pos;
    if (pkt[0] != 0x47) continue;
    int32_t p = ((pkt[1] & 0x1F) << 8) | pkt[2];
    if (p != pid) continue;
    if (require_pusi && !(pkt[1] & 0x40)) continue;
    if (count < max_out) offsets[count] = pos;
    ++count;
  }
  return count;
}

// Downmix interleaved multichannel float32 to mono (mean over channels).
void rs_downmix_mean(const float* in, int64_t frames, int32_t channels,
                     float* out) {
  const float inv = 1.0f / channels;
  for (int64_t i = 0; i < frames; ++i) {
    float acc = 0.0f;
    const float* p = in + i * channels;
    for (int32_t c = 0; c < channels; ++c) acc += p[c];
    out[i] = acc * inv;
  }
}

}  // extern "C"

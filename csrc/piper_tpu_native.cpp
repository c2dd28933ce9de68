// piper_tpu native host kernels.
//
// C++ counterparts of the reference runtime's host-side hot loops
// (reference: src/cpp/piper.cpp:410-431 peak-scan + int16 scaling,
// src/cpp/wavfile.hpp RIFF writing, src/python/piper_train/norm_audio/
// trim.py chunked RMS scan). The device compute path is JAX/XLA; these
// cover the O(T) host post-processing that sits between device output
// and the wire, called via ctypes (see piper_tpu/native/__init__.py)
// with a numpy fallback when the library isn't built.
//
// Build: make -C csrc  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cmath>
#include <cstring>
#include <algorithm>

extern "C" {

// Max |x| over a float buffer (vectorizes under -O3).
float pt_peak_abs(const float* in, int64_t n) {
  float peak = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float a = std::fabs(in[i]);
    if (a > peak) peak = a;
  }
  return peak;
}

// Scale float audio to int16 with clipping. Returns the scale used.
// Parity: audio * (max_wav / max(0.01, peak)), clip
// (reference: src/python_run/piper/util.py:5-12, piper.cpp:410-431).
float pt_normalize_to_int16(const float* in, int16_t* out, int64_t n,
                            float max_wav_value) {
  float peak = pt_peak_abs(in, n);
  float denom = peak > 0.01f ? peak : 0.01f;
  float scale = max_wav_value / denom;
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i] * scale;
    v = std::min(std::max(v, -max_wav_value), max_wav_value);
    out[i] = (int16_t)v;
  }
  return scale;
}

// Plain scaled conversion (pre-computed scale), with clipping.
void pt_float_to_int16(const float* in, int16_t* out, int64_t n,
                       float scale, float max_wav_value) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i] * scale;
    v = std::min(std::max(v, -max_wav_value), max_wav_value);
    out[i] = (int16_t)v;
  }
}

// Chunked RMS energies for VAD trimming
// (reference: norm_audio/trim.py:8-54 policy, energies only).
void pt_chunk_rms(const float* in, int64_t n, int64_t chunk,
                  float* out_rms, int64_t n_chunks) {
  for (int64_t c = 0; c < n_chunks; ++c) {
    const float* p = in + c * chunk;
    double acc = 0.0;
    for (int64_t i = 0; i < chunk; ++i) acc += (double)p[i] * (double)p[i];
    out_rms[c] = (float)std::sqrt(acc / (double)chunk);
  }
}

// RIFF/PCM16 mono WAV header (44 bytes)
// (reference: src/cpp/wavfile.hpp:6-38).
void pt_wav_header(uint8_t* out44, int32_t sample_rate, int32_t num_samples) {
  uint32_t data_bytes = (uint32_t)num_samples * 2u;
  uint32_t chunk_size = 36u + data_bytes;
  uint32_t byte_rate = (uint32_t)sample_rate * 2u;
  std::memcpy(out44 + 0, "RIFF", 4);
  std::memcpy(out44 + 4, &chunk_size, 4);
  std::memcpy(out44 + 8, "WAVE", 4);
  std::memcpy(out44 + 12, "fmt ", 4);
  uint32_t fmt_size = 16;
  std::memcpy(out44 + 16, &fmt_size, 4);
  uint16_t audio_format = 1, channels = 1, bits = 16, block_align = 2;
  std::memcpy(out44 + 20, &audio_format, 2);
  std::memcpy(out44 + 22, &channels, 2);
  std::memcpy(out44 + 24, &sample_rate, 4);
  std::memcpy(out44 + 28, &byte_rate, 4);
  std::memcpy(out44 + 32, &block_align, 2);
  std::memcpy(out44 + 34, &bits, 2);
  std::memcpy(out44 + 36, "data", 4);
  std::memcpy(out44 + 40, &data_bytes, 4);
}

}  // extern "C"

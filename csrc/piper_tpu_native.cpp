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

// ---------------------------------------------------------------------------
// Serving wire-path kernels (O(T) per request)
// ---------------------------------------------------------------------------

// int16 device output -> float32 waveform (collect() hot loop).
void pt_int16_to_float(const int16_t* in, float* out, int64_t n,
                       float scale) {
  for (int64_t i = 0; i < n; ++i) out[i] = (float)in[i] * scale;
}

// G.711 mu-law encode, bit-exact with CPython audioop / sox
// (Sun 14-bit formulation: >>2, clip 8159, bias 33). Counterpart of
// runtime/codec.py mulaw_encode.
void pt_mulaw_encode(const int16_t* in, uint8_t* out, int64_t n) {
  static const int32_t seg_uend[8] = {0x3F,  0x7F,  0xFF,  0x1FF,
                                      0x3FF, 0x7FF, 0xFFF, 0x1FFF};
  for (int64_t i = 0; i < n; ++i) {
    int32_t x = ((int32_t)in[i]) >> 2;
    int32_t mask = x < 0 ? 0x7F : 0xFF;
    int32_t mag = x < 0 ? -x : x;
    if (mag > 8159) mag = 8159;
    mag += 33;
    int seg = 8;
    for (int s = 0; s < 8; ++s) {
      if (mag <= seg_uend[s]) { seg = s; break; }
    }
    uint8_t u;
    if (seg >= 8) {
      u = 0x7F;
    } else {
      u = (uint8_t)((seg << 4) | ((mag >> (seg + 1)) & 0x0F));
    }
    out[i] = (uint8_t)((u ^ mask) & 0xFF);
  }
}

// G.711 mu-law decode (256-entry table built on first call).
void pt_mulaw_decode(const uint8_t* in, int16_t* out, int64_t n) {
  static int16_t lut[256];
  static bool init = false;
  if (!init) {
    for (int code = 0; code < 256; ++code) {
      int u = ~code & 0xFF;
      int exp = (u >> 4) & 0x07;
      int mant = u & 0x0F;
      int mag = (((mant << 3) + 0x84) << exp) - 0x84;
      lut[code] = (int16_t)((u & 0x80) ? -mag : mag);
    }
    init = true;
  }
  for (int64_t i = 0; i < n; ++i) out[i] = lut[in[i]];
}

// float [-1,1] -> mu-law directly (streaming chunk encoder:
// quantize to int16 then compand, fused single pass).
void pt_float_to_mulaw(const float* in, uint8_t* out, int64_t n) {
  static const int32_t seg_uend[8] = {0x3F,  0x7F,  0xFF,  0x1FF,
                                      0x3FF, 0x7FF, 0xFFF, 0x1FFF};
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i];
    v = std::min(std::max(v, -1.0f), 1.0f) * 32767.0f;
    int32_t x = ((int32_t)v) >> 2;
    int32_t mask = x < 0 ? 0x7F : 0xFF;
    int32_t mag = x < 0 ? -x : x;
    if (mag > 8159) mag = 8159;
    mag += 33;
    int seg = 8;
    for (int s = 0; s < 8; ++s) {
      if (mag <= seg_uend[s]) { seg = s; break; }
    }
    uint8_t u = seg >= 8
                    ? (uint8_t)0x7F
                    : (uint8_t)((seg << 4) | ((mag >> (seg + 1)) & 0x0F));
    out[i] = (uint8_t)((u ^ mask) & 0xFF);
  }
}

}  // extern "C"

// Native host-side audio runtime for mimic3-tpu.
//
// The TPU (XLA) executes the neural graph; these are the host-side hot
// paths that sit between device output and the network/disk on every
// request: peak normalization to int16 (the reference does this in numpy
// per sentence, mimic3_tts/utils.py:237-244), volume scaling (replacing
// the removed stdlib audioop), and WAV header assembly for streaming.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this
// environment). Single pass, vectorizable loops; -O3 -march=native.

#include <cstdint>
#include <cstring>

extern "C" {

// Peak-normalize float32 audio into int16.
// norm = max_wav / max(0.01, max|x|); out = clip(x * norm).
// Returns the peak absolute input value.
float mimic3_peak_normalize_i16(const float* audio, int64_t n,
                                int16_t* out, float max_wav) {
    float peak = 0.0f;
    for (int64_t i = 0; i < n; ++i) {
        float a = audio[i];
        float mag = a < 0 ? -a : a;
        if (mag > peak) peak = mag;
    }
    float denom = peak < 0.01f ? 0.01f : peak;
    float scale = max_wav / denom;
    for (int64_t i = 0; i < n; ++i) {
        float v = audio[i] * scale;
        if (v > max_wav) v = max_wav;
        if (v < -max_wav) v = -max_wav;
        out[i] = (int16_t)v;
    }
    return peak;
}

// In-place int16 volume scale by factor in [0, 1+]; truncates toward
// zero (audioop.mul semantics) and clips at the int16 range.
void mimic3_scale_i16(int16_t* audio, int64_t n, float factor) {
    for (int64_t i = 0; i < n; ++i) {
        float v = (float)audio[i] * factor;
        // truncate toward zero
        int32_t t = (int32_t)v;
        if (t > 32767) t = 32767;
        if (t < -32768) t = -32768;
        audio[i] = (int16_t)t;
    }
}

// Write a 44-byte PCM WAV header for `data_bytes` of payload.
// `out` must have room for 44 bytes. Returns header size.
int32_t mimic3_wav_header(uint8_t* out, uint32_t data_bytes,
                          uint32_t sample_rate, uint16_t channels,
                          uint16_t sample_width_bytes) {
    const uint32_t byte_rate =
        sample_rate * channels * sample_width_bytes;
    const uint16_t block_align = channels * sample_width_bytes;
    const uint32_t riff_size = 36 + data_bytes;
    uint8_t* p = out;
    std::memcpy(p, "RIFF", 4); p += 4;
    std::memcpy(p, &riff_size, 4); p += 4;
    std::memcpy(p, "WAVE", 4); p += 4;
    std::memcpy(p, "fmt ", 4); p += 4;
    uint32_t fmt_size = 16; std::memcpy(p, &fmt_size, 4); p += 4;
    uint16_t pcm = 1; std::memcpy(p, &pcm, 2); p += 2;
    std::memcpy(p, &channels, 2); p += 2;
    std::memcpy(p, &sample_rate, 4); p += 4;
    std::memcpy(p, &byte_rate, 4); p += 4;
    std::memcpy(p, &block_align, 2); p += 2;
    uint16_t bits = (uint16_t)(sample_width_bytes * 8);
    std::memcpy(p, &bits, 2); p += 2;
    std::memcpy(p, "data", 4); p += 4;
    std::memcpy(p, &data_bytes, 4); p += 4;
    return (int32_t)(p - out);
}

// ABI version so the Python side can detect stale builds.
int32_t mimic3_native_abi(void) { return 1; }

}  // extern "C"

// whisper_tpu native runtime components (C++, C ABI).
//
// Host-side hot paths that the reference implements in native code and this
// framework mirrors: the whisper log-mel frontend (src/whisper.cpp:3176-3254
// semantics) and the ggml block-quant codecs (ggml/src/ggml-quants.c format
// semantics).  Fresh implementations against the format specs — built as a
// shared library and bound via ctypes (whisper_tpu/native.py), with a numpy
// fallback when the toolchain is unavailable.
//
// Build: make -C native   (or: g++ -O3 -march=native -shared -fPIC ...)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#define WTPU_API extern "C" __attribute__((visibility("default")))

WTPU_API const char *wtpu_native_version(void) { return "whisper_tpu-native 1.0"; }

// ---------------------------------------------------------------------------
// f16 helpers (round-to-nearest-even, matching numpy/IEEE)
// ---------------------------------------------------------------------------

static inline uint16_t f32_to_f16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t  exp  = (int32_t)((x >> 23) & 0xff) - 127 + 15;
    uint32_t man  = x & 0x7fffffu;
    if (exp >= 31) return (uint16_t)(sign | 0x7c00u);          // inf/overflow
    if (exp <= 0) {                                            // subnormal/zero
        if (exp < -10) return (uint16_t)sign;
        man |= 0x800000u;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half  = 1u << (shift - 1);
        uint32_t q     = man >> shift;
        uint32_t rem   = man & ((1u << shift) - 1);
        if (rem > half || (rem == half && (q & 1))) q++;  // nearest-even
        return (uint16_t)(sign | q);
    }
    uint16_t h = (uint16_t)(sign | ((uint32_t)exp << 10) | (man >> 13));
    uint32_t rem = man & 0x1fffu;
    if (rem > 0x1000u || (rem == 0x1000u && (h & 1))) h++;
    return h;
}

static inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp  = (h >> 10) & 0x1f;
    uint32_t man  = h & 0x3ffu;
    uint32_t x;
    if (exp == 0) {
        if (man == 0) { x = sign; }
        else {
            // subnormal: normalize
            int e = -1;
            uint32_t m = man;
            do { m <<= 1; e++; } while (!(m & 0x400u));
            x = sign | ((uint32_t)(127 - 15 - e) << 23) | ((m & 0x3ffu) << 13);
        }
    } else if (exp == 31) {
        x = sign | 0x7f800000u | (man << 13);
    } else {
        x = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &x, 4);
    return f;
}

// ---------------------------------------------------------------------------
// block-quant codecs (formats per ggml-common.h; fresh implementations)
// ---------------------------------------------------------------------------

static const int QK = 32;

// q8_0: f16 scale + 32 int8 codes (34 B); d = amax / 127, code = round(x/d)
WTPU_API void wtpu_quantize_q8_0(const float *x, int64_t n, uint8_t *out) {
    for (int64_t b = 0; b < n / QK; ++b) {
        const float *xb = x + b * QK;
        uint8_t *ob = out + b * 34;
        float amax = 0.f;
        for (int i = 0; i < QK; ++i) amax = std::max(amax, std::fabs(xb[i]));
        const float d = amax / 127.f;
        const float id = d != 0.f ? 1.f / d : 0.f;
        const uint16_t dh = f32_to_f16(d);
        std::memcpy(ob, &dh, 2);
        const float dr = f16_to_f32(dh); (void)dr;
        int8_t *q = (int8_t *)(ob + 2);
        // roundf: half away from zero (ggml-quants.c:296)
        for (int i = 0; i < QK; ++i) q[i] = (int8_t)std::roundf(xb[i] * id);
    }
}

WTPU_API void wtpu_dequantize_q8_0(const uint8_t *in, int64_t n, float *out) {
    for (int64_t b = 0; b < n / QK; ++b) {
        const uint8_t *ib = in + b * 34;
        uint16_t dh; std::memcpy(&dh, ib, 2);
        const float d = f16_to_f32(dh);
        const int8_t *q = (const int8_t *)(ib + 2);
        float *ob = out + b * QK;
        for (int i = 0; i < QK; ++i) ob[i] = q[i] * d;
    }
}

// q4_0: f16 scale + 16 nibble-pairs (18 B); d = max_by_mag / -8,
// code = clamp(x/d + 8.5, 0, 15)
WTPU_API void wtpu_quantize_q4_0(const float *x, int64_t n, uint8_t *out) {
    for (int64_t b = 0; b < n / QK; ++b) {
        const float *xb = x + b * QK;
        uint8_t *ob = out + b * 18;
        float amax = 0.f, vmax = 0.f;
        for (int i = 0; i < QK; ++i) {
            const float ax = std::fabs(xb[i]);
            if (ax > amax) { amax = ax; vmax = xb[i]; }
        }
        const float d = vmax / -8.f;
        const float id = d != 0.f ? 1.f / d : 0.f;
        const uint16_t dh = f32_to_f16(d);
        std::memcpy(ob, &dh, 2);
        uint8_t *q = ob + 2;
        for (int i = 0; i < QK / 2; ++i) {
            const float v0 = xb[i] * id;
            const float v1 = xb[i + QK / 2] * id;
            const uint8_t c0 = (uint8_t)std::min(15, (int)(v0 + 8.5f));
            const uint8_t c1 = (uint8_t)std::min(15, (int)(v1 + 8.5f));
            q[i] = c0 | (c1 << 4);
        }
    }
}

WTPU_API void wtpu_dequantize_q4_0(const uint8_t *in, int64_t n, float *out) {
    for (int64_t b = 0; b < n / QK; ++b) {
        const uint8_t *ib = in + b * 18;
        uint16_t dh; std::memcpy(&dh, ib, 2);
        const float d = f16_to_f32(dh);
        const uint8_t *q = ib + 2;
        float *ob = out + b * QK;
        for (int i = 0; i < QK / 2; ++i) {
            ob[i]          = ((int)(q[i] & 0x0F) - 8) * d;
            ob[i + QK / 2] = ((int)(q[i] >> 4)   - 8) * d;
        }
    }
}

// q5_0: f16 scale + 4B high bits + 16 nibble-pairs (22 B); d = vmax / -16
WTPU_API void wtpu_quantize_q5_0(const float *x, int64_t n, uint8_t *out) {
    for (int64_t b = 0; b < n / QK; ++b) {
        const float *xb = x + b * QK;
        uint8_t *ob = out + b * 22;
        float amax = 0.f, vmax = 0.f;
        for (int i = 0; i < QK; ++i) {
            const float ax = std::fabs(xb[i]);
            if (ax > amax) { amax = ax; vmax = xb[i]; }
        }
        const float d = vmax / -16.f;
        const float id = d != 0.f ? 1.f / d : 0.f;
        const uint16_t dh = f32_to_f16(d);
        std::memcpy(ob, &dh, 2);
        uint32_t qh = 0;
        uint8_t *q = ob + 6;
        for (int i = 0; i < QK / 2; ++i) {
            const uint8_t c0 = (uint8_t)std::min(31, (int)(xb[i] * id + 16.5f));
            const uint8_t c1 = (uint8_t)std::min(31, (int)(xb[i + QK / 2] * id + 16.5f));
            q[i] = (c0 & 0x0F) | ((c1 & 0x0F) << 4);
            qh |= (uint32_t)((c0 >> 4) & 1) << i;
            qh |= (uint32_t)((c1 >> 4) & 1) << (i + QK / 2);
        }
        std::memcpy(ob + 2, &qh, 4);
    }
}

WTPU_API void wtpu_dequantize_q5_0(const uint8_t *in, int64_t n, float *out) {
    for (int64_t b = 0; b < n / QK; ++b) {
        const uint8_t *ib = in + b * 22;
        uint16_t dh; std::memcpy(&dh, ib, 2);
        const float d = f16_to_f32(dh);
        uint32_t qh; std::memcpy(&qh, ib + 2, 4);
        const uint8_t *q = ib + 6;
        float *ob = out + b * QK;
        for (int i = 0; i < QK / 2; ++i) {
            const int h0 = (int)((qh >> i) & 1) << 4;
            const int h1 = (int)((qh >> (i + QK / 2)) & 1) << 4;
            ob[i]          = (((int)(q[i] & 0x0F) | h0) - 16) * d;
            ob[i + QK / 2] = (((int)(q[i] >> 4)   | h1) - 16) * d;
        }
    }
}

// ---------------------------------------------------------------------------
// log-mel frontend (whisper variant; semantics of src/whisper.cpp:3176-3254)
// ---------------------------------------------------------------------------

// recursive split-radix-2 FFT with naive-DFT fallback for odd sizes, over a
// shared sin/cos table of the root size (the reference's approach; n_fft=400
// splits 400 -> 200 -> 100 -> 50 -> 25 -> DFT)
namespace {

struct Trig {
    int n;
    std::vector<float> sin_v, cos_v;
    explicit Trig(int n_) : n(n_), sin_v(n_), cos_v(n_) {
        for (int i = 0; i < n; ++i) {
            const double t = 2.0 * M_PI * i / n;
            sin_v[i] = (float)std::sin(t);
            cos_v[i] = (float)std::cos(t);
        }
    }
};

void dft(const float *in, int N, float *out, const Trig &tg) {
    const int step = tg.n / N;
    for (int k = 0; k < N; ++k) {
        float re = 0.f, im = 0.f;
        for (int j = 0; j < N; ++j) {
            const int idx = (int)(((int64_t)k * j * step) % tg.n);
            re += in[j] * tg.cos_v[idx];
            im -= in[j] * tg.sin_v[idx];
        }
        out[2 * k] = re;
        out[2 * k + 1] = im;
    }
}

void fft(const float *in, int N, float *out, const Trig &tg) {
    if (N == 1) { out[0] = in[0]; out[1] = 0.f; return; }
    if (N % 2 == 1) { dft(in, N, out, tg); return; }
    const int half = N / 2;
    std::vector<float> even(half), odd(half);
    for (int i = 0; i < half; ++i) { even[i] = in[2 * i]; odd[i] = in[2 * i + 1]; }
    std::vector<float> fe(2 * half), fo(2 * half);
    fft(even.data(), half, fe.data(), tg);
    fft(odd.data(), half, fo.data(), tg);
    const int step = tg.n / N;
    for (int k = 0; k < half; ++k) {
        const int idx = k * step;
        const float c = tg.cos_v[idx], s = tg.sin_v[idx];
        const float re = c * fo[2 * k] + s * fo[2 * k + 1];   // cos*re - (-sin)*im
        const float im = c * fo[2 * k + 1] - s * fo[2 * k];
        out[2 * k] = fe[2 * k] + re;
        out[2 * k + 1] = fe[2 * k + 1] + im;
        out[2 * (k + half)] = fe[2 * k] - re;
        out[2 * (k + half) + 1] = fe[2 * k + 1] - im;
    }
}

}  // namespace

// padded: already padded audio (python supplies reflect/zero padding);
// filters: (n_mel, n_fft/2 + 1); out: (n_mel, n_len) normalized log-mel.
WTPU_API void wtpu_log_mel(const float *padded, int64_t n_padded,
                           const float *filters, int n_mel,
                           int n_fft, int hop, int n_len, float *out) {
    const int n_fb = n_fft / 2 + 1;
    Trig tg(n_fft);
    std::vector<float> window(n_fft);
    for (int i = 0; i < n_fft; ++i)
        window[i] = 0.5f * (1.0f - std::cos(2.0f * (float)M_PI * i / n_fft));

    std::vector<double> mel((size_t)n_mel * n_len);
    std::vector<float> frame(n_fft), spec(2 * n_fft), power(n_fb);

    for (int t = 0; t < n_len; ++t) {
        const int64_t off = (int64_t)t * hop;
        for (int i = 0; i < n_fft; ++i) {
            frame[i] = (off + i < n_padded) ? padded[off + i] * window[i] : 0.f;
        }
        fft(frame.data(), n_fft, spec.data(), tg);
        for (int k = 0; k < n_fb; ++k)
            power[k] = spec[2 * k] * spec[2 * k] + spec[2 * k + 1] * spec[2 * k + 1];
        for (int m = 0; m < n_mel; ++m) {
            double acc = 0.0;
            const float *fr = filters + (size_t)m * n_fb;
            for (int k = 0; k < n_fb; ++k) acc += (double)power[k] * fr[k];
            mel[(size_t)m * n_len + t] = acc;
        }
    }

    double mmax = -1e20;
    for (auto &v : mel) {
        v = std::log10(std::max(v, 1e-10));
        mmax = std::max(mmax, v);
    }
    mmax -= 8.0;
    for (int64_t i = 0; i < (int64_t)mel.size(); ++i) {
        const double v = std::max(mel[i], mmax);
        out[i] = (float)((v + 4.0) / 4.0);
    }
}

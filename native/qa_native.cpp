// qa_native — native runtime components for qwen2_audio_tpu.
//
// The reference's runtime around the compute graph is C/C++ (dr_wav WAV
// codec, threaded mel frontend src/qwen2-whisper.cpp:2402-2665, block
// quantizers ggml/src/ggml-quants.c, streaming model loader). This library
// provides fresh TPU-framework equivalents behind a small C ABI consumed
// via ctypes (qwen2_audio_tpu/native.py):
//
//   qa_wav_read      — RIFF/WAVE decode to mono f32 (PCM 8/16/24/32, f32)
//   qa_mp3_read      — mp3 decode to mono f32 via dlopen(libmpg123)
//   qa_log_mel       — threaded log-mel spectrogram (DFT-as-dot, double
//                      filterbank accumulate, max-8 clamp, (x+4)/4)
//   qa_quantize /    — ggml-block-compatible q4_0/q4_1/q5_0/q5_1/q8_0
//   qa_dequantize      codecs, multithreaded over 32-element groups
//
// Built as libqa_native.so via CMake; the Python layer falls back to the
// pure-numpy implementations when the library is absent.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dlfcn.h>
#include <thread>
#include <vector>

extern "C" {

int qa_version() { return 1; }

void qa_free(void* p) { std::free(p); }

// --------------------------------------------------------------------- //
// f16 conversion (round-to-nearest-even), no F16C dependency
// --------------------------------------------------------------------- //

static uint16_t f32_to_f16(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = x & 0x7FFFFFu;
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000u;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half = mant >> shift;
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) half++;
        return (uint16_t)(sign | half);
    }
    if (exp >= 31) return (uint16_t)(sign | 0x7C00u);
    uint32_t half = ((uint32_t)exp << 10) | (mant >> 13);
    uint32_t rem = mant & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
    return (uint16_t)(sign | half);
}

static float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FFu;
    uint32_t x;
    if (exp == 0) {
        if (mant == 0) { x = sign; }
        else {
            exp = 127 - 15 + 1;
            while (!(mant & 0x400u)) { mant <<= 1; exp--; }
            mant &= 0x3FFu;
            x = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        x = sign | 0x7F800000u | (mant << 13);
    } else {
        x = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &x, 4);
    return f;
}

// --------------------------------------------------------------------- //
// WAV reader (RIFF parser; ≙ dr_wav usage in examples/common.cpp:642-746)
// --------------------------------------------------------------------- //

int qa_wav_read(const char* path, float** out, int64_t* n_out, int* rate_out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;

    char riff[4], wave[4];
    uint32_t riff_size;
    if (std::fread(riff, 1, 4, f) != 4 || std::fread(&riff_size, 4, 1, f) != 1
        || std::fread(wave, 1, 4, f) != 4
        || std::memcmp(riff, "RIFF", 4) || std::memcmp(wave, "WAVE", 4)) {
        std::fclose(f);
        return -2;
    }

    uint16_t fmt_code = 0, channels = 0, bits = 0;
    uint32_t rate = 0;
    std::vector<uint8_t> data;
    bool have_fmt = false, have_data = false;

    for (;;) {
        char cid[4];
        uint32_t csize;
        if (std::fread(cid, 1, 4, f) != 4 || std::fread(&csize, 4, 1, f) != 1)
            break;
        if (!std::memcmp(cid, "fmt ", 4)) {
            uint8_t buf[40] = {0};
            size_t want = csize < sizeof(buf) ? csize : sizeof(buf);
            if (csize < 16 || std::fread(buf, 1, want, f) != want) { std::fclose(f); return -3; }
            std::memcpy(&fmt_code, buf + 0, 2);
            std::memcpy(&channels, buf + 2, 2);
            std::memcpy(&rate, buf + 4, 4);
            std::memcpy(&bits, buf + 14, 2);
            if (fmt_code == 0xFFFE) {
                // WAVE_FORMAT_EXTENSIBLE: real tag is the first 2 bytes of
                // the SubFormat GUID at offset 24
                if (csize < 26) { std::fclose(f); return -3; }
                std::memcpy(&fmt_code, buf + 24, 2);
            }
            if (csize > want) std::fseek(f, (long)(csize - want), SEEK_CUR);
            if (csize & 1) std::fseek(f, 1, SEEK_CUR);
            have_fmt = true;
        } else if (!std::memcmp(cid, "data", 4)) {
            data.resize(csize);
            if (std::fread(data.data(), 1, csize, f) != csize) { std::fclose(f); return -4; }
            if (csize & 1) std::fseek(f, 1, SEEK_CUR);
            have_data = true;
        } else {
            std::fseek(f, (long)(csize + (csize & 1)), SEEK_CUR);
        }
    }
    std::fclose(f);
    if (!have_fmt || !have_data || channels == 0) return -5;

    int64_t n_frames;
    std::vector<float> mono;
    auto push = [&](int64_t i, float v) { mono[(size_t)i / channels] += v / (float)channels; };

    if (fmt_code == 3 && bits == 32) {
        n_frames = (int64_t)data.size() / 4 / channels;
        mono.assign((size_t)n_frames, 0.f);
        const float* s = (const float*)data.data();
        for (int64_t i = 0; i < n_frames * channels; i++) push(i, s[i]);
    } else if (fmt_code == 1 && bits == 16) {
        n_frames = (int64_t)data.size() / 2 / channels;
        mono.assign((size_t)n_frames, 0.f);
        const int16_t* s = (const int16_t*)data.data();
        for (int64_t i = 0; i < n_frames * channels; i++) push(i, s[i] / 32768.f);
    } else if (fmt_code == 1 && bits == 8) {
        n_frames = (int64_t)data.size() / channels;
        mono.assign((size_t)n_frames, 0.f);
        for (int64_t i = 0; i < n_frames * channels; i++)
            push(i, ((int)data[(size_t)i] - 128) / 128.f);
    } else if (fmt_code == 1 && bits == 32) {
        n_frames = (int64_t)data.size() / 4 / channels;
        mono.assign((size_t)n_frames, 0.f);
        const int32_t* s = (const int32_t*)data.data();
        for (int64_t i = 0; i < n_frames * channels; i++)
            push(i, (float)(s[i] / 2147483648.0));
    } else if (fmt_code == 1 && bits == 24) {
        n_frames = (int64_t)data.size() / 3 / channels;
        mono.assign((size_t)n_frames, 0.f);
        for (int64_t i = 0; i < n_frames * channels; i++) {
            const uint8_t* b = data.data() + 3 * i;
            int32_t v = (int32_t)(b[0] | (b[1] << 8) | (b[2] << 16));
            if (v & 0x800000) v -= 0x1000000;
            push(i, (float)(v / 8388608.0));
        }
    } else {
        return -6;
    }

    float* buf = (float*)std::malloc(sizeof(float) * (size_t)n_frames);
    if (!buf) return -7;
    std::memcpy(buf, mono.data(), sizeof(float) * (size_t)n_frames);
    *out = buf;
    *n_out = n_frames;
    *rate_out = (int)rate;
    return 0;
}

// --------------------------------------------------------------------- //
// mp3 reader — dlopen(libmpg123), native twin of audio/mp3.py (the
// reference reads mp3 only via its WHISPER_FFMPEG build of
// examples/common.cpp:677-683). Runtime-loaded so the library stays an
// optional capability, not a link dependency. Emits native-rate mono f32;
// rate conversion stays in the caller (audio/filters.py::resample).
// --------------------------------------------------------------------- //

int qa_mp3_read(const char* path, float** out, int64_t* n_out, int* rate_out) {
    void* so = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!so) so = dlopen("libmpg123.so", RTLD_NOW | RTLD_LOCAL);
    if (!so) return -10;

    auto sym = [&](const char* name) { return dlsym(so, name); };
    auto p_init   = (int (*)())sym("mpg123_init");
    auto p_new    = (void* (*)(const char*, int*))sym("mpg123_new");
    auto p_open   = (int (*)(void*, const char*))sym("mpg123_open");
    auto p_getfmt = (int (*)(void*, long*, int*, int*))sym("mpg123_getformat");
    auto p_fmtnone= (int (*)(void*))sym("mpg123_format_none");
    auto p_fmt    = (int (*)(void*, long, int, int))sym("mpg123_format");
    auto p_read   = (int (*)(void*, void*, size_t, size_t*))sym("mpg123_read");
    auto p_close  = (int (*)(void*))sym("mpg123_close");
    auto p_delete = (void (*)(void*))sym("mpg123_delete");
    if (!p_new || !p_open || !p_getfmt || !p_fmtnone || !p_fmt || !p_read ||
        !p_close || !p_delete) { dlclose(so); return -11; }
    if (p_init) p_init();

    const int kOk = 0, kDone = -12, kNewFormat = -11, kEncS16 = 0xD0;
    int err = 0;
    void* h = p_new(nullptr, &err);
    if (!h) { dlclose(so); return -12; }

    int rc_out = -13;
    long rate = 0; int channels = 0, enc = 0;
    std::vector<int16_t> pcm;
    do {
        if (p_open(h, path) != kOk) break;
        if (p_getfmt(h, &rate, &channels, &enc) != kOk) { p_close(h); break; }
        p_fmtnone(h);
        if (p_fmt(h, rate, channels, kEncS16) != kOk) { p_close(h); break; }
        std::vector<uint8_t> buf(1 << 17);
        size_t done = 0;
        int rc;
        bool fail = false;
        do {
            rc = p_read(h, buf.data(), buf.size(), &done);
            if (done) {
                const int16_t* s = (const int16_t*)buf.data();
                pcm.insert(pcm.end(), s, s + done / 2);
            }
            if (rc != kOk && rc != kDone && rc != kNewFormat) {
                fail = true;
                break;
            }
        } while (rc != kDone);
        p_close(h);
        if (!fail) rc_out = 0;
    } while (false);
    p_delete(h);
    dlclose(so);
    if (rc_out != 0) return rc_out;

    int nch = channels > 0 ? channels : 1;
    int64_t n_frames = (int64_t)(pcm.size() / (size_t)nch);
    float* monobuf = (float*)std::malloc(sizeof(float) * (size_t)n_frames);
    if (!monobuf) return -7;
    const float inv = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n_frames; i++) {
        float acc = 0.0f;
        for (int c = 0; c < nch; c++) acc += (float)pcm[(size_t)i * nch + c];
        monobuf[i] = acc * inv / (float)nch;
    }
    *out = monobuf;
    *n_out = n_frames;
    *rate_out = (int)rate;
    return 0;
}

// --------------------------------------------------------------------- //
// log-mel spectrogram (threaded; semantics of src/qwen2-whisper.cpp:2402-2665)
// --------------------------------------------------------------------- //

static const int kFrame = 400;
static const int kHop = 160;
static const int kBins = 201;

int qa_log_mel(const float* samples, int64_t n, const float* filters,
               int n_mel, int n_threads, float** out, int64_t* n_len_out,
               int64_t* n_len_org_out) {
    if (n_threads < 1) n_threads = 1;
    const int64_t pad30 = 16000LL * 30;
    const int64_t pad = kFrame / 2;

    // padded = [reflect 200][samples][zeros]
    std::vector<float> padded((size_t)(n + pad30 + 2 * pad), 0.f);
    for (int64_t i = 0; i < pad; i++)
        if (pad - i < n)  // zero-extend short inputs like the Python path
            padded[(size_t)i] = samples[pad - i];
    std::memcpy(padded.data() + pad, samples, sizeof(float) * (size_t)n);

    const int64_t n_len = (n + pad30) / kHop;
    const int64_t n_len_org = 1 + (n + pad - kFrame) / kHop;
    const int64_t cutoff = std::min((n + pad) / kHop + 1, n_len);

    // hann (periodic) + DFT tables
    std::vector<float> hann(kFrame);
    for (int i = 0; i < kFrame; i++)
        hann[i] = 0.5f * (1.0f - std::cos(2.0 * M_PI * i / kFrame));
    std::vector<float> cosT((size_t)kFrame * kBins), sinT((size_t)kFrame * kBins);
    for (int t = 0; t < kFrame; t++)
        for (int k = 0; k < kBins; k++) {
            double a = 2.0 * M_PI * t * k / kFrame;
            cosT[(size_t)t * kBins + k] = (float)std::cos(a);
            sinT[(size_t)t * kBins + k] = (float)std::sin(a);
        }

    float* mel = (float*)std::malloc(sizeof(float) * (size_t)n_mel * (size_t)n_len);
    if (!mel) return -1;
    const float log_floor = std::log10(1e-10);

    auto worker = [&](int ith) {
        std::vector<float> frame(kFrame), power(kBins);
        for (int64_t i = ith; i < n_len; i += n_threads) {
            if (i >= cutoff) {
                for (int j = 0; j < n_mel; j++)
                    mel[(size_t)j * n_len + i] = log_floor;
                continue;
            }
            const float* src = padded.data() + (size_t)(i * kHop);
            for (int t = 0; t < kFrame; t++) frame[t] = src[t] * hann[t];
            for (int k = 0; k < kBins; k++) {
                float re = 0.f, im = 0.f;
                const float* ct = cosT.data() + k;
                const float* st = sinT.data() + k;
                for (int t = 0; t < kFrame; t++) {
                    re += frame[t] * ct[(size_t)t * kBins];
                    im -= frame[t] * st[(size_t)t * kBins];
                }
                power[k] = re * re + im * im;
            }
            for (int j = 0; j < n_mel; j++) {
                double sum = 0.0;
                const float* fr = filters + (size_t)j * kBins;
                for (int k = 0; k < kBins; k++) sum += power[k] * fr[k];
                if (sum < 1e-10) sum = 1e-10;
                mel[(size_t)j * n_len + i] = (float)std::log10(sum);
            }
        }
    };

    std::vector<std::thread> threads;
    for (int t = 1; t < n_threads; t++) threads.emplace_back(worker, t);
    worker(0);
    for (auto& th : threads) th.join();

    double mmax = -1e20;
    for (int64_t i = 0; i < (int64_t)n_mel * n_len; i++)
        if (mel[i] > mmax) mmax = mel[i];
    mmax -= 8.0;
    for (int64_t i = 0; i < (int64_t)n_mel * n_len; i++) {
        if (mel[i] < mmax) mel[i] = (float)mmax;
        mel[i] = (float)((mel[i] + 4.0) / 4.0);
    }

    *out = mel;
    *n_len_out = n_len;
    *n_len_org_out = n_len_org;
    return 0;
}

// --------------------------------------------------------------------- //
// block quantizers (ggml-compatible layouts; see quant/codecs.py)
// --------------------------------------------------------------------- //

enum QaType { QA_Q4_0 = 2, QA_Q4_1 = 3, QA_Q5_0 = 6, QA_Q5_1 = 7, QA_Q8_0 = 8 };

static int block_bytes(int ttype) {
    switch (ttype) {
        case QA_Q4_0: return 18;
        case QA_Q4_1: return 20;
        case QA_Q5_0: return 22;
        case QA_Q5_1: return 24;
        case QA_Q8_0: return 34;
        default: return -1;
    }
}

static void quant_block(int ttype, const float* x, uint8_t* dst) {
    switch (ttype) {
        case QA_Q4_0: {
            float amax = 0.f, maxv = 0.f;
            for (int j = 0; j < 32; j++)
                if (amax < std::fabs(x[j])) { amax = std::fabs(x[j]); maxv = x[j]; }
            float d = maxv / -8.f, id = d ? 1.f / d : 0.f;
            uint16_t h = f32_to_f16(d);
            std::memcpy(dst, &h, 2);
            for (int j = 0; j < 16; j++) {
                uint8_t a = (uint8_t)std::min(15, (int)(int8_t)(x[j] * id + 8.5f));
                uint8_t b = (uint8_t)std::min(15, (int)(int8_t)(x[j + 16] * id + 8.5f));
                dst[2 + j] = (uint8_t)(a | (b << 4));
            }
            break;
        }
        case QA_Q4_1: {
            float mn = x[0], mx = x[0];
            for (int j = 1; j < 32; j++) { mn = std::min(mn, x[j]); mx = std::max(mx, x[j]); }
            float d = (mx - mn) / 15.f, id = d ? 1.f / d : 0.f;
            uint16_t hd = f32_to_f16(d), hm = f32_to_f16(mn);
            std::memcpy(dst, &hd, 2);
            std::memcpy(dst + 2, &hm, 2);
            for (int j = 0; j < 16; j++) {
                uint8_t a = (uint8_t)std::min(15, (int)(int8_t)((x[j] - mn) * id + 0.5f));
                uint8_t b = (uint8_t)std::min(15, (int)(int8_t)((x[j + 16] - mn) * id + 0.5f));
                dst[4 + j] = (uint8_t)(a | (b << 4));
            }
            break;
        }
        case QA_Q5_0: {
            float amax = 0.f, maxv = 0.f;
            for (int j = 0; j < 32; j++)
                if (amax < std::fabs(x[j])) { amax = std::fabs(x[j]); maxv = x[j]; }
            float d = maxv / -16.f, id = d ? 1.f / d : 0.f;
            uint16_t h = f32_to_f16(d);
            std::memcpy(dst, &h, 2);
            uint32_t qh = 0;
            for (int j = 0; j < 16; j++) {
                uint8_t a = (uint8_t)std::min(31, (int)(int8_t)(x[j] * id + 16.5f));
                uint8_t b = (uint8_t)std::min(31, (int)(int8_t)(x[j + 16] * id + 16.5f));
                dst[6 + j] = (uint8_t)((a & 0x0F) | ((b & 0x0F) << 4));
                qh |= (uint32_t)((a & 0x10) >> 4) << j;
                qh |= (uint32_t)((b & 0x10) >> 4) << (j + 16);
            }
            std::memcpy(dst + 2, &qh, 4);
            break;
        }
        case QA_Q5_1: {
            float mn = x[0], mx = x[0];
            for (int j = 1; j < 32; j++) { mn = std::min(mn, x[j]); mx = std::max(mx, x[j]); }
            float d = (mx - mn) / 31.f, id = d ? 1.f / d : 0.f;
            uint16_t hd = f32_to_f16(d), hm = f32_to_f16(mn);
            std::memcpy(dst, &hd, 2);
            std::memcpy(dst + 2, &hm, 2);
            uint32_t qh = 0;
            for (int j = 0; j < 16; j++) {
                uint8_t a = (uint8_t)((x[j] - mn) * id + 0.5f);
                uint8_t b = (uint8_t)((x[j + 16] - mn) * id + 0.5f);
                dst[8 + j] = (uint8_t)((a & 0x0F) | ((b & 0x0F) << 4));
                qh |= (uint32_t)((a & 0x10) >> 4) << j;
                qh |= (uint32_t)((b & 0x10) >> 4) << (j + 16);
            }
            std::memcpy(dst + 4, &qh, 4);
            break;
        }
        case QA_Q8_0: {
            float amax = 0.f;
            for (int j = 0; j < 32; j++) amax = std::max(amax, std::fabs(x[j]));
            float d = amax / 127.f, id = d ? 1.f / d : 0.f;
            uint16_t h = f32_to_f16(d);
            std::memcpy(dst, &h, 2);
            for (int j = 0; j < 32; j++)
                ((int8_t*)(dst + 2))[j] = (int8_t)std::lroundf(x[j] * id);
            break;
        }
    }
}

static void dequant_block(int ttype, const uint8_t* src, float* x) {
    switch (ttype) {
        case QA_Q4_0: {
            uint16_t h; std::memcpy(&h, src, 2);
            float d = f16_to_f32(h);
            for (int j = 0; j < 16; j++) {
                x[j] = ((int)(src[2 + j] & 0x0F) - 8) * d;
                x[j + 16] = ((int)(src[2 + j] >> 4) - 8) * d;
            }
            break;
        }
        case QA_Q4_1: {
            uint16_t hd, hm; std::memcpy(&hd, src, 2); std::memcpy(&hm, src + 2, 2);
            float d = f16_to_f32(hd), m = f16_to_f32(hm);
            for (int j = 0; j < 16; j++) {
                x[j] = (src[4 + j] & 0x0F) * d + m;
                x[j + 16] = (src[4 + j] >> 4) * d + m;
            }
            break;
        }
        case QA_Q5_0: {
            uint16_t h; std::memcpy(&h, src, 2);
            float d = f16_to_f32(h);
            uint32_t qh; std::memcpy(&qh, src + 2, 4);
            for (int j = 0; j < 16; j++) {
                int a = (src[6 + j] & 0x0F) | (int)(((qh >> j) << 4) & 0x10);
                int b = (src[6 + j] >> 4) | (int)((qh >> (j + 12)) & 0x10);
                x[j] = (a - 16) * d;
                x[j + 16] = (b - 16) * d;
            }
            break;
        }
        case QA_Q5_1: {
            uint16_t hd, hm; std::memcpy(&hd, src, 2); std::memcpy(&hm, src + 2, 2);
            float d = f16_to_f32(hd), m = f16_to_f32(hm);
            uint32_t qh; std::memcpy(&qh, src + 4, 4);
            for (int j = 0; j < 16; j++) {
                int a = (src[8 + j] & 0x0F) | (int)(((qh >> j) << 4) & 0x10);
                int b = (src[8 + j] >> 4) | (int)((qh >> (j + 12)) & 0x10);
                x[j] = a * d + m;
                x[j + 16] = b * d + m;
            }
            break;
        }
        case QA_Q8_0: {
            uint16_t h; std::memcpy(&h, src, 2);
            float d = f16_to_f32(h);
            const int8_t* q = (const int8_t*)(src + 2);
            for (int j = 0; j < 32; j++) x[j] = q[j] * d;
            break;
        }
    }
}

int64_t qa_quantize(int ttype, const float* src, int64_t n, uint8_t* dst,
                    int n_threads) {
    int bb = block_bytes(ttype);
    if (bb < 0 || n % 32) return -1;
    int64_t nb = n / 32;
    if (n_threads < 1) n_threads = 1;
    std::vector<std::thread> threads;
    auto worker = [&](int ith) {
        for (int64_t b = ith; b < nb; b += n_threads)
            quant_block(ttype, src + b * 32, dst + b * bb);
    };
    for (int t = 1; t < n_threads; t++) threads.emplace_back(worker, t);
    worker(0);
    for (auto& th : threads) th.join();
    return nb * bb;
}

int64_t qa_dequantize(int ttype, const uint8_t* src, int64_t n, float* dst,
                      int n_threads) {
    int bb = block_bytes(ttype);
    if (bb < 0 || n % 32) return -1;
    int64_t nb = n / 32;
    if (n_threads < 1) n_threads = 1;
    std::vector<std::thread> threads;
    auto worker = [&](int ith) {
        for (int64_t b = ith; b < nb; b += n_threads)
            dequant_block(ttype, src + b * bb, dst + b * 32);
    };
    for (int t = 1; t < n_threads; t++) threads.emplace_back(worker, t);
    worker(0);
    for (auto& th : threads) th.join();
    return n;
}

// memcpy bandwidth micro-bench (≙ whisper_bench_memcpy :3690-3836)
double qa_bench_memcpy_gbps(int64_t bytes, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    std::vector<uint8_t> src((size_t)bytes, 1), dst((size_t)bytes);
    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> threads;
    int64_t chunk = bytes / n_threads;
    for (int t = 0; t < n_threads; t++)
        threads.emplace_back([&, t] {
            std::memcpy(dst.data() + t * chunk, src.data() + t * chunk,
                        (size_t)chunk);
        });
    for (auto& th : threads) th.join();
    auto t1 = std::chrono::steady_clock::now();
    double s = std::chrono::duration<double>(t1 - t0).count();
    volatile uint8_t sink = dst[0]; (void)sink;
    return (double)bytes / s / 1e9;
}

}  // extern "C"

// Node.js N-API addon for the whisper_tpu engine.
//
// Mirrors the reference addon's surface (examples/addon.node/addon.cpp:
// an async `whisper(params, callback)` taking a params object with
// model/fname_inp/language/... keys and yielding
// { result: { language }, transcription: [[t0, t1, text], ...] },
// plus a mid-run progress_callback) — implemented over the whisper_tpu
// C ABI (native/whisper_tpu.h) instead of linking the engine statically:
// whisper_init_from_file -> whisper_full(struct by value, with the real
// C progress/new_segment callbacks) -> segment accessors -> whisper_free.
//
// Build: node-gyp with binding.gyp in this directory (needs node +
// node-addon-api; link against libwhisper_tpu.so from native/).
//
// STATUS: source-complete but UNTESTED in this repository's CI — no
// Node.js runtime or N-API headers exist on the build host
// (tests/test_bindings.py skips, same policy as the Go/Ruby/Java
// bindings).  The C call surface used here is exactly the one exercised
// end-to-end by the CI-run pure-C hosts (tests/test_c_abi.py, including
// the struct-by-value whisper_full with live callbacks).

#include <napi.h>

#include <array>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "whisper_tpu.h"  // carries its own extern "C" guard

namespace {

// minimal RIFF/WAVE reader: 16-bit PCM, mono or stereo.  Stereo downmixes
// as the SUM of the channels — the reference's exact rule
// (common-whisper.cpp:64, no halving; see tests/test_text_parity.py's
// stereo fixture which depends on it).
bool read_wav(const std::string & path, std::vector<float> & pcm) {
    FILE * f = fopen(path.c_str(), "rb");
    if (!f) return false;
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) ||
        memcmp(hdr + 8, "WAVE", 4)) { fclose(f); return false; }
    uint16_t n_ch = 0, bits = 0;
    uint32_t rate = 0;
    std::vector<int16_t> data;
    uint8_t ck[8];
    while (fread(ck, 1, 8, f) == 8) {
        uint32_t sz;
        memcpy(&sz, ck + 4, 4);
        if (!memcmp(ck, "fmt ", 4)) {
            if (sz < 16) { fclose(f); return false; }  // truncated fmt chunk
            std::vector<uint8_t> fmt(sz);
            if (fread(fmt.data(), 1, sz, f) != sz) break;
            memcpy(&n_ch, fmt.data() + 2, 2);
            memcpy(&rate, fmt.data() + 4, 4);
            memcpy(&bits, fmt.data() + 14, 2);
        } else if (!memcmp(ck, "data", 4)) {
            data.resize(sz / 2);
            if (fread(data.data(), 1, sz & ~1u, f) != (sz & ~1u)) break;
        } else {
            fseek(f, (long) ((sz + 1) & ~1u), SEEK_CUR);
        }
    }
    fclose(f);
    // 16 kHz only: this minimal reader does not resample (the reference
    // addon loads through miniaudio configured for WHISPER_SAMPLE_RATE and
    // resamples) — reject instead of silently transcribing at the wrong
    // rate; callers with other rates should pass pcmf32 directly
    if (rate != 16000 || bits != 16 || (n_ch != 1 && n_ch != 2) ||
        data.empty()) return false;
    const size_t n = data.size() / n_ch;
    pcm.resize(n);
    for (size_t i = 0; i < n; ++i) {
        int32_t v = n_ch == 1 ? data[i]
                              : (int32_t) data[2 * i] + data[2 * i + 1];
        pcm[i] = (float) v / 32768.0f;
    }
    return true;
}

struct Job {
    // inputs (copied out of the JS params object on the main thread)
    std::string model, fname_inp, language, prompt;
    bool translate = false, no_timestamps = false, detect_language = false;
    bool comma_in_time = true, use_vad = false;
    int32_t n_processors = 1, offset_ms = 0, duration_ms = 0;
    int32_t max_context = -1, max_len = 0, best_of = 5, beam_size = -1;
    int32_t audio_ctx = 0;
    std::string vad_model;
    std::vector<float> pcmf32;     // optional pre-decoded audio

    // outputs
    std::string detected_language;
    std::vector<std::array<std::string, 3>> rows;
    std::string error;
};

std::string to_timestamp(int64_t t, bool comma) {
    // cli.cpp to_timestamp: t is 10ms ticks -> "HH:MM:SS[.,]mmm"
    int64_t msec = t * 10;
    int64_t hr = msec / (1000 * 60 * 60); msec -= hr * 1000 * 60 * 60;
    int64_t min = msec / (1000 * 60);     msec -= min * 1000 * 60;
    int64_t sec = msec / 1000;            msec -= sec * 1000;
    char buf[32];
    snprintf(buf, sizeof(buf), "%02d:%02d:%02d%s%03d", (int) hr, (int) min,
             (int) sec, comma ? "," : ".", (int) msec);
    return buf;
}

class Worker : public Napi::AsyncWorker {
  public:
    Worker(Napi::Function & cb, Job job, Napi::Function progress)
        : Napi::AsyncWorker(cb), job_(std::move(job)) {
        // progress may be DEFAULT-CONSTRUCTED (no env) when the params
        // object carried no progress_callback — IsEmpty() must be
        // checked before any Value method
        if (!progress.IsEmpty() && !progress.IsUndefined()
            && !progress.IsNull()) {
            tsfn_ = Napi::ThreadSafeFunction::New(
                Env(), progress, "whisper_tpu_progress", 0, 1);
            has_tsfn_ = true;
        }
    }

    void Execute() override {
        std::vector<float> pcm = std::move(job_.pcmf32);
        if (pcm.empty() && !read_wav(job_.fname_inp, pcm)) {
            job_.error = "failed to read audio: " + job_.fname_inp;
            return;
        }
        struct whisper_context * ctx =
            whisper_init_from_file(job_.model.c_str());
        if (!ctx) {
            job_.error = "failed to load model: " + job_.model;
            return;
        }
        struct whisper_full_params p = whisper_full_default_params(
            job_.beam_size > 1 ? WHISPER_SAMPLING_BEAM_SEARCH
                               : WHISPER_SAMPLING_GREEDY);
        p.print_progress = false;
        p.print_realtime = false;
        p.translate = job_.translate;
        p.no_timestamps = job_.no_timestamps;
        p.detect_language = job_.detect_language;
        p.language = job_.language.empty() ? nullptr : job_.language.c_str();
        p.offset_ms = job_.offset_ms;
        p.duration_ms = job_.duration_ms;
        p.n_max_text_ctx = job_.max_context >= 0 ? job_.max_context
                                                 : p.n_max_text_ctx;
        p.max_len = job_.max_len;
        p.token_timestamps = job_.max_len > 0;
        p.greedy.best_of = job_.best_of;
        if (job_.beam_size > 1) p.beam_search.beam_size = job_.beam_size;
        p.audio_ctx = job_.audio_ctx;
        if (!job_.prompt.empty()) p.initial_prompt = job_.prompt.c_str();
        if (job_.use_vad) {
            p.vad = true;
            p.vad_model_path = job_.vad_model.c_str();
        }
        if (has_tsfn_) {
            p.progress_callback = [](struct whisper_context *,
                                     struct whisper_state *, int progress,
                                     void * ud) {
                auto * self = (Worker *) ud;
                self->tsfn_.BlockingCall(
                    [progress](Napi::Env env, Napi::Function fn) {
                        fn.Call({Napi::Number::New(env, progress)});
                    });
            };
            p.progress_callback_user_data = this;
        }
        int rc = (job_.n_processors > 1)
            ? whisper_full_parallel(ctx, p, pcm.data(), (int) pcm.size(),
                                    job_.n_processors)
            : whisper_full(ctx, p, pcm.data(), (int) pcm.size());
        if (rc != 0) {
            job_.error = "whisper_full failed rc=" + std::to_string(rc);
            whisper_free(ctx);
            return;
        }
        job_.detected_language = whisper_lang_str(whisper_full_lang_id(ctx));
        const int n = whisper_full_n_segments(ctx);
        for (int i = 0; i < n; ++i) {
            job_.rows.push_back({
                to_timestamp(whisper_full_get_segment_t0(ctx, i),
                             job_.comma_in_time),
                to_timestamp(whisper_full_get_segment_t1(ctx, i),
                             job_.comma_in_time),
                whisper_full_get_segment_text(ctx, i)});
        }
        whisper_free(ctx);
    }

    void OnOK() override {
        Napi::Env env = Env();
        if (has_tsfn_) tsfn_.Release();
        if (!job_.error.empty()) {
            Callback().Call({Napi::String::New(env, job_.error),
                             env.Null()});
            return;
        }
        Napi::Object res = Napi::Object::New(env);
        Napi::Object result = Napi::Object::New(env);
        result.Set("language",
                   Napi::String::New(env, job_.detected_language));
        res.Set("result", result);
        Napi::Array rows = Napi::Array::New(env, job_.rows.size());
        for (size_t i = 0; i < job_.rows.size(); ++i) {
            Napi::Array row = Napi::Array::New(env, 3);
            for (size_t j = 0; j < 3; ++j)
                row.Set((uint32_t) j,
                        Napi::String::New(env, job_.rows[i][j]));
            rows.Set((uint32_t) i, row);
        }
        res.Set("transcription", rows);
        Callback().Call({env.Null(), res});
    }

  private:
    Job job_;
    Napi::ThreadSafeFunction tsfn_;
    bool has_tsfn_ = false;
};

template <typename T>
T get_or(Napi::Object & o, const char * k, T dflt);

template <> std::string get_or(Napi::Object & o, const char * k,
                               std::string dflt) {
    return o.Has(k) ? o.Get(k).ToString().Utf8Value() : dflt;
}
template <> bool get_or(Napi::Object & o, const char * k, bool dflt) {
    return o.Has(k) ? o.Get(k).ToBoolean().Value() : dflt;
}
template <> int32_t get_or(Napi::Object & o, const char * k, int32_t dflt) {
    return o.Has(k) ? o.Get(k).ToNumber().Int32Value() : dflt;
}

Napi::Value whisper(const Napi::CallbackInfo & info) {
    Napi::Env env = info.Env();
    if (info.Length() < 2 || !info[0].IsObject() || !info[1].IsFunction()) {
        Napi::TypeError::New(env, "whisper(params, callback)")
            .ThrowAsJavaScriptException();
        return env.Undefined();
    }
    Napi::Object o = info[0].As<Napi::Object>();
    Job job;
    job.model = get_or<std::string>(o, "model", "");
    job.fname_inp = get_or<std::string>(o, "fname_inp", "");
    job.language = get_or<std::string>(o, "language", "en");
    job.prompt = get_or<std::string>(o, "prompt", "");
    job.translate = get_or<bool>(o, "translate", false);
    job.no_timestamps = get_or<bool>(o, "no_timestamps", false);
    job.detect_language = get_or<bool>(o, "detect_language", false);
    job.comma_in_time = get_or<bool>(o, "comma_in_time", true);
    job.n_processors = get_or<int32_t>(o, "n_processors", 1);
    job.offset_ms = get_or<int32_t>(o, "offset_t_ms", 0);
    job.duration_ms = get_or<int32_t>(o, "duration_ms", 0);
    job.max_context = get_or<int32_t>(o, "max_context", -1);
    job.max_len = get_or<int32_t>(o, "max_len", 0);
    job.best_of = get_or<int32_t>(o, "best_of", 5);
    job.beam_size = get_or<int32_t>(o, "beam_size", -1);
    job.audio_ctx = get_or<int32_t>(o, "audio_ctx", 0);
    job.use_vad = get_or<bool>(o, "vad", false);
    job.vad_model = get_or<std::string>(o, "vad_model", "");
    if (o.Has("pcmf32") && o.Get("pcmf32").IsTypedArray()) {
        auto ta = o.Get("pcmf32").As<Napi::Float32Array>();
        job.pcmf32.assign(ta.Data(), ta.Data() + ta.ElementLength());
    }
    Napi::Function cb = info[1].As<Napi::Function>();
    Napi::Function progress;
    if (o.Has("progress_callback") &&
        o.Get("progress_callback").IsFunction()) {
        progress = o.Get("progress_callback").As<Napi::Function>();
    }
    auto * w = new Worker(cb, std::move(job), progress);
    w->Queue();
    return env.Undefined();
}

Napi::Object Init(Napi::Env env, Napi::Object exports) {
    exports.Set("whisper", Napi::Function::New(env, whisper));
    return exports;
}

}  // namespace

NODE_API_MODULE(whisper_tpu, Init)

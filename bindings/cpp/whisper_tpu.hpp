// whisper_tpu C++ binding — RAII wrapper over the C ABI (native/whisper_tpu.h).
//
// The whisper.cpp-style language binding for C++ consumers (the reference
// ships go/java/javascript/ruby wrappers of whisper.h, bindings/go/whisper.go;
// this plays that role for the TPU engine).  Header-only; link against
// libwhisper_tpu.so (built by native/Makefile or tests/test_c_abi.py).
//
//   whisper_tpu::Context ctx("model.bin");
//   auto segments = ctx.transcribe(samples, R"({"language": "en"})");
//   for (auto & s : segments) std::cout << s.text << "\n";
//
// Streaming (reference new_segment_callback, whisper.h:456-462): segments
// are delivered to a std::function DURING transcription —
//
//   auto p = whisper_tpu::default_params();
//   ctx.transcribe_stream(samples, p,
//                         [](const whisper_tpu::Segment & s) {
//                             std::cout << s.text << std::flush;
//                         });

#pragma once

#include <cstdint>
#include <functional>
#include <stdexcept>
#include <string>
#include <vector>

#include "whisper_tpu.h"

namespace whisper_tpu {

struct Segment {
    int64_t t0;          // 10 ms ticks (reference whisper_segment semantics)
    int64_t t1;
    std::string text;
    float no_speech_prob;
    bool speaker_turn_next;
};

class Context {
  public:
    explicit Context(const std::string & model_path)
        : ctx_(whisper_init_from_file(model_path.c_str())) {
        if (!ctx_) {
            throw std::runtime_error("whisper_tpu: failed to load model: " +
                                     model_path);
        }
    }
    ~Context() {
        if (ctx_) whisper_free(ctx_);
    }
    Context(const Context &) = delete;
    Context & operator=(const Context &) = delete;
    Context(Context && o) noexcept : ctx_(o.ctx_) { o.ctx_ = nullptr; }

    // Run the full pipeline; params_json == "" uses reference defaults
    // (whisper_full_default_params, src/whisper.cpp:5945-6052).
    std::vector<Segment> transcribe(const std::vector<float> & samples,
                                    const std::string & params_json = "") {
        if (whisper_full_json(ctx_, params_json.empty() ? nullptr
                                                        : params_json.c_str(),
                              samples.data(), (int) samples.size()) != 0) {
            throw std::runtime_error("whisper_tpu: whisper_full failed");
        }
        return collect_segments();
    }

    // Struct-params variant (whisper_full, whisper.h:640); the caller's
    // callbacks in `params` are honored as-is.
    std::vector<Segment> transcribe(const std::vector<float> & samples,
                                    const whisper_full_params & params) {
        if (whisper_full(ctx_, params, samples.data(),
                         (int) samples.size()) != 0) {
            throw std::runtime_error("whisper_tpu: whisper_full failed");
        }
        return collect_segments();
    }

    // Segment-stream transcription: `on_segment` fires for every newly
    // generated segment DURING the run (new_segment_callback,
    // whisper.h:456-462).  Any new_segment_callback already present in
    // `params` is replaced for the duration of the call.
    using SegmentFn = std::function<void(const Segment &)>;

    std::vector<Segment> transcribe_stream(const std::vector<float> & samples,
                                           whisper_full_params params,
                                           const SegmentFn & on_segment) {
        struct Stream { const SegmentFn * fn; };
        Stream stream{&on_segment};
        params.new_segment_callback =
            [](whisper_context * c, whisper_state * /*state*/, int n_new,
               void * ud) {
                auto * s = static_cast<Stream *>(ud);
                const int n = whisper_full_n_segments(c);
                for (int i = n - n_new; i < n; ++i) {
                    (*s->fn)(read_segment(c, i));
                }
            };
        params.new_segment_callback_user_data = &stream;
        if (whisper_full(ctx_, params, samples.data(),
                         (int) samples.size()) != 0) {
            throw std::runtime_error("whisper_tpu: whisper_full failed");
        }
        return collect_segments();
    }

    // tokenizer
    std::vector<int> tokenize(const std::string & text) {
        std::vector<int> toks(whisper_token_count(ctx_, text.c_str()));
        const int n = whisper_tokenize(ctx_, text.c_str(), toks.data(),
                                       (int) toks.size());
        if (n < 0) throw std::runtime_error("whisper_tpu: tokenize failed");
        toks.resize(n);
        return toks;
    }
    std::string token_to_str(int token) const {
        const char * s = whisper_token_to_str(ctx_, token);
        return s ? s : "";
    }

    // introspection
    int n_vocab() const { return whisper_n_vocab(ctx_); }
    bool is_multilingual() const { return whisper_is_multilingual(ctx_) != 0; }
    int token_eot() const { return whisper_token_eot(ctx_); }
    int token_sot() const { return whisper_token_sot(ctx_); }
    std::string model_type() const {
        const char * s = whisper_model_type_readable(ctx_);
        return s ? s : "";
    }

    whisper_context * raw() const { return ctx_; }

  private:
    static Segment read_segment(whisper_context * c, int i) {
        const char * text = whisper_full_get_segment_text(c, i);
        return Segment{
            whisper_full_get_segment_t0(c, i),
            whisper_full_get_segment_t1(c, i),
            text ? text : "",
            whisper_full_get_segment_no_speech_prob(c, i),
            whisper_full_get_segment_speaker_turn_next(c, i) != 0,
        };
    }

    std::vector<Segment> collect_segments() const {
        std::vector<Segment> out;
        const int n = whisper_full_n_segments(ctx_);
        out.reserve(n);
        for (int i = 0; i < n; ++i) out.push_back(read_segment(ctx_, i));
        return out;
    }

    whisper_context * ctx_;
};

// reference defaults (src/whisper.cpp:5945-6052)
inline whisper_full_params default_params(
        whisper_sampling_strategy strategy = WHISPER_SAMPLING_GREEDY) {
    return whisper_full_default_params(strategy);
}

inline std::string version() {
    const char * s = whisper_version();
    return s ? s : "";
}

}  // namespace whisper_tpu

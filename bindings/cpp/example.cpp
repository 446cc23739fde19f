// C++ binding smoke consumer: the call sequence every whisper.cpp language
// binding performs (reference bindings/go/whisper.go) through the RAII
// wrapper.  Built and run by tests/test_bindings.py.
//
// usage: example <model.bin> <pcm.f32>

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "whisper_tpu.hpp"

static std::vector<float> read_f32(const char * path) {
    FILE * f = fopen(path, "rb");
    if (!f) { perror(path); exit(1); }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<float> v(sz / 4);
    if (fread(v.data(), 4, v.size(), f) != v.size()) exit(1);
    fclose(f);
    return v;
}

int main(int argc, char ** argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s model pcm.f32\n", argv[0]); return 2; }

    printf("version: %s\n", whisper_tpu::version().c_str());

    whisper_tpu::Context ctx(argv[1]);
    printf("model: %s vocab=%d multilingual=%d\n",
           ctx.model_type().c_str(), ctx.n_vocab(),
           ctx.is_multilingual() ? 1 : 0);

    auto toks = ctx.tokenize("hello world");
    printf("tokenize: %zu tokens, first piece '%s'\n", toks.size(),
           toks.empty() ? "" : ctx.token_to_str(toks[0]).c_str());

    auto samples = read_f32(argv[2]);
    auto segments = ctx.transcribe(
        samples, R"({"language": "en", "best_of": 1, "temperature_inc": 0})");
    printf("segments: %zu\n", segments.size());
    for (auto & s : segments) {
        printf("[%lld -> %lld] %s\n", (long long) s.t0, (long long) s.t1,
               s.text.c_str());
    }

    // segment-stream path (struct params + new_segment_callback under the
    // hood): segments arrive mid-run and must match the batch result
    auto p = whisper_tpu::default_params();
    p.language = "en";
    p.temperature_inc = 0.0f;
    p.print_progress = false;
    size_t streamed = 0;
    bool stream_match = true;
    auto final_segments = ctx.transcribe_stream(
        samples, p, [&](const whisper_tpu::Segment & s) {
            if (streamed >= segments.size() ||
                s.text != segments[streamed].text) {
                stream_match = false;
            }
            ++streamed;
        });
    printf("streamed: %zu segments (match=%d)\n", streamed,
           stream_match ? 1 : 0);
    if (streamed != final_segments.size() || !stream_match) return 1;

    return segments.empty() ? 1 : 0;
}

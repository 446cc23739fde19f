// Test oracle: run the reference whisper.cpp on raw f32 PCM and dump
// intermediate numerics (mel, first-step logits, greedy token ids) to binary
// files, so whisper_tpu's JAX implementation can be diffed against the
// reference at every pipeline stage.  Links against the read-only reference
// build; not part of the shipped framework.
//
// usage: oracle_dump <model.bin> <pcm.f32> <out_prefix> [n_steps]

#include "whisper.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

static std::vector<float> read_f32(const char * path) {
    FILE * f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<float> data(sz / 4);
    if (fread(data.data(), 1, sz, f) != (size_t) sz) { exit(1); }
    fclose(f);
    return data;
}

static void dump(const std::string & path, const float * data, size_t n) {
    FILE * f = fopen(path.c_str(), "wb");
    fwrite(data, sizeof(float), n, f);
    fclose(f);
}

int main(int argc, char ** argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s model pcm.f32 out_prefix [n_steps]\n", argv[0]); return 1; }
    const char * model_path = argv[1];
    const char * pcm_path   = argv[2];
    std::string prefix      = argv[3];
    const int n_steps       = argc > 4 ? atoi(argv[4]) : 8;

    struct whisper_context_params cparams = whisper_context_default_params();
    cparams.use_gpu = false;
    // argv[5] == "noflash": trace the non-flash-attention graph (the
    // precision-matched parity mode emulates its f16 rounding points)
    if (argc > 5 && strcmp(argv[5], "noflash") == 0) cparams.flash_attn = false;
    struct whisper_context * ctx = whisper_init_from_file_with_params(model_path, cparams);
    if (!ctx) return 1;

    std::vector<float> pcm = read_f32(pcm_path);

    // argv[6] == "mel": argv[2] is a dumped (n_mel, n_len) f32 mel (row-major,
    // mel-major) fed via whisper_set_mel instead of pcm — isolates
    // mel-frontend differences from encoder/decoder differences
    if (argc > 6 && strcmp(argv[6], "mel") == 0) {
        const int n_mel = whisper_model_n_mels(ctx);
        if (whisper_set_mel(ctx, pcm.data(), (int) (pcm.size() / n_mel), n_mel) != 0) return 1;
    } else
    if (whisper_pcm_to_mel(ctx, pcm.data(), (int) pcm.size(), 4) != 0) return 1;

    // encode window 0
    if (whisper_encode(ctx, 0, 4) != 0) return 1;

    const int n_vocab = whisper_n_vocab(ctx);
    std::vector<whisper_token> tokens;
    tokens.push_back(whisper_token_sot(ctx));

    std::vector<float> all_logits;
    std::vector<float> token_ids;
    for (int step = 0; step < n_steps; ++step) {
        if (whisper_decode(ctx, tokens.data() + (step == 0 ? 0 : step),
                           step == 0 ? (int) tokens.size() : 1,
                           step == 0 ? 0 : step, 4) != 0) return 1;
        const float * logits = whisper_get_logits(ctx);
        all_logits.insert(all_logits.end(), logits, logits + n_vocab);
        // greedy argmax (raw logits, no filters) for trace comparison
        int best = 0;
        for (int i = 1; i < n_vocab; ++i) if (logits[i] > logits[best]) best = i;
        token_ids.push_back((float) best);
        tokens.push_back(best);
    }

    dump(prefix + ".logits.f32", all_logits.data(), all_logits.size());
    dump(prefix + ".tokens.f32", token_ids.data(), token_ids.size());
    fprintf(stderr, "dumped %d steps, n_vocab=%d\n", n_steps, n_vocab);
    whisper_free(ctx);
    return 0;
}

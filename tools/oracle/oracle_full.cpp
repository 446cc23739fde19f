// Oracle: run the reference whisper_full() on raw f32 PCM with
// whisper-cli-equivalent params and print segments as TSV
// (t0_ticks, t1_ticks, token ids, text) for full-pipeline diffing.
//
// usage: oracle_full <model.bin> <pcm.f32> [beam_size] [flags]
//   flags: "nt" (no_timestamps); env ORACLE_PROMPT sets initial_prompt
// Build: tools/oracle/build_oracles.sh

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

int main(int argc, char ** argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s model pcm.f32 [beam] [nt]\n", argv[0]); return 1; }
    const int beam = argc > 3 ? atoi(argv[3]) : 0;
    const bool nt  = argc > 4 && strcmp(argv[4], "nt") == 0;

    struct whisper_context_params cparams = whisper_context_default_params();
    struct whisper_context * ctx = whisper_init_from_file_with_params(argv[1], cparams);
    if (!ctx) return 1;

    std::vector<float> pcm = read_f32(argv[2]);

    struct whisper_full_params wparams = whisper_full_default_params(
        beam > 0 ? WHISPER_SAMPLING_BEAM_SEARCH : WHISPER_SAMPLING_GREEDY);
    wparams.print_progress   = false;
    wparams.print_realtime   = false;
    wparams.temperature_inc  = 0.0f;   // -nf
    wparams.no_timestamps    = nt;
    if (beam > 0) {
        wparams.beam_search.beam_size = beam;
    } else {
        // match `whisper-cli -bo 1 -bs 1`: the cli's DEFAULT strategy is
        // BEAM_SEARCH (beam_size initializes to 5, strategy = beam_size > 1
        // ? BEAM : GREEDY; cli.cpp:45,1213) so true greedy needs -bs 1,
        // which then passes beam_size=1 through (cli.cpp:1243)
        wparams.greedy.best_of = 1;
        wparams.beam_search.beam_size = 1;
    }
    wparams.print_timestamps = true;   // cli default
    wparams.language = "en";
    const char * prompt = getenv("ORACLE_PROMPT");
    if (prompt) wparams.initial_prompt = prompt;

    // ORACLE_DEBUG_LOGITS=1: print per-step partially-filtered argmax via the
    // logits_filter_callback (runs mid-whisper_process_logits)
    if (getenv("ORACLE_DEBUG_LOGITS")) {
        wparams.logits_filter_callback = [](struct whisper_context * c, struct whisper_state *,
                                            const whisper_token_data * toks, int n_toks,
                                            float * logits, void *) {
            int best = 0;
            const int nv = whisper_n_vocab(c);
            for (int i = 1; i < nv; ++i) if (logits[i] > logits[best]) best = i;
            fprintf(stderr, "[dbg] n_past_seq=%d argmax=%d logit=%.4f l[45256]=%.4f l[29817]=%.4f\n",
                    n_toks, best, logits[best], logits[45256], logits[29817]);
        };
    }

    if (whisper_full(ctx, wparams, pcm.data(), (int) pcm.size()) != 0) return 1;

    const int n_segments = whisper_full_n_segments(ctx);
    for (int i = 0; i < n_segments; ++i) {
        printf("%lld\t%lld\t", (long long) whisper_full_get_segment_t0(ctx, i),
                               (long long) whisper_full_get_segment_t1(ctx, i));
        const int n_tok = whisper_full_n_tokens(ctx, i);
        for (int j = 0; j < n_tok; ++j) {
            printf("%d%s", whisper_full_get_token_id(ctx, i, j), j + 1 < n_tok ? "," : "");
        }
        printf("\t%s\n", whisper_full_get_segment_text(ctx, i));
    }
    whisper_free(ctx);
    return 0;
}

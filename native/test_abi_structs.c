// Second C host: exercises the whisper.h-COMPATIBLE struct surface through
// the real consumer header (native/whisper_tpu.h) — context-params init
// variants, the model_loader path, struct token data, timings, full language
// names.  Compiling this file also verifies the header parses as C.
//
// usage: test_abi_structs <model.bin> <pcm.f32>

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "whisper_tpu.h"

struct file_loader {
    FILE * f;
};

static size_t loader_read(void * ctx, void * output, size_t read_size) {
    return fread(output, 1, read_size, ((struct file_loader *) ctx)->f);
}

static bool loader_eof(void * ctx) {
    return feof(((struct file_loader *) ctx)->f) != 0;
}

static void loader_close(void * ctx) {
    fclose(((struct file_loader *) ctx)->f);
}

int main(int argc, char ** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s model.bin pcm.f32\n", argv[0]);
        return 2;
    }

    // default params round trip
    struct whisper_context_params cp = whisper_context_default_params();
    if (cp.dtw_token_timestamps || cp.dtw_aheads_preset != WHISPER_AHEADS_NONE) {
        fprintf(stderr, "bad defaults\n"); return 1;
    }
    struct whisper_context_params * cpr = whisper_context_default_params_by_ref();
    if (!cpr || cpr->use_gpu != cp.use_gpu) { fprintf(stderr, "by_ref\n"); return 1; }
    whisper_free_context_params(cpr);

    // with_params file init
    struct whisper_context * ctx = whisper_init_from_file_with_params(argv[1], cp);
    if (!ctx) { fprintf(stderr, "init_with_params failed\n"); return 1; }

    // model_loader init (deprecated whisper_init shape)
    struct file_loader fl;
    fl.f = fopen(argv[1], "rb");
    if (!fl.f) { fprintf(stderr, "no model\n"); return 1; }
    whisper_model_loader loader;
    loader.context = &fl;
    loader.read = loader_read;
    loader.eof = loader_eof;
    loader.close = loader_close;
    struct whisper_context * ctx2 = whisper_init(&loader);
    if (!ctx2) { fprintf(stderr, "whisper_init(loader) failed\n"); return 1; }
    if (whisper_n_vocab(ctx2) != whisper_n_vocab(ctx)) {
        fprintf(stderr, "loader model differs\n"); return 1;
    }
    whisper_free(ctx2);

    // language names
    if (strcmp(whisper_lang_str(0), "en") != 0 ||
        strcmp(whisper_lang_str_full(0), "english") != 0) {
        fprintf(stderr, "lang_str(_full)\n"); return 1;
    }

    // full + struct token data + timings
    FILE * f = fopen(argv[2], "rb");
    if (!f) { fprintf(stderr, "no pcm\n"); return 1; }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    float * pcm = (float *) malloc(sz);
    if (fread(pcm, 1, sz, f) != (size_t) sz) { return 1; }
    fclose(f);

    struct whisper_full_params params =
        whisper_full_default_params(WHISPER_SAMPLING_GREEDY);
    if (params.n_max_text_ctx != 16384 || !params.no_context ||
        params.greedy.best_of != 5 || params.beam_search.beam_size != -1 ||
        params.vad_params.min_speech_duration_ms != 250) {
        fprintf(stderr, "bad full defaults\n"); return 1;
    }
    struct whisper_full_params * pref =
        whisper_full_default_params_by_ref(WHISPER_SAMPLING_BEAM_SEARCH);
    if (!pref || pref->beam_search.beam_size != 5) {
        fprintf(stderr, "full by_ref\n"); return 1;
    }
    whisper_free_params(pref);
    params.language = "en";
    params.temperature_inc = 0.0f;
    if (whisper_full(ctx, params, pcm, (int) (sz / 4)) != 0) {
        fprintf(stderr, "whisper_full\n"); return 1;
    }
    int n = whisper_full_n_segments(ctx);
    if (n <= 0) { fprintf(stderr, "no segments\n"); return 1; }
    if (whisper_full_n_tokens(ctx, 0) <= 0) { fprintf(stderr, "no tokens\n"); return 1; }

    whisper_token_data td = whisper_full_get_token_data(ctx, 0, 0);
    if (td.id != whisper_full_get_token_id(ctx, 0, 0)) {
        fprintf(stderr, "token_data.id mismatch\n"); return 1;
    }
    if (td.p != whisper_full_get_token_p(ctx, 0, 0)) {
        fprintf(stderr, "token_data.p mismatch\n"); return 1;
    }
    printf("token_data: id=%d tid=%d p=%.4f t0=%lld t1=%lld\n",
           td.id, td.tid, td.p, (long long) td.t0, (long long) td.t1);

    struct whisper_timings * t = whisper_get_timings(ctx);
    if (!t || t->encode_ms < 0 || t->sample_ms < 0) {
        fprintf(stderr, "timings\n"); return 1;
    }
    printf("timings: sample=%.2fms encode=%.2fms decode=%.2fms\n",
           t->sample_ms, t->encode_ms, t->decode_ms);

    whisper_free(ctx);

    // VAD param structs (defaults mirror src/whisper.cpp:4453-4472); the
    // silero model may be absent, so only the default-params values and a
    // NULL-on-bad-path init are asserted here (the file/loader inits are
    // covered by tests/test_c_abi.py with the real model when present)
    whisper_vad_params vp = whisper_vad_default_params();
    if (vp.threshold != 0.5f || vp.min_speech_duration_ms != 250 ||
        vp.speech_pad_ms != 30) {
        fprintf(stderr, "vad defaults\n"); return 1;
    }
    struct whisper_vad_context_params vcp = whisper_vad_default_context_params();
    if (vcp.n_threads != 4) { fprintf(stderr, "vad ctx defaults\n"); return 1; }
    if (whisper_vad_init_from_file_with_params("/nonexistent-vad.bin", vcp)) {
        fprintf(stderr, "vad init should have failed\n"); return 1;
    }

    free(pcm);
    printf("STRUCT-ABI-OK\n");
    return 0;
}

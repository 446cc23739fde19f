// Minimal C host exercising the whisper.h-shaped shim end-to-end: the
// call sequence a whisper.cpp binding performs (init -> full -> iterate
// segments -> free), run against the deterministic test model.  Built and
// executed by tests/test_c_abi.py.
//
// usage: test_abi <model.bin> <pcm.f32>

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

struct whisper_context;
struct whisper_state;
extern struct whisper_context * whisper_init_from_file(const char * path);
extern void whisper_free(struct whisper_context *);
extern int whisper_full_json(struct whisper_context *, const char * params_json,
                        const float * samples, int n_samples);
extern int whisper_full_n_segments(struct whisper_context *);
extern int64_t whisper_full_get_segment_t0(struct whisper_context *, int);
extern int64_t whisper_full_get_segment_t1(struct whisper_context *, int);
extern const char * whisper_full_get_segment_text(struct whisper_context *,
                                                  int);
extern int whisper_lang_id(const char *);
extern const char * whisper_lang_str(int);
extern const char * whisper_print_system_info(void);
extern const char * whisper_version(void);
extern const char * whisper_model_type_readable(struct whisper_context *);
extern int whisper_model_n_text_layer(struct whisper_context *);
extern int whisper_n_vocab(struct whisper_context *);
extern int whisper_is_multilingual(struct whisper_context *);
extern int whisper_token_eot(struct whisper_context *);
extern int whisper_token_sot(struct whisper_context *);
extern const char * whisper_token_to_str(struct whisper_context *, int);
extern int whisper_tokenize(struct whisper_context *, const char *,
                            int *, int);
extern int whisper_token_count(struct whisper_context *, const char *);
extern int whisper_pcm_to_mel(struct whisper_context *, const float *,
                              int, int);
extern int whisper_n_len(struct whisper_context *);
extern int whisper_encode(struct whisper_context *, int, int);
extern int whisper_decode(struct whisper_context *, const int *, int,
                          int, int);
extern const float * whisper_get_logits(struct whisper_context *);
extern struct whisper_state * whisper_init_state(struct whisper_context *);
extern void whisper_free_state(struct whisper_state *);
extern int whisper_full_with_state_json(struct whisper_context *,
                                   struct whisper_state *, const char *,
                                   const float *, int);
extern int whisper_full_n_segments_from_state(struct whisper_state *);
extern const char * whisper_full_get_segment_text_from_state(
    struct whisper_state *, int);
extern const char * whisper_full_default_params_json(int);

int main(int argc, char ** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s model.bin pcm.f32\n", argv[0]);
        return 2;
    }

    printf("system: %s\n", whisper_print_system_info());
    if (whisper_lang_id("en") != 0) { fprintf(stderr, "lang_id\n"); return 1; }
    if (!whisper_lang_str(0)) { fprintf(stderr, "lang_str\n"); return 1; }

    FILE * f = fopen(argv[2], "rb");
    if (!f) { fprintf(stderr, "no pcm\n"); return 1; }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    float * pcm = (float *) malloc(sz);
    if (fread(pcm, 1, sz, f) != (size_t) sz) { return 1; }
    fclose(f);

    struct whisper_context * ctx = whisper_init_from_file(argv[1]);
    if (!ctx) { fprintf(stderr, "init failed\n"); return 1; }

    const char * params = "{\"language\": \"en\", \"temperature_inc\": 0.0}";
    int rc = whisper_full_json(ctx, params, pcm, (int) (sz / 4));
    if (rc != 0) { fprintf(stderr, "whisper_full rc=%d\n", rc); return 1; }

    int n = whisper_full_n_segments(ctx);
    printf("n_segments=%d\n", n);
    for (int i = 0; i < n; ++i) {
        printf("[%lld -> %lld] %s\n",
               (long long) whisper_full_get_segment_t0(ctx, i),
               (long long) whisper_full_get_segment_t1(ctx, i),
               whisper_full_get_segment_text(ctx, i));
    }

    // ---- introspection surface ----
    printf("version: %s\n", whisper_version());
    printf("model: %s layers=%d vocab=%d multilingual=%d\n",
           whisper_model_type_readable(ctx),
           whisper_model_n_text_layer(ctx),
           whisper_n_vocab(ctx),
           whisper_is_multilingual(ctx));
    if (whisper_n_vocab(ctx) <= 0) { fprintf(stderr, "n_vocab\n"); return 1; }
    int eot = whisper_token_eot(ctx);
    if (eot <= 0) { fprintf(stderr, "token_eot\n"); return 1; }
    if (!whisper_token_to_str(ctx, whisper_token_sot(ctx))) { return 1; }

    // ---- tokenizer round trip ----
    int toks[64];
    int nt = whisper_tokenize(ctx, " and so", toks, 64);
    if (nt <= 0) { fprintf(stderr, "tokenize rc=%d\n", nt); return 1; }
    if (whisper_token_count(ctx, " and so") != nt) {
        fprintf(stderr, "token_count mismatch\n"); return 1;
    }
    printf("tokenize ' and so' -> %d tokens\n", nt);

    // ---- low-level drive: pcm->mel -> encode -> decode -> logits ----
    if (whisper_pcm_to_mel(ctx, pcm, (int) (sz / 4), 1) != 0) {
        fprintf(stderr, "pcm_to_mel\n"); return 1;
    }
    if (whisper_n_len(ctx) <= 0) { fprintf(stderr, "n_len\n"); return 1; }
    if (whisper_encode(ctx, 0, 1) != 0) { fprintf(stderr, "encode\n"); return 1; }
    int sot = whisper_token_sot(ctx);
    if (whisper_decode(ctx, &sot, 1, 0, 1) != 0) {
        fprintf(stderr, "decode\n"); return 1;
    }
    const float * logits = whisper_get_logits(ctx);
    if (!logits) { fprintf(stderr, "logits\n"); return 1; }
    printf("logits[0]=%f\n", (double) logits[0]);

    // ---- state API: an independent transcription on the same weights ----
    struct whisper_state * st = whisper_init_state(ctx);
    if (!st) { fprintf(stderr, "init_state\n"); return 1; }
    if (whisper_full_with_state_json(ctx, st, params, pcm, (int) (sz / 4)) != 0) {
        fprintf(stderr, "full_with_state\n"); return 1;
    }
    int ns = whisper_full_n_segments_from_state(st);
    printf("state n_segments=%d\n", ns);
    if (ns >= 1 && !whisper_full_get_segment_text_from_state(st, 0)) {
        return 1;
    }
    whisper_free_state(st);

    // ---- default params round-trip ----
    const char * dp = whisper_full_default_params_json(0);
    if (!dp || dp[0] != '{') { fprintf(stderr, "default_params\n"); return 1; }

    // a NULL-ish handle must fail cleanly, not crash
    if (whisper_init_from_file("/nonexistent/model.bin") != NULL) {
        fprintf(stderr, "bad-path init should return NULL\n");
        return 1;
    }

    whisper_free(ctx);
    free(pcm);
    printf("C-ABI OK\n");
    return 0;
}

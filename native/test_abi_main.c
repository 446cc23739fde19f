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
extern struct whisper_context * whisper_init_from_file(const char * path);
extern void whisper_free(struct whisper_context *);
extern int whisper_full(struct whisper_context *, const char * params_json,
                        const float * samples, int n_samples);
extern int whisper_full_n_segments(struct whisper_context *);
extern int64_t whisper_full_get_segment_t0(struct whisper_context *, int);
extern int64_t whisper_full_get_segment_t1(struct whisper_context *, int);
extern const char * whisper_full_get_segment_text(struct whisper_context *,
                                                  int);
extern int whisper_lang_id(const char *);
extern const char * whisper_lang_str(int);
extern const char * whisper_print_system_info(void);

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
    int rc = whisper_full(ctx, params, pcm, (int) (sz / 4));
    if (rc != 0) { fprintf(stderr, "whisper_full rc=%d\n", rc); return 1; }

    int n = whisper_full_n_segments(ctx);
    printf("n_segments=%d\n", n);
    for (int i = 0; i < n; ++i) {
        printf("[%lld -> %lld] %s\n",
               (long long) whisper_full_get_segment_t0(ctx, i),
               (long long) whisper_full_get_segment_t1(ctx, i),
               whisper_full_get_segment_text(ctx, i));
    }

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

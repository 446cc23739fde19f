// Third C host: the five whisper_full_params function-pointer callbacks
// (whisper.h:455-478) — the surface every reference binding is built on
// (reference bindings/go/whisper.go:20-44 installs C trampolines for exactly
// these).  Four runs against the deterministic mini model:
//   A  streaming: new_segment fires DURING transcription and the segment
//      accessors are live inside the callback; progress + encoder_begin
//      counted; user_data pointers round-trip.
//   B  abort: with the host decode loop pinned (a pass-through
//      logits_filter), abort_callback flips true mid-window during the
//      token loop -> the run stops early with no completed segments.
//   C  encoder_begin veto: returning false stops the run before encode.
//   D  logits_filter rewrite: the callback force-picks a chosen text token
//      for 3 steps then EOT -> the emitted segment is exactly those tokens,
//      proving the C callback's in-place logits mutation drives sampling.
//
// usage: test_abi_callbacks <model.bin> <pcm.f32>

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "whisper_tpu.h"

#define MAGIC ((void *) 0x5eed)

static int g_new_segments;     /* total n_new received */
static int g_mid_run_ok;       /* accessors worked inside the callback */
static int g_progress_calls;
static int g_last_progress = -1;
static int g_encoder_begins;

static void on_new_segment(struct whisper_context * ctx,
                           struct whisper_state * state, int n_new,
                           void * user_data) {
    (void) state;
    if (user_data != MAGIC) { return; }
    g_new_segments += n_new;
    /* live mid-run reads (reference contract whisper.h:456-458) */
    int n = whisper_full_n_segments(ctx);
    if (n >= g_new_segments && whisper_full_get_segment_text(ctx, n - 1)) {
        g_mid_run_ok++;
    }
}

static void on_progress(struct whisper_context * ctx,
                        struct whisper_state * state, int progress,
                        void * user_data) {
    (void) ctx; (void) state;
    if (user_data != MAGIC) { return; }
    g_progress_calls++;
    g_last_progress = progress;
}

static bool on_encoder_begin(struct whisper_context * ctx,
                             struct whisper_state * state, void * user_data) {
    (void) ctx; (void) state; (void) user_data;
    g_encoder_begins++;
    return true;
}

static bool veto_encoder_begin(struct whisper_context * ctx,
                               struct whisper_state * state,
                               void * user_data) {
    (void) ctx; (void) state; (void) user_data;
    return false;
}

static int g_abort_polls;

static bool on_abort(void * data) {
    (void) data;
    return ++g_abort_polls > 3;  /* flip true mid token loop (polls 1-2 are window-start + ladder; 3+ are per-decode-step) */
}

static int g_filter_calls;

static void passthrough_filter(struct whisper_context * ctx,
                               struct whisper_state * state,
                               const whisper_token_data * tokens,
                               int n_tokens, float * logits,
                               void * user_data) {
    (void) ctx; (void) state; (void) tokens; (void) n_tokens; (void) logits;
    (void) user_data;
    g_filter_calls++;
}

static int g_force_id = -1;
static int g_eot_id = -1;

static void forcing_filter(struct whisper_context * ctx,
                           struct whisper_state * state,
                           const whisper_token_data * tokens, int n_tokens,
                           float * logits, void * user_data) {
    (void) ctx; (void) state; (void) tokens;
    int n_vocab = *(int *) user_data;
    int pick = n_tokens < 3 ? g_force_id : g_eot_id;
    for (int i = 0; i < n_vocab; ++i) logits[i] = -1e9f;
    logits[pick] = 1e9f;
}

int main(int argc, char ** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s model.bin pcm.f32\n", argv[0]);
        return 2;
    }

    FILE * f = fopen(argv[2], "rb");
    if (!f) { fprintf(stderr, "no pcm\n"); return 1; }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    float * pcm = (float *) malloc(sz);
    if (fread(pcm, 1, sz, f) != (size_t) sz) { return 1; }
    fclose(f);
    int n_samples = (int) (sz / 4);

    struct whisper_context * ctx = whisper_init_from_file(argv[1]);
    if (!ctx) { fprintf(stderr, "init failed\n"); return 1; }

    /* ---- run A: streaming callbacks ---- */
    struct whisper_full_params p =
        whisper_full_default_params(WHISPER_SAMPLING_GREEDY);
    p.language = "en";
    p.temperature_inc = 0.0f;
    p.print_progress = false;
    p.new_segment_callback = on_new_segment;
    p.new_segment_callback_user_data = MAGIC;
    p.progress_callback = on_progress;
    p.progress_callback_user_data = MAGIC;
    p.encoder_begin_callback = on_encoder_begin;
    if (whisper_full(ctx, p, pcm, n_samples) != 0) {
        fprintf(stderr, "run A: whisper_full failed\n"); return 1;
    }
    int n_final = whisper_full_n_segments(ctx);
    if (g_new_segments <= 0 || g_new_segments != n_final) {
        fprintf(stderr, "run A: new_segment streamed %d, final %d\n",
                g_new_segments, n_final);
        return 1;
    }
    if (g_mid_run_ok != g_new_segments) {
        fprintf(stderr, "run A: mid-run accessor reads %d/%d\n",
                g_mid_run_ok, g_new_segments);
        return 1;
    }
    if (g_progress_calls < 1 || g_encoder_begins < 1) {
        fprintf(stderr, "run A: progress=%d encoder_begin=%d\n",
                g_progress_calls, g_encoder_begins);
        return 1;
    }
    printf("run A: %d segments streamed, progress=%d calls (last %d), "
           "encoder_begin=%d\n",
           g_new_segments, g_progress_calls, g_last_progress,
           g_encoder_begins);

    /* ---- run B: abort mid-window ---- */
    struct whisper_full_params pb =
        whisper_full_default_params(WHISPER_SAMPLING_GREEDY);
    pb.language = "en";
    pb.temperature_inc = 0.0f;
    pb.print_progress = false;
    pb.abort_callback = on_abort;
    pb.logits_filter_callback = passthrough_filter;  /* pin host loop */
    if (whisper_full(ctx, pb, pcm, n_samples) != 0) {
        fprintf(stderr, "run B: whisper_full failed\n"); return 1;
    }
    if (g_abort_polls <= 3) {
        fprintf(stderr, "run B: only %d abort polls\n", g_abort_polls);
        return 1;
    }
    if (whisper_full_n_segments(ctx) >= n_final) {
        fprintf(stderr, "run B: abort did not stop the run (%d segments)\n",
                whisper_full_n_segments(ctx));
        return 1;
    }
    printf("run B: aborted after %d polls, %d segments\n", g_abort_polls,
           whisper_full_n_segments(ctx));

    /* ---- run C: encoder_begin veto ---- */
    struct whisper_full_params pc =
        whisper_full_default_params(WHISPER_SAMPLING_GREEDY);
    pc.language = "en";
    pc.print_progress = false;
    pc.encoder_begin_callback = veto_encoder_begin;
    if (whisper_full(ctx, pc, pcm, n_samples) != 0) {
        fprintf(stderr, "run C: whisper_full failed\n"); return 1;
    }
    if (whisper_full_n_segments(ctx) != 0) {
        fprintf(stderr, "run C: veto left %d segments\n",
                whisper_full_n_segments(ctx));
        return 1;
    }
    printf("run C: encoder_begin veto -> 0 segments\n");

    /* ---- run D: logits_filter rewrites drive sampling ---- */
    int toks[8];
    if (whisper_tokenize(ctx, " and", toks, 8) < 1) {
        fprintf(stderr, "run D: tokenize\n"); return 1;
    }
    g_force_id = toks[0];
    g_eot_id = whisper_token_eot(ctx);
    int n_vocab = whisper_n_vocab(ctx);
    struct whisper_full_params pd =
        whisper_full_default_params(WHISPER_SAMPLING_GREEDY);
    pd.language = "en";
    pd.temperature_inc = 0.0f;
    pd.no_timestamps = true;
    pd.print_progress = false;
    pd.logits_filter_callback = forcing_filter;
    pd.logits_filter_callback_user_data = &n_vocab;
    if (whisper_full(ctx, pd, pcm, n_samples) != 0) {
        fprintf(stderr, "run D: whisper_full failed\n"); return 1;
    }
    if (whisper_full_n_segments(ctx) < 1) {
        fprintf(stderr, "run D: no segments\n"); return 1;
    }
    /* segment tokens are the 3 forced text tokens + the closing EOT (the
     * engine stores the window's full sampled token list, EOT included) */
    int nt = whisper_full_n_tokens(ctx, 0);
    if (nt != 4 || whisper_full_get_token_id(ctx, 0, 3) != g_eot_id) {
        fprintf(stderr, "run D: %d tokens, last=%d\n", nt,
                nt > 0 ? whisper_full_get_token_id(ctx, 0, nt - 1) : -1);
        return 1;
    }
    for (int j = 0; j < 3; ++j) {
        if (whisper_full_get_token_id(ctx, 0, j) != g_force_id) {
            fprintf(stderr, "run D: token %d = %d, wanted %d\n", j,
                    whisper_full_get_token_id(ctx, 0, j), g_force_id);
            return 1;
        }
    }
    printf("run D: logits_filter forced '%s' x3: \"%s\"\n",
           whisper_token_to_str(ctx, g_force_id),
           whisper_full_get_segment_text(ctx, 0));

    whisper_free(ctx);
    free(pcm);
    printf("CALLBACKS-OK\n");
    return 0;
}

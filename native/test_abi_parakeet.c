/* Pure-C host for the parakeet_* ABI (native/parakeet_tpu.h): drives the
 * reference call sequence — init (file/buffer/loader), full with the
 * parakeet_full_params struct + all five C callbacks, mid-run accessor
 * reads from inside new_segment, encoder_begin veto, abort, state API,
 * chunk streaming, tokenizer, logits, timings.
 *
 * usage: test_abi_parakeet <model.bin> <pcm.f32>
 * prints TEXT=<transcript> for the pytest-side equality check and
 * PARAKEET-ABI-OK on success. */

#include "parakeet_tpu.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static int n_new_segment = 0;
static int n_new_token = 0;
static int n_progress = 0;
static int n_encoder_begin = 0;
static char seg_text_live[4096];

static void on_new_segment(struct parakeet_context * ctx,
                           struct parakeet_state * state, int n_new,
                           void * ud) {
    (void) ud;
    n_new_segment += n_new;
    /* live accessor read from inside the callback, mid-run */
    int n = state ? parakeet_full_n_segments_from_state(state)
                  : parakeet_full_n_segments(ctx);
    if (n > 0) {
        const char * txt = state
            ? parakeet_full_get_segment_text_from_state(state, n - 1)
            : parakeet_full_get_segment_text(ctx, n - 1);
        snprintf(seg_text_live, sizeof(seg_text_live), "%s", txt);
    }
}

static void on_new_token(struct parakeet_context * ctx,
                         struct parakeet_state * state,
                         const parakeet_token_data * td, void * ud) {
    (void) ctx; (void) state; (void) ud;
    if (td && td->t1 >= td->t0 && td->p >= 0.0f && td->p <= 1.00001f) {
        n_new_token++;
    }
}

static void on_progress(struct parakeet_context * ctx,
                        struct parakeet_state * state, int progress,
                        void * ud) {
    (void) ctx; (void) state; (void) ud; (void) progress;
    n_progress++;
}

static bool on_encoder_begin(struct parakeet_context * ctx,
                             struct parakeet_state * state, void * ud) {
    (void) ctx; (void) state; (void) ud;
    n_encoder_begin++;
    return true;
}

static bool veto_encoder(struct parakeet_context * ctx,
                         struct parakeet_state * state, void * ud) {
    (void) ctx; (void) state; (void) ud;
    return false;
}

static bool abort_now(void * ud) {
    (void) ud;
    return true;
}

/* model_loader over a FILE* for parakeet_init_with_params */
static size_t loader_read(void * ctx, void * out, size_t n) {
    return fread(out, 1, n, (FILE *) ctx);
}
static bool loader_eof(void * ctx) { return feof((FILE *) ctx) != 0; }
static void loader_close(void * ctx) { fclose((FILE *) ctx); }

int main(int argc, char ** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s model.bin pcm.f32\n", argv[0]);
        return 2;
    }

    printf("version=%s\n", parakeet_version());
    printf("sysinfo=%s\n", parakeet_print_system_info());

    /* load pcm */
    FILE * f = fopen(argv[2], "rb");
    if (!f) { fprintf(stderr, "no pcm\n"); return 2; }
    fseek(f, 0, SEEK_END);
    long nbytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    int n_samples = (int) (nbytes / 4);
    float * pcm = (float *) malloc((size_t) nbytes);
    if (fread(pcm, 4, (size_t) n_samples, f) != (size_t) n_samples) {
        fprintf(stderr, "short pcm read\n");
        return 2;
    }
    fclose(f);

    /* ---- init from file with default context params ---- */
    struct parakeet_context_params cparams = parakeet_context_default_params();
    struct parakeet_context * ctx =
        parakeet_init_from_file_with_params(argv[1], cparams);
    if (!ctx) { fprintf(stderr, "init failed\n"); return 1; }
    if (parakeet_init_from_file_with_params("/nonexistent.bin", cparams)) {
        fprintf(stderr, "bogus init should fail\n");
        return 1;
    }

    printf("n_vocab=%d n_audio_ctx=%d n_mels=%d layers=%d state=%d "
           "heads=%d ftype=%d\n",
           parakeet_n_vocab(ctx), parakeet_n_audio_ctx(ctx),
           parakeet_model_n_mels(ctx), parakeet_model_n_audio_layer(ctx),
           parakeet_model_n_audio_state(ctx),
           parakeet_model_n_audio_head(ctx), parakeet_model_ftype(ctx));
    printf("blank=%d unk=%d bos=%d\n", parakeet_token_blank(ctx),
           parakeet_token_unk(ctx), parakeet_token_bos(ctx));

    /* ---- run A: full on the default state, all callbacks live ---- */
    struct parakeet_full_params params =
        parakeet_full_default_params(PARAKEET_SAMPLING_GREEDY);
    params.new_segment_callback   = on_new_segment;
    params.new_token_callback     = on_new_token;
    params.progress_callback      = on_progress;
    params.encoder_begin_callback = on_encoder_begin;

    int rc = parakeet_full(ctx, params, pcm, n_samples);
    if (rc != 0) { fprintf(stderr, "full rc=%d\n", rc); return 1; }

    int n_seg = parakeet_full_n_segments(ctx);
    printf("n_segments=%d new_segment_cb=%d new_token_cb=%d progress_cb=%d "
           "encoder_begin_cb=%d\n",
           n_seg, n_new_segment, n_new_token, n_progress, n_encoder_begin);
    if (n_seg < 1 || n_new_segment < 1 || n_encoder_begin < 1 ||
        n_progress < 1) {
        fprintf(stderr, "callbacks did not fire\n");
        return 1;
    }

    char text[4096] = {0};
    for (int i = 0; i < n_seg; i++) {
        int64_t t0 = parakeet_full_get_segment_t0(ctx, i);
        int64_t t1 = parakeet_full_get_segment_t1(ctx, i);
        const char * seg = parakeet_full_get_segment_text(ctx, i);
        printf("segment %d: [%lld..%lld] '%s'\n", i, (long long) t0,
               (long long) t1, seg);
        strncat(text, seg, sizeof(text) - strlen(text) - 1);
        int n_tok = parakeet_full_n_tokens(ctx, i);
        if (n_tok != n_new_token) {
            fprintf(stderr, "token count mismatch %d vs %d\n", n_tok,
                    n_new_token);
            return 1;
        }
        for (int j = 0; j < n_tok && j < 3; j++) {
            parakeet_token_data td = parakeet_full_get_token_data(ctx, i, j);
            printf("  token %d: id=%d dur=%d frame=%d p=%.3f t0=%lld "
                   "t1=%lld ws=%d '%s'\n",
                   j, td.id, td.duration_value, td.frame_index, td.p,
                   (long long) td.t0, (long long) td.t1,
                   (int) td.is_word_start,
                   parakeet_full_get_token_text(ctx, i, j));
            if (td.id != parakeet_full_get_token_id(ctx, i, j)) {
                fprintf(stderr, "token id mismatch\n");
                return 1;
            }
            float p = parakeet_full_get_token_p(ctx, i, j);
            if (p < 0.0f || p > 1.00001f) {
                fprintf(stderr, "token p out of range\n");
                return 1;
            }
        }
    }
    printf("TEXT=%s\n", text);
    if (strcmp(seg_text_live, text) != 0) {
        fprintf(stderr, "mid-run accessor text != final text\n");
        return 1;
    }

    /* logits of the last decode: one row per emitted token */
    int rows = parakeet_n_logits_rows(ctx);
    int cols = parakeet_n_logits_cols(ctx);
    float * logits = parakeet_get_logits(ctx);
    printf("logits: rows=%d cols=%d l00=%.4f\n", rows, cols,
           rows > 0 ? logits[0] : 0.0f);
    if (rows != n_new_token || cols < parakeet_n_vocab(ctx) + 1) {
        fprintf(stderr, "logits shape wrong\n");
        return 1;
    }

    /* mel metadata recorded on the default state */
    printf("n_len=%d\n", parakeet_n_len(ctx));
    if (parakeet_n_len(ctx) <= 0) { fprintf(stderr, "no mel\n"); return 1; }

    /* ---- run B: encoder_begin veto -> -6, no new segments ---- */
    struct parakeet_full_params veto = parakeet_full_default_params(
        PARAKEET_SAMPLING_GREEDY);
    veto.encoder_begin_callback = veto_encoder;
    rc = parakeet_full(ctx, veto, pcm, n_samples);
    printf("run B: veto rc=%d n_segments=%d\n", rc,
           parakeet_full_n_segments(ctx));
    if (rc != -6) { fprintf(stderr, "veto rc=%d\n", rc); return 1; }

    /* ---- run C: abort_callback -> abort (-6) ---- */
    struct parakeet_full_params ab = parakeet_full_default_params(
        PARAKEET_SAMPLING_GREEDY);
    ab.abort_callback = abort_now;
    rc = parakeet_full(ctx, ab, pcm, n_samples);
    printf("run C: abort rc=%d\n", rc);
    if (rc != -6) { fprintf(stderr, "abort rc=%d\n", rc); return 1; }

    /* ---- run D: dedicated state matches the default state ---- */
    struct parakeet_state * st = parakeet_init_state(ctx);
    if (!st) { fprintf(stderr, "init_state failed\n"); return 1; }
    struct parakeet_full_params p2 = parakeet_full_default_params(
        PARAKEET_SAMPLING_GREEDY);
    rc = parakeet_full_with_state(ctx, st, p2, pcm, n_samples);
    if (rc != 0) { fprintf(stderr, "full_with_state rc=%d\n", rc); return 1; }
    int n_seg_st = parakeet_full_n_segments_from_state(st);
    char text_st[4096] = {0};
    for (int i = 0; i < n_seg_st; i++) {
        strncat(text_st, parakeet_full_get_segment_text_from_state(st, i),
                sizeof(text_st) - strlen(text_st) - 1);
    }
    printf("run D: state text match=%d (n=%d len=%d n_len_state=%d)\n",
           strcmp(text, text_st) == 0, n_seg_st, (int) strlen(text_st),
           parakeet_n_len_from_state(st));
    if (strcmp(text, text_st) != 0) {
        fprintf(stderr, "state text mismatch\n");
        return 1;
    }
    parakeet_token_data td_st =
        parakeet_full_get_token_data_from_state(st, 0, 0);
    if (td_st.id != parakeet_full_get_token_id_from_state(st, 0, 0)) {
        fprintf(stderr, "state token data mismatch\n");
        return 1;
    }
    parakeet_free_state(st);

    /* ---- run E: chunk streaming (persistent LSTM/token state) ---- */
    struct parakeet_state * st2 = parakeet_init_state(ctx);
    struct parakeet_full_params pc = parakeet_full_default_params(
        PARAKEET_SAMPLING_GREEDY);
    pc.no_context = true;
    rc = parakeet_chunk(ctx, st2, pc, pcm, n_samples / 2);
    if (rc != 0) { fprintf(stderr, "chunk1 rc=%d\n", rc); return 1; }
    pc.no_context = false;  /* keep LSTM state across chunks */
    rc = parakeet_chunk(ctx, st2, pc, pcm + n_samples / 2,
                        n_samples - n_samples / 2);
    if (rc != 0) { fprintf(stderr, "chunk2 rc=%d\n", rc); return 1; }
    printf("run E: chunk segments=%d\n",
           parakeet_full_n_segments_from_state(st2));
    if (parakeet_full_n_segments_from_state(st2) < 1) {
        fprintf(stderr, "chunk produced nothing\n");
        return 1;
    }
    parakeet_free_state(st2);

    /* ---- tokenizer ---- */
    parakeet_token toks[64];
    int n_tok = parakeet_tokenize(ctx, "bee", toks, 64);
    printf("tokenize('bee'): n=%d count=%d\n", n_tok,
           parakeet_token_count(ctx, "bee"));
    if (n_tok <= 0 || n_tok != parakeet_token_count(ctx, "bee")) {
        fprintf(stderr, "tokenize mismatch\n");
        return 1;
    }
    const char * tstr = parakeet_token_to_str(ctx, toks[0]);
    char disp[64];
    int n_disp = parakeet_token_to_text(tstr, true, disp, sizeof(disp));
    printf("token_to_str(%d)='%s' to_text='%s' (%d)\n", toks[0], tstr, disp,
           n_disp);
    if (n_disp < 0) { fprintf(stderr, "token_to_text failed\n"); return 1; }

    /* ---- timings ---- */
    struct parakeet_timings * t = parakeet_get_timings(ctx);
    printf("timings: sample=%.2f encode=%.2f decode=%.2f\n", t->sample_ms,
           t->encode_ms, t->decode_ms);
    if (t->encode_ms <= 0.0f) { fprintf(stderr, "no encode time\n"); return 1; }
    parakeet_reset_timings(ctx);
    t = parakeet_get_timings(ctx);
    if (t->encode_ms != 0.0f) { fprintf(stderr, "reset failed\n"); return 1; }
    parakeet_print_timings(ctx);

    parakeet_free(ctx);

    /* ---- init from buffer + loader paths, default-params-by-ref ---- */
    f = fopen(argv[1], "rb");
    fseek(f, 0, SEEK_END);
    long msz = ftell(f);
    fseek(f, 0, SEEK_SET);
    void * mbuf = malloc((size_t) msz);
    if (fread(mbuf, 1, (size_t) msz, f) != (size_t) msz) return 1;
    fclose(f);
    struct parakeet_context_params * cp =
        parakeet_context_default_params_by_ref();
    struct parakeet_context * ctx2 =
        parakeet_init_from_buffer_with_params(mbuf, (size_t) msz, *cp);
    parakeet_free_context_params(cp);
    free(mbuf);
    if (!ctx2) { fprintf(stderr, "buffer init failed\n"); return 1; }
    printf("buffer init: n_vocab=%d\n", parakeet_n_vocab(ctx2));
    parakeet_free(ctx2);

    struct parakeet_model_loader loader = {
        fopen(argv[1], "rb"), loader_read, loader_eof, loader_close};
    struct parakeet_context * ctx3 = parakeet_init_with_params_no_state(
        &loader, parakeet_context_default_params());
    if (!ctx3) { fprintf(stderr, "loader init failed\n"); return 1; }
    struct parakeet_full_params * pref =
        parakeet_full_default_params_by_ref(PARAKEET_SAMPLING_GREEDY);
    if (!pref || pref->n_threads != 4 || !pref->no_context) {
        fprintf(stderr, "default params by ref wrong\n");
        return 1;
    }
    parakeet_free_params(pref);
    parakeet_free(ctx3);

    free(pcm);
    printf("PARAKEET-ABI-OK\n");
    return 0;
}

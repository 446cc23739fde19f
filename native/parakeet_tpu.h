/* parakeet_tpu C ABI — the parakeet.h-shaped surface exported by
 * libwhisper_tpu.so (native/whisper_abi.cpp, parakeet section).
 *
 * Consumer header for the second model family's C API (reference shape:
 * include/parakeet.h:1-342).  Semantics mirror the reference 1:1: a
 * parakeet_context owns a default state, parakeet_init_state forks extra
 * decode states sharing the weights, parakeet_full/parakeet_chunk take the
 * parakeet_full_params struct by value with all five C function-pointer
 * callbacks (new_segment / new_token / progress / encoder_begin / abort),
 * and segment/token accessors read results live (including from inside the
 * callbacks, mid-run).  Timestamps are encoder-frame*subsampling ticks
 * (10 ms), like the reference.
 *
 * Additions over the reference for struct-free FFIs: parakeet_full_json /
 * parakeet_chunk_json take the same parameters as a JSON object of
 * parakeet_full_params field names.
 *
 * Thread-safety: calls serialize on the embedded interpreter's GIL.
 * Link: -lwhisper_tpu plus the libpython the shim embeds.
 */

#ifndef PARAKEET_TPU_H
#define PARAKEET_TPU_H

#include <stdbool.h>
#include <stddef.h>
#include <stdint.h>

#define PARAKEET_SAMPLE_RATE 16000
#define PARAKEET_HOP_LENGTH  160

#ifdef __cplusplus
extern "C" {
#endif

struct parakeet_context;
struct parakeet_state;
struct parakeet_full_params;

typedef int32_t parakeet_pos;
typedef int32_t parakeet_token;
typedef int32_t parakeet_seq_id;

struct parakeet_context_params {
    bool use_gpu;    /* accepted; no meaning on TPU */
    int  gpu_device;
};

typedef struct parakeet_token_data {
    parakeet_token id;  /* BPE subword id */

    int duration_idx;   /* index into the model's durations array */
    int duration_value; /* actual duration value (encoder frames) */
    int frame_index;

    float p;
    float plog;

    int64_t t0;
    int64_t t1;

    bool is_word_start;
} parakeet_token_data;

typedef struct parakeet_model_loader {
    void * context;

    size_t (*read)(void * ctx, void * output, size_t read_size);
    bool   (*eof)(void * ctx);
    void   (*close)(void * ctx);
} parakeet_model_loader;

const char * parakeet_version(void);

/* ---- lifecycle (parakeet.h:82-102) ---- */
struct parakeet_context * parakeet_init_from_file_with_params(
        const char * path_model, struct parakeet_context_params params);
struct parakeet_context * parakeet_init_from_buffer_with_params(
        void * buffer, size_t buffer_size,
        struct parakeet_context_params params);
struct parakeet_context * parakeet_init_with_params(
        struct parakeet_model_loader * loader,
        struct parakeet_context_params params);

/* _no_state variants: with XLA there is no separately-allocated compute
 * state to defer, so these behave like the plain inits (documented
 * divergence; parakeet.h:89-92) */
struct parakeet_context * parakeet_init_from_file_with_params_no_state(
        const char * path_model, struct parakeet_context_params params);
struct parakeet_context * parakeet_init_from_buffer_with_params_no_state(
        void * buffer, size_t buffer_size,
        struct parakeet_context_params params);
struct parakeet_context * parakeet_init_with_params_no_state(
        struct parakeet_model_loader * loader,
        struct parakeet_context_params params);

struct parakeet_state * parakeet_init_state(struct parakeet_context * ctx);

void parakeet_free(struct parakeet_context * ctx);
void parakeet_free_state(struct parakeet_state * state);
void parakeet_free_params(struct parakeet_full_params * params);
void parakeet_free_context_params(struct parakeet_context_params * params);

/* ---- pcm -> mel (parakeet.h:104-132) ---- */
int parakeet_pcm_to_mel(struct parakeet_context * ctx, const float * samples,
                        int n_samples, int n_threads);
int parakeet_pcm_to_mel_with_state(struct parakeet_context * ctx,
                                   struct parakeet_state * state,
                                   const float * samples, int n_samples,
                                   int n_threads);
int parakeet_set_mel(struct parakeet_context * ctx, const float * data,
                     int n_len, int n_mel);
int parakeet_set_mel_with_state(struct parakeet_context * ctx,
                                struct parakeet_state * state,
                                const float * data, int n_len, int n_mel);

/* ---- encoder (parakeet.h:134-146) ---- */
int parakeet_encode(struct parakeet_context * ctx, int offset, int n_threads);
int parakeet_encode_with_state(struct parakeet_context * ctx,
                               struct parakeet_state * state, int offset,
                               int n_threads);

/* ---- tokenizer (parakeet.h:148-161) ---- */
int parakeet_tokenize(struct parakeet_context * ctx, const char * text,
                      parakeet_token * tokens, int n_max_tokens);
int parakeet_token_count(struct parakeet_context * ctx, const char * text);

/* ---- introspection (parakeet.h:163-176) ---- */
int parakeet_n_len(struct parakeet_context * ctx);
int parakeet_n_len_from_state(struct parakeet_state * state);
int parakeet_n_vocab(struct parakeet_context * ctx);
int parakeet_n_audio_ctx(struct parakeet_context * ctx);

int parakeet_model_n_vocab(struct parakeet_context * ctx);
int parakeet_model_n_audio_ctx(struct parakeet_context * ctx);
int parakeet_model_n_audio_state(struct parakeet_context * ctx);
int parakeet_model_n_audio_head(struct parakeet_context * ctx);
int parakeet_model_n_audio_layer(struct parakeet_context * ctx);
int parakeet_model_n_mels(struct parakeet_context * ctx);
int parakeet_model_ftype(struct parakeet_context * ctx);

/* ---- logits of the last full/chunk (parakeet.h:177-183) ----
 * rows: decoded tokens of the last call (see parakeet_n_logits_rows);
 * cols: n_vocab + 1 (blank) + n durations, matching the reference's
 * state->logits row stride (src/parakeet.cpp:2396) */
float * parakeet_get_logits(struct parakeet_context * ctx);
float * parakeet_get_logits_from_state(struct parakeet_state * state);
int parakeet_n_logits_rows(struct parakeet_context * ctx);
int parakeet_n_logits_cols(struct parakeet_context * ctx);

/* ---- token strings (parakeet.h:185-192) ---- */
const char * parakeet_token_to_str(struct parakeet_context * ctx,
                                   parakeet_token token);
int parakeet_token_to_text(const char * token_str, bool is_first,
                           char * output, int max_len);

parakeet_token parakeet_token_blank(struct parakeet_context * ctx);
parakeet_token parakeet_token_unk(struct parakeet_context * ctx);
parakeet_token parakeet_token_bos(struct parakeet_context * ctx);

/* ---- timings (parakeet.h:195-205) ---- */
struct parakeet_timings {
    float sample_ms;
    float encode_ms;
    float decode_ms;
};
struct parakeet_timings * parakeet_get_timings(struct parakeet_context * ctx);
void parakeet_print_timings(struct parakeet_context * ctx);
void parakeet_reset_timings(struct parakeet_context * ctx);

const char * parakeet_print_system_info(void);

/* ---- sampling / callbacks / full params (parakeet.h:208-297) ---- */
enum parakeet_sampling_strategy {
    PARAKEET_SAMPLING_GREEDY,
};

typedef void (*parakeet_new_token_callback)(
        struct parakeet_context * ctx, struct parakeet_state * state,
        const parakeet_token_data * token_data, void * user_data);
typedef void (*parakeet_new_segment_callback)(
        struct parakeet_context * ctx, struct parakeet_state * state,
        int n_new, void * user_data);
typedef void (*parakeet_progress_callback)(
        struct parakeet_context * ctx, struct parakeet_state * state,
        int progress, void * user_data);
typedef bool (*parakeet_encoder_begin_callback)(
        struct parakeet_context * ctx, struct parakeet_state * state,
        void * user_data);
#ifndef WHISPER_TPU_H
typedef bool (*ggml_abort_callback)(void * data);
#endif

struct parakeet_full_params {
    enum parakeet_sampling_strategy strategy;

    int n_threads;
    int offset_ms;   /* declared by the reference header; unused by its
                        implementation — kept for layout parity */
    int duration_ms;

    bool no_context; /* reset LSTM/token state before decoding */

    int audio_ctx;   /* overwrite the audio context size (0 = default) */

    parakeet_new_segment_callback new_segment_callback;
    void * new_segment_callback_user_data;

    parakeet_new_token_callback new_token_callback;
    void * new_token_callback_user_data;

    parakeet_progress_callback progress_callback;
    void * progress_callback_user_data;

    parakeet_encoder_begin_callback encoder_begin_callback;
    void * encoder_begin_callback_user_data;

    ggml_abort_callback abort_callback;
    void * abort_callback_user_data;
};

struct parakeet_context_params * parakeet_context_default_params_by_ref(void);
struct parakeet_context_params parakeet_context_default_params(void);

struct parakeet_full_params * parakeet_full_default_params_by_ref(
        enum parakeet_sampling_strategy strategy);
struct parakeet_full_params parakeet_full_default_params(
        enum parakeet_sampling_strategy strategy);

/* ---- run the model (parakeet.h:299-320) ---- */
int parakeet_full(struct parakeet_context * ctx,
                  struct parakeet_full_params params,
                  const float * samples, int n_samples);
int parakeet_full_with_state(struct parakeet_context * ctx,
                             struct parakeet_state * state,
                             struct parakeet_full_params params,
                             const float * samples, int n_samples);
int parakeet_chunk(struct parakeet_context * ctx,
                   struct parakeet_state * state,
                   struct parakeet_full_params params,
                   const float * samples, int n_samples);

/* struct-free convenience entry points (whisper_full_json pattern) */
const char * parakeet_full_default_params_json(int strategy);
int parakeet_full_json(struct parakeet_context * ctx,
                       const char * params_json,
                       const float * samples, int n_samples);

/* ---- results (parakeet.h:322-338) ---- */
int parakeet_full_n_segments(struct parakeet_context * ctx);
int parakeet_full_n_segments_from_state(struct parakeet_state * state);

int64_t parakeet_full_get_segment_t0(struct parakeet_context * ctx,
                                     int i_segment);
int64_t parakeet_full_get_segment_t0_from_state(struct parakeet_state * state,
                                                int i_segment);
int64_t parakeet_full_get_segment_t1(struct parakeet_context * ctx,
                                     int i_segment);
int64_t parakeet_full_get_segment_t1_from_state(struct parakeet_state * state,
                                                int i_segment);

const char * parakeet_full_get_segment_text(struct parakeet_context * ctx,
                                            int i_segment);
const char * parakeet_full_get_segment_text_from_state(
        struct parakeet_state * state, int i_segment);

int parakeet_full_n_tokens(struct parakeet_context * ctx, int i_segment);
int parakeet_full_n_tokens_from_state(struct parakeet_state * state,
                                      int i_segment);

const char * parakeet_full_get_token_text(struct parakeet_context * ctx,
                                          int i_segment, int i_token);
const char * parakeet_full_get_token_text_from_state(
        struct parakeet_context * ctx, struct parakeet_state * state,
        int i_segment, int i_token);

parakeet_token parakeet_full_get_token_id(struct parakeet_context * ctx,
                                          int i_segment, int i_token);
parakeet_token parakeet_full_get_token_id_from_state(
        struct parakeet_state * state, int i_segment, int i_token);

parakeet_token_data parakeet_full_get_token_data(
        struct parakeet_context * ctx, int i_segment, int i_token);
parakeet_token_data parakeet_full_get_token_data_from_state(
        struct parakeet_state * state, int i_segment, int i_token);

float parakeet_full_get_token_p(struct parakeet_context * ctx,
                                int i_segment, int i_token);
float parakeet_full_get_token_p_from_state(struct parakeet_state * state,
                                           int i_segment, int i_token);

/* ---- logging (parakeet.h:340) ---- */
typedef void (*parakeet_log_callback)(int level, const char * text,
                                      void * user_data);
void parakeet_log_set(parakeet_log_callback log_callback, void * user_data);

#ifdef __cplusplus
}
#endif

#endif /* PARAKEET_TPU_H */

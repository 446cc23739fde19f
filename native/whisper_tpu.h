/* whisper_tpu C ABI — the whisper.h-shaped surface exported by
 * libwhisper_tpu.so (native/whisper_abi.cpp).
 *
 * This is the consumer header for language bindings (bindings/cpp,
 * bindings/go; reference shape: include/whisper.h:201-767).
 * whisper_full/_with_state/_parallel take the whisper.h-layout
 * whisper_full_params struct by value — including the five C
 * function-pointer callbacks (new_segment / progress / encoder_begin /
 * abort / logits_filter) every reference binding is built on — so
 * whisper.cpp FFI consumers keep their struct marshalling unchanged.
 * Additions over the reference, for FFIs that cannot marshal C structs:
 * *_json entry points take the same parameters as a JSON object of
 * whisper_full_params field names (whisper_full_default_params_json
 * returns the editable defaults), and token data is also available as
 * JSON (whisper_full_get_token_data_json).  Semantics mirror whisper.h
 * 1:1; timestamps are in 10 ms ticks like the reference.
 *
 * Thread-safety: calls serialize on the embedded interpreter's GIL.
 * Link: -lwhisper_tpu plus the libpython the shim embeds.
 */

#ifndef WHISPER_TPU_H
#define WHISPER_TPU_H

#include <stdbool.h>
#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

struct whisper_context;
struct whisper_state;
struct whisper_vad_context;

/* ---- lifecycle (whisper.h:201-260) ---- */
struct whisper_context * whisper_init_from_file(const char * path_model);
struct whisper_context * whisper_init_from_buffer(void * buffer, int n_bytes);
void whisper_free(struct whisper_context * ctx);
struct whisper_state * whisper_init_state(struct whisper_context * ctx);
void whisper_free_state(struct whisper_state * state);

/* ---- full pipeline (whisper.h:640-700) ----
 * whisper_full/_with_state/_parallel take the whisper.h-layout
 * whisper_full_params struct (declared below) by value, exactly like the
 * reference — including the five C function-pointer callbacks.  The *_json
 * variants are the struct-free convenience entry points for FFIs that
 * cannot marshal C structs: pass NULL/"" for reference defaults, or e.g.
 * "{\"language\": \"en\", \"beam_size\": 5, \"temperature_inc\": 0}". */
const char * whisper_full_default_params_json(int strategy);
int whisper_full_json(struct whisper_context * ctx, const char * params_json,
                      const float * samples, int n_samples);
int whisper_full_with_state_json(struct whisper_context * ctx,
                                 struct whisper_state * state,
                                 const char * params_json,
                                 const float * samples, int n_samples);
int whisper_full_parallel_json(struct whisper_context * ctx,
                               const char * params_json,
                               const float * samples, int n_samples,
                               int n_processors);

int whisper_full_n_segments(struct whisper_context * ctx);
int64_t whisper_full_get_segment_t0(struct whisper_context * ctx, int i);
int64_t whisper_full_get_segment_t1(struct whisper_context * ctx, int i);
const char * whisper_full_get_segment_text(struct whisper_context * ctx, int i);
bool whisper_full_get_segment_speaker_turn_next(struct whisper_context * ctx, int i);
float whisper_full_get_segment_no_speech_prob(struct whisper_context * ctx, int i);
int whisper_full_n_tokens(struct whisper_context * ctx, int i);
int whisper_full_get_token_id(struct whisper_context * ctx, int i, int j);
const char * whisper_full_get_token_text(struct whisper_context * ctx, int i, int j);
float whisper_full_get_token_p(struct whisper_context * ctx, int i, int j);
int64_t whisper_full_get_token_t0(struct whisper_context * ctx, int i, int j);
int64_t whisper_full_get_token_t1(struct whisper_context * ctx, int i, int j);
const char * whisper_full_get_token_data_json(struct whisper_context * ctx, int i, int j);
int whisper_full_lang_id(struct whisper_context * ctx);

/* _from_state variants (parallel decodes; whisper.h:660-700) */
int whisper_full_n_segments_from_state(struct whisper_state * state);
int64_t whisper_full_get_segment_t0_from_state(struct whisper_state * state, int i);
int64_t whisper_full_get_segment_t1_from_state(struct whisper_state * state, int i);
const char * whisper_full_get_segment_text_from_state(struct whisper_state * state, int i);
bool whisper_full_get_segment_speaker_turn_next_from_state(struct whisper_state * state, int i);
float whisper_full_get_segment_no_speech_prob_from_state(struct whisper_state * state, int i);
int whisper_full_n_tokens_from_state(struct whisper_state * state, int i);
int whisper_full_get_token_id_from_state(struct whisper_state * state, int i, int j);
float whisper_full_get_token_p_from_state(struct whisper_state * state, int i, int j);
const char * whisper_full_get_token_text_from_state(struct whisper_context * ctx,
                                                    struct whisper_state * state,
                                                    int i, int j);
int64_t whisper_full_get_token_t0_from_state(struct whisper_state * state, int i, int j);
int64_t whisper_full_get_token_t1_from_state(struct whisper_state * state, int i, int j);
const char * whisper_full_get_token_data_json_from_state(struct whisper_state * state,
                                                         int i, int j);
int whisper_full_lang_id_from_state(struct whisper_state * state);

/* VAD segments recorded by whisper_full when params.vad is on
 * (whisper.h:686-698): original start/end ticks of the kept speech */
int whisper_full_n_vad_segments(struct whisper_context * ctx);
int64_t whisper_full_get_vad_segment_t0(struct whisper_context * ctx, int i);
int64_t whisper_full_get_vad_segment_t1(struct whisper_context * ctx, int i);
int whisper_full_n_vad_segments_from_state(struct whisper_state * state);
int64_t whisper_full_get_vad_segment_t0_from_state(struct whisper_state * state, int i);
int64_t whisper_full_get_vad_segment_t1_from_state(struct whisper_state * state, int i);

/* ---- step-by-step pipeline (whisper.h:260-360) ---- */
int whisper_pcm_to_mel(struct whisper_context * ctx, const float * samples,
                       int n_samples, int n_threads);
int whisper_set_mel(struct whisper_context * ctx, const float * data,
                    int n_len, int n_mel);
int whisper_encode(struct whisper_context * ctx, int offset, int n_threads);
int whisper_decode(struct whisper_context * ctx, const int * tokens,
                   int n_tokens, int n_past, int n_threads);
const float * whisper_get_logits(struct whisper_context * ctx);

/* state variants (whisper.h:265-341, 417): compute happens on the state */
int whisper_pcm_to_mel_with_state(struct whisper_context * ctx,
                                  struct whisper_state * state,
                                  const float * samples, int n_samples,
                                  int n_threads);
int whisper_set_mel_with_state(struct whisper_context * ctx,
                               struct whisper_state * state,
                               const float * data, int n_len, int n_mel);
int whisper_encode_with_state(struct whisper_context * ctx,
                              struct whisper_state * state,
                              int offset, int n_threads);
int whisper_decode_with_state(struct whisper_context * ctx,
                              struct whisper_state * state,
                              const int * tokens, int n_tokens,
                              int n_past, int n_threads);
const float * whisper_get_logits_from_state(struct whisper_state * state);
int whisper_n_len_from_state(struct whisper_state * state);
int whisper_lang_auto_detect_with_state(struct whisper_context * ctx,
                                        struct whisper_state * state,
                                        int offset_ms, int n_threads,
                                        float * lang_probs);

/* ---- tokenizer (whisper.h:345-380) ---- */
int whisper_tokenize(struct whisper_context * ctx, const char * text,
                     int * tokens, int n_max_tokens);
int whisper_token_count(struct whisper_context * ctx, const char * text);
const char * whisper_token_to_str(struct whisper_context * ctx, int token);
int whisper_token_lang(struct whisper_context * ctx, int lang_id);

/* ---- language (whisper.h:380-420) ---- */
int whisper_lang_max_id(void);
int whisper_lang_id(const char * lang);
const char * whisper_lang_str(int id);
int whisper_lang_auto_detect(struct whisper_context * ctx, int offset_ms,
                             int n_threads, float * lang_probs);

/* ---- model/vocab introspection (whisper.h:270-330) ---- */
int whisper_n_len(struct whisper_context * ctx);
int whisper_n_vocab(struct whisper_context * ctx);
int whisper_n_text_ctx(struct whisper_context * ctx);
int whisper_n_audio_ctx(struct whisper_context * ctx);
int whisper_is_multilingual(struct whisper_context * ctx);
int whisper_model_n_vocab(struct whisper_context * ctx);
int whisper_model_n_audio_ctx(struct whisper_context * ctx);
int whisper_model_n_audio_state(struct whisper_context * ctx);
int whisper_model_n_audio_head(struct whisper_context * ctx);
int whisper_model_n_audio_layer(struct whisper_context * ctx);
int whisper_model_n_text_ctx(struct whisper_context * ctx);
int whisper_model_n_text_state(struct whisper_context * ctx);
int whisper_model_n_text_head(struct whisper_context * ctx);
int whisper_model_n_text_layer(struct whisper_context * ctx);
int whisper_model_n_mels(struct whisper_context * ctx);
int whisper_model_ftype(struct whisper_context * ctx);
int whisper_model_type(struct whisper_context * ctx);
const char * whisper_model_type_readable(struct whisper_context * ctx);

/* ---- special tokens (whisper.h:330-345) ---- */
int whisper_token_eot(struct whisper_context * ctx);
int whisper_token_sot(struct whisper_context * ctx);
int whisper_token_solm(struct whisper_context * ctx);
int whisper_token_prev(struct whisper_context * ctx);
int whisper_token_nosp(struct whisper_context * ctx);
int whisper_token_not(struct whisper_context * ctx);
int whisper_token_beg(struct whisper_context * ctx);
int whisper_token_translate(struct whisper_context * ctx);
int whisper_token_transcribe(struct whisper_context * ctx);

/* ---- VAD (whisper.h:699-756) ----
 * whisper_vad_segments_from_* return an allocated segments handle freed by
 * whisper_vad_free_segments, exactly like the reference; the struct-taking
 * variants are declared below with whisper_vad_params. */
struct whisper_vad_segments;
struct whisper_vad_context * whisper_vad_init_from_file(const char * path);
void whisper_vad_free(struct whisper_vad_context * vctx);
struct whisper_vad_segments * whisper_vad_segments_from_samples_json(
    struct whisper_vad_context * vctx, const char * params_json,
    const float * samples, int n_samples);
int whisper_vad_segments_n_segments(struct whisper_vad_segments * segments);
float whisper_vad_segments_get_segment_t0(struct whisper_vad_segments * segments, int i);
float whisper_vad_segments_get_segment_t1(struct whisper_vad_segments * segments, int i);
void whisper_vad_free_segments(struct whisper_vad_segments * segments);

/* low-level VAD probability API (whisper.h:717-742) */
bool whisper_vad_detect_speech(struct whisper_vad_context * vctx,
                               const float * samples, int n_samples);
bool whisper_vad_detect_speech_no_reset(struct whisper_vad_context * vctx,
                                        const float * samples, int n_samples);
int whisper_vad_n_probs(struct whisper_vad_context * vctx);
float * whisper_vad_probs(struct whisper_vad_context * vctx);
void whisper_vad_reset_state(struct whisper_vad_context * vctx);
struct whisper_vad_segments * whisper_vad_segments_from_probs_json(
    struct whisper_vad_context * vctx, const char * params_json);

/* ---- built-in microbenchmarks (whisper.h:756-759; n_threads ignored —
 * the TPU runtime picks its own parallelism) ---- */
int whisper_bench_memcpy(int n_threads);
const char * whisper_bench_memcpy_str(int n_threads);
int whisper_bench_ggml_mul_mat(int n_threads);
const char * whisper_bench_ggml_mul_mat_str(int n_threads);

/* ---- logging (whisper.h:584): levels are ggml_log_level-shaped
 * (NONE=0 DEBUG=1 INFO=2 WARN=3 ERROR=4); NULL restores stderr ---- */
typedef void (*whisper_log_callback)(int level, const char * text,
                                     void * user_data);
void whisper_log_set(whisper_log_callback callback, void * user_data);

/* ---- misc (whisper.h:420-470) ---- */
const char * whisper_version(void);
const char * whisper_print_system_info(void);
void whisper_print_timings(struct whisper_context * ctx);
void whisper_reset_timings(struct whisper_context * ctx);

/* ---- whisper.h-compatible structs + remaining lifecycle ------------------
 * These mirror include/whisper.h:86-159, 438-447 field-for-field so
 * whisper.cpp FFI consumers can keep their struct marshalling.  On the TPU
 * runtime use_gpu/gpu_device/flash_attn are ignored (single XLA/Pallas
 * backend; fused attention is selected automatically); the DTW fields act. */

enum whisper_alignment_heads_preset {
    WHISPER_AHEADS_NONE,
    WHISPER_AHEADS_N_TOP_MOST,
    WHISPER_AHEADS_CUSTOM,
    WHISPER_AHEADS_TINY_EN,
    WHISPER_AHEADS_TINY,
    WHISPER_AHEADS_BASE_EN,
    WHISPER_AHEADS_BASE,
    WHISPER_AHEADS_SMALL_EN,
    WHISPER_AHEADS_SMALL,
    WHISPER_AHEADS_MEDIUM_EN,
    WHISPER_AHEADS_MEDIUM,
    WHISPER_AHEADS_LARGE_V1,
    WHISPER_AHEADS_LARGE_V2,
    WHISPER_AHEADS_LARGE_V3,
    WHISPER_AHEADS_LARGE_V3_TURBO,
};

typedef struct whisper_ahead {
    int n_text_layer;
    int n_head;
} whisper_ahead;

typedef struct whisper_aheads {
    size_t n_heads;
    const whisper_ahead * heads;
} whisper_aheads;

struct whisper_context_params {
    bool  use_gpu;       /* ignored: one TPU backend */
    bool  flash_attn;    /* ignored: fused attention auto-selected */
    int   gpu_device;    /* ignored */
    bool dtw_token_timestamps;
    enum whisper_alignment_heads_preset dtw_aheads_preset;
    int dtw_n_top;
    struct whisper_aheads dtw_aheads;
    size_t dtw_mem_size; /* ignored (reference marks it TODO: remove) */
};

typedef struct whisper_token_data {
    int32_t id;
    int32_t tid;
    float p;
    float plog;
    float pt;
    float ptsum;
    int64_t t0;
    int64_t t1;
    int64_t t_dtw;
    float vlen;
} whisper_token_data;

struct whisper_timings {
    float sample_ms;
    float encode_ms;
    float decode_ms;
    float batchd_ms;
    float prompt_ms;
};

typedef struct whisper_model_loader {
    void * context;
    size_t (*read)(void * ctx, void * output, size_t read_size);
    bool    (*eof)(void * ctx);
    void  (*close)(void * ctx);
} whisper_model_loader;

struct whisper_context_params whisper_context_default_params(void);
struct whisper_context_params * whisper_context_default_params_by_ref(void);
void whisper_free_context_params(struct whisper_context_params * params);
void whisper_free_params(void * params); /* frees any *_by_ref allocation */

/* params-taking init variants (whisper.h:205-246).  The *_no_state names
 * are aliases: whisper_tpu contexts hold no eagerly-allocated state (states
 * are created on demand by whisper_init_state), which is the no_state
 * behavior. */
struct whisper_context * whisper_init_from_file_with_params(
        const char * path_model, struct whisper_context_params params);
struct whisper_context * whisper_init_from_buffer_with_params(
        void * buffer, size_t buffer_size,
        struct whisper_context_params params);
struct whisper_context * whisper_init_with_params(
        struct whisper_model_loader * loader,
        struct whisper_context_params params);
struct whisper_context * whisper_init_from_file_with_params_no_state(
        const char * path_model, struct whisper_context_params params);
struct whisper_context * whisper_init_from_buffer_with_params_no_state(
        void * buffer, size_t buffer_size,
        struct whisper_context_params params);
struct whisper_context * whisper_init_with_params_no_state(
        struct whisper_model_loader * loader,
        struct whisper_context_params params);
/* deprecated unparameterized forms (whisper.h:234-246) */
struct whisper_context * whisper_init(struct whisper_model_loader * loader);
struct whisper_context * whisper_init_no_state(struct whisper_model_loader * loader);
struct whisper_context * whisper_init_from_file_no_state(const char * path_model);
struct whisper_context * whisper_init_from_buffer_no_state(void * buffer,
                                                           size_t buffer_size);

const char * whisper_lang_str_full(int id);
struct whisper_timings * whisper_get_timings(struct whisper_context * ctx);

/* VAD param structs (whisper.h:192-199, 701-712) */
typedef struct whisper_vad_params {
    float threshold;
    int   min_speech_duration_ms;
    int   min_silence_duration_ms;
    float max_speech_duration_s;
    int   speech_pad_ms;
    float samples_overlap;
} whisper_vad_params;

struct whisper_vad_context_params {
    int   n_threads;  /* ignored: TPU runtime picks its own parallelism */
    bool  use_gpu;    /* ignored */
    int   gpu_device; /* ignored */
};

whisper_vad_params whisper_vad_default_params(void);
struct whisper_vad_context_params whisper_vad_default_context_params(void);
struct whisper_vad_context * whisper_vad_init_from_file_with_params(
        const char * path_model, struct whisper_vad_context_params params);
struct whisper_vad_context * whisper_vad_init_with_params(
        struct whisper_model_loader * loader,
        struct whisper_vad_context_params params);

/* struct-returning token accessors (whisper.h:729-734); the JSON variants
 * above remain for FFIs that cannot marshal C structs */
whisper_token_data whisper_full_get_token_data(struct whisper_context * ctx,
                                               int i_segment, int i_token);
whisper_token_data whisper_full_get_token_data_from_state(
        struct whisper_state * state, int i_segment, int i_token);

/* ---- whisper_full_params + callbacks (whisper.h:455-591) -----------------
 * Field-for-field whisper.h layout, including the five function-pointer
 * callbacks every reference binding is built on.  n_threads is accepted
 * but ignored (XLA owns threading); debug_mode likewise (matches the
 * reference core, where only the CLI reads it). */

typedef int32_t whisper_token;

enum whisper_sampling_strategy {
    WHISPER_SAMPLING_GREEDY,
    WHISPER_SAMPLING_BEAM_SEARCH,
};

/* grammar element (whisper.h:162-190) */
enum whisper_gretype {
    WHISPER_GRETYPE_END            = 0,
    WHISPER_GRETYPE_ALT            = 1,
    WHISPER_GRETYPE_RULE_REF       = 2,
    WHISPER_GRETYPE_CHAR           = 3,
    WHISPER_GRETYPE_CHAR_NOT       = 4,
    WHISPER_GRETYPE_CHAR_RNG_UPPER = 5,
    WHISPER_GRETYPE_CHAR_ALT       = 6,
};

typedef struct whisper_grammar_element {
    enum whisper_gretype type;
    uint32_t             value;  /* Unicode code point or rule ID */
} whisper_grammar_element;

/* called on every newly generated text segment (n_new new ones; read them
 * with whisper_full_n_segments(_from_state) + the segment accessors —
 * they are live mid-run) */
typedef void (*whisper_new_segment_callback)(
        struct whisper_context * ctx, struct whisper_state * state,
        int n_new, void * user_data);

/* called on each progress update (percent of the seek window consumed) */
typedef void (*whisper_progress_callback)(
        struct whisper_context * ctx, struct whisper_state * state,
        int progress, void * user_data);

/* called before each window's encode; return false to stop the run */
typedef bool (*whisper_encoder_begin_callback)(
        struct whisper_context * ctx, struct whisper_state * state,
        void * user_data);

/* ggml_abort_callback shape (ggml.h): return true to abort the run; polled
 * at window start, every decode step, and between fallback attempts */
typedef bool (*ggml_abort_callback)(void * data);

/* called after the built-in logit filters each decode step; may rewrite
 * logits (n_tokens entries describe the tokens decoded so far this window) */
typedef void (*whisper_logits_filter_callback)(
        struct whisper_context * ctx, struct whisper_state * state,
        const whisper_token_data * tokens, int n_tokens,
        float * logits, void * user_data);

struct whisper_full_params {
    enum whisper_sampling_strategy strategy;

    int n_threads;
    int n_max_text_ctx;
    int offset_ms;
    int duration_ms;

    bool translate;
    bool no_context;
    bool no_timestamps;
    bool single_segment;
    bool print_special;
    bool print_progress;
    bool print_realtime;
    bool print_timestamps;

    bool  token_timestamps;
    float thold_pt;
    float thold_ptsum;
    int   max_len;
    bool  split_on_word;
    int   max_tokens;

    bool debug_mode;
    int  audio_ctx;

    bool tdrz_enable;

    const char * suppress_regex;

    const char * initial_prompt;
    bool carry_initial_prompt;
    const whisper_token * prompt_tokens;
    int prompt_n_tokens;

    const char * language;   /* NULL/""/"auto" -> auto-detect */
    bool detect_language;

    bool suppress_blank;
    bool suppress_nst;

    float temperature;
    float max_initial_ts;
    float length_penalty;

    float temperature_inc;
    float entropy_thold;
    float logprob_thold;
    float no_speech_thold;

    struct {
        int best_of;
    } greedy;

    struct {
        int   beam_size;
        float patience;
    } beam_search;

    whisper_new_segment_callback new_segment_callback;
    void * new_segment_callback_user_data;

    whisper_progress_callback progress_callback;
    void * progress_callback_user_data;

    whisper_encoder_begin_callback encoder_begin_callback;
    void * encoder_begin_callback_user_data;

    ggml_abort_callback abort_callback;
    void * abort_callback_user_data;

    whisper_logits_filter_callback logits_filter_callback;
    void * logits_filter_callback_user_data;

    const whisper_grammar_element ** grammar_rules;
    size_t                           n_grammar_rules;
    size_t                           i_start_rule;
    float                            grammar_penalty;

    bool         vad;
    const char * vad_model_path;
    whisper_vad_params vad_params;
};

struct whisper_full_params whisper_full_default_params(
        enum whisper_sampling_strategy strategy);
struct whisper_full_params * whisper_full_default_params_by_ref(
        enum whisper_sampling_strategy strategy);

/* [extension] compiled sizeof(struct whisper_full_params) — lets FFI
 * consumers that hand-declare the layout (bindings/java) assert theirs
 * matches this library's ABI at startup instead of corrupting fields */
size_t whisper_full_params_sizeof(void);

/* whisper.h:640-666 — exact reference signatures (params by value) */
int whisper_full(struct whisper_context * ctx,
                 struct whisper_full_params params,
                 const float * samples, int n_samples);
int whisper_full_with_state(struct whisper_context * ctx,
                            struct whisper_state * state,
                            struct whisper_full_params params,
                            const float * samples, int n_samples);
int whisper_full_parallel(struct whisper_context * ctx,
                          struct whisper_full_params params,
                          const float * samples, int n_samples,
                          int n_processors);

/* struct-taking VAD segmenters (whisper.h:735-744) */
struct whisper_vad_segments * whisper_vad_segments_from_probs(
        struct whisper_vad_context * vctx, whisper_vad_params params);
struct whisper_vad_segments * whisper_vad_segments_from_samples(
        struct whisper_vad_context * vctx, whisper_vad_params params,
        const float * samples, int n_samples);

#ifdef __cplusplus
}
#endif

#endif /* WHISPER_TPU_H */

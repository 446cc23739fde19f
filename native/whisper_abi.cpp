// whisper.h-shaped C ABI over the whisper_tpu Python engine.
//
// The reference's public contract is a C API over opaque contexts
// (include/whisper.h:201-767) consumed by four language bindings
// (bindings/go, java, ruby, javascript).  whisper_tpu's engine is Python
// (JAX), so this shim embeds CPython and forwards the whisper.h call
// sequence to whisper_tpu.capi — letting a C/FFI host drive the TPU engine
// with the familiar init/full/get-segment calls.  Differences from the
// reference ABI, by design:
//   * whisper_full takes its params as a JSON string of whisper_full_params
//     field names instead of a by-value C struct (no struct-layout
//     coupling across the FFI);
//   * functions not meaningful off-device (ggml backend introspection,
//     state-parallel variants) are not exported.
//
// Build (see tests/test_c_abi.py):
//   g++ -shared -fPIC native/whisper_abi.cpp -o libwhisper_tpu.so \
//       $(python3-config --includes) -L$(python3-config --prefix)/lib \
//       -lpython3.X -Wl,-rpath,$(python3-config --prefix)/lib
//
// Thread-safety: every entry point takes the GIL (PyGILState_Ensure), so
// the shim may be called from any host thread, matching the reference's
// per-context external-synchronization contract.

#include <Python.h>

#include <cfloat>
#include <cstdarg>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <vector>

namespace {

PyObject * g_capi = nullptr;   // whisper_tpu.capi module
std::once_flag g_init_once;
bool g_owns_interpreter = false;

void ensure_runtime() {
    std::call_once(g_init_once, [] {
        if (!Py_IsInitialized()) {
            Py_InitializeEx(0);
            g_owns_interpreter = true;
        }
        PyGILState_STATE gil = PyGILState_Ensure();
        g_capi = PyImport_ImportModule("whisper_tpu.capi");
        if (!g_capi) {
            PyErr_Print();
        }
        if (g_owns_interpreter) {
            // release the GIL acquired implicitly by Py_InitializeEx so
            // later PyGILState_Ensure calls work from any thread
            PyGILState_Release(gil);
            PyEval_SaveThread();
        } else {
            PyGILState_Release(gil);
        }
    });
}

// call capi.<name>(args...) and return the result (new ref), or null
PyObject * call(const char * name, PyObject * args) {
    if (!g_capi) {
        Py_XDECREF(args);
        return nullptr;
    }
    PyObject * fn = PyObject_GetAttrString(g_capi, name);
    if (!fn) {
        Py_XDECREF(args);
        PyErr_Print();
        return nullptr;
    }
    PyObject * res = PyObject_CallObject(fn, args);
    Py_DECREF(fn);
    Py_XDECREF(args);
    if (!res) {
        PyErr_Print();
    }
    return res;
}

long call_long(const char * name, long fallback,
               const char * fmt, ...) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * args = nullptr;
    if (fmt) {
        va_list ap;
        va_start(ap, fmt);
        args = Py_VaBuildValue(fmt, ap);
        va_end(ap);
    }
    PyObject * res = call(name, args);
    long out = fallback;
    if (res && res != Py_None) {
        out = PyLong_AsLong(res);
        if (PyErr_Occurred()) {
            PyErr_Clear();
            out = fallback;
        }
    }
    Py_XDECREF(res);
    PyGILState_Release(gil);
    return out;
}

double call_double(const char * name, double fallback,
                   const char * fmt, ...) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * args = nullptr;
    if (fmt) {
        va_list ap;
        va_start(ap, fmt);
        args = Py_VaBuildValue(fmt, ap);
        va_end(ap);
    }
    PyObject * res = call(name, args);
    double out = fallback;
    if (res && res != Py_None) {
        out = PyFloat_AsDouble(res);
        if (PyErr_Occurred()) {
            PyErr_Clear();
            out = fallback;
        }
    }
    Py_XDECREF(res);
    PyGILState_Release(gil);
    return out;
}

// per-thread scratch for returned C strings (stable until the next
// string-returning call on the same thread, like the reference's internal
// buffers)
thread_local std::string g_str_scratch;

// wrap a C float buffer as a numpy f32 view (borrowed memory; only valid
// for the duration of the call it is passed to)
PyObject * np_f32_view(const float * data, Py_ssize_t n) {
    PyObject * mem = PyMemoryView_FromMemory(
        (char *) data, n * 4, PyBUF_READ);
    if (!mem) return nullptr;
    PyObject * np_mod = PyImport_ImportModule("numpy");
    PyObject * arr = nullptr;
    if (np_mod) {
        arr = PyObject_CallMethod(np_mod, "frombuffer", "Os", mem, "<f4");
        Py_DECREF(np_mod);
    }
    Py_DECREF(mem);
    return arr;
}

// call a capi function returning bytes; copy into out (up to cap bytes);
// returns bytes copied or -1
long call_bytes_out(const char * name, char * out, long cap,
                    const char * fmt, ...) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * args = nullptr;
    if (fmt) {
        va_list ap;
        va_start(ap, fmt);
        args = Py_VaBuildValue(fmt, ap);
        va_end(ap);
    }
    PyObject * res = call(name, args);
    long n = -1;
    if (res && PyBytes_Check(res)) {
        n = (long) PyBytes_GET_SIZE(res);
        if (n > cap) n = cap;
        memcpy(out, PyBytes_AS_STRING(res), (size_t) n);
    }
    Py_XDECREF(res);
    PyGILState_Release(gil);
    return n;
}

const char * call_str(const char * name, const char * fmt, ...) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * args = nullptr;
    if (fmt) {
        va_list ap;
        va_start(ap, fmt);
        args = Py_VaBuildValue(fmt, ap);
        va_end(ap);
    }
    PyObject * res = call(name, args);
    g_str_scratch.clear();
    if (res) {
        if (const char * s = PyUnicode_AsUTF8(res)) {
            g_str_scratch = s;
        } else {
            PyErr_Clear();
        }
        Py_DECREF(res);
    }
    PyGILState_Release(gil);
    return g_str_scratch.c_str();
}

}  // namespace

extern "C" {

struct whisper_context;  // opaque; the pointer value IS the python handle

struct whisper_context * whisper_init_from_file(const char * path) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * res = call("init_from_file", Py_BuildValue("(s)", path));
    intptr_t h = 0;
    if (res) {
        h = (intptr_t) PyLong_AsLong(res);
        Py_DECREF(res);
    }
    PyGILState_Release(gil);
    return (struct whisper_context *) h;  // 0 -> NULL, like the reference
}

void whisper_free(struct whisper_context * ctx) {
    if (!ctx) return;
    call_long("free", 0, "(l)", (long) (intptr_t) ctx);
}

// params_json: JSON object of whisper_full_params field names (or NULL for
// defaults); samples: 16 kHz mono f32 PCM.
int whisper_full(struct whisper_context * ctx, const char * params_json,
                 const float * samples, int n_samples) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * mem = PyMemoryView_FromMemory(
        (char *) samples, (Py_ssize_t) n_samples * 4, PyBUF_READ);
    PyObject * np_mod = PyImport_ImportModule("numpy");
    PyObject * arr = nullptr;
    if (np_mod && mem) {
        arr = PyObject_CallMethod(np_mod, "frombuffer", "Os", mem, "<f4");
    }
    int rc = -1;
    if (arr) {
        PyObject * res = call(
            "full", Py_BuildValue("(l, s, O)", (long) (intptr_t) ctx,
                                  params_json, arr));
        if (res) {
            rc = (int) PyLong_AsLong(res);
            Py_DECREF(res);
        }
    }
    Py_XDECREF(arr);
    Py_XDECREF(np_mod);
    Py_XDECREF(mem);
    PyGILState_Release(gil);
    return rc;
}

// whisper_full_parallel (whisper.h:621): chunk-split data parallelism
int whisper_full_parallel(struct whisper_context * ctx,
                          const char * params_json,
                          const float * samples, int n_samples,
                          int n_processors) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * mem = PyMemoryView_FromMemory(
        (char *) samples, (Py_ssize_t) n_samples * 4, PyBUF_READ);
    PyObject * np_mod = PyImport_ImportModule("numpy");
    PyObject * arr = nullptr;
    if (np_mod && mem) {
        arr = PyObject_CallMethod(np_mod, "frombuffer", "Os", mem, "<f4");
    }
    int rc = -1;
    if (arr) {
        PyObject * res = call(
            "full_parallel",
            Py_BuildValue("(l, s, O, i)", (long) (intptr_t) ctx,
                          params_json, arr, n_processors));
        if (res) {
            rc = (int) PyLong_AsLong(res);
            Py_DECREF(res);
        }
    }
    Py_XDECREF(arr);
    Py_XDECREF(np_mod);
    Py_XDECREF(mem);
    PyGILState_Release(gil);
    return rc;
}

int whisper_full_n_segments(struct whisper_context * ctx) {
    return (int) call_long("full_n_segments", 0, "(l)",
                           (long) (intptr_t) ctx);
}

int64_t whisper_full_get_segment_t0(struct whisper_context * ctx, int i) {
    return call_long("full_get_segment_t0", 0, "(l,i)",
                     (long) (intptr_t) ctx, i);
}

int64_t whisper_full_get_segment_t1(struct whisper_context * ctx, int i) {
    return call_long("full_get_segment_t1", 0, "(l,i)",
                     (long) (intptr_t) ctx, i);
}

const char * whisper_full_get_segment_text(struct whisper_context * ctx,
                                           int i) {
    return call_str("full_get_segment_text", "(l,i)",
                    (long) (intptr_t) ctx, i);
}

int whisper_full_n_tokens(struct whisper_context * ctx, int i) {
    return (int) call_long("full_n_tokens", 0, "(l,i)",
                           (long) (intptr_t) ctx, i);
}

int whisper_full_get_token_id(struct whisper_context * ctx, int i, int j) {
    return (int) call_long("full_get_token_id", -1, "(l,i,i)",
                           (long) (intptr_t) ctx, i, j);
}

int whisper_lang_max_id(void) {
    return (int) call_long("lang_max_id", -1, nullptr);
}

int whisper_lang_id(const char * lang) {
    return (int) call_long("lang_id", -1, "(s)", lang);
}

const char * whisper_lang_str(int id) {
    return call_str("lang_str", "(i)", id);
}

const char * whisper_print_system_info(void) {
    return call_str("system_info", nullptr);
}

void whisper_print_timings(struct whisper_context * ctx) {
    call_long("print_timings", 0, "(l)", (long) (intptr_t) ctx);
}

void whisper_reset_timings(struct whisper_context * ctx) {
    call_long("reset_timings", 0, "(l)", (long) (intptr_t) ctx);
}

const char * whisper_version(void) {
    return call_str("version", nullptr);
}

// ---- init variants (whisper.h:216) ------------------------------------

struct whisper_context * whisper_init_from_buffer(void * buffer,
                                                  size_t buffer_size) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * res = call("init_from_buffer",
                          Py_BuildValue("(y#)", (char *) buffer,
                                        (Py_ssize_t) buffer_size));
    intptr_t h = 0;
    if (res) {
        h = (intptr_t) PyLong_AsLong(res);
        Py_DECREF(res);
    }
    PyGILState_Release(gil);
    return (struct whisper_context *) h;
}

// ---- decode states (whisper.h:214, 650) --------------------------------

struct whisper_state;  // opaque; the pointer value IS the python handle

struct whisper_state * whisper_init_state(struct whisper_context * ctx) {
    return (struct whisper_state *) (intptr_t) call_long(
        "init_state", 0, "(l)", (long) (intptr_t) ctx);
}

void whisper_free_state(struct whisper_state * state) {
    if (!state) return;
    call_long("free_state", 0, "(l)", (long) (intptr_t) state);
}

int whisper_full_with_state(struct whisper_context * ctx,
                            struct whisper_state * state,
                            const char * params_json,
                            const float * samples, int n_samples) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * arr = np_f32_view(samples, (Py_ssize_t) n_samples);
    int rc = -1;
    if (arr) {
        PyObject * res = call(
            "full_with_state",
            Py_BuildValue("(l, l, s, O)", (long) (intptr_t) ctx,
                          (long) (intptr_t) state, params_json, arr));
        if (res) {
            rc = (int) PyLong_AsLong(res);
            Py_DECREF(res);
        }
        Py_DECREF(arr);
    }
    PyGILState_Release(gil);
    return rc;
}

int whisper_full_n_segments_from_state(struct whisper_state * state) {
    return (int) call_long("full_n_segments_from_state", 0, "(l)",
                           (long) (intptr_t) state);
}

int64_t whisper_full_get_segment_t0_from_state(struct whisper_state * state,
                                               int i) {
    return call_long("full_get_segment_t0_from_state", 0, "(l,i)",
                     (long) (intptr_t) state, i);
}

int64_t whisper_full_get_segment_t1_from_state(struct whisper_state * state,
                                               int i) {
    return call_long("full_get_segment_t1_from_state", 0, "(l,i)",
                     (long) (intptr_t) state, i);
}

const char * whisper_full_get_segment_text_from_state(
        struct whisper_state * state, int i) {
    return call_str("full_get_segment_text_from_state", "(l,i)",
                    (long) (intptr_t) state, i);
}

bool whisper_full_get_segment_speaker_turn_next_from_state(
        struct whisper_state * state, int i) {
    return call_long("full_get_segment_speaker_turn_next_from_state", 0,
                     "(l,i)", (long) (intptr_t) state, i) != 0;
}

float whisper_full_get_segment_no_speech_prob_from_state(
        struct whisper_state * state, int i) {
    return (float) call_double(
        "full_get_segment_no_speech_prob_from_state", 0.0, "(l,i)",
        (long) (intptr_t) state, i);
}

int whisper_full_n_tokens_from_state(struct whisper_state * state, int i) {
    return (int) call_long("full_n_tokens_from_state", 0, "(l,i)",
                           (long) (intptr_t) state, i);
}

int whisper_full_get_token_id_from_state(struct whisper_state * state,
                                         int i, int j) {
    return (int) call_long("full_get_token_id_from_state", -1, "(l,i,i)",
                           (long) (intptr_t) state, i, j);
}

float whisper_full_get_token_p_from_state(struct whisper_state * state,
                                          int i, int j) {
    return (float) call_double("full_get_token_p_from_state", 0.0,
                               "(l,i,i)", (long) (intptr_t) state, i, j);
}

int whisper_full_lang_id_from_state(struct whisper_state * state) {
    return (int) call_long("full_lang_id_from_state", -1, "(l)",
                           (long) (intptr_t) state);
}

// ---- segment/token accessors (whisper.h:700-745) ------------------------

bool whisper_full_get_segment_speaker_turn_next(struct whisper_context * ctx,
                                                int i) {
    return call_long("full_get_segment_speaker_turn_next", 0, "(l,i)",
                     (long) (intptr_t) ctx, i) != 0;
}

float whisper_full_get_segment_no_speech_prob(struct whisper_context * ctx,
                                              int i) {
    return (float) call_double("full_get_segment_no_speech_prob", 0.0,
                               "(l,i)", (long) (intptr_t) ctx, i);
}

float whisper_full_get_token_p(struct whisper_context * ctx, int i, int j) {
    return (float) call_double("full_get_token_p", 0.0, "(l,i,i)",
                               (long) (intptr_t) ctx, i, j);
}

const char * whisper_full_get_token_text(struct whisper_context * ctx,
                                         int i, int j) {
    return call_str("full_get_token_text", "(l,i,i)",
                    (long) (intptr_t) ctx, i, j);
}

int64_t whisper_full_get_token_t0(struct whisper_context * ctx,
                                  int i, int j) {
    return call_long("full_get_token_t0", -1, "(l,i,i)",
                     (long) (intptr_t) ctx, i, j);
}

int64_t whisper_full_get_token_t1(struct whisper_context * ctx,
                                  int i, int j) {
    return call_long("full_get_token_t1", -1, "(l,i,i)",
                     (long) (intptr_t) ctx, i, j);
}

// whisper_full_get_token_data (whisper.h:733): the whisper_token_data
// struct crosses as JSON, like params
const char * whisper_full_get_token_data_json(struct whisper_context * ctx,
                                              int i, int j) {
    return call_str("full_get_token_data_json", "(l,i,i)",
                    (long) (intptr_t) ctx, i, j);
}

int whisper_full_lang_id(struct whisper_context * ctx) {
    return (int) call_long("full_lang_id", -1, "(l)",
                           (long) (intptr_t) ctx);
}

// ---- model / vocab introspection (whisper.h:270-330) --------------------

#define WTPU_INT_ACCESSOR(NAME)                                          \
    int whisper_##NAME(struct whisper_context * ctx) {                   \
        return (int) call_long(#NAME, -1, "(l)", (long) (intptr_t) ctx); \
    }

WTPU_INT_ACCESSOR(n_len)
WTPU_INT_ACCESSOR(n_vocab)
WTPU_INT_ACCESSOR(n_text_ctx)
WTPU_INT_ACCESSOR(n_audio_ctx)
WTPU_INT_ACCESSOR(is_multilingual)
WTPU_INT_ACCESSOR(model_n_vocab)
WTPU_INT_ACCESSOR(model_n_audio_ctx)
WTPU_INT_ACCESSOR(model_n_audio_state)
WTPU_INT_ACCESSOR(model_n_audio_head)
WTPU_INT_ACCESSOR(model_n_audio_layer)
WTPU_INT_ACCESSOR(model_n_text_ctx)
WTPU_INT_ACCESSOR(model_n_text_state)
WTPU_INT_ACCESSOR(model_n_text_head)
WTPU_INT_ACCESSOR(model_n_text_layer)
WTPU_INT_ACCESSOR(model_n_mels)
WTPU_INT_ACCESSOR(model_ftype)
WTPU_INT_ACCESSOR(model_type)
WTPU_INT_ACCESSOR(token_eot)
WTPU_INT_ACCESSOR(token_sot)
WTPU_INT_ACCESSOR(token_solm)
WTPU_INT_ACCESSOR(token_prev)
WTPU_INT_ACCESSOR(token_nosp)
WTPU_INT_ACCESSOR(token_not)
WTPU_INT_ACCESSOR(token_beg)
WTPU_INT_ACCESSOR(token_translate)
WTPU_INT_ACCESSOR(token_transcribe)

#undef WTPU_INT_ACCESSOR

const char * whisper_model_type_readable(struct whisper_context * ctx) {
    return call_str("model_type_readable", "(l)", (long) (intptr_t) ctx);
}

int whisper_token_lang(struct whisper_context * ctx, int lang_id) {
    return (int) call_long("token_lang", -1, "(l,i)",
                           (long) (intptr_t) ctx, lang_id);
}

const char * whisper_token_to_str(struct whisper_context * ctx, int token) {
    return call_str("token_to_str", "(l,i)", (long) (intptr_t) ctx, token);
}

// whisper_tokenize (whisper.h:357): fills tokens (<= n_max_tokens);
// returns the count, or -(count) if the text needed more room
int whisper_tokenize(struct whisper_context * ctx, const char * text,
                     int * tokens, int n_max_tokens) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * res = call("tokenize",
                          Py_BuildValue("(l,s)", (long) (intptr_t) ctx,
                                        text));
    int n = -1;
    if (res && PyList_Check(res)) {
        n = (int) PyList_GET_SIZE(res);
        if (n > n_max_tokens) {
            n = -n;  // like the reference: negative count on overflow
        } else {
            for (int k = 0; k < n; k++) {
                tokens[k] = (int) PyLong_AsLong(PyList_GET_ITEM(res, k));
            }
        }
    }
    Py_XDECREF(res);
    PyGILState_Release(gil);
    return n;
}

int whisper_token_count(struct whisper_context * ctx, const char * text) {
    return (int) call_long("token_count", -1, "(l,s)",
                           (long) (intptr_t) ctx, text);
}

// ---- low-level compute (whisper.h:262-345) -------------------------------

int whisper_pcm_to_mel(struct whisper_context * ctx, const float * samples,
                       int n_samples, int n_threads) {
    (void) n_threads;  // XLA owns threading
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * arr = np_f32_view(samples, (Py_ssize_t) n_samples);
    int rc = -1;
    if (arr) {
        PyObject * res = call("pcm_to_mel",
                              Py_BuildValue("(l,O)", (long) (intptr_t) ctx,
                                            arr));
        if (res) {
            rc = (int) PyLong_AsLong(res);
            Py_DECREF(res);
        }
        Py_DECREF(arr);
    }
    PyGILState_Release(gil);
    return rc;
}

int whisper_set_mel(struct whisper_context * ctx, const float * data,
                    int n_len, int n_mel) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * arr = np_f32_view(data, (Py_ssize_t) n_len * n_mel);
    int rc = -1;
    if (arr) {
        PyObject * res = call("set_mel",
                              Py_BuildValue("(l,O,i,i)",
                                            (long) (intptr_t) ctx, arr,
                                            n_len, n_mel));
        if (res) {
            rc = (int) PyLong_AsLong(res);
            Py_DECREF(res);
        }
        Py_DECREF(arr);
    }
    PyGILState_Release(gil);
    return rc;
}

int whisper_encode(struct whisper_context * ctx, int offset, int n_threads) {
    (void) n_threads;
    return (int) call_long("encode", -1, "(l,i)",
                           (long) (intptr_t) ctx, offset);
}

int whisper_decode(struct whisper_context * ctx, const int * tokens,
                   int n_tokens, int n_past, int n_threads) {
    (void) n_threads;
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * lst = PyList_New(n_tokens);
    for (int k = 0; k < n_tokens; k++) {
        PyList_SET_ITEM(lst, k, PyLong_FromLong(tokens[k]));
    }
    PyObject * res = call("decode",
                          Py_BuildValue("(l,O,i)", (long) (intptr_t) ctx,
                                        lst, n_past));
    Py_DECREF(lst);
    int rc = -1;
    if (res) {
        rc = (int) PyLong_AsLong(res);
        Py_DECREF(res);
    }
    PyGILState_Release(gil);
    return rc;
}

// logits of the final position of the last whisper_decode (n_vocab floats;
// buffer owned per context, valid until the next whisper_decode/free)
const float * whisper_get_logits(struct whisper_context * ctx) {
    static std::mutex mu;
    static std::map<long, std::vector<float>> bufs;
    long h = (long) (intptr_t) ctx;
    long nv = call_long("n_vocab", 0, "(l)", h);
    std::lock_guard<std::mutex> lock(mu);
    std::vector<float> & buf = bufs[h];
    buf.resize((size_t) (nv > 0 ? nv : 0));
    if (nv > 0) {
        call_bytes_out("get_logits_bytes", (char *) buf.data(), nv * 4,
                       "(l)", h);
    }
    return buf.data();
}

int whisper_lang_auto_detect(struct whisper_context * ctx,
                             int offset_ms, int n_threads,
                             float * lang_probs) {
    (void) n_threads;
    int lid = (int) call_long("lang_auto_detect", -1, "(l,i)",
                              (long) (intptr_t) ctx, offset_ms);
    if (lid >= 0 && lang_probs) {
        long n = call_long("lang_max_id", -1, nullptr) + 1;
        call_bytes_out("get_lang_probs_bytes", (char *) lang_probs, n * 4,
                       "(l)", (long) (intptr_t) ctx);
    }
    return lid;
}

// whisper_full_default_params_by_ref (whisper.h:587): defaults as JSON —
// edit fields and pass the string to whisper_full
const char * whisper_full_default_params_json(int strategy) {
    return call_str("full_default_params_json", "(i)", strategy);
}

// ---- VAD (whisper.h:699-756) --------------------------------------------

struct whisper_vad_context;  // opaque python handle

struct whisper_vad_context * whisper_vad_init_from_file(const char * path) {
    return (struct whisper_vad_context *) (intptr_t) call_long(
        "vad_init_from_file", 0, "(s)", path);
}

void whisper_vad_free(struct whisper_vad_context * vctx) {
    if (!vctx) return;
    call_long("vad_free", 0, "(l)", (long) (intptr_t) vctx);
}

// detect + segment in one call; segments live on the vad context
int whisper_vad_segments_from_samples(struct whisper_vad_context * vctx,
                                      const char * params_json,
                                      const float * samples,
                                      int n_samples) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * arr = np_f32_view(samples, (Py_ssize_t) n_samples);
    int rc = -1;
    if (arr) {
        PyObject * res = call(
            "vad_segments_from_samples",
            Py_BuildValue("(l,s,O)", (long) (intptr_t) vctx, params_json,
                          arr));
        if (res) {
            rc = (int) PyLong_AsLong(res);
            Py_DECREF(res);
        }
        Py_DECREF(arr);
    }
    PyGILState_Release(gil);
    return rc;
}

int whisper_vad_segments_n_segments(struct whisper_vad_context * vctx) {
    return (int) call_long("vad_segments_n_segments", 0, "(l)",
                           (long) (intptr_t) vctx);
}

float whisper_vad_segments_get_segment_t0(struct whisper_vad_context * vctx,
                                          int i) {
    return (float) call_double("vad_segments_get_segment_t0", -1.0, "(l,i)",
                               (long) (intptr_t) vctx, i);
}

float whisper_vad_segments_get_segment_t1(struct whisper_vad_context * vctx,
                                          int i) {
    return (float) call_double("vad_segments_get_segment_t1", -1.0, "(l,i)",
                               (long) (intptr_t) vctx, i);
}

}  // extern "C"

// ---- built-in microbenchmarks (whisper.h:756-759) -------------------------

extern "C" {

const char * whisper_bench_memcpy_str(int n_threads) {
    (void) n_threads;  // the TPU runtime picks its own parallelism
    return call_str("bench_memcpy_str", nullptr);
}

int whisper_bench_memcpy(int n_threads) {
    const char * s = whisper_bench_memcpy_str(n_threads);
    if (s) fprintf(stderr, "%s", s);
    return 0;
}

const char * whisper_bench_ggml_mul_mat_str(int n_threads) {
    (void) n_threads;
    return call_str("bench_ggml_mul_mat_str", nullptr);
}

int whisper_bench_ggml_mul_mat(int n_threads) {
    const char * s = whisper_bench_ggml_mul_mat_str(n_threads);
    if (s) fprintf(stderr, "%s", s);
    return 0;
}

}  // extern "C"

// ---- state-variant step-by-step API (whisper.h:265-341, 417) --------------
// states are cloned contexts Python-side; each forwards with the state
// handle (the ctx argument is kept for whisper.h signature parity)

extern "C" {

int whisper_pcm_to_mel_with_state(struct whisper_context * ctx,
                                  struct whisper_state * state,
                                  const float * samples, int n_samples,
                                  int n_threads) {
    (void) ctx; (void) n_threads;
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * arr = np_f32_view(samples, (Py_ssize_t) n_samples);
    int rc = -1;
    if (arr) {
        PyObject * res = call("pcm_to_mel",
                              Py_BuildValue("(l,O)",
                                            (long) (intptr_t) state, arr));
        if (res) { rc = (int) PyLong_AsLong(res); Py_DECREF(res); }
        Py_DECREF(arr);
    }
    PyGILState_Release(gil);
    return rc;
}

int whisper_set_mel_with_state(struct whisper_context * ctx,
                               struct whisper_state * state,
                               const float * data, int n_len, int n_mel) {
    (void) ctx;
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * arr = np_f32_view(data, (Py_ssize_t) n_len * n_mel);
    int rc = -1;
    if (arr) {
        PyObject * res = call("set_mel",
                              Py_BuildValue("(l,O,i,i)",
                                            (long) (intptr_t) state, arr,
                                            n_len, n_mel));
        if (res) { rc = (int) PyLong_AsLong(res); Py_DECREF(res); }
        Py_DECREF(arr);
    }
    PyGILState_Release(gil);
    return rc;
}

int whisper_encode_with_state(struct whisper_context * ctx,
                              struct whisper_state * state,
                              int offset, int n_threads) {
    (void) ctx; (void) n_threads;
    return (int) call_long("encode", -1, "(l,i)",
                           (long) (intptr_t) state, offset);
}

int whisper_decode_with_state(struct whisper_context * ctx,
                              struct whisper_state * state,
                              const int * tokens, int n_tokens,
                              int n_past, int n_threads) {
    (void) ctx; (void) n_threads;
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * lst = PyList_New(n_tokens);
    for (int k = 0; k < n_tokens; k++) {
        PyList_SET_ITEM(lst, k, PyLong_FromLong(tokens[k]));
    }
    PyObject * res = call("decode",
                          Py_BuildValue("(l,O,i)",
                                        (long) (intptr_t) state, lst,
                                        n_past));
    Py_DECREF(lst);
    int rc = -1;
    if (res) { rc = (int) PyLong_AsLong(res); Py_DECREF(res); }
    PyGILState_Release(gil);
    return rc;
}

const float * whisper_get_logits_from_state(struct whisper_state * state) {
    static std::mutex mu;
    static std::map<long, std::vector<float>> bufs;
    long h = (long) (intptr_t) state;
    long nv = call_long("n_vocab", 0, "(l)", h);
    std::lock_guard<std::mutex> lock(mu);
    std::vector<float> & buf = bufs[h];
    buf.resize((size_t) (nv > 0 ? nv : 0));
    if (nv > 0) {
        call_bytes_out("get_logits_bytes", (char *) buf.data(), nv * 4,
                       "(l)", h);
    }
    return buf.data();
}

int whisper_n_len_from_state(struct whisper_state * state) {
    return (int) call_long("n_len_from_state", 0, "(l)",
                           (long) (intptr_t) state);
}

int whisper_lang_auto_detect_with_state(struct whisper_context * ctx,
                                        struct whisper_state * state,
                                        int offset_ms, int n_threads,
                                        float * lang_probs) {
    (void) ctx; (void) n_threads;
    int lid = (int) call_long("lang_auto_detect", -1, "(l,i)",
                              (long) (intptr_t) state, offset_ms);
    if (lid >= 0 && lang_probs) {
        long n = call_long("lang_max_id", -1, nullptr) + 1;
        call_bytes_out("get_lang_probs_bytes", (char *) lang_probs, n * 4,
                       "(l)", (long) (intptr_t) state);
    }
    return lid;
}

// ---- remaining from_state token accessors (whisper.h:730-745) -------------

const char * whisper_full_get_token_text_from_state(
        struct whisper_context * ctx, struct whisper_state * state,
        int i, int j) {
    return call_str("full_get_token_text_from_state", "(l,l,i,i)",
                    (long) (intptr_t) ctx, (long) (intptr_t) state, i, j);
}

int64_t whisper_full_get_token_t0_from_state(struct whisper_state * state,
                                             int i, int j) {
    return (int64_t) call_long("full_get_token_t0_from_state", -1,
                               "(l,i,i)", (long) (intptr_t) state, i, j);
}

int64_t whisper_full_get_token_t1_from_state(struct whisper_state * state,
                                             int i, int j) {
    return (int64_t) call_long("full_get_token_t1_from_state", -1,
                               "(l,i,i)", (long) (intptr_t) state, i, j);
}

const char * whisper_full_get_token_data_json_from_state(
        struct whisper_state * state, int i, int j) {
    return call_str("full_get_token_data_json_from_state", "(l,i,i)",
                    (long) (intptr_t) state, i, j);
}

// ---- VAD segments recorded by whisper_full (whisper.h:686-698) ------------

int whisper_full_n_vad_segments(struct whisper_context * ctx) {
    return (int) call_long("full_n_vad_segments", 0, "(l)",
                           (long) (intptr_t) ctx);
}

int64_t whisper_full_get_vad_segment_t0(struct whisper_context * ctx, int i) {
    return (int64_t) call_long("full_get_vad_segment_t0", -1, "(l,i)",
                               (long) (intptr_t) ctx, i);
}

int64_t whisper_full_get_vad_segment_t1(struct whisper_context * ctx, int i) {
    return (int64_t) call_long("full_get_vad_segment_t1", -1, "(l,i)",
                               (long) (intptr_t) ctx, i);
}

int whisper_full_n_vad_segments_from_state(struct whisper_state * state) {
    return (int) call_long("full_n_vad_segments_from_state", 0, "(l)",
                           (long) (intptr_t) state);
}

int64_t whisper_full_get_vad_segment_t0_from_state(
        struct whisper_state * state, int i) {
    return (int64_t) call_long("full_get_vad_segment_t0_from_state", -1,
                               "(l,i)", (long) (intptr_t) state, i);
}

int64_t whisper_full_get_vad_segment_t1_from_state(
        struct whisper_state * state, int i) {
    return (int64_t) call_long("full_get_vad_segment_t1_from_state", -1,
                               "(l,i)", (long) (intptr_t) state, i);
}

// ---- low-level VAD probability API (whisper.h:717-742) --------------------

struct whisper_vad_context;

bool whisper_vad_detect_speech(struct whisper_vad_context * vctx,
                               const float * samples, int n_samples) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * arr = np_f32_view(samples, (Py_ssize_t) n_samples);
    long ok = 0;
    if (arr) {
        PyObject * res = call("vad_detect_speech",
                              Py_BuildValue("(l,O,i)",
                                            (long) (intptr_t) vctx, arr, 1));
        if (res) { ok = PyLong_AsLong(res); Py_DECREF(res); }
        Py_DECREF(arr);
    }
    PyGILState_Release(gil);
    return ok == 1;
}

// streaming variant: the Silero LSTM h/c carries across calls
bool whisper_vad_detect_speech_no_reset(struct whisper_vad_context * vctx,
                                        const float * samples,
                                        int n_samples) {
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * arr = np_f32_view(samples, (Py_ssize_t) n_samples);
    long ok = 0;
    if (arr) {
        PyObject * res = call("vad_detect_speech",
                              Py_BuildValue("(l,O,i)",
                                            (long) (intptr_t) vctx, arr, 0));
        if (res) { ok = PyLong_AsLong(res); Py_DECREF(res); }
        Py_DECREF(arr);
    }
    PyGILState_Release(gil);
    return ok == 1;
}

int whisper_vad_n_probs(struct whisper_vad_context * vctx) {
    return (int) call_long("vad_n_probs", 0, "(l)", (long) (intptr_t) vctx);
}

// per-chunk speech probabilities of the last detect_speech (buffer owned
// per vad context, valid until the next detect_speech/free)
float * whisper_vad_probs(struct whisper_vad_context * vctx) {
    static std::mutex mu;
    static std::map<long, std::vector<float>> bufs;
    long h = (long) (intptr_t) vctx;
    long n = call_long("vad_n_probs", 0, "(l)", h);
    std::lock_guard<std::mutex> lock(mu);
    std::vector<float> & buf = bufs[h];
    buf.resize((size_t) (n > 0 ? n : 0));
    if (n > 0) {
        call_bytes_out("vad_probs_bytes", (char *) buf.data(), n * 4,
                       "(l)", h);
    }
    return buf.data();
}

void whisper_vad_reset_state(struct whisper_vad_context * vctx) {
    call_long("vad_reset_state", 0, "(l)", (long) (intptr_t) vctx);
}

// segment the probs from the last detect_speech; accessors shared with
// whisper_vad_segments_from_samples
int whisper_vad_segments_from_probs(struct whisper_vad_context * vctx,
                                    const char * params_json) {
    return (int) call_long("vad_segments_from_probs", -1, "(l,s)",
                           (long) (intptr_t) vctx, params_json);
}

// ---- whisper_log_set (whisper.h:584) ---------------------------------------

typedef void (*whisper_log_callback)(int level, const char * text,
                                     void * user_data);

void whisper_log_set(whisper_log_callback callback, void * user_data) {
    ensure_runtime();
    call_long("log_set_c_sink", 0, "(l,l)",
              (long) (intptr_t) callback, (long) (intptr_t) user_data);
}

}  // extern "C"

// ---- whisper.h-compatible structs + remaining lifecycle -------------------
// mirrors include/whisper.h:86-159, 205-246, 370, 438-447; struct layouts
// must match native/whisper_tpu.h exactly

extern "C" {

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
    bool  use_gpu;
    bool  flash_attn;
    int   gpu_device;
    bool dtw_token_timestamps;
    enum whisper_alignment_heads_preset dtw_aheads_preset;
    int dtw_n_top;
    struct whisper_aheads dtw_aheads;
    size_t dtw_mem_size;
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

struct whisper_context_params whisper_context_default_params(void) {
    struct whisper_context_params p;
    memset(&p, 0, sizeof(p));
    p.use_gpu    = true;   // reference defaults (src/whisper.cpp:3700-3712)
    p.flash_attn = false;
    p.gpu_device = 0;
    p.dtw_token_timestamps = false;
    p.dtw_aheads_preset = WHISPER_AHEADS_NONE;
    p.dtw_n_top = -1;
    p.dtw_mem_size = (size_t) 1024 * 1024 * 128;
    return p;
}

struct whisper_context_params * whisper_context_default_params_by_ref(void) {
    struct whisper_context_params * p =
        (struct whisper_context_params *) malloc(sizeof(*p));
    if (p) *p = whisper_context_default_params();
    return p;
}

void whisper_free_context_params(struct whisper_context_params * params) {
    free(params);
}

void whisper_free_params(void * params) {
    free(params);
}

// cparams -> JSON for capi._apply_cparams (only the DTW fields act on TPU)
static std::string cparams_to_json(const struct whisper_context_params & p) {
    std::string js = "{";
    js += "\"dtw_token_timestamps\": ";
    js += p.dtw_token_timestamps ? "true" : "false";
    js += ", \"dtw_aheads_preset\": " + std::to_string((int) p.dtw_aheads_preset);
    js += ", \"dtw_n_top\": " + std::to_string(p.dtw_n_top);
    if (p.dtw_aheads_preset == WHISPER_AHEADS_CUSTOM && p.dtw_aheads.heads) {
        js += ", \"dtw_aheads\": [";
        for (size_t k = 0; k < p.dtw_aheads.n_heads; ++k) {
            if (k) js += ", ";
            js += "[" + std::to_string(p.dtw_aheads.heads[k].n_text_layer) +
                  ", " + std::to_string(p.dtw_aheads.heads[k].n_head) + "]";
        }
        js += "]";
    }
    js += "}";
    return js;
}

struct whisper_context * whisper_init_from_file_with_params(
        const char * path_model, struct whisper_context_params params) {
    const std::string js = cparams_to_json(params);
    return (struct whisper_context *) (intptr_t)
        call_long("init_from_file_with_cparams", 0, "(s,s)",
                  path_model, js.c_str());
}

struct whisper_context * whisper_init_from_buffer_with_params(
        void * buffer, size_t buffer_size,
        struct whisper_context_params params) {
    const std::string js = cparams_to_json(params);
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    // tuple built manually: Py_BuildValue's "y#" length-type depends on
    // PY_SSIZE_T_CLEAN-era headers — avoid the varargs pitfall entirely
    PyObject * args = PyTuple_New(2);
    PyTuple_SET_ITEM(args, 0, PyBytes_FromStringAndSize(
                                  (const char *) buffer,
                                  (Py_ssize_t) buffer_size));
    PyTuple_SET_ITEM(args, 1, PyUnicode_FromString(js.c_str()));
    PyObject * res = call("init_from_buffer_with_cparams", args);
    intptr_t h = 0;
    if (res) { h = (intptr_t) PyLong_AsLong(res); Py_DECREF(res); }
    PyGILState_Release(gil);
    return (struct whisper_context *) h;
}

// drain a whisper_model_loader into memory, then init from the buffer
struct whisper_context * whisper_init_with_params(
        struct whisper_model_loader * loader,
        struct whisper_context_params params) {
    if (!loader || !loader->read) return nullptr;
    std::vector<char> buf;
    char chunk[1 << 16];
    while (!(loader->eof && loader->eof(loader->context))) {
        size_t n = loader->read(loader->context, chunk, sizeof(chunk));
        if (n == 0) break;
        buf.insert(buf.end(), chunk, chunk + n);
    }
    if (loader->close) loader->close(loader->context);
    if (buf.empty()) return nullptr;
    return whisper_init_from_buffer_with_params(buf.data(), buf.size(),
                                                params);
}

// *_no_state: whisper_tpu contexts allocate no eager state (states come
// from whisper_init_state), so these are exact aliases
struct whisper_context * whisper_init_from_file_with_params_no_state(
        const char * path_model, struct whisper_context_params params) {
    return whisper_init_from_file_with_params(path_model, params);
}

struct whisper_context * whisper_init_from_buffer_with_params_no_state(
        void * buffer, size_t buffer_size,
        struct whisper_context_params params) {
    return whisper_init_from_buffer_with_params(buffer, buffer_size, params);
}

struct whisper_context * whisper_init_with_params_no_state(
        struct whisper_model_loader * loader,
        struct whisper_context_params params) {
    return whisper_init_with_params(loader, params);
}

struct whisper_context * whisper_init(struct whisper_model_loader * loader) {
    return whisper_init_with_params(loader, whisper_context_default_params());
}

struct whisper_context * whisper_init_no_state(
        struct whisper_model_loader * loader) {
    return whisper_init(loader);
}

struct whisper_context * whisper_init_from_file_no_state(
        const char * path_model) {
    return whisper_init_from_file(path_model);
}

struct whisper_context * whisper_init_from_buffer_no_state(void * buffer,
                                                           size_t buffer_size) {
    return whisper_init_from_buffer(buffer, buffer_size);
}

const char * whisper_lang_str_full(int id) {
    return call_str("lang_str_full", "(i)", id);
}

// per-context timings struct, valid until whisper_free/process exit
struct whisper_timings * whisper_get_timings(struct whisper_context * ctx) {
    static std::mutex mu;
    static std::map<long, struct whisper_timings> bufs;
    long h = (long) (intptr_t) ctx;
    float packed[5] = {0, 0, 0, 0, 0};
    call_bytes_out("get_timings_packed", (char *) packed, sizeof(packed),
                   "(l)", h);
    std::lock_guard<std::mutex> lock(mu);
    struct whisper_timings & t = bufs[h];
    t.sample_ms = packed[0];
    t.encode_ms = packed[1];
    t.decode_ms = packed[2];
    t.batchd_ms = packed[3];
    t.prompt_ms = packed[4];
    return &t;
}

// packed little-endian "<2i4f3qf" from capi -> struct fields
static whisper_token_data unpack_token_data(const char * b, long n) {
    whisper_token_data d;
    memset(&d, 0, sizeof(d));
    d.t0 = d.t1 = d.t_dtw = -1;
    if (n < 52) return d;
    memcpy(&d.id,    b +  0, 4);
    memcpy(&d.tid,   b +  4, 4);
    memcpy(&d.p,     b +  8, 4);
    memcpy(&d.plog,  b + 12, 4);
    memcpy(&d.pt,    b + 16, 4);
    memcpy(&d.ptsum, b + 20, 4);
    memcpy(&d.t0,    b + 24, 8);
    memcpy(&d.t1,    b + 32, 8);
    memcpy(&d.t_dtw, b + 40, 8);
    memcpy(&d.vlen,  b + 48, 4);
    return d;
}

whisper_token_data whisper_full_get_token_data(struct whisper_context * ctx,
                                               int i_segment, int i_token) {
    char buf[52];
    long n = call_bytes_out("full_get_token_data_packed", buf, sizeof(buf),
                            "(l,i,i)", (long) (intptr_t) ctx,
                            i_segment, i_token);
    return unpack_token_data(buf, n);
}

whisper_token_data whisper_full_get_token_data_from_state(
        struct whisper_state * state, int i_segment, int i_token) {
    char buf[52];
    long n = call_bytes_out("full_get_token_data_packed_from_state", buf,
                            sizeof(buf), "(l,i,i)",
                            (long) (intptr_t) state, i_segment, i_token);
    return unpack_token_data(buf, n);
}

}  // extern "C"

// ---- VAD param structs + init variants (whisper.h:192-199, 701-712) -------

extern "C" {

typedef struct whisper_vad_params {
    float threshold;
    int   min_speech_duration_ms;
    int   min_silence_duration_ms;
    float max_speech_duration_s;
    int   speech_pad_ms;
    float samples_overlap;
} whisper_vad_params;

struct whisper_vad_context_params {
    int   n_threads;
    bool  use_gpu;
    int   gpu_device;
};

whisper_vad_params whisper_vad_default_params(void) {
    whisper_vad_params p;           // src/whisper.cpp:4462-4472
    p.threshold               = 0.5f;
    p.min_speech_duration_ms  = 250;
    p.min_silence_duration_ms = 100;
    p.max_speech_duration_s   = FLT_MAX;
    p.speech_pad_ms           = 30;
    p.samples_overlap         = 0.1f;
    return p;
}

struct whisper_vad_context_params whisper_vad_default_context_params(void) {
    struct whisper_vad_context_params p;  // src/whisper.cpp:4453-4460
    p.n_threads  = 4;
    p.use_gpu    = false;
    p.gpu_device = 0;
    return p;
}

// the context params carry no TPU-relevant knobs; init ignores them
struct whisper_vad_context * whisper_vad_init_from_file_with_params(
        const char * path_model, struct whisper_vad_context_params params) {
    (void) params;
    return whisper_vad_init_from_file(path_model);
}

struct whisper_vad_context * whisper_vad_init_with_params(
        struct whisper_model_loader * loader,
        struct whisper_vad_context_params params) {
    (void) params;
    if (!loader || !loader->read) return nullptr;
    std::vector<char> buf;
    char chunk[1 << 16];
    while (!(loader->eof && loader->eof(loader->context))) {
        size_t n = loader->read(loader->context, chunk, sizeof(chunk));
        if (n == 0) break;
        buf.insert(buf.end(), chunk, chunk + n);
    }
    if (loader->close) loader->close(loader->context);
    if (buf.empty()) return nullptr;
    ensure_runtime();
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject * args = PyTuple_New(1);
    PyTuple_SET_ITEM(args, 0, PyBytes_FromStringAndSize(buf.data(),
                                                        (Py_ssize_t) buf.size()));
    PyObject * res = call("vad_init_from_buffer", args);
    intptr_t h = 0;
    if (res) { h = (intptr_t) PyLong_AsLong(res); Py_DECREF(res); }
    PyGILState_Release(gil);
    return (struct whisper_vad_context *) h;
}

}  // extern "C"

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

#include <cstdarg>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>

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

// per-thread scratch for returned C strings (stable until the next
// string-returning call on the same thread, like the reference's internal
// buffers)
thread_local std::string g_str_scratch;

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

}  // extern "C"

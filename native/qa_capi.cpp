// C ABI shim mirroring include/qwen2-whisper.h on the TPU runtime.
//
// The reference exposes a C API (whisper_init_from_file_with_params,
// whisper_full, accessors — include/qwen2-whisper.h:141-527). This shim
// provides the same entry points as a real C ABI by embedding CPython and
// delegating to qwen2_audio_tpu.capi, so C/C++ applications written against
// whisper.cpp can link against libqa_capi.so and run on TPU.
//
// Scope: the hot entry points + accessors. Opaque handles are Python object
// pointers; every call holds the GIL.

#include <Python.h>

#include <cstdio>
#include <cstring>
#include <mutex>

namespace {

std::once_flag g_init_once;
PyObject* g_capi = nullptr;   // module qwen2_audio_tpu.capi

void ensure_python() {
    std::call_once(g_init_once, [] {
        if (!Py_IsInitialized()) {
            Py_InitializeEx(0);
        }
        PyGILState_STATE s = PyGILState_Ensure();
        g_capi = PyImport_ImportModule("qwen2_audio_tpu.capi");
        if (!g_capi) {
            PyErr_Print();
            std::fprintf(stderr,
                         "qa_capi: failed to import qwen2_audio_tpu.capi "
                         "(is the repo on PYTHONPATH?)\n");
        }
        PyGILState_Release(s);
    });
}

struct Gil {
    PyGILState_STATE s;
    Gil() { ensure_python(); s = PyGILState_Ensure(); }
    ~Gil() { PyGILState_Release(s); }
};

PyObject* call(const char* fn, PyObject* args) {
    if (!g_capi) { Py_XDECREF(args); return nullptr; }
    PyObject* f = PyObject_GetAttrString(g_capi, fn);
    if (!f) { PyErr_Print(); Py_XDECREF(args); return nullptr; }
    PyObject* r = PyObject_CallObject(f, args);
    Py_DECREF(f);
    Py_XDECREF(args);
    if (!r) PyErr_Print();
    return r;
}

long call_long(const char* fn, PyObject* args, long fallback = -1) {
    Gil gil;
    PyObject* r = call(fn, args);
    if (!r) return fallback;
    long v = PyLong_Check(r) ? PyLong_AsLong(r) : fallback;
    Py_DECREF(r);
    return v;
}

PyObject* samples_to_list(const float* samples, int n) {
    PyObject* lst = PyList_New(n);
    for (int i = 0; i < n; i++)
        PyList_SET_ITEM(lst, i, PyFloat_FromDouble(samples[i]));
    return lst;
}

}  // namespace

extern "C" {

typedef void whisper_context;  // opaque: PyObject*

whisper_context* whisper_init_from_file(const char* path_model) {
    Gil gil;
    return (whisper_context*)call("whisper_init_from_file_with_params",
                                  Py_BuildValue("(s)", path_model));
}

whisper_context* whisper_init_from_file_with_params(const char* path_model,
                                                    void* /*params*/) {
    return whisper_init_from_file(path_model);
}

void whisper_free(whisper_context* ctx) {
    if (!ctx) return;
    Gil gil;
    Py_DECREF((PyObject*)ctx);
}

int whisper_pcm_to_mel(whisper_context* ctx, const float* samples,
                       int n_samples, int n_threads) {
    Gil gil;
    PyObject* lst = samples_to_list(samples, n_samples);
    PyObject* args = PyTuple_Pack(2, (PyObject*)ctx, lst);
    Py_DECREF(lst);
    PyObject* r = call("whisper_pcm_to_mel", args);
    if (!r) return -1;
    int v = (int)PyLong_AsLong(r);
    Py_DECREF(r);
    return v;
}

int whisper_encode(whisper_context* ctx, int offset, int n_threads) {
    return (int)call_long("whisper_encode",
                          Py_BuildValue("(Oii)", (PyObject*)ctx, offset,
                                        n_threads));
}

int whisper_full(whisper_context* ctx, void* /*params*/,
                 const float* samples, int n_samples) {
    Gil gil;
    PyObject* p = call("whisper_full_default_params", PyTuple_New(0));
    if (!p) return -1;
    PyObject* lst = samples_to_list(samples, n_samples);
    PyObject* args = PyTuple_Pack(3, (PyObject*)ctx, p, lst);
    Py_DECREF(p);
    Py_DECREF(lst);
    PyObject* r = call("whisper_full", args);
    if (!r) return -1;
    int v = (int)PyLong_AsLong(r);
    Py_DECREF(r);
    return v;
}

void whisper_print_emb_enc(whisper_context* ctx) {
    Gil gil;
    PyObject* r = call("whisper_print_emb_enc",
                       PyTuple_Pack(1, (PyObject*)ctx));
    Py_XDECREF(r);
}

#define INT_ACCESSOR(NAME)                                              \
    int NAME(whisper_context* ctx) {                                   \
        return (int)call_long(#NAME,                                   \
                              PyTuple_Pack(1, (PyObject*)ctx));         \
    }

INT_ACCESSOR(whisper_n_len)
INT_ACCESSOR(whisper_n_vocab)
INT_ACCESSOR(whisper_n_text_ctx)
INT_ACCESSOR(whisper_n_audio_ctx)
INT_ACCESSOR(whisper_is_multilingual)
INT_ACCESSOR(whisper_model_n_mels)
INT_ACCESSOR(whisper_model_ftype)
INT_ACCESSOR(whisper_token_eot)
INT_ACCESSOR(whisper_token_sot)
INT_ACCESSOR(whisper_token_beg)
INT_ACCESSOR(whisper_full_n_segments)

int whisper_lang_id(const char* lang) {
    return (int)call_long("whisper_lang_id", Py_BuildValue("(s)", lang));
}

int whisper_lang_max_id(void) {
    return (int)call_long("whisper_lang_max_id", PyTuple_New(0));
}

const char* whisper_lang_str(int id) {
    Gil gil;
    static thread_local char buf[16];
    PyObject* r = call("whisper_lang_str", Py_BuildValue("(i)", id));
    if (!r || r == Py_None) { Py_XDECREF(r); return nullptr; }
    const char* s = PyUnicode_AsUTF8(r);
    std::snprintf(buf, sizeof(buf), "%s", s ? s : "");
    Py_DECREF(r);
    return buf;
}

const char* whisper_full_get_segment_text(whisper_context* ctx, int i) {
    Gil gil;
    static thread_local char buf[4096];
    PyObject* r = call("whisper_full_get_segment_text",
                       Py_BuildValue("(Oi)", (PyObject*)ctx, i));
    if (!r) return nullptr;
    const char* s = PyUnicode_AsUTF8(r);
    std::snprintf(buf, sizeof(buf), "%s", s ? s : "");
    Py_DECREF(r);
    return buf;
}

void whisper_print_timings(whisper_context* ctx) {
    Gil gil;
    PyObject* r = call("whisper_print_timings",
                       PyTuple_Pack(1, (PyObject*)ctx));
    Py_XDECREF(r);
}

}  // extern "C"

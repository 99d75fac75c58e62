/* faiss_tpu C API implementation — embeds the Python engine via the
 * CPython API (the reference's c_api/ wraps its C++ classes the same
 * opaque-pointer way; here the "library" is the jax/XLA engine).
 *
 * Build: see c_api/Makefile (links -lpython3.x).
 */

#include "faiss_tpu_c.h"

#include <Python.h>
#include <stdio.h>
#include <string.h>

struct FaissTpuIndex {
    PyObject* obj; /* faiss_tpu Index instance */
};

static char g_err[4096];
static PyObject* g_mod = NULL; /* faiss_tpu module */
static PyObject* g_np = NULL;  /* numpy module */

static void set_err_from_python(void) {
    PyObject *type, *value, *tb;
    PyErr_Fetch(&type, &value, &tb);
    if (value) {
        PyObject* s = PyObject_Str(value);
        if (s) {
            snprintf(g_err, sizeof(g_err), "%s", PyUnicode_AsUTF8(s));
            Py_DECREF(s);
        }
    } else {
        snprintf(g_err, sizeof(g_err), "unknown error");
    }
    Py_XDECREF(type);
    Py_XDECREF(value);
    Py_XDECREF(tb);
}

const char* faiss_tpu_get_last_error(void) {
    return g_err;
}

int faiss_tpu_init(const char* repo_path) {
    if (g_mod) {
        return 0;
    }
    if (!Py_IsInitialized()) {
        Py_InitializeEx(0);
    }
    PyGILState_STATE st = PyGILState_Ensure();
    if (repo_path) {
        PyObject* sys_path = PySys_GetObject("path"); /* borrowed */
        PyObject* p = PyUnicode_FromString(repo_path);
        PyList_Insert(sys_path, 0, p);
        Py_DECREF(p);
    }
    /* honor JAX_PLATFORMS before the first jax import: site hooks may
     * force-register an accelerator backend regardless of the env var
     * (e.g. a remote-TPU hook), and an embedded caller that asked for
     * "cpu" must not silently end up paying remote compiles */
    const char* plat = getenv("JAX_PLATFORMS");
    if (plat && plat[0]) {
        char buf[320];
        snprintf(buf, sizeof(buf),
                 "import jax\n"
                 "jax.config.update('jax_platforms', '%.64s')\n",
                 plat);
        PyRun_SimpleString(buf);
    }
    g_np = PyImport_ImportModule("numpy");
    g_mod = PyImport_ImportModule("faiss_tpu");
    int rc = 0;
    if (!g_mod || !g_np) {
        set_err_from_python();
        rc = -1;
    }
    PyGILState_Release(st);
    return rc;
}

void faiss_tpu_shutdown(void) {
    /* the embedded interpreter stays up for the process lifetime (jax
     * runtimes do not support re-initialization) */
}

/* wrap a const float buffer as a read-only numpy array [n, d] (no copy) */
static PyObject* wrap_f32(const float* x, long long n, long long d) {
    PyObject* mv = PyMemoryView_FromMemory(
            (char*)x, (Py_ssize_t)(n * d * 4), PyBUF_READ);
    if (!mv) {
        return NULL;
    }
    PyObject* flat = PyObject_CallMethod(
            g_np, "frombuffer", "Os", mv, "float32");
    Py_DECREF(mv);
    if (!flat) {
        return NULL;
    }
    PyObject* arr = PyObject_CallMethod(flat, "reshape", "LL", n, d);
    Py_DECREF(flat);
    return arr;
}

static PyObject* wrap_i64(const int64_t* x, long long n) {
    PyObject* mv = PyMemoryView_FromMemory(
            (char*)x, (Py_ssize_t)(n * 8), PyBUF_READ);
    if (!mv) {
        return NULL;
    }
    PyObject* arr =
            PyObject_CallMethod(g_np, "frombuffer", "Os", mv, "int64");
    Py_DECREF(mv);
    return arr;
}

int faiss_tpu_index_factory(
        FaissTpuIndex** out,
        int d,
        const char* description,
        int metric) {
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = -1;
    PyObject* idx = PyObject_CallMethod(
            g_mod, "index_factory", "isi", d, description, metric);
    if (idx) {
        *out = (FaissTpuIndex*)malloc(sizeof(FaissTpuIndex));
        (*out)->obj = idx;
        rc = 0;
    } else {
        set_err_from_python();
    }
    PyGILState_Release(st);
    return rc;
}

void faiss_tpu_Index_free(FaissTpuIndex* index) {
    if (!index) {
        return;
    }
    PyGILState_STATE st = PyGILState_Ensure();
    Py_XDECREF(index->obj);
    PyGILState_Release(st);
    free(index);
}

faiss_tpu_idx_t faiss_tpu_Index_ntotal(const FaissTpuIndex* index) {
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject* v = PyObject_GetAttrString(index->obj, "ntotal");
    long long n = v ? PyLong_AsLongLong(v) : -1;
    Py_XDECREF(v);
    PyGILState_Release(st);
    return (faiss_tpu_idx_t)n;
}

int faiss_tpu_Index_d(const FaissTpuIndex* index) {
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject* v = PyObject_GetAttrString(index->obj, "d");
    int d = v ? (int)PyLong_AsLong(v) : -1;
    Py_XDECREF(v);
    PyGILState_Release(st);
    return d;
}

int faiss_tpu_Index_is_trained(const FaissTpuIndex* index) {
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject* v = PyObject_GetAttrString(index->obj, "is_trained");
    int t = v ? PyObject_IsTrue(v) : 0;
    Py_XDECREF(v);
    PyGILState_Release(st);
    return t;
}

static int call_with_matrix(
        PyObject* obj,
        const char* method,
        faiss_tpu_idx_t n,
        const float* x,
        int d) {
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = -1;
    PyObject* arr = wrap_f32(x, n, d);
    if (arr) {
        PyObject* r = PyObject_CallMethod(obj, method, "O", arr);
        Py_DECREF(arr);
        if (r) {
            Py_DECREF(r);
            rc = 0;
        }
    }
    if (rc) {
        set_err_from_python();
    }
    PyGILState_Release(st);
    return rc;
}

int faiss_tpu_Index_train(
        FaissTpuIndex* index,
        faiss_tpu_idx_t n,
        const float* x) {
    return call_with_matrix(
            index->obj, "train", n, x, faiss_tpu_Index_d(index));
}

int faiss_tpu_Index_add(
        FaissTpuIndex* index,
        faiss_tpu_idx_t n,
        const float* x) {
    return call_with_matrix(
            index->obj, "add", n, x, faiss_tpu_Index_d(index));
}

int faiss_tpu_Index_add_with_ids(
        FaissTpuIndex* index,
        faiss_tpu_idx_t n,
        const float* x,
        const faiss_tpu_idx_t* ids) {
    int d = faiss_tpu_Index_d(index);
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = -1;
    PyObject* arr = wrap_f32(x, n, d);
    PyObject* ida = wrap_i64((const int64_t*)ids, n);
    if (arr && ida) {
        PyObject* r = PyObject_CallMethod(
                index->obj, "add_with_ids", "OO", arr, ida);
        if (r) {
            Py_DECREF(r);
            rc = 0;
        }
    }
    Py_XDECREF(arr);
    Py_XDECREF(ida);
    if (rc) {
        set_err_from_python();
    }
    PyGILState_Release(st);
    return rc;
}

int faiss_tpu_Index_search(
        const FaissTpuIndex* index,
        faiss_tpu_idx_t n,
        const float* x,
        faiss_tpu_idx_t k,
        float* distances,
        faiss_tpu_idx_t* labels) {
    int d = faiss_tpu_Index_d(index);
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = -1;
    PyObject* arr = wrap_f32(x, n, d);
    PyObject* res = NULL;
    if (arr) {
        res = PyObject_CallMethod(index->obj, "search", "OL", arr, k);
        Py_DECREF(arr);
    }
    if (res) {
        PyObject* D = PyTuple_GetItem(res, 0); /* borrowed */
        PyObject* I = PyTuple_GetItem(res, 1);
        /* copy out via tobytes on contiguous float32/int64 views */
        PyObject* Df = PyObject_CallMethod(
                g_np, "ascontiguousarray", "Os", D, "float32");
        PyObject* If = PyObject_CallMethod(
                g_np, "ascontiguousarray", "Os", I, "int64");
        if (Df && If) {
            PyObject* db = PyObject_CallMethod(Df, "tobytes", NULL);
            PyObject* ib = PyObject_CallMethod(If, "tobytes", NULL);
            if (db && ib) {
                memcpy(distances,
                       PyBytes_AsString(db),
                       (size_t)(n * k * 4));
                memcpy(labels, PyBytes_AsString(ib), (size_t)(n * k * 8));
                rc = 0;
            }
            Py_XDECREF(db);
            Py_XDECREF(ib);
        }
        Py_XDECREF(Df);
        Py_XDECREF(If);
        Py_DECREF(res);
    }
    if (rc) {
        set_err_from_python();
    }
    PyGILState_Release(st);
    return rc;
}

int faiss_tpu_Index_reset(FaissTpuIndex* index) {
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject* r = PyObject_CallMethod(index->obj, "reset", NULL);
    int rc = r ? 0 : -1;
    Py_XDECREF(r);
    if (rc) {
        set_err_from_python();
    }
    PyGILState_Release(st);
    return rc;
}

int faiss_tpu_Index_reconstruct(
        const FaissTpuIndex* index,
        faiss_tpu_idx_t key,
        float* recons) {
    int d = faiss_tpu_Index_d(index);
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = -1;
    PyObject* r = PyObject_CallMethod(index->obj, "reconstruct", "L", key);
    if (r) {
        PyObject* rf = PyObject_CallMethod(
                g_np, "ascontiguousarray", "Os", r, "float32");
        if (rf) {
            PyObject* b = PyObject_CallMethod(rf, "tobytes", NULL);
            if (b) {
                memcpy(recons, PyBytes_AsString(b), (size_t)d * 4);
                rc = 0;
                Py_DECREF(b);
            }
            Py_DECREF(rf);
        }
        Py_DECREF(r);
    }
    if (rc) {
        set_err_from_python();
    }
    PyGILState_Release(st);
    return rc;
}

int faiss_tpu_Index_set_parameter(
        FaissTpuIndex* index,
        const char* name,
        double value) {
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = -1;
    PyObject* ps = PyObject_CallMethod(g_mod, "ParameterSpace", NULL);
    if (ps) {
        PyObject* r = PyObject_CallMethod(
                ps,
                "set_index_parameter",
                "Osd",
                index->obj,
                name,
                value);
        if (r) {
            Py_DECREF(r);
            rc = 0;
        }
        Py_DECREF(ps);
    }
    if (rc) {
        set_err_from_python();
    }
    PyGILState_Release(st);
    return rc;
}

int faiss_tpu_write_index(const FaissTpuIndex* index, const char* fname) {
    PyGILState_STATE st = PyGILState_Ensure();
    PyObject* r = PyObject_CallMethod(
            g_mod, "write_index", "Os", index->obj, fname);
    int rc = r ? 0 : -1;
    Py_XDECREF(r);
    if (rc) {
        set_err_from_python();
    }
    PyGILState_Release(st);
    return rc;
}

int faiss_tpu_read_index(
        FaissTpuIndex** out,
        const char* fname,
        int io_flags) {
    PyGILState_STATE st = PyGILState_Ensure();
    int rc = -1;
    PyObject* idx = PyObject_CallMethod(
            g_mod, "read_index", "si", fname, io_flags);
    if (idx) {
        *out = (FaissTpuIndex*)malloc(sizeof(FaissTpuIndex));
        (*out)->obj = idx;
        rc = 0;
    } else {
        set_err_from_python();
    }
    PyGILState_Release(st);
    return rc;
}

// tat_results: native result materialization for device lookups.
//
// The serve path's host-side cost is dominated by building Python result
// objects: a batch-256 top-10 lookup creates 2,560 (item, score) records,
// and the pure-Python dataclass loop measures ~9 ms/batch — more than the
// device compute itself (~4.5 ms at 1M x 384 bf16). This extension builds
// the list-of-lists of ScoredInt records straight from the fetched device
// buffers (float32 scores + int32 ordinals) in one C pass.
//
// The reference has no native code at all (SURVEY.md: pure Python + numpy;
// its kernel is aitools/vectorbase.py:163-230); this is part of the
// TPU-native runtime around the JAX data plane.
//
// Built on demand by typeagent_tpu/native.py (g++, CPython C API only — no
// numpy headers; buffers arrive via the buffer protocol). Pure-Python
// fallback lives in vectorstore.py.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <structmember.h>

#include <cstdint>

// ---------------------------------------------------------------------------
// ScoredInt: a C twin of the vectorstore dataclass (item: int, score: float).
// Allocation via tp_alloc + direct member stores is ~10x cheaper than
// calling a Python dataclass __init__.
// ---------------------------------------------------------------------------

typedef struct {
    PyObject_HEAD
    long long item;
    double score;
} ScoredIntObject;

static PyTypeObject ScoredInt_Type = {
    PyVarObject_HEAD_INIT(NULL, 0)
    "tat_results.ScoredInt",          /* tp_name */
    sizeof(ScoredIntObject),          /* tp_basicsize */
    0,                                /* tp_itemsize */
    0,                                /* tp_dealloc (default) */
};  // remaining slots filled in PyInit_tat_results

static PyObject *ScoredInt_new_raw(long long item, double score) {
    ScoredIntObject *self =
        PyObject_New(ScoredIntObject, &ScoredInt_Type);
    if (self == NULL) return NULL;
    self->item = item;
    self->score = score;
    return (PyObject *)self;
}

static int ScoredInt_init(ScoredIntObject *self, PyObject *args,
                          PyObject *kwds) {
    static const char *kwlist[] = {"item", "score", NULL};
    long long item = 0;
    double score = 0.0;
    if (!PyArg_ParseTupleAndKeywords(args, kwds, "Ld",
                                     const_cast<char **>(kwlist), &item,
                                     &score))
        return -1;
    self->item = item;
    self->score = score;
    return 0;
}

static PyObject *ScoredInt_repr(ScoredIntObject *self) {
    PyObject *f = PyFloat_FromDouble(self->score);
    if (f == NULL) return NULL;
    PyObject *r = PyUnicode_FromFormat("ScoredInt(item=%lld, score=%R)",
                                       self->item, f);
    Py_DECREF(f);
    return r;
}

static PyObject *ScoredInt_richcompare(PyObject *a, PyObject *b, int op) {
    if (op != Py_EQ && op != Py_NE) Py_RETURN_NOTIMPLEMENTED;
    long long bi;
    double bs;
    if (PyObject_TypeCheck(b, &ScoredInt_Type)) {
        bi = ((ScoredIntObject *)b)->item;
        bs = ((ScoredIntObject *)b)->score;
    } else {
        // Duck-typed equality with the Python dataclass fallback.
        PyObject *item = PyObject_GetAttrString(b, "item");
        if (item == NULL) {
            PyErr_Clear();
            Py_RETURN_NOTIMPLEMENTED;
        }
        PyObject *score = PyObject_GetAttrString(b, "score");
        if (score == NULL) {
            Py_DECREF(item);
            PyErr_Clear();
            Py_RETURN_NOTIMPLEMENTED;
        }
        bi = PyLong_AsLongLong(item);
        bs = PyFloat_AsDouble(score);
        Py_DECREF(item);
        Py_DECREF(score);
        if (PyErr_Occurred()) {
            PyErr_Clear();
            Py_RETURN_NOTIMPLEMENTED;
        }
    }
    ScoredIntObject *sa = (ScoredIntObject *)a;
    int eq = (sa->item == bi) && (sa->score == bs);
    if (op == Py_NE) eq = !eq;
    if (eq) Py_RETURN_TRUE;
    Py_RETURN_FALSE;
}

static PyMemberDef ScoredInt_members[] = {
    {"item", T_LONGLONG, offsetof(ScoredIntObject, item), 0,
     "integer ordinal"},
    {"score", T_DOUBLE, offsetof(ScoredIntObject, score), 0,
     "similarity score"},
    {NULL},
};

// ---------------------------------------------------------------------------
// build(vals, idx, b, k, min_score) -> list[list[ScoredInt]]
//
// vals: C-contiguous float32 buffer with >= b*k elements
// idx:  C-contiguous int32 buffer with >= b*k elements
// Keeps entries where score >= min_score AND ordinal >= 0, in order —
// exactly the Python loop it replaces (vectorstore.py lookup paths).
// ---------------------------------------------------------------------------

static PyObject *build(PyObject *Py_UNUSED(mod), PyObject *args) {
    PyObject *vals_obj, *idx_obj;
    Py_ssize_t b, k;
    double min_score;
    if (!PyArg_ParseTuple(args, "OOnnd", &vals_obj, &idx_obj, &b, &k,
                          &min_score))
        return NULL;

    Py_buffer vals_buf, idx_buf;
    if (PyObject_GetBuffer(vals_obj, &vals_buf, PyBUF_C_CONTIGUOUS) != 0)
        return NULL;
    if (PyObject_GetBuffer(idx_obj, &idx_buf, PyBUF_C_CONTIGUOUS) != 0) {
        PyBuffer_Release(&vals_buf);
        return NULL;
    }

    PyObject *result = NULL;
    if (vals_buf.itemsize != 4 || idx_buf.itemsize != 4 ||
        vals_buf.len < (Py_ssize_t)(b * k * 4) ||
        idx_buf.len < (Py_ssize_t)(b * k * 4)) {
        PyErr_SetString(PyExc_ValueError,
                        "build: expected float32/int32 buffers of >= b*k "
                        "elements");
        goto done;
    }

    {
        const float *vals = (const float *)vals_buf.buf;
        const int32_t *idx = (const int32_t *)idx_buf.buf;
        result = PyList_New(b);
        if (result == NULL) goto done;
        for (Py_ssize_t r = 0; r < b; r++) {
            PyObject *row = PyList_New(0);
            if (row == NULL) {
                Py_CLEAR(result);
                goto done;
            }
            const float *v = vals + r * k;
            const int32_t *ix = idx + r * k;
            for (Py_ssize_t j = 0; j < k; j++) {
                if (v[j] >= min_score && ix[j] >= 0) {
                    PyObject *rec = ScoredInt_new_raw(ix[j], (double)v[j]);
                    if (rec == NULL || PyList_Append(row, rec) != 0) {
                        Py_XDECREF(rec);
                        Py_DECREF(row);
                        Py_CLEAR(result);
                        goto done;
                    }
                    Py_DECREF(rec);
                }
            }
            PyList_SET_ITEM(result, r, row);  // steals row
        }
    }

done:
    PyBuffer_Release(&vals_buf);
    PyBuffer_Release(&idx_buf);
    return result;
}

// build_pairs(vals, idx, b, k, min_score) -> list[list[tuple[int, float]]]
// The (ordinal, score) tuple variant for the sharded store's collect path.
static PyObject *build_pairs(PyObject *Py_UNUSED(mod), PyObject *args) {
    PyObject *vals_obj, *idx_obj;
    Py_ssize_t b, k;
    double min_score;
    if (!PyArg_ParseTuple(args, "OOnnd", &vals_obj, &idx_obj, &b, &k,
                          &min_score))
        return NULL;

    Py_buffer vals_buf, idx_buf;
    if (PyObject_GetBuffer(vals_obj, &vals_buf, PyBUF_C_CONTIGUOUS) != 0)
        return NULL;
    if (PyObject_GetBuffer(idx_obj, &idx_buf, PyBUF_C_CONTIGUOUS) != 0) {
        PyBuffer_Release(&vals_buf);
        return NULL;
    }

    PyObject *result = NULL;
    if (vals_buf.itemsize != 4 || idx_buf.itemsize != 4 ||
        vals_buf.len < (Py_ssize_t)(b * k * 4) ||
        idx_buf.len < (Py_ssize_t)(b * k * 4)) {
        PyErr_SetString(PyExc_ValueError,
                        "build_pairs: expected float32/int32 buffers of >= "
                        "b*k elements");
        goto done;
    }

    {
        const float *vals = (const float *)vals_buf.buf;
        const int32_t *idx = (const int32_t *)idx_buf.buf;
        result = PyList_New(b);
        if (result == NULL) goto done;
        for (Py_ssize_t r = 0; r < b; r++) {
            PyObject *row = PyList_New(0);
            if (row == NULL) {
                Py_CLEAR(result);
                goto done;
            }
            const float *v = vals + r * k;
            const int32_t *ix = idx + r * k;
            for (Py_ssize_t j = 0; j < k; j++) {
                if (v[j] >= min_score && ix[j] >= 0) {
                    PyObject *rec = Py_BuildValue("(ld)", (long)ix[j],
                                                  (double)v[j]);
                    if (rec == NULL || PyList_Append(row, rec) != 0) {
                        Py_XDECREF(rec);
                        Py_DECREF(row);
                        Py_CLEAR(result);
                        goto done;
                    }
                    Py_DECREF(rec);
                }
            }
            PyList_SET_ITEM(result, r, row);  // steals row
        }
    }

done:
    PyBuffer_Release(&vals_buf);
    PyBuffer_Release(&idx_buf);
    return result;
}

static PyMethodDef module_methods[] = {
    {"build", build, METH_VARARGS,
     "build(vals_f32, idx_i32, b, k, min_score) -> list[list[ScoredInt]]"},
    {"build_pairs", build_pairs, METH_VARARGS,
     "build_pairs(vals_f32, idx_i32, b, k, min_score) -> "
     "list[list[tuple[int, float]]]"},
    {NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "tat_results",
    "Native result materialization for device lookups.", -1, module_methods,
};

PyMODINIT_FUNC PyInit_tat_results(void) {
    ScoredInt_Type.tp_flags = Py_TPFLAGS_DEFAULT;
    ScoredInt_Type.tp_doc = "An integer ordinal paired with its similarity score.";
    ScoredInt_Type.tp_members = ScoredInt_members;
    ScoredInt_Type.tp_init = (initproc)ScoredInt_init;
    ScoredInt_Type.tp_new = PyType_GenericNew;
    ScoredInt_Type.tp_repr = (reprfunc)ScoredInt_repr;
    ScoredInt_Type.tp_richcompare = ScoredInt_richcompare;
    // The Python twin is a plain (eq=True) dataclass, which is unhashable;
    // match it so the two types are interchangeable.
    ScoredInt_Type.tp_hash = PyObject_HashNotImplemented;
    if (PyType_Ready(&ScoredInt_Type) < 0) return NULL;

    PyObject *mod = PyModule_Create(&moduledef);
    if (mod == NULL) return NULL;
    Py_INCREF(&ScoredInt_Type);
    if (PyModule_AddObject(mod, "ScoredInt", (PyObject *)&ScoredInt_Type) <
        0) {
        Py_DECREF(&ScoredInt_Type);
        Py_DECREF(mod);
        return NULL;
    }
    return mod;
}

/* Native BPE encoder for the text front-end.
 *
 * The runtime-native piece of the host pipeline: greedy score-based BPE
 * merging (sentencepiece-BPE inference semantics) implemented as a CPython
 * extension. The pure-Python fallback lives in indextts_tpu/text/spm.py
 * (PureSentencePiece._encode_word); this matches it bit-for-bit and removes
 * the O(n^2) Python-object churn from long-text tokenization.
 *
 * Interface:
 *   handle = bpe_new(pieces: list[str], scores: list[float])
 *   tokens = bpe_encode_word(handle, word: str) -> list[str]   (word already
 *            whitespace-marked with U+2581)
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdlib.h>
#include <string.h>

/* ------------------------------------------------------------------ hash map
 * open-addressing string -> (score, present) map, FNV-1a hashing
 */

typedef struct {
    char *key;       /* owned, NUL-terminated utf-8 */
    double score;
} Entry;

typedef struct {
    Entry *entries;
    size_t cap;      /* power of two */
    size_t len;
} Map;

static uint64_t fnv1a(const char *s, size_t n) {
    uint64_t h = 1469598103934665603ULL;
    for (size_t i = 0; i < n; i++) {
        h ^= (unsigned char)s[i];
        h *= 1099511628211ULL;
    }
    return h;
}

static int map_init(Map *m, size_t want) {
    size_t cap = 16;
    while (cap < want * 2) cap <<= 1;
    m->entries = calloc(cap, sizeof(Entry));
    if (!m->entries) return -1;
    m->cap = cap;
    m->len = 0;
    return 0;
}

static void map_free(Map *m) {
    if (!m->entries) return;
    for (size_t i = 0; i < m->cap; i++) free(m->entries[i].key);
    free(m->entries);
    m->entries = NULL;
}

static int map_put(Map *m, const char *key, size_t klen, double score) {
    uint64_t h = fnv1a(key, klen);
    size_t i = h & (m->cap - 1);
    while (m->entries[i].key) {
        if (!strncmp(m->entries[i].key, key, klen) && m->entries[i].key[klen] == 0) {
            /* keep the first (sentencepiece ids are unique anyway) */
            return 0;
        }
        i = (i + 1) & (m->cap - 1);
    }
    m->entries[i].key = malloc(klen + 1);
    if (!m->entries[i].key) return -1;
    memcpy(m->entries[i].key, key, klen);
    m->entries[i].key[klen] = 0;
    m->entries[i].score = score;
    m->len++;
    return 0;
}

/* returns 1 + writes score if found, else 0 */
static int map_get(const Map *m, const char *key, size_t klen, double *score) {
    uint64_t h = fnv1a(key, klen);
    size_t i = h & (m->cap - 1);
    while (m->entries[i].key) {
        if (!strncmp(m->entries[i].key, key, klen) && m->entries[i].key[klen] == 0) {
            *score = m->entries[i].score;
            return 1;
        }
        i = (i + 1) & (m->cap - 1);
    }
    return 0;
}

/* ------------------------------------------------------------------ capsule */

static void bpe_capsule_destroy(PyObject *cap) {
    Map *m = PyCapsule_GetPointer(cap, "indextts_bpe");
    if (m) {
        map_free(m);
        free(m);
    }
}

static PyObject *bpe_new(PyObject *self, PyObject *args) {
    PyObject *pieces, *scores;
    if (!PyArg_ParseTuple(args, "OO", &pieces, &scores)) return NULL;
    Py_ssize_t n = PyList_Size(pieces);
    if (n < 0 || PyList_Size(scores) != n) {
        PyErr_SetString(PyExc_ValueError, "pieces/scores length mismatch");
        return NULL;
    }
    Map *m = malloc(sizeof(Map));
    if (!m || map_init(m, (size_t)n) < 0) {
        free(m);
        return PyErr_NoMemory();
    }
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_ssize_t klen;
        const char *k = PyUnicode_AsUTF8AndSize(PyList_GetItem(pieces, i), &klen);
        if (!k) { map_free(m); free(m); return NULL; }
        double s = PyFloat_AsDouble(PyList_GetItem(scores, i));
        if (s == -1.0 && PyErr_Occurred()) { map_free(m); free(m); return NULL; }
        if (map_put(m, k, (size_t)klen, s) < 0) {
            map_free(m); free(m);
            return PyErr_NoMemory();
        }
    }
    return PyCapsule_New(m, "indextts_bpe", bpe_capsule_destroy);
}

/* greedy merge on utf-8 codepoint boundaries */
static PyObject *bpe_encode_word(PyObject *self, PyObject *args) {
    PyObject *cap;
    const char *word;
    Py_ssize_t wlen;
    if (!PyArg_ParseTuple(args, "Os#", &cap, &word, &wlen)) return NULL;
    Map *m = PyCapsule_GetPointer(cap, "indextts_bpe");
    if (!m) return NULL;

    /* symbol boundaries: start as utf-8 codepoints */
    size_t max_syms = (size_t)wlen + 1;
    size_t *starts = malloc(max_syms * sizeof(size_t));
    size_t *lens = malloc(max_syms * sizeof(size_t));
    if (!starts || !lens) { free(starts); free(lens); return PyErr_NoMemory(); }
    size_t nsym = 0;
    for (Py_ssize_t i = 0; i < wlen;) {
        unsigned char c = (unsigned char)word[i];
        size_t step = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
        if ((Py_ssize_t)(i + step) > wlen) step = 1;
        starts[nsym] = (size_t)i;
        lens[nsym] = step;
        nsym++;
        i += (Py_ssize_t)step;
    }

    /* repeatedly merge the best-scoring adjacent pair */
    while (nsym > 1) {
        double best_score = 0.0;
        ssize_t best = -1;
        for (size_t i = 0; i + 1 < nsym; i++) {
            size_t mstart = starts[i];
            size_t mlen = lens[i] + lens[i + 1];
            double s;
            if (map_get(m, word + mstart, mlen, &s)) {
                if (best < 0 || s > best_score) {
                    best = (ssize_t)i;
                    best_score = s;
                }
            }
        }
        if (best < 0) break;
        lens[best] += lens[best + 1];
        for (size_t i = (size_t)best + 1; i + 1 < nsym; i++) {
            starts[i] = starts[i + 1];
            lens[i] = lens[i + 1];
        }
        nsym--;
    }

    PyObject *out = PyList_New(0);
    if (!out) { free(starts); free(lens); return NULL; }
    for (size_t i = 0; i < nsym; i++) {
        double s;
        if (map_get(m, word + starts[i], lens[i], &s)) {
            PyObject *tok = PyUnicode_FromStringAndSize(word + starts[i],
                                                        (Py_ssize_t)lens[i]);
            if (!tok || PyList_Append(out, tok) < 0) {
                Py_XDECREF(tok); Py_DECREF(out);
                free(starts); free(lens);
                return NULL;
            }
            Py_DECREF(tok);
        } else {
            /* byte fallback: <0xXX> pieces (or <unk> when absent) */
            for (size_t b = 0; b < lens[i]; b++) {
                char buf[8];
                snprintf(buf, sizeof(buf), "<0x%02X>",
                         (unsigned char)word[starts[i] + b]);
                double s2;
                const char *piece = map_get(m, buf, 6, &s2) ? buf : "<unk>";
                PyObject *tok = PyUnicode_FromString(piece);
                if (!tok || PyList_Append(out, tok) < 0) {
                    Py_XDECREF(tok); Py_DECREF(out);
                    free(starts); free(lens);
                    return NULL;
                }
                Py_DECREF(tok);
            }
        }
    }
    free(starts);
    free(lens);
    return out;
}

static PyMethodDef methods[] = {
    {"bpe_new", bpe_new, METH_VARARGS, "build a BPE vocab handle"},
    {"bpe_encode_word", bpe_encode_word, METH_VARARGS,
     "greedy-merge one pre-marked word"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_bpe_native", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__bpe_native(void) {
    return PyModule_Create(&moduledef);
}

/* Native host-runtime ops for TCE-RVOS-TPU.
 *
 * The reference's native layer is its CUDA MSDeformAttn extension (replaced
 * here by the Pallas TPU kernel); the remaining hot *host-side* loops live
 * in the data/eval path: COCO RLE decode/encode (MeViS mask_dict decoding
 * runs per training sample; A2D eval encodes every prediction) and the
 * boundary-map extraction inside DAVIS F-measure. This extension implements
 * them in C (CPython API, no pybind11), with pure-numpy fallbacks kept in
 * tce_rvos_tpu/utils/rle.py and eval/davis_eval.py.
 *
 * Wire format identical to pycocotools maskApi.c: column-major runs starting
 * with the zero run; string compression = 6-bit LEB-like with 0x30 offset.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ---------------- decode: counts -> column-major binary mask ------------ */
static PyObject *rle_decode_counts(PyObject *self, PyObject *args) {
  PyObject *counts_obj;
  long h, w;
  if (!PyArg_ParseTuple(args, "Oll", &counts_obj, &h, &w)) return NULL;
  PyObject *seq = PySequence_Fast(counts_obj, "counts must be a sequence");
  if (!seq) return NULL;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  Py_ssize_t total = (Py_ssize_t)h * w;
  PyObject *out = PyBytes_FromStringAndSize(NULL, total);
  if (!out) { Py_DECREF(seq); return NULL; }
  char *buf = PyBytes_AS_STRING(out);
  memset(buf, 0, total);
  Py_ssize_t pos = 0;
  int val = 0;
  for (Py_ssize_t i = 0; i < n; i++) {
    long c = PyLong_AsLong(PySequence_Fast_GET_ITEM(seq, i));
    if (c < 0 && PyErr_Occurred()) { Py_DECREF(seq); Py_DECREF(out); return NULL; }
    if (pos + c > total) c = total - pos;
    if (val) memset(buf + pos, 1, c);
    pos += c;
    val ^= 1;
  }
  Py_DECREF(seq);
  /* returns flat column-major bytes; python side reshapes (order='F') */
  return out;
}

/* ---------------- encode: column-major mask bytes -> counts ------------- */
static PyObject *rle_encode_bytes(PyObject *self, PyObject *args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return NULL;
  const uint8_t *m = (const uint8_t *)view.buf;
  Py_ssize_t n = view.len;
  PyObject *list = PyList_New(0);
  if (!list) { PyBuffer_Release(&view); return NULL; }
  Py_ssize_t i = 0;
  uint8_t cur = 0;
  while (i < n) {
    Py_ssize_t j = i;
    while (j < n && (m[j] != 0) == cur) j++;
    PyObject *num = PyLong_FromSsize_t(j - i);
    PyList_Append(list, num);
    Py_DECREF(num);
    cur ^= 1;
    i = j;
  }
  if (n == 0) {
    PyObject *zero = PyLong_FromLong(0);
    PyList_Append(list, zero);
    Py_DECREF(zero);
  }
  PyBuffer_Release(&view);
  return list;
}

/* ---------------- LEB-6bit string <-> counts ---------------------------- */
static PyObject *rle_string_to_counts(PyObject *self, PyObject *args) {
  const char *s;
  Py_ssize_t slen;
  if (!PyArg_ParseTuple(args, "s#", &s, &slen)) return NULL;
  PyObject *list = PyList_New(0);
  Py_ssize_t i = 0;
  long long prev2 = 0, prev1 = 0;
  Py_ssize_t cnt = 0;
  while (i < slen) {
    long long x = 0;
    int k = 0, more = 1;
    while (more) {
      long long c = s[i] - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (int)(c & 0x20);
      i++;
      if (!more && (c & 0x10)) x |= -1LL << (5 * (k + 1));
      k++;
      if (i > slen) { Py_DECREF(list); PyErr_SetString(PyExc_ValueError, "bad rle string"); return NULL; }
    }
    if (cnt > 2) x += prev2;
    prev2 = prev1;
    prev1 = x;
    cnt++;
    PyObject *num = PyLong_FromLongLong(x);
    PyList_Append(list, num);
    Py_DECREF(num);
  }
  return list;
}

static PyObject *rle_counts_to_string(PyObject *self, PyObject *args) {
  PyObject *counts_obj;
  if (!PyArg_ParseTuple(args, "O", &counts_obj)) return NULL;
  PyObject *seq = PySequence_Fast(counts_obj, "counts must be a sequence");
  if (!seq) return NULL;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  /* worst case 13 chars per count */
  char *buf = (char *)malloc((size_t)n * 14 + 1);
  if (!buf) { Py_DECREF(seq); return PyErr_NoMemory(); }
  Py_ssize_t pos = 0;
  for (Py_ssize_t i = 0; i < n; i++) {
    long long x = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(seq, i));
    if (i > 2) {
      long long pi2 = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(seq, i - 2));
      x -= pi2;
    }
    int more = 1;
    while (more) {
      long long c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      buf[pos++] = (char)(c + 48);
    }
  }
  PyObject *out = PyUnicode_FromStringAndSize(buf, pos);
  free(buf);
  Py_DECREF(seq);
  return out;
}

/* ---------------- boundary map (Martin-style, same-size) ----------------- */
static PyObject *seg2bmap(PyObject *self, PyObject *args) {
  Py_buffer view;
  long h, w;
  if (!PyArg_ParseTuple(args, "y*ll", &view, &h, &w)) return NULL;
  const uint8_t *seg = (const uint8_t *)view.buf;
  if (view.len < (Py_ssize_t)h * w) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "buffer too small");
    return NULL;
  }
  PyObject *out = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)h * w);
  if (!out) { PyBuffer_Release(&view); return NULL; }
  uint8_t *b = (uint8_t *)PyBytes_AS_STRING(out);
  for (long y = 0; y < h; y++) {
    for (long x = 0; x < w; x++) {
      uint8_t s = seg[y * w + x] != 0;
      uint8_t e = (x + 1 < w) ? (seg[y * w + x + 1] != 0) : 0;
      uint8_t so = (y + 1 < h) ? (seg[(y + 1) * w + x] != 0) : 0;
      uint8_t se = (x + 1 < w && y + 1 < h) ? (seg[(y + 1) * w + x + 1] != 0) : 0;
      uint8_t v;
      if (y == h - 1 && x == w - 1) v = 0;
      else if (y == h - 1) v = s ^ e;
      else if (x == w - 1) v = s ^ so;
      else v = (s ^ e) | (s ^ so) | (s ^ se);
      b[y * w + x] = v;
    }
  }
  PyBuffer_Release(&view);
  return out;
}

static PyMethodDef Methods[] = {
    {"rle_decode_counts", rle_decode_counts, METH_VARARGS,
     "decode counts -> flat column-major mask bytes"},
    {"rle_encode_bytes", rle_encode_bytes, METH_VARARGS,
     "flat column-major mask bytes -> counts list"},
    {"rle_string_to_counts", rle_string_to_counts, METH_VARARGS,
     "compressed RLE string -> counts list"},
    {"rle_counts_to_string", rle_counts_to_string, METH_VARARGS,
     "counts list -> compressed RLE string"},
    {"seg2bmap", seg2bmap, METH_VARARGS,
     "binary mask bytes (row-major) -> boundary map bytes"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_rle_native", "native RLE/boundary ops", -1, Methods};

PyMODINIT_FUNC PyInit__rle_native(void) { return PyModule_Create(&moduledef); }

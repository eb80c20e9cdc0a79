// ait_native — native data-loader hot path for audio_intelligence_tpu.
//
// The reference's input pipeline leans on native libraries (soundfile/libsndfile
// decode, soxr resampling — UALM tarball_reader.py:292-334, A2SB
// datasets.py:144-165). This extension is the TPU-framework equivalent for
// host-side data workers:
//
//   decode_pcm16(bytes, channels)        -> float32 [channels, samples]
//   resample_poly(x, kernels, stride, pad, target_len)
//                                        -> float32 [channels, target_len]
//   peak_normalize(x, peak)              -> in-place peak normalization
//
// resample_poly evaluates the SAME polyphase windowed-sinc kernel bank the
// JAX op builds (ops/resample.py _resample_kernel_np), so host and device
// resampling are bit-comparable. OpenMP parallelizes across channels and
// output frames.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// bytes (interleaved PCM16 LE) -> float32 [channels, samples]
PyObject* decode_pcm16(PyObject*, PyObject* args) {
  Py_buffer buf;
  int channels;
  if (!PyArg_ParseTuple(args, "y*i", &buf, &channels)) return nullptr;
  if (channels <= 0) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "channels must be positive");
    return nullptr;
  }
  const npy_intp n_frames =
      static_cast<npy_intp>(buf.len / (2 * static_cast<size_t>(channels)));
  npy_intp dims[2] = {channels, n_frames};
  PyObject* out = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  const int16_t* src = static_cast<const int16_t*>(buf.buf);
  float* dst = static_cast<float*>(PyArray_DATA((PyArrayObject*)out));
  constexpr float kScale = 1.0f / 32768.0f;
  for (int c = 0; c < channels; ++c) {
    float* row = dst + static_cast<size_t>(c) * n_frames;
    for (npy_intp i = 0; i < n_frames; ++i) {
      row[i] = static_cast<float>(src[i * channels + c]) * kScale;
    }
  }
  PyBuffer_Release(&buf);
  return out;
}

// x [C, T] float32, kernels [L, KW] float32 (phase-major), stride = orig_freq
// (after gcd), pad = kernel halfwidth, target_len = ceil(new * T / orig).
// Matches ops/resample.py: per output block of L samples, dot the padded
// input window with each phase kernel.
PyObject* resample_poly(PyObject*, PyObject* args) {
  PyArrayObject *x_obj, *k_obj;
  long stride, pad, target_len;
  if (!PyArg_ParseTuple(args, "O!O!lll", &PyArray_Type, &x_obj, &PyArray_Type,
                        &k_obj, &stride, &pad, &target_len))
    return nullptr;

  PyArrayObject* x = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)x_obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* k = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)k_obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY);
  if (!x || !k) {
    Py_XDECREF(x);
    Py_XDECREF(k);
    return nullptr;
  }
  if (PyArray_NDIM(x) != 2 || PyArray_NDIM(k) != 2) {
    PyErr_SetString(PyExc_ValueError, "x must be [C,T], kernels [L,KW]");
    Py_DECREF(x);
    Py_DECREF(k);
    return nullptr;
  }
  const npy_intp channels = PyArray_DIM(x, 0);
  const npy_intp t_in = PyArray_DIM(x, 1);
  const npy_intp n_phase = PyArray_DIM(k, 0);
  const npy_intp kw = PyArray_DIM(k, 1);

  npy_intp dims[2] = {channels, target_len};
  PyObject* out = PyArray_ZEROS(2, dims, NPY_FLOAT32, 0);
  if (!out) {
    Py_DECREF(x);
    Py_DECREF(k);
    return nullptr;
  }

  const float* xd = static_cast<const float*>(PyArray_DATA(x));
  const float* kd = static_cast<const float*>(PyArray_DATA(k));
  float* od = static_cast<float*>(PyArray_DATA((PyArrayObject*)out));

  // padded input window origin for output block b is b*stride - pad
  Py_BEGIN_ALLOW_THREADS
#pragma omp parallel for collapse(2) schedule(static)
  for (npy_intp c = 0; c < channels; ++c) {
    for (npy_intp o = 0; o < target_len; ++o) {
      const npy_intp block = o / n_phase;
      const npy_intp phase = o % n_phase;
      const float* kr = kd + phase * kw;
      const float* xr = xd + c * t_in;
      const npy_intp start = block * stride - pad;
      float acc = 0.0f;
      const npy_intp lo = std::max<npy_intp>(0, -start);
      const npy_intp hi = std::min<npy_intp>(kw, t_in - start);
      for (npy_intp j = lo; j < hi; ++j) acc += xr[start + j] * kr[j];
      od[c * target_len + o] = acc;
    }
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(x);
  Py_DECREF(k);
  return out;
}

PyObject* peak_normalize(PyObject*, PyObject* args) {
  PyArrayObject* x_obj;
  double peak;
  if (!PyArg_ParseTuple(args, "O!d", &PyArray_Type, &x_obj, &peak))
    return nullptr;
  if (PyArray_TYPE(x_obj) != NPY_FLOAT32 ||
      !PyArray_IS_C_CONTIGUOUS(x_obj)) {
    PyErr_SetString(PyExc_ValueError, "need contiguous float32");
    return nullptr;
  }
  float* d = static_cast<float*>(PyArray_DATA(x_obj));
  const npy_intp n = PyArray_SIZE(x_obj);
  float m = 0.0f;
  for (npy_intp i = 0; i < n; ++i) m = std::max(m, std::fabs(d[i]));
  if (m > 0.0f) {
    const float s = static_cast<float>(peak) / m;
    for (npy_intp i = 0; i < n; ++i) d[i] *= s;
  }
  Py_INCREF(x_obj);
  return (PyObject*)x_obj;
}

PyMethodDef kMethods[] = {
    {"decode_pcm16", decode_pcm16, METH_VARARGS,
     "decode interleaved PCM16 bytes to float32 [channels, samples]"},
    {"resample_poly", resample_poly, METH_VARARGS,
     "polyphase resample float32 [C,T] with a [L,KW] kernel bank"},
    {"peak_normalize", peak_normalize, METH_VARARGS,
     "in-place peak normalization"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "ait_native",
                       "native data-loader hot path", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit_ait_native(void) {
  import_array();
  return PyModule_Create(&kModule);
}

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
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
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

// ---------------------------------------------------------------------------
// Prefetcher — the DataLoader-worker equivalent: N threads pread WAV byte
// ranges out of tar shards, decode PCM16 to planar float32, and hand the
// results back IN ORDER through a bounded window. All file IO and decoding
// runs with the GIL released; Python only pays for one memcpy per item.

struct PfJob {
  std::string path;
  long long offset;
  long long size;
};

struct PfResult {
  float* data = nullptr;  // planar [channels, frames], malloc'd
  long long channels = 0;
  long long frames = 0;
  long long sample_rate = 0;
  std::string error;
};

struct Prefetcher {
  std::vector<PfJob> jobs;
  std::map<long long, PfResult> done;
  std::mutex mu;
  std::condition_variable cv_done;   // consumer waits for done[next_out]
  std::condition_variable cv_slot;   // workers wait for window space
  std::atomic<long long> next_job{0};
  long long next_out = 0;
  long long depth = 16;
  bool stopping = false;
  std::vector<std::thread> threads;

  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv_slot.notify_all();
    cv_done.notify_all();
    for (auto& t : threads)
      if (t.joinable()) t.join();
    for (auto& kv : done) std::free(kv.second.data);
  }
};

// minimal RIFF walk: find "fmt " and "data"; PCM16 only.
bool decode_wav(const std::vector<uint8_t>& buf, PfResult* out) {
  if (buf.size() < 44 || std::memcmp(buf.data(), "RIFF", 4) ||
      std::memcmp(buf.data() + 8, "WAVE", 4)) {
    out->error = "not a RIFF/WAVE file";
    return false;
  }
  size_t pos = 12;
  int channels = 0, bits = 0;
  long long rate = 0;
  const uint8_t* pcm = nullptr;
  size_t pcm_len = 0;
  while (pos + 8 <= buf.size()) {
    const char* tag = reinterpret_cast<const char*>(buf.data() + pos);
    uint32_t len;
    std::memcpy(&len, buf.data() + pos + 4, 4);
    const uint8_t* body = buf.data() + pos + 8;
    if (pos + 8 + len > buf.size()) len = buf.size() - pos - 8;
    if (!std::memcmp(tag, "fmt ", 4) && len >= 16) {
      uint16_t fmt, ch, bps;
      uint32_t sr;
      std::memcpy(&fmt, body, 2);
      std::memcpy(&ch, body + 2, 2);
      std::memcpy(&sr, body + 4, 4);
      std::memcpy(&bps, body + 14, 2);
      if (fmt != 1 || bps != 16) {
        out->error = "prefetcher expects PCM16";
        return false;
      }
      channels = ch;
      bits = bps;
      rate = sr;
    } else if (!std::memcmp(tag, "data", 4)) {
      pcm = body;
      pcm_len = len;
    }
    pos += 8 + len + (len & 1);
  }
  if (!channels || !pcm || bits != 16) {
    out->error = "missing fmt/data chunk";
    return false;
  }
  const long long frames = (long long)(pcm_len / (2 * channels));
  float* dst = static_cast<float*>(std::malloc(sizeof(float) * channels * frames));
  if (!dst) {
    out->error = "oom";
    return false;
  }
  const int16_t* src = reinterpret_cast<const int16_t*>(pcm);
  constexpr float kScale = 1.0f / 32768.0f;
  for (int c = 0; c < channels; ++c) {
    float* row = dst + (size_t)c * frames;
    for (long long i = 0; i < frames; ++i)
      row[i] = static_cast<float>(src[i * channels + c]) * kScale;
  }
  out->data = dst;
  out->channels = channels;
  out->frames = frames;
  out->sample_rate = rate;
  return true;
}

void pf_worker(Prefetcher* pf) {
  for (;;) {
    const long long i = pf->next_job.fetch_add(1);
    if (i >= (long long)pf->jobs.size()) return;
    {
      // bounded lookahead: don't run ahead of the consumer
      std::unique_lock<std::mutex> lk(pf->mu);
      pf->cv_slot.wait(lk, [&] {
        return pf->stopping || i < pf->next_out + pf->depth;
      });
      if (pf->stopping) return;
    }
    const PfJob& job = pf->jobs[i];
    PfResult res;
    std::vector<uint8_t> buf(job.size);
    FILE* f = std::fopen(job.path.c_str(), "rb");
    if (!f) {
      res.error = "cannot open " + job.path;
    } else {
      if (std::fseek(f, (long)job.offset, SEEK_SET) ||
          std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
        res.error = "short read in " + job.path;
      } else {
        decode_wav(buf, &res);
      }
      std::fclose(f);
    }
    {
      std::lock_guard<std::mutex> lk(pf->mu);
      pf->done.emplace(i, res);
    }
    pf->cv_done.notify_all();
  }
}

void pf_capsule_destructor(PyObject* cap) {
  delete static_cast<Prefetcher*>(
      PyCapsule_GetPointer(cap, "ait_native.prefetcher"));
}

// prefetch_start(jobs: list[(path, offset, size)], workers, depth) -> capsule
PyObject* prefetch_start(PyObject*, PyObject* args) {
  PyObject* jobs_obj;
  int workers, depth;
  if (!PyArg_ParseTuple(args, "Oii", &jobs_obj, &workers, &depth))
    return nullptr;
  auto pf = std::make_unique<Prefetcher>();
  pf->depth = depth > 0 ? depth : 16;
  const Py_ssize_t n = PySequence_Size(jobs_obj);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_GetItem(jobs_obj, i);
    const char* path;
    long long offset, size;
    const int ok = PyArg_ParseTuple(item, "sLL", &path, &offset, &size);
    Py_DECREF(item);
    if (!ok) return nullptr;
    pf->jobs.push_back({path, offset, size});
  }
  const int nthreads = std::max(1, std::min(workers, 64));
  for (int t = 0; t < nthreads; ++t)
    pf->threads.emplace_back(pf_worker, pf.get());
  return PyCapsule_New(pf.release(), "ait_native.prefetcher",
                       pf_capsule_destructor);
}

// prefetch_next(capsule) -> (sample_rate, float32 [C, T]) | None when done
PyObject* prefetch_next(PyObject*, PyObject* args) {
  PyObject* cap;
  if (!PyArg_ParseTuple(args, "O", &cap)) return nullptr;
  auto* pf = static_cast<Prefetcher*>(
      PyCapsule_GetPointer(cap, "ait_native.prefetcher"));
  if (!pf) return nullptr;
  if (pf->next_out >= (long long)pf->jobs.size()) Py_RETURN_NONE;

  PfResult res;
  Py_BEGIN_ALLOW_THREADS {
    std::unique_lock<std::mutex> lk(pf->mu);
    pf->cv_done.wait(lk, [&] { return pf->done.count(pf->next_out) > 0; });
    res = pf->done[pf->next_out];
    pf->done.erase(pf->next_out);
    pf->next_out += 1;
  }
  Py_END_ALLOW_THREADS
  pf->cv_slot.notify_all();

  if (!res.error.empty()) {
    std::free(res.data);
    PyErr_SetString(PyExc_IOError, res.error.c_str());
    return nullptr;
  }
  npy_intp dims[2] = {(npy_intp)res.channels, (npy_intp)res.frames};
  PyObject* arr = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  if (!arr) {
    std::free(res.data);
    return nullptr;
  }
  std::memcpy(PyArray_DATA((PyArrayObject*)arr), res.data,
              sizeof(float) * res.channels * res.frames);
  std::free(res.data);
  return Py_BuildValue("(LN)", res.sample_rate, arr);
}

PyMethodDef kMethods[] = {
    {"prefetch_start", prefetch_start, METH_VARARGS,
     "start a threaded WAV prefetcher over (path, offset, size) jobs"},
    {"prefetch_next", prefetch_next, METH_VARARGS,
     "blocking in-order fetch: (sample_rate, float32 [C,T]) or None"},
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

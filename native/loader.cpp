// Native rig-capture loader for rgbd360_tpu.
//
// Decodes the boost-archive `sphere_images_*.bin` rig format (the layout
// documented in rgbd360_tpu/io/bin_format.py, matching the reference writer
// at include/Frame360.h:333-347 + the cv::Mat framing of
// OpenNI2_Grabber/third_party/cvSerialization/cvmat_serialization.h)
// directly into numpy arrays, and offers a threaded batch decode so host IO
// overlaps TPU compute.  CPython C API only — no pybind11 in this image.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kSensors = 8;
constexpr int kRows = 240;
constexpr int kCols = 320;
constexpr size_t kRgbBytes = size_t(kRows) * kCols * 3;
constexpr size_t kDepthBytes = size_t(kRows) * kCols * 2;
constexpr char kSignature[] = "serialization::archive";
// 8-byte length + 22-byte signature + 7 header bytes + 8 bytes class meta
constexpr size_t kPreamble = 8 + 22 + 7 + 8;

struct MatHeader {
  int32_t cols;
  int32_t rows;
  uint64_t elem_size;
  uint64_t elem_type;
};

struct DecodeResult {
  uint8_t* rgb = nullptr;    // kSensors * kRgbBytes, caller-owned
  uint8_t* depth = nullptr;  // kSensors * kDepthBytes, caller-owned
  uint64_t timestamp = 0;
  std::string error;
};

// Memory-maps a file; returns nullptr on failure.
struct Mapped {
  const uint8_t* data = nullptr;
  size_t size = 0;
  int fd = -1;
  ~Mapped() {
    if (data) munmap((void*)data, size);
    if (fd >= 0) close(fd);
  }
};

bool MapFile(const std::string& path, Mapped* m, std::string* err) {
  m->fd = open(path.c_str(), O_RDONLY);
  if (m->fd < 0) {
    *err = "cannot open " + path;
    return false;
  }
  struct stat st;
  if (fstat(m->fd, &st) != 0) {
    *err = "cannot stat " + path;
    return false;
  }
  m->size = st.st_size;
  void* p = mmap(nullptr, m->size, PROT_READ, MAP_PRIVATE, m->fd, 0);
  if (p == MAP_FAILED) {
    m->data = nullptr;
    *err = "cannot mmap " + path;
    return false;
  }
  m->data = (const uint8_t*)p;
  return true;
}

void DecodeOne(const std::string& path, DecodeResult* res) {
  Mapped map;
  if (!MapFile(path, &map, &res->error)) return;
  const uint8_t* base = map.data;
  struct BufView {
    const uint8_t* p;
    size_t n;
    const uint8_t* data() const { return p; }
    size_t size() const { return n; }
  } buf{base, map.size};
  if (buf.size() < kPreamble + 24 ||
      memcmp(buf.data() + 8, kSignature, sizeof(kSignature) - 1) != 0) {
    res->error = path + ": not a boost serialization archive";
    return;
  }
  size_t off = kPreamble;
  for (int s = 0; s < kSensors; ++s) {
    MatHeader h;
    if (off + sizeof(h) > buf.size()) {
      res->error = path + ": truncated (rgb header)";
      return;
    }
    memcpy(&h, buf.data() + off, sizeof(h));
    off += sizeof(h);
    if (h.cols != kCols || h.rows != kRows || h.elem_size != 3) {
      res->error = path + ": unexpected rgb mat layout";
      return;
    }
    if (off + kRgbBytes > buf.size()) {
      res->error = path + ": truncated (rgb data)";
      return;
    }
    memcpy(res->rgb + size_t(s) * kRgbBytes, buf.data() + off, kRgbBytes);
    off += kRgbBytes;

    if (off + sizeof(h) > buf.size()) {
      res->error = path + ": truncated (depth header)";
      return;
    }
    memcpy(&h, buf.data() + off, sizeof(h));
    off += sizeof(h);
    if (h.cols != kCols || h.rows != kRows || h.elem_size != 2) {
      res->error = path + ": unexpected depth mat layout";
      return;
    }
    if (off + kDepthBytes > buf.size()) {
      res->error = path + ": truncated (depth data)";
      return;
    }
    memcpy(res->depth + size_t(s) * kDepthBytes, buf.data() + off,
           kDepthBytes);
    off += kDepthBytes;
  }
  // trailing timestamp mat (may be empty)
  if (off + 24 <= buf.size()) {
    MatHeader h;
    memcpy(&h, buf.data() + off, sizeof(h));
    off += sizeof(h);
    size_t n = size_t(h.cols) * h.rows * h.elem_size;
    if (n == 8 && off + 8 <= buf.size()) {
      memcpy(&res->timestamp, buf.data() + off, 8);
    }
  }
}

// Allocates the numpy output buffers (must hold the GIL).
bool AllocArrays(PyObject** rgb, PyObject** depth, DecodeResult* res) {
  npy_intp rgb_dims[4] = {kSensors, kRows, kCols, 3};
  npy_intp d_dims[3] = {kSensors, kRows, kCols};
  *rgb = PyArray_SimpleNew(4, rgb_dims, NPY_UINT8);
  *depth = PyArray_SimpleNew(3, d_dims, NPY_UINT16);
  if (!*rgb || !*depth) {
    Py_XDECREF(*rgb);
    Py_XDECREF(*depth);
    return false;
  }
  res->rgb = (uint8_t*)PyArray_DATA((PyArrayObject*)*rgb);
  res->depth = (uint8_t*)PyArray_DATA((PyArrayObject*)*depth);
  return true;
}

PyObject* FinishTuple(PyObject* rgb, PyObject* depth, DecodeResult& res) {
  if (!res.error.empty()) {
    Py_DECREF(rgb);
    Py_DECREF(depth);
    PyErr_SetString(PyExc_ValueError, res.error.c_str());
    return nullptr;
  }
  return Py_BuildValue("(NNK)", rgb, depth, (unsigned long long)res.timestamp);
}

PyObject* ReadRigFrame(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  DecodeResult res;
  PyObject *rgb, *depth;
  if (!AllocArrays(&rgb, &depth, &res)) return nullptr;
  Py_BEGIN_ALLOW_THREADS;
  DecodeOne(path, &res);
  Py_END_ALLOW_THREADS;
  return FinishTuple(rgb, depth, res);
}

PyObject* ReadRigFrameBatch(PyObject*, PyObject* args) {
  PyObject* list;
  int n_threads = 4;
  if (!PyArg_ParseTuple(args, "O|i", &list, &n_threads)) return nullptr;
  std::vector<std::string> paths;
  PyObject* seq = PySequence_Fast(list, "expected a sequence of paths");
  if (!seq) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
    const char* p = PyUnicode_AsUTF8(item);
    if (!p) {
      Py_DECREF(seq);
      return nullptr;
    }
    paths.emplace_back(p);
  }
  Py_DECREF(seq);

  std::vector<DecodeResult> results(paths.size());
  std::vector<PyObject*> rgbs(paths.size()), depths(paths.size());
  for (size_t i = 0; i < paths.size(); ++i) {
    if (!AllocArrays(&rgbs[i], &depths[i], &results[i])) {
      for (size_t k = 0; k < i; ++k) {
        Py_DECREF(rgbs[k]);
        Py_DECREF(depths[k]);
      }
      return nullptr;
    }
  }
  Py_BEGIN_ALLOW_THREADS;
  {
    std::vector<std::thread> pool;
    std::atomic<size_t> next{0};
    int workers = std::max(1, std::min<int>(n_threads, (int)paths.size()));
    for (int t = 0; t < workers; ++t) {
      pool.emplace_back([&]() {
        for (size_t i = next++; i < paths.size(); i = next++) {
          DecodeOne(paths[i], &results[i]);
        }
      });
    }
    for (auto& th : pool) th.join();
  }
  Py_END_ALLOW_THREADS;

  PyObject* out = PyList_New(results.size());
  if (!out) return nullptr;
  for (size_t i = 0; i < results.size(); ++i) {
    PyObject* tup = FinishTuple(rgbs[i], depths[i], results[i]);
    if (!tup) {
      for (size_t k = i + 1; k < results.size(); ++k) {
        Py_DECREF(rgbs[k]);
        Py_DECREF(depths[k]);
      }
      Py_DECREF(out);
      return nullptr;
    }
    PyList_SET_ITEM(out, i, tup);
  }
  return out;
}

PyMethodDef kMethods[] = {
    {"read_rig_frame", ReadRigFrame, METH_VARARGS,
     "read_rig_frame(path) -> (rgb u8 (8,240,320,3), depth u16 (8,240,320), "
     "timestamp)"},
    {"read_rig_frame_batch", ReadRigFrameBatch, METH_VARARGS,
     "read_rig_frame_batch(paths, n_threads=4) -> list of tuples"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_native_loader",
                       "native rig capture decoder", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__native_loader(void) {
  import_array();
  return PyModule_Create(&kModule);
}

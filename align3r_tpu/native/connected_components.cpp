// Connected components (8-connectivity) on binary masks — union-find.
//
// TPU-native replacement for the reference's CUDA connected-components op
// (/root/reference/third_party/sam2/sam2/csrc/connected_components.cu),
// which SAM2 uses to fill small holes / drop small islands in video masks.
// On TPU systems this postprocessing belongs on the host: batched masks are
// small (H*W bytes) and the union-find pass is memory-bound; a SIMD-friendly
// two-pass labelling in C++ beats shipping the mask to the accelerator.
//
// Exposed via the CPython C API (no pybind11 in this image):
//   labels, counts = _cc.label(mask_u8_2d)        -> int32 labels, int64 counts
//   out = _cc.remove_small_regions(mask_u8_2d, area_thr, mode)
//     mode 0: drop islands  (<area_thr of foreground removed)
//     mode 1: fill holes    (<area_thr of background filled)

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a;
    else parent[a] = b;
  }
};

// Two-pass 8-connectivity labelling of value==target pixels.
// labels: 0 = not-target, 1..n = component ids. Returns component count.
int label_mask(const uint8_t* mask, int H, int W, uint8_t target,
               int32_t* labels, std::vector<int64_t>* areas) {
  const size_t N = static_cast<size_t>(H) * W;
  UnionFind uf(N);
  std::memset(labels, 0, N * sizeof(int32_t));

  // pass 1: provisional labels = own index; union with prior neighbours
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      const size_t i = static_cast<size_t>(y) * W + x;
      if (mask[i] != target) continue;
      if (x > 0 && mask[i - 1] == target) uf.unite((int32_t)i, (int32_t)(i - 1));
      if (y > 0) {
        const size_t up = i - W;
        if (mask[up] == target) uf.unite((int32_t)i, (int32_t)up);
        if (x > 0 && mask[up - 1] == target) uf.unite((int32_t)i, (int32_t)(up - 1));
        if (x + 1 < W && mask[up + 1] == target) uf.unite((int32_t)i, (int32_t)(up + 1));
      }
    }
  }
  // pass 2: compact root ids to 1..n, accumulate areas
  std::vector<int32_t> remap(N, 0);
  int next_id = 0;
  for (size_t i = 0; i < N; ++i) {
    if (mask[i] != target) continue;
    int32_t r = uf.find((int32_t)i);
    if (remap[r] == 0) remap[r] = ++next_id;
    labels[i] = remap[r];
  }
  areas->assign(next_id + 1, 0);
  for (size_t i = 0; i < N; ++i)
    if (labels[i]) (*areas)[labels[i]]++;
  return next_id;
}

bool get_mask_2d(PyObject* obj, Py_buffer* view) {
  if (PyObject_GetBuffer(obj, view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0)
    return false;
  if (view->ndim != 2 || view->itemsize != 1) {
    PyBuffer_Release(view);
    PyErr_SetString(PyExc_ValueError, "expected a 2-D uint8 C-contiguous mask");
    return false;
  }
  return true;
}

PyObject* py_label(PyObject*, PyObject* args) {
  PyObject* mask_obj;
  if (!PyArg_ParseTuple(args, "O", &mask_obj)) return nullptr;
  Py_buffer view;
  if (!get_mask_2d(mask_obj, &view)) return nullptr;
  const int H = (int)view.shape[0], W = (int)view.shape[1];

  PyObject* labels_bytes = PyBytes_FromStringAndSize(nullptr,
      (Py_ssize_t)H * W * sizeof(int32_t));
  if (!labels_bytes) { PyBuffer_Release(&view); return nullptr; }
  int32_t* labels = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(labels_bytes));

  std::vector<int64_t> areas;
  int n;
  Py_BEGIN_ALLOW_THREADS
  n = label_mask(static_cast<const uint8_t*>(view.buf), H, W, 1, labels, &areas);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);

  PyObject* areas_list = PyList_New(n + 1);
  for (int k = 0; k <= n; ++k)
    PyList_SET_ITEM(areas_list, k, PyLong_FromLongLong(areas[k]));
  PyObject* out = Py_BuildValue("(NiN)", labels_bytes, n, areas_list);
  return out;
}

PyObject* py_remove_small_regions(PyObject*, PyObject* args) {
  PyObject* mask_obj;
  long area_thr;
  int mode;  // 0 = drop small islands, 1 = fill small holes
  if (!PyArg_ParseTuple(args, "Oli", &mask_obj, &area_thr, &mode)) return nullptr;
  Py_buffer view;
  if (!get_mask_2d(mask_obj, &view)) return nullptr;
  const int H = (int)view.shape[0], W = (int)view.shape[1];
  const size_t N = (size_t)H * W;
  const uint8_t* mask = static_cast<const uint8_t*>(view.buf);

  PyObject* out_bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(mask), (Py_ssize_t)N);
  if (!out_bytes) { PyBuffer_Release(&view); return nullptr; }
  uint8_t* out = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out_bytes));

  Py_BEGIN_ALLOW_THREADS
  {
    std::vector<int32_t> labels(N);
    std::vector<int64_t> areas;
    const uint8_t target = mode == 0 ? 1 : 0;
    label_mask(mask, H, W, target, labels.data(), &areas);
    const uint8_t fill = mode == 0 ? 0 : 1;
    for (size_t i = 0; i < N; ++i)
      if (labels[i] && areas[labels[i]] < area_thr) out[i] = fill;
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return out_bytes;
}

PyMethodDef methods[] = {
    {"label", py_label, METH_VARARGS,
     "label(mask_u8) -> (labels_bytes_int32, n_components, areas)"},
    {"remove_small_regions", py_remove_small_regions, METH_VARARGS,
     "remove_small_regions(mask_u8, area_thr, mode) -> mask_bytes"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_cc",
                         "connected components (union-find, 8-conn)", -1,
                         methods};

}  // namespace

PyMODINIT_FUNC PyInit__cc(void) { return PyModule_Create(&moduledef); }

// Native BVH builder + PNG unfilter helpers for rtf_tpu.
//
// The hot host-side precomputes that the reference does in C++
// (cy::BVH::Build over triangle AABBs, cyBVH.h:122-142; lodepng's
// scanline unfiltering) are reimplemented here and exposed through a
// plain C ABI consumed via ctypes (rtf_tpu/native/binding.py).  The
// Python builder in rtf_tpu/ops/bvh.py is the reference implementation;
// this one must produce an equivalent tree (same splitting rule:
// widest-axis mean split, fallback to the other axes, then arbitrary
// halving; children adjacent; root at node 1).
//
// Build: make -C rtf_tpu/native        (produces librtf_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

struct Builder {
  const float* bmin;   // [n,3] element bounds
  const float* bmax;
  std::vector<double> cx, cy, cz;   // element centers (double keys)
  std::vector<int32_t> elems;
  int max_elems;

  // output arrays (node 0 unused)
  std::vector<float> node_min, node_max;
  std::vector<int32_t> node_child, node_eoff, node_ecnt;

  double center(int32_t e, int axis) const {
    return axis == 0 ? cx[e] : (axis == 1 ? cy[e] : cz[e]);
  }

  void bounds_of(int32_t lo, int32_t hi, float out_min[3],
                 float out_max[3]) const {
    out_min[0] = out_min[1] = out_min[2] = 3.0e38f;
    out_max[0] = out_max[1] = out_max[2] = -3.0e38f;
    for (int32_t i = lo; i < hi; i++) {
      const int32_t e = elems[i];
      for (int a = 0; a < 3; a++) {
        out_min[a] = std::min(out_min[a], bmin[3 * e + a]);
        out_max[a] = std::max(out_max[a], bmax[3 * e + a]);
      }
    }
  }

  // MeanSplit semantics (cyBVH.h:295-328): try widest axis, then the
  // remaining two by extent; stable partition by center <= midpoint.
  int32_t find_split(int32_t lo, int32_t hi, const float bmin_[3],
                     const float bmax_[3]) {
    const int32_t cnt = hi - lo;
    if (cnt <= max_elems) return 0;
    float d[3] = {bmax_[0] - bmin_[0], bmax_[1] - bmin_[1],
                  bmax_[2] - bmin_[2]};
    int order[3];
    order[0] = d[0] >= d[1] ? (d[0] >= d[2] ? 0 : 2) : (d[1] >= d[2] ? 1 : 2);
    order[1] = (order[0] + 1) % 3;
    order[2] = (order[0] + 2) % 3;
    if (d[order[1]] < d[order[2]]) std::swap(order[1], order[2]);

    for (int s = 0; s < 3; s++) {
      const int axis = order[s];
      const double split = 0.5 * ((double)bmin_[axis] + (double)bmax_[axis]);
      auto* b = elems.data() + lo;
      int32_t i = (int32_t)(std::stable_partition(
                      b, b + cnt,
                      [&](int32_t e) { return center(e, axis) <= split; }) -
                  b);
      if (i > 0 && i < cnt) return i;
    }
    return 0;
  }

  // iterative build with an explicit stack (the reference recurses)
  struct Task {
    int32_t lo, hi;
    int32_t node_id;
    float bmin_[3], bmax_[3];
  };

  int32_t alloc_node() {
    node_min.insert(node_min.end(), 3, 0.f);
    node_max.insert(node_max.end(), 3, 0.f);
    node_child.push_back(-1);
    node_eoff.push_back(0);
    node_ecnt.push_back(0);
    return (int32_t)node_child.size() - 1;
  }

  void build(int32_t n) {
    elems.resize(n);
    for (int32_t i = 0; i < n; i++) elems[i] = i;
    alloc_node();                 // dummy node 0
    int32_t root = alloc_node();  // root = 1

    std::vector<Task> stack;
    Task t0;
    t0.lo = 0;
    t0.hi = n;
    t0.node_id = root;
    bounds_of(0, n, t0.bmin_, t0.bmax_);
    stack.push_back(t0);

    while (!stack.empty()) {
      Task t = stack.back();
      stack.pop_back();
      std::memcpy(&node_min[3 * t.node_id], t.bmin_, 12);
      std::memcpy(&node_max[3 * t.node_id], t.bmax_, 12);
      int32_t cnt = t.hi - t.lo;
      int32_t i = find_split(t.lo, t.hi, t.bmin_, t.bmax_);
      if (i == 0 || i >= cnt) {
        if (cnt > 8) {
          i = cnt / 2;  // forced halving (cyBVH.h:130-137)
        } else {
          node_child[t.node_id] = -1;
          node_eoff[t.node_id] = t.lo;
          node_ecnt[t.node_id] = cnt;
          continue;
        }
      }
      int32_t c1 = alloc_node();
      int32_t c2 = alloc_node();
      node_child[t.node_id] = c1;
      Task l, r;
      l.lo = t.lo;
      l.hi = t.lo + i;
      l.node_id = c1;
      bounds_of(l.lo, l.hi, l.bmin_, l.bmax_);
      r.lo = t.lo + i;
      r.hi = t.hi;
      r.node_id = c2;
      bounds_of(r.lo, r.hi, r.bmin_, r.bmax_);
      // push right first so left is processed next (DFS order like
      // ConvertTempData, keeping children adjacent: c2 == c1 + 1)
      stack.push_back(r);
      stack.push_back(l);
    }
  }
};

}  // namespace

extern "C" {

// Build a BVH over n element AABBs.
// In:  bmin/bmax [n*3], centers [n*3] (float64), max_elems.
// Out: returns node count (incl. dummy node 0); caller then calls
//      rtf_bvh_read to copy the arrays and rtf_bvh_free to release.
static thread_local Builder* g_builder = nullptr;

int32_t rtf_bvh_build(const float* bmin, const float* bmax,
                      const double* centers, int32_t n, int32_t max_elems) {
  delete g_builder;
  g_builder = new Builder();
  g_builder->bmin = bmin;
  g_builder->bmax = bmax;
  g_builder->max_elems = max_elems;
  g_builder->cx.resize(n);
  g_builder->cy.resize(n);
  g_builder->cz.resize(n);
  for (int32_t i = 0; i < n; i++) {
    g_builder->cx[i] = centers[3 * i];
    g_builder->cy[i] = centers[3 * i + 1];
    g_builder->cz[i] = centers[3 * i + 2];
  }
  g_builder->build(n);
  return (int32_t)g_builder->node_child.size();
}

void rtf_bvh_read(float* node_min, float* node_max, int32_t* child,
                  int32_t* eoff, int32_t* ecnt, int32_t* elems) {
  if (!g_builder) return;
  const Builder& b = *g_builder;
  std::memcpy(node_min, b.node_min.data(), b.node_min.size() * 4);
  std::memcpy(node_max, b.node_max.data(), b.node_max.size() * 4);
  std::memcpy(child, b.node_child.data(), b.node_child.size() * 4);
  std::memcpy(eoff, b.node_eoff.data(), b.node_eoff.size() * 4);
  std::memcpy(ecnt, b.node_ecnt.data(), b.node_ecnt.size() * 4);
  std::memcpy(elems, b.elems.data(), b.elems.size() * 4);
}

void rtf_bvh_free() {
  delete g_builder;
  g_builder = nullptr;
}

// PNG scanline unfilter (filters 0-4) for the pure-Python decoder:
// data [h, stride+1] raw (filter byte + scanline), out [h, stride].
void rtf_png_unfilter(const uint8_t* raw, uint8_t* out, int32_t h,
                      int32_t stride, int32_t bpp) {
  const uint8_t* prev = nullptr;
  for (int32_t y = 0; y < h; y++) {
    const uint8_t f = raw[(size_t)y * (stride + 1)];
    const uint8_t* in = raw + (size_t)y * (stride + 1) + 1;
    uint8_t* o = out + (size_t)y * stride;
    switch (f) {
      case 0:
        std::memcpy(o, in, stride);
        break;
      case 1:
        for (int32_t x = 0; x < stride; x++)
          o[x] = in[x] + (x >= bpp ? o[x - bpp] : 0);
        break;
      case 2:
        for (int32_t x = 0; x < stride; x++)
          o[x] = in[x] + (prev ? prev[x] : 0);
        break;
      case 3:
        for (int32_t x = 0; x < stride; x++) {
          const int a = x >= bpp ? o[x - bpp] : 0;
          const int b = prev ? prev[x] : 0;
          o[x] = in[x] + (uint8_t)((a + b) >> 1);
        }
        break;
      case 4:
        for (int32_t x = 0; x < stride; x++) {
          const int a = x >= bpp ? o[x - bpp] : 0;
          const int b = prev ? prev[x] : 0;
          const int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
          const int p = a + b - c;
          const int pa = std::abs(p - a), pb = std::abs(p - b),
                    pc = std::abs(p - c);
          const int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          o[x] = in[x] + (uint8_t)pred;
        }
        break;
    }
    prev = o;
  }
}

}  // extern "C"

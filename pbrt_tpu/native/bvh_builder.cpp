// Native SAH BVH builder.
//
// TPU-native framework's C++ runtime component replacing the role of
// accelerators/bvh.cpp's recursiveBuild + flattenBVHTree (reference
// /root/reference/src/accelerators/bvh.cpp:203-260): the build itself is a
// host-side cold path, but for 10^5-10^6 triangle scenes a Python builder
// is minutes while this is milliseconds. Emits the flattened depth-first
// LinearBVHNode SoA layout consumed by the JAX/Pallas traversal
// (pbrt_tpu/scene/bvh.py).
//
// Build: g++ -O2 -shared -fPIC -o libpbrt_native.so bvh_builder.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kNumBuckets = 12;

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
inline float surface_area(const Vec3 &lo, const Vec3 &hi) {
  float dx = hi.x - lo.x, dy = hi.y - lo.y, dz = hi.z - lo.z;
  return 2.0f * (dx * dy + dy * dz + dz * dx);
}
inline float axis_of(const Vec3 &v, int ax) {
  return ax == 0 ? v.x : (ax == 1 ? v.y : v.z);
}

struct Builder {
  const Vec3 *lo;
  const Vec3 *hi;
  std::vector<Vec3> cent;
  std::vector<int> order;
  int leaf_max;

  std::vector<Vec3> node_lo, node_hi;
  std::vector<int> node_right, node_count, node_axis;

  int make_node(const Vec3 &blo, const Vec3 &bhi, int right, int count,
                int axis) {
    node_lo.push_back(blo);
    node_hi.push_back(bhi);
    node_right.push_back(right);
    node_count.push_back(count);
    node_axis.push_back(axis);
    return (int)node_lo.size() - 1;
  }

  // Iterative build with explicit stack (depth-first so that the first
  // child is node+1, matching the flattened traversal layout).
  void build(int n) {
    struct Task {
      int start, end, parent;
      bool second;
    };
    std::vector<Task> stack;
    stack.push_back({0, n, -1, false});

    while (!stack.empty()) {
      Task t = stack.back();
      stack.pop_back();
      // bounds of range
      Vec3 blo = {1e30f, 1e30f, 1e30f}, bhi = {-1e30f, -1e30f, -1e30f};
      Vec3 clo = blo, chi = bhi;
      for (int k = t.start; k < t.end; ++k) {
        int i = order[k];
        blo = vmin(blo, lo[i]);
        bhi = vmax(bhi, hi[i]);
        clo = vmin(clo, cent[i]);
        chi = vmax(chi, cent[i]);
      }
      int my_idx = (int)node_lo.size();
      if (t.second && t.parent >= 0) node_right[t.parent] = my_idx;
      int count = t.end - t.start;
      if (count <= leaf_max) {
        make_node(blo, bhi, t.start, count, 0);
        continue;
      }
      // split dimension = largest centroid extent
      float ex = chi.x - clo.x, ey = chi.y - clo.y, ez = chi.z - clo.z;
      int dim = (ex > ey && ex > ez) ? 0 : (ey > ez ? 1 : 2);
      float cmin = axis_of(clo, dim), cmax = axis_of(chi, dim);
      if (cmax - cmin < 1e-12f) {
        make_node(blo, bhi, t.start, count, 0);
        continue;
      }
      // binned SAH
      struct Bucket {
        int n = 0;
        Vec3 lo = {1e30f, 1e30f, 1e30f};
        Vec3 hi = {-1e30f, -1e30f, -1e30f};
      } buckets[kNumBuckets];
      float inv_extent = kNumBuckets / (cmax - cmin);
      for (int k = t.start; k < t.end; ++k) {
        int i = order[k];
        int b = std::min(kNumBuckets - 1,
                         (int)((axis_of(cent[i], dim) - cmin) * inv_extent));
        buckets[b].n++;
        buckets[b].lo = vmin(buckets[b].lo, lo[i]);
        buckets[b].hi = vmax(buckets[b].hi, hi[i]);
      }
      float best_cost = 1e30f;
      int best_split = -1;
      for (int s = 0; s < kNumBuckets - 1; ++s) {
        Vec3 llo = {1e30f, 1e30f, 1e30f}, lhi = {-1e30f, -1e30f, -1e30f};
        Vec3 rlo = llo, rhi = lhi;
        int nl = 0, nr = 0;
        for (int b = 0; b <= s; ++b) {
          if (!buckets[b].n) continue;
          nl += buckets[b].n;
          llo = vmin(llo, buckets[b].lo);
          lhi = vmax(lhi, buckets[b].hi);
        }
        for (int b = s + 1; b < kNumBuckets; ++b) {
          if (!buckets[b].n) continue;
          nr += buckets[b].n;
          rlo = vmin(rlo, buckets[b].lo);
          rhi = vmax(rhi, buckets[b].hi);
        }
        if (!nl || !nr) continue;
        float cost = nl * surface_area(llo, lhi) + nr * surface_area(rlo, rhi);
        if (cost < best_cost) {
          best_cost = cost;
          best_split = s;
        }
      }
      int mid;
      if (best_split < 0) {
        mid = t.start + count / 2;
        std::nth_element(order.begin() + t.start, order.begin() + mid,
                         order.begin() + t.end, [&](int a, int b) {
                           return axis_of(cent[a], dim) <
                                  axis_of(cent[b], dim);
                         });
      } else {
        auto it = std::partition(
            order.begin() + t.start, order.begin() + t.end, [&](int i) {
              int b = std::min(kNumBuckets - 1,
                               (int)((axis_of(cent[i], dim) - cmin) *
                                     inv_extent));
              return b <= best_split;
            });
        mid = (int)(it - order.begin());
        if (mid == t.start || mid == t.end) mid = t.start + count / 2;
      }
      make_node(blo, bhi, -1, 0, dim);
      // push right first; left is processed next → left child = my_idx+1
      stack.push_back({mid, t.end, my_idx, true});
      stack.push_back({t.start, mid, my_idx, false});
    }
  }
};

}  // namespace

extern "C" {

// Returns number of nodes written; output arrays must have capacity 2n.
int bvh_build_sah(const float *lo, const float *hi, int n_prims,
                  int leaf_max, float *out_node_lo, float *out_node_hi,
                  int *out_right, int *out_count, int *out_axis,
                  int *out_prim_order) {
  Builder b;
  b.lo = reinterpret_cast<const Vec3 *>(lo);
  b.hi = reinterpret_cast<const Vec3 *>(hi);
  b.leaf_max = leaf_max;
  b.cent.resize(n_prims);
  b.order.resize(n_prims);
  for (int i = 0; i < n_prims; ++i) {
    b.cent[i] = {0.5f * (b.lo[i].x + b.hi[i].x),
                 0.5f * (b.lo[i].y + b.hi[i].y),
                 0.5f * (b.lo[i].z + b.hi[i].z)};
    b.order[i] = i;
  }
  b.build(n_prims);
  int nn = (int)b.node_lo.size();
  std::memcpy(out_node_lo, b.node_lo.data(), nn * sizeof(Vec3));
  std::memcpy(out_node_hi, b.node_hi.data(), nn * sizeof(Vec3));
  std::memcpy(out_right, b.node_right.data(), nn * sizeof(int));
  std::memcpy(out_count, b.node_count.data(), nn * sizeof(int));
  std::memcpy(out_axis, b.node_axis.data(), nn * sizeof(int));
  std::memcpy(out_prim_order, b.order.data(), n_prims * sizeof(int));
  return nn;
}
}

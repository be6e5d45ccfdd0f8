// Host-side binned-SAH BVH builder (C++17, no dependencies).
//
// The quality-builder counterpart to the on-device LBVH (ops/lbvh.py):
// top-down recursive binned SAH in the spirit of the reference's
// binned_sah_builder (visionaray detail/bvh/sah.h:150-763 — 16 bins,
// centroid-bounds axis selection, sweep cost, leaf-if-cheaper) —
// re-implemented from scratch against this repo's flat SoA node layout:
//
//   nodes [0, n-1)      internal; left/right child indices
//   nodes [n-1, 2n-1)   leaves; leaf slot s owns primitive prim_ids[s]
//
// Leaves hold exactly one primitive so the emitted tree is drop-in
// compatible with ops/traversal.py and the Pallas cluster builder.
// Exposed via a C ABI for ctypes (ops/sah.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr int kNumBins = 16;

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(Vec3 a, Vec3 b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(Vec3 a, Vec3 b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Box {
  Vec3 lo{3.4e38f, 3.4e38f, 3.4e38f};
  Vec3 hi{-3.4e38f, -3.4e38f, -3.4e38f};
  void insert(const Box& o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void insert(const Vec3& p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float half_area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Builder {
  const float* prim_lo;
  const float* prim_hi;
  int n;
  float* node_lo;
  float* node_hi;
  int32_t* left;
  int32_t* right;
  int32_t* parent;
  int32_t* prim_ids;
  std::vector<int32_t> order;     // current primitive permutation
  std::vector<Vec3> centroid;
  int next_internal = 0;
  int next_leaf = 0;

  Box prim_box(int p) const {
    Box b;
    b.lo = {prim_lo[3 * p], prim_lo[3 * p + 1], prim_lo[3 * p + 2]};
    b.hi = {prim_hi[3 * p], prim_hi[3 * p + 1], prim_hi[3 * p + 2]};
    return b;
  }

  void write_node(int id, const Box& b) {
    node_lo[3 * id] = b.lo.x;
    node_lo[3 * id + 1] = b.lo.y;
    node_lo[3 * id + 2] = b.lo.z;
    node_hi[3 * id] = b.hi.x;
    node_hi[3 * id + 1] = b.hi.y;
    node_hi[3 * id + 2] = b.hi.z;
  }

  // Build subtree over order[first, first+count); returns the node id.
  int build(int first, int count, const Box& bounds) {
    if (count == 1) {
      int slot = next_leaf++;
      int id = (n - 1) + slot;
      prim_ids[slot] = order[first];
      write_node(id, bounds);
      return id;
    }
    int id = next_internal++;
    write_node(id, bounds);

    // centroid bounds -> split axis (sah.h:694-699 behavior)
    Box cb;
    for (int i = first; i < first + count; ++i) cb.insert(centroid[order[i]]);
    float ext[3] = {cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};
    int axis = 0;
    if (ext[1] > ext[0]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;

    int mid;
    if (ext[axis] <= 1e-12f) {
      mid = first + count / 2;  // degenerate: median split
    } else {
      // binned SAH sweep (sah.h:308-367 behavior: bin, prefix costs)
      float clo = axis == 0 ? cb.lo.x : axis == 1 ? cb.lo.y : cb.lo.z;
      float scale = kNumBins / ext[axis];
      Box bin_box[kNumBins];
      int bin_cnt[kNumBins] = {0};
      auto bin_of = [&](int p) {
        float c = axis == 0 ? centroid[p].x
                 : axis == 1 ? centroid[p].y
                             : centroid[p].z;
        int b = static_cast<int>((c - clo) * scale);
        return std::min(std::max(b, 0), kNumBins - 1);
      };
      for (int i = first; i < first + count; ++i) {
        int p = order[i];
        int b = bin_of(p);
        bin_cnt[b]++;
        bin_box[b].insert(prim_box(p));
      }
      // sweep: cost(i) = A_left*N_left + A_right*N_right
      Box right_acc[kNumBins];
      Box acc;
      for (int b = kNumBins - 1; b >= 1; --b) {
        acc.insert(bin_box[b]);
        right_acc[b] = acc;
      }
      float best_cost = 3.4e38f;
      int best_split = -1;
      Box lacc;
      int lcnt = 0;
      for (int b = 0; b < kNumBins - 1; ++b) {
        lacc.insert(bin_box[b]);
        lcnt += bin_cnt[b];
        int rcnt = count - lcnt;
        if (lcnt == 0 || rcnt == 0) continue;
        float cost = lacc.half_area() * lcnt + right_acc[b + 1].half_area() * rcnt;
        if (cost < best_cost) {
          best_cost = cost;
          best_split = b;
        }
      }
      if (best_split < 0) {
        mid = first + count / 2;
      } else {
        auto it = std::partition(
            order.begin() + first, order.begin() + first + count,
            [&](int p) { return bin_of(p) <= best_split; });
        mid = static_cast<int>(it - order.begin());
        if (mid == first || mid == first + count) mid = first + count / 2;
      }
    }

    Box lb, rb;
    for (int i = first; i < mid; ++i) lb.insert(prim_box(order[i]));
    for (int i = mid; i < first + count; ++i) rb.insert(prim_box(order[i]));
    int l = build(first, mid - first, lb);
    int r = build(mid, first + count - mid, rb);
    left[id] = l;
    right[id] = r;
    parent[l] = id;
    parent[r] = id;
    return id;
  }
};

}  // namespace

extern "C" {

// Arrays must be preallocated by the caller:
//   node_lo/node_hi: (2n-1)*3 floats; left/right: (n-1) ints;
//   parent: (2n-1) ints; prim_ids: n ints.
// Returns 0 on success.
int vsnray_tpu_build_sah(const float* prim_lo, const float* prim_hi, int n,
                         float* node_lo, float* node_hi, int32_t* left,
                         int32_t* right, int32_t* parent, int32_t* prim_ids) {
  if (n <= 0) return 1;
  Builder b;
  b.prim_lo = prim_lo;
  b.prim_hi = prim_hi;
  b.n = n;
  b.node_lo = node_lo;
  b.node_hi = node_hi;
  b.left = left;
  b.right = right;
  b.parent = parent;
  b.prim_ids = prim_ids;
  b.order.resize(n);
  std::iota(b.order.begin(), b.order.end(), 0);
  b.centroid.resize(n);
  Box root;
  for (int p = 0; p < n; ++p) {
    Box pb = b.prim_box(p);
    b.centroid[p] = {0.5f * (pb.lo.x + pb.hi.x), 0.5f * (pb.lo.y + pb.hi.y),
                     0.5f * (pb.lo.z + pb.hi.z)};
    root.insert(pb);
  }
  for (int i = 0; i < 2 * n - 1; ++i) parent[i] = -1;
  if (n == 1) {
    b.next_leaf = 0;
    prim_ids[0] = 0;
    b.write_node(0, root);
    return 0;
  }
  b.build(0, n, root);
  return 0;
}

}  // extern "C"

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

// ---------------------------------------------------------------------------
// SBVH: binned SAH with SPATIAL SPLITS and multi-primitive leaves.
//
// The full-quality builder in the spirit of the reference's
// binned_sah_builder with use_spatial_splits=true (visionaray
// detail/bvh/sah.h:430-615: spatial bins, triangle chopping, duplication
// of straddling references; gate sah.h:651: only try a spatial split when
// the object split's child overlap is large relative to the root area)
// and max_leaf_size leaves (detail/bvh/build.inl:139) — written from
// scratch against this repo's generalized flat layout:
//
//   internal nodes [0, L-1); leaves [L-1, 2L-1); leaf slot s covers
//   prim_refs[leaf_first[s] .. leaf_first[s]+leaf_count[s]).
//
// References may appear in several leaves (spatial duplication), with the
// leaf box covering only the clipped part of the triangle.

namespace sbvh {

constexpr int kBins = 16;

struct Ref {
  int prim;
  Box box;
};

struct TmpNode {
  Box box;
  int left = -1, right = -1;       // TmpNode indices; -1 -> leaf
  int first = 0, count = 0;        // into prim_refs (leaves)
};

struct SBuilder {
  const float *v1, *e1, *e2;
  float alpha_area;                // spatial-split gate: overlap > this
  int max_leaf;
  std::vector<TmpNode> nodes;
  std::vector<int32_t> refs_out;   // prim ids, leaf order
  std::vector<Box> leaf_ref_boxes; // parallel to refs_out (unused output,
                                   // kept for debugging/statistics)

  Vec3 vert(int p, int corner) const {
    Vec3 a{v1[3 * p], v1[3 * p + 1], v1[3 * p + 2]};
    if (corner == 0) return a;
    if (corner == 1)
      return {a.x + e1[3 * p], a.y + e1[3 * p + 1], a.z + e1[3 * p + 2]};
    return {a.x + e2[3 * p], a.y + e2[3 * p + 1], a.z + e2[3 * p + 2]};
  }

  // Box of the triangle clipped to slab lo <= x_axis <= hi, then clamped
  // to `within` (the ref's current box, itself possibly already clipped).
  // Sutherland-Hodgman on the triangle polygon, one axis at a time.
  Box clip_tri(int p, int axis, float lo, float hi, const Box& within) const {
    Vec3 poly[8];
    int cnt = 3;
    for (int i = 0; i < 3; ++i) poly[i] = vert(p, i);
    auto comp = [&](const Vec3& v) {
      return axis == 0 ? v.x : axis == 1 ? v.y : v.z;
    };
    auto clip_half = [&](float plane, bool keep_below) {
      Vec3 out[8];
      int m = 0;
      for (int i = 0; i < cnt; ++i) {
        const Vec3& a = poly[i];
        const Vec3& b = poly[(i + 1) % cnt];
        float ca = comp(a), cb = comp(b);
        bool ina = keep_below ? (ca <= plane) : (ca >= plane);
        bool inb = keep_below ? (cb <= plane) : (cb >= plane);
        if (ina) out[m++] = a;
        if (ina != inb) {
          float t = (plane - ca) / (cb - ca);
          out[m++] = {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y),
                      a.z + t * (b.z - a.z)};
        }
      }
      cnt = m;
      for (int i = 0; i < m; ++i) poly[i] = out[i];
    };
    clip_half(hi, true);
    if (cnt) clip_half(lo, false);
    Box b;
    for (int i = 0; i < cnt; ++i) b.insert(poly[i]);
    // clamp to the incoming ref box (ancestor clips)
    b.lo = vmax(b.lo, within.lo);
    b.hi = vmin(b.hi, within.hi);
    return b;
  }

  static bool box_empty(const Box& b) {
    return b.lo.x > b.hi.x || b.lo.y > b.hi.y || b.lo.z > b.hi.z;
  }

  static float overlap_area(const Box& a, const Box& b) {
    Box o;
    o.lo = vmax(a.lo, b.lo);
    o.hi = vmin(a.hi, b.hi);
    if (box_empty(o)) return 0.f;
    return o.half_area();
  }

  int make_leaf(std::vector<Ref>& refs, const Box& bounds) {
    TmpNode nd;
    nd.box = bounds;
    nd.first = static_cast<int>(refs_out.size());
    nd.count = static_cast<int>(refs.size());
    for (const Ref& r : refs) {
      refs_out.push_back(r.prim);
      leaf_ref_boxes.push_back(r.box);
    }
    nodes.push_back(nd);
    return static_cast<int>(nodes.size()) - 1;
  }

  int build(std::vector<Ref>& refs, const Box& bounds, int depth) {
    const int count = static_cast<int>(refs.size());
    if (count <= 1 || depth > 96)
      return make_leaf(refs, bounds);

    const float pa = std::max(bounds.half_area(), 1e-30f);

    // ---- object split: binned SAH over ref-box centroids ----------------
    Box cb;
    for (const Ref& r : refs)
      cb.insert(Vec3{0.5f * (r.box.lo.x + r.box.hi.x),
                     0.5f * (r.box.lo.y + r.box.hi.y),
                     0.5f * (r.box.lo.z + r.box.hi.z)});
    float ext[3] = {cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};
    int oaxis = 0;
    if (ext[1] > ext[0]) oaxis = 1;
    if (ext[2] > ext[oaxis]) oaxis = 2;
    float obest = 3.4e38f;
    int obin = -1;
    Box olb, orb;
    float oscale = 0.f, oclo = 0.f;
    if (ext[oaxis] > 1e-12f) {
      oclo = oaxis == 0 ? cb.lo.x : oaxis == 1 ? cb.lo.y : cb.lo.z;
      oscale = kBins / ext[oaxis];
      Box bin_box[kBins];
      int bin_cnt[kBins] = {0};
      for (const Ref& r : refs) {
        float c = 0.5f * ((oaxis == 0   ? r.box.lo.x + r.box.hi.x
                           : oaxis == 1 ? r.box.lo.y + r.box.hi.y
                                        : r.box.lo.z + r.box.hi.z));
        int b = std::min(std::max(int((c - oclo) * oscale), 0), kBins - 1);
        bin_cnt[b]++;
        bin_box[b].insert(r.box);
      }
      Box racc[kBins];
      Box acc;
      for (int b = kBins - 1; b >= 1; --b) {
        acc.insert(bin_box[b]);
        racc[b] = acc;
      }
      Box lacc;
      int lcnt = 0;
      for (int b = 0; b < kBins - 1; ++b) {
        lacc.insert(bin_box[b]);
        lcnt += bin_cnt[b];
        int rcnt = count - lcnt;
        if (lcnt == 0 || rcnt == 0) continue;
        float cost = lacc.half_area() * lcnt + racc[b + 1].half_area() * rcnt;
        if (cost < obest) {
          obest = cost;
          obin = b;
          olb = lacc;
          orb = racc[b + 1];
        }
      }
    }

    // ---- spatial split, gated on child overlap (sah.h:651) -------------
    // Only pay for chopping when the object split's children overlap by
    // more than alpha * SA(root).
    float sbest = 3.4e38f;
    int saxis = -1, sbin = -1;
    float s_lo = 0.f, s_w = 0.f;
    if (obin >= 0 && overlap_area(olb, orb) > alpha_area) {
      for (int axis = 0; axis < 3; ++axis) {
        float blo = axis == 0 ? bounds.lo.x : axis == 1 ? bounds.lo.y
                                                        : bounds.lo.z;
        float bhi = axis == 0 ? bounds.hi.x : axis == 1 ? bounds.hi.y
                                                        : bounds.hi.z;
        float w = (bhi - blo) / kBins;
        if (w <= 1e-12f) continue;
        Box bin_box[kBins];
        int enter[kBins] = {0}, exit_[kBins] = {0};
        for (const Ref& r : refs) {
          float rlo = axis == 0 ? r.box.lo.x : axis == 1 ? r.box.lo.y
                                                         : r.box.lo.z;
          float rhi = axis == 0 ? r.box.hi.x : axis == 1 ? r.box.hi.y
                                                         : r.box.hi.z;
          int b0 = std::min(std::max(int((rlo - blo) / w), 0), kBins - 1);
          int b1 = std::min(std::max(int((rhi - blo) / w), 0), kBins - 1);
          enter[b0]++;
          exit_[b1]++;
          if (b0 == b1) {
            bin_box[b0].insert(r.box);
          } else {
            for (int b = b0; b <= b1; ++b) {
              Box cb2 = clip_tri(r.prim, axis, blo + b * w, blo + (b + 1) * w,
                                 r.box);
              if (!box_empty(cb2)) bin_box[b].insert(cb2);
            }
          }
        }
        Box racc[kBins];
        Box acc;
        for (int b = kBins - 1; b >= 1; --b) {
          acc.insert(bin_box[b]);
          racc[b] = acc;
        }
        Box lacc;
        int lcnt = 0, rcnt = count;
        for (int b = 0; b < kBins - 1; ++b) {
          lacc.insert(bin_box[b]);
          lcnt += enter[b];
          rcnt -= exit_[b];
          if (lcnt == 0 || rcnt == 0 || box_empty(lacc)) continue;
          float cost =
              lacc.half_area() * lcnt + racc[b + 1].half_area() * rcnt;
          if (cost < sbest) {
            sbest = cost;
            saxis = axis;
            sbin = b;
            s_lo = blo;
            s_w = w;
          }
        }
      }
    }

    // ---- leaf test (build.inl:139 semantics): when small enough and no
    // split beats intersecting everything here, stop ---------------------
    float split_cost = std::min(obest, sbest);
    if (count <= max_leaf && split_cost / pa + 1.0f >= float(count))
      return make_leaf(refs, bounds);
    if (obin < 0 && sbin < 0) {
      // degenerate: median split by the longest bounds axis
      std::sort(refs.begin(), refs.end(), [&](const Ref& a, const Ref& b) {
        return a.box.lo.x + a.box.hi.x < b.box.lo.x + b.box.hi.x;
      });
      std::vector<Ref> lr(refs.begin(), refs.begin() + count / 2);
      std::vector<Ref> rr(refs.begin() + count / 2, refs.end());
      if (lr.empty() || rr.empty()) return make_leaf(refs, bounds);
      Box lb2, rb2;
      for (const Ref& r : lr) lb2.insert(r.box);
      for (const Ref& r : rr) rb2.insert(r.box);
      refs.clear();
      refs.shrink_to_fit();
      int id = static_cast<int>(nodes.size());
      nodes.emplace_back();
      nodes[id].box = bounds;
      int l = build(lr, lb2, depth + 1);
      int r = build(rr, rb2, depth + 1);
      nodes[id].left = l;
      nodes[id].right = r;
      return id;
    }

    std::vector<Ref> lr, rr;
    Box lb2, rb2;
    if (sbin >= 0 && sbest < obest) {
      // spatial split at plane: duplicate straddlers with clipped boxes
      float plane = s_lo + (sbin + 1) * s_w;
      for (const Ref& r : refs) {
        float rlo = saxis == 0 ? r.box.lo.x : saxis == 1 ? r.box.lo.y
                                                         : r.box.lo.z;
        float rhi = saxis == 0 ? r.box.hi.x : saxis == 1 ? r.box.hi.y
                                                         : r.box.hi.z;
        if (rhi <= plane) {
          lr.push_back(r);
        } else if (rlo >= plane) {
          rr.push_back(r);
        } else {
          Box bl = clip_tri(r.prim, saxis, -3.4e38f, plane, r.box);
          Box br = clip_tri(r.prim, saxis, plane, 3.4e38f, r.box);
          if (!box_empty(bl)) lr.push_back({r.prim, bl});
          if (!box_empty(br)) rr.push_back({r.prim, br});
          if (box_empty(bl) && box_empty(br)) lr.push_back(r);  // safety
        }
      }
    } else {
      // object split: partition by centroid bin
      for (const Ref& r : refs) {
        float c = 0.5f * ((oaxis == 0   ? r.box.lo.x + r.box.hi.x
                           : oaxis == 1 ? r.box.lo.y + r.box.hi.y
                                        : r.box.lo.z + r.box.hi.z));
        int b = std::min(std::max(int((c - oclo) * oscale), 0), kBins - 1);
        if (b <= obin)
          lr.push_back(r);
        else
          rr.push_back(r);
      }
    }
    if (lr.empty() || rr.empty()) {
      // fell through (numeric edge): median split
      std::vector<Ref> all = lr.empty() ? std::move(rr) : std::move(lr);
      size_t h = all.size() / 2;
      lr.assign(all.begin(), all.begin() + h);
      rr.assign(all.begin() + h, all.end());
      if (lr.empty() || rr.empty()) {
        refs = lr.empty() ? std::move(rr) : std::move(lr);
        return make_leaf(refs, bounds);
      }
    }
    for (const Ref& r : lr) lb2.insert(r.box);
    for (const Ref& r : rr) rb2.insert(r.box);
    refs.clear();
    refs.shrink_to_fit();
    int id = static_cast<int>(nodes.size());
    nodes.emplace_back();
    nodes[id].box = bounds;
    int l = build(lr, lb2, depth + 1);
    int r = build(rr, rb2, depth + 1);
    nodes[id].left = l;
    nodes[id].right = r;
    return id;
  }
};

}  // namespace sbvh

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

// SBVH builder (spatial splits + multi-prim leaves).
//
// Inputs: v1/e1/e2 (n x 3, triangle v1/e1/e2 form), alpha (spatial-split
// gate as a fraction of root surface area, reference default 1e-5),
// max_leaf_size (reference default 4), and output capacities cap_leaves /
// cap_refs.  Outputs (caller-allocated):
//   node_lo/node_hi: (2*cap_leaves-1) * 3 floats
//   left/right:      (cap_leaves-1) ints
//   parent:          (2*cap_leaves-1) ints
//   leaf_first/leaf_count: cap_leaves ints
//   prim_refs:       cap_refs ints
//   out_counts[2] = {num_leaves, num_refs} (set even on rc=1 so the
//   caller can re-allocate and retry)
// Returns 0 ok; 1 capacity exceeded; 2 bad input.
int vsnray_tpu_build_sbvh(const float* v1, const float* e1, const float* e2,
                          int n, float alpha, int max_leaf_size,
                          int cap_leaves, int cap_refs, float* node_lo,
                          float* node_hi, int32_t* left, int32_t* right,
                          int32_t* parent, int32_t* leaf_first,
                          int32_t* leaf_count, int32_t* prim_refs,
                          int32_t* out_counts) {
  if (n <= 0 || max_leaf_size < 1) return 2;
  sbvh::SBuilder b;
  b.v1 = v1;
  b.e1 = e1;
  b.e2 = e2;
  b.max_leaf = max_leaf_size;
  std::vector<sbvh::Ref> refs(n);
  Box root;
  for (int p = 0; p < n; ++p) {
    Box pb;
    pb.insert(b.vert(p, 0));
    pb.insert(b.vert(p, 1));
    pb.insert(b.vert(p, 2));
    refs[p] = {p, pb};
    root.insert(pb);
  }
  b.alpha_area = alpha * root.half_area();
  b.nodes.reserve(4 * size_t(n));
  b.refs_out.reserve(2 * size_t(n));
  int troot = b.build(refs, root, 0);

  // flatten: internals -> [0, L-1), leaves -> [L-1, 2L-1), root first
  int L = 0;
  for (const auto& nd : b.nodes)
    if (nd.left < 0) ++L;
  int R = static_cast<int>(b.refs_out.size());
  out_counts[0] = L;
  out_counts[1] = R;
  if (L > cap_leaves || R > cap_refs) return 1;

  std::vector<int32_t> id_of(b.nodes.size());
  int next_internal = 0, next_leaf = 0;
  // pre-order DFS so the root gets flat id 0
  std::vector<int> stack{troot};
  while (!stack.empty()) {
    int t = stack.back();
    stack.pop_back();
    const auto& nd = b.nodes[t];
    if (nd.left < 0) {
      id_of[t] = (L - 1) + next_leaf++;
    } else {
      id_of[t] = next_internal++;
      stack.push_back(nd.right);
      stack.push_back(nd.left);
    }
  }
  for (int i = 0; i < 2 * L - 1; ++i) parent[i] = -1;
  for (size_t t = 0; t < b.nodes.size(); ++t) {
    const auto& nd = b.nodes[t];
    int id = id_of[t];
    node_lo[3 * id] = nd.box.lo.x;
    node_lo[3 * id + 1] = nd.box.lo.y;
    node_lo[3 * id + 2] = nd.box.lo.z;
    node_hi[3 * id] = nd.box.hi.x;
    node_hi[3 * id + 1] = nd.box.hi.y;
    node_hi[3 * id + 2] = nd.box.hi.z;
    if (nd.left < 0) {
      int slot = id - (L - 1);
      leaf_first[slot] = nd.first;
      leaf_count[slot] = nd.count;
    } else {
      left[id] = id_of[nd.left];
      right[id] = id_of[nd.right];
      parent[id_of[nd.left]] = id;
      parent[id_of[nd.right]] = id;
    }
  }
  std::memcpy(prim_refs, b.refs_out.data(), sizeof(int32_t) * R);
  return 0;
}

}  // extern "C"

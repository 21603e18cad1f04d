// First-party AABB-tree nearest-point-on-mesh query.
//
// Replaces the psbody.mesh C++ AABB tree the reference leans on for its
// one-time upsample-matrix build (reference usage: mesh_sampling.py:53,
// `mesh.compute_aabb_tree().nearest(...)`).  Exposed through a C ABI and
// loaded via ctypes (semantichuman_tpu/topology/nearest.py).
//
// Build:  make -C native          (produces native/libaabb.so)
//
// Algorithm: median-split binary AABB tree over triangle centroids;
// branch-and-bound nearest-triangle descent with Ericson's closest-point-
// on-triangle; returns per query the face index, the closest point, and its
// barycentric coordinates (matching the NumPy fallback bit-for-bit in the
// generic case — identical region logic and tie-breaking priority).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

inline Vec3 operator-(const Vec3& a, const Vec3& b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
inline Vec3 operator+(const Vec3& a, const Vec3& b) {
  return {a.x + b.x, a.y + b.y, a.z + b.z};
}
inline Vec3 operator*(double s, const Vec3& a) {
  return {s * a.x, s * a.y, s * a.z};
}
inline double dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

struct Box {
  Vec3 lo{std::numeric_limits<double>::infinity(),
          std::numeric_limits<double>::infinity(),
          std::numeric_limits<double>::infinity()};
  Vec3 hi{-std::numeric_limits<double>::infinity(),
          -std::numeric_limits<double>::infinity(),
          -std::numeric_limits<double>::infinity()};
  void grow(const Vec3& p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y);
    lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y);
    hi.z = std::max(hi.z, p.z);
  }
  void grow(const Box& b) { grow(b.lo); grow(b.hi); }
  double sqdist(const Vec3& p) const {
    double d = 0.0, t;
    t = std::max({lo.x - p.x, 0.0, p.x - hi.x}); d += t * t;
    t = std::max({lo.y - p.y, 0.0, p.y - hi.y}); d += t * t;
    t = std::max({lo.z - p.z, 0.0, p.z - hi.z}); d += t * t;
    return d;
  }
};

struct Node {
  Box box;
  int32_t left = -1;    // internal: child indices; leaf: left == -1
  int32_t right = -1;
  int32_t start = 0;    // leaf: range into tri_order
  int32_t count = 0;
};

// Ericson, "Real-Time Collision Detection" 5.1.5 — same region logic and
// priority (vertex regions, then edges, then interior) as the NumPy path.
inline void closest_on_triangle(const Vec3& p, const Vec3& a, const Vec3& b,
                                const Vec3& c, Vec3* out, double* bu,
                                double* bv, double* bw) {
  const Vec3 ab = b - a, ac = c - a, ap = p - a;
  const double d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0.0 && d2 <= 0.0) { *out = a; *bu = 1; *bv = 0; *bw = 0; return; }

  const Vec3 bp = p - b;
  const double d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0.0 && d4 <= d3) { *out = b; *bu = 0; *bv = 1; *bw = 0; return; }

  const Vec3 cp = p - c;
  const double d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0.0 && d5 <= d6) { *out = c; *bu = 0; *bv = 0; *bw = 1; return; }

  const double vc = d1 * d4 - d3 * d2;
  if (vc <= 0.0 && d1 >= 0.0 && d3 <= 0.0) {
    const double t = d1 / (d1 - d3);
    *out = a + t * ab; *bu = 1 - t; *bv = t; *bw = 0; return;
  }
  const double vb = d5 * d2 - d1 * d6;
  if (vb <= 0.0 && d2 >= 0.0 && d6 <= 0.0) {
    const double t = d2 / (d2 - d6);
    *out = a + t * ac; *bu = 1 - t; *bv = 0; *bw = t; return;
  }
  const double va = d3 * d6 - d5 * d4;
  if (va <= 0.0 && (d4 - d3) >= 0.0 && (d5 - d6) >= 0.0) {
    const double t = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    *out = b + t * (c - b); *bu = 0; *bv = 1 - t; *bw = t; return;
  }
  const double denom = 1.0 / (va + vb + vc);
  const double v = vb * denom, w = vc * denom;
  *out = a + v * ab + w * ac;
  *bu = 1.0 - v - w; *bv = v; *bw = w;
}

class AabbTree {
 public:
  AabbTree(const double* verts, const int32_t* faces, int64_t n_faces)
      : verts_(verts), faces_(faces) {
    tri_order_.resize(n_faces);
    std::vector<Vec3> centroids(n_faces);
    std::vector<Box> boxes(n_faces);
    for (int64_t f = 0; f < n_faces; ++f) {
      tri_order_[f] = static_cast<int32_t>(f);
      const Vec3 a = vert(faces_[3 * f]), b = vert(faces_[3 * f + 1]),
                 c = vert(faces_[3 * f + 2]);
      boxes[f].grow(a); boxes[f].grow(b); boxes[f].grow(c);
      centroids[f] = (1.0 / 3.0) * (a + b + c);
    }
    nodes_.reserve(2 * n_faces);
    build(0, static_cast<int32_t>(n_faces), centroids, boxes);
  }

  void nearest(const Vec3& q, int64_t* face, Vec3* point, double* bary) const {
    double best = std::numeric_limits<double>::infinity();
    descend(0, q, &best, face, point, bary);
  }

 private:
  Vec3 vert(int32_t i) const {
    return {verts_[3 * i], verts_[3 * i + 1], verts_[3 * i + 2]};
  }

  int32_t build(int32_t start, int32_t count,
                const std::vector<Vec3>& centroids, std::vector<Box>& boxes) {
    const int32_t id = static_cast<int32_t>(nodes_.size());
    nodes_.emplace_back();
    Box box;
    for (int32_t i = start; i < start + count; ++i)
      box.grow(boxes[tri_order_[i]]);
    nodes_[id].box = box;
    if (count <= kLeafSize) {
      nodes_[id].start = start;
      nodes_[id].count = count;
      return id;
    }
    const Vec3 ext = box.hi - box.lo;
    const int axis = (ext.x >= ext.y && ext.x >= ext.z) ? 0
                     : (ext.y >= ext.z) ? 1 : 2;
    const int32_t mid = start + count / 2;
    std::nth_element(
        tri_order_.begin() + start, tri_order_.begin() + mid,
        tri_order_.begin() + start + count,
        [&](int32_t fa, int32_t fb) {
          const Vec3 &ca = centroids[fa], &cb = centroids[fb];
          const double va = axis == 0 ? ca.x : axis == 1 ? ca.y : ca.z;
          const double vb = axis == 0 ? cb.x : axis == 1 ? cb.y : cb.z;
          return va < vb;
        });
    const int32_t l = build(start, mid - start, centroids, boxes);
    const int32_t r = build(mid, start + count - mid, centroids, boxes);
    nodes_[id].left = l;
    nodes_[id].right = r;
    return id;
  }

  void descend(int32_t id, const Vec3& q, double* best, int64_t* face,
               Vec3* point, double* bary) const {
    const Node& n = nodes_[id];
    if (n.left < 0) {  // leaf
      for (int32_t i = n.start; i < n.start + n.count; ++i) {
        const int32_t f = tri_order_[i];
        Vec3 cp;
        double bu, bv, bw;
        closest_on_triangle(q, vert(faces_[3 * f]), vert(faces_[3 * f + 1]),
                            vert(faces_[3 * f + 2]), &cp, &bu, &bv, &bw);
        const Vec3 d = q - cp;
        const double sq = dot(d, d);
        if (sq < *best) {
          *best = sq;
          *face = f;
          *point = cp;
          bary[0] = bu; bary[1] = bv; bary[2] = bw;
        }
      }
      return;
    }
    const double dl = nodes_[n.left].box.sqdist(q);
    const double dr = nodes_[n.right].box.sqdist(q);
    const int32_t first = dl <= dr ? n.left : n.right;
    const int32_t second = dl <= dr ? n.right : n.left;
    const double dfirst = std::min(dl, dr), dsecond = std::max(dl, dr);
    if (dfirst < *best) descend(first, q, best, face, point, bary);
    if (dsecond < *best) descend(second, q, best, face, point, bary);
  }

  static constexpr int32_t kLeafSize = 4;
  const double* verts_;
  const int32_t* faces_;
  std::vector<int32_t> tri_order_;
  std::vector<Node> nodes_;
};

}  // namespace

extern "C" {

// verts [V,3] f64, faces [F,3] i32, queries [N,3] f64 ->
// out_face [N] i64, out_points [N,3] f64, out_bary [N,3] f64
void aabb_nearest(const double* verts, int64_t n_verts, const int32_t* faces,
                  int64_t n_faces, const double* queries, int64_t n_queries,
                  int64_t* out_face, double* out_points, double* out_bary) {
  (void)n_verts;
  AabbTree tree(verts, faces, n_faces);
  for (int64_t i = 0; i < n_queries; ++i) {
    const Vec3 q{queries[3 * i], queries[3 * i + 1], queries[3 * i + 2]};
    Vec3 p{0, 0, 0};
    tree.nearest(q, &out_face[i], &p, &out_bary[3 * i]);
    out_points[3 * i] = p.x;
    out_points[3 * i + 1] = p.y;
    out_points[3 * i + 2] = p.z;
  }
}

}  // extern "C"

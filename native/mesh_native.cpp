// Host-side mesh decimation: quadric-error-metric (QEM) edge collapse.
//
// TPU-native analog of the reference's pymeshlab
// meshing_decimation_quadric_edge_collapse stage
// (reference zipnerf/extract.py:254-289): the TPU renders/extracts, the
// host simplifies. Garland-Heckbert quadrics with area-weighted face
// planes, lazy-invalidated min-heap, and a normal-flip guard (pymeshlab's
// preservenormal analog). Exposed to Python via ctypes
// (nerf_lidar_tpu/native.py:qem_decimate); the pure-numpy fallback with
// identical semantics is utils/marching.py:_qem_decimate_py.
//
// Build: g++ -O3 -march=native -fPIC -shared -std=c++17 (native/Makefile).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

// Symmetric 4x4 quadric, upper-triangular storage:
// [a11 a12 a13 a14 a22 a23 a24 a33 a34 a44].
struct Quadric {
  double q[10] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0};
  void add_plane(double nx, double ny, double nz, double d, double w) {
    q[0] += w * nx * nx; q[1] += w * nx * ny; q[2] += w * nx * nz;
    q[3] += w * nx * d;  q[4] += w * ny * ny; q[5] += w * ny * nz;
    q[6] += w * ny * d;  q[7] += w * nz * nz; q[8] += w * nz * d;
    q[9] += w * d * d;
  }
  void add(const Quadric& o) {
    for (int i = 0; i < 10; i++) q[i] += o.q[i];
  }
  double eval(double x, double y, double z) const {
    return q[0] * x * x + 2 * q[1] * x * y + 2 * q[2] * x * z +
           2 * q[3] * x + q[4] * y * y + 2 * q[5] * y * z + 2 * q[6] * y +
           q[7] * z * z + 2 * q[8] * z + q[9];
  }
};

// Cyclic Jacobi eigendecomposition of a symmetric 3x3: A = V diag(w) V^T
// (columns of V are eigenvectors).
void eig_sym3(double a00, double a01, double a02, double a11, double a12,
              double a22, double w[3], double V[3][3]) {
  double A[3][3] = {{a00, a01, a02}, {a01, a11, a12}, {a02, a12, a22}};
  double Vm[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 32; sweep++) {
    double off = std::abs(A[0][1]) + std::abs(A[0][2]) + std::abs(A[1][2]);
    double diag = std::abs(A[0][0]) + std::abs(A[1][1]) + std::abs(A[2][2]);
    if (off <= 1e-15 * (diag + 1e-300)) break;
    for (int p = 0; p < 2; p++)
      for (int qi = p + 1; qi < 3; qi++) {
        if (std::abs(A[p][qi]) < 1e-300) continue;
        double theta = (A[qi][qi] - A[p][p]) / (2 * A[p][qi]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1));
        double c = 1 / std::sqrt(t * t + 1), s = t * c;
        for (int k = 0; k < 3; k++) {
          double akp = A[k][p], akq = A[k][qi];
          A[k][p] = c * akp - s * akq;
          A[k][qi] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; k++) {
          double apk = A[p][k], aqk = A[qi][k];
          A[p][k] = c * apk - s * aqk;
          A[qi][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; k++) {
          double vkp = Vm[k][p], vkq = Vm[k][qi];
          Vm[k][p] = c * vkp - s * vkq;
          Vm[k][qi] = s * vkp + c * vkq;
        }
      }
  }
  for (int i = 0; i < 3; i++) {
    w[i] = A[i][i];
    for (int j = 0; j < 3; j++) V[i][j] = Vm[i][j];
  }
}

// Minimizer of the quadric nearest to anchor xm: pseudo-inverse solve of
// A x = -b shifted to the anchor. Rank-deficient quadrics (coplanar or
// crease-edge neighborhoods) have an affine minimizer SET; anchoring at
// the collapsing edge's midpoint keeps crease/face vertices exactly on
// their feature instead of cutting the corner (the classic
// endpoint/midpoint fallback drifts off sharp edges).
void qem_point(const Quadric& qq, const double xm[3], double* out) {
  const double* q = qq.q;
  double w[3], V[3][3];
  eig_sym3(q[0], q[1], q[2], q[4], q[5], q[7], w, V);
  double wmax = std::max({std::abs(w[0]), std::abs(w[1]), std::abs(w[2])});
  const double cut = 1e-8 * wmax;
  // r = b - A xm with b = -(q14, q24, q34).
  const double bx = -q[3] - (q[0] * xm[0] + q[1] * xm[1] + q[2] * xm[2]);
  const double by = -q[6] - (q[1] * xm[0] + q[4] * xm[1] + q[5] * xm[2]);
  const double bz = -q[8] - (q[2] * xm[0] + q[5] * xm[1] + q[7] * xm[2]);
  for (int i = 0; i < 3; i++) out[i] = xm[i];
  for (int j = 0; j < 3; j++) {
    if (std::abs(w[j]) <= cut) continue;
    double proj = (V[0][j] * bx + V[1][j] * by + V[2][j] * bz) / w[j];
    for (int i = 0; i < 3; i++) out[i] += V[i][j] * proj;
  }
}

struct HeapEntry {
  double cost;
  int64_t v1, v2;
  uint32_t s1, s2;  // vertex stamps at push time (lazy invalidation)
  double pos[3];
  // Deterministic tie-break on (cost, v1, v2) — matches the Python
  // fallback's heapq tuple ordering so both implementations walk the
  // same collapse history on exact-tie meshes (lattice inputs).
  bool operator>(const HeapEntry& o) const {
    if (cost != o.cost) return cost > o.cost;
    if (v1 != o.v1) return v1 > o.v1;
    return v2 > o.v2;
  }
};

struct Vec3 {
  double x, y, z;
};

inline Vec3 sub(const Vec3& a, const Vec3& b) {
  return {a.x - b.x, a.y - b.y, a.z - b.z};
}
inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
inline double dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}

}  // namespace

extern "C" {

// Decimate (verts [n_verts,3] f64, faces [n_faces,3] i64) to
// <= target_faces by QEM edge collapse. Writes compacted outputs into
// caller buffers sized for the INPUT counts (decimation never grows the
// mesh) and the final counts into out_counts[2] = {n_verts, n_faces}.
// Returns 0 on success, 1 if the heap drained before reaching the
// target (flip-guard exhaustion; caller may fall back to clustering).
int qem_decimate(const double* verts_in, int64_t n_verts,
                 const int64_t* faces_in, int64_t n_faces,
                 int64_t target_faces, double* out_verts,
                 int64_t* out_faces, int64_t* out_counts) {
  std::vector<Vec3> pos(n_verts);
  for (int64_t i = 0; i < n_verts; i++)
    pos[i] = {verts_in[3 * i], verts_in[3 * i + 1], verts_in[3 * i + 2]};

  std::vector<std::array<int64_t, 3>> faces;
  faces.reserve(n_faces);
  for (int64_t i = 0; i < n_faces; i++) {
    int64_t a = faces_in[3 * i], b = faces_in[3 * i + 1],
            c = faces_in[3 * i + 2];
    if (a == b || b == c || a == c) continue;  // degenerate input
    faces.push_back({a, b, c});
  }
  const int64_t nf = (int64_t)faces.size();
  std::vector<uint8_t> face_alive(nf, 1);
  int64_t faces_left = nf;

  // Per-vertex quadrics from area-weighted face planes.
  std::vector<Quadric> Q(n_verts);
  std::vector<std::vector<int64_t>> inc(n_verts);  // vertex -> face ids
  for (int64_t f = 0; f < nf; f++) {
    const Vec3 &p0 = pos[faces[f][0]], &p1 = pos[faces[f][1]],
               &p2 = pos[faces[f][2]];
    Vec3 n = cross(sub(p1, p0), sub(p2, p0));
    double area2 = std::sqrt(dot(n, n));  // 2*area
    if (area2 > 1e-20) {
      Vec3 nn = {n.x / area2, n.y / area2, n.z / area2};
      double d = -dot(nn, p0);
      for (int k = 0; k < 3; k++)
        Q[faces[f][k]].add_plane(nn.x, nn.y, nn.z, d, 0.5 * area2);
    }
    for (int k = 0; k < 3; k++) inc[faces[f][k]].push_back(f);
  }

  std::vector<uint8_t> vert_alive(n_verts, 1);
  std::vector<uint32_t> stamp(n_verts, 0);
  std::priority_queue<HeapEntry, std::vector<HeapEntry>,
                      std::greater<HeapEntry>> heap;

  auto push_edge = [&](int64_t a, int64_t b) {
    if (a > b) std::swap(a, b);
    Quadric qq = Q[a];
    qq.add(Q[b]);
    HeapEntry e;
    e.v1 = a; e.v2 = b; e.s1 = stamp[a]; e.s2 = stamp[b];
    const Vec3 &pa = pos[a], &pb = pos[b];
    const double xm[3] = {0.5 * (pa.x + pb.x), 0.5 * (pa.y + pb.y),
                          0.5 * (pa.z + pb.z)};
    qem_point(qq, xm, e.pos);
    e.cost = qq.eval(e.pos[0], e.pos[1], e.pos[2]);
    heap.push(e);
  };

  // Initial edge set: unique face edges.
  {
    std::vector<std::pair<int64_t, int64_t>> edges;
    edges.reserve(3 * nf);
    for (int64_t f = 0; f < nf; f++)
      for (int k = 0; k < 3; k++) {
        int64_t a = faces[f][k], b = faces[f][(k + 1) % 3];
        if (a > b) std::swap(a, b);
        edges.emplace_back(a, b);
      }
    std::sort(edges.begin(), edges.end());
    edges.erase(std::unique(edges.begin(), edges.end()), edges.end());
    for (auto& e : edges) push_edge(e.first, e.second);
  }

  // True iff moving vertex `moved` of face f to `np_` flips its normal.
  auto face_flips = [&](int64_t f, int64_t moved, const Vec3& np_) {
    Vec3 p[3], q[3];
    for (int k = 0; k < 3; k++) {
      p[k] = pos[faces[f][k]];
      q[k] = (faces[f][k] == moved) ? np_ : p[k];
    }
    Vec3 n0 = cross(sub(p[1], p[0]), sub(p[2], p[0]));
    Vec3 n1 = cross(sub(q[1], q[0]), sub(q[2], q[0]));
    return dot(n0, n1) <= 0.0;
  };

  std::vector<int64_t> scratch;
  while (faces_left > target_faces && !heap.empty()) {
    HeapEntry e = heap.top();
    heap.pop();
    const int64_t a = e.v1, b = e.v2;
    if (!vert_alive[a] || !vert_alive[b]) continue;
    if (e.s1 != stamp[a] || e.s2 != stamp[b]) continue;  // stale

    // Candidate positions, best-cost first; take the first that does not
    // flip any surviving incident face (pymeshlab preservenormal analog).
    // Endpoints come before the midpoint: they are existing surface
    // points (a half-edge collapse), while a midpoint across a crease
    // invents an off-feature position.
    const Vec3 pa = pos[a], pb = pos[b];
    const Vec3 cands[4] = {
        {e.pos[0], e.pos[1], e.pos[2]}, pa, pb,
        {0.5 * (pa.x + pb.x), 0.5 * (pa.y + pb.y), 0.5 * (pa.z + pb.z)}};
    int chosen = -1;
    for (int ci = 0; ci < 4 && chosen < 0; ci++) {
      bool flips = false;
      for (int side = 0; side < 2 && !flips; side++) {
        int64_t v = side ? b : a;
        for (int64_t f : inc[v]) {
          if (!face_alive[f]) continue;
          // Faces holding both endpoints die in the collapse.
          bool has_a = false, has_b = false;
          for (int k = 0; k < 3; k++) {
            has_a |= faces[f][k] == a;
            has_b |= faces[f][k] == b;
          }
          if (has_a && has_b) continue;
          if (face_flips(f, v, cands[ci])) { flips = true; break; }
        }
      }
      if (!flips) chosen = ci;
    }
    if (chosen < 0) continue;  // rejected edge; a neighbor collapse may
                               // re-enable it via fresh pushes

    // Collapse b into a at the chosen position.
    pos[a] = cands[chosen];
    Q[a].add(Q[b]);
    vert_alive[b] = 0;
    stamp[a]++;
    for (int64_t f : inc[b]) {
      if (!face_alive[f]) continue;
      bool has_a = false;
      for (int k = 0; k < 3; k++) has_a |= faces[f][k] == a;
      if (has_a) {
        face_alive[f] = 0;
        faces_left--;
      } else {
        for (int k = 0; k < 3; k++)
          if (faces[f][k] == b) faces[f][k] = a;
        inc[a].push_back(f);
      }
    }
    inc[b].clear();
    inc[b].shrink_to_fit();
    // Refresh edges around a (old entries are stale via the stamp bump).
    scratch.clear();
    for (int64_t f : inc[a]) {
      if (!face_alive[f]) continue;
      for (int k = 0; k < 3; k++)
        if (faces[f][k] != a) scratch.push_back(faces[f][k]);
    }
    std::sort(scratch.begin(), scratch.end());
    scratch.erase(std::unique(scratch.begin(), scratch.end()),
                  scratch.end());
    for (int64_t nb : scratch)
      if (vert_alive[nb]) push_edge(a, nb);
  }

  // Compact: drop dead faces, now-degenerate faces, unreferenced verts.
  std::vector<int64_t> vmap(n_verts, -1);
  int64_t nv_out = 0, nf_out = 0;
  for (int64_t f = 0; f < nf; f++) {
    if (!face_alive[f]) continue;
    int64_t a = faces[f][0], b = faces[f][1], c = faces[f][2];
    if (a == b || b == c || a == c) continue;
    for (int k = 0; k < 3; k++) {
      int64_t v = faces[f][k];
      if (vmap[v] < 0) {
        vmap[v] = nv_out;
        out_verts[3 * nv_out] = pos[v].x;
        out_verts[3 * nv_out + 1] = pos[v].y;
        out_verts[3 * nv_out + 2] = pos[v].z;
        nv_out++;
      }
      out_faces[3 * nf_out + k] = vmap[v];
    }
    nf_out++;
  }
  out_counts[0] = nv_out;
  out_counts[1] = nf_out;
  return faces_left > target_faces ? 1 : 0;
}

}  // extern "C"

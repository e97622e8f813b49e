// Native host-side mesh/image ops for the homan_tpu data pipeline.
//
// The reference delegates this work to external C++ executables
// (ManifoldPlus + ACVD remeshing, meshprocess/simplifymesh.py:28-104) and to
// scipy (EDT in homan/pose_optimization.py:84-88). Device compute stays in
// XLA; these are the host-side preprocessing hot spots:
//   * quadric-error-metric edge-collapse decimation (stage-B coarse meshes)
//   * exact squared Euclidean distance transform (Felzenszwalb-Huttenlocher)
//   * fast OBJ vertex/face parsing
//
// Build: python -m homan_tpu.native.build   (g++ -O3 -shared -fPIC)
// Python binding: ctypes (homan_tpu/native/__init__.py), with pure-python
// fallbacks when the library is absent.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Exact 1D squared distance transform (Felzenszwalb & Huttenlocher 2004)
// ---------------------------------------------------------------------------
static void edt_1d(const float* f, float* d, int* v, float* z, int n) {
  int k = 0;
  v[0] = 0;
  z[0] = -1e20f;
  z[1] = 1e20f;
  for (int q = 1; q < n; q++) {
    float s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k]);
    while (s <= z[k]) {
      k--;
      s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k]);
    }
    k++;
    v[k] = q;
    z[k] = s;
    z[k + 1] = 1e20f;
  }
  k = 0;
  for (int q = 0; q < n; q++) {
    while (z[k + 1] < q) k++;
    d[q] = (q - v[k]) * (q - v[k]) + f[v[k]];
  }
}

// mask: (h, w) uint8, nonzero = feature. out: (h, w) float32 squared
// distance to the nearest feature pixel.
void edt2d_squared(const uint8_t* mask, float* out, int h, int w) {
  const float INF = 1e20f;
  std::vector<float> f(std::max(h, w));
  std::vector<float> d(std::max(h, w));
  std::vector<int> v(std::max(h, w));
  std::vector<float> z(std::max(h, w) + 1);

  // columns
  for (int x = 0; x < w; x++) {
    for (int y = 0; y < h; y++) f[y] = mask[y * w + x] ? 0.0f : INF;
    edt_1d(f.data(), d.data(), v.data(), z.data(), h);
    for (int y = 0; y < h; y++) out[y * w + x] = d[y];
  }
  // rows
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) f[x] = out[y * w + x];
    edt_1d(f.data(), d.data(), v.data(), z.data(), w);
    for (int x = 0; x < w; x++) out[y * w + x] = d[x];
  }
}

// ---------------------------------------------------------------------------
// Quadric-error-metric decimation (Garland & Heckbert '97, simplified:
// collapse to edge midpoint, no topology repair).
// ---------------------------------------------------------------------------
struct Quadric {
  double m[10];  // symmetric 4x4: xx xy xz xw yy yz yw zz zw ww
  void zero() { std::memset(m, 0, sizeof(m)); }
  void add_plane(double a, double b, double c, double d) {
    m[0] += a * a; m[1] += a * b; m[2] += a * c; m[3] += a * d;
    m[4] += b * b; m[5] += b * c; m[6] += b * d;
    m[7] += c * c; m[8] += c * d; m[9] += d * d;
  }
  void add(const Quadric& o) { for (int i = 0; i < 10; i++) m[i] += o.m[i]; }
  double eval(double x, double y, double z) const {
    return m[0]*x*x + 2*m[1]*x*y + 2*m[2]*x*z + 2*m[3]*x
         + m[4]*y*y + 2*m[5]*y*z + 2*m[6]*y
         + m[7]*z*z + 2*m[8]*z + m[9];
  }
};

struct Collapse {
  double cost;
  int u, v;
  int stamp_u, stamp_v;
  bool operator<(const Collapse& o) const { return cost > o.cost; }  // min-heap
};

// verts: (nv, 3) float32; faces: (nf, 3) int32. Outputs written in place;
// returns new face count, new vert count via out params.
int decimate_qem(const float* verts_in, int nv, const int32_t* faces_in,
                 int nf, int target_faces, float* verts_out,
                 int32_t* faces_out, int* out_nv) {
  std::vector<double> V(nv * 3);
  for (int i = 0; i < nv * 3; i++) V[i] = verts_in[i];
  std::vector<int32_t> F(faces_in, faces_in + nf * 3);
  std::vector<Quadric> Q(nv);
  for (auto& q : Q) q.zero();
  std::vector<int> stamp(nv, 0);
  std::vector<int> parent(nv);
  for (int i = 0; i < nv; i++) parent[i] = i;

  auto find = [&](int x) {
    while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
    return x;
  };

  auto face_quadric = [&](int fi) {
    int a = F[fi * 3], b = F[fi * 3 + 1], c = F[fi * 3 + 2];
    double ux = V[b*3]-V[a*3], uy = V[b*3+1]-V[a*3+1], uz = V[b*3+2]-V[a*3+2];
    double vx = V[c*3]-V[a*3], vy = V[c*3+1]-V[a*3+1], vz = V[c*3+2]-V[a*3+2];
    double nx = uy*vz - uz*vy, ny = uz*vx - ux*vz, nz = ux*vy - uy*vx;
    double len = std::sqrt(nx*nx + ny*ny + nz*nz);
    if (len < 1e-20) return;
    nx /= len; ny /= len; nz /= len;
    double d = -(nx*V[a*3] + ny*V[a*3+1] + nz*V[a*3+2]);
    Q[a].add_plane(nx, ny, nz, d);
    Q[b].add_plane(nx, ny, nz, d);
    Q[c].add_plane(nx, ny, nz, d);
  };
  for (int fi = 0; fi < nf; fi++) face_quadric(fi);

  std::priority_queue<Collapse> heap;
  auto push_edge = [&](int u, int v) {
    u = find(u); v = find(v);
    if (u == v) return;
    double x = (V[u*3] + V[v*3]) / 2, y = (V[u*3+1] + V[v*3+1]) / 2,
           z = (V[u*3+2] + V[v*3+2]) / 2;
    Quadric q = Q[u]; q.add(Q[v]);
    heap.push({q.eval(x, y, z), u, v, stamp[u], stamp[v]});
  };
  for (int fi = 0; fi < nf; fi++) {
    push_edge(F[fi*3], F[fi*3+1]);
    push_edge(F[fi*3+1], F[fi*3+2]);
    push_edge(F[fi*3+2], F[fi*3]);
  }

  int live_faces = 0;
  std::vector<char> face_dead(nf, 0);
  auto count_live = [&]() {
    live_faces = 0;
    for (int fi = 0; fi < nf; fi++) {
      int a = find(F[fi*3]), b = find(F[fi*3+1]), c = find(F[fi*3+2]);
      face_dead[fi] = (a == b || b == c || a == c);
      if (!face_dead[fi]) live_faces++;
    }
  };
  count_live();

  while (live_faces > target_faces && !heap.empty()) {
    Collapse c = heap.top(); heap.pop();
    int u = find(c.u), v = find(c.v);
    if (u == v) continue;
    if (stamp[u] != c.stamp_u || stamp[v] != c.stamp_v) continue;
    // collapse v into u at the midpoint
    V[u*3] = (V[u*3] + V[v*3]) / 2;
    V[u*3+1] = (V[u*3+1] + V[v*3+1]) / 2;
    V[u*3+2] = (V[u*3+2] + V[v*3+2]) / 2;
    Q[u].add(Q[v]);
    parent[v] = u;
    stamp[u]++;
    live_faces -= 2;  // approximation; exact recount below periodically
    // push fresh edges around u from incident faces (linear scan batched)
    if ((stamp[u] & 7) == 0) count_live();
    for (int fi = 0; fi < nf; fi++) {
      if (face_dead[fi]) continue;
      int a = find(F[fi*3]), b = find(F[fi*3+1]), cc = find(F[fi*3+2]);
      if (a == u || b == u || cc == u) {
        if (a != b) push_edge(a, b);
        if (b != cc) push_edge(b, cc);
        if (cc != a) push_edge(cc, a);
      }
    }
  }
  count_live();

  // compact
  std::vector<int> remap(nv, -1);
  int nv_out = 0;
  for (int fi = 0; fi < nf; fi++) {
    if (face_dead[fi]) continue;
    for (int k = 0; k < 3; k++) {
      int r = find(F[fi*3+k]);
      if (remap[r] < 0) {
        remap[r] = nv_out;
        verts_out[nv_out*3] = (float)V[r*3];
        verts_out[nv_out*3+1] = (float)V[r*3+1];
        verts_out[nv_out*3+2] = (float)V[r*3+2];
        nv_out++;
      }
    }
  }
  int nf_out = 0;
  for (int fi = 0; fi < nf; fi++) {
    if (face_dead[fi]) continue;
    faces_out[nf_out*3] = remap[find(F[fi*3])];
    faces_out[nf_out*3+1] = remap[find(F[fi*3+1])];
    faces_out[nf_out*3+2] = remap[find(F[fi*3+2])];
    nf_out++;
  }
  *out_nv = nv_out;
  return nf_out;
}

// ---------------------------------------------------------------------------
// Fast OBJ parse: counts then fills preallocated buffers.
// Returns 0 on success.
// ---------------------------------------------------------------------------
int obj_count(const char* path, int* nv, int* nf) {
  FILE* fp = std::fopen(path, "r");
  if (!fp) return 1;
  char line[512];
  *nv = 0; *nf = 0;
  while (std::fgets(line, sizeof(line), fp)) {
    if (line[0] == 'v' && line[1] == ' ') (*nv)++;
    else if (line[0] == 'f' && line[1] == ' ') {
      int corners = 0;
      char* p = line + 2;
      while (*p && *p != '\n' && *p != '\r') {
        while (*p == ' ') p++;
        if (*p && *p != '\n' && *p != '\r') {
          corners++;
          while (*p && *p != ' ' && *p != '\n' && *p != '\r') p++;
        }
      }
      *nf += std::max(0, corners - 2);  // fan triangulation
    }
  }
  std::fclose(fp);
  return 0;
}

int obj_parse(const char* path, float* verts, int32_t* faces) {
  FILE* fp = std::fopen(path, "r");
  if (!fp) return 1;
  char line[512];
  int vi = 0, fi = 0;
  while (std::fgets(line, sizeof(line), fp)) {
    if (line[0] == 'v' && line[1] == ' ') {
      float x, y, z;
      if (std::sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
        verts[vi*3] = x; verts[vi*3+1] = y; verts[vi*3+2] = z; vi++;
      }
    } else if (line[0] == 'f' && line[1] == ' ') {
      int idx[64], n = 0;
      char* p = line + 2;
      while (*p && n < 64) {
        while (*p == ' ') p++;
        if (!*p || *p == '\n' || *p == '\r') break;
        idx[n++] = std::atoi(p) - 1;
        while (*p && *p != ' ' && *p != '\n') p++;
      }
      for (int k = 1; k + 1 < n; k++) {
        faces[fi*3] = idx[0]; faces[fi*3+1] = idx[k]; faces[fi*3+2] = idx[k+1];
        fi++;
      }
    }
  }
  std::fclose(fp);
  return 0;
}

}  // extern "C"

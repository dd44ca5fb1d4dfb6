// Marching cubes + grid smoothing: native replacement for the reference's PyMCubes
// dependency (mcubes.smooth / mcubes.marching_cubes at recon_NeRF/lib/renderer.py:342-343).
//
// Exposed as a plain C ABI for ctypes. Vertices are de-duplicated per edge via a
// hash map so meshes are watertight; a separable box smoothing pass approximates
// mcubes.smooth's level-set smoothing well enough for the 512^3 density grids this
// pipeline extracts (threshold semantics unchanged).
//
// Build: g++ -O3 -march=native -shared -fPIC marching_cubes.cpp -o libhlmc.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

#include "mc_tables.h"

namespace {

struct V3 {
  float x, y, z;
};

inline float grid_at(const float* g, int nx, int ny, int nz, int i, int j, int k) {
  return g[(static_cast<int64_t>(i) * ny + j) * nz + k];
}

// Cube corner offsets in (i, j, k); ordering matches the classic tables.
const int kCorner[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

// Edge -> (corner a, corner b)
const int kEdge[12][2] = {
    {0, 1}, {1, 2}, {2, 3}, {3, 0}, {4, 5}, {5, 6},
    {6, 7}, {7, 4}, {0, 4}, {1, 5}, {2, 6}, {3, 7},
};

inline uint64_t edge_key(int i, int j, int k, int e, int ny, int nz) {
  return (((static_cast<uint64_t>(i) * ny + j) * nz + k) << 4) | e;
}

}  // namespace

extern "C" {

// Separable box smoothing of the grid, `iters` passes (approximates mcubes.smooth).
void hl_smooth(float* grid, int nx, int ny, int nz, int iters) {
  std::vector<float> tmp(static_cast<size_t>(nx) * ny * nz);
  auto idx = [&](int i, int j, int k) {
    return (static_cast<size_t>(i) * ny + j) * nz + k;
  };
  for (int it = 0; it < iters; ++it) {
    // x pass
    for (int j = 0; j < ny; ++j)
      for (int k = 0; k < nz; ++k)
        for (int i = 0; i < nx; ++i) {
          int i0 = i > 0 ? i - 1 : i, i1 = i < nx - 1 ? i + 1 : i;
          tmp[idx(i, j, k)] =
              (grid[idx(i0, j, k)] + grid[idx(i, j, k)] + grid[idx(i1, j, k)]) / 3.f;
        }
    std::swap_ranges(tmp.begin(), tmp.end(), grid);
    // y pass
    for (int i = 0; i < nx; ++i)
      for (int k = 0; k < nz; ++k)
        for (int j = 0; j < ny; ++j) {
          int j0 = j > 0 ? j - 1 : j, j1 = j < ny - 1 ? j + 1 : j;
          tmp[idx(i, j, k)] =
              (grid[idx(i, j0, k)] + grid[idx(i, j, k)] + grid[idx(i, j1, k)]) / 3.f;
        }
    std::swap_ranges(tmp.begin(), tmp.end(), grid);
    // z pass
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < ny; ++j)
        for (int k = 0; k < nz; ++k) {
          int k0 = k > 0 ? k - 1 : k, k1 = k < nz - 1 ? k + 1 : k;
          tmp[idx(i, j, k)] =
              (grid[idx(i, j, k0)] + grid[idx(i, j, k)] + grid[idx(i, j, k1)]) / 3.f;
        }
    std::swap_ranges(tmp.begin(), tmp.end(), grid);
  }
}

// Extract the iso-surface at `iso`. Returns 0 on success. Caller frees with hl_free.
int hl_marching_cubes(const float* grid, int nx, int ny, int nz, float iso,
                      float** verts_out, int64_t* n_verts,
                      int32_t** tris_out, int64_t* n_tris) {
  std::vector<V3> verts;
  std::vector<int32_t> tris;
  std::unordered_map<uint64_t, int32_t> edge_vert;
  verts.reserve(1 << 16);
  tris.reserve(1 << 17);
  edge_vert.reserve(1 << 16);

  for (int i = 0; i < nx - 1; ++i) {
    for (int j = 0; j < ny - 1; ++j) {
      for (int k = 0; k < nz - 1; ++k) {
        float val[8];
        int cube = 0;
        for (int c = 0; c < 8; ++c) {
          val[c] = grid_at(grid, nx, ny, nz, i + kCorner[c][0], j + kCorner[c][1],
                           k + kCorner[c][2]);
          if (val[c] < iso) cube |= (1 << c);
        }
        int edges = kEdgeTable[cube];
        if (edges == 0) continue;

        int32_t ev[12];
        for (int e = 0; e < 12; ++e) {
          if (!(edges & (1 << e))) continue;
          uint64_t key = edge_key(i, j, k, e, ny, nz);
          // Canonicalize the key to the owning cell of the edge's lower corner.
          int a = kEdge[e][0];
          int ci = i + kCorner[a][0], cj = j + kCorner[a][1], ck = k + kCorner[a][2];
          int b = kEdge[e][1];
          int di = kCorner[b][0] - kCorner[a][0];
          int dj = kCorner[b][1] - kCorner[a][1];
          int dk = kCorner[b][2] - kCorner[a][2];
          // Axis id: 0=x,1=y,2=z
          int axis = di ? 0 : (dj ? 1 : 2);
          if (di + dj + dk < 0) {  // flip to positive direction
            ci += di; cj += dj; ck += dk;
          }
          key = (((static_cast<uint64_t>(ci) * ny + cj) * nz + ck) << 2) | axis;

          auto it = edge_vert.find(key);
          if (it != edge_vert.end()) {
            ev[e] = it->second;
            continue;
          }
          float va = val[kEdge[e][0]];
          float vb = val[kEdge[e][1]];
          float denom = vb - va;
          float t = (denom > 1e-12f || denom < -1e-12f) ? (iso - va) / denom : 0.5f;
          if (t < 0.f) t = 0.f;
          if (t > 1.f) t = 1.f;
          V3 pa = {static_cast<float>(i + kCorner[kEdge[e][0]][0]),
                   static_cast<float>(j + kCorner[kEdge[e][0]][1]),
                   static_cast<float>(k + kCorner[kEdge[e][0]][2])};
          V3 pb = {static_cast<float>(i + kCorner[kEdge[e][1]][0]),
                   static_cast<float>(j + kCorner[kEdge[e][1]][1]),
                   static_cast<float>(k + kCorner[kEdge[e][1]][2])};
          V3 p = {pa.x + t * (pb.x - pa.x), pa.y + t * (pb.y - pa.y),
                  pa.z + t * (pb.z - pa.z)};
          ev[e] = static_cast<int32_t>(verts.size());
          verts.push_back(p);
          edge_vert.emplace(key, ev[e]);
        }

        const int* row = kTriTable[cube];
        for (int t = 0; row[t] != -1; t += 3) {
          tris.push_back(ev[row[t]]);
          tris.push_back(ev[row[t + 1]]);
          tris.push_back(ev[row[t + 2]]);
        }
      }
    }
  }

  *n_verts = static_cast<int64_t>(verts.size());
  *n_tris = static_cast<int64_t>(tris.size() / 3);
  *verts_out = static_cast<float*>(std::malloc(verts.size() * 3 * sizeof(float)));
  *tris_out = static_cast<int32_t*>(std::malloc(tris.size() * sizeof(int32_t)));
  if (!*verts_out || !*tris_out) return -1;
  std::memcpy(*verts_out, verts.data(), verts.size() * 3 * sizeof(float));
  std::memcpy(*tris_out, tris.data(), tris.size() * sizeof(int32_t));
  return 0;
}

void hl_free(void* p) { std::free(p); }

}  // extern "C"

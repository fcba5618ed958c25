// Native host-side kernels for the CN-RMA TPU data pipeline.
//
// The reference offloads its host hot spots to external C++/CUDA
// (MinkowskiEngine coordinate maps, pcdet NMS); on TPU those moved into
// XLA, so the remaining native-worthy work is the *host* data path that
// feeds the chip: per-scene GT TSDF resampling (3 scales of trilinear
// grid-sampling per sample, the loader bottleneck), voxel-grid point
// downsampling (mesh eval), and greedy BEV NMS (offline tools without an
// accelerator).  Exposed as a plain C ABI consumed via ctypes
// (cnrma_tpu/utils/native.py).
//
// Build: make -C native   (g++ -O3 -march=native -fopenmp -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <unordered_map>

extern "C" {

// ---------------------------------------------------------------------------
// TSDF resample under a rigid transform — exact match of
// cnrma_tpu/geometry/tsdf.py:TSDF.transform (reference grid_sample chain
// with the normalize-by-(dim-1) / align_corners=False mix):
//   for each output voxel: world = T @ (idx*vs + origin);
//   c = (world - old_origin)/vs;  n = 2c/(D-1)-1;  s = ((n+1)*D-1)/2;
//   nearest sample; blend trilinear where |tsdf|<1; |n|>=1 -> +1.
// ---------------------------------------------------------------------------
void tsdf_resample(const float* vol, int X, int Y, int Z,
                   const float* transform /*4x4 row major*/,
                   const float* old_origin /*3*/,
                   const float* new_origin /*3*/,
                   float voxel_size,
                   int NX, int NY, int NZ,
                   float* out) {
  const float T00 = transform[0], T01 = transform[1], T02 = transform[2],
              T03 = transform[3];
  const float T10 = transform[4], T11 = transform[5], T12 = transform[6],
              T13 = transform[7];
  const float T20 = transform[8], T21 = transform[9], T22 = transform[10],
              T23 = transform[11];
  const float dims[3] = {(float)X, (float)Y, (float)Z};

#pragma omp parallel for collapse(2) schedule(static)
  for (int ix = 0; ix < NX; ++ix) {
    for (int iy = 0; iy < NY; ++iy) {
      for (int iz = 0; iz < NZ; ++iz) {
        const float wx0 = ix * voxel_size + new_origin[0];
        const float wy0 = iy * voxel_size + new_origin[1];
        const float wz0 = iz * voxel_size + new_origin[2];
        const float wx = T00 * wx0 + T01 * wy0 + T02 * wz0 + T03;
        const float wy = T10 * wx0 + T11 * wy0 + T12 * wz0 + T13;
        const float wz = T20 * wx0 + T21 * wy0 + T22 * wz0 + T23;
        const float c[3] = {(wx - old_origin[0]) / voxel_size,
                            (wy - old_origin[1]) / voxel_size,
                            (wz - old_origin[2]) / voxel_size};
        float s[3];
        bool oob = false;
        for (int a = 0; a < 3; ++a) {
          const float n = 2.f * c[a] / (dims[a] - 1.f) - 1.f;
          if (std::fabs(n) >= 1.f) oob = true;
          s[a] = ((n + 1.f) * dims[a] - 1.f) * 0.5f;
        }
        float value;
        if (oob) {
          value = 1.f;
        } else {
          // nearest (round half to even like nearbyint)
          const int nx = std::min(std::max((int)std::nearbyintf(s[0]), 0),
                                  X - 1);
          const int ny = std::min(std::max((int)std::nearbyintf(s[1]), 0),
                                  Y - 1);
          const int nz = std::min(std::max((int)std::nearbyintf(s[2]), 0),
                                  Z - 1);
          const float near = vol[((size_t)nx * Y + ny) * Z + nz];
          if (std::fabs(near) < 1.f) {
            // trilinear blend near the surface
            const int x0 = std::min(std::max((int)std::floor(s[0]), 0),
                                    X - 1);
            const int y0 = std::min(std::max((int)std::floor(s[1]), 0),
                                    Y - 1);
            const int z0 = std::min(std::max((int)std::floor(s[2]), 0),
                                    Z - 1);
            const int x1 = std::min(x0 + 1, X - 1);
            const int y1 = std::min(y0 + 1, Y - 1);
            const int z1 = std::min(z0 + 1, Z - 1);
            const float fx = s[0] - std::floor(s[0]);
            const float fy = s[1] - std::floor(s[1]);
            const float fz = s[2] - std::floor(s[2]);
            auto at = [&](int a, int b, int d) {
              return vol[((size_t)a * Y + b) * Z + d];
            };
            const float v00 = at(x0, y0, z0) * (1 - fx) + at(x1, y0, z0) * fx;
            const float v10 = at(x0, y1, z0) * (1 - fx) + at(x1, y1, z0) * fx;
            const float v01 = at(x0, y0, z1) * (1 - fx) + at(x1, y0, z1) * fx;
            const float v11 = at(x0, y1, z1) * (1 - fx) + at(x1, y1, z1) * fx;
            value = (v00 * (1 - fy) + v10 * fy) * (1 - fz) +
                    (v01 * (1 - fy) + v11 * fy) * fz;
          } else {
            value = near;
          }
        }
        out[((size_t)ix * NY + iy) * NZ + iz] = value;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Voxel-grid average downsample (open3d voxel_down_sample equivalent).
// Returns number of output points written (<= n).
// ---------------------------------------------------------------------------
int voxel_downsample(const float* pts, int n, float voxel, float* out) {
  struct Key {
    int64_t v;
    bool operator==(const Key& o) const { return v == o.v; }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      return std::hash<int64_t>()(k.v);
    }
  };
  std::unordered_map<Key, std::pair<int, double[3]>, KeyHash> cells;
  cells.reserve(n);
  std::vector<Key> order;
  order.reserve(n);
  for (int i = 0; i < n; ++i) {
    const int64_t kx = (int64_t)std::floor(pts[3 * i + 0] / voxel);
    const int64_t ky = (int64_t)std::floor(pts[3 * i + 1] / voxel);
    const int64_t kz = (int64_t)std::floor(pts[3 * i + 2] / voxel);
    // 21 bits per axis (+-1M cells) packed into one int64 key
    Key key{((kx & 0x1FFFFF) << 42) | ((ky & 0x1FFFFF) << 21) |
            (kz & 0x1FFFFF)};
    auto it = cells.find(key);
    if (it == cells.end()) {
      auto& slot = cells[key];
      slot.first = 1;
      slot.second[0] = pts[3 * i];
      slot.second[1] = pts[3 * i + 1];
      slot.second[2] = pts[3 * i + 2];
      order.push_back(key);
    } else {
      it->second.first += 1;
      it->second.second[0] += pts[3 * i];
      it->second.second[1] += pts[3 * i + 1];
      it->second.second[2] += pts[3 * i + 2];
    }
  }
  int m = 0;
  for (const auto& key : order) {
    const auto& slot = cells[key];
    out[3 * m + 0] = (float)(slot.second[0] / slot.first);
    out[3 * m + 1] = (float)(slot.second[1] / slot.first);
    out[3 * m + 2] = (float)(slot.second[2] / slot.first);
    ++m;
  }
  return m;
}

// ---------------------------------------------------------------------------
// Greedy axis-aligned BEV NMS (host fallback for offline tools).
// boxes: [n,7] (cx,cy,cz,dx,dy,dz,yaw) sorted by score descending.
// keep_out: [n] 0/1.
// ---------------------------------------------------------------------------
void nms_bev_aligned(const float* boxes, int n, float iou_thr,
                     uint8_t* keep_out) {
  std::memset(keep_out, 1, n);
  for (int i = 0; i < n; ++i) {
    if (!keep_out[i]) continue;
    const float xi0 = boxes[7 * i] - boxes[7 * i + 3] / 2;
    const float xi1 = boxes[7 * i] + boxes[7 * i + 3] / 2;
    const float yi0 = boxes[7 * i + 1] - boxes[7 * i + 4] / 2;
    const float yi1 = boxes[7 * i + 1] + boxes[7 * i + 4] / 2;
    const float ai = (xi1 - xi0) * (yi1 - yi0);
    for (int j = i + 1; j < n; ++j) {
      if (!keep_out[j]) continue;
      const float xj0 = boxes[7 * j] - boxes[7 * j + 3] / 2;
      const float xj1 = boxes[7 * j] + boxes[7 * j + 3] / 2;
      const float yj0 = boxes[7 * j + 1] - boxes[7 * j + 4] / 2;
      const float yj1 = boxes[7 * j + 1] + boxes[7 * j + 4] / 2;
      const float ix = std::max(
          0.f, std::min(xi1, xj1) - std::max(xi0, xj0));
      const float iy = std::max(
          0.f, std::min(yi1, yj1) - std::max(yi0, yj0));
      const float inter = ix * iy;
      const float aj = (xj1 - xj0) * (yj1 - yj0);
      if (inter / std::max(ai + aj - inter, 1e-8f) > iou_thr)
        keep_out[j] = 0;
    }
  }
}

}  // extern "C"

// mobi_tpu native host ops (C++17, no external deps).
//
// Host-side equivalents of the reference's CUDA/C++ op families
// (/root/reference/bevfusion/mmdet3d/ops/): voxelization
// (ops/voxel/src/voxelization_cpu.cpp semantics), the PointNet++ point-op
// family (knn, ball_query, furthest_point_sample, three_nn), and
// points-in-boxes (ops/roiaware_pool3d). These run in the input pipeline and
// offline preprocessing; the accelerator-resident counterparts live in
// mobi_tpu/ops/ (JAX/Pallas). Exposed over a plain C ABI consumed via ctypes
// (mobi_tpu/native/__init__.py).
//
// Build: g++ -O3 -march=native -shared -fPIC mobi_native.cpp -o libmobi_native.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Voxelization (reference voxelization_cpu.cpp:7-43 dynamic / :45-120 hard).
// Grid coords are (x, y, z) indices; out-of-range points get -1 (dynamic) or
// are skipped (hard). Hard voxelization is first-come-first-serve per voxel,
// capped at max_points per voxel and max_voxels total, voxel order = point
// discovery order. Returns the number of voxels produced.
// ---------------------------------------------------------------------------

void dynamic_voxelize(const float* points, int64_t n, int64_t nf,
                      const float* voxel_size, const float* coors_range,
                      const int32_t* grid_size, int32_t* coors) {
  for (int64_t i = 0; i < n; ++i) {
    bool failed = false;
    int32_t c[3];
    for (int j = 0; j < 3; ++j) {
      int32_t v = static_cast<int32_t>(
          std::floor((points[i * nf + j] - coors_range[j]) / voxel_size[j]));
      if (v < 0 || v >= grid_size[j]) {
        failed = true;
        break;
      }
      c[j] = v;
    }
    for (int j = 0; j < 3; ++j) coors[i * 3 + j] = failed ? -1 : c[j];
  }
}

int64_t hard_voxelize(const float* points, int64_t n, int64_t nf,
                      const float* voxel_size, const float* coors_range,
                      const int32_t* grid_size, int64_t max_points,
                      int64_t max_voxels, float* voxels, int32_t* coors,
                      int32_t* num_points_per_voxel) {
  std::unordered_map<int64_t, int64_t> voxel_of;
  voxel_of.reserve(static_cast<size_t>(max_voxels) * 2);
  const int64_t gx = grid_size[0], gy = grid_size[1];
  int64_t voxel_num = 0;

  for (int64_t i = 0; i < n; ++i) {
    int32_t c[3];
    bool failed = false;
    for (int j = 0; j < 3; ++j) {
      int32_t v = static_cast<int32_t>(
          std::floor((points[i * nf + j] - coors_range[j]) / voxel_size[j]));
      if (v < 0 || v >= grid_size[j]) {
        failed = true;
        break;
      }
      c[j] = v;
    }
    if (failed) continue;
    int64_t key = (static_cast<int64_t>(c[2]) * gy + c[1]) * gx + c[0];
    auto it = voxel_of.find(key);
    int64_t vid;
    if (it == voxel_of.end()) {
      if (voxel_num >= max_voxels) continue;
      vid = voxel_num++;
      voxel_of.emplace(key, vid);
      for (int j = 0; j < 3; ++j) coors[vid * 3 + j] = c[j];
    } else {
      vid = it->second;
    }
    int32_t& cnt = num_points_per_voxel[vid];
    if (cnt < max_points) {
      std::memcpy(voxels + (vid * max_points + cnt) * nf, points + i * nf,
                  sizeof(float) * nf);
      ++cnt;
    }
  }
  return voxel_num;
}

// ---------------------------------------------------------------------------
// PointNet++ family (reference ops/{knn,ball_query,furthest_point_sample,
// interpolate}/src). Brute-force O(N*M) — host preprocessing scale.
// ---------------------------------------------------------------------------

void knn(const float* ref, int64_t m, const float* query, int64_t n,
         int64_t k, int32_t* idx, float* dist2) {
  std::vector<float> d(m);
  for (int64_t i = 0; i < n; ++i) {
    const float qx = query[i * 3], qy = query[i * 3 + 1], qz = query[i * 3 + 2];
    for (int64_t j = 0; j < m; ++j) {
      const float dx = ref[j * 3] - qx, dy = ref[j * 3 + 1] - qy,
                  dz = ref[j * 3 + 2] - qz;
      d[j] = dx * dx + dy * dy + dz * dz;
    }
    // selection of k smallest (k is tiny)
    for (int64_t s = 0; s < k; ++s) {
      float best = std::numeric_limits<float>::infinity();
      int64_t bj = 0;
      for (int64_t j = 0; j < m; ++j) {
        if (d[j] < best) {
          best = d[j];
          bj = j;
        }
      }
      idx[i * k + s] = static_cast<int32_t>(bj);
      dist2[i * k + s] = best;
      d[bj] = std::numeric_limits<float>::infinity();
    }
  }
}

// mmdet3d ball_query semantics: the first nsample points within radius, in
// input order; remaining slots repeat the FIRST hit.
void ball_query(const float* ref, int64_t m, const float* query, int64_t n,
                float radius, int64_t nsample, int32_t* idx) {
  const float r2 = radius * radius;
  for (int64_t i = 0; i < n; ++i) {
    const float qx = query[i * 3], qy = query[i * 3 + 1], qz = query[i * 3 + 2];
    int64_t cnt = 0;
    for (int64_t j = 0; j < m && cnt < nsample; ++j) {
      const float dx = ref[j * 3] - qx, dy = ref[j * 3 + 1] - qy,
                  dz = ref[j * 3 + 2] - qz;
      if (dx * dx + dy * dy + dz * dz < r2) {
        if (cnt == 0) {
          for (int64_t s = 0; s < nsample; ++s)
            idx[i * nsample + s] = static_cast<int32_t>(j);
        }
        idx[i * nsample + cnt] = static_cast<int32_t>(j);
        ++cnt;
      }
    }
    if (cnt == 0)
      for (int64_t s = 0; s < nsample; ++s) idx[i * nsample + s] = 0;
  }
}

// Iterative farthest point sampling, seeded at index 0 (CUDA kernel
// convention, ops/furthest_point_sample/src).
void furthest_point_sample(const float* points, int64_t n, int64_t npoint,
                           int32_t* idx) {
  std::vector<float> mind(n, std::numeric_limits<float>::infinity());
  int64_t cur = 0;
  for (int64_t s = 0; s < npoint; ++s) {
    idx[s] = static_cast<int32_t>(cur);
    const float cx = points[cur * 3], cy = points[cur * 3 + 1],
                cz = points[cur * 3 + 2];
    float best = -1.f;
    int64_t bj = 0;
    for (int64_t j = 0; j < n; ++j) {
      const float dx = points[j * 3] - cx, dy = points[j * 3 + 1] - cy,
                  dz = points[j * 3 + 2] - cz;
      const float dd = dx * dx + dy * dy + dz * dz;
      if (dd < mind[j]) mind[j] = dd;
      if (mind[j] > best) {
        best = mind[j];
        bj = j;
      }
    }
    cur = bj;
  }
}

// three nearest neighbors of each unknown point among known points
// (ops/interpolate/src/three_nn*): squared distances + indices.
void three_nn(const float* unknown, int64_t n, const float* known, int64_t m,
              float* dist2, int32_t* idx) {
  knn(known, m, unknown, n, 3, idx, dist2);
}

// ---------------------------------------------------------------------------
// points_in_boxes (ops/roiaware_pool3d): boxes are
// (cx, cy, cz_bottom, dx, dy, dz, yaw) in the lidar frame (mmdet3d LiDAR box
// convention, bottom-center origin). Output: box index per point (-1 if in
// no box; first containing box wins, matching points_in_boxes_cpu).
// ---------------------------------------------------------------------------

void points_in_boxes(const float* points, int64_t n, const float* boxes,
                     int64_t nb, int32_t* box_idx) {
  for (int64_t i = 0; i < n; ++i) {
    box_idx[i] = -1;
    const float px = points[i * 3], py = points[i * 3 + 1],
                pz = points[i * 3 + 2];
    for (int64_t b = 0; b < nb; ++b) {
      const float* bx = boxes + b * 7;
      const float dz = pz - bx[2];
      if (dz < 0.f || dz > bx[5]) continue;
      const float c = std::cos(-bx[6]), s = std::sin(-bx[6]);
      const float lx = (px - bx[0]) * c - (py - bx[1]) * s;
      const float ly = (px - bx[0]) * s + (py - bx[1]) * c;
      if (std::fabs(lx) <= bx[3] * 0.5f && std::fabs(ly) <= bx[4] * 0.5f) {
        box_idx[i] = static_cast<int32_t>(b);
        break;
      }
    }
  }
}

}  // extern "C"

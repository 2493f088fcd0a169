// Host-side data-path kernels for commonscenes_tpu.
//
// The reference's only native code is CUDA metric kernels
// (extension/chamfer.cu, scripts/pytorch_structural_losses/*.cu) — those
// moved on-device as Pallas kernels. What stays host-side on a TPU VM is
// the data pipeline: SDF grid clamping/padding (64^3 float grids per
// object, dataset/threedfront_dataset.py:383-392), box normalization
// (helpers/util.py:519-533) and per-pair CPU chamfer for golden tests.
// These are the per-step host hot loops; this library implements them in
// multithreaded C++ with a ctypes interface (loaded by
// commonscenes_tpu/data/native.py, numpy fallback when absent).
//
// Build: make -C native    (g++ -O3 -march=native -fPIC -shared -pthread)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// simple static-partition parallel-for
template <typename F>
void parallel_for(int64_t n, F&& fn, int max_threads = 0) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int nt = max_threads > 0 ? max_threads : (hw > 0 ? hw : 1);
  nt = static_cast<int>(std::min<int64_t>(nt, n));
  if (nt <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> threads;
  std::atomic<int64_t> next(0);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&]() {
      int64_t i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Clamp SDF grids to [-trunc, trunc] and scatter them into a padded batch.
// src: [n_src, res^3] contiguous float grids; sel: [n_dst] indices into src
// (negative = leave zero); dst: [n_dst, res^3] (pre-zeroed by caller or not
// — we zero the unselected rows ourselves).
void clamp_pad_sdf(const float* src, const int32_t* sel, float* dst,
                   int64_t n_dst, int64_t grid, float trunc) {
  parallel_for(n_dst, [&](int64_t row) {
    float* out = dst + row * grid;
    int32_t s = sel[row];
    if (s < 0) {
      std::memset(out, 0, sizeof(float) * grid);
      return;
    }
    const float* in = src + static_cast<int64_t>(s) * grid;
    for (int64_t i = 0; i < grid; ++i) {
      float v = in[i];
      out[i] = v > trunc ? trunc : (v < -trunc ? -trunc : v);
    }
  });
}

// z-score box normalization: out = scale * (box - mean) / std, row-major
// [n, d] boxes with d-length mean/std.
void normalize_boxes(const float* boxes, const float* mean, const float* stdv,
                     float scale, float* out, int64_t n, int64_t d) {
  parallel_for(n, [&](int64_t i) {
    const float* b = boxes + i * d;
    float* o = out + i * d;
    for (int64_t k = 0; k < d; ++k) o[k] = scale * (b[k] - mean[k]) / stdv[k];
  });
}

void denormalize_boxes(const float* boxes, const float* mean,
                       const float* stdv, float scale, float* out, int64_t n,
                       int64_t d) {
  parallel_for(n, [&](int64_t i) {
    const float* b = boxes + i * d;
    float* o = out + i * d;
    for (int64_t k = 0; k < d; ++k) o[k] = b[k] * stdv[k] / scale + mean[k];
  });
}

// Bidirectional nearest-neighbor squared distances between two point sets
// (the CPU golden path for the Pallas chamfer kernel). x: [n,3], y: [m,3];
// d1: [n], d2: [m].
void nn_distance_cpu(const float* x, int64_t n, const float* y, int64_t m,
                     float* d1, float* d2) {
  parallel_for(n, [&](int64_t i) {
    const float* p = x + i * 3;
    float best = 1e30f;
    for (int64_t j = 0; j < m; ++j) {
      const float* q = y + j * 3;
      float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
      float d = dx * dx + dy * dy + dz * dz;
      best = d < best ? d : best;
    }
    d1[i] = best;
  });
  parallel_for(m, [&](int64_t j) {
    const float* q = y + j * 3;
    float best = 1e30f;
    for (int64_t i = 0; i < n; ++i) {
      const float* p = x + i * 3;
      float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
      float d = dx * dx + dy * dy + dz * dz;
      best = d < best ? d : best;
    }
    d2[j] = best;
  });
}

// Angle binning: np.digitize(angle_rad, linspace(-pi, pi, nbins)) then the
// train-side clamp to [0, nbins) (threedfront_dataset.py:377-378,
// train_3dfront.py:154-159).
void bin_angles(const float* angles_rad, int32_t* bins, int64_t n,
                int32_t nbins) {
  const float lo = -3.14159265358979323846f;
  const float hi = 3.14159265358979323846f;
  const float step = (hi - lo) / static_cast<float>(nbins - 1);
  parallel_for(n, [&](int64_t i) {
    float a = angles_rad[i];
    int32_t b = static_cast<int32_t>(std::floor((a - lo) / step)) + 1;
    if (a < lo) b = 0;
    if (a >= hi) b = nbins;
    b -= 1;  // train-side -1 shift
    if (b < 0) b = 0;
    if (b >= nbins) b = nbins - 1;
    bins[i] = b;
  });
}

// Partition annotated-scan vertices by instance id (the legacy 3RScan
// points path, dataset/dataset.py:600-607: the reference scans the whole
// vertex array once per instance; this is one counting-sort pass for all
// instances). vert_ids: [V] per-vertex objectIds; inst_ids: [n] queried
// instances. Writes packed vertex indices to out_idx (capacity V) with
// per-instance ranges out_off[i] .. out_off[i+1]; vertices whose id
// matches no queried instance are dropped.
void partition_vertices(const int32_t* vert_ids, int64_t V,
                        const int32_t* inst_ids, int64_t n,
                        int32_t* out_idx, int64_t* out_off) {
  int32_t max_id = 0;
  for (int64_t i = 0; i < n; ++i)
    max_id = inst_ids[i] > max_id ? inst_ids[i] : max_id;
  // dense id→slot map (3RScan instance ids are small dense ints)
  std::vector<int32_t> slot(static_cast<size_t>(max_id) + 1, -1);
  for (int64_t i = 0; i < n; ++i)
    if (inst_ids[i] >= 0) slot[inst_ids[i]] = static_cast<int32_t>(i);
  std::vector<int64_t> counts(n, 0);
  for (int64_t v = 0; v < V; ++v) {
    int32_t id = vert_ids[v];
    if (id >= 0 && id <= max_id && slot[id] >= 0) ++counts[slot[id]];
  }
  out_off[0] = 0;
  for (int64_t i = 0; i < n; ++i) out_off[i + 1] = out_off[i] + counts[i];
  std::vector<int64_t> cursor(out_off, out_off + n);
  for (int64_t v = 0; v < V; ++v) {
    int32_t id = vert_ids[v];
    if (id >= 0 && id <= max_id && slot[id] >= 0)
      out_idx[cursor[slot[id]]++] = static_cast<int32_t>(v);
  }
}

}  // extern "C"

// Native host-side preprocessing ops for genpc_tpu.
//
// TPU-native replacement for the reference's native/host dependencies:
//   * farthest-point sampling  — the external Rust `fpsample` wheel the
//     reference uses for metric/fusion downsampling (reference:
//     README.md:18; main.py:21-22; reg_xyz.py:215).  The TPU kernel
//     (genpc_tpu/ops/fps.py) covers on-device use; this covers host-side
//     callers without a device round-trip.
//   * voxel-grid downsampling  — open3d voxel_down_sample (reference:
//     reg_xyz.py:154-155 and elsewhere), averaging points and colors per
//     occupied voxel via a flat-hash accumulation.
//
// Built as a plain shared library (no pybind11; ctypes binding in
// genpc_tpu/native/__init__.py).  Compile: `make -C genpc_tpu/native`.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <limits>
#include <unordered_map>
#include <vector>

extern "C" {

// Farthest-point sampling: O(n*k), cache-friendly single pass per pick.
// pts: [n,3] float32, out_idx: [k] int64. Returns 0 on success.
int fps_sample(const float* pts, int64_t n, int64_t k, int64_t start,
               int64_t* out_idx) {
    if (n <= 0 || k <= 0 || k > n || start < 0 || start >= n) return -1;
    std::vector<float> min_d(static_cast<size_t>(n),
                             std::numeric_limits<float>::infinity());
    int64_t last = start;
    out_idx[0] = start;
    for (int64_t i = 1; i < k; ++i) {
        const float lx = pts[3 * last], ly = pts[3 * last + 1],
                    lz = pts[3 * last + 2];
        float best = -1.0f;
        int64_t best_j = 0;
        for (int64_t j = 0; j < n; ++j) {
            const float dx = pts[3 * j] - lx;
            const float dy = pts[3 * j + 1] - ly;
            const float dz = pts[3 * j + 2] - lz;
            const float d = dx * dx + dy * dy + dz * dz;
            if (d < min_d[j]) min_d[j] = d;
            if (min_d[j] > best) { best = min_d[j]; best_j = j; }
        }
        last = best_j;
        out_idx[i] = best_j;
    }
    return 0;
}

// Voxel downsample: average points (and optional colors) per voxel.
// pts: [n,3] float64. out_pts/out_cols must hold n rows (upper bound).
// Returns the number of occupied voxels, or -1 on error.
int64_t voxel_downsample(const double* pts, const double* cols, int64_t n,
                         double voxel, double* out_pts, double* out_cols) {
    if (n <= 0 || voxel <= 0.0) return -1;
    double mn[3] = {pts[0], pts[1], pts[2]};
    for (int64_t i = 1; i < n; ++i)
        for (int d = 0; d < 3; ++d)
            if (pts[3 * i + d] < mn[d]) mn[d] = pts[3 * i + d];

    struct Acc { double p[3] = {0, 0, 0}; double c[3] = {0, 0, 0};
                 int64_t cnt = 0; };
    std::unordered_map<uint64_t, Acc> grid;
    grid.reserve(static_cast<size_t>(n / 2 + 16));
    const double inv = 1.0 / voxel;
    for (int64_t i = 0; i < n; ++i) {
        const uint64_t ix =
            static_cast<uint64_t>(std::floor((pts[3 * i] - mn[0]) * inv));
        const uint64_t iy =
            static_cast<uint64_t>(std::floor((pts[3 * i + 1] - mn[1]) * inv));
        const uint64_t iz =
            static_cast<uint64_t>(std::floor((pts[3 * i + 2] - mn[2]) * inv));
        const uint64_t key = (ix << 42) | (iy << 21) | iz;
        Acc& a = grid[key];
        for (int d = 0; d < 3; ++d) a.p[d] += pts[3 * i + d];
        if (cols) for (int d = 0; d < 3; ++d) a.c[d] += cols[3 * i + d];
        a.cnt += 1;
    }
    int64_t m = 0;
    for (const auto& kv : grid) {
        const Acc& a = kv.second;
        for (int d = 0; d < 3; ++d)
            out_pts[3 * m + d] = a.p[d] / static_cast<double>(a.cnt);
        if (cols && out_cols)
            for (int d = 0; d < 3; ++d)
                out_cols[3 * m + d] = a.c[d] / static_cast<double>(a.cnt);
        ++m;
    }
    return m;
}

}  // extern "C"

// 1-D temporal (Soft-)NMS — native host implementation.
//
// TPU-native framework counterpart of the reference's compiled CPU op
// (MQ/libs/utils/csrc/nms_cpu.cpp — pybind11 + ATen there). Same greedy
// semantics, clean-room implementation: a pick-max / decay / drop loop over
// an alive set (no in-place swap sort), C ABI for ctypes, OpenMP for the
// scoring inner loops. The hot path runs on TPU (vilco_tpu/ops/nms.py);
// this op serves host-side tooling (offline result fusion, scorers) and
// parity tests.
//
// Build: make -C native   (produces native/build/libnms1d.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

inline float iou_1d(float l1, float r1, float a1, float l2, float r2,
                    float a2) {
  const float inter = std::max(0.0f, std::min(r1, r2) - std::max(l1, l2));
  return inter / (a1 + a2 - inter);
}

}  // namespace

extern "C" {

// Greedy hard NMS. segs: [n,2] row-major, scores: [n].
// Writes kept indices (sorted by descending score) to out_inds, returns the
// number kept. Matches nms_1d_cpu semantics (areas += eps, ovr >= thresh
// suppresses).
int64_t nms1d_hard(const float* segs, const float* scores, int64_t n,
                   float iou_threshold, int64_t max_out, int64_t* out_inds) {
  if (n <= 0) return 0;
  constexpr float kEps = 1e-6f;
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return scores[a] > scores[b];
  });
  std::vector<char> alive(n, 1);
  int64_t kept = 0;
  for (int64_t oi = 0; oi < n && kept < max_out; ++oi) {
    const int64_t i = order[oi];
    if (!alive[i]) continue;
    out_inds[kept++] = i;
    const float li = segs[2 * i], ri = segs[2 * i + 1];
    const float ai = ri - li + kEps;
#pragma omp parallel for schedule(static)
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (!alive[j]) continue;
      const float lj = segs[2 * j], rj = segs[2 * j + 1];
      if (iou_1d(li, ri, ai, lj, rj, rj - lj + kEps) >= iou_threshold) {
        alive[j] = 0;
      }
    }
  }
  return kept;
}

// Greedy soft-NMS (method: 0 hard, 1 linear, 2 gaussian). Emits up to
// max_out rows [l, r, decayed_score] plus original indices; remaining
// segments whose decayed score drops below min_score are discarded.
// Matches softnms_1d_cpu semantics.
int64_t nms1d_soft(const float* segs, const float* scores, int64_t n,
                   float iou_threshold, float sigma, float min_score,
                   int method, int64_t max_out, float* out_dets,
                   int64_t* out_inds) {
  if (n <= 0) return 0;
  constexpr float kEps = 1e-6f;
  std::vector<float> sc(scores, scores + n);
  std::vector<char> alive(n, 1);
  int64_t kept = 0;
  while (kept < max_out) {
    int64_t best = -1;
    float best_s = -1.0f;
    for (int64_t i = 0; i < n; ++i) {
      if (alive[i] && sc[i] > best_s) {
        best_s = sc[i];
        best = i;
      }
    }
    if (best < 0) break;
    alive[best] = 0;
    const float li = segs[2 * best], ri = segs[2 * best + 1];
    out_dets[3 * kept] = li;
    out_dets[3 * kept + 1] = ri;
    out_dets[3 * kept + 2] = best_s;
    out_inds[kept] = best;
    ++kept;
    const float ai = ri - li + kEps;
#pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < n; ++j) {
      if (!alive[j]) continue;
      const float lj = segs[2 * j], rj = segs[2 * j + 1];
      const float ovr = iou_1d(li, ri, ai, lj, rj, rj - lj + kEps);
      float w = 1.0f;
      if (method == 0) {
        if (ovr >= iou_threshold) w = 0.0f;
      } else if (method == 1) {
        if (ovr >= iou_threshold) w = 1.0f - ovr;
      } else {
        w = std::exp(-(ovr * ovr) / sigma);
      }
      sc[j] *= w;
      if (sc[j] < min_score) alive[j] = 0;
    }
  }
  return kept;
}

}  // extern "C"

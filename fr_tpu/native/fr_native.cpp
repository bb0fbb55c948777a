// Native (C++) verification-scoring kernels.
//
// TPU-native replacement for the reference's numba @njit(parallel=True)
// scoring kernels (reference utils/eval.py:68-137): the LLVM-JIT surface of
// the reference maps to an AOT-compiled shared library here, loaded via
// ctypes (fr_tpu/native/__init__.py). Exact semantics:
//   score    = 1 − ‖e1 − e2‖²/4, diffs in input precision, accumulation in
//              double (numba math.pow promotes to double)
//   hist_idx = (long)((1e5 − 1) · score) into 100001-bin histograms
//
// Threaded with std::thread over pair ranges; per-thread histograms merged
// at the end (the reference's numba prange parallelised the inner loop).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {
constexpr long kBins = 100001;
constexpr double kScale = 1e5 - 1.0;

inline long bin_of(double score) {
  long idx = static_cast<long>(kScale * score);
  if (idx < 0) idx = 0;
  if (idx >= kBins) idx = kBins - 1;
  return idx;
}

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 1 : static_cast<int>(n);
}
}  // namespace

extern "C" {

// Pairwise scoring (reference utils/eval.py:68-99).
//   e1, e2 : (n, d) float32, row-major
//   labels : (n,) uint8 (0 = imposter, 1 = genuine)
//   hist_genuine, hist_imposter : (100001,) double, zero-initialised
//   scores : (n,) double
void pair_score_f32(const float* e1, const float* e2, const uint8_t* labels,
                    int64_t n, int64_t d, double* hist_genuine,
                    double* hist_imposter, double* scores) {
  int nthreads = hardware_threads();
  std::vector<std::vector<double>> hg(nthreads,
                                      std::vector<double>(kBins, 0.0));
  std::vector<std::vector<double>> hi(nthreads,
                                      std::vector<double>(kBins, 0.0));
  std::vector<std::thread> threads;
  std::atomic<int64_t> next(0);
  const int64_t chunk = 1024;

  auto work = [&](int tid) {
    for (;;) {
      int64_t start = next.fetch_add(chunk);
      if (start >= n) return;
      int64_t end = std::min(start + chunk, n);
      for (int64_t i = start; i < end; ++i) {
        double sum = 0.0;
        const float* a = e1 + i * d;
        const float* b = e2 + i * d;
        for (int64_t k = 0; k < d; ++k) {
          // diff in f32 (input precision), square/accumulate in f64 —
          // matching numba's math.pow promotion semantics.
          float df = a[k] - b[k];
          sum += static_cast<double>(df) * static_cast<double>(df);
        }
        double score = 1.0 - sum / 4.0;
        scores[i] = score;
        (labels[i] ? hg : hi)[tid][bin_of(score)] += 1.0;
      }
    }
  };
  for (int t = 0; t < nthreads; ++t) threads.emplace_back(work, t);
  for (auto& t : threads) t.join();
  for (int t = 0; t < nthreads; ++t)
    for (long b = 0; b < kBins; ++b) {
      hist_genuine[b] += hg[t][b];
      hist_imposter[b] += hi[t][b];
    }
}

// All-pairs cross scoring (reference utils/eval.py:102-137).
//   emb    : (n, d) float32
//   labels : (n,) int64
//   scores, pair_labels : (n(n-1)/2,) double in reference order
//   (i outer from 0..n-1, j inner from 0..i-1).
void cross_score_f32(const float* emb, const int64_t* labels, int64_t n,
                     int64_t d, double* hist_genuine, double* hist_imposter,
                     double* scores, double* pair_labels) {
  int nthreads = hardware_threads();
  std::vector<std::vector<double>> hg(nthreads,
                                      std::vector<double>(kBins, 0.0));
  std::vector<std::vector<double>> hi(nthreads,
                                      std::vector<double>(kBins, 0.0));
  std::vector<std::thread> threads;
  std::atomic<int64_t> next_i(0);

  auto work = [&](int tid) {
    for (;;) {
      int64_t i = next_i.fetch_add(1);
      if (i >= n) return;
      int64_t base = i * (i - 1) / 2;  // flat index of (i, j=0)
      const float* a = emb + i * d;
      for (int64_t j = 0; j < i; ++j) {
        const float* b = emb + j * d;
        double sum = 0.0;
        for (int64_t k = 0; k < d; ++k) {
          float df = b[k] - a[k];
          sum += static_cast<double>(df) * static_cast<double>(df);
        }
        double score = 1.0 - sum / 4.0;
        int64_t l = base + j;
        scores[l] = score;
        bool genuine = labels[i] == labels[j];
        pair_labels[l] = genuine ? 1.0 : 0.0;
        (genuine ? hg : hi)[tid][bin_of(score)] += 1.0;
      }
    }
  };
  for (int t = 0; t < nthreads; ++t) threads.emplace_back(work, t);
  for (auto& t : threads) t.join();
  for (int t = 0; t < nthreads; ++t)
    for (long b = 0; b < kBins; ++b) {
      hist_genuine[b] += hg[t][b];
      hist_imposter[b] += hi[t][b];
    }
}

// uint8 HWC batch gather + crop-resize-free normalisation helper used by the
// host loader: out[i] = images[index[i]] (memcpy fan-out, threaded).
void gather_u8(const uint8_t* images, const int64_t* index, int64_t n_out,
               int64_t item_bytes, uint8_t* out) {
  int nthreads = hardware_threads();
  std::vector<std::thread> threads;
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(64);
      if (i >= n_out) return;
      int64_t end = std::min(i + 64, n_out);
      for (; i < end; ++i)
        std::memcpy(out + i * item_bytes, images + index[i] * item_bytes,
                    item_bytes);
    }
  };
  for (int t = 0; t < nthreads; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
}

}  // extern "C"

// Native CPU runtime for warp_rnnt_tpu.
//
// Provides (a) a fast exact forward-backward used as the conformance oracle
// for fuzzing configurations too large for the pure-NumPy oracle, and (b)
// host-side packing utilities for the compact (padding-free) data layout —
// the roles the reference implements in its C++ bindings (offset arrays,
// workspace management: pytorch_binding/binding.cpp:141-158) and in Awni
// Hannun's CPU ref_transduce.py.  Math follows the reference semantics
// exactly (core.cu:41-370): see warp_rnnt_tpu/reference/numpy_oracle.py for
// the normative description.
//
// C ABI only; loaded via ctypes (no pybind11 in this environment).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr float kNegInf = -std::numeric_limits<float>::infinity();

inline double log_add(double a, double b) {
  if (a == -std::numeric_limits<double>::infinity()) return b;
  if (b == -std::numeric_limits<double>::infinity()) return a;
  double hi = a > b ? a : b;
  double lo = a > b ? b : a;
  return hi + std::log1p(std::exp(lo - hi));
}

enum Status : int {
  kOk = 0,
  kBadArgs = 1,
};

}  // namespace

extern "C" {

// Forward-backward for one utterance.
// log_probs: (T, U, V) row-major; labels: (U-1); outputs alphas/betas (T, U),
// grads (T, U, V) (accumulated into — caller zero-initializes), cost scalar.
int rnnt_single_fb_f32(const float* log_probs, const int* labels, int T,
                       int U, int V, int blank, float fastemit_lambda,
                       float* alphas, float* betas, float* grads,
                       float* cost) {
  if (T < 1 || U < 1 || V < 2 || blank < 0 || blank >= V) return kBadArgs;
  const auto lp = [&](int t, int u, int v) -> double {
    return static_cast<double>(log_probs[(static_cast<int64_t>(t) * U + u) * V + v]);
  };
  const auto lbl = [&](int u) -> int { return labels[u]; };
  std::vector<double> a(static_cast<size_t>(T) * U, -std::numeric_limits<double>::infinity());
  std::vector<double> b(static_cast<size_t>(T) * U, -std::numeric_limits<double>::infinity());
  const auto idx = [&](int t, int u) { return static_cast<size_t>(t) * U + u; };

  a[idx(0, 0)] = 0.0;
  for (int t = 1; t < T; ++t) a[idx(t, 0)] = a[idx(t - 1, 0)] + lp(t - 1, 0, blank);
  for (int u = 1; u < U; ++u) a[idx(0, u)] = a[idx(0, u - 1)] + lp(0, u - 1, lbl(u - 1));
  for (int t = 1; t < T; ++t)
    for (int u = 1; u < U; ++u)
      a[idx(t, u)] = log_add(a[idx(t - 1, u)] + lp(t - 1, u, blank),
                             a[idx(t, u - 1)] + lp(t, u - 1, lbl(u - 1)));

  b[idx(T - 1, U - 1)] = lp(T - 1, U - 1, blank);
  for (int t = T - 2; t >= 0; --t)
    b[idx(t, U - 1)] = b[idx(t + 1, U - 1)] + lp(t, U - 1, blank);
  for (int u = U - 2; u >= 0; --u)
    b[idx(T - 1, u)] = b[idx(T - 1, u + 1)] + lp(T - 1, u, lbl(u));
  for (int t = T - 2; t >= 0; --t)
    for (int u = U - 2; u >= 0; --u)
      b[idx(t, u)] = log_add(b[idx(t + 1, u)] + lp(t, u, blank),
                             b[idx(t, u + 1)] + lp(t, u, lbl(u)));

  const double ll = b[idx(0, 0)];
  *cost = static_cast<float>(-ll);
  for (int t = 0; t < T; ++t)
    for (int u = 0; u < U; ++u) {
      const size_t g0 = (static_cast<size_t>(t) * U + u) * V;
      if (t < T - 1) {
        grads[g0 + blank] += static_cast<float>(
            -std::exp(a[idx(t, u)] + lp(t, u, blank) + b[idx(t + 1, u)] - ll));
      } else if (u == U - 1) {
        grads[g0 + blank] +=
            static_cast<float>(-std::exp(a[idx(t, u)] + lp(t, u, blank) - ll));
      }
      if (u < U - 1) {
        grads[g0 + lbl(u)] += static_cast<float>(
            -(1.0 + fastemit_lambda) *
            std::exp(a[idx(t, u)] + lp(t, u, lbl(u)) + b[idx(t, u + 1)] - ll));
      }
    }
  for (int t = 0; t < T; ++t)
    for (int u = 0; u < U; ++u) {
      alphas[idx(t, u)] = static_cast<float>(a[idx(t, u)]);
      betas[idx(t, u)] = static_cast<float>(b[idx(t, u)]);
    }
  return kOk;
}

// Batched padded forward-backward.
// xs (N, T, U, V); ys (N, U-1); xn/yn (N).  Outputs: costs (N),
// grads (N, T, U, V) zero-initialized by the caller, alphas/betas (N, T, U)
// filled with -inf outside valid regions by the caller.
int rnnt_batch_fb_f32(const float* xs, const int* ys, const int* xn,
                      const int* yn, int N, int T, int U, int V, int blank,
                      float fastemit_lambda, float* costs, float* grads,
                      float* alphas, float* betas) {
  if (N < 1) return kBadArgs;
  for (int n = 0; n < N; ++n) {
    const int t_n = xn[n];
    const int u_n = yn[n] + 1;
    if (t_n < 1 || t_n > T || u_n < 1 || u_n > U) return kBadArgs;
    // gather the per-sample valid sub-lattice contiguously
    std::vector<float> lp(static_cast<size_t>(t_n) * u_n * V);
    for (int t = 0; t < t_n; ++t)
      for (int u = 0; u < u_n; ++u)
        std::memcpy(
            &lp[(static_cast<size_t>(t) * u_n + u) * V],
            &xs[((static_cast<int64_t>(n) * T + t) * U + u) * V],
            sizeof(float) * V);
    std::vector<float> a(static_cast<size_t>(t_n) * u_n);
    std::vector<float> b(static_cast<size_t>(t_n) * u_n);
    std::vector<float> g(static_cast<size_t>(t_n) * u_n * V, 0.0f);
    int st = rnnt_single_fb_f32(lp.data(), &ys[static_cast<int64_t>(n) * (U - 1 > 0 ? U - 1 : 0)],
                                t_n, u_n, V, blank, fastemit_lambda, a.data(),
                                b.data(), g.data(), &costs[n]);
    if (st != kOk) return st;
    for (int t = 0; t < t_n; ++t)
      for (int u = 0; u < u_n; ++u) {
        const size_t src = static_cast<size_t>(t) * u_n + u;
        const int64_t dst = (static_cast<int64_t>(n) * T + t) * U + u;
        alphas[dst] = a[src];
        betas[dst] = b[src];
        std::memcpy(&grads[dst * V], &g[src * V], sizeof(float) * V);
      }
  }
  return kOk;
}

// Compact-layout offset arrays (exclusive prefixes), reference
// binding.cpp:141-158 semantics.  Returns total STU via out param.
void rnnt_compact_offsets(const int* xn, const int* yn, int N,
                          int64_t* mem_pref, int64_t* label_pref,
                          int64_t* stu_total, int64_t* su_total) {
  int64_t mem = 0, lab = 0;
  for (int n = 0; n < N; ++n) {
    mem_pref[n] = mem;
    label_pref[n] = lab;
    mem += static_cast<int64_t>(xn[n]) * (yn[n] + 1);
    lab += yn[n];
  }
  *stu_total = mem;
  *su_total = lab;
}

// Pack padded (N, T, U, V) rows into compact (STU, V); returns rows written.
int64_t rnnt_pack_compact_f32(const float* xs, const int* xn, const int* yn,
                              int N, int T, int U, int V, float* out) {
  int64_t row = 0;
  for (int n = 0; n < N; ++n)
    for (int t = 0; t < xn[n]; ++t)
      for (int u = 0; u <= yn[n]; ++u, ++row)
        std::memcpy(&out[row * V],
                    &xs[((static_cast<int64_t>(n) * T + t) * U + u) * V],
                    sizeof(float) * V);
  return row;
}

// Pack padded labels (N, U-1) into compact (sum(yn),).
int64_t rnnt_pack_labels_i32(const int* ys, const int* yn, int N, int Um1,
                             int* out) {
  int64_t k = 0;
  for (int n = 0; n < N; ++n)
    for (int u = 0; u < yn[n]; ++u, ++k) out[k] = ys[static_cast<int64_t>(n) * Um1 + u];
  return k;
}

// Scatter compact (STU, 2) gradients back to (STU, V), scaling by the
// per-sample upstream cost gradient (reference kernel_fill_scatter_grad,
// core_compact.cu:456-484).  loc: gathered label id per row.
int rnnt_scatter_compact_grads_f32(const float* grads2, const int* loc,
                                   const float* grad_costs,
                                   const int64_t* cum_lens, int N,
                                   int64_t stu, int V, int blank,
                                   float* out) {
  int n = 0;
  for (int64_t r = 0; r < stu; ++r) {
    while (n < N - 1 && r >= cum_lens[n]) ++n;
    const float gc = grad_costs[n];
    out[r * V + blank] += grads2[r * 2] * gc;
    out[r * V + loc[r]] += grads2[r * 2 + 1] * gc;
  }
  return kOk;
}

}  // extern "C"

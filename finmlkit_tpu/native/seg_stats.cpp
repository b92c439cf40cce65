// Native host kernels for per-bar order statistics and sequential event
// scans — the latency-bound, branchy workloads that a TPU is the wrong
// engine for (tiny contiguous segments / data-dependent resets), split
// out of the device pipeline exactly the way the reference keeps them in
// Numba machine code (np.median per bar inside comp_bar_ohlcv,
// /root/reference/finmlkit/bar/base.py:306-407; cusum_filter event loop,
// /root/reference/finmlkit/sampling/filters.py:6-70).
//
// Bars are contiguous trade ranges (ci[i], ci[i+1]] so each bar's values
// sit consecutively in memory: selection is one cache-resident
// nth_element per bar, parallelized over bars with std::thread.
//
// Build: g++ -O3 -march=native -shared -fPIC (see native/__init__.py).
#include <algorithm>
#include <cstdint>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Per-bar median bracket: the two middle values of each bar's amounts
// (numpy median = their mean; averaging stays with the f64 caller).
// Empty bars yield 0 in both slots (caller masks).
void seg_median_pair(const float* vals, const int64_t* ci, int64_t n_bars,
                     float* med_a, float* med_b, int n_threads) {
    auto worker = [&](int64_t b0, int64_t b1) {
        std::vector<float> buf;
        for (int64_t i = b0; i < b1; ++i) {
            int64_t start = ci[i] + 1, end = ci[i + 1];  // inclusive end
            int64_t c = end - start + 1;
            if (c <= 0) { med_a[i] = 0.f; med_b[i] = 0.f; continue; }
            if (c == 1) { med_a[i] = vals[start]; med_b[i] = vals[start]; continue; }
            buf.assign(vals + start, vals + end + 1);
            int64_t k_hi = c / 2;              // upper middle
            std::nth_element(buf.begin(), buf.begin() + k_hi, buf.end());
            float hi = buf[k_hi];
            if (c % 2 == 1) { med_a[i] = hi; med_b[i] = hi; continue; }
            // even count: lower middle = max of the left partition
            float lo = *std::max_element(buf.begin(), buf.begin() + k_hi);
            med_a[i] = lo; med_b[i] = hi;
        }
    };
    if (n_threads <= 1 || n_bars < 256) { worker(0, n_bars); return; }
    std::vector<std::thread> ts;
    int64_t step = (n_bars + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t b0 = t * step, b1 = std::min(n_bars, b0 + step);
        if (b0 >= b1) break;
        ts.emplace_back(worker, b0, b1);
    }
    for (auto& th : ts) th.join();
}

// Fused per-bar trade-size statistics: one pass + one/two selections per
// bar yields everything comp_bar_ohlcv's median and
// comp_bar_trade_size_features need (reference
// /root/reference/finmlkit/bar/base.py:306-407, 549-612):
//   med_a/med_b  - the two middle order statistics (numpy median bracket)
//   q_a/q_b/q_lo - the percentile bracket at q (numpy linear interp:
//                  lo = floor(q*(c-1)), q_a = x_(lo), q_b = x_(lo+1))
//   sum/sumsq    - f64 accumulated sum and sum of squares of amounts
//   block_sum    - sum of amounts strictly greater than thr[i] (block
//                  prints); thr may be null to skip
// Bars are contiguous ranges (ci[i], ci[i+1]]; empty bars write zeros.
void seg_bar_stats(const float* vals, const int64_t* ci, int64_t n_bars,
                   const double* thr, double q,
                   float* med_a, float* med_b,
                   float* q_a, float* q_b, int64_t* q_lo,
                   double* sum_out, double* sumsq_out, double* block_out,
                   int n_threads) {
    auto worker = [&](int64_t b0, int64_t b1) {
        std::vector<float> buf;
        for (int64_t i = b0; i < b1; ++i) {
            int64_t start = ci[i] + 1, end = ci[i + 1];
            int64_t c = end - start + 1;
            if (c <= 0) {
                med_a[i] = med_b[i] = q_a[i] = q_b[i] = 0.f;
                q_lo[i] = 0; sum_out[i] = sumsq_out[i] = 0.0;
                if (block_out) block_out[i] = 0.0;
                continue;
            }
            double s = 0.0, ss = 0.0, blk = 0.0;
            double t = thr ? thr[i] : 0.0;
            for (int64_t j = start; j <= end; ++j) {
                double v = (double)vals[j];
                s += v; ss += v * v;
                if (thr && v > t) blk += v;
            }
            sum_out[i] = s; sumsq_out[i] = ss;
            if (block_out) block_out[i] = blk;
            if (c == 1) {
                med_a[i] = med_b[i] = q_a[i] = q_b[i] = vals[start];
                q_lo[i] = 0;
                continue;
            }
            buf.assign(vals + start, vals + end + 1);
            // median bracket via one nth_element at the upper middle
            int64_t k_hi = c / 2;
            std::nth_element(buf.begin(), buf.begin() + k_hi, buf.end());
            float hi = buf[k_hi];
            if (c % 2 == 1) { med_a[i] = hi; med_b[i] = hi; }
            else {
                float lo_m = *std::max_element(buf.begin(), buf.begin() + k_hi);
                med_a[i] = lo_m; med_b[i] = hi;
            }
            // percentile bracket; reuse the partition when lo >= k_hi
            int64_t lo = (int64_t)(q * (double)(c - 1));
            if (lo > c - 1) lo = c - 1;
            if (lo >= k_hi)
                std::nth_element(buf.begin() + k_hi, buf.begin() + lo, buf.end());
            else
                std::nth_element(buf.begin(), buf.begin() + lo, buf.end());
            float a = buf[lo];
            float b = a;
            if (lo + 1 <= c - 1)
                b = *std::min_element(buf.begin() + lo + 1, buf.end());
            q_a[i] = a; q_b[i] = b; q_lo[i] = lo;
        }
    };
    if (n_threads <= 1 || n_bars < 256) { worker(0, n_bars); return; }
    std::vector<std::thread> ts;
    int64_t step = (n_bars + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t b0 = t * step, b1 = std::min(n_bars, b0 + step);
        if (b0 >= b1) break;
        ts.emplace_back(worker, b0, b1);
    }
    for (auto& th : ts) th.join();
}

// Symmetric CUSUM event filter on log returns (reference semantics:
// /root/reference/finmlkit/sampling/filters.py:6-70 — s_neg checked
// first, strict comparisons, per-sample threshold vector). Returns the
// number of events written to out_idx (capacity n).
int64_t cusum_filter_events(const double* log_ret, const double* thr,
                            int64_t n, int64_t* out_idx) {
    double s_pos = 0.0, s_neg = 0.0;
    int64_t k = 0;
    for (int64_t i = 1; i < n; ++i) {
        double r = log_ret[i];
        double sp = s_pos + r, sn = s_neg + r;
        s_pos = sp > 0.0 ? sp : 0.0;
        s_neg = sn < 0.0 ? sn : 0.0;
        double h = thr[i];
        if (s_neg < -h) { s_neg = 0.0; out_idx[k++] = i; }
        else if (s_pos > h) { s_pos = 0.0; out_idx[k++] = i; }
    }
    return k;
}

// CUSUM bar indexer boundary scan (reference:
// /root/reference/finmlkit/bar/logic.py:152-221): symmetric CUSUM on
// log returns with per-trade threshold lam; a bar cannot close while
// timestamps[i] == timestamps[i+1]; only the triggered side resets
// (s_pos takes precedence). rets[i] = 0 where undefined. Scan starts at
// trade start+1. Returns number of boundaries written.
int64_t cusum_bar_boundaries(const double* rets, const double* lam,
                             const int64_t* ts, int64_t n, int64_t start,
                             int64_t* out_idx, int64_t max_bars) {
    double s_pos = 0.0, s_neg = 0.0;
    int64_t k = 0;
    for (int64_t i = start + 1; i < n && k < max_bars; ++i) {
        s_pos += rets[i];
        s_neg += rets[i];
        if (s_pos < 0.0) s_pos = 0.0;
        if (s_neg > 0.0) s_neg = 0.0;
        bool can_close = (i == n - 1) || (ts[i] != ts[i + 1]);
        if (!can_close) continue;
        double h = lam[i];
        if (s_pos >= h) { out_idx[k++] = i; s_pos = 0.0; }
        else if (s_neg <= -h) { out_idx[k++] = i; s_neg = 0.0; }
    }
    return k;
}

// Volume bar boundaries: cumulative volume resets to zero at each close
// (reference /root/reference/finmlkit/bar/logic.py:87-115, including
// the overshoot-discarding reset). The running total starts with trade
// 0's volume (cum_volume = volumes[0]); the threshold check starts at
// trade 1, matching the reference loop.
int64_t volume_bar_boundaries(const float* volumes, int64_t n,
                              double threshold, int64_t* out_idx,
                              int64_t max_bars) {
    if (n <= 0) return 0;
    double cum = (double)volumes[0];
    int64_t k = 0;
    for (int64_t i = 1; i < n && k < max_bars; ++i) {
        cum += (double)volumes[i];
        if (cum >= threshold) { out_idx[k++] = i; cum = 0.0; }
    }
    return k;
}

// Dollar bar boundaries: carries the remainder (cum -= threshold),
// reference /root/reference/finmlkit/bar/logic.py:118-149. The running
// total starts with trade 0's dollar value (cum = prices[0]*volumes[0]).
int64_t dollar_bar_boundaries(const double* prices, const float* volumes,
                              int64_t n, double threshold, int64_t* out_idx,
                              int64_t max_bars) {
    if (n <= 0) return 0;
    double cum = prices[0] * (double)volumes[0];
    int64_t k = 0;
    for (int64_t i = 1; i < n && k < max_bars; ++i) {
        cum += prices[i] * (double)volumes[i];
        if (cum >= threshold) { out_idx[k++] = i; cum -= threshold; }
    }
    return k;
}

}  // extern "C"

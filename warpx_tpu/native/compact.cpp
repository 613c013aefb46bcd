// Native host-side particle compaction for diagnostics/checkpoint IO.
//
// The TPU compute path is jax/XLA; this is the host runtime piece the
// reference implements in C++ inside AMReX (particle packing for plotfile
// and checkpoint IO).  Alive-masked gathers of many particle components are
// memory-bound; doing them here multithreaded and GIL-free lets a Python
// writer thread overlap diagnostics IO with the next simulation step.
//
// Plain C ABI (loaded via ctypes; no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Exclusive prefix-sum of an alive mask; returns the packed count.
// offsets must have n entries.
int64_t wxt_mask_offsets(const uint8_t* mask, int64_t n, int64_t* offsets) {
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        offsets[i] = count;
        count += mask[i] ? 1 : 0;
    }
    return count;
}

// Gather masked elements of `ncomp` arrays of f64 into packed outputs.
// srcs/dsts are arrays of pointers (one per component).  Parallel over
// components and chunks.
void wxt_compact_f64(const uint8_t* mask, const int64_t* offsets, int64_t n,
                     const double** srcs, double** dsts, int32_t ncomp,
                     int32_t nthreads) {
    if (nthreads < 1) {
        nthreads = (int32_t)std::thread::hardware_concurrency();
        if (nthreads < 1) { nthreads = 1; }
    }
    auto work = [&](int32_t tid) {
        for (int32_t c = tid; c < ncomp; c += nthreads) {
            const double* s = srcs[c];
            double* d = dsts[c];
            for (int64_t i = 0; i < n; ++i) {
                if (mask[i]) { d[offsets[i]] = s[i]; }
            }
        }
    };
    if (nthreads == 1 || ncomp == 1) {
        work(0);
        return;
    }
    std::vector<std::thread> pool;
    pool.reserve(nthreads);
    for (int32_t t = 0; t < nthreads; ++t) { pool.emplace_back(work, t); }
    for (auto& th : pool) { th.join(); }
}

// Same for f32.
void wxt_compact_f32(const uint8_t* mask, const int64_t* offsets, int64_t n,
                     const float** srcs, float** dsts, int32_t ncomp,
                     int32_t nthreads) {
    if (nthreads < 1) {
        nthreads = (int32_t)std::thread::hardware_concurrency();
        if (nthreads < 1) { nthreads = 1; }
    }
    auto work = [&](int32_t tid) {
        for (int32_t c = tid; c < ncomp; c += nthreads) {
            const float* s = srcs[c];
            float* d = dsts[c];
            for (int64_t i = 0; i < n; ++i) {
                if (mask[i]) { d[offsets[i]] = s[i]; }
            }
        }
    };
    if (nthreads == 1 || ncomp == 1) {
        work(0);
        return;
    }
    std::vector<std::thread> pool;
    pool.reserve(nthreads);
    for (int32_t t = 0; t < nthreads; ++t) { pool.emplace_back(work, t); }
    for (auto& th : pool) { th.join(); }
}

}  // extern "C"

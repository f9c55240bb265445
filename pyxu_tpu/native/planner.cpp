// Native NUFFT plan kernels (host side).
//
// The reference's NUFFT planning runs inside FINUFFT's C++ (bin-sort +
// ES-kernel evaluation, reference: src/pyxu/operator/linop/fft/nufft.py:
// 275-277 wraps finufft's native plans).  Here the device transform is
// XLA, but plan construction is host work: evaluating M*w*d ES-kernel
// taps and bin-sorting points into slabs.  This translation unit provides
// OpenMP-parallel equivalents of the numpy planners in
// pyxu_tpu/operator/linop/nufft.py (_tap_weights_np, _slab_partition_np);
// the Python side falls back to numpy when the shared library is absent.
//
// Built on demand by pyxu_tpu/native/__init__.py:
//   g++ -O3 -fopenmp -shared -fPIC planner.cpp -o <cache>/_planner.so

#include <cmath>
#include <cstdint>
#include <cstring>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

extern "C" {

// ES-kernel taps along one axis.
//   x       : (M, d) row-major float64 coordinates
//   ax      : axis to evaluate
//   h       : grid spacing (2*pi/n_f for angle-domain taps; 1.0 for the
//             type-3 frequency-domain taps — both match the numpy planner)
//   n_f     : fine-grid size along the axis (taps are stored mod n_f)
//   w, beta : ES kernel width / shape
// Outputs: idx_out (M, w) int32, wt_out (M, w) float64.
// Mirrors _tap_weights_np (nufft.py:176-198) bit-for-bit up to libm ulps.
void es_tap_weights(const double* x, long long M, int d, int ax,
                    double h, long long n_f, int w, double beta,
                    int32_t* idx_out, double* wt_out) {
    const double tw = 2.0 / (double)w;
    const double half_w = 0.5 * (double)w;
#pragma omp parallel for schedule(static)
    for (long long j = 0; j < M; ++j) {
        const double xs = x[j * d + ax] / h;
        const double i0 = std::ceil(xs - half_w);
        for (int t = 0; t < w; ++t) {
            const double idxf = i0 + (double)t;
            const double z = (idxf - xs) * tw;
            double phi = 0.0;
            if (std::fabs(z) <= 1.0) {
                double u = 1.0 - z * z;
                if (u < 0.0) u = 0.0;
                phi = std::exp(beta * (std::sqrt(u) - 1.0));
            }
            long long ii = (long long)idxf % n_f;
            if (ii < 0) ii += n_f;
            idx_out[j * w + t] = (int32_t)ii;
            wt_out[j * w + t] = phi;
        }
    }
}

// Counting-sort slab permutation (replaces argsort + python loop in
// _slab_partition_np, nufft.py:338-378).
//   slab    : (M,) int64 slab id per point, in [0, S)
//   counts  : (S,) int64 per-slab occupancy (precomputed histogram)
// Outputs:
//   perm    : (S, Mp) int32 point ids, padded with the dummy id M
//   inv     : (M,) int32 position of each point in perm.ravel()
// Stable within a slab (points keep input order), like kind="stable".
void slab_permutation(const int64_t* slab, long long M,
                      const int64_t* counts, long long S, long long Mp,
                      int32_t* perm, int32_t* inv) {
    for (long long i = 0; i < S * Mp; ++i) perm[i] = (int32_t)M;
    // exclusive prefix sum of counts = slab start ranks (serial: S is small)
    long long* start = new long long[S];
    long long* cursor = new long long[S];
    long long acc = 0;
    for (long long p = 0; p < S; ++p) {
        start[p] = acc;
        cursor[p] = acc;
        acc += counts[p];
    }
    // stable placement: points keep input order within a slab
    for (long long j = 0; j < M; ++j) {
        const long long p = slab[j];
        const long long within = cursor[p]++ - start[p];
        const long long flat = p * Mp + within;
        perm[flat] = (int32_t)j;
        inv[j] = (int32_t)flat;
    }
    delete[] cursor;
    delete[] start;
}

// Permute-and-pad tap tables into slab order (the fancy-indexing gather
// `padrow(a)[perm]` in _slab_plan, nufft.py:464-476): out[s, m, :] =
// a[perm[s, m], :] with a dummy fill row for perm == M.
void gather_rows_f64(const double* a, long long M, int w,
                     const int32_t* perm, long long S, long long Mp,
                     double fill, double* out) {
#pragma omp parallel for schedule(static)
    for (long long sm = 0; sm < S * Mp; ++sm) {
        const int32_t j = perm[sm];
        double* dst = out + sm * w;
        if (j >= M) {
            for (int t = 0; t < w; ++t) dst[t] = fill;
        } else {
            std::memcpy(dst, a + (long long)j * w, sizeof(double) * w);
        }
    }
}

void gather_rows_i32(const int32_t* a, long long M, int w,
                     const int32_t* perm, long long S, long long Mp,
                     int32_t fill, int32_t* out) {
#pragma omp parallel for schedule(static)
    for (long long sm = 0; sm < S * Mp; ++sm) {
        const int32_t j = perm[sm];
        int32_t* dst = out + sm * w;
        if (j >= M) {
            for (int t = 0; t < w; ++t) dst[t] = fill;
        } else {
            std::memcpy(dst, a + (long long)j * w, sizeof(int32_t) * w);
        }
    }
}

}  // extern "C"

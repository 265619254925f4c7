// tfhe_native — native (C++) support library for tfhe_tpu.
//
// Provides CPU-side exact implementations used as independent oracles and
// for host-side key preparation at deployment scale:
//   * exact negacyclic polynomial products over Z[X]/(X^N+1) for Torus32/64
//     (functional parity with poc_karatsuba.cpp:60-202 — written fresh as a
//     blocked schoolbook product, not a Karatsuba translation);
//   * an anticyclic FFT processor over f64 (functional parity with
//     spqlios/fft_processor_spqlios.cpp — our own table-based radix-2
//     implementation, including the exact mod-2^64 double->int64 conversion
//     the reference does with IEEE-754 bit surgery);
//   * gadget decomposition (32/64-bit offset variants).
//
// Exposed as a flat C ABI consumed through ctypes (tfhe_tpu/utils/native.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <complex>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Exact negacyclic products (wrap-around int arithmetic)
// ---------------------------------------------------------------------------

void negacyclic_mul32(int32_t* out, const int32_t* a, const int32_t* b, int n) {
    // out[i] = sum_{t<=i} a[t] b[i-t] - sum_{t>i} a[t] b[i-t+n]  (mod 2^32)
    for (int i = 0; i < n; ++i) {
        uint32_t acc = 0;
        for (int t = 0; t <= i; ++t)
            acc += (uint32_t)a[t] * (uint32_t)b[i - t];
        for (int t = i + 1; t < n; ++t)
            acc -= (uint32_t)a[t] * (uint32_t)b[i - t + n];
        out[i] = (int32_t)acc;
    }
}

void negacyclic_mul64(int64_t* out, const int32_t* a, const int64_t* b, int n) {
    for (int i = 0; i < n; ++i) {
        uint64_t acc = 0;
        for (int t = 0; t <= i; ++t)
            acc += (uint64_t)(int64_t)a[t] * (uint64_t)b[i - t];
        for (int t = i + 1; t < n; ++t)
            acc -= (uint64_t)(int64_t)a[t] * (uint64_t)b[i - t + n];
        out[i] = (int64_t)acc;
    }
}

// ---------------------------------------------------------------------------
// Anticyclic FFT processor (f64): evaluations at odd roots of unity
//   hat(a)_k = sum_j a_j w^{(2k+1) j},  w = exp(i pi / n),  k < n/2
// layout: out_re[n/2] ++ out_im[n/2] (the reference's split re/im buffer,
// fft_processor_spqlios.cpp:21-24)
// ---------------------------------------------------------------------------

namespace {
struct Tables {
    int n;
    std::vector<std::complex<double>> twist;      // w^j, j < n
    std::vector<std::complex<double>> untwist;    // conj(w^j) / n? (see use)
    std::vector<int> rev;                          // bit reversal for n
    Tables(int n_) : n(n_), twist(n_), untwist(n_), rev(n_) {
        for (int j = 0; j < n; ++j) {
            double ang = M_PI * j / n;
            twist[j] = {std::cos(ang), std::sin(ang)};
            untwist[j] = {std::cos(ang), -std::sin(ang)};
        }
        int bits = 0; while ((1 << bits) < n) ++bits;
        for (int i = 0; i < n; ++i) {
            int r = 0;
            for (int b = 0; b < bits; ++b) if (i & (1 << b)) r |= 1 << (bits - 1 - b);
            rev[i] = r;
        }
    }
};

Tables* get_tables(int n) {
    static std::vector<Tables*> cache;
    for (auto* t : cache) if (t->n == n) return t;
    cache.push_back(new Tables(n));
    return cache.back();
}

// in-place radix-2 DIT complex FFT, sign=+1: sum_j x_j e^{+2 pi i jk/n}
void cfft(std::complex<double>* x, int n, int sign, const Tables* T) {
    for (int i = 0; i < n; ++i) {
        int r = T->rev[i];
        if (i < r) std::swap(x[i], x[r]);
    }
    for (int m = 2; m <= n; m <<= 1) {
        int half = m >> 1;
        double ang0 = sign * 2.0 * M_PI / m;
        for (int base = 0; base < n; base += m) {
            for (int j = 0; j < half; ++j) {
                std::complex<double> w(std::cos(ang0 * j), std::sin(ang0 * j));
                std::complex<double> u = x[base + j];
                std::complex<double> v = x[base + j + half] * w;
                x[base + j] = u + v;
                x[base + j + half] = u - v;
            }
        }
    }
}
}  // namespace

// forward: int32 coefficients -> evaluation halves
void anticyclic_fft_i32(double* out_re, double* out_im, const int32_t* a, int n) {
    Tables* T = get_tables(n);
    std::vector<std::complex<double>> buf(n);
    for (int j = 0; j < n; ++j) buf[j] = T->twist[j] * (double)a[j];
    cfft(buf.data(), n, +1, T);
    for (int k = 0; k < n / 2; ++k) { out_re[k] = buf[k].real(); out_im[k] = buf[k].imag(); }
}

void anticyclic_fft_i64(double* out_re, double* out_im, const int64_t* a, int n) {
    Tables* T = get_tables(n);
    std::vector<std::complex<double>> buf(n);
    for (int j = 0; j < n; ++j) buf[j] = T->twist[j] * (double)a[j];
    cfft(buf.data(), n, +1, T);
    for (int k = 0; k < n / 2; ++k) { out_re[k] = buf[k].real(); out_im[k] = buf[k].imag(); }
}

// exact mod-2^64 double -> int64 (the reference's bit-surgery semantics,
// fft_processor_spqlios.cpp:105-156: the f64 value taken modulo 2^64)
static inline int64_t wrap_to_i64(double v) {
    const double TWO64 = 18446744073709551616.0;
    double m = std::fmod(std::nearbyint(v), TWO64);  // round, then exact wrap
    // m is an exact integer-valued double in (-2^64, 2^64); shift into
    // [-2^63, 2^63) with EXACT adjustments (operands within 2x of 2^64,
    // so the additions are exact by Sterbenz; adding 2^64 to a small
    // negative value directly would round away low bits).
    if (m >= TWO64 / 2) m -= TWO64;
    else if (m < -TWO64 / 2) m += TWO64;
    return (int64_t)m;
}

// inverse: evaluation halves -> torus64 coefficients (exact mod-2^64 wrap)
void anticyclic_ifft_t64(int64_t* out, const double* in_re, const double* in_im, int n) {
    Tables* T = get_tables(n);
    std::vector<std::complex<double>> buf(n);
    for (int k = 0; k < n / 2; ++k) buf[k] = {in_re[k], in_im[k]};
    for (int k = 0; k < n / 2; ++k) buf[n - 1 - k] = std::conj(buf[k]);
    cfft(buf.data(), n, -1, T);
    for (int j = 0; j < n; ++j) {
        std::complex<double> c = buf[j] * T->untwist[j];
        out[j] = wrap_to_i64(c.real() / n);
    }
}

void anticyclic_ifft_t32(int32_t* out, const double* in_re, const double* in_im, int n) {
    std::vector<int64_t> tmp(n);
    anticyclic_ifft_t64(tmp.data(), in_re, in_im, n);
    for (int j = 0; j < n; ++j) out[j] = (int32_t)(uint32_t)(uint64_t)tmp[j];
}

// pointwise mul-accumulate on split halves (LagrangeHalfCPolynomialAddMul
// parity, lagrangehalfc_impl_fma.s:76-144)
void lagrange_addmul(double* acc_re, double* acc_im,
                     const double* a_re, const double* a_im,
                     const double* b_re, const double* b_im, int ns2) {
    for (int i = 0; i < ns2; ++i) {
        double ra = a_re[i], ia = a_im[i], rb = b_re[i], ib = b_im[i];
        acc_re[i] += ra * rb - ia * ib;
        acc_im[i] += ra * ib + ia * rb;
    }
}

// ---------------------------------------------------------------------------
// Gadget decomposition
// ---------------------------------------------------------------------------

void decompose64(int32_t* out, const int64_t* x, int n, int l, int bgbit,
                 uint64_t offset) {
    uint64_t mask = (1ull << bgbit) - 1;
    int32_t half = 1 << (bgbit - 1);
    for (int j = 0; j < n; ++j) {
        uint64_t buf = (uint64_t)x[j] + offset;
        for (int p = 0; p < l; ++p) {
            int shift = 64 - (p + 1) * bgbit;
            out[p * n + j] = (int32_t)((buf >> shift) & mask) - half;
        }
    }
}

void decompose32(int32_t* out, const int32_t* x, int n, int l, int bgbit,
                 uint32_t offset) {
    uint32_t mask = (1u << bgbit) - 1;
    int32_t half = 1 << (bgbit - 1);
    for (int j = 0; j < n; ++j) {
        uint32_t buf = (uint32_t)x[j] + offset;
        for (int p = 0; p < l; ++p) {
            int shift = 32 - (p + 1) * bgbit;
            out[p * n + j] = (int32_t)((buf >> shift) & mask) - half;
        }
    }
}

}  // extern "C"

// Glue for the library-API reference TUs (see tfhe_lib_harness.h):
// allocators in the upstream alloc+placement-init style, plus the ring
// products and the evaluation-domain ("FFT") layer.
//
// Without USE_FFT the Lagrange layer is EXACT int64 negacyclic arithmetic
// (the reference's own fake-FFT pattern, poc_types.h:103-133): every
// "transform" is a copy and every pointwise op an exact negacyclic
// convolution, so tfhe_bootstrap_FFT's output is an exact integer function
// of the key material — the bit-exactness contract for the repo's gate
// pipeline (tests/test_reference_gate.py).  With USE_FFT the layer runs
// on the spqlios processor (fftp1024) like upstream, for the noise-
// envelope anchor.
#include "tfhe_lib_harness.h"
#include <cstdlib>
#include <cstring>
#include <new>

#ifdef USE_FFT
#include "lagrangehalfc_impl.h"   // FFT_Processor_Spqlios, fftp1024
#endif

// upstream numeric constants (tfhe_core): 2^32 as int64 / double
extern const int64_t _two32 = INT64_C(1) << 32;
extern const double _two32_double = (double)_two32;

// ---------------- allocators (alloc + placement init) ----------------

template <typename T, typename... A>
static T* new_obj(A... args) {
    T* p = (T*)malloc(sizeof(T));
    new (p) T(args...);
    return p;
}

template <typename T, typename... A>
static T* new_obj_array(int n, A... args) {
    T* p = (T*)malloc(n * sizeof(T));
    for (int i = 0; i < n; ++i) new (p + i) T(args...);
    return p;
}

template <typename T>
static void del_obj(T* p) { p->~T(); free(p); }

template <typename T>
static void del_obj_array(int n, T* p) {
    for (int i = 0; i < n; ++i) p[i].~T();
    free(p);
}

EXPORT TorusPolynomial* new_TorusPolynomial(int N)
    { return new_obj<TorusPolynomial>(N); }
EXPORT TorusPolynomial* new_TorusPolynomial_array(int n, int N)
    { return new_obj_array<TorusPolynomial>(n, N); }
EXPORT void delete_TorusPolynomial(TorusPolynomial* p) { del_obj(p); }
EXPORT void delete_TorusPolynomial_array(int n, TorusPolynomial* p)
    { del_obj_array(n, p); }

EXPORT IntPolynomial* new_IntPolynomial(int N)
    { return new_obj<IntPolynomial>(N); }
EXPORT IntPolynomial* new_IntPolynomial_array(int n, int N)
    { return new_obj_array<IntPolynomial>(n, N); }
EXPORT void delete_IntPolynomial(IntPolynomial* p) { del_obj(p); }
EXPORT void delete_IntPolynomial_array(int n, IntPolynomial* p)
    { del_obj_array(n, p); }

EXPORT LweSample* new_LweSample(const LweParams* params)
    { return new_obj<LweSample>(params); }
EXPORT LweSample* new_LweSample_array(int n, const LweParams* params)
    { return new_obj_array<LweSample>(n, params); }
EXPORT void delete_LweSample(LweSample* p) { del_obj(p); }
EXPORT void delete_LweSample_array(int n, LweSample* p)
    { del_obj_array(n, p); }

EXPORT LweKey* new_LweKey(const LweParams* params)
    { return new_obj<LweKey>(params); }
EXPORT void delete_LweKey(LweKey* p) { del_obj(p); }

EXPORT TLweSample* new_TLweSample(const TLweParams* params)
    { return new_obj<TLweSample>(params); }
EXPORT TLweSample* new_TLweSample_array(int n, const TLweParams* params)
    { return new_obj_array<TLweSample>(n, params); }
EXPORT void delete_TLweSample(TLweSample* p) { del_obj(p); }
EXPORT void delete_TLweSample_array(int n, TLweSample* p)
    { del_obj_array(n, p); }

EXPORT TLweSampleFFT* new_TLweSampleFFT(const TLweParams* params) {
    TLweSampleFFT* p = (TLweSampleFFT*)malloc(sizeof(TLweSampleFFT));
    init_TLweSampleFFT(p, params);
    return p;
}
EXPORT TLweSampleFFT* new_TLweSampleFFT_array(int n,
        const TLweParams* params) {
    TLweSampleFFT* p = (TLweSampleFFT*)malloc(n * sizeof(TLweSampleFFT));
    for (int i = 0; i < n; ++i) init_TLweSampleFFT(p + i, params);
    return p;
}
EXPORT void delete_TLweSampleFFT(TLweSampleFFT* p)
    { destroy_TLweSampleFFT(p); free(p); }
EXPORT void delete_TLweSampleFFT_array(int n, TLweSampleFFT* p) {
    for (int i = 0; i < n; ++i) destroy_TLweSampleFFT(p + i);
    free(p);
}

EXPORT TGswSample* new_TGswSample(const TGswParams* params) {
    TGswSample* p = (TGswSample*)malloc(sizeof(TGswSample));
    init_TGswSample(p, params);
    return p;
}
EXPORT TGswSample* new_TGswSample_array(int n, const TGswParams* params) {
    TGswSample* p = (TGswSample*)malloc(n * sizeof(TGswSample));
    for (int i = 0; i < n; ++i) init_TGswSample(p + i, params);
    return p;
}
EXPORT void delete_TGswSample(TGswSample* p)
    { destroy_TGswSample(p); free(p); }
EXPORT void delete_TGswSample_array(int n, TGswSample* p) {
    for (int i = 0; i < n; ++i) destroy_TGswSample(p + i);
    free(p);
}

EXPORT TGswSampleFFT* new_TGswSampleFFT(const TGswParams* params) {
    TGswSampleFFT* p = (TGswSampleFFT*)malloc(sizeof(TGswSampleFFT));
    init_TGswSampleFFT(p, params);
    return p;
}
EXPORT TGswSampleFFT* new_TGswSampleFFT_array(int n,
        const TGswParams* params) {
    TGswSampleFFT* p = (TGswSampleFFT*)malloc(n * sizeof(TGswSampleFFT));
    for (int i = 0; i < n; ++i) init_TGswSampleFFT(p + i, params);
    return p;
}
EXPORT void delete_TGswSampleFFT(TGswSampleFFT* p)
    { destroy_TGswSampleFFT(p); free(p); }
EXPORT void delete_TGswSampleFFT_array(int n, TGswSampleFFT* p) {
    for (int i = 0; i < n; ++i) destroy_TGswSampleFFT(p + i);
    free(p);
}

// ---------------- LWE vector helpers ----------------

EXPORT void lweCopy(LweSample* result, const LweSample* sample,
                    const LweParams* params) {
    for (int i = 0; i < params->n; ++i) result->a[i] = sample->a[i];
    result->b = sample->b;
    result->current_variance = sample->current_variance;
}

EXPORT void lweAddTo(LweSample* result, const LweSample* sample,
                     const LweParams* params) {
    for (int i = 0; i < params->n; ++i) result->a[i] += sample->a[i];
    result->b += sample->b;
    result->current_variance += sample->current_variance;
}

EXPORT void lweSubTo(LweSample* result, const LweSample* sample,
                     const LweParams* params) {
    for (int i = 0; i < params->n; ++i) result->a[i] -= sample->a[i];
    result->b -= sample->b;
    result->current_variance += sample->current_variance;
}

// ---------------- exact ring products ----------------

// result += / -= p1 * p2 mod X^N+1, exact int64 accumulation, torus wrap
static void addmul_negacyclic(Torus32* res, const int* p1, const Torus32* p2,
                              int N, int sign) {
    for (int i = 0; i < N; ++i) {
        int64_t acc = 0;
        for (int j = 0; j <= i; ++j)
            acc += (int64_t)p1[j] * p2[i - j];
        for (int j = i + 1; j < N; ++j)
            acc -= (int64_t)p1[j] * p2[N + i - j];
        res[i] += sign * (Torus32)(uint32_t)(uint64_t)acc;
    }
}

EXPORT void torusPolynomialAddMulR(TorusPolynomial* result,
        const IntPolynomial* p1, const TorusPolynomial* p2) {
    addmul_negacyclic(result->coefsT, p1->coefs, p2->coefsT, p1->N, +1);
}

EXPORT void torusPolynomialSubMulR(TorusPolynomial* result,
        const IntPolynomial* p1, const TorusPolynomial* p2) {
    addmul_negacyclic(result->coefsT, p1->coefs, p2->coefsT, p1->N, -1);
}

// ---------------- evaluation-domain layer ----------------

#ifndef USE_FFT
// EXACT variant: c holds coefficients as int64; transforms are copies and
// AddMul is an exact negacyclic convolution.  The reverse transform of an
// int polynomial stores ints; of a torus polynomial stores torus values;
// products therefore carry (digit x torus) sums whose magnitude is bounded
// by kpl * N * halfBg * 2^31 < 2^63 for the gate parameter sets.

EXPORT void init_LagrangeHalfCPolynomial(LagrangeHalfCPolynomial* obj,
                                         int N) {
    obj->N = N;
    obj->c = new int64_t[N]();
}
EXPORT void destroy_LagrangeHalfCPolynomial(LagrangeHalfCPolynomial* obj)
    { delete[] obj->c; }

EXPORT void LagrangeHalfCPolynomialClear(LagrangeHalfCPolynomial* result) {
    for (int i = 0; i < result->N; ++i) result->c[i] = 0;
}

static void lag_addmul(LagrangeHalfCPolynomial* result,
                       const LagrangeHalfCPolynomial* a,
                       const LagrangeHalfCPolynomial* b) {
    const int N = result->N;
    for (int i = 0; i < N; ++i) {
        int64_t acc = 0;
        for (int j = 0; j <= i; ++j)
            acc += a->c[j] * b->c[i - j];
        for (int j = i + 1; j < N; ++j)
            acc -= a->c[j] * b->c[N + i - j];
        result->c[i] += acc;
    }
}

EXPORT void LagrangeHalfCPolynomialMul(LagrangeHalfCPolynomial* result,
        const LagrangeHalfCPolynomial* a, const LagrangeHalfCPolynomial* b) {
    LagrangeHalfCPolynomialClear(result);
    lag_addmul(result, a, b);
}

EXPORT void LagrangeHalfCPolynomialAddMul(LagrangeHalfCPolynomial* result,
        const LagrangeHalfCPolynomial* a, const LagrangeHalfCPolynomial* b) {
    lag_addmul(result, a, b);
}

EXPORT void LagrangeHalfCPolynomialAddTorusConstant(
        LagrangeHalfCPolynomial* result, Torus32 cst) {
    result->c[0] += (int64_t)cst;
}

EXPORT void IntPolynomial_ifft(LagrangeHalfCPolynomial* result,
                               const IntPolynomial* p) {
    for (int i = 0; i < p->N; ++i) result->c[i] = p->coefs[i];
}

EXPORT void TorusPolynomial_ifft(LagrangeHalfCPolynomial* result,
                                 const TorusPolynomial* p) {
    for (int i = 0; i < p->N; ++i) result->c[i] = p->coefsT[i];
}

EXPORT void TorusPolynomial_fft(TorusPolynomial* result,
                                const LagrangeHalfCPolynomial* p) {
    for (int i = 0; i < p->N; ++i)
        result->coefsT[i] = (Torus32)(uint32_t)(uint64_t)p->c[i];
}

#else  // USE_FFT: the spqlios processor at N=1024 (upstream gate ring)

EXPORT void init_LagrangeHalfCPolynomial(LagrangeHalfCPolynomial* obj,
                                         int N) {
    obj->N = N;
    obj->c = new int64_t[N]();      // stores N doubles (reinterpreted)
}
EXPORT void destroy_LagrangeHalfCPolynomial(LagrangeHalfCPolynomial* obj)
    { delete[] obj->c; }

static double* dbl(const LagrangeHalfCPolynomial* p)
    { return (double*)p->c; }

EXPORT void LagrangeHalfCPolynomialClear(LagrangeHalfCPolynomial* result) {
    for (int i = 0; i < result->N; ++i) dbl(result)[i] = 0.0;
}

EXPORT void LagrangeHalfCPolynomialAddMul(LagrangeHalfCPolynomial* result,
        const LagrangeHalfCPolynomial* a, const LagrangeHalfCPolynomial* b) {
    const int Ns2 = result->N / 2;
    double* rr = dbl(result); double* ri = rr + Ns2;
    const double* ar = dbl(a); const double* ai = ar + Ns2;
    const double* br = dbl(b); const double* bi = br + Ns2;
    for (int i = 0; i < Ns2; ++i) {
        rr[i] += ar[i] * br[i] - ai[i] * bi[i];
        ri[i] += ar[i] * bi[i] + ai[i] * br[i];
    }
}

EXPORT void LagrangeHalfCPolynomialMul(LagrangeHalfCPolynomial* result,
        const LagrangeHalfCPolynomial* a, const LagrangeHalfCPolynomial* b) {
    LagrangeHalfCPolynomialClear(result);
    LagrangeHalfCPolynomialAddMul(result, a, b);
}

EXPORT void LagrangeHalfCPolynomialAddTorusConstant(
        LagrangeHalfCPolynomial* result, Torus32 cst) {
    const int Ns2 = result->N / 2;
    const double v = cst / 4294967296.0;
    for (int i = 0; i < Ns2; ++i) dbl(result)[i] += v;
}

EXPORT void IntPolynomial_ifft(LagrangeHalfCPolynomial* result,
                               const IntPolynomial* p) {
    fftp1024.execute_reverse_int(dbl(result), p->coefs);
}

EXPORT void TorusPolynomial_ifft(LagrangeHalfCPolynomial* result,
                                 const TorusPolynomial* p) {
    fftp1024.execute_reverse_torus32(dbl(result), p->coefsT);
}

EXPORT void TorusPolynomial_fft(TorusPolynomial* result,
                                const LagrangeHalfCPolynomial* p) {
    fftp1024.execute_direct_torus32(result->coefsT, dbl(p));
}
#endif

EXPORT void init_LagrangeHalfCPolynomial_array(int n,
        LagrangeHalfCPolynomial* obj, int N) {
    for (int i = 0; i < n; ++i) init_LagrangeHalfCPolynomial(obj + i, N);
}
EXPORT void destroy_LagrangeHalfCPolynomial_array(int n,
        LagrangeHalfCPolynomial* obj) {
    for (int i = 0; i < n; ++i) destroy_LagrangeHalfCPolynomial(obj + i);
}

// Harness header for compiling the reference's LIBRARY-API translation
// units (lwe_functions.cpp / tlwe_functions.cpp / tgsw_functions.cpp /
// numeric_functions.cpp — SURVEY.md §2 R1-R6) standalone, the same way
// ref_dump.cpp compiles the PoC TU.  Those files are function-body dumps
// of the upstream TFHE API with every class DEFINITION missing (they were
// never part of the reference build, src/Makefile:8-15); this header
// reconstructs exactly the struct layouts their constructors and accessors
// require, plus declarations for the allocator/ring-product helpers the
// TUs call (implemented in tfhe_lib_glue.cpp).
//
// The glue's LagrangeHalfCPolynomial is the reference's own "fake FFT"
// idea (poc_types.h:103-133 under !USE_FFT): an exact int64 coefficient
// container, so tfhe_bootstrap_FFT computes an exact integer result the
// repo's exact MXU pipeline must reproduce BIT-FOR-BIT.
#pragma once
#include <cstdint>
#include <climits>
#include <random>

#define EXPORT

typedef int32_t Torus32;

extern std::default_random_engine generator;
extern std::uniform_int_distribution<Torus32> uniformTorus32_distrib;
extern std::uniform_int_distribution<int> uniformInt_distrib;
extern const int64_t _two32;
extern const double _two32_double;

// ---- numeric_functions.cpp exports used across TUs ----
EXPORT Torus32 gaussian32(Torus32 message, double sigma);
EXPORT Torus32 dtot32(double d);
EXPORT double t32tod(Torus32 x);
EXPORT Torus32 approxPhase(Torus32 phase, int Msize);
EXPORT int modSwitchFromTorus32(Torus32 phase, int Msize);
EXPORT Torus32 modSwitchToTorus32(int mu, int Msize);

// ---- polynomial containers (upstream layout) ----
struct TorusPolynomial {
    int N;
    Torus32* coefsT;
    TorusPolynomial(int N) : N(N), coefsT(new Torus32[N]) {}
    ~TorusPolynomial() { delete[] coefsT; }
};

struct IntPolynomial {
    int N;
    int* coefs;
    IntPolynomial(int N) : N(N), coefs(new int[N]) {}
    ~IntPolynomial() { delete[] coefs; }
};

// exact evaluation-domain stand-in: int64 coefficients (never overflows —
// digit magnitudes are <= halfBg and products accumulate over kpl*N terms)
struct LagrangeHalfCPolynomial {
    int N;
    int64_t* c;
};

// ---- LWE layer ----
struct LweParams {
    int n;
    double alpha_min, alpha_max;
    LweParams(int n, double alpha_min, double alpha_max);
    ~LweParams();
};

struct LweSample {
    Torus32* a;
    Torus32 b;
    double current_variance;
    LweSample(const LweParams* params);
    ~LweSample();
};

struct LweKey {
    const LweParams* params;
    int* key;
    LweKey(const LweParams* params);
    ~LweKey();
};

struct LweKeySwitchKey {
    int n, t, basebit, base;
    const LweParams* out_params;
    LweSample* ks0_raw;     // n*t*base contiguous samples
    LweSample** ks1_raw;
    LweSample*** ks;
    LweKeySwitchKey(int n, int t, int basebit, const LweParams* out_params,
                    LweSample* ks0_raw);
    ~LweKeySwitchKey();
};

// ---- TLWE layer ----
struct TLweParams {
    int N, k;
    double alpha_min, alpha_max;
    LweParams extracted_lweparams;
    TLweParams(int N, int k, double alpha_min, double alpha_max);
    ~TLweParams();
};

struct TLweKey {
    const TLweParams* params;
    IntPolynomial* key;
    TLweKey(const TLweParams* params);
    ~TLweKey();
};

struct TLweSample {
    TorusPolynomial* a;
    TorusPolynomial* b;     // alias &a[k]
    double current_variance;
    int k;
    TLweSample(const TLweParams* params);
    ~TLweSample();
};

struct TLweSampleFFT {
    LagrangeHalfCPolynomial* a;
    LagrangeHalfCPolynomial* b;   // alias &a[k]
    double current_variance;
    int k;
    TLweSampleFFT(const TLweParams* params, LagrangeHalfCPolynomial* arr,
                  double current_variance);
    ~TLweSampleFFT();
};

// ---- TGSW layer ----
struct TGswParams {
    int l, Bgbit, Bg;
    int32_t halfBg;
    uint32_t maskMod;
    const TLweParams* tlwe_params;
    int kpl;
    Torus32* h;
    uint32_t offset;
    TGswParams(int l, int Bgbit, const TLweParams* tlwe_params);
    ~TGswParams();
};

struct TGswKey {
    const TGswParams* params;
    const TLweParams* tlwe_params;
    TLweKey tlwe_key;
    IntPolynomial* key;     // alias tlwe_key.key
    TGswKey(const TGswParams* params);
    ~TGswKey();
};

struct TGswSample {
    TLweSample* all_sample;       // (k+1)*l row-major (bloc, level)
    TLweSample** bloc_sample;
    int k, l;
    TGswSample(TLweSample* all_sample, TLweSample** bloc_sample,
               int k, int l)
        : all_sample(all_sample), bloc_sample(bloc_sample), k(k), l(l) {}
    ~TGswSample() {}
};

struct TGswSampleFFT {
    TLweSampleFFT* all_samples;
    TLweSampleFFT** sample;
    int k, l;
    TGswSampleFFT(const TGswParams* params, TLweSampleFFT* all_samples_raw);
    ~TGswSampleFFT();
};

// ---- bootstrapping keys ----
struct LweBootstrappingKey {
    const LweParams* in_out_params;
    const TGswParams* bk_params;
    const TLweParams* accum_params;
    const LweParams* extract_params;
    TGswSample* bk;
    LweKeySwitchKey* ks;
    LweBootstrappingKey(const LweParams* in_out_params,
                        const TGswParams* bk_params,
                        const TLweParams* accum_params,
                        const LweParams* extract_params,
                        TGswSample* bk, LweKeySwitchKey* ks);
    ~LweBootstrappingKey();
};

struct LweBootstrappingKeyFFT {
    const LweParams* in_out_params;
    const TGswParams* bk_params;
    const TLweParams* accum_params;
    const LweParams* extract_params;
    const TGswSampleFFT* bkFFT;
    const LweKeySwitchKey* ks;
    LweBootstrappingKeyFFT(const LweParams* in_out_params,
                           const TGswParams* bk_params,
                           const TLweParams* accum_params,
                           const LweParams* extract_params,
                           const TGswSampleFFT* bkFFT,
                           const LweKeySwitchKey* ks);
    ~LweBootstrappingKeyFFT();
};

// ---- allocators + ring products implemented in tfhe_lib_glue.cpp ----
EXPORT TorusPolynomial* new_TorusPolynomial(int N);
EXPORT TorusPolynomial* new_TorusPolynomial_array(int n, int N);
EXPORT void delete_TorusPolynomial(TorusPolynomial* p);
EXPORT void delete_TorusPolynomial_array(int n, TorusPolynomial* p);
EXPORT IntPolynomial* new_IntPolynomial(int N);
EXPORT IntPolynomial* new_IntPolynomial_array(int n, int N);
EXPORT void delete_IntPolynomial(IntPolynomial* p);
EXPORT void delete_IntPolynomial_array(int n, IntPolynomial* p);
EXPORT LweSample* new_LweSample(const LweParams* params);
EXPORT LweSample* new_LweSample_array(int n, const LweParams* params);
EXPORT void delete_LweSample(LweSample* p);
EXPORT void delete_LweSample_array(int n, LweSample* p);
EXPORT LweKey* new_LweKey(const LweParams* params);
EXPORT void delete_LweKey(LweKey* p);
EXPORT TLweSample* new_TLweSample(const TLweParams* params);
EXPORT TLweSample* new_TLweSample_array(int n, const TLweParams* params);
EXPORT void delete_TLweSample(TLweSample* p);
EXPORT void delete_TLweSample_array(int n, TLweSample* p);
EXPORT TLweSampleFFT* new_TLweSampleFFT(const TLweParams* params);
EXPORT TLweSampleFFT* new_TLweSampleFFT_array(int n, const TLweParams* params);
EXPORT void delete_TLweSampleFFT(TLweSampleFFT* p);
EXPORT void delete_TLweSampleFFT_array(int n, TLweSampleFFT* p);
EXPORT TGswSample* new_TGswSample(const TGswParams* params);
EXPORT TGswSample* new_TGswSample_array(int n, const TGswParams* params);
EXPORT void delete_TGswSample(TGswSample* p);
EXPORT void delete_TGswSample_array(int n, TGswSample* p);
EXPORT TGswSampleFFT* new_TGswSampleFFT(const TGswParams* params);
EXPORT TGswSampleFFT* new_TGswSampleFFT_array(int n, const TGswParams* params);
EXPORT void delete_TGswSampleFFT(TGswSampleFFT* p);
EXPORT void delete_TGswSampleFFT_array(int n, TGswSampleFFT* p);

EXPORT void init_LagrangeHalfCPolynomial(LagrangeHalfCPolynomial* obj, int N);
EXPORT void init_LagrangeHalfCPolynomial_array(int n,
        LagrangeHalfCPolynomial* obj, int N);
EXPORT void destroy_LagrangeHalfCPolynomial(LagrangeHalfCPolynomial* obj);
EXPORT void destroy_LagrangeHalfCPolynomial_array(int n,
        LagrangeHalfCPolynomial* obj);
EXPORT void LagrangeHalfCPolynomialClear(LagrangeHalfCPolynomial* result);
EXPORT void LagrangeHalfCPolynomialMul(LagrangeHalfCPolynomial* result,
        const LagrangeHalfCPolynomial* a, const LagrangeHalfCPolynomial* b);
EXPORT void LagrangeHalfCPolynomialAddMul(LagrangeHalfCPolynomial* result,
        const LagrangeHalfCPolynomial* a, const LagrangeHalfCPolynomial* b);
EXPORT void LagrangeHalfCPolynomialAddTorusConstant(
        LagrangeHalfCPolynomial* result, Torus32 cst);
EXPORT void IntPolynomial_ifft(LagrangeHalfCPolynomial* result,
        const IntPolynomial* p);
EXPORT void TorusPolynomial_ifft(LagrangeHalfCPolynomial* result,
        const TorusPolynomial* p);
EXPORT void TorusPolynomial_fft(TorusPolynomial* result,
        const LagrangeHalfCPolynomial* p);
EXPORT void torusPolynomialAddMulR(TorusPolynomial* result,
        const IntPolynomial* p1, const TorusPolynomial* p2);
EXPORT void torusPolynomialSubMulR(TorusPolynomial* result,
        const IntPolynomial* p1, const TorusPolynomial* p2);
EXPORT void lweCopy(LweSample* result, const LweSample* sample,
        const LweParams* params);
EXPORT void lweAddTo(LweSample* result, const LweSample* sample,
        const LweParams* params);
EXPORT void lweSubTo(LweSample* result, const LweSample* sample,
        const LweParams* params);

// ---- cross-TU declarations (defined inside the reference TUs) ----
EXPORT void tfhe_random_generator_setSeed(uint32_t* values, int size);
EXPORT void torusPolynomialClear(TorusPolynomial* result);
EXPORT void torusPolynomialUniform(TorusPolynomial* result);
EXPORT void torusPolynomialCopy(TorusPolynomial* result,
        const TorusPolynomial* sample);
EXPORT void torusPolynomialAdd(TorusPolynomial* result,
        const TorusPolynomial* p1, const TorusPolynomial* p2);
EXPORT void torusPolynomialAddTo(TorusPolynomial* result,
        const TorusPolynomial* p2);
EXPORT void torusPolynomialSub(TorusPolynomial* result,
        const TorusPolynomial* p1, const TorusPolynomial* p2);
EXPORT void torusPolynomialSubTo(TorusPolynomial* result,
        const TorusPolynomial* p2);
EXPORT void torusPolynomialAddMulZTo(TorusPolynomial* result, int p,
        const TorusPolynomial* p2);
EXPORT void torusPolynomialSubMulZTo(TorusPolynomial* result, int p,
        const TorusPolynomial* p2);
EXPORT void torusPolynomialMulByXaiMinusOne(TorusPolynomial* result, int a,
        const TorusPolynomial* source);
EXPORT void torusPolynomialMulByXai(TorusPolynomial* result, int a,
        const TorusPolynomial* source);
EXPORT double intPolynomialNormSq2(const IntPolynomial* p);
EXPORT LagrangeHalfCPolynomial* new_LagrangeHalfCPolynomial(int N);
EXPORT LagrangeHalfCPolynomial* new_LagrangeHalfCPolynomial_array(int n,
        int N);
EXPORT void delete_LagrangeHalfCPolynomial(LagrangeHalfCPolynomial* obj);
EXPORT void delete_LagrangeHalfCPolynomial_array(int n,
        LagrangeHalfCPolynomial* obj);

EXPORT void lweKeyGen(LweKey* result);
EXPORT void lweSymEncrypt(LweSample* result, Torus32 message, double alpha,
        const LweKey* key);
EXPORT Torus32 lwePhase(const LweSample* sample, const LweKey* key);
EXPORT void lweNoiselessTrivial(LweSample* result, Torus32 mu,
        const LweParams* params);
EXPORT LweKeySwitchKey* new_LweKeySwitchKey(int n, int t, int basebit,
        const LweParams* out_params);
EXPORT void delete_LweKeySwitchKey(LweKeySwitchKey* obj);
EXPORT void lweCreateKeySwitchKey(LweKeySwitchKey* result,
        const LweKey* in_key, const LweKey* out_key);
EXPORT void lweKeySwitch(LweSample* result, const LweKeySwitchKey* ks,
        const LweSample* sample);
EXPORT LweBootstrappingKey* new_LweBootstrappingKey(const int ks_t,
        const int ks_basebit, const LweParams* in_out_params,
        const TGswParams* bk_params);
EXPORT void tfhe_createLweBootstrappingKey(LweBootstrappingKey* bk,
        const LweKey* key_in, const TGswKey* rgsw_key);
EXPORT LweBootstrappingKeyFFT* new_LweBootstrappingKeyFFT(
        const LweBootstrappingKey* bk);
EXPORT void tfhe_bootstrap_woKS_FFT(LweSample* result,
        const LweBootstrappingKeyFFT* bk, Torus32 mu, const LweSample* x);
EXPORT void tfhe_bootstrap_FFT(LweSample* result,
        const LweBootstrappingKeyFFT* bk, Torus32 mu, const LweSample* x);

EXPORT void tLweKeyGen(TLweKey* result);
EXPORT void tLweSymEncryptZero(TLweSample* result, double alpha,
        const TLweKey* key);
EXPORT void tLwePhase(TorusPolynomial* phase, const TLweSample* sample,
        const TLweKey* key);
EXPORT void tLweClear(TLweSample* result, const TLweParams* params);
EXPORT void tLweCopy(TLweSample* result, const TLweSample* sample,
        const TLweParams* params);
EXPORT void tLweNoiselessTrivial(TLweSample* result,
        const TorusPolynomial* mu, const TLweParams* params);
EXPORT void tLweAddTo(TLweSample* result, const TLweSample* sample,
        const TLweParams* params);
EXPORT void tLweAddMulRTo(TLweSample* result, const IntPolynomial* p,
        const TLweSample* sample, const TLweParams* params);
EXPORT void tLweMulByXaiMinusOne(TLweSample* result, int ai,
        const TLweSample* bk, const TLweParams* params);
EXPORT void tLweToFFTConvert(TLweSampleFFT* result, const TLweSample* source,
        const TLweParams* params);
EXPORT void tLweFromFFTConvert(TLweSample* result,
        const TLweSampleFFT* source, const TLweParams* params);
EXPORT void tLweFFTClear(TLweSampleFFT* result, const TLweParams* params);
EXPORT void tLweFFTAddMulRTo(TLweSampleFFT* result,
        const LagrangeHalfCPolynomial* p, const TLweSampleFFT* sample,
        const TLweParams* params);
EXPORT void tLweExtractLweSample(LweSample* result, const TLweSample* x,
        const LweParams* params, const TLweParams* rparams);
EXPORT void tLweExtractKey(LweKey* result, const TLweKey* key);
EXPORT void init_TLweSample(TLweSample* obj, const TLweParams* params);
EXPORT void destroy_TLweSample(TLweSample* obj);
EXPORT void init_TLweSampleFFT(TLweSampleFFT* obj, const TLweParams* params);
EXPORT void destroy_TLweSampleFFT(TLweSampleFFT* obj);

EXPORT void tGswKeyGen(TGswKey* result);
EXPORT void tGswSymEncryptInt(TGswSample* result, const int message,
        double alpha, const TGswKey* key);
EXPORT void tGswEncryptZero(TGswSample* result, double alpha,
        const TGswKey* key);
EXPORT void tGswAddMuIntH(TGswSample* result, const int message,
        const TGswParams* params);
EXPORT void tGswTorus32PolynomialDecompH(IntPolynomial* result,
        const TorusPolynomial* sample, const TGswParams* params);
EXPORT void tGswTLweDecompH(IntPolynomial* result, const TLweSample* sample,
        const TGswParams* params);
EXPORT void tGswToFFTConvert(TGswSampleFFT* result, const TGswSample* source,
        const TGswParams* params);
EXPORT void tGswFFTExternMulToTLwe(TLweSample* accum,
        const TGswSampleFFT* gsw, const TGswParams* params);
EXPORT void init_TGswSample(TGswSample* obj, const TGswParams* params);
EXPORT void destroy_TGswSample(TGswSample* obj);
EXPORT void init_TGswSampleFFT(TGswSampleFFT* obj, const TGswParams* params);
EXPORT void destroy_TGswSampleFFT(TGswSampleFFT* obj);

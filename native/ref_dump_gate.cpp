// Composed GATE-BOOTSTRAP anchor (VERDICT r3 item 4): drives the
// reference's library-API TUs (lwe/tlwe/tgsw/numeric_functions.cpp,
// compiled standalone via tfhe_lib_harness.h + tfhe_lib_glue.cpp) through
// the full upstream pipeline
//
//     tfhe_createLweBootstrappingKey -> new_LweBootstrappingKeyFFT ->
//     tfhe_bootstrap_FFT            (lwe_functions.cpp:328-446)
//
// at the upstream default gate parameters (n=630 / N=1024 / k=1 / l=3 /
// Bgbit=7 / ks t=8 basebit=2 — the repo's GATE_DEFAULT), and dumps the
// complete key material + inputs + composed outputs:
//
//   gate_lwe_key.i32   (n)                    in/out LWE secret key
//   gate_ring_key.i32  (k*N)                  accumulator ring key
//   gate_bk.i32        (n, kpl, k+1, N)       raw bootstrapping TGSWs
//   gate_ks.i32        (k*N, t, base, n+1)    raw key-switch table
//   gate_x<i>.i32      (n+1)                  input ciphertexts
//   gate_u<i>.i32      (k*N+1)                tfhe_bootstrap_woKS_FFT out
//   gate_y<i>.i32      (n+1)                  tfhe_bootstrap_FFT out
//
// The exact build (no USE_FFT: glue's int64 Lagrange layer) makes every
// output an exact integer function of the dumped keys — the repo's gate
// pipeline must match BIT-FOR-BIT (tests/test_reference_gate.py).

#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <string>
#include "tfhe_lib_harness.h"

static std::string g_dir;

template <typename T>
static void dump(const char* name, const T* p, long n) {
    std::string path = g_dir + "/" + name;
    FILE* f = fopen(path.c_str(), "wb");
    if (!f) { perror(path.c_str()); exit(1); }
    if (fwrite(p, sizeof(T), n, f) != (size_t)n) { perror(name); exit(1); }
    fclose(f);
}

int main(int argc, char** argv) {
    g_dir = argc > 1 ? argv[1] : "fixtures";
    uint32_t seed[] = {0x1234u, 0x5678u, 0x9abcu};
    tfhe_random_generator_setSeed(seed, 3);

    // upstream default gate parameters (repo GATE_DEFAULT)
    const int n = 630, N = 1024, k = 1, l = 3, Bgbit = 7;
    const int ks_t = 8, ks_basebit = 2;
    LweParams* in_out = new LweParams(n, pow(2., -15.), 0.);
    TLweParams* accum = new TLweParams(N, k, pow(2., -25.), 0.);
    TGswParams* bk_params = new TGswParams(l, Bgbit, accum);

    LweKey* key = new_LweKey(in_out);
    lweKeyGen(key);
    TGswKey rgsw(bk_params);
    tGswKeyGen(&rgsw);

    LweBootstrappingKey* bk =
        new_LweBootstrappingKey(ks_t, ks_basebit, in_out, bk_params);
    tfhe_createLweBootstrappingKey(bk, key, &rgsw);
    LweBootstrappingKeyFFT* bkFFT = new_LweBootstrappingKeyFFT(bk);

    dump("gate_lwe_key.i32", key->key, n);
    {   // ring key as k*N ints
        int* rk = new int[k * N];
        for (int i = 0; i < k; ++i)
            for (int j = 0; j < N; ++j)
                rk[i * N + j] = rgsw.tlwe_key.key[i].coefs[j];
        dump("gate_ring_key.i32", rk, k * N);
        delete[] rk;
    }
    {   // raw bk: (n, kpl, k+1, N)
        const int kpl = bk_params->kpl;
        Torus32* buf = new Torus32[(long)n * kpl * (k + 1) * N];
        long q = 0;
        for (int i = 0; i < n; ++i)
            for (int p = 0; p < kpl; ++p)
                for (int u = 0; u <= k; ++u)
                    for (int j = 0; j < N; ++j)
                        buf[q++] = bk->bk[i].all_sample[p].a[u].coefsT[j];
        dump("gate_bk.i32", buf, q);
        delete[] buf;
    }
    {   // raw ks: (k*N, t, base, n+1), b at position n
        const int base = 1 << ks_basebit;
        Torus32* buf = new Torus32[(long)k * N * ks_t * base * (n + 1)];
        long q = 0;
        for (int i = 0; i < k * N; ++i)
            for (int j = 0; j < ks_t; ++j)
                for (int p = 0; p < base; ++p) {
                    const LweSample* s = &bk->ks->ks[i][j][p];
                    for (int w = 0; w < n; ++w) buf[q++] = s->a[w];
                    buf[q++] = s->b;
                }
        dump("gate_ks.i32", buf, q);
        delete[] buf;
    }

    // four inputs: two Trues, two Falses (mu = +-1/8), composed pipeline
    const Torus32 mu = 1 << 29;
    LweSample* x = new_LweSample(in_out);
    LweSample* u = new_LweSample(&accum->extracted_lweparams);
    LweSample* y = new_LweSample(in_out);
    for (int i = 0; i < 4; ++i) {
        Torus32 msg = (i & 1) ? mu : -mu;
        lweSymEncrypt(x, msg, pow(2., -15.), key);
        char name[32];
        snprintf(name, sizeof name, "gate_x%d.i32", i);
        {   Torus32* buf = new Torus32[n + 1];
            for (int w = 0; w < n; ++w) buf[w] = x->a[w];
            buf[n] = x->b;
            dump(name, buf, n + 1); delete[] buf; }
        tfhe_bootstrap_woKS_FFT(u, bkFFT, mu, x);
        snprintf(name, sizeof name, "gate_u%d.i32", i);
        {   Torus32* buf = new Torus32[k * N + 1];
            for (int w = 0; w < k * N; ++w) buf[w] = u->a[w];
            buf[k * N] = u->b;
            dump(name, buf, k * N + 1); delete[] buf; }
        tfhe_bootstrap_FFT(y, bkFFT, mu, x);
        snprintf(name, sizeof name, "gate_y%d.i32", i);
        {   Torus32* buf = new Torus32[n + 1];
            for (int w = 0; w < n; ++w) buf[w] = y->a[w];
            buf[n] = y->b;
            dump(name, buf, n + 1); delete[] buf; }
        // sanity: decrypt (phase sign must match the message sign)
        Torus32 ph = lwePhase(y, key);
        fprintf(stderr, "input %d: msg=%d phase(out)=%d %s\n", i, msg, ph,
                ((ph > 0) == (msg > 0)) ? "OK" : "WRONG");
        if ((ph > 0) != (msg > 0)) return 1;
    }
    fprintf(stderr, "ref_dump_gate: all outputs dumped to %s\n",
            g_dir.c_str());
    return 0;
}

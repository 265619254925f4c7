// Bit-exactness anchor: drives the reference PoC (included below as a
// translation unit from /root/reference/parallel/src, which is the
// circuit-bootstrapping sources minus main()) compiled with -DFALSE_RANDOM,
// and dumps stage vectors as raw little-endian binaries under fixtures/.
//
// Two builds (see Makefile):
//   ref_dump_fft    -DUSE_FFT : the production spqlios path (asm FFT);
//   ref_dump_exact  (no USE_FFT): the exact Karatsuba fallback oracle.
//
// Sources anchored (reference file:line):
//   keygen            poc_CircuitBootstrapping.cpp:342-423 (Globals ctor)
//   lwe32Encrypt_lvl1 poc_CircuitBootstrapping.cpp:98-106
//   preKeySwitch      poc_CircuitBootstrapping.cpp:437-465
//   preModSwitch      poc_CircuitBootstrapping.cpp:472-484
//   decomposition     poc_CircuitBootstrapping.cpp:492-527
//   Karatsuba         poc_karatsuba.cpp:60-202
//   FFT processor     spqlios/fft_processor_spqlios.cpp:18-170
//   external product  poc_CircuitBootstrapping.cpp:608-632 (CMux inner body)
//   circuitPrivKS     poc_CircuitBootstrapping.cpp:667-698
//
// The blind-rotation *loop* itself is NOT dumped end-to-end: its rotation
// has a heap out-of-bounds read for aibar >= N (:596-597, ASan-verified;
// see PARITY.md), so its output depends on heap layout and is not a stable
// fixture. The in-bounds CMux body (decomp -> ifft -> addmul -> fft -> add)
// is anchored instead, plus the (buggy-but-in-bounds) aibar < N rotation
// branch so the documented deviation is itself pinned.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string>

#include "poc_CircuitBootstrapping.cpp"  // reference TU (no main)

static std::string g_dir;

static FILE* mustopen(const char* name) {
    std::string p = g_dir + "/" + name;
    FILE* f = fopen(p.c_str(), "wb");
    if (!f) { perror(p.c_str()); exit(1); }
    return f;
}

template <typename T>
static void dump(const char* name, const T* p, long n) {
    FILE* f = mustopen(name);
    if (fwrite(p, sizeof(T), n, f) != (size_t)n) { perror(name); exit(1); }
    fclose(f);
}

// deterministic input patterns (splitmix-style multiplicative hashes)
static int32_t pat32(long i) { return (int32_t)((i + 1) * INT64_C(0x9E3779B9)); }
static int64_t pat64(long i) { return (i + 1) * INT64_C(0x9E3779B97F4A7C15); }
static int patdigit(long i, int bound) {  // in [-bound, bound)
    return (int)(((uint64_t)pat64(i) >> 17) % (2 * bound)) - bound;
}

int main(int argc, char** argv) {
    g_dir = argc > 1 ? argv[1] : "fixtures";

    Globals* env = new Globals();
    const int n0 = env->n_lvl0, n1 = env->n_lvl1, n2 = env->n_lvl2;
    const int N1 = env->N_lvl1, N2 = env->N_lvl2;
    const int l2 = env->ell_lvl2;

    // --- keys (FALSE_RANDOM: all bits 1, key_lvl2[n2] = -1) --------------
    dump("key_lvl0.i32", env->key_lvl0, n0);
    dump("key_lvl1.i32", env->key_lvl1, n1);
    dump("key_lvl2.i32", env->key_lvl2, n2 + 1);

    // --- keygen table samples --------------------------------------------
    // preKS[i][j][u]: LWE-500 of (key_lvl1[i] << (32-(j+1)*2)) * u
    {
        int32_t buf[3 * 501];
        const int idx[3][3] = {{0, 0, 1}, {0, 5, 3}, {1023, 0, 2}};
        for (int s = 0; s < 3; ++s)
            for (int h = 0; h <= n0; ++h)
                buf[s * (n0 + 1) + h] =
                    env->preKS[idx[s][0]][idx[s][1]][idx[s][2]].a[h];
        dump("preKS_samples.i32", buf, 3 * (n0 + 1));
    }
    // bk[0]: TGSW64 of key_lvl0[0] (=1): (k+1)*l2 rows x (k+1) polys x N2
    {
        FILE* f = mustopen("bk0.i64");
        for (int j = 0; j < (k + 1) * l2; ++j)
            for (int p = 0; p <= k; ++p)
                fwrite(env->bk[0].allsamples[j].a[p].coefs, 8, N2, f);
        fclose(f);
    }
#ifdef USE_FFT
    // bkFFT[0] row 0: the iFFT'd first row (2 polys x N2 doubles)
    {
        FILE* f = mustopen("bkfft0_row0.f64");
        for (int p = 0; p <= k; ++p)
            fwrite(env->bkFFT[0].allsamples[0].a[p].values, 8, N2, f);
        fclose(f);
    }
#endif
    // privKS[z][i][j][u]: TLWE-1024 samples
    {
        FILE* f = mustopen("privKS_samples.i32");
        const int idx[3][4] = {{0, 0, 0, 1}, {1, 2048, 9, 7}, {0, 777, 5, 3}};
        for (int s = 0; s < 3; ++s)
            for (int q = 0; q <= k; ++q)
                fwrite(env->privKS[idx[s][0]][idx[s][1]][idx[s][2]][idx[s][3]]
                           .a[q].coefs, 4, N1, f);
        fclose(f);
    }

    // --- input ciphertext + preKS + preModSwitch chain --------------------
    LweSample32* x1 = new LweSample32(n1);
    lwe32Encrypt_lvl1(x1, int32_t(3) << 29, 0.01, env);  // driver's input (:998)
    dump("input_lvl1.i32", x1->a, n1 + 1);
    LweSample32* u0 = new LweSample32(n0);
    preKeySwitch(u0, x1, env);
    dump("preks_out.i32", u0->a, n0 + 1);
    int* abar = new int[n0 + 1];
    preModSwitch(abar, u0, env);
    dump("premodswitch_out.i32", abar, n0 + 1);

    // --- unit primitives on patterned inputs ------------------------------
    // Karatsuba lvl1 (N=1024, torus32) and lvl2 (N=2048, torus64)
    {
        IntPolynomial p1(N1);
        Torus32Polynomial q1(N1), r1(N1);
        for (int j = 0; j < N1; ++j) p1.coefs[j] = patdigit(j, 256);
        for (int j = 0; j < N1; ++j) q1.coefs[j] = pat32(j);
        torus32PolynomialMultKaratsuba_lvl1(&r1, &p1, &q1, env);
        dump("karatsuba32_out.i32", r1.coefs, N1);
        torus32PolynomialMultAddKaratsuba_lvl1(&r1, &p1, &q1, env);
        dump("karatsuba32_addout.i32", r1.coefs, N1);
    }
    IntPolynomial p2(N2);
    Torus64Polynomial q2(N2), r2(N2);
    for (int j = 0; j < N2; ++j) p2.coefs[j] = patdigit(j, 256);
    for (int j = 0; j < N2; ++j) q2.coefs[j] = pat64(j);
    torus64PolynomialMultKaratsuba_lvl2(&r2, &p2, &q2, env);
    dump("karatsuba64_out.i64", r2.coefs, N2);

    // gadget decomposition of a patterned torus64 polynomial
    {
        IntPolynomial* dec = new_array1<IntPolynomial>(l2, N2);
        tGswTorus64PolynomialDecompH(dec, &q2, env);
        FILE* f = mustopen("decomp64_out.i32");
        for (int p = 0; p < l2; ++p) fwrite(dec[p].coefs, 4, N2, f);
        fclose(f);
        delete_array1<IntPolynomial>(dec);
    }

#ifdef USE_FFT
    // FFT processor: reverse(int), reverse(torus64), direct(torus64)
    {
        LagrangeHalfCPolynomial lag(N2);
        IntPolynomial_ifft_lvl2(&lag, &p2, env);
        dump("ifft_int_out.f64", lag.values, N2);
        TorusPolynomial64_ifft_lvl2(&lag, &q2, env);
        dump("ifft_t64_out.f64", lag.values, N2);
        Torus64Polynomial back(N2);
        TorusPolynomial64_fft_lvl2(&back, &lag, env);
        dump("fft_roundtrip_out.i64", back.coefs, N2);
    }
#endif

    // --- one CMux inner body (the external product) -----------------------
    // acc2 patterned; digits -> 2*l2 iFFTs -> AddMul with bkFFT[0] -> k+1
    // direct FFTs (exact build: same chain through Karatsuba).  This is
    // poc_CircuitBootstrapping.cpp:608-620 verbatim on stable inputs.
    {
        TLweSample64* acc2 = new TLweSample64(N2);
        for (int q = 0; q <= k; ++q)
            for (int j = 0; j < N2; ++j)
                acc2->a[q].coefs[j] = pat64(q * N2 + j);
        IntPolynomial* decomp = new_array1<IntPolynomial>(2 * l2, N2);
        tGsw64DecompH(decomp, acc2, env);
        {
            FILE* f = mustopen("cmux_decomp.i32");
            for (int p = 0; p < 2 * l2; ++p) fwrite(decomp[p].coefs, 4, N2, f);
            fclose(f);
        }
        LagrangeHalfCPolynomial* decompFFT =
            new_array1<LagrangeHalfCPolynomial>(2 * l2, N2);
        for (int p = 0; p < 2 * l2; ++p)
            IntPolynomial_ifft_lvl2(decompFFT + p, decomp + p, env);
        TLweSampleFFT* accFFT = new TLweSampleFFT(N2);
        for (int q = 0; q <= k; ++q)
            LagrangeHalfCPolynomialClear_lvl2(accFFT->a + q, env);
        for (int p = 0; p < 2 * l2; ++p)
            for (int q = 0; q <= k; ++q)
                LagrangeHalfCPolynomialAddMul_lvl2(
                    accFFT->a + q, decompFFT + p,
                    &env->bkFFT[0].allsamples[p].a[q], env);
        TLweSample64* acc1 = new TLweSample64(N2);
        for (int q = 0; q <= k; ++q)
            TorusPolynomial64_fft_lvl2(acc1->a + q, accFFT->a + q, env);
        {
            FILE* f = mustopen("cmux_extprod.i64");
            for (int q = 0; q <= k; ++q) fwrite(acc1->a[q].coefs, 8, N2, f);
            fclose(f);
        }
        delete acc1;
        delete accFFT;
        delete_array1<LagrangeHalfCPolynomial>(decompFFT);
        delete_array1<IntPolynomial>(decomp);
        delete acc2;
    }

    // --- the PoC's (buggy) aibar < N rotation branch, pinned --------------
    // acc2 = (X^aibar - 1)*acc1 per :592-595: cyclic wrap WITHOUT the
    // negacyclic sign flip on the wrapped prefix (PARITY.md bug 2).
    {
        const int aibar = 37;
        Torus64Polynomial a1(N2), a2p(N2);
        for (int j = 0; j < N2; ++j) a1.coefs[j] = pat64(j + 5);
        for (int j = 0; j < aibar; ++j)
            a2p.coefs[j] = a1.coefs[j - aibar + N2] - a1.coefs[j];
        for (int j = aibar; j < N2; ++j)
            a2p.coefs[j] = a1.coefs[j - aibar] - a1.coefs[j];
        dump("poc_rotate37_out.i64", a2p.coefs, N2);
    }

    // --- private functional key switch on a synthetic lvl2 LWE ------------
    {
        LweSample64* xs = new LweSample64(n2);
        for (int i = 0; i <= n2; ++i) xs->a[i] = pat64(i + 11);
        TLweSample32* res = new TLweSample32(N1);
        FILE* f = mustopen("privks_out.i32");
        for (int u = 0; u <= k; ++u) {
            circuitPrivKS(res, u, xs, env);
            for (int q = 0; q <= k; ++q) fwrite(res->a[q].coefs, 4, N1, f);
        }
        fclose(f);
        delete res;
        delete xs;
    }

    printf("dumped fixtures to %s\n", g_dir.c_str());
    return 0;
}

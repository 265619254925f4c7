// End-to-end circuit-bootstrap anchor (VERDICT r2 item 3): drives the
// PATCHED reference TU (build/poc_patched.cpp — the two PARITY.md rotation
// bugs fixed by native/patch_poc.py; everything else byte-identical to
// /root/reference/parallel/src/poc_CircuitBootstrapping.cpp) under
// -DFALSE_RANDOM, and dumps the COMPOSED pipeline's vectors:
//
//   input_lvl1.i32        the driver's input ciphertext (poc:998)
//   premodswitch_out.i32  abar after preKS + preModSwitch (poc:832-842)
//   boot_w<w>.i64         res_boot after circuitBootstrapWoKS level w
//                         (poc:845-852) — n2+1 Torus64
//   cb_out.i32            the full TGSW32 result of tfhe_CircuitBootstrapFFT
//                         (poc:823-873): (k+1) x ell1 rows x (k+1) x N1
//
// Two builds (Makefile): ref_dump_e2e_exact (Karatsuba fallback — the
// repo's exact integer path must match bit-for-bit) and ref_dump_e2e_fft
// (spqlios asm path — matched to a documented noise envelope).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string>

#include "poc_patched.cpp"  // patched reference TU (no main)

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

int main(int argc, char** argv) {
    g_dir = argc > 1 ? argv[1] : "fixtures";

    Globals* env = new Globals();
    const int n0 = env->n_lvl0, n1 = env->n_lvl1, n2 = env->n_lvl2;
    const int N1 = env->N_lvl1;
    const int ell1 = env->ell_lvl1;
    const int bgbit1 = env->bgbit_lvl1;

    // input: the driver's message (poc:996-998)
    LweSample32* x1 = new LweSample32(n1);
    lwe32Encrypt_lvl1(x1, int32_t(3) << 29, 0.01, env);
    dump("input_lvl1.i32", x1->a, n1 + 1);

    // stage chain exactly as tfhe_CircuitBootstrapFFT (poc:823-873)
    LweSample32* u0 = new LweSample32(n0);
    preKeySwitch(u0, x1, env);
    int* abar = new int[n0 + 1];
    preModSwitch(abar, u0, env);
    dump("premodswitch_out.i32", abar, n0 + 1);

    LweSample64* res_boot = new LweSample64(n2);
    TGswSample32* result = new TGswSample32(ell1, N1);
    for (int w = 0; w < ell1; ++w) {
        const Torus64 mu1 = UINT64_C(1) << (64 - (w + 1) * bgbit1);
        circuitBootstrapWoKS(res_boot, mu1, abar, env);
        char name[32];
        snprintf(name, sizeof name, "boot_w%d.i64", w);
        dump(name, res_boot->a, n2 + 1);
        for (int u = 0; u <= k; ++u)
            circuitPrivKS(&result->samples[u][w], u, res_boot, env);
    }
    {
        FILE* f = mustopen("cb_out.i32");
        for (int u = 0; u <= k; ++u)
            for (int w = 0; w < ell1; ++w)
                for (int q = 0; q <= k; ++q)
                    fwrite(result->samples[u][w].a[q].coefs, 4, N1, f);
        fclose(f);
    }
    fprintf(stderr, "e2e fixtures written to %s\n", g_dir.c_str());
    return 0;
}

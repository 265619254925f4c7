#!/usr/bin/env python3
"""Benchmark driver: batched gate bootstrapping throughput on the local
accelerator.  Prints ONE JSON line:
  {"metric": "gate_bootstraps_per_sec", "value": N, "unit": "ct/s",
   "vs_baseline": N / 10000}

Baseline: the BASELINE.json target of >=10k gate bootstraps/s per chip (the
reference itself is a single-core CPU PoC at ~137 ms per *circuit* bootstrap
and publishes no gate-bootstrap throughput).

Environment overrides:
  BENCH_BATCH   ciphertext batch per measurement (default 8192 on TPU: the
                throughput knee — 10.1k ct/s vs 9.7k at 4096; tile sizes
                adapt to the batch via the ops/tiles.py VMEM chooser)
  BENCH_STEPS   override blind-rotation step count (default: full n)
  BENCH_REPS    timing repetitions (default 3)
  BENCH_CHAIN   dependent bootstrap launches per timed rep (default 4 on
                TPU, 1 on CPU).  A bootstrap maps a boolean ciphertext to
                a refreshed ciphertext of the SAME bit, so x -> boot(x)
                chains indefinitely and stays decrypt-checkable; timing R
                chained launches per sync measures steady-state THROUGHPUT
                with the per-launch host round-trip pipelined away (the
                single-launch protocol pays one tunnel round trip per
                launch: ~3% on the measured chip — see
                bench_results/adder_raw_ratio_r5.json)
  BENCH_BACKEND negacyclic engine backend (default: "onthefly" for
                N<=512 rings, "chunked" for N>=1024 — each ring size's
                measured-fastest fused kernel)
  BENCH_PARAMS  "default"/"mxu" (GATE_MXU: n=630,l=3,bg=7, 128-bit, BK
                mod-switched to 2^24 / 3 int8 limbs), "exact" (GATE_DEFAULT,
                full 32-bit BK), or "fast" (GATE_FAST: n=500, 2017-era set)
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"

    from tfhe_tpu.params import (GATE_DEFAULT, GATE_FAST, GATE_FAST2,
                                 GATE_MXU, GATE_MXU2,
                                 GateParams, LweParams, TGswParams, TLweParams,
                                 KeySwitchParams)
    from tfhe_tpu.rng import TfheRng
    from tfhe_tpu.boot import gate

    if on_tpu:
        params = {"fast": GATE_FAST, "exact": GATE_DEFAULT,
                  "default": GATE_FAST2, "mxu": GATE_MXU,
                  "mxu2": GATE_MXU2, "fast2": GATE_FAST2}[
                      os.environ.get("BENCH_PARAMS", "default")]
        batch = int(os.environ.get("BENCH_BATCH", 8192))
    else:
        # CPU smoke configuration (drivers without a TPU attached)
        params = GateParams(
            lwe=LweParams(n=64, stdev=2.0**-15),
            tgsw=TGswParams(l=3, bgbit=7,
                            tlwe=TLweParams(N=256, k=1, stdev=2.0**-25, bits=32)),
            ks=KeySwitchParams(t=8, basebit=2, stdev=2.0**-15),
        )
        batch = int(os.environ.get("BENCH_BATCH", 64))

    default_backend = "chunked" if params.tgsw.tlwe.N >= 1024 else "onthefly"
    backend = os.environ.get("BENCH_BACKEND", default_backend)
    reps = int(os.environ.get("BENCH_REPS", 3))
    steps = os.environ.get("BENCH_STEPS")

    t0 = time.time()
    rng = TfheRng(0)
    sk = gate.SecretKey.generate(params, rng)
    ck = gate.CloudKey.generate(sk, rng, backend=backend)
    key_data = ck.data
    n_full = params.lwe.n
    if steps:
        # debug mode: truncate the scan (timing only; output not decryptable)
        steps = int(steps)
        key_data = dict(key_data)
        key_data["bk"] = jax.tree.map(lambda a: a[:steps], key_data["bk"])
        params = GateParams(lwe=LweParams(n=n_full, stdev=params.lwe.stdev),
                            tgsw=params.tgsw, ks=params.ks)
    keygen_s = time.time() - t0

    boot = gate.make_bootstrap_fn(params, backend=backend)
    if steps:
        # patch: bootstrap with truncated bk requires matching abar length
        import functools
        from tfhe_tpu.boot import blind_rotate as br
        from tfhe_tpu import torus as T, lwe as lwe_mod

        @jax.jit
        def boot(kd, samples):
            N = params.N
            a, b = samples[..., :-1], samples[..., -1]
            barb = T.mod_switch_from_torus32(b, 2 * N)
            bara = T.mod_switch_from_torus32(a, 2 * N)[:, :steps]
            tv = jnp.full((N,), np.int32(gate.MU_BOOL), jnp.int32)
            u = br.rotate_and_extract(tv, kd["bk"], barb, bara, params.tgsw,
                                      backend)
            ksk = lwe_mod.KeySwitchKey(params.ks, params.tgsw.tlwe.extracted_n,
                                       params.lwe.n, kd["ksw"])
            return lwe_mod.keyswitch(u, ksk)

    bits = np.random.default_rng(1).integers(0, 2, batch)
    ct = gate.encrypt_bool(sk, bits, rng)
    chain = int(os.environ.get("BENCH_CHAIN", 4 if on_tpu else 1))

    t0 = time.time()
    out = boot(key_data, ct)
    out.block_until_ready()
    compile_s = time.time() - t0

    times = []
    for _ in range(reps):
        t0 = time.time()
        out = ct
        for _ in range(chain):      # dependent launches: queue stays full
            out = boot(key_data, out)
        np.asarray(out[0])          # force full execution + transfer
        times.append(time.time() - t0)
    best = min(times) / chain
    # correctness check rides along (full-depth runs only)
    correct = None
    if not steps:
        correct = bool(np.array_equal(gate.decrypt_bool(sk, out),
                                      bits.astype(bool)))

    value = batch / best
    result = {
        "metric": "gate_bootstraps_per_sec",
        "value": round(value, 1),
        "unit": "ct/s",
        "vs_baseline": round(value / 10000.0, 4),
    }
    meta = {
        "device": str(dev), "batch": batch, "backend": backend,
        "params": f"n={params.lwe.n},N={params.N},l={params.tgsw.l},bg=2^{params.tgsw.bgbit}",
        "steps": steps or n_full, "best_s": round(best, 4), "chain": chain,
        "keygen_s": round(keygen_s, 1), "compile_s": round(compile_s, 1),
        "all_correct": correct,
    }
    print(json.dumps(result))
    print("# " + json.dumps(meta), file=sys.stderr)


if __name__ == "__main__":
    main()

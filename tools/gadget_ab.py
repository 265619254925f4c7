"""A/B the gadget geometry on real hardware: l=3/bg=7 (production) vs
l=2/bg=8 (1.5x fewer MXU MACs) vs k=4/N=256 (1.44x fewer at l*bg=21).

Round 1 rejected l=2/bg=8 after a ZERO-KEY-NOISE trial showed the
decomposition tail accumulating coherently (params.py GATE_FAST note).
Hypothesis tested here: with REAL key noise the accumulator low bits are
randomized after the first step, the per-step rounding errors decorrelate,
and the sqrt(n) independent-tail model (noise.gate_bootstrap_variances
tbk2) holds.  Measures, per variant:
  - step time (fused CMux, B from env)
  - full-bootstrap wall time + all_correct over the batch
  - output phase rms vs the worksheet prediction
"""
import json
import os
import sys
import time

import numpy as np

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tfhe_tpu.params import (GATE_FAST2, GATE_MXU2, GateParams,
                             TGswParams, TLweParams)
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate
from tfhe_tpu import lwe as lwe_mod, noise

B = int(os.environ.get("AB_BATCH", 4096))
REPS = int(os.environ.get("AB_REPS", 3))


def variant(base, l, bgbit, N=None, k=None):
    t = base.tgsw.tlwe
    tl = TLweParams(N=N or t.N, k=k or t.k, stdev=t.stdev, bits=t.bits)
    return GateParams(lwe=base.lwe,
                      tgsw=TGswParams(l=l, bgbit=bgbit,
                                      key_limbs=base.tgsw.key_limbs, tlwe=tl),
                      ks=base.ks)


CASES = {
    "fast2_l3bg7": GATE_FAST2,
    "fast3_l2bg8": variant(GATE_FAST2, 2, 8),
    "mxu3_l2bg8_n630": variant(GATE_MXU2, 2, 8),
    "rank4_l3bg7": variant(GATE_FAST2, 3, 7, N=256, k=4),
    "rank4_l2bg8": variant(GATE_FAST2, 2, 8, N=256, k=4),
}

which = sys.argv[1:] or list(CASES)
for name in which:
    p = CASES[name]
    g = noise.gate_bootstrap_variances(p)
    # modswitch noise is input-side (enters the rotation exponent, not the
    # output phase), so the output-rms prediction excludes it.
    pred_rms = float(np.sqrt(g.final_variance))
    rng = TfheRng(0)
    t0 = time.time()
    sk = gate.SecretKey.generate(p, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
    keygen_s = time.time() - t0

    bits = np.random.default_rng(1).integers(0, 2, B)
    ct = gate.encrypt_bool(sk, bits, rng)
    boot = gate.make_bootstrap_fn(p, backend="onthefly")
    t0 = time.time()
    out = boot(ck.data, ct)
    out.block_until_ready()
    compile_s = time.time() - t0
    times = []
    for _ in range(REPS):
        t0 = time.time()
        out = boot(ck.data, ct)
        np.asarray(out[0])
        times.append(time.time() - t0)
    best = min(times)
    dec = gate.decrypt_bool(sk, out)
    correct = int(np.sum(dec == bits.astype(bool)))
    # output phase rms around +-1/8
    ph = np.asarray(lwe_mod.phase(out, sk.lwe_key)).astype(np.int64)
    mu = np.where(dec, gate.MU_BOOL, -int(gate.MU_BOOL)).astype(np.int64)
    err = (ph - mu).astype(np.int32).astype(np.float64) / 2.0**32
    print(json.dumps({
        "case": name, "B": B,
        "params": f"n={p.lwe.n},N={p.N},k={p.tgsw.tlwe.k},l={p.tgsw.l},bg=2^{p.tgsw.bgbit}",
        "ct_per_s": round(B / best, 1), "best_s": round(best, 4),
        "correct": f"{correct}/{B}",
        "rms_measured": float(np.sqrt(np.mean(err**2))),
        "rms_model": pred_rms,
        "keygen_s": round(keygen_s, 1), "compile_s": round(compile_s, 1),
    }), flush=True)

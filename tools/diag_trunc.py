#!/usr/bin/env python3
"""Isolate key-truncation noise: zero-noise keys, bootstrap, measure phase
error vs the key_limbs=0 run on identical key material."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import GateParams, LweParams, TGswParams, TLweParams, KeySwitchParams
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate
from tfhe_tpu import lwe

B = 512
def mk(key_limbs):
    return GateParams(
        lwe=LweParams(n=630, stdev=2.0**-30),
        tgsw=TGswParams(l=3, bgbit=7, key_limbs=key_limbs,
                        tlwe=TLweParams(N=1024, k=1, stdev=0.0, bits=32)),
        ks=KeySwitchParams(t=8, basebit=2, stdev=2.0**-30),
    )

bits = np.random.default_rng(1).integers(0, 2, B)
for kl in (0, 3):
    params = mk(kl)
    rng = TfheRng(0)
    sk = gate.SecretKey.generate(params, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
    boot = gate.make_bootstrap_fn(params, backend="onthefly")
    ct = gate.encrypt_bool(sk, bits, rng)
    out = boot(ck.data, ct)
    ph = np.asarray(lwe.phase(out, sk.lwe_key)).astype(np.int64)
    want = np.where(bits, gate.MU_BOOL, -gate.MU_BOOL).astype(np.int64)
    noise = (ph - want).astype(np.int32).astype(np.float64)
    print(f"key_limbs={kl}: rms 2^{np.log2(noise.std()/2**32):.2f} "
          f"max 2^{np.log2(np.abs(noise).max()/2**32):.2f} "
          f"mean 2^{np.log2(abs(noise.mean())/2**32 + 1e-30):.2f} sign={np.sign(noise.mean())}",
          flush=True)

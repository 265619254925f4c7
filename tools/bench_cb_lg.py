#!/usr/bin/env python3
"""Scan-level lgsize sweep of the two-kernel 64-bit pair path in ONE
process (the only comparison the shared chip's variance allows).

  CB=MXU|ACTIVE B=256 LGS=1,2,4 python tools/bench_cb_lg.py
"""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import CB_MXU, CB_ACTIVE
from tfhe_tpu import tgsw
from tfhe_tpu.boot import blind_rotate as br

B = int(os.environ.get("B", 256))
NS = int(os.environ.get("N_STEPS", 500))
cp = CB_ACTIVE if os.environ.get("CB", "MXU") == "ACTIVE" else CB_MXU
p = cp.tgsw_lvl2
cfg = tgsw.engine_config(p)
N, kp1, l = p.tlwe.N, p.tlwe.k + 1, p.l
L = cfg.num_limbs
m = 64
UL, Jm, Npm = kp1 * L, kp1 * l * m, N + m
lgs = [int(v) for v in os.environ.get("LGS", "1,2").split(",")]
print(f"CB={os.environ.get('CB','MXU')} B={B} steps={NS} UL={UL}",
      flush=True)

r = np.random.default_rng(0)
wm = jnp.asarray(r.integers(-128, 128, (NS, UL, Jm, Npm), dtype=np.int8))
acc = jnp.asarray(r.integers(-2**63, 2**63, (B, kp1, N)).astype(np.int64))
abar = jnp.asarray(r.integers(0, 2 * N, (B, NS)).astype(np.int32))
prep = {"wm": wm}

import functools
outs = {}
for lg in lgs:
    if UL % lg:
        print(f"lg={lg}: skipped (UL % lg != 0)", flush=True)
        continue
    os.environ["TFHE_CK64_LG"] = str(lg)
    os.environ["TFHE_CK64_FUSED"] = "0"
    fn = jax.jit(lambda prep, acc, abar: br.blind_rotate(
        acc, prep, abar, p, "chunked"))
    fn = functools.partial(fn, prep)
    out = fn(acc, abar)
    jax.device_get(out[0, 0, :4])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(acc, abar)
        jax.device_get(out[0, 0, :4])
        best = min(best, time.perf_counter() - t0)
    outs[lg] = np.asarray(out)
    print(f"lg={lg}: {best:7.3f} s = {best/NS*1e6:7.1f} us/step", flush=True)
ks = list(outs)
for k2 in ks[1:]:
    assert (outs[ks[0]] == outs[k2]).all(), "lgsize changed the result!"
print("outputs identical across lgsizes: True", flush=True)

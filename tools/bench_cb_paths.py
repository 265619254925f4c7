#!/usr/bin/env python3
"""Scan-level comparison of the 64-bit blind-rotation paths at CB shapes:
the production two-kernel pair path vs the epilogue-fused path A
(TFHE_CK64_PATH=acc) vs the fully fused ck_cmux_step64
(TFHE_CK64_FUSED) — SAME process, SYNTHETIC keys (timing only; both paths
are bit-exact-tested in tests/test_chunked64.py).

  CB=MXU|ACTIVE B=256 N_STEPS=500 python tools/bench_cb_paths.py
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
print(f"CB={os.environ.get('CB','MXU')} B={B} steps={NS}", flush=True)

r = np.random.default_rng(0)
wm = jnp.asarray(r.integers(-128, 128, (NS, UL, Jm, Npm), dtype=np.int8))
acc = jnp.asarray(r.integers(-2**63, 2**63, (B, kp1, N)).astype(np.int64))
abar = jnp.asarray(r.integers(0, 2 * N, (B, NS)).astype(np.int32))
prep = {"wm": wm}


def run(label, mode):
    os.environ["TFHE_CK64_FUSED"] = "1" if mode == "fused" else "0"
    os.environ["TFHE_CK64_PATH"] = mode if mode in ("acc", "sacc") else ""
    # prep must be an ARGUMENT: closing over it bakes the 8 GB wm into the
    # program as a constant and stalls the remote compile
    fn = jax.jit(lambda prep, acc, abar: br.blind_rotate(acc, prep, abar,
                                                         p, "chunked"))
    fn = __import__("functools").partial(fn, prep)
    out = fn(acc, abar)
    jax.device_get(out[0, 0, :4])          # compile + first
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(acc, abar)
        jax.device_get(out[0, 0, :4])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:26s} {best:7.3f} s  = {best/NS*1e6:7.1f} us/step "
          f"= {best/B*1e3/2:6.2f} ms/ct-rotation", flush=True)
    return out, best


modes = os.environ.get("MODES", "two,acc,fused,two,acc").split(",")
results = {}
outs = {}
for ix, mmode in enumerate(modes):
    o, t = run(f"{mmode} #{ix}", mmode)
    results.setdefault(mmode, []).append(t)
    outs.setdefault(mmode, o)
ref = outs[modes[0]]
for mmode, o in outs.items():
    same = bool((np.asarray(ref) == np.asarray(o)).all())
    best = min(results[mmode])
    print(f"{mmode:8s} best {best/NS*1e6:7.1f} us/step  identical={same}",
          flush=True)
import sys
sys.exit(0)
o1, t1 = run("two-kernel pair path", "two")
o3, t3 = run("acc-fused dot (path A)", "acc")
o2, t2 = run("fused ck_cmux_step64", "fused")
# interleaved second visits to bound chip drift within the session
o1b, t1b = run("two-kernel pair path #2", "two")
o3b, t3b = run("acc-fused dot #2", "acc")
same2 = bool((np.asarray(o1) == np.asarray(o2)).all())
same3 = bool((np.asarray(o1) == np.asarray(o3)).all())
print(f"fused identical: {same2}  acc identical: {same3}", flush=True)
print(f"two {min(t1,t1b)/NS*1e6:.1f} us/step | acc {min(t3,t3b)/NS*1e6:.1f} "
      f"| fused {t2/NS*1e6:.1f}  -> acc speedup {min(t1,t1b)/min(t3,t3b):.3f}x",
      flush=True)

#!/usr/bin/env python3
"""Clean decomposition of the blind-rotation step cost (fixed W, scan of S).

Times, all in the same lax.scan harness with W FIXED in HBM:
  rotdec       rotate_decompose alone (VPU floor)
  mm(best)     mm_recombine_acc alone at the tuned tiles (MXU floor)
  3-kernel     rotdec -> mm(best)
  v2 noVPU tm={256,512}
  v2 full  tm={256,512}
"""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import GATE_MXU2
from tfhe_tpu import tgsw
from tfhe_tpu.ops.pallas_kernels import (materialize_w, mm_recombine_acc,
                                         rotate_decompose, fused_cmux_step_v2)

B = int(os.environ.get("B", 4096))
S = int(os.environ.get("S", 64))
p = GATE_MXU2.tgsw
N, kp1, l = p.tlwe.N, p.tlwe.k + 1, p.l
J = kp1 * l
cfg = tgsw.engine_config(p)
L, ks = cfg.num_limbs, cfg.key_shift
r = np.random.default_rng(0)
acc0 = jnp.asarray(r.integers(-2**31, 2**31, (B, kp1, N)).astype(np.int32))
abar = jnp.asarray(r.integers(0, 2*N, (B, S)).astype(np.int32))
v = jnp.asarray(r.integers(-128, 128, (L, J, kp1, 2*N)).astype(np.int8))
W = jax.jit(materialize_w)(v)
digc = jnp.asarray(r.integers(-64, 64, (B, J*N)).astype(np.int8))

def timeit(name, fn, *args):
    jax.device_get(fn(*args)[0, 0, :4])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(fn(*args)[0, 0, :4])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:24s} {best/S*1e6:8.1f} us/step", flush=True)

def scan_of(step):
    @jax.jit
    def f(acc, abar):
        def body(acc, a):
            return step(a, acc), None
        return lax.scan(body, acc, jnp.moveaxis(abar, -1, 0))[0]
    return f

# 1. VPU floor
def s_rotdec(a, acc):
    d = rotate_decompose(a, acc, l=l, bgbit=p.bgbit, offset=p.offset)
    return acc + d[:, :kp1, :].astype(jnp.int32)
timeit("rotdec only", scan_of(s_rotdec), acc0, abar)

# 2. MXU floor (tuned tiles)
def s_mm(a, acc):
    out = mm_recombine_acc(digc, W, acc.reshape(B, kp1*N), shift_base=ks,
                           tm=512, tn=1536, tk=512)
    return (out + a[:, None]).reshape(B, kp1, N)
timeit("mm only (512,1536,512)", scan_of(s_mm), acc0, abar)

# 3. 3-kernel
def s_3k(a, acc):
    d = rotate_decompose(a, acc, l=l, bgbit=p.bgbit, offset=p.offset)
    return mm_recombine_acc(d.reshape(B, J*N), W, acc.reshape(B, kp1*N),
                            shift_base=ks, tm=512, tn=1536, tk=512
                            ).reshape(B, kp1, N)
timeit("3-kernel (tuned)", scan_of(s_3k), acc0, abar)

# 4-7. fused v2
for tm in (256, 512):
    for novpu in (True, False):
        def s_v2(a, acc, tm=tm, novpu=novpu):
            return fused_cmux_step_v2(a, acc, W, l=l, bgbit=p.bgbit,
                                      offset=p.offset, key_shift=ks, tm=tm,
                                      _skip_vpu=novpu)
        tag = "noVPU" if novpu else "full "
        timeit(f"v2 {tag} tm={tm}", scan_of(s_v2), acc0, abar)

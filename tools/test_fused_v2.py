#!/usr/bin/env python3
"""Correctness + perf of fused_cmux_step_v2 vs the 3-kernel path (TPU)."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import GATE_MXU, GATE_MXU2
from tfhe_tpu import tgsw
from tfhe_tpu.ops.pallas_kernels import (materialize_w, mm_recombine_acc,
                                         rotate_decompose, fused_cmux_step_v2)

B = int(os.environ.get("B", 4096))
S = int(os.environ.get("S", 64))
TM = int(os.environ.get("TM", 256))
gp = GATE_MXU2 if os.environ.get("P2", "1") == "1" else GATE_MXU
p = gp.tgsw
N, kp1, l = p.tlwe.N, p.tlwe.k + 1, p.l
J = kp1 * l
cfg = tgsw.engine_config(p)
L, ks = cfg.num_limbs, cfg.key_shift
r = np.random.default_rng(0)
acc = jnp.asarray(r.integers(-2**31, 2**31, (B, kp1, N)).astype(np.int32))
a_i = jnp.asarray(r.integers(0, 2*N, (B,)).astype(np.int32))
v = jnp.asarray(r.integers(-128, 128, (L, J, kp1, 2*N)).astype(np.int8))

W = jax.jit(materialize_w)(v)

def ref_step(a, acc, W):
    d = rotate_decompose(a, acc, l=l, bgbit=p.bgbit, offset=p.offset)
    flat = d.astype(jnp.int8).reshape(B, J * N)
    return mm_recombine_acc(flat, W, acc.reshape(B, kp1 * N),
                            shift_base=ks).reshape(B, kp1, N)

def fused_step(a, acc, W):
    return fused_cmux_step_v2(a, acc, W, l=l, bgbit=p.bgbit, offset=p.offset,
                              key_shift=ks, tm=TM)

want = np.asarray(jax.jit(ref_step)(a_i, acc, W))
got = np.asarray(jax.jit(fused_step)(a_i, acc, W))
print("match:", (want == got).all(),
      "| mismatches:", int((want != got).sum()), "/", want.size)
if not (want == got).all():
    bad = np.argwhere(want != got)
    print("first bad:", bad[:5], want[tuple(bad[0])], got[tuple(bad[0])])
    sys.exit(1)

abar = jnp.asarray(r.integers(0, 2*N, (B, S)).astype(np.int32))
vs = jnp.asarray(r.integers(-128, 128, (S, L, J, kp1, 2*N)).astype(np.int8))

def loop(step, with_mat=True):
    def f(acc, abar, vs):
        def body(acc, xs):
            vv, a = xs
            return step(a, acc, materialize_w(vv)), None
        acc, _ = lax.scan(body, acc, (vs, jnp.moveaxis(abar, -1, 0)))
        return acc
    return jax.jit(f)

def fused_novpu(a, acc, W):
    return fused_cmux_step_v2(a, acc, W, l=l, bgbit=p.bgbit, offset=p.offset,
                              key_shift=ks, tm=TM, _skip_vpu=True)

cases = [("3-kernel", ref_step), ("fused_v2", fused_step),
         ("v2 noVPU", fused_novpu)]
for name, step in cases:
    fn = loop(step)
    jax.device_get(fn(acc, abar, vs)[0, 0, :4])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(fn(acc, abar, vs)[0, 0, :4])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:10s} {best/S*1e6:8.1f} us/step -> "
          f"{B/(gp.lwe.n*best/S):.0f} boots/s-equiv")

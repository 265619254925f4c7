#!/usr/bin/env python3
"""Per-component timing of the blind-rotation step on TPU.

Times, each in its own scan loop over 64 steps at production shapes:
  materialize    W built from limb vectors (per step, onthefly backend)
  rotdec         rotate_decompose alone
  mm             mm_recombine_acc alone (W precomputed)
  fused(W pre)   fused_cmux_step alone (W precomputed)
  fused noVPU    fused MXU path only (W precomputed)
"""
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
                                         rotate_decompose, fused_cmux_step)

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
abar = jnp.asarray(r.integers(0, 2*N, (B, S)).astype(np.int32))
vs = jnp.asarray(r.integers(-128, 128, (S, L, J, kp1, 2*N)).astype(np.int8))
Ws = jax.jit(lambda v: jax.lax.map(materialize_w, v))(vs)  # (S, L, J*N, U*N)
digits = jnp.asarray(r.integers(-64, 64, (B, J, N)).astype(np.int8))

def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:16s} {best/S*1e6:8.1f} us/step")
    return best

def scan_loop(body, xs_tree):
    def f(acc, xs_tree):
        return lax.scan(lambda a, xs: (body(a, xs), None), acc, xs_tree)[0]
    return jax.jit(f)

# materialize only (touch one element so the work isn't DCE'd)
mat = scan_loop(lambda a, xs: a.at[0, 0, 0].add(
    materialize_w(xs)[0, 0, 0].astype(jnp.int32)), vs)
timeit("materialize", mat, acc, vs)

rd = scan_loop(lambda a, xs: a.at[:, :, :].set(
    rotate_decompose(xs, a, l=l, bgbit=p.bgbit, offset=p.offset)[:, :kp1, :].astype(jnp.int32)),
    jnp.moveaxis(abar, -1, 0))
timeit("rotdec", rd, acc, None if False else jnp.moveaxis(abar, -1, 0))

mm = scan_loop(lambda a, W: mm_recombine_acc(
    digits.reshape(B, J*N), W, a, shift_base=ks), Ws)
timeit("mm(W pre)", mm, acc, Ws)

fu = scan_loop(lambda a, xs: fused_cmux_step(
    xs[1], a, xs[0], l=l, bgbit=p.bgbit, offset=p.offset, key_shift=ks, tm=TM),
    (Ws, jnp.moveaxis(abar, -1, 0)))
timeit("fused(W pre)", fu, acc, (Ws, jnp.moveaxis(abar, -1, 0)))

fn = scan_loop(lambda a, xs: fused_cmux_step(
    xs[1], a, xs[0], l=l, bgbit=p.bgbit, offset=p.offset, key_shift=ks, tm=TM,
    _skip_vpu=True), (Ws, jnp.moveaxis(abar, -1, 0)))
timeit("fused noVPU", fn, acc, (Ws, jnp.moveaxis(abar, -1, 0)))

#!/usr/bin/env python3
"""Differential (chain) timing of step components at GATE_MXU shapes."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import GATE_MXU
from tfhe_tpu import tgsw, tlwe
from tfhe_tpu.ops import decomp
from tfhe_tpu.ops.engine import make_engine
from tfhe_tpu.ops.pallas_kernels import materialize_w, mm_recombine_acc

B = 4096
p = GATE_MXU.tgsw
N, k = p.tlwe.N, p.tlwe.k
cfg = tgsw.engine_config(p)
L = cfg.num_limbs
r = np.random.default_rng(0)
acc = jnp.asarray(r.integers(-2**31, 2**31, (B, k+1, N)).astype(np.int32))
a_i = jnp.asarray(r.integers(0, 2*N, (B,)).astype(np.int32))
v = jnp.asarray(r.integers(-128, 128, (L, 6, 2, 2*N)).astype(np.int8))
x8 = jnp.asarray(r.integers(-64, 64, (B, 6*N), dtype=np.int8))
W = jnp.asarray(r.integers(-64, 64, (L, 6*N, 2*N), dtype=np.int8))

def chain_time(fn, feed, iters_pair=(8, 28), reps=2, label=""):
    lo, hi = iters_pair
    def make(iters):
        def g(*args):
            def body(i, carry):
                s, args = carry
                o = fn(*args)
                s = s + jnp.sum(jax.tree.leaves(o)[0].astype(jnp.int32) & 1, dtype=jnp.int32)
                args = feed(args, o, s)
                return (s, args)
            s, _ = lax.fori_loop(0, iters, body, (jnp.int32(0), args))
            return s
        return jax.jit(g)
    def run(g, args):
        jax.device_get(g(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(g(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    return lambda *args: print(
        f"{label:18s} {((run(make(hi), args) - run(make(lo), args)) / (hi - lo))*1e6:8.1f} us",
        flush=True)

# materialize_w alone
chain_time(lambda v: materialize_w(v),
           lambda args, o, s: (args[0].at[0, 0, 0, 0].set((s & 63).astype(jnp.int8)),),
           label="materialize_w")(v)

# rot + decomp + int8 cast
def rotdec(a_i, acc):
    acc2 = tlwe.mul_by_xai_minus_one(a_i, acc)
    d = decomp.decompose_tlwe(acc2, p).astype(jnp.int8)
    return d
chain_time(rotdec,
           lambda args, o, s: (args[0] + (s & 1),
                               args[1] + o.astype(jnp.int32).reshape(B, k+1, 3, N).sum(2, dtype=jnp.int32)),
           label="rot+dec")(a_i, acc)

# mm kernel alone
chain_time(lambda x, w, a: mm_recombine_acc(x, w, a, shift_base=cfg.key_shift),
           lambda args, o, s: (args[0], args[1], o),
           label="mm_recombine")(x8, W, acc.reshape(B, (k+1)*N))

# full step
eng = make_engine(cfg, "onthefly")
prep = {"v": v}
def step(acc, a_i):
    acc2 = tlwe.mul_by_xai_minus_one(a_i, acc)
    d = decomp.decompose_tlwe(acc2, p)
    return eng.accumulate_into(acc, d, prep)
chain_time(step, lambda args, o, s: (o, args[1] + (s & 1)), label="full step")(acc, a_i)

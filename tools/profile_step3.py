#!/usr/bin/env python3
"""Chain timing of the FUSED step components at GATE_MXU shapes (the path
bench.py actually runs: rotate_decompose + materialize_w + mm_recombine_acc)."""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import GATE_MXU, GATE_MXU2
from tfhe_tpu import tgsw
from tfhe_tpu.ops.engine import make_engine
from tfhe_tpu.ops.pallas_kernels import (materialize_w, mm_recombine_acc,
                                         rotate_decompose)

B = int(os.environ.get("B", 4096))
p = (GATE_MXU2 if os.environ.get("P2") else GATE_MXU).tgsw
N, k, l = p.tlwe.N, p.tlwe.k, p.l
J = (k + 1) * l
cfg = tgsw.engine_config(p)
L = cfg.num_limbs
r = np.random.default_rng(0)
acc = jnp.asarray(r.integers(-2**31, 2**31, (B, k+1, N)).astype(np.int32))
a_i = jnp.asarray(r.integers(0, 2*N, (B,)).astype(np.int32))
v = jnp.asarray(r.integers(-128, 128, (L, J, k+1, 2*N)).astype(np.int8))
x8 = jnp.asarray(r.integers(-64, 64, (B, J*N), dtype=np.int8))
W = jnp.asarray(r.integers(-64, 64, (L, J*N, (k+1)*N), dtype=np.int8))

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
        f"{label:22s} {((run(make(hi), args) - run(make(lo), args)) / (hi - lo))*1e6:8.1f} us",
        flush=True)

chain_time(lambda a, x: rotate_decompose(a, x, l=l, bgbit=p.bgbit, offset=p.offset),
           lambda args, o, s: (args[0] + (s & 1),
                               args[1] + o.astype(jnp.int32).reshape(B, k+1, l, N).sum(2, dtype=jnp.int32)),
           label="rotate_decompose")(a_i, acc)

chain_time(lambda v: materialize_w(v),
           lambda args, o, s: (args[0].at[0, 0, 0, 0].set((s & 63).astype(jnp.int8)),),
           label="materialize_w")(v)

chain_time(lambda x, w, a: mm_recombine_acc(x, w, a, shift_base=cfg.key_shift),
           lambda args, o, s: (args[0], args[1], o),
           label="mm_recombine")(x8, W, acc.reshape(B, (k+1)*N))

eng = make_engine(cfg, "onthefly")
prep = {"v": v}
def fused_step(acc, a_i):
    d = rotate_decompose(a_i, acc, l=l, bgbit=p.bgbit, offset=p.offset)
    return eng.accumulate_into(acc, d, prep)
chain_time(fused_step, lambda args, o, s: (o, args[1] + (s & 1)),
           label="fused full step")(acc, a_i)

#!/usr/bin/env python3
"""Where does the scan-loop overhead come from?

 a) fused_v2 in fori_loop, W fixed in HBM (pure kernel cost)
 b) fused_v2 in scan, W sliced from a precomputed (S, L, K, UN) xs
 c) fused_v2 in scan, W materialized per step (production onthefly path)
 d) materialize_w alone in fori_loop (forced dependency)
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
from tfhe_tpu.ops.pallas_kernels import materialize_w, fused_cmux_step_v2

B = int(os.environ.get("B", 4096))
S = int(os.environ.get("S", 64))
TM = int(os.environ.get("TM", 256))
p = GATE_MXU2.tgsw
N, kp1, l = p.tlwe.N, p.tlwe.k + 1, p.l
J = kp1 * l
cfg = tgsw.engine_config(p)
L, ks = cfg.num_limbs, cfg.key_shift
r = np.random.default_rng(0)
acc = jnp.asarray(r.integers(-2**31, 2**31, (B, kp1, N)).astype(np.int32))
abar = jnp.asarray(r.integers(0, 2*N, (B, S)).astype(np.int32))
vs = jnp.asarray(r.integers(-128, 128, (S, L, J, kp1, 2*N)).astype(np.int8))
v0 = vs[0]
W0 = jax.jit(materialize_w)(v0)
Ws = jax.jit(lambda v: jax.lax.map(materialize_w, v))(vs)

def step(a, acc, W):
    return fused_cmux_step_v2(a, acc, W, l=l, bgbit=p.bgbit, offset=p.offset,
                              key_shift=ks, tm=TM)

def timeit(name, fn, *args):
    # NB: block_until_ready() returns early over the axon tunnel; force a
    # device->host transfer of a slice that depends on the whole result.
    jax.device_get(fn(*args)[0, 0, :4])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(fn(*args)[0, 0, :4])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best/S*1e6:8.1f} us/step", flush=True)

@jax.jit
def loop_fixed(acc, abar, W):
    def body(acc, a):
        return step(a, acc, W), None
    return lax.scan(body, acc, jnp.moveaxis(abar, -1, 0))[0]
timeit("a) scan, W fixed", loop_fixed, acc, abar, W0)

@jax.jit
def loop_xs(acc, abar, Ws):
    def body(acc, xs):
        W, a = xs
        return step(a, acc, W), None
    return lax.scan(body, acc, (Ws, jnp.moveaxis(abar, -1, 0)))[0]
timeit("b) scan, W from xs", loop_xs, acc, abar, Ws)

@jax.jit
def loop_mat(acc, abar, vs):
    def body(acc, xs):
        vv, a = xs
        return step(a, acc, materialize_w(vv)), None
    return lax.scan(body, acc, (vs, jnp.moveaxis(abar, -1, 0)))[0]
timeit("c) scan, materialize/step", loop_mat, acc, abar, vs)

@jax.jit
def loop_matonly(acc, vs):
    def body(acc, vv):
        W = materialize_w(vv)
        # force data dependency on the whole W: cheap 1-element read folded in
        return acc + W[0, 0, 0].astype(jnp.int32), None
    return lax.scan(body, acc, vs)[0]
timeit("d) materialize only", loop_matonly, acc, vs)

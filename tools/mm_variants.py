#!/usr/bin/env python3
"""Grid/layout variants for the fused external-product matmul at step shape
B=4096, K=6144, UN=2048, L=3. Differential chain timing."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, UN, L = 4096, 6144, 2048, 3
r = np.random.default_rng(0)
X = jnp.asarray(r.integers(-64, 64, (B, K), dtype=np.int8))
W = jnp.asarray(r.integers(-64, 64, (L, K, UN), dtype=np.int8))
ACC = jnp.asarray(r.integers(-2**31, 2**31, (B, UN)).astype(np.int32))

def ref_fn(x, w, acc):
    out = acc
    for l in range(L):
        y = lax.dot_general(x, w[l], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        out = out + (y << (8 * l + 8) if l or True else y)
    return out
REF = jax.jit(ref_fn)(X, W, ACC)

# v1: current (scratch accumulator, W block includes all L)
def v1(tm=256, tn=1024, tk=1024):
    nk = K // tk
    def kern(x_ref, w_ref, a_ref, o_ref, s_ref):
        k = pl.program_id(2)
        @pl.when(k == 0)
        def _():
            s_ref[:] = a_ref[:]
        part = s_ref[:]
        for l in range(L):
            y = jnp.dot(x_ref[:], w_ref[l], preferred_element_type=jnp.int32)
            part = part + (y << (8 * l + 8))
        s_ref[:] = part
        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = s_ref[:]
    def f(x, w, acc):
        return pl.pallas_call(
            kern, grid=(B // tm, UN // tn, nk),
            in_specs=[pl.BlockSpec((tm, tk), lambda i, j, k: (i, k)),
                      pl.BlockSpec((L, tk, tn), lambda i, j, k: (i - i, k, j)),
                      pl.BlockSpec((tm, tn), lambda i, j, k: (i, j))],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((B, UN), jnp.int32),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, w, acc)
    return f

# v2: combined (l,k) inner grid, W as 2D (L*K, UN), out revisited (no scratch),
#     acc added at k==0 from input
def v2(tm=1024, tn=1024, tk=1024):
    nk = K // tk
    def kern(x_ref, w_ref, a_ref, o_ref):
        kk = pl.program_id(2)
        l = kk // nk
        y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
        y = y << (8 * l + 8)
        @pl.when(kk == 0)
        def _():
            o_ref[:] = a_ref[:] + y
        @pl.when(kk > 0)
        def _():
            o_ref[:] = o_ref[:] + y
    w2 = None
    def f(x, w, acc):
        w2 = w.reshape(L * K, UN)
        return pl.pallas_call(
            kern, grid=(B // tm, UN // tn, L * nk),
            in_specs=[pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk % nk)),
                      pl.BlockSpec((tk, tn), lambda i, j, kk: (kk % nk + (kk // nk) * nk, j)),
                      pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j))],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
            out_shape=jax.ShapeDtypeStruct((B, UN), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, w2, acc)
    return f

def time_fn(f, name):
    try:
        out = f(X, W, ACC)
        ok = bool(jnp.array_equal(out, REF))
        def chain(iters):
            def g(x, w, acc):
                def body(i, carry):
                    s, acc = carry
                    o = f(x, w, acc)
                    s = s + jnp.sum(o, dtype=jnp.int32)
                    acc = o  # feed through
                    return (s, acc)
                s, _ = lax.fori_loop(0, iters, body, (jnp.int32(0), acc))
                return s
            return jax.jit(g)
        def run(g):
            jax.device_get(g(X, W, ACC))
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                jax.device_get(g(X, W, ACC))
                best = min(best, time.perf_counter() - t0)
            return best
        tlo, thi = run(chain(10)), run(chain(40))
        dt = (thi - tlo) / 30
        print(f"{name}: ok={ok} {dt*1e6:8.1f} us  {2*B*K*UN*L/dt/1e12:6.1f} TOP/s",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {repr(e)[:200]}", flush=True)

time_fn(v1(256, 1024, 1024), "v1 tm256")
time_fn(v1(512, 512, 1024), "v1 tm512 tn512")
time_fn(v2(1024, 1024, 1024), "v2 tm1024")
time_fn(v2(512, 1024, 1024), "v2 tm512")
time_fn(v2(2048, 512, 1024), "v2 tm2048 tn512")
time_fn(v2(1024, 512, 2048), "v2 tm1024 tn512 tk2048")
time_fn(v2(2048, 256, 2048), "v2 tm2048 tn256 tk2048")

time_fn(v1(512, 512, 2048), "v1 tm512 tn512 tk2048")
time_fn(v1(512, 512, 3072), "v1 tm512 tn512 tk3072")
time_fn(v1(1024, 512, 512), "v1 tm1024 tn512 tk512")
time_fn(v1(512, 1024, 512), "v1 tm512 tn1024 tk512")
time_fn(v1(1024, 256, 1024), "v1 tm1024 tn256")
time_fn(v1(256, 512, 2048), "v1 tm256 tn512 tk2048")

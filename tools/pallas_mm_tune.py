#!/usr/bin/env python3
"""Can a hand-tiled Pallas int8 matmul beat XLA's ~200 TOP/s on this chip?"""
import time, itertools
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 4096, 4096, 6144
r = np.random.default_rng(0)
A = jnp.asarray(r.integers(-64, 64, (M, K), dtype=np.int8))
Bm = jnp.asarray(r.integers(-64, 64, (K, N), dtype=np.int8))

def make_mm(TM, TN, TK):
    def kern(a_ref, b_ref, o_ref, acc_ref):
        k = pl.program_id(2)
        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.int32)
        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:]
    def f(a, b):
        return pl.pallas_call(
            kern,
            grid=(M // TM, N // TN, K // TK),
            in_specs=[pl.BlockSpec((TM, TK), lambda i, j, k: (i, k)),
                      pl.BlockSpec((TK, TN), lambda i, j, k: (k, j))],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(a, b)
    return f

LOI, HII = 10, 40
def chain(mm, iters):
    def f(a, b):
        def body(i, carry):
            s, a = carry
            o = mm(a, b)
            s = s + jnp.sum(o, dtype=jnp.int32)
            a = a.at[0, 0].set((s & 63).astype(a.dtype))
            return (s, a)
        s, _ = lax.fori_loop(0, iters, body, (jnp.int32(0), a))
        return s
    return jax.jit(f)

def run(f, reps=2):
    jax.device_get(f(A, Bm))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(f(A, Bm))
        best = min(best, time.perf_counter() - t0)
    return best

for TM, TN, TK in [(512, 512, 2048), (256, 1024, 4096), (512, 1024, 1024),
                   (1024, 512, 1024), (256, 512, 4096), (512, 2048, 512),
                   (1024, 1024, 512)]:
    try:
        mm = make_mm(TM, TN, TK)
        out = mm(A, Bm)
        ref = lax.dot_general(A, Bm, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        okv = bool(jnp.array_equal(out, ref))
        tlo = run(chain(mm, LOI)); thi = run(chain(mm, HII))
        dt = (thi - tlo) / (HII - LOI)
        print(f"tile {TM}x{TN}x{TK}: ok={okv} {dt*1e6:8.1f} us  {2*M*K*N/dt/1e12:6.1f} TOP/s",
              flush=True)
    except Exception as e:
        print(f"tile {TM}x{TN}x{TK}: FAIL {repr(e)[:160]}", flush=True)

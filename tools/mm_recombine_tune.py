#!/usr/bin/env python3
"""Tile/layout sweep for the limb-recombining matmul at production shapes.

Production shape (GATE_MXU2, B=4096): x (4096, 4608) int8,
w 3x(4608, 1536) int8, out = acc + sum_l (x@w_l) << (8l+8), int32.

Variants:
  A  current mm_recombine_acc ((L, tk, tn) W blocks, 3 dots/cell)
  B  three separate 2D W inputs (w0, w1, w2), 3 dots/cell
  C  plain single dot at same total MACs (limbs folded into K) — MXU ceiling
"""
import time, sys, os
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.ops.pallas_kernels import mm_recombine_acc

B, K, UN, L = 4096, 4608, 1536, 3
SHIFT = 8
r = np.random.default_rng(0)
x = jnp.asarray(r.integers(-64, 64, (B, K), dtype=np.int8))
w = jnp.asarray(r.integers(-128, 128, (L, K, UN), dtype=np.int8))
acc = jnp.asarray(r.integers(-2**31, 2**31, (B, UN)).astype(np.int32))

ref = None

def run(f, args, reps=3, iters=16):
    def chain(*args):
        def body(i, a):
            o = f(*args[:-1], a)
            return o
        return lax.fori_loop(0, iters, body, args[-1])
    g = jax.jit(chain)
    out = g(*args); out.block_until_ready()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        g(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / iters, out

# --- A: current kernel ---
def variant_a(tm, tn, tk):
    def f(x, w, acc):
        return mm_recombine_acc(x, w, acc, shift_base=SHIFT, tm=tm, tn=tn, tk=tk)
    return f

# --- B: separate 2D W inputs ---
def variant_b(tm, tn, tk):
    nk = K // tk
    def kern(x_ref, w0_ref, w1_ref, w2_ref, acc_ref, o_ref, s_ref):
        k = pl.program_id(2)
        @pl.when(k == 0)
        def _():
            s_ref[:] = acc_ref[:]
        part = s_ref[:]
        for l, wr in enumerate((w0_ref, w1_ref, w2_ref)):
            y = jnp.dot(x_ref[:], wr[:], preferred_element_type=jnp.int32)
            part = part + (y << (8 * l + SHIFT))
        s_ref[:] = part
        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = s_ref[:]
    def f(x, w, acc):
        return pl.pallas_call(
            kern,
            grid=(B // tm, UN // tn, nk),
            in_specs=[pl.BlockSpec((tm, tk), lambda i, j, k: (i, k))]
            + [pl.BlockSpec((tk, tn), lambda i, j, k: (k, j))] * 3
            + [pl.BlockSpec((tm, tn), lambda i, j, k: (i, j))],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((B, UN), jnp.int32),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, w[0], w[1], w[2], acc)
    return f

# --- C: MXU ceiling, single dot with K' = 3K (wrong math, right MACs) ---
wbig = jnp.asarray(r.integers(-128, 128, (3 * K, UN), dtype=np.int8))
xbig = jnp.concatenate([x, x, x], axis=1)
def variant_c(tm, tn, tk):
    nk = 3 * K // tk
    def kern(x_ref, w_ref, acc_ref, o_ref, s_ref):
        k = pl.program_id(2)
        @pl.when(k == 0)
        def _():
            s_ref[:] = acc_ref[:]
        s_ref[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = s_ref[:]
    def f(xb, wb, acc):
        return pl.pallas_call(
            kern,
            grid=(B // tm, UN // tn, nk),
            in_specs=[pl.BlockSpec((tm, tk), lambda i, j, k: (i, k)),
                      pl.BlockSpec((tk, tn), lambda i, j, k: (k, j)),
                      pl.BlockSpec((tm, tn), lambda i, j, k: (i, j))],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((B, UN), jnp.int32),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(xb, wb, acc)
    return f

GOP = 2 * B * K * UN * L / 1e12

want = None
for name, maker, args in [
    ("A", variant_a, (x, w, acc)),
    ("B", variant_b, (x, w, acc)),
    ("C", variant_c, (xbig, wbig, acc)),
]:
    for tm, tn, tk in [(256, 512, 512), (512, 512, 512), (512, 1536, 512),
                       (1024, 1536, 512), (256, 1536, 1536), (512, 1536, 1536),
                       (512, 512, 4608), (1024, 512, 1152), (2048, 1536, 512),
                       (512, 1536, 2304)]:
        kdim = 3 * K if name == "C" else K
        if kdim % tk or B % tm or UN % tn:
            continue
        try:
            f = maker(tm, tn, tk)
            dt, out = run(f, args)
            chk = ""
            if name in ("A", "B"):
                if want is None:
                    rr = acc
                    for l in range(L):
                        rr = rr + (lax.dot_general(x, w[l], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32) << (8 * l + SHIFT))
                    want = rr  # single-application reference
                one = jax.jit(f)(*args)
                chk = " ok" if bool(jnp.array_equal(one, want)) else " BAD"
            print(f"{name} {tm:5d}x{tn:5d}x{tk:5d}: {dt*1e6:8.1f} us "
                  f"{GOP/dt:6.1f} TOP/s{chk}", flush=True)
        except Exception as e:
            print(f"{name} {tm}x{tn}x{tk}: FAIL {repr(e)[:120]}", flush=True)

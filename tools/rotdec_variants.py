#!/usr/bin/env python3
"""Microbench: rotate_decompose variants at GATE_MXU2 shapes.

Current kernel: 10 negacyclic stages, each roll + lane-mask negate + 2 selects.
Variant modN: 9 pure-cyclic roll+select stages + ONE sign fixup pass
  (negacyclic X^a = cyclic roll by a mod N, then negate lanes i < a mod N,
   XOR a global negate when a >= N).
"""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import GATE_MXU2
from tfhe_tpu.ops.pallas_kernels import rotate_decompose

B = int(os.environ.get("B", 4096))
p = GATE_MXU2.tgsw
N, kp1, l, bgbit, offset = p.tlwe.N, p.tlwe.k + 1, p.l, p.bgbit, p.offset
r = np.random.default_rng(0)
acc = jnp.asarray(r.integers(-2**31, 2**31, (B, kp1, N)).astype(np.int32))
a_i = jnp.asarray(r.integers(0, 2*N, (B,)).astype(np.int32))


def _rotdec_modn_kernel(N, l, bgbit, offset, nbits):
    half = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1

    def kernel(a_ref, acc_ref, out_ref):
        a = a_ref[:]                                   # (tb2, 1)
        x = acc_ref[:]
        orig = x
        aN = a & jnp.int32(N - 1)
        for w in range(nbits):                         # cyclic roll mod N
            r = 1 << w
            rolled = pltpu.roll(x, jnp.int32(r), axis=1)
            bit = ((a >> w) & 1) > 0
            x = jnp.where(bit, rolled, x)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        hi = (a >> jnp.int32(nbits)) & 1               # a >= N bit (a < 2N)
        neg = (lane < aN).astype(jnp.int32) ^ hi       # sign-flip mask
        x = jnp.where(neg > 0, -x, x)
        u = (x - orig).astype(jnp.uint32) + jnp.uint32(offset)
        for i in range(l):
            s = 32 - (i + 1) * bgbit
            d = ((u >> jnp.uint32(s)) & jnp.uint32(mask)).astype(jnp.int32) - half
            out_ref[:, i, :] = d.astype(jnp.int8)
    return kernel


def rotate_decompose_modn(a, acc, *, l, bgbit, offset, tb=256):
    B, kp1, N = acc.shape
    tb = min(tb, B * kp1)
    nbits = (N - 1).bit_length()
    a2 = jnp.repeat(a.astype(jnp.int32), kp1)[:, None]
    out = pl.pallas_call(
        _rotdec_modn_kernel(N, l, bgbit, offset, nbits),
        grid=(B * kp1 // tb,),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i: (i, i - i)),
            pl.BlockSpec((tb, N), lambda i: (i, i - i)),
        ],
        out_specs=pl.BlockSpec((tb, l, N), lambda i: (i, i - i, i - i)),
        out_shape=jax.ShapeDtypeStruct((B * kp1, l, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(a2, acc.reshape(B * kp1, N))
    return out.reshape(B, kp1 * l, N)


# correctness vs current kernel
ref = jax.jit(lambda a, x: rotate_decompose(a, x, l=l, bgbit=bgbit, offset=offset))(a_i, acc)
got = jax.jit(lambda a, x: rotate_decompose_modn(a, x, l=l, bgbit=bgbit, offset=offset))(a_i, acc)
print("match:", bool((np.asarray(ref) == np.asarray(got)).all()))


def chain_time(fn, label, iters_pair=(8, 28), reps=2):
    lo, hi = iters_pair
    def make(iters):
        def g(a, x):
            def body(i, carry):
                s, a, x = carry
                o = fn(a, x)
                s = s + jnp.sum(o[0, 0, :8].astype(jnp.int32), dtype=jnp.int32)
                x = x + o.astype(jnp.int32).reshape(B, kp1, l, N).sum(2, dtype=jnp.int32)
                return (s, a + (s & 1), x)
            s, _, _ = lax.fori_loop(0, iters, body, (jnp.int32(0), a, x))
            return s
        return jax.jit(g)
    def run(g):
        jax.device_get(g(a_i, acc))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(g(a_i, acc))
            best = min(best, time.perf_counter() - t0)
        return best
    print(f"{label:24s} {((run(make(hi)) - run(make(lo))) / (hi - lo))*1e6:8.1f} us",
          flush=True)


for tb in (256, 512, 1024):
    chain_time(lambda a, x, tb=tb: rotate_decompose(a, x, l=l, bgbit=bgbit,
                                                    offset=offset, tb=tb),
               f"current tb={tb}")
for tb in (256, 512, 1024):
    chain_time(lambda a, x, tb=tb: rotate_decompose_modn(a, x, l=l, bgbit=bgbit,
                                                         offset=offset, tb=tb),
               f"modN    tb={tb}")

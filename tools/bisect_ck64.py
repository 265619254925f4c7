#!/usr/bin/env python3
"""Bisect why ck_cmux_step64's dot schedule is ~1.5x slower than
ck_dot64p: morph ck_dot64p toward the fused kernel one structural change
at a time, timing each in ONE process (tunnel variance ~20%).

Variants (all grid (B/tm, UL/lg), lg=6 => (i, u) like the fused kernel):
  v0  ck_dot64p as-is (lg=6)                 [baseline]
  v1  + digits read from VMEM SCRATCH (copied from the input once/cell)
  v2  + pair recombination in-kernel, pair outputs (the fused MXU block,
      digits still a streamed input)
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
from tfhe_tpu.params import CB_MXU
from tfhe_tpu import tgsw
from tfhe_tpu.ops.engine import ChunkedEngine
from tfhe_tpu.ops.pallas_kernels import ck_dot64p, _cparams

B, TM = 256, 128
p = CB_MXU.tgsw_lvl2
cfg = tgsw.engine_config(p)
eng = ChunkedEngine(cfg)
N, kp1, l = p.tlwe.N, p.tlwe.k + 1, p.l
L, m = cfg.num_limbs, eng.m
pb, P = cfg.plane_split
UL = kp1 * L
Jm, Npm, C = kp1 * l * m, N + m, N // m
ckp = -(-Jm // 128) * 128
CP = C * P * ckp
KS = cfg.key_shift
r = np.random.default_rng(0)
wm = jnp.asarray(r.integers(-128, 128, (UL, Jm, Npm), dtype=np.int8))
x8 = jnp.asarray(r.integers(-64, 64, (B, CP), dtype=np.int8))
alo = jnp.asarray(r.integers(-2**31, 2**31, (B, kp1 * N)).astype(np.int32))
ahi = jnp.asarray(r.integers(-2**31, 2**31, (B, kp1 * N)).astype(np.int32))


def chain(fn, label, *args):
    def g(iters, *args):
        def body(i, carry):
            s, args = carry
            o = fn(*args)
            s = s + jnp.sum(jax.tree.leaves(o)[0][0].astype(jnp.int32) & 1,
                            dtype=jnp.int32)
            return (s, (args[0].at[0, 0].set((s & 63).astype(args[0].dtype)),)
                    + args[1:])
        s, _ = lax.fori_loop(0, iters, body, (jnp.int32(0), args))
        return s
    gj = jax.jit(g)
    def run(iters):
        jax.device_get(gj(jnp.int32(iters), *args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(gj(jnp.int32(iters), *args))
            best = min(best, time.perf_counter() - t0)
        return best
    try:
        dt = (run(16) - run(4)) / 12
        print(f"{label:30s} {dt*1e6:8.1f} us", flush=True)
    except Exception as e:
        print(f"{label:30s} FAILED ({str(e).splitlines()[0][:90]})",
              flush=True)


# ---- v0: ck_dot64p lg=6 baseline ----
chain(lambda x, w: (ck_dot64p(x, w, N=N, m=m, planes=P, tm=TM, lgsize=6),),
      "v0 ck_dot64p lg=6", x8, wm)


# ---- v1: digits via scratch copy ----
def _v1_kernel(x_ref, w_ref, out_ref, sacc_ref, digs_ref):
    digs_ref[:, :] = x_ref[:, :]
    for li in range(6):
        sacc_ref[:, :] = jnp.zeros(sacc_ref.shape, jnp.int32)
        for c in range(C):
            y = None
            for pp in range(P):
                xs = digs_ref[:, pl.ds((c * P + pp) * ckp, Jm)]
                yp = jnp.dot(xs, w_ref[li], preferred_element_type=jnp.int32)
                yp = (yp << (7 * pp)) if pp else yp
                y = yp if y is None else y + yp
            sacc_ref[:, pl.ds(c * m, Npm)] += y
        out_ref[li, :, :] = (sacc_ref[:, pl.ds(0, N)]
                             - sacc_ref[:, pl.ds(N, N)])


def v1(x, w):
    return pl.pallas_call(
        _v1_kernel,
        grid=(B // TM, UL // 6),
        in_specs=[pl.BlockSpec((TM, CP), lambda i, g: (i, i - i)),
                  pl.BlockSpec((6, Jm, Npm), lambda i, g: (g, i - i, i - i))],
        out_specs=pl.BlockSpec((6, TM, N), lambda i, g: (g, i, i - i)),
        out_shape=jax.ShapeDtypeStruct((UL, B, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((TM, 2 * N), jnp.int32),
                        pltpu.VMEM((TM, CP), jnp.int8)],
        compiler_params=_cparams("arbitrary", "arbitrary"),
    )(x, w)


chain(lambda x, w: (v1(x, w),), "v1 + scratch digits", x8, wm)


# ---- v2: pair recombination in-kernel (digits still an input) ----
def _v2_kernel(x_ref, w_ref, al_ref, ah_ref, ol_ref, oh_ref, sacc_ref):
    zlo = zhi = None
    for li in range(L):
        sacc_ref[:, :] = jnp.zeros(sacc_ref.shape, jnp.int32)
        for c in range(C):
            y = None
            for pp in range(P):
                xs = x_ref[:, pl.ds((c * P + pp) * ckp, Jm)]
                yp = jnp.dot(xs, w_ref[li], preferred_element_type=jnp.int32)
                yp = (yp << (7 * pp)) if pp else yp
                y = yp if y is None else y + yp
            sacc_ref[:, pl.ds(c * m, Npm)] += y
        f = sacc_ref[:, pl.ds(0, N)] - sacc_ref[:, pl.ds(N, N)]
        s = 8 * li + KS
        if s == 0:
            plo, phi = f, f >> 31
        elif s < 32:
            plo, phi = f << s, f >> (32 - s)
        elif s == 32:
            plo, phi = jnp.zeros_like(f), f
        else:
            plo, phi = jnp.zeros_like(f), f << (s - 32)
        if zlo is None:
            zlo, zhi = plo, phi
        else:
            nlo = zlo + plo
            carry = (nlo.astype(jnp.uint32)
                     < plo.astype(jnp.uint32)).astype(jnp.int32)
            zlo, zhi = nlo, zhi + phi + carry
    av, bv = al_ref[:], ah_ref[:]
    nlo = av + zlo
    carry = (nlo.astype(jnp.uint32) < av.astype(jnp.uint32)).astype(jnp.int32)
    ol_ref[:, :] = nlo
    oh_ref[:, :] = bv + zhi + carry


def v2(x, w, al, ah):
    return pl.pallas_call(
        _v2_kernel,
        grid=(B // TM, kp1),
        in_specs=[pl.BlockSpec((TM, CP), lambda i, u: (i, i - i)),
                  pl.BlockSpec((L, Jm, Npm), lambda i, u: (u, i - i, i - i)),
                  pl.BlockSpec((TM, N), lambda i, u: (i, u)),
                  pl.BlockSpec((TM, N), lambda i, u: (i, u))],
        out_specs=[pl.BlockSpec((TM, N), lambda i, u: (i, u)),
                   pl.BlockSpec((TM, N), lambda i, u: (i, u))],
        out_shape=[jax.ShapeDtypeStruct((B, kp1 * N), jnp.int32),
                   jax.ShapeDtypeStruct((B, kp1 * N), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((TM, 2 * N), jnp.int32)],
        compiler_params=_cparams("arbitrary", "arbitrary"),
    )(x, w, al, ah)


chain(lambda x, w, al, ah: v2(x, w, al, ah), "v2 + pair recombination",
      x8, wm, alo, ahi)

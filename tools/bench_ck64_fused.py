#!/usr/bin/env python3
"""ck_cmux_step64 (fully fused) vs the two-kernel pair path, same process
(the tunnel's run-to-run variance is ~20%, so only back-to-back numbers
compare).  CB=MXU|ACTIVE B=256 TM=128 python tools/bench_ck64_fused.py"""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import CB_MXU, CB_ACTIVE
from tfhe_tpu import tgsw
from tfhe_tpu.ops.engine import ChunkedEngine
from tfhe_tpu.ops.pallas_kernels import ck_cmux_step64

B = int(os.environ.get("B", 256))
TM = int(os.environ.get("TM", 128))
cp = CB_ACTIVE if os.environ.get("CB", "MXU") == "ACTIVE" else CB_MXU
p = cp.tgsw_lvl2
cfg = tgsw.engine_config(p)
eng = ChunkedEngine(cfg)
N, kp1, l = p.tlwe.N, p.tlwe.k + 1, p.l
L, m = cfg.num_limbs, eng.m
pb, P = cfg.plane_split
UL = kp1 * L
Jm, Npm = kp1 * l * m, N + m
print(f"CB={os.environ.get('CB','MXU')} B={B} TM={TM} N={N} l={l} L={L} "
      f"P={P}", flush=True)

r = np.random.default_rng(0)
wm = jnp.asarray(r.integers(-128, 128, (UL, Jm, Npm), dtype=np.int8))
lo = jnp.asarray(r.integers(-2**31, 2**31, (B, kp1 * N)).astype(np.int32))
hi = jnp.asarray(r.integers(-2**31, 2**31, (B, kp1 * N)).astype(np.int32))
a_i = jnp.asarray(r.integers(0, 2 * N, (B,)).astype(np.int32))


def chain(fn, label, *args):
    def g(iters, *args):
        def body(i, carry):
            s, args = carry
            o = fn(*args)
            s = s + jnp.sum(jax.tree.leaves(o)[0][0].astype(jnp.int32) & 1,
                            dtype=jnp.int32)
            return (s, (args[0] + (s & 1),) + tuple(o))
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
        print(f"{label:34s} {dt*1e6:8.1f} us", flush=True)
        return dt
    except Exception as e:
        print(f"{label:34s} FAILED ({str(e).splitlines()[0][:90]})",
              flush=True)
        return None


# fused (flat pair carry)
chain(lambda a, lo, hi: ck_cmux_step64(a, lo, hi, wm, l=l, bgbit=p.bgbit,
                                       offset=p.offset,
                                       key_shift=cfg.key_shift, m=m,
                                       planes=P, tm=TM, kp1=kp1),
      f"ck_cmux_step64 tm={TM}", a_i, lo, hi)

# MXU-only variant (VPU pipeline compiled out): the overlap headroom probe
chain(lambda a, lo, hi: ck_cmux_step64(a, lo, hi, wm, l=l, bgbit=p.bgbit,
                                       offset=p.offset,
                                       key_shift=cfg.key_shift, m=m,
                                       planes=P, tm=TM, kp1=kp1,
                                       _skip_vpu=True),
      f"ck_cmux_step64 skip_vpu", a_i, lo, hi)

# current production path (U-major pair + two kernels + XLA epilogue)
lo_u = jnp.asarray(np.moveaxis(np.asarray(lo).reshape(B, kp1, N), 1, 0).copy())
hi_u = jnp.asarray(np.moveaxis(np.asarray(hi).reshape(B, kp1, N), 1, 0).copy())
chain(lambda a, pair: (eng.cmux_pair_step(a, pair, {"wm": wm}, l=l,
                                          bgbit=p.bgbit, offset=p.offset),),
      "cmux_pair_step (2 kernels)", a_i, (lo_u, hi_u))

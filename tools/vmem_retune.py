#!/usr/bin/env python3
"""Round-4 retune after discovering the 16 MB scoped-VMEM cap is soft
(pallas_kernels.VMEM_LIMIT now raises it to 64 MB): re-measure every tile
point the round-3 chooser rejected or capped for 'VMEM bust' reasons.

  SWEEP=dot64|v2n1024|ck32 python tools/vmem_retune.py
"""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import CB_MXU, GATE_MXU, GATE_FAST2
from tfhe_tpu import tgsw
from tfhe_tpu.ops.engine import ChunkedEngine
from tfhe_tpu.ops.pallas_kernels import (ck_dot64p, ck_cmux_step32,
                                         fused_cmux_step_v2, materialize_w)


def chain_time(fn, feed, iters_pair=(4, 16), reps=3, label=""):
    # ONE jitted program with a DYNAMIC trip count (the axon tunnel costs
    # ~70 s to load each new program, so the lo/hi pair must share one)
    def g(iters, *args):
        def body(i, carry):
            s, args = carry
            o = fn(*args)
            s = s + jnp.sum(jax.tree.leaves(o)[0].astype(jnp.int32) & 1,
                            dtype=jnp.int32)
            return (s, feed(args, o, s))
        s, _ = lax.fori_loop(0, iters, body, (jnp.int32(0), args))
        return s
    gj = jax.jit(g)
    lo_i, hi_i = iters_pair
    def run(iters, args):
        jax.device_get(gj(jnp.int32(iters), *args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(gj(jnp.int32(iters), *args))
            best = min(best, time.perf_counter() - t0)
        return best
    def go(*args):
        try:
            dt = (run(hi_i, args) - run(lo_i, args)) / (hi_i - lo_i)
            print(f"{label:34s} {dt*1e6:8.1f} us", flush=True)
        except Exception as e:
            print(f"{label:34s} FAILED ({str(e).splitlines()[0][:80]})",
                  flush=True)
    return go


sweep = os.environ.get("SWEEP", "dot64")
r = np.random.default_rng(0)

if sweep == "dot64":
    B = int(os.environ.get("B", 256))
    p = CB_MXU.tgsw_lvl2
    cfg = tgsw.engine_config(p)
    eng = ChunkedEngine(cfg)
    N, kp1, l = p.tlwe.N, p.tlwe.k + 1, p.l
    L, m = cfg.num_limbs, eng.m
    pb, P = cfg.plane_split
    Jm, Npm, C = kp1 * l * m, N + m, N // m
    ckp = -(-Jm // 128) * 128
    UL = kp1 * L
    wm = jnp.asarray(r.integers(-128, 128, (UL, Jm, Npm), dtype=np.int8))
    x8 = jnp.asarray(r.integers(-64, 64, (B, C * P * ckp), dtype=np.int8))
    for tm in (128, 256):
        if tm > B:
            continue
        for lg in (1, 2, 3, 6):
            if UL % lg:
                continue
            chain_time(lambda x, w, tm=tm, lg=lg: ck_dot64p(
                           x, w, N=N, m=m, planes=P, tm=tm, lgsize=lg),
                       lambda args, o, s: (
                           args[0].at[0, 0].set((s & 63).astype(jnp.int8)),
                           args[1]),
                       label=f"ck_dot64p tm={tm} lg={lg}")(x8, wm)

elif sweep == "v2n1024":
    # fused_cmux_step_v2 at N=1024/k=1 (GATE_MXU): round-3 verdict was
    # "starved pipelining, 1.9x slower" under the 16 MB cap; retest raised.
    B = int(os.environ.get("B", 4096))
    p = GATE_MXU.tgsw
    cfg = tgsw.engine_config(p)
    N, k, l = p.tlwe.N, p.tlwe.k, p.l
    L = cfg.num_limbs
    acc = jnp.asarray(r.integers(-2**31, 2**31, (B, k + 1, N)).astype(np.int32))
    a_i = jnp.asarray(r.integers(0, 2 * N, (B,)).astype(np.int32))
    W = jnp.asarray(r.integers(-64, 64, (L, (k + 1) * l * N, (k + 1) * N),
                               dtype=np.int8))
    for tm in (128, 256):
        chain_time(lambda a, x, tm=tm: fused_cmux_step_v2(
                       a, x, W, l=l, bgbit=p.bgbit, offset=p.offset,
                       key_shift=cfg.key_shift, tm=tm),
                   lambda args, o, s: (args[0] + (s & 1), o),
                   label=f"fused_v2 N=1024 tm={tm}")(a_i, acc)

elif sweep == "ck32":
    # ck_cmux_step32 at N=1024 (GATE_MXU) and N=512/k=2 (GATE_FAST2):
    # round 3 capped tm at 128 ("measured faster") — recheck under 64 MB.
    for name, gp, B in (("N=1024", GATE_MXU, 4096),
                        ("N=512k2", GATE_FAST2, 8192)):
        p = gp.tgsw
        cfg = tgsw.engine_config(p)
        eng = ChunkedEngine(cfg)
        N, kp1, l = p.tlwe.N, p.tlwe.k + 1, p.l
        L, m = cfg.num_limbs, eng.m
        key = jnp.asarray(r.integers(-2**31, 2**31,
                                     (kp1 * l, kp1, N)).astype(np.int32))
        wm = eng.prepare(key)["wm"]
        acc = jnp.asarray(r.integers(-2**31, 2**31,
                                     (B, kp1 * N)).astype(np.int32))
        a_i = jnp.asarray(r.integers(0, 2 * N, (B,)).astype(np.int32))
        for tm in (128, 256, 512):
            chain_time(lambda a, x, tm=tm: ck_cmux_step32(
                           a, x, wm, l=l, bgbit=p.bgbit, offset=p.offset,
                           key_shift=cfg.key_shift, m=m, tm=tm, kp1=kp1),
                       lambda args, o, s: (args[0] + (s & 1), o),
                       label=f"ck32 {name} tm={tm}")(a_i, acc)

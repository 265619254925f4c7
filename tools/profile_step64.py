#!/usr/bin/env python3
"""Chain timing of the 64-bit chunked CMux step components at CB shapes
(the circuit-bootstrap hot loop): rotate_decompose64_ck, ck_dot64p, the
XLA pair-recombination epilogue, and the full cmux_pair_step.

Synthetic key material (timing only; correctness is covered by
tests/test_chunked64.py + the e2e anchor).  Dependent-chain timing: each
iteration feeds the previous output back, so the tunnel's dispatch-only
round trips can't lie (bench_results/README.md, round-3 gotcha).

  CB=MXU|ACTIVE B=256 python tools/profile_step64.py
"""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import CB_MXU, CB_ACTIVE
from tfhe_tpu import tgsw
from tfhe_tpu.ops.engine import make_engine, ChunkedEngine
from tfhe_tpu.ops import i64pair
from tfhe_tpu.ops.pallas_kernels import rotate_decompose64_ck, ck_dot64p

B = int(os.environ.get("B", 256))
cp = CB_ACTIVE if os.environ.get("CB", "MXU") == "ACTIVE" else CB_MXU
p = cp.tgsw_lvl2
cfg = tgsw.engine_config(p)
eng = ChunkedEngine(cfg)
N, kp1, l = p.tlwe.N, p.tlwe.k + 1, p.l
L, m = cfg.num_limbs, eng.m
pb, P = cfg.plane_split
J = kp1 * l
Jm, Npm, C = J * m, N + m, N // m
ckp = -(-Jm // 128) * 128
UL = kp1 * L
print(f"CB={os.environ.get('CB','MXU')} B={B} N={N} l={l} L={L} P={P} "
      f"m={m} UL={UL} Jm={Jm}", flush=True)

r = np.random.default_rng(0)
lo = jnp.asarray(r.integers(-2**31, 2**31, (kp1, B, N)).astype(np.int32))
hi = jnp.asarray(r.integers(-2**31, 2**31, (kp1, B, N)).astype(np.int32))
a_i = jnp.asarray(r.integers(0, 2 * N, (B,)).astype(np.int32))
wm = jnp.asarray(r.integers(-128, 128, (UL, Jm, Npm), dtype=np.int8))
x8 = jnp.asarray(r.integers(-64, 64, (B, C * P * ckp), dtype=np.int8))
y0 = jnp.asarray(r.integers(-2**31, 2**31, (UL, B, N)).astype(np.int32))


def chain_time(fn, feed, iters_pair=(4, 16), reps=3, label=""):
    def make(iters):
        def g(*args):
            def body(i, carry):
                s, args = carry
                o = fn(*args)
                s = s + jnp.sum(jax.tree.leaves(o)[0].astype(jnp.int32) & 1,
                                dtype=jnp.int32)
                return (s, feed(args, o, s))
            s, _ = lax.fori_loop(0, iters, body, (jnp.int32(0), args))
            return s
        return jax.jit(g)
    lo_i, hi_i = iters_pair
    def run(g, args):
        jax.device_get(g(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(g(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    return lambda *args: print(
        f"{label:26s} "
        f"{((run(make(hi_i), args) - run(make(lo_i), args)) / (hi_i - lo_i))*1e6:8.1f} us",
        flush=True)


# 1. rotation + decomposition alone
for tb in (128, 256):
    if tb > B:
        continue
    try:
        chain_time(lambda a, lo, hi, tb=tb: rotate_decompose64_ck(
                       a, lo, hi, l=l, bgbit=p.bgbit, offset=p.offset, m=m,
                       planes=P, tb=tb),
                   lambda args, o, s: (args[0] + (s & 1), args[1], args[2]),
                   label=f"rotate_decompose64_ck tb={tb}")(a_i, lo, hi)
    except Exception as e:
        print(f"rotate_decompose64_ck tb={tb}: FAILED "
              f"({str(e).splitlines()[0][:90]})", flush=True)

# 2. dots alone (both lgsizes)
for lg in (1, 2):
    if UL % lg:
        continue
    chain_time(lambda x, w, lg=lg: ck_dot64p(x, w, N=N, m=m, planes=P,
                                             tm=128, lgsize=lg),
               lambda args, o, s: (args[0].at[0, 0].set((s & 63).astype(jnp.int8)),
                                   args[1]),
               label=f"ck_dot64p lg={lg}")(x8, wm)

# 3. XLA epilogue alone (limb recombination + pair add)
def epilogue(y, lo, hi):
    y = y.reshape(kp1, L, B, N)
    zlo = zhi = None
    for lm in range(L):
        sh = cfg.limb_bits * lm + cfg.key_shift
        plo, phi = i64pair.shift_left_i32(y[:, lm], sh)
        zlo, zhi = ((plo, phi) if zlo is None
                    else i64pair.add(zlo, zhi, plo, phi))
    return i64pair.add(lo, hi, zlo, zhi)

chain_time(epilogue, lambda args, o, s: (args[0], o[0], o[1]),
           label="xla epilogue")(y0, lo, hi)

# 4. full current production step
chain_time(lambda a, pair: eng.cmux_pair_step(a, pair, {"wm": wm}, l=l,
                                              bgbit=p.bgbit, offset=p.offset),
           lambda args, o, s: (args[0] + (s & 1), o),
           label="cmux_pair_step (full)")(a_i, (lo, hi))

#!/usr/bin/env python3
"""Stable hot-loop bench: lax.scan of the real blind-rotation step over n
synthetic per-step keys (exactly bench.py's inner loop, no keygen).

env: P2=1 -> GATE_MXU2, B (default 4096), STEPS (default full n),
     TB (rotate tile), BACKEND (default onthefly)
"""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import GATE_MXU, GATE_MXU2
from tfhe_tpu import tgsw
from tfhe_tpu.boot import blind_rotate as br

B = int(os.environ.get("B", 4096))
gp = GATE_MXU2 if os.environ.get("P2", "1") == "1" else GATE_MXU
p = gp.tgsw
steps = int(os.environ.get("STEPS", gp.lwe.n))
backend = os.environ.get("BACKEND", "onthefly")
N, kp1, l = p.tlwe.N, p.tlwe.k + 1, p.l
J = kp1 * l
cfg = tgsw.engine_config(p)
L = cfg.num_limbs

r = np.random.default_rng(0)
acc = jnp.asarray(r.integers(-2**31, 2**31, (B, kp1, N)).astype(np.int32))
abar = jnp.asarray(r.integers(0, 2 * N, (B, steps)).astype(np.int32))
bk = {"v": jnp.asarray(r.integers(-128, 128, (steps, L, J, kp1, 2 * N)).astype(np.int8))}

import functools
import tfhe_tpu.ops.pallas_kernels as pk
_mm = pk.mm_recombine_acc
_rd = pk.rotate_decompose
if os.environ.get("MM_TILES"):
    tm, tn, tk = map(int, os.environ["MM_TILES"].split(","))
    pk.mm_recombine_acc = functools.partial(_mm, tm=tm, tn=tn, tk=tk)
if os.environ.get("RD_TB"):
    pk.rotate_decompose = functools.partial(_rd, tb=int(os.environ["RD_TB"]))

fn = jax.jit(lambda acc, bk, abar: br.blind_rotate(acc, bk, abar, p, backend))
jax.device_get(fn(acc, bk, abar)[0, 0, :4])
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    jax.device_get(fn(acc, bk, abar)[0, 0, :4])
    best = min(best, time.perf_counter() - t0)
per_step = best / steps
print(f"B={B} steps={steps} backend={backend} N={N} k={kp1-1} l={l} L={L}: "
      f"{best*1e3:.1f} ms total, {per_step*1e6:.1f} us/step, "
      f"{B/(gp.lwe.n*per_step):.0f} boots/s-equiv", flush=True)

# --- optional knob overrides via env (monkeypatch; engine imports at call time)

#!/usr/bin/env python3
"""Weak-scaling measurement of the sharded bootstrap on the virtual mesh
(VERDICT r1 item 4d — the single-host proxy for the 80%-at-2-hosts target).

Fixed per-device batch; dp grows 1 -> 8 over the
xla_force_host_platform_device_count virtual devices.

MEASURED (this host, 2026-08-20): total ct/s stays FLAT as dp grows
(23.5 -> 21.9 from dp=1 to dp=8) — the virtual CPU devices share one
XLA:CPU thread pool and serialize, so dp "efficiency" on a virtual mesh
is 1/dp by construction and says nothing about ICI scaling.  The
meaningful signal is the COLLECTIVE OVERHEAD: dp=4/ep=1 vs dp=4/ep=2
wall-clock is identical within noise (5.77 s vs 5.75 s) even though
ep=2 adds one psum per blind-rotation step — the explicit communication
pattern costs nothing measurable at these shapes.  Real scaling
efficiency needs real chips; the per-step psum payload is
(B/dp)*(k+1)*N*4 bytes against ~85 KB of compute per ct-step, a ratio
that on ICI (~100 GB/s/link) supports the >=80%-at-2-hosts target.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python tools/scaling_virtual.py
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from tfhe_tpu.params import GateParams, LweParams, TGswParams, TLweParams, \
    KeySwitchParams
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate
from tfhe_tpu.parallel import shard

PER_DEV = int(os.environ.get("SCALE_BATCH_PER_DEV", 32))
params = GateParams(
    lwe=LweParams(n=64, stdev=2.0**-15),
    tgsw=TGswParams(l=3, bgbit=7,
                    tlwe=TLweParams(N=512, k=1, stdev=2.0**-25, bits=32)),
    ks=KeySwitchParams(t=8, basebit=2, stdev=2.0**-15),
)

rng = TfheRng(0)
sk = gate.SecretKey.generate(params, rng)
ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
rows = []
t1 = None
for dp in (1, 2, 4, 8):
    ep = 1
    B = PER_DEV * dp
    bits = np.random.default_rng(1).integers(0, 2, B).astype(bool)
    ct = gate.encrypt_bool(sk, bits, rng)
    m = shard.make_mesh(dp * ep, dp=dp, ep=ep)
    fn, place = shard.make_sharded_bootstrap_fn(params, m,
                                                backend="onthefly")
    kd, cts = place(ck.data, ct)
    out = fn(kd, cts); out.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fn(kd, cts).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    if dp == 1:
        t1 = best
    rows.append({"dp": dp, "batch": B, "s": round(best, 4),
                 "weak_scaling_efficiency": round(t1 / best, 3),
                 "ct_per_s": round(B / best, 1)})
    print(json.dumps(rows[-1]), flush=True)

# ep sharding overhead at fixed dp
for ep in (1, 2):
    dp = 4
    B = PER_DEV * dp
    bits = np.random.default_rng(1).integers(0, 2, B).astype(bool)
    ct = gate.encrypt_bool(sk, bits, rng)
    m = shard.make_mesh(dp * ep, dp=dp, ep=ep)
    fn, place = shard.make_sharded_bootstrap_fn(params, m,
                                                backend="onthefly")
    kd, cts = place(ck.data, ct)
    out = fn(kd, cts); out.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fn(kd, cts).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"dp": dp, "ep": ep, "batch": B, "s": round(best, 4),
                      "ct_per_s": round(B / best, 1)}), flush=True)

#!/usr/bin/env python3
"""MUX-bearing circuit workload on hardware (VERDICT r4 item 6): B parallel
W-bit comparator trees (lt/eq/gt) through runtime/scheduler.py.

Unlike the adder family (binary-only waves, regular fan-out), the
comparator schedule alternates mixed binary waves and MUX waves of
halving width (W/2, W/4, ..., 1) — ragged tails, irregular fan-out, and
the 2-launch batched MUX path.  Decrypt-verified on all three outputs.

Env: CMP_BITS (32), CMP_BATCH (2048), CMP_PARAMS (fast2|mxu2|mxu),
CMP_BACKEND (onthefly), CMP_REPS (3), TFHE_MAX_WAVE_ROWS (8192).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tfhe_tpu.params import GATE_FAST2, GATE_MXU2, GATE_MXU
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate
from tfhe_tpu.runtime import scheduler
from tfhe_tpu.utils import observability as obs

W = int(os.environ.get("CMP_BITS", 32))
B = int(os.environ.get("CMP_BATCH", 2048))
params = {"fast2": GATE_FAST2, "mxu2": GATE_MXU2, "mxu": GATE_MXU}[
    os.environ.get("CMP_PARAMS", "fast2")]
backend = os.environ.get("CMP_BACKEND", "onthefly")
REPS = int(os.environ.get("CMP_REPS", 3))
dev = jax.devices()[0]

t0 = time.time()
rng = TfheRng(0)
sk = gate.SecretKey.generate(params, rng)
ck = gate.CloudKey.generate(sk, rng, backend=backend)
keygen_s = time.time() - t0
print(f"# keygen {keygen_s:.1f}s", file=sys.stderr, flush=True)

circ, outs = scheduler.comparator(W)
# bootstrap widths: W xnor + W and (level 0), W-1 merge ANDs, W-1 MUXes
# (3 ciphertexts each), 1 nor
n_boots = 2 * W + (W - 1) + 3 * (W - 1) + 1

r = np.random.default_rng(1)
xs = r.integers(0, 1 << W, B, dtype=np.uint64)
ys = r.integers(0, 1 << W, B, dtype=np.uint64)
ys[: B // 8] = xs[: B // 8]                    # force some equal pairs
bits = np.zeros((2 * W, B), np.int64)
for i in range(W):
    bits[i] = (xs >> np.uint64(i)) & np.uint64(1)
    bits[W + i] = (ys >> np.uint64(i)) & np.uint64(1)
cts = np.stack([np.asarray(gate.encrypt_bool(sk, bits[w], rng))
                for w in range(2 * W)])               # (2W, B, n+1)


def run():
    return scheduler.evaluate(circ, jnp.asarray(cts), ck.data, params, outs,
                              backend=backend)


t0 = time.time()
out = run()
jax.device_get(np.asarray(out[0, 0, :2]))
compile_s = time.time() - t0
print(f"# first run (incl. compiles) {compile_s:.1f}s", file=sys.stderr,
      flush=True)

obs.reset()
times = []
for _ in range(REPS):
    t0 = time.time()
    out = run()
    jax.device_get(np.asarray(out[-1, -1, :2]))
    times.append(time.time() - t0)
best = min(times)

dec = np.stack([np.asarray(gate.decrypt_bool(sk, out[:, b]))
                for b in range(B)])                   # (B, 3)
ok = (bool(np.array_equal(dec[:, 0], xs < ys))
      and bool(np.array_equal(dec[:, 1], xs == ys))
      and bool(np.array_equal(dec[:, 2], xs > ys)))

rep = obs.report()
result = {
    "metric": "comparators_per_sec",
    "value": round(B / best, 1),
    "unit": "circuits/s",
    "bits": W,
    "batch": B,
    "bootstraps_per_circuit": n_boots,
    "gate_bootstraps_per_sec": round(B * n_boots / best, 1),
    "wall_s": round(best, 3),
    "waves": rep["counters"].get("circuit.waves", 0) // max(1, REPS),
    "launches": rep["counters"].get("bootstrap.launches", 0) // max(1, REPS),
    "params": os.environ.get("CMP_PARAMS", "fast2"),
    "backend": backend,
    "device": str(dev),
    "keygen_s": round(keygen_s, 1),
    "all_correct": ok,
}
print(json.dumps(result), flush=True)

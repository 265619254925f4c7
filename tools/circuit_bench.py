#!/usr/bin/env python3
"""Real-workload benchmark for the consolidated circuit runtime (VERDICT r2
item 6): B parallel W-bit ripple-carry adders evaluated homomorphically on
the accelerator through runtime/scheduler.py (C++ wave scheduler + batched
executor).  Reports circuits/s and gate-bootstraps/s, decrypt-verified.

Env: ADD_BITS (default 32), ADD_BATCH (default 256), ADD_PARAMS
(fast2|mxu2|mxu, default fast2), ADD_BACKEND (default onthefly),
ADD_REPS (default 3).
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

W = int(os.environ.get("ADD_BITS", 32))
B = int(os.environ.get("ADD_BATCH", 256))
params = {"fast2": GATE_FAST2, "mxu2": GATE_MXU2, "mxu": GATE_MXU}[
    os.environ.get("ADD_PARAMS", "fast2")]
backend = os.environ.get("ADD_BACKEND", "onthefly")
REPS = int(os.environ.get("ADD_REPS", 3))
dev = jax.devices()[0]

t0 = time.time()
rng = TfheRng(0)
sk = gate.SecretKey.generate(params, rng)
ck = gate.CloudKey.generate(sk, rng, backend=backend)
keygen_s = time.time() - t0
print(f"# keygen {keygen_s:.1f}s", file=sys.stderr, flush=True)

circ, outs = scheduler.ripple_carry_adder(W)
n_gates = 5 * W - 3

r = np.random.default_rng(1)
xs = r.integers(0, 1 << W, B, dtype=np.uint64)
ys = r.integers(0, 1 << W, B, dtype=np.uint64)
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

trace_buckets = None
if os.environ.get("CIRCUIT_TRACE", "") not in ("", "0"):
    trace_dir = "/tmp/tfhe_trace_circuit"
    with jax.profiler.trace(trace_dir):
        out = run()
        jax.device_get(np.asarray(out[-1, -1, :2]))
    from xplane_util import parse_device_ops, bucket_ops
    ops, _ = parse_device_ops(trace_dir)
    trace_buckets = bucket_ops(ops, [
        ("step_kernel(pallas)", ["cmux", "ck_dot", "rotate_decompose",
                                 "custom-call"]),
        ("matmul(keyswitch)", ["dot", "convolution"]),
        ("elementwise/glue", ["fusion", "add", "subtract", "select",
                              "iota", "compare", "convert", "shift"]),
        ("relayout/copy", ["copy", "transpose", "reshape", "slice",
                           "concatenate", "gather", "scatter", "dynamic"]),
    ])
    trace_buckets = {k: round(v, 3) for k, v in trace_buckets.items()}
    trace_buckets["device_total_s"] = round(sum(ops.values()), 3)

times = []
for _ in range(REPS):
    t0 = time.time()
    out = run()
    jax.device_get(np.asarray(out[-1, -1, :2]))
    times.append(time.time() - t0)
best = min(times)

dec = np.stack([np.asarray(gate.decrypt_bool(sk, out[:, b]))
                for b in range(B)])                   # (B, W+1)
got = np.zeros(B, np.uint64)
for i in range(W + 1):
    got |= dec[:, i].astype(np.uint64) << np.uint64(i)
want = (xs + ys) & np.uint64((1 << (W + 1)) - 1)
ok = bool(np.array_equal(got, want))

rep = obs.report()
result = {
    "metric": "adders_per_sec",
    "value": round(B / best, 1),
    "unit": "circuits/s",
    "bits": W,
    "batch": B,
    "gates_per_circuit": n_gates,
    "gate_bootstraps_per_sec": round(B * n_gates / best, 1),
    "wall_s": round(best, 3),
    "waves": rep["counters"].get("circuit.waves", 0) // max(1, REPS + 1),
    "wave_compiles": rep["counters"].get("circuit.wave_compiles", 0),
    "params": os.environ.get("ADD_PARAMS", "fast2"),
    "backend": backend,
    "device": str(dev),
    "keygen_s": round(keygen_s, 1),
    "all_correct": ok,
}
if trace_buckets is not None:
    result["trace_buckets_s"] = trace_buckets
print(json.dumps(result), flush=True)

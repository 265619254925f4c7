#!/usr/bin/env python3
"""Same-process interleaved A/B of wave chaining (TFHE_WAVE_CHAIN) on the
32-bit ripple-adder workload (VERDICT r4 item 6's remaining gap: the
adder runs at ~82% of the raw bootstrap rate, with ~16% device idle from
per-launch dispatch — bench_results/circuit_adder32_trace_r5.json).

Chain K consecutive launches into one XLA program and measure whether the
dispatch gap closes.  Interleaved same-process reps per the r4/r5
measurement protocol (cross-session chip drift reached 17%; within-session
spread is ±0.3%).

Env: ADD_BITS (32), ADD_BATCH (8192), ADD_PARAMS (fast2), ADD_BACKEND
(onthefly), CHAIN_CONFIGS ("1,10"), ADD_REPS (2, per config, interleaved).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
if os.environ.get("ADD_PLATFORM"):       # the axon plugin ignores
    jax.config.update("jax_platforms",   # JAX_PLATFORMS; force in-process
                      os.environ["ADD_PLATFORM"])
import jax.numpy as jnp

from tfhe_tpu.params import GATE_FAST2, GATE_MXU2, GATE_MXU, GATE_TOY
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate
from tfhe_tpu.runtime import scheduler
from tfhe_tpu.utils import observability as obs

W = int(os.environ.get("ADD_BITS", 32))
B = int(os.environ.get("ADD_BATCH", 8192))
params = {"fast2": GATE_FAST2, "mxu2": GATE_MXU2, "mxu": GATE_MXU,
          "toy": GATE_TOY}[
    os.environ.get("ADD_PARAMS", "fast2")]
backend = os.environ.get("ADD_BACKEND", "onthefly")
configs = [int(k) for k in os.environ.get("CHAIN_CONFIGS", "1,10").split(",")]
REPS = int(os.environ.get("ADD_REPS", 2))

t0 = time.time()
rng = TfheRng(0)
sk = gate.SecretKey.generate(params, rng)
ck = gate.CloudKey.generate(sk, rng, backend=backend)
print(f"# keygen {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

circ, outs = scheduler.ripple_carry_adder(W)
n_gates = 5 * W - 3

r = np.random.default_rng(1)
xs = r.integers(0, 1 << W, B, dtype=np.uint64)
ys = r.integers(0, 1 << W, B, dtype=np.uint64)
bits = np.zeros((2 * W, B), np.int64)
for i in range(W):
    bits[i] = (xs >> np.uint64(i)) & np.uint64(1)
    bits[W + i] = (ys >> np.uint64(i)) & np.uint64(1)
cts = jnp.asarray(np.stack([np.asarray(gate.encrypt_bool(sk, bits[w], rng))
                            for w in range(2 * W)]))


def run(k):
    os.environ["TFHE_WAVE_CHAIN"] = str(k)
    out = scheduler.evaluate(circ, cts, ck.data, params, outs,
                             backend=backend)
    jax.device_get(np.asarray(out[-1, -1, :2]))
    return out


# warmup/compile each config once (chain jits cache in-process)
for k in configs:
    t0 = time.time()
    run(k)
    rep = obs.report()["counters"]
    print(f"# warmup K={k}: {time.time()-t0:.1f}s "
          f"(chain_compiles so far: {rep.get('circuit.chain_compiles', 0)})",
          file=sys.stderr, flush=True)

times = {k: [] for k in configs}
out = None
for _ in range(REPS):
    for k in configs:
        t0 = time.time()
        out = run(k)
        dt = time.time() - t0
        times[k].append(dt)
        print(f"K={k:>3}: {dt:7.1f} s = {B * n_gates / dt:7.1f} boots/s",
              file=sys.stderr, flush=True)

dec = np.stack([np.asarray(gate.decrypt_bool(sk, out[:, b]))
                for b in range(B)])
got = np.zeros(B, np.uint64)
for i in range(W + 1):
    got |= dec[:, i].astype(np.uint64) << np.uint64(i)
ok = bool(np.array_equal(got, (xs + ys) & np.uint64((1 << (W + 1)) - 1)))

result = {
    "metric": "adder_wave_chain_ab",
    "bits": W, "batch": B, "params": os.environ.get("ADD_PARAMS", "fast2"),
    "backend": backend, "device": jax.devices()[0].device_kind,
    "gates_per_circuit": n_gates,
    "rows": [{
        "chain_k": k,
        "best_s": round(min(ts), 2),
        "all_s": [round(t, 2) for t in ts],
        "best_boots_s": round(B * n_gates / min(ts), 1),
        "best_circuits_s": round(B / min(ts), 1),
    } for k, ts in times.items()],
    "chain_compiles": obs.report()["counters"].get("circuit.chain_compiles"),
    "all_correct": ok,
}
print(json.dumps(result))

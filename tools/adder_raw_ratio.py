#!/usr/bin/env python3
"""SAME-PROCESS adder-vs-raw-bootstrap ratio (the honest version of the
"adder runs at X% of the raw rate" number).

The r4/r5 ratio (8,224 adder boots/s vs the 10,077 bench.py record) mixed
two sessions — and cross-session tunnel/chip drift reached 17-21% this
round.  Here both sides run in ONE process, interleaved:

  - adder: the 32-bit ripple-carry circuit through runtime/scheduler.py
    (157 knee-capped dependent launches of B rows each), and
  - raw:   a dependent chain of the SAME COUNT of gate-NAND launches of
    the same width with zero circuit glue (no stacking, no store, no
    wave scheduling) — the per-launch speed-of-light of the chip+tunnel.

Env: ADD_BITS (32), ADD_BATCH (8192), ADD_PARAMS (fast2), ADD_BACKEND
(onthefly), ADD_REPS (2 interleaved pairs).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
if os.environ.get("ADD_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["ADD_PLATFORM"])
import jax.numpy as jnp

from tfhe_tpu.params import GATE_FAST2, GATE_MXU2, GATE_MXU, GATE_TOY
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate
from tfhe_tpu.runtime import scheduler

W = int(os.environ.get("ADD_BITS", 32))
B = int(os.environ.get("ADD_BATCH", 8192))
params = {"fast2": GATE_FAST2, "mxu2": GATE_MXU2, "mxu": GATE_MXU,
          "toy": GATE_TOY}[os.environ.get("ADD_PARAMS", "fast2")]
backend = os.environ.get("ADD_BACKEND", "onthefly")
REPS = int(os.environ.get("ADD_REPS", 2))
os.environ.pop("TFHE_WAVE_CHAIN", None)      # legacy per-launch path

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


def run_adder():
    out = scheduler.evaluate(circ, cts, ck.data, params, outs,
                             backend=backend)
    jax.device_get(np.asarray(out[-1, -1, :2]))
    return out


nand_jit = jax.jit(lambda k, a, b: gate.gate_nand(k, a, b, params, backend))
raw_a = cts[0]                                   # (B, n+1)
raw_b = cts[1]


def run_raw():
    x = raw_a
    for _ in range(n_gates):                     # dependent launch chain
        x = nand_jit(ck.data, x, raw_b)
    jax.device_get(np.asarray(x[-1, :2]))
    return x


# warmup/compile both paths
for f, name in ((run_adder, "adder"), (run_raw, "raw")):
    t0 = time.time()
    f()
    print(f"# warmup {name}: {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

t_add, t_raw = [], []
out = None
for _ in range(REPS):
    t0 = time.time(); out = run_adder(); t_add.append(time.time() - t0)
    t0 = time.time(); xf = run_raw();    t_raw.append(time.time() - t0)
    print(f"adder {t_add[-1]:7.1f} s = {B*n_gates/t_add[-1]:7.1f} boots/s"
          f" | raw {t_raw[-1]:7.1f} s = {B*n_gates/t_raw[-1]:7.1f} boots/s"
          f" | ratio {t_raw[-1]/t_add[-1]*100:.1f}%",
          file=sys.stderr, flush=True)

# decrypt-verify both endpoints
dec = np.stack([np.asarray(gate.decrypt_bool(sk, out[:, b]))
                for b in range(B)])
got = np.zeros(B, np.uint64)
for i in range(W + 1):
    got |= dec[:, i].astype(np.uint64) << np.uint64(i)
ok_add = bool(np.array_equal(
    got, (xs + ys) & np.uint64((1 << (W + 1)) - 1)))
plain = bits[0].astype(bool)
for _ in range(n_gates):
    plain = ~(plain & bits[1].astype(bool))
ok_raw = bool(np.array_equal(np.asarray(gate.decrypt_bool(sk, xf)),
                             plain))

result = {
    "metric": "adder_vs_raw_same_process",
    "bits": W, "batch": B, "params": os.environ.get("ADD_PARAMS", "fast2"),
    "backend": backend, "device": jax.devices()[0].device_kind,
    "launches_each": n_gates,
    "adder_best_s": round(min(t_add), 2), "adder_all_s": [round(t, 2) for t in t_add],
    "raw_best_s": round(min(t_raw), 2), "raw_all_s": [round(t, 2) for t in t_raw],
    "adder_boots_s": round(B * n_gates / min(t_add), 1),
    "raw_boots_s": round(B * n_gates / min(t_raw), 1),
    "adder_pct_of_raw": round(min(t_raw) / min(t_add) * 100, 1),
    "adder_correct": ok_add, "raw_correct": ok_raw,
}
print(json.dumps(result))

#!/usr/bin/env python3
"""Same-process A/B: FLAT vs 3-D scan carry for the fused v2 gate path
(GATE_FAST2 — the flagship 10k ct/s configuration).

The adder trace (circuit_adder32_trace_r5.json) showed XLA inserting
~100 us/step of while-carry relayout copies around the v2 custom call
when the carry is the 3-D (B, k+1, N) view.  The flat path carries
(B, (k+1)*N) end to end (TFHE_V2_FLAT toggles at trace time).

Env: B (8192), REPS (4), STEPS (full n).
"""
import os, sys, time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tfhe_tpu.params import GATE_FAST2
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate

B = int(os.environ.get("B", 8192))
REPS = int(os.environ.get("REPS", 4))
p = GATE_FAST2

rng = TfheRng(0)
t0 = time.time()
sk = gate.SecretKey.generate(p, rng)
ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
print(f"# keygen {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
bits = np.random.default_rng(1).integers(0, 2, B)
ct = gate.encrypt_bool(sk, bits, rng)

fns = {}
for name, env in [("flat", "1"), ("3d", "0")]:
    os.environ["TFHE_V2_FLAT"] = env
    fn = gate.make_bootstrap_fn(p, backend="onthefly")
    t0 = time.time()
    out = fn(ck.data, ct)
    jax.device_get(out[0, :4])
    print(f"# {name}: compile+first {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    fns[name] = fn

times = {n: [] for n in fns}
outs = {}
for rep in range(REPS):
    for name, fn in fns.items():
        t0 = time.time()
        out = fn(ck.data, ct)
        jax.device_get(out[0, :4])
        dt = time.time() - t0
        times[name].append(dt)
        outs[name] = out
        print(f"# rep{rep} {name}: {dt:.3f}s = {B/dt:.0f} ct/s",
              file=sys.stderr, flush=True)

same = bool(np.array_equal(np.asarray(outs["flat"]), np.asarray(outs["3d"])))
dec_ok = bool((np.asarray(gate.decrypt_bool(sk, outs["flat"]))
               == bits.astype(bool)).all())
import json
print(json.dumps({
    "metric": "v2_flat_carry_ab",
    "batch": B,
    "flat_best_s": round(min(times["flat"]), 3),
    "flat_ct_s": round(B / min(times["flat"]), 1),
    "3d_best_s": round(min(times["3d"]), 3),
    "3d_ct_s": round(B / min(times["3d"]), 1),
    "all_s": {k: [round(t, 3) for t in v] for k, v in times.items()},
    "outputs_identical": same,
    "decrypt_correct": dec_ok,
    "speedup": round(min(times["3d"]) / min(times["flat"]), 4),
}, indent=1), flush=True)

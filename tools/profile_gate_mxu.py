#!/usr/bin/env python3
"""Trace-attribute the GATE_MXU (N=1024) bootstrap wall-clock
(VERDICT r4 item 4): the step kernel runs at 86% of its MXU floor but the
bench sits at 73% of the 7.3k ct/s chunked-formulation roofline — so
>=13% of scan time is OUTSIDE the step kernel and has never been broken
down.

Captures one jax.profiler device trace of the full bootstrap (blind
rotation + extract + keyswitch) at BENCH-identical shapes, parses the
xplane proto, and buckets every device-op duration:

  step_kernel     ck_cmux_step32 / ck dot pallas calls
  keyswitch       the one-hot int8 contraction + limb recombination
  extract/glue    sample extract, relayout, scan plumbing, everything else

Env: B (8192), PARAMS (mxu|mxu2|fast2), BACKEND (default per ring).
Writes TRACE_JSON (default /tmp/gate_mxu_trace.json).
"""
import glob
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from tfhe_tpu.params import GATE_MXU, GATE_MXU2, GATE_FAST2
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate

B = int(os.environ.get("B", 8192))
params = {"mxu": GATE_MXU, "mxu2": GATE_MXU2, "fast2": GATE_FAST2}[
    os.environ.get("PARAMS", "mxu")]
backend = os.environ.get("BACKEND",
                         "chunked" if params.tgsw.tlwe.N >= 1024
                         else "onthefly")
dev = jax.devices()[0]

rng = TfheRng(0)
t0 = time.time()
sk = gate.SecretKey.generate(params, rng)
ck = gate.CloudKey.generate(sk, rng, backend=backend)
print(f"# keygen {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

bits = np.random.default_rng(1).integers(0, 2, B)
ct = gate.encrypt_bool(sk, bits, rng)
fn = gate.make_bootstrap_fn(params, backend=backend)

t0 = time.time()
out = fn(ck.data, ct)
jax.device_get(out[0, :4])
print(f"# compile+first {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

trace_dir = os.environ.get("TRACE_DIR", "/tmp/tfhe_trace_gate_mxu")
with jax.profiler.trace(trace_dir):
    out = fn(ck.data, ct)
    jax.device_get(out[0, :4])
t0 = time.time()
out = fn(ck.data, ct)
jax.device_get(out[0, :4])
wall_s = time.time() - t0
ok = bool((np.asarray(gate.decrypt_bool(sk, out)) == bits.astype(bool)).all())
print(f"# wall {wall_s:.3f}s = {B/wall_s:.0f} ct/s, correct={ok}",
      file=sys.stderr, flush=True)

# ---- parse the xplane: bucket device-op durations ----
from xplane_util import parse_device_ops, bucket_ops
from collections import defaultdict

ops, op_line = parse_device_ops(trace_dir)


def bucket(name: str) -> str:
    n = name.lower()
    if "ck_cmux" in n or "ck_dot" in n or "rotate_decompose" in n or \
       "cmux" in n or "custom-call" in n:
        return "step_kernel(pallas)"
    if "dot" in n or "convolution" in n:
        return "matmul(keyswitch/recombine)"
    if "fusion" in n or "add" in n or "subtract" in n or "select" in n \
       or "iota" in n or "compare" in n or "convert" in n or "shift" in n:
        return "elementwise/glue"
    if "copy" in n or "transpose" in n or "reshape" in n or "slice" in n \
       or "concatenate" in n or "gather" in n or "scatter" in n \
       or "dynamic" in n:
        return "relayout/copy"
    return "other"


buckets = defaultdict(float)
top = sorted(ops.items(), key=lambda kv: -kv[1])[:25]
for name, s in ops.items():
    buckets[bucket(name)] += s

result = {
    "metric": "gate_mxu_trace_breakdown",
    "batch": B, "backend": backend,
    "params": os.environ.get("PARAMS", "mxu"),
    "device": str(dev),
    "wall_s": round(wall_s, 3),
    "ct_per_s": round(B / wall_s, 1),
    "device_total_s": round(sum(ops.values()), 3),
    "op_line": list(op_line),
    "buckets_s": {k: round(v, 4) for k, v in
                  sorted(buckets.items(), key=lambda kv: -kv[1])},
    "top_ops_s": [[n, round(s, 4)] for n, s in top],
    "all_correct": ok,
}
out_path = os.environ.get("TRACE_JSON", "/tmp/gate_mxu_trace.json")
with open(out_path, "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps({k: v for k, v in result.items() if k != "top_ops_s"},
                 indent=1), flush=True)
print(f"# full breakdown -> {out_path}", file=sys.stderr)

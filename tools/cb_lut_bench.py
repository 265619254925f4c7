#!/usr/bin/env python3
"""Composed CB -> TRGSW -> LUT evaluation at full parameters on the
accelerator (VERDICT r3 item 5; BASELINE config 4 "composed LUT eval",
the capability circuit bootstrapping exists for: tgsw_functions.cpp:405-449
consumers).

Workload: B = L_INSTANCES * K_BITS fresh LWE bits -> circuit bootstrap
(staged pipeline) -> group into K_BITS selectors per instance ->
eval_lut_batch over a random 2^K table of torus32 values -> decrypt the
selected TRLWE and check every instance hits its table row.  Prints one
JSON row with LUTs/s, the end-to-end latency, and the measured noise
margin.

Env: CB_PARAMS (mxu|active), CB_BACKEND (chunked), LUT_BITS (4),
LUT_INSTANCES (64), CB_KEYCACHE (shared with cb_tpu_bench.py).
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

from tfhe_tpu.params import CB_ACTIVE, CB_MXU, CB_TOY
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import lwe, tlwe
from tfhe_tpu.boot import circuit
from tfhe_tpu.models import lut
from tfhe_tpu.utils import serialization

K = int(os.environ.get("LUT_BITS", 4))
NI = int(os.environ.get("LUT_INSTANCES", 64))
B = K * NI
p = {"active": CB_ACTIVE, "mxu": CB_MXU,
     "toy": CB_TOY}[os.environ.get("CB_PARAMS", "mxu")]
backend = os.environ.get("CB_BACKEND", "chunked")
lut_backend = os.environ.get("LUT_BACKEND", "conv")
dev = jax.devices()[0]

t0 = time.time()
rng = TfheRng(0)
sk = circuit.CircuitSecretKey.generate(p, rng)
cache = os.environ.get("CB_KEYCACHE", "/tmp/cb_circuit_key_%s.npz"
                       % os.environ.get("CB_PARAMS", "mxu"))
if cache and os.path.exists(cache):
    key_data, _ = serialization.load_circuit_key(cache, backend=backend)
else:
    ck = circuit.CircuitCloudKey.generate(sk, rng, backend=backend,
                                          keep_raw_bk=bool(cache))
    key_data = ck.data
    if cache:
        serialization.save_circuit_key(cache, ck)
keygen_s = time.time() - t0
print(f"# keys ready {keygen_s:.1f}s", file=sys.stderr, flush=True)

r = np.random.default_rng(1)
idx = r.integers(0, 1 << K, NI)
bits = ((idx[:, None] >> np.arange(K)[None, :]) & 1).reshape(-1)  # LSB first
msgs = np.where(bits.astype(bool), np.int32(-(1 << 31)), 0).astype(np.int32)
ct = lwe.encrypt(sk.lwe_lvl1, msgs, rng, 2.0**-20)
# 4-bit message space (grid 2^28): the CMux-tree decomposition tail at the
# lvl1 gadget (l*bgbit=16) is ~2^24-2^25 over K levels, so coarse-grid
# messages decode exactly; the JSON records the measured margin
table = (r.integers(0, 16, 1 << K).astype(np.int32) << 28)

cb = circuit.make_circuit_bootstrap_staged(p, backend=backend,
                                           shared_rotation=None)


def pipeline(ct):
    gsw = cb(ct, key_data)                        # (B, 2, l1, 2, N1)
    sel = gsw.reshape(NI, K, *gsw.shape[1:])
    return lut.eval_lut_batch(sel, jnp.asarray(table), p.tgsw_lvl1,
                              backend=lut_backend)


t0 = time.time()
out = pipeline(ct)
jax.device_get(out[0, 0, :4])
compile_s = time.time() - t0
print(f"# compile+first {compile_s:.1f}s", file=sys.stderr, flush=True)

times = []
for _ in range(int(os.environ.get("CB_REPS", 3))):
    t0 = time.time()
    out = pipeline(ct)
    jax.device_get(out[0, 0, :4])
    times.append(time.time() - t0)
best = min(times)

# decrypt-verify every instance: coefficient-0 phase == table[idx]
from tfhe_tpu.boot.gate import host_keygen_device
with host_keygen_device():
    ph = np.asarray(tlwe.tlwe_phase(jnp.asarray(np.asarray(out)),
                                    sk.ring_lvl1))[:, 0]
err = np.abs(((ph.astype(np.int64) - table[idx].astype(np.int64)
               + 2**31) % 2**32) - 2**31)
margin_bits = float(np.log2(max(int(err.max()), 1)))
dec = ((ph.astype(np.int64) + (1 << 27)) >> 28) & 15
all_correct = bool((dec == ((table[idx] >> 28) & 15)).all())

result = {
    "metric": "cb_lut_eval_ms",
    "value": round(best / NI * 1e3, 2),
    "unit": "ms/LUT",
    "vs_baseline": round((137.0 * K) / (best / NI * 1e3), 2),
    "luts_per_s": round(NI / best, 1),
    "batch_latency_s": round(best, 3),
    "lut_bits": K,
    "instances": NI,
    "cb_backend": backend,
    "lut_backend": lut_backend,
    "params": os.environ.get("CB_PARAMS", "mxu"),
    "device": str(dev),
    "keys_ready_s": round(keygen_s, 1),
    "noise_margin_log2": round(margin_bits, 1),
    "all_correct": all_correct,
}
print(json.dumps(result), flush=True)

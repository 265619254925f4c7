#!/usr/bin/env python3
"""Circuit bootstrapping at FULL parameters on the accelerator (VERDICT r1
item 3): TLWE->TRGSW at CB_ACTIVE (n0=500, N1=1024, N2=2048, torus64 lvl2,
Bg2=2^9, l2=4), batched.

Reference headline: 137 ms per circuit bootstrap on one Core i7 core
(circuit-bootstrapping/README.md:5).  Prints JSON rows: latency per ct,
batch throughput, and a full decrypt-probe correctness verdict (every
TRGSW row's phase checked, then a CMux drive).

Env: CB_BATCH (default 32), CB_PARAMS (active|toy), CB_BACKEND (conv).
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

from tfhe_tpu.params import (CB_ACTIVE, CB_MXU, CB_TOY, CB_PAPER,
                             CB_ALT_155MS, CB_ALT_180MS)
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import lwe, tlwe, tgsw
from tfhe_tpu.boot import circuit, probe

B = int(os.environ.get("CB_BATCH", 32))
p = {"active": CB_ACTIVE, "mxu": CB_MXU, "toy": CB_TOY,
     # the reference's other annotated blocks (VERDICT r4 item 9):
     # poc_CircuitBootstrapping.cpp:18-34 (paper), :53-68 (155-181 ms),
     # :36-51 (180-210 ms)
     "paper": CB_PAPER, "alt155": CB_ALT_155MS,
     "alt180": CB_ALT_180MS}[os.environ.get("CB_PARAMS", "active")]
backend = os.environ.get("CB_BACKEND", "conv")
# Engine knob for the big alternate blocks: the untruncated 8-limb lvl2
# key at l2=6 wants a 12.4 GB chunked wm (doesn't fit v5e HBM); 6 limbs
# (top 48 bits) adds 2^-49.8 truncation noise — negligible vs the alt
# blocks' 2^-45 bk stdev, ~doubles variance at CB_PAPER's 2^-50 (still
# orders under the budget; the decrypt probe verifies).
bk_limbs = int(os.environ.get("CB_BK_LIMBS", 0))
if bk_limbs:
    import dataclasses as _dc
    p = _dc.replace(p, tgsw_lvl2=_dc.replace(p.tgsw_lvl2,
                                             key_limbs=bk_limbs))
dev = jax.devices()[0]

from tfhe_tpu.utils import observability as obs
from tfhe_tpu.utils import serialization

t0 = time.time()
rng = TfheRng(0)
# key cache: ALL backends, stored at raw-bk scale (the chunked wm is
# rebuilt on-device at load — serialization.load_circuit_key)
cache = os.environ.get("CB_KEYCACHE", "/tmp/cb_circuit_key_%s.npz"
                       % os.environ.get("CB_PARAMS", "active"))
sk = circuit.CircuitSecretKey.generate(p, rng)
keygen_spans = {}
reload_s = None
if cache and os.path.exists(cache):
    key_data, _lp = serialization.load_circuit_key(cache, backend=backend)
    reload_s = time.time() - t0
    print(f"# key reload {reload_s:.1f}s (vs regenerate)", file=sys.stderr,
          flush=True)
else:
    ck = circuit.CircuitCloudKey.generate(sk, rng, backend=backend,
                                          keep_raw_bk=bool(cache))
    key_data = ck.data
    keygen_spans = {k: round(v["total_s"], 2)
                    for k, v in obs.report()["spans"].items()
                    if k.startswith("keygen.circuit")}
    print(f"# keygen spans: {keygen_spans}", file=sys.stderr, flush=True)
    if cache:
        t1 = time.time()
        serialization.save_circuit_key(cache, ck)
        print(f"# key save {time.time()-t1:.1f}s -> {cache}",
              file=sys.stderr, flush=True)
keygen_s = time.time() - t0
print(f"# keygen {keygen_s:.1f}s", file=sys.stderr, flush=True)

bits = np.random.default_rng(1).integers(0, 2, B)
msgs = np.where(bits.astype(bool), np.int32(-(1 << 31)), 0).astype(np.int32)
ct = lwe.encrypt(sk.lwe_lvl1, msgs, rng, 2.0**-20)

fn = circuit.make_circuit_bootstrap_staged(p, backend=backend,
                                           shared_rotation=None)
t0 = time.time()
gsw = fn(ct, key_data)
jax.device_get(gsw[0, 0, 0, 0, :4])
compile_s = time.time() - t0
print(f"# compile+first {compile_s:.1f}s", file=sys.stderr, flush=True)

times = []
for _ in range(int(os.environ.get("CB_REPS", 3))):
    t0 = time.time()
    gsw = fn(ct, key_data)
    jax.device_get(gsw[0, 0, 0, 0, :4])
    times.append(time.time() - t0)
best = min(times)

# ---- correctness: decrypt-probe every TRGSW row, then drive a CMux ----
from tfhe_tpu.boot.gate import host_keygen_device
with host_keygen_device():
    phases, max_dev = probe.probe_tgsw_rows(np.asarray(gsw), sk.ring_lvl1,
                                            p.tgsw_lvl1, message=bits)
h = [1 << (32 - (w + 1) * p.tgsw_lvl1.bgbit) for w in range(p.tgsw_lvl1.l)]
ok = max_dev < 2.0**-8
# CMux: select between two trivial TLWE messages with the bootstrapped gsw
m0 = np.zeros(p.n_lvl1, np.int32); m0[0] = 1 << 29
m1 = np.zeros(p.n_lvl1, np.int32); m1[0] = -(1 << 29)
d0 = tlwe.noiseless_trivial_poly(jnp.asarray(m0)[None], p.lvl1.k)
d1 = tlwe.noiseless_trivial_poly(jnp.asarray(m1)[None], p.lvl1.k)
gsw_h = np.asarray(gsw)
cmux_ok = True
with host_keygen_device():             # eager probe math on the host CPU
    for i in list(range(min(B, 4))):
        _, prep = tgsw.prepare(jnp.asarray(gsw_h[i]), p.tgsw_lvl1, "matmul")
        sel = tgsw.cmux(prep, d1, d0, p.tgsw_lvl1, "matmul")
        ph0 = int(np.asarray(tlwe.tlwe_phase(sel, sk.ring_lvl1))[0, 0])
        want = -(1 << 29) if bits[i] else (1 << 29)
        cmux_ok = cmux_ok and abs(ph0 - want) < (1 << 27)

result = {
    "metric": "circuit_bootstrap_ms",
    "value": round(best / B * 1e3, 2),
    "unit": "ms/ct",           # batch-amortized; the actual batch latency
    "batch_latency_s": round(best, 3),
    "vs_baseline": round(137.0 / (best / B * 1e3), 2),
    # the reference's own annotated timing for THIS block (poc comments)
    "ref_annotated_ms": {"active": "144+", "paper": "137 (README headline)",
                         "alt155": "155-181", "alt180": "180-210",
                         "mxu": "n/a (TPU-first reparam)",
                         "toy": "n/a"}[os.environ.get("CB_PARAMS", "active")],
    "throughput_ct_s": round(B / best, 1),
    "batch": B,
    "backend": backend,
    "params": f"n0={p.n_lvl0},N1={p.n_lvl1},N2={p.n_lvl2},l2={p.tgsw_lvl2.l}"
              + (f",bk_limbs={bk_limbs}" if bk_limbs else ""),
    "device": str(dev),
    "keygen_s": round(keygen_s, 1),
    "keygen_spans": keygen_spans,
    "key_reload_s": None if reload_s is None else round(reload_s, 1),
    "row_probe_max_dev": float(max_dev),
    "rows_correct": bool(ok),
    "cmux_correct": cmux_ok,
}
print(json.dumps(result), flush=True)

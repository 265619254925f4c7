#!/usr/bin/env python3
"""Single-ciphertext / small-batch LATENCY (VERDICT r4 item 3).

Every recorded repo number so far is batch-amortized throughput (B>=128);
the reference's actual headline is the latency of ONE circuit bootstrap
(~137 ms single-core, circuit-bootstrapping/README.md:5, per-trial loop
poc_CircuitBootstrapping.cpp:1008-1016).  This records wall-clock per
bootstrap at B in {1, 8, 32} for the gate sets (GATE_DEFAULT, GATE_FAST2)
and the circuit sets (CB_MXU, CB_ACTIVE).

Timing honesty through the axon tunnel: repeated same-input dispatches
lie (~25 us for a 900 us kernel — verify-skill note), so every rep feeds
a DISTINCT pre-encrypted input and is timed around a full device_get of
the output.  Correctness: every gate output batch is decrypted and
checked; CB outputs decrypt-probed.

Env: LAT_REPS (5), LAT_SETS (comma list from
     gate_default,gate_fast2,cb_mxu,cb_active; default all).
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

from tfhe_tpu.params import GATE_DEFAULT, GATE_FAST2, CB_MXU, CB_ACTIVE
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import lwe
from tfhe_tpu.boot import gate, circuit, probe
from tfhe_tpu.utils import serialization

REPS = int(os.environ.get("LAT_REPS", 5))
SETS = os.environ.get("LAT_SETS",
                      "gate_default,gate_fast2,cb_mxu,cb_active").split(",")
BATCHES = (1, 8, 32)
dev = jax.devices()[0]
rows = []


def time_reps(fn, inputs, get_probe):
    """One warm-up on inputs[0], then one timed call per distinct input."""
    out = fn(inputs[0])
    jax.device_get(get_probe(out))
    ts = []
    outs = []
    for x in inputs[1:]:
        t0 = time.time()
        out = fn(x)
        jax.device_get(get_probe(out))
        ts.append(time.time() - t0)
        outs.append(out)
    return ts, outs


def bench_gate(name, p, backend):
    rng = TfheRng(0)
    sk = gate.SecretKey.generate(p, rng)
    ck = gate.CloudKey.generate(sk, rng, backend=backend)
    key_data = ck.data
    for B in BATCHES:
        gen = np.random.default_rng(B)
        bits_a = gen.integers(0, 2, (REPS + 1, B))
        bits_b = gen.integers(0, 2, (REPS + 1, B))
        cts = [(gate.encrypt_bool(sk, bits_a[i], rng),
                gate.encrypt_bool(sk, bits_b[i], rng))
               for i in range(REPS + 1)]
        fn = lambda ab: gate.gate_nand(key_data, ab[0], ab[1], p,
                                       backend=backend)
        ts, outs = time_reps(fn, cts, lambda o: o)
        ok = all(
            (np.asarray(gate.decrypt_bool(sk, o)) ==
             ~(bits_a[1 + i].astype(bool) & bits_b[1 + i].astype(bool))).all()
            for i, o in enumerate(outs))
        best = min(ts)
        rows.append({
            "set": name, "kind": "gate_nand", "batch": B, "backend": backend,
            "latency_ms": round(best * 1e3, 2),
            "ms_per_ct": round(best / B * 1e3, 3),
            "all_ms": [round(t * 1e3, 2) for t in ts],
            "all_correct": bool(ok),
        })
        print(f"# {name} B={B}: {best*1e3:.1f} ms batch latency, "
              f"correct={ok}", file=sys.stderr, flush=True)


def bench_cb(name, p, cache):
    rng = TfheRng(0)
    sk = circuit.CircuitSecretKey.generate(p, rng)
    if cache and os.path.exists(cache):
        key_data, _ = serialization.load_circuit_key(cache, backend="chunked")
    else:
        ck = circuit.CircuitCloudKey.generate(sk, rng, backend="chunked",
                                              keep_raw_bk=bool(cache))
        if cache:
            serialization.save_circuit_key(cache, ck)
        key_data = ck.data
    fn = circuit.make_circuit_bootstrap_staged(p, backend="chunked",
                                               shared_rotation=None)
    for B in BATCHES:
        gen = np.random.default_rng(B)
        bits = gen.integers(0, 2, (REPS + 1, B))
        cts = []
        for i in range(REPS + 1):
            msgs = np.where(bits[i].astype(bool), np.int32(-(1 << 31)),
                            0).astype(np.int32)
            cts.append(lwe.encrypt(sk.lwe_lvl1, msgs, rng, 2.0**-20))
        ts, outs = time_reps(lambda x: fn(x, key_data), cts,
                             lambda o: o[..., :1, :1, :1, :4])
        _, max_dev = probe.probe_tgsw_rows(np.asarray(outs[-1]),
                                           sk.ring_lvl1, p.tgsw_lvl1,
                                           message=bits[REPS])
        best = min(ts)
        rows.append({
            "set": name, "kind": "circuit_bootstrap", "batch": B,
            "backend": "chunked",
            "latency_ms": round(best * 1e3, 2),
            "ms_per_ct": round(best / B * 1e3, 2),
            "all_ms": [round(t * 1e3, 2) for t in ts],
            "vs_ref_137ms_latency": round(137.0 / (best * 1e3), 2),
            "rows_correct": bool(max_dev < 2.0**-8),
        })
        print(f"# {name} B={B}: {best*1e3:.1f} ms batch latency, "
              f"dev={float(max_dev):.2e}", file=sys.stderr, flush=True)


if "gate_default" in SETS:
    bench_gate("GATE_DEFAULT", GATE_DEFAULT, "chunked")
if "gate_fast2" in SETS:
    bench_gate("GATE_FAST2", GATE_FAST2, "onthefly")
if "gate_fast2_chunked" in SETS:
    # latency-optimal backend at tiny B: the onthefly engine's per-step
    # key materialization is batch-independent overhead (fine at B=8192,
    # dominant at B=1); the chunked backend pre-materializes at keygen
    bench_gate("GATE_FAST2_chunked", GATE_FAST2, "chunked")
if "cb_mxu" in SETS:
    bench_cb("CB_MXU", CB_MXU, "/tmp/cb_circuit_key_mxu.npz")
if "cb_active" in SETS:
    bench_cb("CB_ACTIVE", CB_ACTIVE, "/tmp/cb_circuit_key_active.npz")

print(json.dumps({"metric": "small_batch_latency", "device": str(dev),
                  "reps": REPS, "rows": rows}, indent=1), flush=True)

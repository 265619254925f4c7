#!/usr/bin/env python3
"""Same-process interleaved A/B for the CB_ACTIVE r4 regression
(VERDICT r4 item 1): did raising the Mosaic scoped-VMEM cap from 16 MB to
64 MB (round-4 change) cost CB_ACTIVE its 7.65 ms/ct, or was 9.5 ms/ct
chip drift?

Method: ONE process, ONE key, four separately-jitted staged pipelines —
(vmem cap 16 MB | 64 MB) x (ck_dot64p lgsize 1 | 2) — all compiled first,
then timing reps strictly interleaved A,B,C,D,A,B,C,D,... so chip-state
drift hits every config equally.  Decrypt-probe on the last output of
each config.

Both knobs are read at TRACE time (pallas_kernels._cparams reads the
module global; engine.make_ck64 reads TFHE_CK64_LG), so mutating them
between `make_circuit_bootstrap_staged` calls bakes them into separate
XLA programs.

Env: CB_BATCH (256), CB_REPS (5 per config), CB_PARAMS (active).
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

from tfhe_tpu.params import CB_ACTIVE, CB_MXU
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import lwe
from tfhe_tpu.boot import circuit, probe
from tfhe_tpu.ops import pallas_kernels as pk
from tfhe_tpu.utils import serialization

B = int(os.environ.get("CB_BATCH", 256))
REPS = int(os.environ.get("CB_REPS", 5))
p = {"active": CB_ACTIVE, "mxu": CB_MXU}[os.environ.get("CB_PARAMS",
                                                        "active")]
backend = "chunked"
dev = jax.devices()[0]

cache = "/tmp/cb_circuit_key_%s.npz" % os.environ.get("CB_PARAMS", "active")
t0 = time.time()
rng = TfheRng(0)
sk = circuit.CircuitSecretKey.generate(p, rng)
if os.path.exists(cache):
    key_data, _ = serialization.load_circuit_key(cache, backend=backend)
else:
    ck = circuit.CircuitCloudKey.generate(sk, rng, backend=backend,
                                          keep_raw_bk=True)
    serialization.save_circuit_key(cache, ck)
    key_data = ck.data
print(f"# keys ready {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

bits = np.random.default_rng(1).integers(0, 2, B)
msgs = np.where(bits.astype(bool), np.int32(-(1 << 31)), 0).astype(np.int32)
ct = lwe.encrypt(sk.lwe_lvl1, msgs, rng, 2.0**-20)

CONFIGS = [("16MB_lg1", 16 * 2**20, "1"), ("16MB_lg2", 16 * 2**20, "2"),
           ("64MB_lg1", 64 * 2**20, "1"), ("64MB_lg2", 64 * 2**20, "2")]

fns = {}
for name, cap, lg in CONFIGS:
    pk.VMEM_LIMIT = cap
    os.environ["TFHE_CK64_LG"] = lg
    fn = circuit.make_circuit_bootstrap_staged(p, backend=backend,
                                               shared_rotation=None)
    t0 = time.time()
    out = fn(ct, key_data)
    jax.device_get(out[0, 0, 0, 0, :4])
    print(f"# {name}: compile+first {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    fns[name] = fn

times = {name: [] for name, _, _ in CONFIGS}
last = {}
for rep in range(REPS):
    for name, cap, lg in CONFIGS:
        # knobs are baked at trace time; set anyway so any accidental
        # retrace would still see the right value
        pk.VMEM_LIMIT = cap
        os.environ["TFHE_CK64_LG"] = lg
        t0 = time.time()
        out = fns[name](ct, key_data)
        jax.device_get(out[0, 0, 0, 0, :4])
        dt = time.time() - t0
        times[name].append(dt)
        last[name] = out
        print(f"# rep{rep} {name}: {dt:.3f}s = {dt/B*1e3:.2f} ms/ct",
              file=sys.stderr, flush=True)

rows = []
for name, cap, lg in CONFIGS:
    ts = times[name]
    _, max_dev = probe.probe_tgsw_rows(np.asarray(last[name]), sk.ring_lvl1,
                                       p.tgsw_lvl1, message=bits)
    rows.append({
        "config": name, "vmem_cap_mb": cap // 2**20, "lgsize": int(lg),
        "best_ms_per_ct": round(min(ts) / B * 1e3, 2),
        "median_ms_per_ct": round(sorted(ts)[len(ts) // 2] / B * 1e3, 2),
        "all_s": [round(t, 3) for t in ts],
        "rows_correct": bool(max_dev < 2.0**-8),
        "row_probe_max_dev": float(max_dev),
    })

print(json.dumps({
    "metric": "cb_active_vmem_lg_ab",
    "batch": B, "reps": REPS, "backend": backend,
    "params": f"n0={p.n_lvl0},N1={p.n_lvl1},N2={p.n_lvl2},l2={p.tgsw_lvl2.l}",
    "device": str(dev),
    "rows": rows,
}, indent=1), flush=True)

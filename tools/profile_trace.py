#!/usr/bin/env python3
"""jax.profiler trace capture + per-kernel roofline accounting (SURVEY §5;
VERDICT r1 item 10).

Captures a device trace of S blind-rotation steps into /tmp/tfhe_trace
(open with TensorBoard / xprof), then prints a roofline table for the
production kernels from first principles + the measured step time:

  kernel            bytes/step           int8-ops/step       bound
  materialize_w     W written once       —                   HBM write
  fused_cmux_v2     W read + acc r/w     2*B*JN*UN*L         MXU (531 us floor)
  keyswitch         onehot + ksk read    2*B*ntb*(n+1)*4     MXU

Run on the TPU; env B (default 4096), S (default 32).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax

from tfhe_tpu.params import GATE_FAST2
from tfhe_tpu import tgsw
from tfhe_tpu.ops.pallas_kernels import materialize_w, fused_cmux_step_v2

B = int(os.environ.get("B", 4096))
S = int(os.environ.get("S", 32))
gp = GATE_FAST2
p = gp.tgsw
N, kp1, l = p.tlwe.N, p.tlwe.k + 1, p.l
J = kp1 * l
cfg = tgsw.engine_config(p)
L, ks = cfg.num_limbs, cfg.key_shift
r = np.random.default_rng(0)
acc = jnp.asarray(r.integers(-2**31, 2**31, (B, kp1, N)).astype(np.int32))
abar = jnp.asarray(r.integers(0, 2 * N, (B, S)).astype(np.int32))
vs = jnp.asarray(r.integers(-128, 128, (S, L, J, kp1, 2 * N)).astype(np.int8))


@jax.jit
def loop(acc, abar, vs):
    def body(acc, xs):
        vv, a = xs
        W = materialize_w(vv)
        return fused_cmux_step_v2(a, acc, W, l=l, bgbit=p.bgbit,
                                  offset=p.offset, key_shift=ks, tm=256), None
    return lax.scan(body, acc, (vs, jnp.moveaxis(abar, -1, 0)))[0]


jax.device_get(loop(acc, abar, vs)[0, 0, :4])     # compile
trace_dir = os.environ.get("TRACE_DIR", "/tmp/tfhe_trace")
with jax.profiler.trace(trace_dir):
    jax.device_get(loop(acc, abar, vs)[0, 0, :4])
t0 = time.perf_counter()
jax.device_get(loop(acc, abar, vs)[0, 0, :4])
step_us = (time.perf_counter() - t0) / S * 1e6
print(f"trace written to {trace_dir}")

# ---- roofline accounting (v5e: 394 TOP/s int8 MXU, 819 GB/s HBM) ----
PEAK_TOPS, PEAK_GBS = 394e12, 819e9
JN, UN = J * N, kp1 * N
w_bytes = L * JN * UN                     # int8
ops = 2 * B * JN * UN * L
tiles = B // 256
hbm = w_bytes * (1 + tiles) + 2 * B * kp1 * N * 4   # write W, stream W/tile, acc r/w
t_mxu = ops / PEAK_TOPS * 1e6
t_hbm = hbm / PEAK_GBS * 1e6
print(f"per-step: measured {step_us:7.1f} us | MXU floor {t_mxu:6.1f} us "
      f"({ops/1e9:.1f} Gop int8) | HBM floor {t_hbm:6.1f} us "
      f"({hbm/1e6:.0f} MB) | bound: {'MXU' if t_mxu > t_hbm else 'HBM'}")
print(f"MXU utilization vs peak: {t_mxu / step_us * 100:.0f}%  "
      f"(VPU rotation pipeline + epilogue account for the rest)")

#!/usr/bin/env python3
"""H4-H6 parity: the COST dimension of the precision study, on-device.

The reference measures its int128 fixed-point FFT (code.cpp:574-586) and a
GMP/MPFR precision sweep (bench_fft_gmp.cpp:459-478, machine-readable row at
:478).  This harness times the TPU equivalents — the hp (16-bit-limb fixed
point) anticyclic FFT pair across limb counts, and the f32x2 double-float
FFT — batched (the TPU operating point), reporting per-transform time.

Prints one JSON row per configuration:
  {"kind": "hp_ifft", "N": 2048, "limbs": 6, "batch": 64,
   "us_per_transform": ..., "frac_bits": 96, ...}

Run on TPU (or CPU for smoke): python tools/hpfft_bench.py
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

from tfhe_tpu.ops import hpfft, fft

B = int(os.environ.get("HPFFT_BATCH", 64))
REPS = int(os.environ.get("HPFFT_REPS", 3))
dev = jax.devices()[0]


def timeit(fn, *args):
    out = jax.device_get(jax.tree.leaves(fn(*args))[0][..., :1])
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_get(jax.tree.leaves(fn(*args))[0][..., :1])
        best = min(best, time.perf_counter() - t0)
    return best


def row(**kw):
    print(json.dumps({"device": str(dev), "batch": B, **kw}), flush=True)


r = np.random.default_rng(0)
for N in (1024, 2048):
    a64 = jnp.asarray(r.integers(-2**63, 2**63, (B, N), dtype=np.int64))
    a32 = jnp.asarray(r.integers(-2**31, 2**31, (B, N)).astype(np.int32))

    for limbs in (4, 6, 8):
        # IPREC+FPREC analog: limbs*16 total bits, 64 fractional
        fwd = jax.jit(lambda x, l=limbs: hpfft.hp_ifft(x, l))
        re, im = fwd(a64)
        t = timeit(fwd, a64)
        row(kind="hp_ifft", N=N, limbs=limbs, bits=16 * limbs,
            us_per_transform=round(t / B * 1e6, 2))
        inv = jax.jit(hpfft.hp_fft)
        t = timeit(inv, re, im)
        row(kind="hp_fft", N=N, limbs=limbs, bits=16 * limbs,
            us_per_transform=round(t / B * 1e6, 2))

    ddf = jax.jit(fft.negacyclic_fft_dd_dev)
    parts = ddf(a32)
    t = timeit(ddf, a32)
    row(kind="dd_fft", N=N, limbs=2, bits=49,
        us_per_transform=round(t / B * 1e6, 2))
    ddi = jax.jit(lambda p, n=N: fft.negacyclic_ifft_dd_dev(p, n, 32))
    t = timeit(ddi, tuple(parts))
    row(kind="dd_ifft", N=N, limbs=2, bits=49,
        us_per_transform=round(t / B * 1e6, 2))

    if jax.default_backend() == "cpu":
        f64 = jax.jit(lambda x: fft.negacyclic_fft(x, precision="highest"))
        f64(a32)
        t = timeit(f64, a32)
        row(kind="xla_fft_f64", N=N, limbs=1, bits=53,
            us_per_transform=round(t / B * 1e6, 2))

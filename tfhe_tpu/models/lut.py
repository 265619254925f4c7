"""Leveled LUT evaluation with circuit-bootstrapped TRGSW selectors — the
"composed LUT evaluation" capability circuit bootstrapping exists for
(CGGI17 / SURVEY.md §2 C23, BASELINE.json config 4).

A k-bit LUT over torus outputs is evaluated as a CMux tree: 2^k leaf TRLWE
samples (noiseless trivial encodings of the table rows) folded level by
level with the TRGSW-encrypted selector bits.  All 2^(k-1-j) CMuxes of tree
level j run as ONE batched external product.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.params import TGswParams
from tfhe_tpu import tlwe, tgsw


def pack_table(values, N: int, dtype=jnp.int32):
    """Encode a table of torus scalars as constant-coefficient TRLWE leaves:
    leaf v = noiseless trivial of values[v] * X^0.  values: (T,)."""
    values = jnp.asarray(values, dtype)
    T = values.shape[0]
    mu = jnp.zeros((T, N), dtype).at[:, 0].set(values)
    return tlwe.noiseless_trivial_poly(mu, 1)            # (T, 2, N)


def cmux_tree(selectors, leaves, p: TGswParams, backend: str = "matmul"):
    """selectors: list of k prepared TRGSW pytrees (LSB first, from
    tgsw.prepare); leaves: (2^k, k+1, N).  Returns the selected TRLWE.

    Level j folds pairs (even=bit 0, odd=bit 1) with selector j, batched.
    """
    acc = jnp.asarray(leaves)
    for prep in selectors:
        d0 = acc[0::2]                                   # bit j = 0
        d1 = acc[1::2]                                   # bit j = 1
        acc = tgsw.cmux(prep, d1, d0, p, backend)
    return acc[0]


def eval_lut(selectors, values, p: TGswParams, backend: str = "matmul"):
    """Evaluate a k-bit -> torus LUT under encrypted selector bits.
    values: (2^k,) torus scalars.  Returns a TRLWE whose coefficient-0 phase
    is values[index]."""
    leaves = pack_table(values, p.tlwe.N,
                        jnp.int32 if p.tlwe.bits == 32 else jnp.int64)
    return cmux_tree(selectors, leaves, p, backend)


def eval_lut_batch(gsw_batch, values, p: TGswParams, backend: str = "matmul"):
    """Batched variant: gsw_batch is a (B, k, k+1, l, k+1, N) array of
    circuit-bootstrapped selectors (k bits per instance, LSB first).
    Returns (B, k+1, N) selected TRLWEs."""
    gsw_batch = jnp.asarray(gsw_batch)
    B, k = gsw_batch.shape[0], gsw_batch.shape[1]
    import jax
    eng = tgsw.make_engine(tgsw.engine_config(p), backend)

    def one(gsws):
        sels = [eng.prepare(tgsw.rows(gsws[j])) for j in range(k)]
        leaves = pack_table(values, p.tlwe.N,
                            jnp.int32 if p.tlwe.bits == 32 else jnp.int64)
        return cmux_tree(sels, leaves, p, backend)

    return jax.vmap(one)(gsw_batch)

"""Gadget (signed base-2^bgbit) decomposition, batched and branch-free.

32-bit variant mirrors tGswTorus32PolynomialDecompH (tgsw_functions.cpp:224-
335, scalar path); 64-bit variant mirrors tGswTorus64PolynomialDecompH
(poc_CircuitBootstrapping.cpp:492-515).  Both are pure shift/mask/subtract
chains on the VPU; the per-limb offset constants come straight from
TGswParams.offset.
"""

from __future__ import annotations

import jax.numpy as jnp

from tfhe_tpu.params import TGswParams


def decompose_torus_poly(x, p: TGswParams):
    """Decompose torus polynomials (..., N) into l signed digit polynomials.

    Returns (..., l, N) int32 digits in [-half_bg, half_bg).
    Exact property: sum_p digits[p] * h[p] == x + (rounding < half of the
    smallest gadget level), identical to the reference's offset trick.
    """
    bits = p.tlwe.bits
    if bits == 32:
        u = jnp.asarray(x, jnp.int32).astype(jnp.uint32)
        buf = u + jnp.uint32(p.offset)
        shifts = [32 - (i + 1) * p.bgbit for i in range(p.l)]
        digs = [((buf >> jnp.uint32(s)) & jnp.uint32(p.mask_mod)).astype(jnp.int32)
                - p.half_bg for s in shifts]
    else:
        u = jnp.asarray(x, jnp.int64).astype(jnp.uint64)
        buf = u + jnp.uint64(p.offset)
        shifts = [64 - (i + 1) * p.bgbit for i in range(p.l)]
        digs = [((buf >> jnp.uint64(s)) & jnp.uint64(p.mask_mod)).astype(jnp.int32)
                - p.half_bg for s in shifts]
    return jnp.stack(digs, axis=-2)


def decompose_tlwe(tlwe_av, p: TGswParams):
    """Decompose a TRLWE sample (..., k+1, N) into (..., kpl, N) digit rows,
    row-major over (poly index, gadget level) like tGsw64DecompH
    (poc_CircuitBootstrapping.cpp:519-522)."""
    d = decompose_torus_poly(tlwe_av, p)          # (..., k+1, l, N)
    return d.reshape(*d.shape[:-3], p.kpl, d.shape[-1])

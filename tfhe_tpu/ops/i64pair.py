"""Torus64 as (lo, hi) int32 pairs — TPU-native 64-bit integer arithmetic.

The TPU has no native 64-bit integer datapath; XLA emulates s64 with i32
pairs op-by-op, and Mosaic (Pallas) rejects s64 altogether.  The lvl2
circuit-bootstrap hot loop (poc_CircuitBootstrapping.cpp:580-642) therefore
runs here on an EXPLICIT pair representation: a Torus64 value x is stored as
(lo, hi) int32 with x === uint32(lo) + 2^32 * int32(hi)  (mod 2^64).

All helpers are exact mod-2^64 (carries/borrows via unsigned compares) and
are plain jnp so XLA fuses them; the same formulas are inlined in the Pallas
kernels (pallas_kernels.rotate_decompose64).
"""

from __future__ import annotations

import jax.numpy as jnp


def _u(x):
    return x.astype(jnp.uint32)


def from_i64(x):
    """int64 array -> (lo, hi) int32 pair."""
    x = jnp.asarray(x, jnp.int64)
    lo = (x & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
    hi = (x >> jnp.int64(32)).astype(jnp.int32)
    return lo, hi


def to_i64(lo, hi):
    """(lo, hi) int32 pair -> int64 array (host/CPU use)."""
    return (lo.astype(jnp.uint32).astype(jnp.uint64)
            | (hi.astype(jnp.uint32).astype(jnp.uint64) << jnp.uint64(32))
            ).astype(jnp.int64)


def add(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (_u(lo) < _u(blo)).astype(jnp.int32)
    return lo, ahi + bhi + carry


def add_const(lo, hi, c: int):
    """Add a Python-int 64-bit constant (e.g. the gadget offset)."""
    clo = c & 0xFFFFFFFF
    chi = (c >> 32) & 0xFFFFFFFF
    clo_i = clo - (1 << 32) if clo >= (1 << 31) else clo
    chi_i = chi - (1 << 32) if chi >= (1 << 31) else chi
    nlo = lo + jnp.int32(clo_i)
    carry = (_u(nlo) < jnp.uint32(clo)).astype(jnp.int32)
    return nlo, hi + jnp.int32(chi_i) + carry


def sub(alo, ahi, blo, bhi):
    borrow = (_u(alo) < _u(blo)).astype(jnp.int32)
    return alo - blo, ahi - bhi - borrow


def neg(lo, hi):
    """-(x) mod 2^64: (~hi + (lo == 0), -lo)."""
    carry = (lo == 0).astype(jnp.int32)
    return -lo, ~hi + carry


def shift_left_i32(y, s: int):
    """int32 y * 2^s as a pair (0 <= s < 64): the limb-recombination step."""
    if s == 0:
        return y, y >> 31            # hi = sign extension
    if s < 32:
        return y << s, y >> (32 - s)  # hi shift arithmetic: sign-extended
    if s == 32:
        return jnp.zeros_like(y), y
    return jnp.zeros_like(y), y << (s - 32)


def extract_digit(lo, hi, shift: int, bgbit: int):
    """((x >> shift) & (2^bgbit - 1)) - 2^(bgbit-1) for a 64-bit x pair.

    shift + bgbit <= 64.  Matches tGswTorus64PolynomialDecompH
    (poc_CircuitBootstrapping.cpp:492-515) digit semantics."""
    mask = (1 << bgbit) - 1
    half = 1 << (bgbit - 1)
    if shift >= 32:
        v = (_u(hi) >> jnp.uint32(shift - 32)).astype(jnp.int32)
    elif shift + bgbit <= 32:
        v = (_u(lo) >> jnp.uint32(shift)).astype(jnp.int32)
    else:                            # straddles the word boundary
        v = ((_u(lo) >> jnp.uint32(shift))
             | (_u(hi) << jnp.uint32(32 - shift))).astype(jnp.int32)
    return (v & mask) - half

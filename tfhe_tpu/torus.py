"""Torus scalar arithmetic as JAX integer arrays.

Torus32/Torus64 follow the reference representation (poc_types.h:13-14):
an int32/int64 value x stands for the real torus element x / 2^bits mod 1.
All additive arithmetic is native two's-complement wrap-around, which XLA
guarantees for integer ops, so no explicit modular reduction ever appears.

Also hosts the limb-splitting utilities that map torus operands onto the
MXU-exact int8 domain (the TPU-native replacement for the reference's
double-precision FFT value domain, spqlios/fft_processor_spqlios.cpp).
"""

from __future__ import annotations

import jax.numpy as jnp

TORUS32 = jnp.int32
TORUS64 = jnp.int64

_TWO32 = 2**32
_TWO64 = 2**64


def dtot32(d):
    """double -> Torus32 (numeric_functions.cpp:36-38): frac(d) * 2^32 wrapped."""
    frac = d - jnp.trunc(d)
    return (frac * _TWO32).astype(jnp.int64).astype(TORUS32)


def t32tod(x):
    """Torus32 -> double in [-1/2, 1/2) (numeric_functions.cpp:40-42)."""
    return jnp.asarray(x, jnp.float64) / _TWO32


def t64tod(x):
    return jnp.asarray(x, jnp.float64) / _TWO64


def t64tot32(x):
    """Torus64 -> Torus32: keep the top 32 bits (poc_types.h:17-19)."""
    return (jnp.asarray(x, jnp.int64) // _TWO32).astype(TORUS32)


def t32tot64(x):
    """Torus32 -> Torus64 (poc_types.h:20-22)."""
    return jnp.asarray(x, jnp.int64) * _TWO32


def double_to_t32(d: float) -> int:
    """Python-scalar double -> Torus32 int (for parameter constants)."""
    frac = d - int(d)
    return int((frac * _TWO32)) & 0xFFFFFFFF


def approx_phase32(phase, msize: int):
    """Round a Torus32 phase to the nearest multiple of 1/msize
    (numeric_functions.cpp:45-53)."""
    assert msize > 0
    if msize & (msize - 1) == 0:
        shift = 64 - msize.bit_length() + 1  # 2^64 / msize = 1 << shift
        interv_shift = shift
        p64 = (jnp.asarray(phase, TORUS32).astype(jnp.uint32).astype(jnp.uint64)
               << jnp.uint64(32)) + jnp.uint64(1 << (interv_shift - 1))
        p64 = (p64 >> jnp.uint64(interv_shift)) << jnp.uint64(interv_shift)
        return (p64 >> jnp.uint64(32)).astype(jnp.uint32).astype(TORUS32)
    interv = ((1 << 63) // msize) * 2
    p64 = (jnp.asarray(phase, TORUS32).astype(jnp.uint32).astype(jnp.uint64)
           << jnp.uint64(32)) + jnp.uint64(interv // 2)
    p64 = p64 - p64 % jnp.uint64(interv)
    return (p64 >> jnp.uint64(32)).astype(jnp.uint32).astype(TORUS32)


def mod_switch_from_torus32(phase, msize: int):
    """Torus32 -> integer mod msize with centred rounding
    (numeric_functions.cpp:55-61, preModSwitch poc_CircuitBootstrapping.cpp:472).

    For power-of-two msize this is a pure shift chain (TPU-friendly).
    """
    x = jnp.asarray(phase, TORUS32).astype(jnp.uint32).astype(jnp.uint64)
    p64 = (x << jnp.uint64(32))
    if msize & (msize - 1) == 0:
        shift = 64 - (msize.bit_length() - 1)  # interv = 1 << shift
        p64 = p64 + jnp.uint64(1 << (shift - 1))
        return (p64 >> jnp.uint64(shift)).astype(jnp.int32)
    interv = ((1 << 63) // msize) * 2
    p64 = p64 + jnp.uint64(interv // 2)
    return (p64 // jnp.uint64(interv)).astype(jnp.int32)


def mod_switch_to_torus32(mu, msize: int):
    """Integer mod msize -> Torus32 (numeric_functions.cpp:63-67)."""
    interv = ((1 << 63) // msize) * 2
    p64 = jnp.asarray(mu, jnp.int64).astype(jnp.uint64) * jnp.uint64(interv)
    return (p64 >> jnp.uint64(32)).astype(jnp.uint32).astype(TORUS32)


# ---------------------------------------------------------------------------
# Limb splitting: the bridge from torus integers to MXU-exact int8 operands
# ---------------------------------------------------------------------------

def balanced_limbs(x, num_limbs: int, limb_bits: int = 8):
    """Split integers into balanced signed limbs: x === sum_i l_i * 2^(limb_bits*i)
    (mod 2^(limb_bits*num_limbs)) with every l_i in [-2^(b-1), 2^(b-1)).

    Returned stacked on a new leading axis, dtype int8 (limb_bits <= 8).
    The balanced form keeps both MXU matmul operands within int8 so the
    int32 accumulation of N-term negacyclic products stays exact.
    """
    assert limb_bits <= 8
    base = 1 << limb_bits
    half = base >> 1
    u = jnp.asarray(x)
    udtype = {4: jnp.uint32, 8: jnp.uint64}[u.dtype.itemsize]
    u = u.astype(udtype)
    out = []
    for _ in range(num_limbs):
        raw = (u & jnp.array(base - 1, udtype)).astype(jnp.int32)
        l = ((raw + half) & (base - 1)) - half
        out.append(l.astype(jnp.int8))
        u = (u - l.astype(udtype)) >> jnp.array(limb_bits, udtype)
    return jnp.stack(out, axis=0)


def recombine_limbs(parts, limb_bits: int, out_dtype):
    """Inverse of balanced_limbs on accumulated int32 results: parts has a
    leading limb axis; returns sum_i parts[i] << (limb_bits*i) with native wrap
    in out_dtype."""
    acc = jnp.zeros(parts.shape[1:], out_dtype)
    for i in range(parts.shape[0]):
        acc = acc + (parts[i].astype(out_dtype) << (limb_bits * i))
    return acc


def signed_planes(d, plane_bits: int, num_planes: int):
    """Split small signed digits into balanced sub-planes (for gadget digits
    wider than 8 bits, e.g. bgbit_lvl2=9).  Exact: d == sum_i p_i 2^(b*i)."""
    base = 1 << plane_bits
    half = base >> 1
    u = jnp.asarray(d)
    if u.dtype not in (jnp.int32, jnp.int64):
        u = u.astype(jnp.int32)
    out = []
    for _ in range(num_planes):
        r = ((u + half) & (base - 1)) - half
        out.append(r.astype(jnp.int8))
        u = (u - r) >> plane_bits
    return jnp.stack(out, axis=0)

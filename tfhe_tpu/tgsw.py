"""Batched TRGSW — R6/C10 of SURVEY.md §2 (tgsw_functions.cpp:15-449,
tGsw64Encrypt poc_CircuitBootstrapping.cpp:215-227).

Layout: a TRGSW batch is (..., k+1, l, k+1, N): rows indexed (bloc, level),
each row a TRLWE sample.  The external product consumes a key-prepared form
(rows laid out (J=kpl, U=k+1, N) through a negacyclic engine), so that
  external_product = decompose -> one int8 MXU contraction -> recombine,
the TPU replacement for decomp -> kpl iFFTs -> pointwise -> FFT
(tGswFFTExternMulToTLwe, tgsw_functions.cpp:424-449).
"""

from __future__ import annotations

import jax.numpy as jnp

from tfhe_tpu.params import TGswParams
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import tlwe as tlwe_mod
from tfhe_tpu.ops.decomp import decompose_tlwe
from tfhe_tpu.ops.engine import EngineConfig, make_engine


def engine_config(p: TGswParams) -> EngineConfig:
    return EngineConfig(N=p.tlwe.N, out_bits=p.tlwe.bits, digit_bits=p.bgbit,
                        key_limbs=p.key_limbs)


def encrypt(key: tlwe_mod.TLweKey, messages, p: TGswParams, rng: TfheRng,
            stdev=None):
    """TRGSW(m): (k+1) x l TLWE(0) rows + m * h_i on the diagonal bloc
    (tGsw64Encrypt poc:215-227; tGswSymEncrypt tgsw_functions.cpp).

    messages: (...,) small ints.  Returns (..., k+1, l, k+1, N).

    With p.key_limbs set, rows are generated on the coarse lattice
    (tlwe.encrypt_zero coarse_bits) so the engines' limb truncation is
    EXACT; the gadget entries h_i = 2^(bits-(i+1)bgbit) are multiples of
    the lattice spacing whenever coarse <= bits - l*bgbit (asserted).
    """
    messages = jnp.asarray(messages)
    k, l, N = p.tlwe.k, p.l, p.tlwe.N
    dt = jnp.int32 if p.tlwe.bits == 32 else jnp.int64
    coarse = 0
    if p.key_limbs:
        coarse = p.tlwe.bits - 8 * p.key_limbs
        assert coarse <= p.tlwe.bits - p.l * p.bgbit, (
            "coarse lattice must contain the gadget entries")
    c = tlwe_mod.encrypt_zero(key, rng, tuple(messages.shape) + (k + 1, l),
                              stdev, coarse_bits=coarse)
    h = jnp.asarray(p.h, dt)                     # (l,)
    add = messages[..., None].astype(dt) * h     # (..., l)
    for bloc in range(k + 1):
        c = c.at[..., bloc, :, bloc, 0].add(add)
    return c


def rows(gsw):
    """(..., k+1, l, k+1, N) -> (..., kpl, k+1, N) row-major over (bloc, level)
    matching tGsw64DecompH's digit ordering (poc:519-522)."""
    s = gsw.shape
    return gsw.reshape(*s[:-4], s[-4] * s[-3], s[-2], s[-1])


def prepare(gsw, p: TGswParams, backend: str = "matmul"):
    """Preprocess a single TRGSW (k+1, l, k+1, N) into engine form."""
    eng = make_engine(engine_config(p), backend)
    return eng, eng.prepare(rows(gsw))


def external_product(tlwe_av, prepared, p: TGswParams, backend: str = "matmul"):
    """TRGSW (x) TRLWE -> TRLWE: decompose the accumulator and contract with
    the prepared TRGSW rows (tGswFFTExternMulToTLwe, tgsw_functions.cpp:424).

    tlwe_av: (..., k+1, N); prepared: from `prepare` (the engine object is
    rebuilt from params so `prepared` stays a pure pytree for lax.scan).
    """
    eng = make_engine(engine_config(p), backend)
    digits = decompose_tlwe(tlwe_av, p)           # (..., kpl, N)
    return eng.accumulate(digits, prepared)


def cmux(prepared, d1, d0, p: TGswParams, backend: str = "matmul"):
    """CMux(c, d1, d0) = d0 + c (x) (d1 - d0): selects d1 when the TRGSW bit
    is 1, d0 when 0 (the tfhe_MuxRotate_FFT building block,
    lwe_functions.cpp:322-328)."""
    return d0 + external_product(d1 - d0, prepared, p, backend)


def tgsw_phase(gsw, key: tlwe_mod.TLweKey):
    """Phase of every TRGSW row (for tests / the PARANO decrypt probes)."""
    return tlwe_mod.tlwe_phase(gsw, key)

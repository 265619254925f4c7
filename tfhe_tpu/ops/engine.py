"""Negacyclic product engines — the MXU-native heart of the library.

The reference computes (int poly) x (torus poly) mod X^N+1 either exactly via
Karatsuba (poc_karatsuba.cpp) or approximately via the spqlios double-FFT
(spqlios/fft_processor_spqlios.cpp).  On TPU we instead make the product an
EXACT integer computation mapped onto the MXU:

  * torus operands are split into balanced signed 8-bit limbs
    (x === sum_l l_l 256^l mod 2^bits, |l_l| <= 128);
  * gadget digits are <= 8 bits by construction (|d| <= Bg/2), or are split
    into sub-planes when bgbit > 8;
  * every limb/plane product is an int8 x int8 -> int32 contraction whose
    accumulation (<= N * 128 * 128 <= 2^25 for N <= 2048) fits int32 exactly
    (verified on hardware: the v5e computes s8 dots exactly in s32);
  * limb results are recombined with shifts under native wrap-around, giving
    bit-exact mod-2^32 / mod-2^64 semantics — strictly stronger than the
    reference FFT path, which carries ~2^7 absolute rounding error
    (fft_processor_spqlios.cpp:105-156 comment and measurements).

Three interchangeable backends (the analog of the reference's USE_FFT switch,
poc_CircuitBootstrapping.cpp:247-316):

  MatmulEngine — keys preprocessed into dense negacyclic limb matrices;
      one (B, J*N) x (J*N, U*L*N) int8 matmul per accumulate call.  Fastest,
      HBM-hungry (N x blowup of key material): for large-HBM chips (v5p).
  ConvEngine   — keys preprocessed into doubled-coefficient kernels; product
      computed with lax.conv_general_dilated (implicit Toeplitz on the MXU).
      ~2x the MACs of MatmulEngine, O(N) key memory: for v5e-class chips.
  NaiveEngine  — exact jnp einsum oracle (the "fake FFT" analog) for tests.

All engines share one contract:

  prepare(key_polys (J, U, N) torus)  -> prepared pytree (scan-friendly)
  accumulate(x (..., J, N) int32 digits, prepared) -> (..., U, N) torus

  result[..., u, :] = sum_j negacyclic(x[..., j, :], key[j, u, :])
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tfhe_tpu.ops import poly
from tfhe_tpu import torus as T


def _torus_dtype(bits):
    return jnp.int32 if bits == 32 else jnp.int64


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    N: int
    bits: int            # torus width of the key/result (32 or 64)
    digit_bits: int      # log2 bound on |x| digits (bgbit of the gadget)
    limb_bits: int = 8   # key limb width

    @property
    def num_limbs(self) -> int:
        return -(-self.bits // self.limb_bits)

    @property
    def plane_split(self):
        """(plane_bits, num_planes) for the digit operand.

        Digits with |d| <= 2^(digit_bits-1) fit int8 directly when
        digit_bits <= 8; wider digits are split into balanced base-2^7
        planes so each int8 x int8 accumulation stays below 2^25.
        """
        if self.digit_bits <= 8:
            return (self.digit_bits, 1)
        nb = self.digit_bits
        planes = -(-(nb - 6) // 7) + 1 if nb > 7 else 1
        # balanced base-2^7 split: plane magnitudes <= 64 except possibly the
        # top carry plane; for nb <= 14 two planes suffice.
        return (7, planes)


def _digit_planes(cfg: EngineConfig, x):
    """Split digits (..., J, N) int32 into int8 planes (P, ..., J, N)."""
    pb, np_ = cfg.plane_split
    if np_ == 1:
        return jnp.asarray(x, jnp.int32).astype(jnp.int8)[None]
    return T.signed_planes(x, pb, np_)


def _recombine(cfg: EngineConfig, acc_planes):
    """acc_planes: (P, ..., U, L, N) int32 partial products -> (..., U, N) torus."""
    pb, np_ = cfg.plane_split
    out_dt = _torus_dtype(cfg.bits)
    out = None
    for p in range(np_):
        limbed = jnp.moveaxis(acc_planes[p], -2, 0)      # (L, ..., U, N)
        v = T.recombine_limbs(limbed, cfg.limb_bits, out_dt)
        v = v << (pb * p) if p else v
        out = v if out is None else out + v
    return out


class NaiveEngine:
    """Exact O(N^2) einsum oracle in the torus dtype."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg

    def prepare(self, key_polys):
        key_polys = jnp.asarray(key_polys)
        assert key_polys.shape[-1] == self.cfg.N
        return {"mat": poly.negacyclic_matrix(key_polys)}   # (J, U, N, N)

    def accumulate(self, x, prepared):
        dt = _torus_dtype(self.cfg.bits)
        x = jnp.asarray(x).astype(dt)
        return jnp.einsum("...jt,juti->...ui", x, prepared["mat"])


class MatmulEngine:
    """Dense negacyclic limb matrices; single int8 MXU matmul per plane."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg

    def prepare(self, key_polys):
        cfg = self.cfg
        key_polys = jnp.asarray(key_polys)
        J, U, N = key_polys.shape
        assert N == cfg.N
        # limbs of [key, -key]: negation must happen in torus domain BEFORE
        # limb splitting (balanced limbs don't negate elementwise at -128).
        doubled = jnp.concatenate([key_polys, -key_polys], axis=-1)   # (J,U,2N)
        limbs = T.balanced_limbs(doubled, cfg.num_limbs, cfg.limb_bits)  # (L,J,U,2N)
        idx = jnp.asarray((np.arange(N)[None, :] - np.arange(N)[:, None]) % (2 * N))
        mat = jnp.take(limbs, idx, axis=-1)              # (L,J,U,t,i) = (L,J,U,N,N)
        # matmul layout: (J*N) x (U*L*N)
        w = jnp.transpose(mat, (1, 3, 2, 0, 4))           # (J,t,U,L,i)
        L = cfg.num_limbs
        return {"w": w.reshape(J * N, U * L * N)}

    def accumulate(self, x, prepared):
        cfg = self.cfg
        w = prepared["w"]
        JN = w.shape[0]
        N = cfg.N
        J = JN // N
        UL_N = w.shape[1]
        L = cfg.num_limbs
        U = UL_N // (L * N)
        planes = _digit_planes(cfg, x)                   # (P, ..., J, N)
        lead = planes.shape[1:-2]
        flat = planes.reshape(planes.shape[0], -1, J * N)
        outs = []
        for p in range(flat.shape[0]):
            y = lax.dot_general(flat[p], w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            outs.append(y.reshape(*lead, U, L, N))
        return _recombine(cfg, jnp.stack(outs))


class ConvEngine:
    """Doubled-coefficient kernels via lax.conv_general_dilated.

    out[..., u, i] = sum_j sum_t x[..., j, t] * e_ju[i - t]
    with e_ju the 2N-periodic signed extension of key[j, u].  XLA lowers the
    big-kernel 1D convolution to implicit-Toeplitz matmuls on the MXU; key
    memory stays O(J*U*L*2N) instead of O(J*U*L*N^2).

    Per-j accumulation (feature groups) keeps every partial sum <= 2^25, so
    int8->int32 convs are exact; when the backend lacks integer convs the
    engine falls back to bf16 inputs with f32 accumulation, which is exact
    for partial sums <= 2^24 (guaranteed by the per-group bound).
    """

    def __init__(self, cfg: EngineConfig, use_int8: bool = True):
        self.cfg = cfg
        self.use_int8 = use_int8

    def prepare(self, key_polys):
        cfg = self.cfg
        key_polys = jnp.asarray(key_polys)
        J, U, N = key_polys.shape
        assert N == cfg.N
        doubled = jnp.concatenate([key_polys, -key_polys], axis=-1)   # (J,U,2N)
        limbs = T.balanced_limbs(doubled, cfg.num_limbs, cfg.limb_bits)  # (L,J,U,2N)
        # kernel[tau] = e[N-1-tau], tau in [0, 2N-1), e[m] = doubled[m mod 2N]
        m = (np.arange(N - 1, -N, -1)) % (2 * N)          # length 2N-1
        ker = jnp.take(limbs, jnp.asarray(m), axis=-1)    # (L,J,U,2N-1)
        # conv layout OIH with feature_group_count=J: O = J*U*L, I = 1
        ker = jnp.transpose(ker, (1, 2, 0, 3))            # (J,U,L,2N-1)
        ker = ker.reshape(J * U * cfg.num_limbs, 1, 2 * N - 1)
        if not self.use_int8:
            ker = ker.astype(jnp.bfloat16)
        return {"k": ker}

    def accumulate(self, x, prepared):
        cfg = self.cfg
        ker = prepared["k"]
        N = cfg.N
        L = cfg.num_limbs
        JUL = ker.shape[0]
        x = jnp.asarray(x)
        J = x.shape[-2]
        U = JUL // (J * L)
        planes = _digit_planes(cfg, x)                    # (P, ..., J, N)
        lead = planes.shape[1:-2]
        flat = planes.reshape(planes.shape[0], -1, J, N)
        outs = []
        for p in range(flat.shape[0]):
            inp = flat[p]
            if self.use_int8:
                y = lax.conv_general_dilated(
                    inp, ker, (1,), [(N - 1, N - 1)],
                    dimension_numbers=("NCH", "OIH", "NCH"),
                    feature_group_count=J,
                    preferred_element_type=jnp.int32)
            else:
                y = lax.conv_general_dilated(
                    inp.astype(jnp.bfloat16), ker, (1,), [(N - 1, N - 1)],
                    dimension_numbers=("NCH", "OIH", "NCH"),
                    feature_group_count=J,
                    preferred_element_type=jnp.float32)
                y = jnp.round(y).astype(jnp.int32)
            y = y.reshape(-1, J, U, L, N).sum(axis=1, dtype=jnp.int32)
            outs.append(y.reshape(*lead, U, L, N))
        return _recombine(cfg, jnp.stack(outs))


def make_engine(cfg: EngineConfig, backend: str = "matmul"):
    if backend == "matmul":
        return MatmulEngine(cfg)
    if backend == "conv":
        return ConvEngine(cfg)
    if backend == "conv_bf16":
        return ConvEngine(cfg, use_int8=False)
    if backend == "naive":
        return NaiveEngine(cfg)
    raise ValueError(f"unknown backend {backend!r}")

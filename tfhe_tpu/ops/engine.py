"""Negacyclic product engines — the MXU-native heart of the library.

The reference computes (int poly) x (torus poly) mod X^N+1 either exactly via
Karatsuba (poc_karatsuba.cpp) or approximately via the spqlios double-FFT
(spqlios/fft_processor_spqlios.cpp).  On TPU we instead make the product an
EXACT integer computation mapped onto the MXU:

  * the FIXED operand (keys: TRGSW rows, secret key polynomials) is split
    into balanced signed 8-bit limbs (x === sum_l l_l 256^l mod 2^key_bits,
    |l_l| <= 128) at preparation time;
  * the VARYING operand (gadget digits, or whole torus polynomials during
    encryption/phase) is split at call time into balanced base-2^7 planes
    when wider than 8 bits (gadget digits with bgbit <= 8 pass through
    unsplit);
  * every limb x plane product is an int8 x int8 -> int32 contraction whose
    accumulation fits int32 exactly (verified on hardware: the v5e computes
    s8 dots/convs exactly in s32, past the 2^24 f32 cliff);
  * partial results are recombined with shifts under native wrap-around,
    giving bit-exact mod-2^32 / mod-2^64 semantics — strictly stronger than
    the reference FFT path, which carries ~2^7 absolute rounding error
    (fft_processor_spqlios.cpp:105-156).

Three interchangeable backends (the analog of the reference's USE_FFT switch,
poc_CircuitBootstrapping.cpp:247-316):

  MatmulEngine — keys preprocessed into dense negacyclic limb matrices;
      one (B, J*N) x (J*N, U*L*N) int8 matmul per plane.  Fastest, HBM-hungry
      (N x blowup of key material): for large-HBM chips (v5p).
  ConvEngine   — keys preprocessed into doubled-coefficient kernels; product
      computed with lax.conv_general_dilated (implicit Toeplitz on the MXU).
      ~2x the MACs of MatmulEngine, O(N) key memory: for v5e-class chips.
  NaiveEngine  — exact jnp einsum oracle (the "fake FFT" analog) for tests;
      CPU-only (the TPU backend lacks s64 dot_general).

All engines share one contract:

  prepare(key_polys (J, U, N) torus)  -> prepared pytree (scan-friendly)
  accumulate(x (..., J, N) int32 digits, prepared) -> (..., U, N) torus

  result[..., u, :] = sum_j negacyclic(x[..., j, :], key[j, u, :])
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
from jax import lax

from tfhe_tpu.ops import poly
from tfhe_tpu import torus as T


def _torus_dtype(bits):
    return jnp.int32 if bits == 32 else jnp.int64


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    N: int
    out_bits: int          # torus width of the result (32 or 64)
    digit_bits: int        # log2 bound on the varying operand's magnitude
    key_bits: int = 0      # width of the fixed operand (0 -> out_bits)
    limb_bits: int = 8     # key limb width
    key_limbs: int = 0     # 0 = exact; else truncate the key to this many
                           # limbs (round-to-nearest on the dropped low bits)

    @property
    def kbits(self) -> int:
        return self.key_bits or self.out_bits

    @property
    def num_limbs(self) -> int:
        full = -(-self.kbits // self.limb_bits)
        if self.key_limbs:
            assert 0 < self.key_limbs <= full
            return self.key_limbs
        return full

    @property
    def key_shift(self) -> int:
        """Bits dropped (with rounding) from the key before limb splitting.

        Truncation error per key coefficient is uniform +-2^(key_shift-1),
        which enters the external product exactly like bootstrapping-key
        noise of stdev 2^(key_shift-1)/(sqrt(3)*2^kbits) — see
        noise.py:key_truncation_variance.  key_shift=8 (L=3 on torus32)
        adds <10% to the gate-bootstrap tbk1 budget while cutting the MXU
        work by 25%."""
        return max(0, self.kbits - self.num_limbs * self.limb_bits)

    @property
    def plane_split(self):
        """(plane_bits, num_planes) for the varying operand.

        Values with |x| <= 2^(digit_bits-1) fit int8 directly when
        digit_bits <= 8; wider values use balanced base-2^7 planes, each
        bounded by 64 so int8 accumulations stay below 2^25 for N <= 2048.
        """
        if self.digit_bits <= 8:
            return (self.digit_bits, 1)
        # smallest P with zero residual for all |x| <= 2^(digit_bits-1):
        # residual recurrence m' = (m + 64) >> 7 until 0.
        m, planes = 1 << (self.digit_bits - 1), 0
        while m:
            m = (m + 64) >> 7
            planes += 1
        return (7, planes)


def _digit_planes(cfg: EngineConfig, x):
    """Split the varying operand (..., J, N) into int8 planes (P, ..., J, N)."""
    pb, np_ = cfg.plane_split
    if np_ == 1:
        return jnp.asarray(x, jnp.int32).astype(jnp.int8)[None]
    return T.signed_planes(x, pb, np_)


def _recombine(cfg: EngineConfig, acc_planes):
    """acc_planes: (P, ..., U, L, N) int32 partials -> (..., U, N) torus."""
    pb, np_ = cfg.plane_split
    out_dt = _torus_dtype(cfg.out_bits)
    out = None
    for p in range(np_):
        limbed = jnp.moveaxis(acc_planes[p], -2, 0)      # (L, ..., U, N)
        v = T.recombine_limbs(limbed, cfg.limb_bits, out_dt)
        sh = pb * p + cfg.key_shift
        v = v << sh if sh else v
        out = v if out is None else out + v
    return out


def _key_rounded(cfg: EngineConfig, key_polys):
    """Round the key to its top num_limbs*limb_bits bits (key_limbs
    truncation); identity when key_shift == 0.  See EngineConfig.key_shift
    for the noise accounting."""
    s = cfg.key_shift
    if not s:
        return key_polys
    # clamp the two extreme values (+-2^(kbits-s-1)) that would need an
    # L+1-th balanced limb — an extra half-ulp of rounding error there.
    wide = key_polys.astype(jnp.int64) + (1 << (s - 1))
    lim = (1 << (cfg.kbits - s - 1)) - 1
    return jnp.clip(wide >> s, -lim, lim).astype(
        jnp.int32 if cfg.kbits <= 32 else jnp.int64)


def _key_limbs_doubled(cfg: EngineConfig, key_polys):
    """Balanced limbs of [key, -key]: (L, J, U, 2N) int8.

    Negation happens in the torus domain BEFORE limb splitting (balanced
    limbs don't negate elementwise at -128); rounding happens FIRST so the
    wrap half is exactly the negated rounded key."""
    key_polys = _key_rounded(cfg, key_polys)
    doubled = jnp.concatenate([key_polys, -key_polys], axis=-1)
    return T.balanced_limbs(doubled, cfg.num_limbs, cfg.limb_bits)


class _EngineBase:
    """Shared contract: accumulate_into defaults to acc + accumulate; the
    TPU matmul engines override it with the fused Pallas kernel."""

    def accumulate_into(self, acc, x, prepared):
        return acc + self.accumulate(x, prepared)

    def _fused_path_ok(self, acc, x) -> bool:
        """True when the fused Pallas kernel can serve this call: TPU
        backend, 32-bit torus, single digit plane, batched rank-3 inputs."""
        import jax as _jax
        cfg = self.cfg
        return (_jax.default_backend() == "tpu" and cfg.out_bits == 32
                and cfg.kbits == 32 and cfg.plane_split[1] == 1
                and acc.ndim == 3 and x.ndim == 3)

    def cmux_step(self, a, acc, prepared, *, l: int, bgbit: int, offset: int,
                  tm: int = 256):
        """acc + recombine(decompose((X^a - 1) * acc) @ key), the whole
        blind-rotation step in one fused Pallas kernel when eligible
        (fused_cmux_step_v2: VPU rotation pipelined under the MXU dots,
        ~704 us vs ~1040 us for the separate kernels at GATE_MXU2/B=4096).
        Returns None when this engine/config/shape can't serve it."""
        return None

    def _cmux_step_fused(self, a, acc, w, *, l, bgbit, offset, tm):
        import jax as _jax
        from tfhe_tpu.ops import tiles
        cfg = self.cfg
        B = acc.shape[0]
        if not (_jax.default_backend() == "tpu" and cfg.out_bits == 32
                and cfg.kbits == 32 and cfg.plane_split[1] == 1
                and bgbit <= 8 and cfg.num_limbs <= 3 and acc.ndim == 3):
            return None
        # VMEM-budget tile chooser (ops/tiles.py): at N=1024/k=1 no tile
        # fits — the dense W blocks alone are 12.6 MB and the measured step
        # is 1.9x SLOWER than the split kernels (starved pipelining), so
        # dispatch falls through (the chunked engine serves those shapes).
        kp1, N = acc.shape[1], acc.shape[2]
        tm_fit = tiles.choose_v2_tm(N, kp1, l, cfg.num_limbs, B)
        if tm_fit is None:
            return None
        from tfhe_tpu.ops.pallas_kernels import fused_cmux_step_v2
        return fused_cmux_step_v2(a, acc, w, l=l, bgbit=bgbit, offset=offset,
                                  key_shift=cfg.key_shift,
                                  tm=min(tm, tm_fit))

    def _cmux_step_fused_flat(self, a, acc_flat, w, *, kp1, l, bgbit,
                              offset, tm):
        """_cmux_step_fused on the FLAT (B, (k+1)*N) scan-carry layout —
        motivated by the ~100 us/step while-carry relayout copies XLA
        inserts around the custom call in the circuit wave-jit context
        (bench_results/circuit_adder32_trace_r5.json).  OPT-IN
        (TFHE_V2_FLAT=1): in the direct bootstrap jit the 3-D carry pays
        no relayout and flat measured 1.3% SLOWER same-process (10,092
        vs 9,960 ct/s, outputs identical — bench_results/v2_flat_ab_r5
        .json)."""
        import os as _os
        import jax as _jax
        from tfhe_tpu.ops import tiles
        cfg = self.cfg
        if _os.environ.get("TFHE_V2_FLAT", "0") in ("", "0"):
            return None
        B = acc_flat.shape[0]
        if not (_jax.default_backend() == "tpu" and cfg.out_bits == 32
                and cfg.kbits == 32 and cfg.plane_split[1] == 1
                and bgbit <= 8 and cfg.num_limbs <= 3
                and acc_flat.ndim == 2):
            return None
        N = acc_flat.shape[1] // kp1
        tm_fit = tiles.choose_v2_tm(N, kp1, l, cfg.num_limbs, B)
        if tm_fit is None:
            return None
        from tfhe_tpu.ops.pallas_kernels import fused_cmux_step_v2
        return fused_cmux_step_v2(a, acc_flat, w, l=l, bgbit=bgbit,
                                  offset=offset, key_shift=cfg.key_shift,
                                  tm=min(tm, tm_fit), kp1=kp1)


class NaiveEngine(_EngineBase):
    """Exact O(N^2) einsum oracle in the torus dtype (CPU tests only)."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg

    def prepare(self, key_polys):
        key_polys = jnp.asarray(key_polys)
        assert key_polys.shape[-1] == self.cfg.N
        return {"mat": poly.negacyclic_matrix(key_polys)}   # (J, U, N, N)

    def accumulate(self, x, prepared):
        dt = _torus_dtype(self.cfg.out_bits)
        x = jnp.asarray(x).astype(dt)
        return jnp.einsum("...jt,juti->...ui", x, prepared["mat"].astype(dt))


class MatmulEngine(_EngineBase):
    """Dense negacyclic limb matrices; one int8 MXU matmul per plane."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg

    def accumulate_into(self, acc, x, prepared):
        if not self._fused_path_ok(acc, x):
            return acc + self.accumulate(x, prepared)
        from tfhe_tpu.ops.pallas_kernels import mm_recombine_acc
        cfg = self.cfg
        flat = _digit_planes(cfg, x)[0].reshape(x.shape[0], -1)
        return mm_recombine_acc(flat, prepared["w"], acc,
                                shift_base=cfg.key_shift)

    def cmux_step(self, a, acc, prepared, *, l, bgbit, offset, tm=256):
        return self._cmux_step_fused(a, acc, prepared["w"], l=l, bgbit=bgbit,
                                     offset=offset, tm=tm)

    def cmux_step_flat(self, a, acc_flat, prepared, *, kp1, l, bgbit,
                       offset, tm=256):
        return self._cmux_step_fused_flat(a, acc_flat, prepared["w"],
                                          kp1=kp1, l=l, bgbit=bgbit,
                                          offset=offset, tm=tm)

    def prepare(self, key_polys):
        cfg = self.cfg
        key_polys = jnp.asarray(key_polys)
        J, U, N = key_polys.shape
        assert N == cfg.N
        limbs = _key_limbs_doubled(cfg, key_polys)        # (L,J,U,2N)
        idx = jnp.asarray((np.arange(N)[None, :] - np.arange(N)[:, None]) % (2 * N))
        mat = jnp.take(limbs, idx, axis=-1)               # (L,J,U,t,i)
        w = jnp.transpose(mat, (0, 1, 3, 2, 4))           # (L,J,t,U,i)
        return {"w": w.reshape(cfg.num_limbs, J * N, U * N)}

    def accumulate(self, x, prepared):
        cfg = self.cfg
        w = prepared["w"]
        L, JN, UN = w.shape
        N = cfg.N
        J, U = JN // N, UN // N
        planes = _digit_planes(cfg, x)                    # (P, ..., J, N)
        lead = planes.shape[1:-2]
        flat = planes.reshape(planes.shape[0], -1, JN)
        outs = []
        for p in range(flat.shape[0]):
            ys = [lax.dot_general(flat[p], w[l], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
                  for l in range(L)]
            y = jnp.stack(ys, axis=-2)                    # (B, L, U*N)
            y = jnp.moveaxis(y.reshape(-1, L, U, N), -3, -2)
            outs.append(y.reshape(*lead, U, L, N))
        return _recombine(cfg, jnp.stack(outs))


class ConvEngine(_EngineBase):
    """Doubled-coefficient kernels via lax.conv_general_dilated.

    out[..., u, i] = sum_j sum_t x[..., j, t] * e_ju[i - t]
    with e_ju the 2N-antiperiodic extension of key[j, u].  XLA lowers the
    big-kernel 1D convolution to implicit-Toeplitz matmuls on the MXU; key
    memory stays O(J*U*L*2N) instead of O(J*U*L*N^2).

    Per-j accumulation (feature groups) bounds every partial sum by
    N*128*max_plane <= 2^25, so int8->int32 convs are exact; the bf16
    fallback (f32 accumulation) is exact up to 2^24, which the same bound
    guarantees for max_plane <= 64 or N <= 1024.
    """

    def __init__(self, cfg: EngineConfig, use_int8: bool = True):
        self.cfg = cfg
        self.use_int8 = use_int8

    def prepare(self, key_polys):
        cfg = self.cfg
        key_polys = jnp.asarray(key_polys)
        J, U, N = key_polys.shape
        assert N == cfg.N
        limbs = _key_limbs_doubled(cfg, key_polys)        # (L,J,U,2N)
        # kernel[tau] = e[N-1-tau], tau in [0, 2N-1), e[m] = doubled[m mod 2N]
        m = (np.arange(N - 1, -N, -1)) % (2 * N)
        ker = jnp.take(limbs, jnp.asarray(m), axis=-1)    # (L,J,U,2N-1)
        ker = jnp.transpose(ker, (1, 2, 0, 3))            # (J,U,L,2N-1)
        ker = ker.reshape(J * U * cfg.num_limbs, 1, 2 * N - 1)
        if not self.use_int8:
            ker = ker.astype(jnp.bfloat16)
        return {"k": ker}

    def accumulate(self, x, prepared):
        cfg = self.cfg
        ker = prepared["k"]
        N, L = cfg.N, cfg.num_limbs
        x = jnp.asarray(x)
        J = x.shape[-2]
        U = ker.shape[0] // (J * L)
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


class OnTheFlyMatmulEngine(_EngineBase):
    """Keys stored as O(N) doubled-limb vectors; each accumulate call
    materializes the negacyclic matrices with a tile/reshape stride trick
    (contiguous copies only — no gathers) and runs the same int8 MXU matmul
    as MatmulEngine.

    Rationale: the dense matrices blow key memory up by a factor N (e.g.
    30 GB for a full gate-bootstrap key at N=1024), which exceeds v5e-class
    HBM; materializing per step costs ~2x the matrix's HBM traffic, a small
    fraction of the matmul compute.  Stride trick: for v of length 2N,
    tile(v, N)[: N*(2N-1)].reshape(N, 2N-1) has row t equal to roll(v, t),
    so its [:, :N] block is exactly the negacyclic matrix M[t, i] =
    v[(i - t) mod 2N].
    """

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg

    def prepare(self, key_polys):
        cfg = self.cfg
        key_polys = jnp.asarray(key_polys)
        J, U, N = key_polys.shape
        assert N == cfg.N
        return {"v": _key_limbs_doubled(cfg, key_polys)}    # (L,J,U,2N) int8

    def _materialize(self, v):
        """(L,J,U,2N) -> (L,J,U,t,i): contiguous tile+reshape+slice only.

        The (t, i) block of each vector is its negacyclic matrix; no
        transpose is done here — the contraction below consumes this layout
        directly so XLA folds any needed relayout into the matmul.
        """
        N = self.cfg.N
        t = jnp.tile(v, (1, 1, 1, N))[..., : N * (2 * N - 1)]
        return t.reshape(*v.shape[:-1], N, 2 * N - 1)[..., :N]

    def accumulate_into(self, acc, x, prepared):
        if not self._fused_path_ok(acc, x):
            return acc + self.accumulate(x, prepared)
        from tfhe_tpu.ops.pallas_kernels import materialize_w, mm_recombine_acc
        cfg = self.cfg
        v = prepared["v"]
        J = v.shape[1]
        w = materialize_w(v)                                # (L, J*N, U*N)
        flat = _digit_planes(cfg, x)[0].reshape(x.shape[0], J * cfg.N)
        return mm_recombine_acc(flat, w, acc, shift_base=cfg.key_shift)

    def cmux_step(self, a, acc, prepared, *, l, bgbit, offset, tm=256):
        import jax as _jax
        if _jax.default_backend() != "tpu":
            return None
        from tfhe_tpu.ops.pallas_kernels import materialize_w
        return self._cmux_step_fused(a, acc, materialize_w(prepared["v"]),
                                     l=l, bgbit=bgbit, offset=offset, tm=tm)

    def cmux_step_flat(self, a, acc_flat, prepared, *, kp1, l, bgbit,
                       offset, tm=256):
        import jax as _jax
        if _jax.default_backend() != "tpu":
            return None
        from tfhe_tpu.ops.pallas_kernels import materialize_w
        return self._cmux_step_fused_flat(a, acc_flat,
                                          materialize_w(prepared["v"]),
                                          kp1=kp1, l=l, bgbit=bgbit,
                                          offset=offset, tm=tm)

    def accumulate(self, x, prepared):
        import jax as _jax
        cfg = self.cfg
        N, L = cfg.N, cfg.num_limbs
        v = prepared["v"]
        _, J, U, _ = v.shape
        planes = _digit_planes(cfg, x)                      # (P, ..., J, N)
        lead = planes.shape[1:-2]
        if _jax.default_backend() == "tpu":
            # Pallas Toeplitz materialization straight into matmul layout
            from tfhe_tpu.ops.pallas_kernels import materialize_w
            w = materialize_w(v)                            # (L, J*N, U*N)
            flat = planes.reshape(planes.shape[0], -1, J * N)
            outs = []
            for p in range(flat.shape[0]):
                ys = [lax.dot_general(flat[p], w[l], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
                      for l in range(L)]
                y = jnp.stack(ys, axis=-2)                  # (B, L, U*N)
                y = jnp.moveaxis(y.reshape(-1, L, U, N), -3, -2)
                outs.append(y.reshape(*lead, U, L, N))
            return _recombine(cfg, jnp.stack(outs))
        m = self._materialize(v)                            # (L,J,U,t,i)
        flat = planes.reshape(planes.shape[0], -1, J, N)
        outs = []
        for p in range(flat.shape[0]):
            # contract (j, t): (B, J, t) x (L,J,U,t,i) -> (B, L, U, i)
            y = lax.dot_general(
                flat[p], m,
                (((1, 2), (1, 3)), ((), ())),
                preferred_element_type=jnp.int32)           # (B, L, U, i)
            y = jnp.swapaxes(y, -3, -2)                     # (B, U, L, i)
            outs.append(y.reshape(*lead, U, L, N))
        return _recombine(cfg, jnp.stack(outs))


class ChunkedEngine(_EngineBase):
    """Pre-shifted chunked keys: the negacyclic product as C = N/m plain
    int8 MXU matmuls against a STATIC key operand (no per-step Toeplitz
    materialization).  The production engine for the 64-bit lvl2
    circuit-bootstrap hot loop (poc_CircuitBootstrapping.cpp:580-642).

    Keygen stores every key limb as m acyclically-shifted copies
        wm[(u,l), (j,s), q] = limb[l, j, u, q - s]   (0 <= q-s < N, else 0)
    of width N+m.  A product then accumulates chunk results y_c at offset
    c*m into a 2N ring and folds once with X^N = -1 — see
    pallas_kernels.ck_dot64 for the kernel-side rationale.  Key memory
    blows up m-fold (vs the O(N) onthefly vectors) but stays N/m-fold
    SMALLER than MatmulEngine's dense matrices; m trades HBM for MXU
    utilization (dots of K = J*m against full N+m-wide outputs).
    """

    def __init__(self, cfg: EngineConfig, m: int | None = None):
        self.cfg = cfg
        if m is None:
            # 32-bit: m=128 keeps every store/load/offset lane-aligned and
            # the pre-shift blowup affordable (l*m is a 128-multiple).
            # 64-bit: m=64 — m=128 would need n*33 MB of wm (~17 GB at
            # CB_MXU), past v5e HBM; 64-multiple offsets still lower fine.
            m = min(128 if cfg.out_bits == 32 else 64, cfg.N)
        assert cfg.N % m == 0
        self.m = m

    def prepare(self, key_polys):
        cfg = self.cfg
        key_polys = jnp.asarray(key_polys)
        J, U, N = key_polys.shape
        assert N == cfg.N
        m = self.m
        # exactness: each ring position accumulates up to J*(N+m) products
        # (ceil((N+m)/m) overlapping chunks x J*m dot terms each), every
        # product bounded by max_digit * 2^(limb_bits-1); the int32 fold
        # must stay below 2^31.  max_digit is 2^(digit_bits-1) for a single
        # plane and 64 per balanced base-2^7 plane (planes accumulate in
        # separate int32 passes and recombine with shifts afterwards).
        max_digit = (1 << (cfg.digit_bits - 1)) if cfg.plane_split[1] == 1 \
            else 64
        assert J * (N + m) * max_digit * (1 << (cfg.limb_bits - 1)) \
            < 2**31, "int32 accumulation bound exceeded for this shape"
        limbs = T.balanced_limbs(_key_rounded(cfg, key_polys),
                                 cfg.num_limbs, cfg.limb_bits)  # (L,J,U,N)
        sh = jnp.stack([jnp.pad(limbs, ((0, 0),) * 3 + ((s, m - s),))
                        for s in range(m)], axis=-2)    # (L,J,U,m,N+m)
        # leading (u, limb)-major, rows (j, s)-major: wm[u*L+l, j*m+s, q]
        # = limb[l, j, u, q-s] — the ck_dot64p operand layout ((j,s) and q
        # in the last two dims so limb-group blocks satisfy the Pallas
        # (8, 128)-divisibility rule on the trailing dims).
        wm = jnp.transpose(sh, (2, 0, 1, 3, 4))          # (U,L,J,m,N+m)
        return {"wm": wm.reshape(U * cfg.num_limbs, J * m, N + m)}

    def _fold_dot(self, xc, wm):
        """xc: (P, B, C, Jm) int8 chunk planes; wm: (UL, Jm, Npm) int8.
        Returns folded per-limb products (B, UL, N) int32 (exact)."""
        cfg = self.cfg
        UL, Jm, Npm = wm.shape
        N, m = cfg.N, self.m
        C = N // m
        pb, P = cfg.plane_split
        y = None
        for p in range(P):
            yp = jnp.einsum("bck,gkq->bcgq", xc[p].astype(jnp.int32),
                            wm.astype(jnp.int32))
            y = yp if y is None else y + (yp << (pb * p))
        ring = jnp.zeros((xc.shape[1], UL, 2 * N), jnp.int32)
        for c in range(C):
            ring = ring.at[..., c * m: c * m + Npm].add(y[:, c])
        return ring[..., :N] - ring[..., N:]

    def accumulate(self, x, prepared):
        cfg = self.cfg
        wm = prepared["wm"]
        UL, Jm, Npm = wm.shape
        N, m = cfg.N, self.m
        C = N // m
        L = cfg.num_limbs
        U = UL // L
        J = Jm // m
        planes = _digit_planes(cfg, x)                  # (P, ..., J, N)
        P = planes.shape[0]
        lead = planes.shape[1:-2]
        xc = planes.reshape(P, -1, J, C, m)
        xc = jnp.transpose(xc, (0, 1, 3, 2, 4))         # (P, B, C, J, m)
        xc = xc.reshape(P, xc.shape[1], C, Jm)
        res = self._fold_dot(xc, wm)                    # (B, UL, N)
        res = res.reshape(-1, U, L, N)
        dt = _torus_dtype(cfg.out_bits)
        out = None
        for lm in range(L):
            v = res[:, :, lm].astype(dt) << (cfg.limb_bits * lm + cfg.key_shift)
            out = v if out is None else out + v
        return out.reshape(*lead, U, N)

    def _ck32_tm(self, B, kp1, l, bgbit):
        """VMEM-chosen tile for ck_cmux_step32, or None when ineligible."""
        import jax as _jax
        from tfhe_tpu.ops import tiles
        cfg = self.cfg
        if not (_jax.default_backend() == "tpu" and cfg.out_bits == 32
                and cfg.kbits == 32 and cfg.plane_split[1] == 1
                and bgbit <= 8):
            return None
        return tiles.choose_ck32_tm(cfg.N, kp1, l, cfg.num_limbs, self.m, B)

    def cmux_step(self, a, acc, prepared, *, l, bgbit, offset, tm=None):
        """32-bit fused chunked CMux (ck_cmux_step32) — the N=1024 gate
        path where the dense-Toeplitz fused_cmux_step_v2 starves VMEM
        (measured 1124 us/step at GATE_MXU/B=4096/tm=128 vs 1864 for the
        separate kernels).  Returns None when ineligible."""
        if acc.ndim != 3:
            return None
        tm_fit = self._ck32_tm(acc.shape[0], acc.shape[1], l, bgbit)
        if tm_fit is None:
            return None
        from tfhe_tpu.ops.pallas_kernels import ck_cmux_step32
        return ck_cmux_step32(a, acc, prepared["wm"], l=l, bgbit=bgbit,
                              offset=offset, key_shift=self.cfg.key_shift,
                              m=self.m, tm=min(tm or tm_fit, tm_fit))

    def cmux_step_flat(self, a, acc_flat, prepared, *, kp1, l, bgbit,
                       offset, tm=None):
        """cmux_step on the flat (B, (k+1)*N) scan-carry layout — avoids
        ~100 us/step of XLA sublane-padding relayouts (see ck_cmux_step32).
        Returns None when ineligible."""
        if acc_flat.ndim != 2:
            return None
        tm_fit = self._ck32_tm(acc_flat.shape[0], kp1, l, bgbit)
        if tm_fit is None:
            return None
        from tfhe_tpu.ops.pallas_kernels import ck_cmux_step32
        return ck_cmux_step32(a, acc_flat, prepared["wm"], l=l, bgbit=bgbit,
                              offset=offset, key_shift=self.cfg.key_shift,
                              m=self.m, tm=min(tm or tm_fit, tm_fit),
                              kp1=kp1)

    def cmux_pair_step(self, a, acc_pair, prepared, *, l: int, bgbit: int,
                       offset: int, tm: int = 128, lgsize: int | None = None):
        """One 64-bit blind-rotation step on the U-MAJOR (lo, hi) pair
        representation (each (k+1, B, N) int32): rotate_decompose64_ck
        (digits emitted directly in chunk layout) -> ck_dot64 -> i64pair
        limb recombination + accumulator add (XLA-fused epilogue).
        Returns the new (lo, hi) pair, or None off-TPU."""
        import jax as _jax
        if _jax.default_backend() != "tpu" or self.cfg.out_bits != 64:
            return None
        from tfhe_tpu.ops.pallas_kernels import (rotate_decompose64_ck,
                                                 ck_dot64p)
        from tfhe_tpu.ops import i64pair
        cfg = self.cfg
        lo, hi = acc_pair
        kp1, B, N = lo.shape
        pb, P = cfg.plane_split
        wm = prepared["wm"]
        UL, Jm, Npm = wm.shape
        L = cfg.num_limbs
        m = self.m
        x = rotate_decompose64_ck(a, lo, hi, l=l, bgbit=bgbit, offset=offset,
                                   m=m, planes=P)
        if lgsize is None:
            import os as _os
            env = _os.environ.get("TFHE_CK64_LG", "")
            if env and UL % int(env) == 0:
                lgsize = int(env)           # measurement override
            else:
                # lg=1 everywhere.  The round-3 cross-session numbers that
                # put lg=2 ahead for two-plane blocks (7.65 vs 8.05 ms/ct)
                # did not survive a same-process interleaved A/B: at
                # CB_ACTIVE/B=256, (vmem 16|64 MB) x (lg 1|2) measured
                # lg1 8.08/8.14 vs lg2 9.48/9.52 ms/ct, +-0.3% within
                # config (bench_results/cb_active_ab_r5.json) — the r4
                # "regression" was this default, not the raised VMEM cap.
                lgsize = 1
        from tfhe_tpu.ops import tiles
        tm_fit = tiles.choose_ck64_tm(N, kp1, l, P, m, lgsize, B)
        if tm_fit is None:
            # no budgeted tile divides B (e.g. B=160): fall back to the
            # largest power-of-2 divisor of B <= 128 instead of tripping
            # ck_dot64p's B % tm assert; give up (generic engine path) only
            # when B is odd.
            tm_fit = B & -B if B & -B <= 128 else 128
            if tm_fit < 8:
                return None
        tm = min(tm, tm_fit)
        y = ck_dot64p(x, wm, N=N, m=m, planes=P, tm=min(tm, B),
                      lgsize=lgsize)
        y = y.reshape(kp1, L, B, N)
        zlo = zhi = None
        for lm in range(L):
            s = cfg.limb_bits * lm + cfg.key_shift
            plo, phi = i64pair.shift_left_i32(y[:, lm], s)
            zlo, zhi = ((plo, phi) if zlo is None
                        else i64pair.add(zlo, zhi, plo, phi))
        return i64pair.add(lo, hi, zlo, zhi)

    def cmux_pair_step_acc(self, a, lo_flat, hi_flat, prepared, *,
                           kp1: int, l: int, bgbit: int, offset: int,
                           tm: int = 128):
        """64-bit step on the FLAT pair layout, two kernels with the
        epilogue FUSED into the dot kernel (VERDICT r4 item 2 path A):
        rotate_decompose64_ck_flat -> ck_dot64p_acc.  vs cmux_pair_step,
        this retires the XLA i64pair epilogue and the (U*L, B, N) int32
        per-limb HBM round trip (~42 MB r+w per step at CB_MXU/B=256).
        Returns (lo', hi') or None when ineligible."""
        import jax as _jax
        if _jax.default_backend() != "tpu" or self.cfg.out_bits != 64:
            return None
        cfg = self.cfg
        pb, P = cfg.plane_split
        if P not in (1, 2):
            return None
        from tfhe_tpu.ops.pallas_kernels import (rotate_decompose64_ck_flat,
                                                 ck_dot64p_acc)
        B = lo_flat.shape[0]
        N = lo_flat.shape[1] // kp1
        tm_fit = B & -B if B & -B <= tm else tm
        if tm_fit < 8:
            return None
        x = rotate_decompose64_ck_flat(a, lo_flat, hi_flat, N=N, l=l,
                                       bgbit=bgbit, offset=offset,
                                       m=self.m, planes=P)
        return ck_dot64p_acc(x, prepared["wm"], lo_flat, hi_flat, N=N,
                             m=self.m, key_shift=cfg.key_shift, planes=P,
                             tm=min(tm, tm_fit), kp1=kp1)

    def cmux_pair_step_sacc(self, a, lo_flat, hi_flat, prepared, *,
                            kp1: int, l: int, bgbit: int, offset: int,
                            tm: int = 128):
        """cmux_pair_step_acc with the lg=1 streaming dot schedule kept
        (ck_dot64p_sacc): limb axis as an inner grid dim, pair
        recombination in scratch.  Returns (lo', hi') or None."""
        import jax as _jax
        if _jax.default_backend() != "tpu" or self.cfg.out_bits != 64:
            return None
        cfg = self.cfg
        pb, P = cfg.plane_split
        if P not in (1, 2):
            return None
        from tfhe_tpu.ops.pallas_kernels import (rotate_decompose64_ck_flat,
                                                 ck_dot64p_sacc)
        B = lo_flat.shape[0]
        N = lo_flat.shape[1] // kp1
        tm_fit = B & -B if B & -B <= tm else tm
        if tm_fit < 8:
            return None
        x = rotate_decompose64_ck_flat(a, lo_flat, hi_flat, N=N, l=l,
                                       bgbit=bgbit, offset=offset,
                                       m=self.m, planes=P)
        return ck_dot64p_sacc(x, prepared["wm"], lo_flat, hi_flat, N=N,
                              m=self.m, key_shift=cfg.key_shift, planes=P,
                              tm=min(tm, tm_fit), kp1=kp1)

    def cmux_pair_step_flat(self, a, lo_flat, hi_flat, prepared, *,
                            kp1: int, l: int, bgbit: int, offset: int,
                            tm: int = 128):
        """Fully fused 64-bit step on the FLAT (B, (k+1)*N) pair layout
        (pallas_kernels.ck_cmux_step64: rotation pipelined under the dots,
        in-kernel 64-bit limb recombination).  Returns (lo', hi') or None
        when ineligible."""
        import jax as _jax
        if _jax.default_backend() != "tpu" or self.cfg.out_bits != 64:
            return None
        cfg = self.cfg
        pb, P = cfg.plane_split
        if P not in (1, 2):
            return None
        B = lo_flat.shape[0]
        tm_fit = B & -B if B & -B <= tm else tm
        if tm_fit < 8:
            return None
        from tfhe_tpu.ops.pallas_kernels import ck_cmux_step64
        return ck_cmux_step64(a, lo_flat, hi_flat, prepared["wm"], l=l,
                              bgbit=bgbit, offset=offset,
                              key_shift=cfg.key_shift, m=self.m, planes=P,
                              tm=min(tm, tm_fit), kp1=kp1)


def make_engine(cfg: EngineConfig, backend: str = "matmul"):
    if backend == "nussbaumer":
        from tfhe_tpu.ops.nussbaumer import NussbaumerEngine
        return NussbaumerEngine(cfg)
    if backend in ("fft", "fft_dd", "fft_f64"):
        from tfhe_tpu.ops.fft import FFTEngine
        prec = {"fft": "auto", "fft_dd": "dd", "fft_f64": "f64"}[backend]
        return FFTEngine(cfg, precision=prec)
    if backend == "matmul":
        return MatmulEngine(cfg)
    if backend == "onthefly":
        return OnTheFlyMatmulEngine(cfg)
    if backend == "chunked":
        return ChunkedEngine(cfg)
    if backend == "conv":
        return ConvEngine(cfg)
    if backend == "conv_bf16":
        return ConvEngine(cfg, use_int8=False)
    if backend == "naive":
        return NaiveEngine(cfg)
    raise ValueError(f"unknown backend {backend!r}")

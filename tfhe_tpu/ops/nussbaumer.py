"""Nussbaumer-factored negacyclic engine — sub-quadratic exact products.

The direct MXU engines (ops/engine.py) spend N^2 MACs per negacyclic
product.  This engine factors Z[X]/(X^N+1) through Nussbaumer's polynomial
transform: with N = m*r (r >= m, both powers of two) and Y = X^m,

    a(X) = sum_{i<m} a_i(Y) X^i,      a_i in A = Z[Y]/(Y^r + 1),

the product reduces to a length-2m cyclic convolution over A whose DFT
twiddles are powers of omega = Y^(r/m) — i.e. NEGACYCLIC ROLLS, which cost
data movement only (VPU), never multiplies.  The only multiplications left
are 2m pointwise products in A: length-r negacyclic products executed as
int8 limb matmuls on the MXU, r x r instead of N x N.

MAC count per (digit poly x key poly): 2m * P * L * r^2 versus P0 * L * N^2
direct — an ~8x reduction at N=1024 (m=r=32, P grows from 1 to 2 because
the digit-side transform grows magnitudes by m).

This is the same design space the reference explores in its anticyclic-FFT
study (high-precision-anticyclic-fft/src/code.cpp:391-512: torus FFT with
exact twiddles); Nussbaumer is the variant whose twiddles are exactly
representable with NO precision budget at all, which is what an MXU-exact
integer pipeline wants.

Scaling trick (division by 2m): an unscaled FFT/iFFT pair computes
2m * (a (*) k).  Division by 2m mod 2^bits would lose the top log2(2m) bits,
so the key is pre-divided at preparation time: k' = round(k / 2m).  Then

    iFFT_raw(FFT(a) . FFT(k')) = 2m * (a (*) k') = a (*) k  -  a (*) eps,

with eps = k - 2m*k' in [-m, m].  The fold error a (*) eps is key-rounding
noise, variance J*N*Var(digit)*(2m)^2/12 per product in integer units —
for the gate-bootstrap parameters ~2^-23 per full blind rotation, two
decades below the bootstrapping-key noise itself (see noise.py:
nussbaumer_fold_variance).  Products whose key coefficients are multiples
of 2m are BIT-EXACT (eps = 0), which is the differential-test anchor.

Engine contract (shared with ops/engine.py):
    prepare(key_polys (J, U, N) torus) -> prepared pytree
    accumulate(x (..., J, N) int32 digits, prepared) -> (..., U, N) torus
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from tfhe_tpu import torus as T
from tfhe_tpu.ops.engine import EngineConfig, _EngineBase, _torus_dtype


def split_mr(N: int) -> tuple[int, int]:
    """N = m * r with m = 2^floor(log4 N) <= r (Nussbaumer needs r >= m so
    that A = Z[Y]/(Y^r+1) contains a 2m-th root of unity Y^(r/m))."""
    k = N.bit_length() - 1
    m = 1 << (k // 2)
    return m, N // m


def _neg_shift(x, s: int, axis: int = -1):
    """Negacyclic roll by s over `axis` (Y^s * x in Z[Y]/(Y^r+1))."""
    r = x.shape[axis]
    s = s % (2 * r)
    sign = 1
    if s >= r:
        s -= r
        sign = -1
    if s == 0:
        return sign * x
    lo = lax.slice_in_dim(x, r - s, r, axis=axis)
    hi = lax.slice_in_dim(x, 0, r - s, axis=axis)
    return sign * jnp.concatenate([-lo, hi], axis=axis)


def _dft(x, root_shift: int, axis_slots: int = -2):
    """Cyclic DFT over the slot axis (length S, power of two) with root
    eta = Y^root_shift of order S; twiddles applied as negacyclic rolls over
    the last (Y-coefficient) axis.  Radix-2 DIT, statically unrolled."""
    S = x.shape[axis_slots]
    assert axis_slots == -2
    if S == 1:
        return x
    even = _dft(x[..., 0::2, :], root_shift * 2)
    odd = _dft(x[..., 1::2, :], root_shift * 2)
    half = S // 2
    tw = [_neg_shift(odd[..., s:s + 1, :], root_shift * s) for s in range(half)]
    tw = jnp.concatenate(tw, axis=-2)
    return jnp.concatenate([even + tw, even - tw], axis=-2)


def _slot_split(x, m: int, r: int):
    """(..., N) -> (..., m, r): slot i holds a_i[q] = x[q*m + i]."""
    y = x.reshape(*x.shape[:-1], r, m)          # [..., q, i]
    return jnp.swapaxes(y, -1, -2)              # [..., i, q]


def _slot_fold(c, m: int, r: int):
    """(..., 2m, r) slot-domain product -> (..., N): reduce X^m = Y.

    c_i = c'_i + Y * c'_{i+m} for i < m, then out[q*m + i] = c_i[q]."""
    first = c[..., :m, :]
    second = _neg_shift(c[..., m:, :], 1)
    ci = first + second                          # (..., m=i, r=q)
    return jnp.swapaxes(ci, -1, -2).reshape(*c.shape[:-2], m * r)


def _fold_planes(bound: int, plane_bits: int = 7) -> int:
    planes, mm = 0, bound
    base_half = 1 << (plane_bits - 1)
    while mm:
        mm = (mm + base_half) >> plane_bits
        planes += 1
    return planes


class NussbaumerEngine(_EngineBase):
    """Sub-quadratic exact-integer negacyclic engine (see module docstring)."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.m, self.r = split_mr(cfg.N)
        assert self.m * self.r == cfg.N and self.r >= self.m
        # digit-side transform sums m rolled slot polys: |D| <= m * 2^(db-1)
        self.growth_bound = self.m << (cfg.digit_bits - 1)
        self.planes = _fold_planes(self.growth_bound)
        # int8 x int8 accumulation over J*r terms must fit int32
        # (|plane| <= 64, |limb| <= 128 -> J*r <= 2^18 is ample)

    # -- key side ----------------------------------------------------------
    def prepare(self, key_polys):
        """key (J, U, N) torus -> Toeplitz slot matrices
        {"w": (2m, J*r, U*L*r) int8}.

        k' = round(k / 2m) folds the inverse-transform 1/2m scale into the
        key (module docstring); FFT over slots; balanced int8 limbs; dense
        negacyclic r x r blocks in final matmul layout."""
        cfg, m, r = self.cfg, self.m, self.r
        key_polys = jnp.asarray(key_polys)
        J, U, N = key_polys.shape
        assert N == cfg.N
        wdt = jnp.int64 if cfg.kbits > 32 else jnp.int32
        shift = (2 * m).bit_length() - 1                  # log2(2m)
        kp = ((key_polys.astype(wdt) + (1 << (shift - 1))) >> shift)
        slots = _slot_split(kp, m, r)                     # (J, U, m, r)
        slots = jnp.concatenate(
            [slots, jnp.zeros_like(slots)], axis=-2)      # (J, U, 2m, r)
        khat = _dft(slots, self.r // self.m)              # (J, U, 2m, r)
        # balanced limbs don't negate elementwise (a -128 limb has no int8
        # negation), so limb-split khat and -khat separately for the doubled
        # (negacyclic-wrap) half.
        limbs = T.balanced_limbs(khat, cfg.num_limbs,
                                 cfg.limb_bits)           # (L, J, U, 2m, r)
        neg_limbs = T.balanced_limbs(-khat, cfg.num_limbs, cfg.limb_bits)
        doubled = jnp.concatenate([limbs, neg_limbs], axis=-1)  # (L,J,U,2m,2r)
        idx = jnp.asarray((np.arange(r)[None, :] - np.arange(r)[:, None])
                          % (2 * r))
        mat = jnp.take(doubled, idx, axis=-1)             # (L,J,U,2m,t,i)
        w = jnp.transpose(mat, (3, 1, 4, 2, 0, 5))        # (2m,J,t,U,L,i)
        L = cfg.num_limbs
        return {"w": w.reshape(2 * m, J * r, U * L * r)}

    # -- digit side --------------------------------------------------------
    def accumulate(self, x, prepared):
        cfg, m, r = self.cfg, self.m, self.r
        w = prepared["w"]
        twoM, Jr, ULr = w.shape
        J = Jr // r
        L = cfg.num_limbs
        U = ULr // (L * r)
        x = jnp.asarray(x, jnp.int32)
        lead = x.shape[:-2]
        B = int(np.prod(lead, dtype=np.int64)) if lead else 1
        xf = x.reshape(B, J, cfg.N)
        slots = _slot_split(xf, m, r)                     # (B, J, m, r)
        slots = jnp.concatenate(
            [slots, jnp.zeros_like(slots)], axis=-2)      # (B, J, 2m, r)
        dhat = _dft(slots, self.r // self.m)              # (B, J, 2m, r)
        planes = T.signed_planes(dhat, 7, self.planes)    # (P, B, J, 2m, r)
        planes = jnp.transpose(planes, (0, 3, 1, 2, 4))   # (P, 2m, B, J, r)
        planes = planes.reshape(self.planes, twoM, B, J * r)
        acc = None
        for p in range(self.planes):
            y = lax.dot_general(
                planes[p], w,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)         # (2m, B, ULr)
            y = y.reshape(twoM, B, U, L, r)
            out_dt = _torus_dtype(cfg.out_bits)
            v = jnp.moveaxis(y, 3, 0)                     # (L, 2m, B, U, r)
            v = T.recombine_limbs(v, cfg.limb_bits, out_dt)
            v = v << (7 * p) if p else v
            acc = v if acc is None else acc + v           # (2m, B, U, r)
        chat = jnp.moveaxis(acc, 0, -2)                   # (B, U, 2m, r)
        c = _dft(chat, -(self.r // self.m))               # iFFT (unscaled)
        out = _slot_fold(c, m, r)                         # (B, U, N)
        return out.reshape(*lead, U, cfg.N)

"""Anticyclic (negacyclic) FFT engines — the C13/C14 parity layer.

The reference evaluates Z[X]/(X^N+1) polynomials at the N/2 odd roots of
unity with a hand-written AVX/FMA FFT over f64
(spqlios/spqlios-fft-impl.cpp:48-641).  TPUs have no f64, so this module
provides:

  * `negacyclic_fft/ifft` — complex evaluation transform via XLA's native
    FFT (f32/c64 on TPU, f64/c128 on CPU under x64), with the odd-root
    twist applied as an elementwise pre/post multiply;
  * a double-float (f32x2, ~49-bit mantissa) radix-2 FFT built from
    error-free transforms (TwoSum / Veltkamp-split TwoProd) — the TPU
    answer to the reference's high-precision FFT study
    (high-precision-anticyclic-fft/src/code.cpp), usable where c64
    precision is insufficient;
  * `FFTEngine` — an engine-API backend computing negacyclic products in
    the evaluation domain.  APPROXIMATE by design (like the reference's
    spqlios path, which carries ~2^7 absolute error on torus64 products);
    the exact integer backends in ops/engine.py remain the default.

Convention (matches the reference data layout,
fft_processor_spqlios.cpp:21-24): the evaluation vector of a real
polynomial a of length N is the complex array
  hat(a)_k = sum_j a_j w^{(2k+1) j},  w = exp(i*pi/N),  k < N/2.
Products of polynomials are pointwise products of evaluation vectors.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Plain-precision transform (XLA FFT + twist)
# ---------------------------------------------------------------------------

def _twist(N: int, dtype):
    return np.exp(1j * np.pi * np.arange(N) / N).astype(dtype)


def spqlios_order(N: int):
    """Map our natural-order evaluation vector onto the spqlios buffer order.

    The reference FFT processor stores the N/2 complex evaluations of a real
    negacyclic polynomial as double[N] = N/2 reals followed by N/2
    imaginaries (fft_processor_spqlios.cpp:21-24), but in the butterfly
    output order of the split-radix asm (spqlios-fft-impl.cpp:48-155):

        slot[2t]   = hat(a)_{bitrev(t)}
        slot[2t+1] = conj(hat(a)_{N/2-1-bitrev(t)})

    with bitrev over log2(N/2) bits and hat(a)_k = sum_j a_j w^{(2k+1)j},
    w = exp(i*pi/N) (our negacyclic_fft convention).  Verified to 2e-11
    absolute against the compiled reference on N=2048 patterned fixtures
    (tests/test_reference_vectors.py).

    Returns (perm, conj): natural index feeding slot s is perm[s]; conj[s]
    marks slots holding the conjugate.
    """
    half = N // 2
    bits = half.bit_length() - 1
    t = np.arange(half // 2)
    br = np.zeros(half // 2, np.int64)
    for b in range(bits):
        br |= ((t >> b) & 1) << (bits - 1 - b)
    perm = np.zeros(half, np.int64)
    conj = np.zeros(half, bool)
    perm[0::2] = br
    perm[1::2] = half - 1 - br
    conj[1::2] = True
    return perm, conj


def to_spqlios(hat):
    """(..., N/2) complex natural-order evaluations -> (..., N) doubles in
    the reference's buffer layout (re[N/2] ++ im[N/2], spqlios slot order)."""
    hat = np.asarray(hat)
    half = hat.shape[-1]
    perm, conj = spqlios_order(2 * half)
    v = hat[..., perm]
    v = np.where(conj, np.conj(v), v)
    return np.concatenate([v.real, v.imag], axis=-1)


def from_spqlios(buf):
    """Inverse of to_spqlios: (..., N) doubles -> (..., N/2) complex."""
    buf = np.asarray(buf)
    half = buf.shape[-1] // 2
    v = buf[..., :half] + 1j * buf[..., half:]
    perm, conj = spqlios_order(2 * half)
    v = np.where(conj, np.conj(v), v)
    out = np.empty_like(v)
    out[..., perm] = v
    return out


def negacyclic_fft(a, precision: str = "auto"):
    """(..., N) real/int -> (..., N/2) complex evaluations at odd roots.

    hat(a)_k = sum_j (a_j w^j) e^{2 pi i j k / N} = N * ifft(a * w^j)_k.
    """
    import jax
    a = jnp.asarray(a)
    N = a.shape[-1]
    use64 = (precision == "highest"
             or (precision == "auto" and jax.default_backend() == "cpu"))
    cdtype = np.complex128 if use64 else np.complex64
    w = jnp.asarray(_twist(N, cdtype))
    b = a.astype(jnp.float64 if use64 else jnp.float32) * w
    return jnp.fft.ifft(b, axis=-1)[..., : N // 2] * N


def negacyclic_ifft(ahat, N: int | None = None):
    """(..., N/2) complex evaluations -> (..., N) real coefficients."""
    ahat = jnp.asarray(ahat)
    Ns2 = ahat.shape[-1]
    N = N or 2 * Ns2
    full = jnp.concatenate(
        [ahat, jnp.conj(ahat[..., ::-1])], axis=-1)     # hermitian-odd extend
    cdtype = full.dtype
    w = jnp.asarray(_twist(N, np.complex128 if cdtype == jnp.complex128
                           else np.complex64))
    b = jnp.fft.fft(full, axis=-1) / N
    return jnp.real(b * jnp.conj(w))


# ---------------------------------------------------------------------------
# Double-float (f32x2) building blocks — error-free transforms
# ---------------------------------------------------------------------------

def _opaque(x):
    """Hide a rounded intermediate from XLA's algebraic simplifier.

    The error-free transforms below depend on the EXACT rounded value of
    sums like s = a + b; XLA rewrites patterns such as (a + b) - a -> b
    and (p + e) - p -> e as if floats were reals, which silently zeroes
    the compensation terms under jit (measured: the dd FFT's precision
    collapsed from 2^-45 to 2^-29).  An optimization barrier keeps the
    value while severing the algebraic identity."""
    from jax import lax
    return lax.optimization_barrier(x)


def _two_sum(a, b):
    s = _opaque(a + b)
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split(a):
    # Split a into hi (12-bit significand) + lo so hi*hi' products are
    # exact in f32.  NOT the arithmetic Veltkamp split `c - (c - a)`:
    # XLA's algebraic simplifier rewrites that pattern to `a` under jit
    # (measured: destroys the low limb at torus32-FFT magnitudes).  Bit
    # masking the mantissa is opaque to algebraic passes and Sterbenz
    # guarantees a - hi is exact.
    from jax import lax
    ai = lax.bitcast_convert_type(a, jnp.int32)
    hi = lax.bitcast_convert_type(ai & jnp.int32(~0xFFF), jnp.float32)
    return hi, a - hi


def _two_prod(a, b):
    p = _opaque(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _force_full(v, sh):
    """Materialize v at shape sh WITHOUT a broadcast op in the graph.

    XLA:CPU mis-compiles fused elementwise chains that contain a
    broadcast operand (measured: dd_mul with a rank-1 twiddle loses its
    compensation term entirely under jit — half-ulp absolute error at
    torus32-FFT magnitudes — and broadcast_to/tile/optimization_barrier
    all get folded back into the same bad pattern).  A gather with an
    explicit index tensor survives every simplification pass and yields
    exact results; it only triggers for rank-deficient operands (the
    twiddle tables), so the cost is one materialized copy per stage."""
    v = jnp.asarray(v)
    sh = tuple(sh)
    if v.shape == sh:
        return v
    squeezed = v.reshape(v.shape[-1:]) if all(
        d == 1 for d in v.shape[:-1]) else None
    if squeezed is not None and squeezed.shape[0] == sh[-1]:
        idx = (jnp.zeros(sh[:-1] + (1,), jnp.int32)
               + jnp.arange(sh[-1], dtype=jnp.int32))
        return squeezed[idx]
    return jnp.broadcast_to(v, sh)


def _bcast4(xh, xl, yh, yl):
    sh = jnp.broadcast_shapes(jnp.shape(xh), jnp.shape(yh))
    return (_force_full(xh, sh), _force_full(xl, sh),
            _force_full(yh, sh), _force_full(yl, sh))


def dd_add(xh, xl, yh, yl):
    xh, xl, yh, yl = _bcast4(xh, xl, yh, yl)
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    hi = _opaque(s + e)
    return hi, e - (hi - s)


def dd_mul(xh, xl, yh, yl):
    xh, xl, yh, yl = _bcast4(xh, xl, yh, yl)
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    hi = _opaque(p + e)
    return hi, e - (hi - p)


def dd_from_f64(x):
    """Split host f64 values into (hi, lo) f32 pairs."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _dd_cmul(ar_h, ar_l, ai_h, ai_l, br_h, br_l, bi_h, bi_l):
    """(a * b) for dd-complex: (ar+i*ai)(br+i*bi)."""
    rr_h, rr_l = dd_mul(ar_h, ar_l, br_h, br_l)
    ii_h, ii_l = dd_mul(ai_h, ai_l, bi_h, bi_l)
    ri_h, ri_l = dd_mul(ar_h, ar_l, bi_h, bi_l)
    ir_h, ir_l = dd_mul(ai_h, ai_l, br_h, br_l)
    re_h, re_l = dd_add(rr_h, rr_l, -ii_h, -ii_l)
    im_h, im_l = dd_add(ri_h, ri_l, ir_h, ir_l)
    return re_h, re_l, im_h, im_l


def dd_fft(re_h, re_l, im_h, im_l, inverse: bool = False):
    """Iterative radix-2 DIT FFT over dd-complex, batched on leading axes.
    Twiddle tables built host-side per length (cached)."""
    N = re_h.shape[-1]
    rev = _bitrev_perm(N)
    xs = [jnp.take(jnp.asarray(v), jnp.asarray(rev), axis=-1)
          for v in (re_h, re_l, im_h, im_l)]
    sign = 1.0 if inverse else -1.0
    m = 2
    while m <= N:
        half = m // 2
        idx = np.arange(half) * (N // m)
        t = np.exp(sign * 2j * np.pi * idx / N)
        trh, trl = dd_from_f64(t.real)
        tih, til = dd_from_f64(t.imag)
        sh = xs[0].shape[:-1]
        blk = [v.reshape(*sh, N // m, m) for v in xs]
        ar = [v[..., :half] for v in blk]
        br = [v[..., half:] for v in blk]
        tr_h, tr_l, ti_h, ti_l = _dd_cmul(
            br[0], br[1], br[2], br[3], trh, trl, tih, til)
        o1 = dd_add(ar[0], ar[1], tr_h, tr_l)
        o2 = dd_add(ar[2], ar[3], ti_h, ti_l)
        o3 = dd_add(ar[0], ar[1], -tr_h, -tr_l)
        o4 = dd_add(ar[2], ar[3], -ti_h, -ti_l)
        xs = [jnp.concatenate([p, q], axis=-1).reshape(*sh, N)
              for p, q in ((o1[0], o3[0]), (o1[1], o3[1]),
                           (o2[0], o4[0]), (o2[1], o4[1]))]
        # barrier between butterfly stages: XLA:CPU's big fused elementwise
        # clusters mis-compile the compensation arithmetic (see _bcast4);
        # bounding each fusion to one stage keeps jit == eager == exact.
        xs = list(_opaque(tuple(xs)))
        m *= 2
    return xs


_BITREV_CACHE: dict[int, np.ndarray] = {}


def _bitrev_perm(N: int) -> np.ndarray:
    if N not in _BITREV_CACHE:
        bits = N.bit_length() - 1
        out = np.zeros(N, np.int64)
        for i in range(N):
            out[i] = int(format(i, f"0{bits}b")[::-1], 2)
        _BITREV_CACHE[N] = out
    return _BITREV_CACHE[N]


def negacyclic_fft_dd(a):
    """(..., N) int/real -> dd-complex evaluations (4 arrays of (..., N/2)).

    hat(a)_k = FFT_N(a_j * w^j)[conj convention]; we compute the length-N
    inverse-sign FFT of the twisted sequence and keep the first half,
    matching negacyclic_fft."""
    a = np.asarray(a)
    N = a.shape[-1]
    w = np.exp(1j * np.pi * np.arange(N) / N)
    tw_r = a * w.real
    tw_i = a * w.imag
    rh, rl = dd_from_f64(tw_r)
    ih, il = dd_from_f64(tw_i)
    out = dd_fft(rh, rl, ih, il, inverse=True)
    return [v[..., : N // 2] for v in out]


def dd_from_int(a):
    """Integer array -> real dd pair (hi, lo) f32, exact to ~48 bits."""
    a = jnp.asarray(a)
    ah = a.astype(jnp.float32)
    al = (a.astype(jnp.int64) - ah.astype(jnp.int64)).astype(jnp.float32)
    return ah, al


def negacyclic_fft_dd_dev(a):
    """Jittable negacyclic_fft_dd: (..., N) integer array (device) ->
    4 x (..., N/2) f32 dd-complex parts.  The twist multiply runs in dd so
    torus32-scale inputs keep ~49 significant bits."""
    a = jnp.asarray(a)
    N = a.shape[-1]
    w = np.exp(1j * np.pi * np.arange(N) / N)
    wrh, wrl = dd_from_f64(w.real)
    wih, wil = dd_from_f64(w.imag)
    ah, al = dd_from_int(a)
    rh, rl = dd_mul(ah, al, wrh, wrl)
    ih, il = dd_mul(ah, al, wih, wil)
    out = dd_fft(rh, rl, ih, il, inverse=True)
    return [v[..., : N // 2] for v in out]


def negacyclic_ifft_dd_dev(parts, N: int, bits: int):
    """Jittable inverse: dd-complex (..., N/2) -> (..., N) torus ints with
    exact mod-2^bits wrap (rounded to nearest)."""
    rh, rl, ih, il = [jnp.asarray(v) for v in parts]
    rh = jnp.concatenate([rh, rh[..., ::-1]], axis=-1)
    rl = jnp.concatenate([rl, rl[..., ::-1]], axis=-1)
    ih = jnp.concatenate([ih, -ih[..., ::-1]], axis=-1)
    il = jnp.concatenate([il, -il[..., ::-1]], axis=-1)
    orh, orl, oih, oil = dd_fft(rh, rl, ih, il, inverse=False)
    w = np.exp(-1j * np.pi * np.arange(N) / N)
    wrh, wrl = dd_from_f64(w.real)
    wih, wil = dd_from_f64(w.imag)
    re_h, re_l, _, _ = _dd_cmul(orh, orl, oih, oil, wrh, wrl, wih, wil)
    inv = jnp.float32(1.0 / N)                     # N power of 2: exact scale
    return dd_to_int(re_h * inv, re_l * inv, bits)


def dd_to_int(hi, lo, bits: int):
    """Round a dd value to the nearest integer mod 2^bits, exactly.

    hi may reach ~2^(49+log2 N), far past f32's 24-bit integer range, so
    split hi = q*2^16 + r with q = rint(hi/2^16) (|q| < 2^24 exact in f32;
    q*2^16 exact; r = hi - q*2^16 exact by Sterbenz), then assemble in the
    integer domain where wrap-around is native — the dd analog of the
    reference's f64->i64 IEEE-754 bit surgery
    (fft_processor_spqlios.cpp:105-156)."""
    idt = jnp.int32 if bits == 32 else jnp.int64
    q = jnp.round(hi * jnp.float32(2.0**-16))
    r = hi - q * jnp.float32(2.0**16)
    qi = q.astype(jnp.int64) << 16
    ri = jnp.round(r + lo).astype(jnp.int64)
    return (qi + ri).astype(idt) if bits == 32 else (qi + ri)


def dd_to_int(hi, lo, bits: int):
    """Round a dd value to the nearest integer mod 2^bits, exactly.

    hi may reach ~2^(49+log2 N), far past f32's 24-bit integer range, so
    split hi = q*2^16 + r with q = rint(hi/2^16) (|q| < 2^24 exact in f32;
    q*2^16 exact; r = hi - q*2^16 exact by Sterbenz), then assemble in the
    integer domain where wrap-around is native — the dd analog of the
    reference's f64->i64 IEEE-754 bit surgery
    (fft_processor_spqlios.cpp:105-156)."""
    idt = jnp.int32 if bits == 32 else jnp.int64
    q = jnp.round(hi * jnp.float32(2.0**-16))
    r = hi - q * jnp.float32(2.0**16)
    qi = q.astype(jnp.int64) << 16
    ri = jnp.round(r + lo).astype(jnp.int64)
    return (qi + ri).astype(idt) if bits == 32 else (qi + ri)


class FFTEngine:
    """Evaluation-domain negacyclic product engine (C12/C13 parity: the
    spqlios production path, fft_processor_spqlios.cpp:18-170).

    Same contract as the ops.engine backends:
        prepare(key (J, U, N) torus) -> {"hat": eval-domain key}
        accumulate(x (..., J, N) digits) -> (..., U, N) torus
        result[..., u] = sum_j negacyclic(x[..., j], key[j, u])

    APPROXIMATE by design, like the reference FFT path.  Two precisions:
      "f64"  — complex128 via XLA FFT (CPU-only; TPU has no f64): the
               direct analog of the reference's double transform, error
               envelope ~2^2 absolute on torus32 gate-parameter products
               (reference carries ~2^7 on torus64, its README's own bound);
      "dd"   — double-float f32x2 (~49-bit) radix-2 FFT, jittable on TPU;
               error envelope ~2^6 on torus32 gate parameters
               (tests/test_fft_engine.py measures both).
    "auto" picks f64 on CPU, dd elsewhere.  The exact integer engines
    (ops/engine.py) remain the production default; this backend exists for
    speed/precision experiments and reference parity.
    """

    def __init__(self, cfg, precision: str = "auto"):
        import jax
        self.cfg = cfg
        if precision == "auto":
            precision = "f64" if jax.default_backend() == "cpu" else "dd"
        assert precision in ("f64", "dd")
        if precision == "f64" and jax.default_backend() != "cpu":
            raise ValueError("f64 FFT engine requires the CPU backend")
        if precision == "dd" and cfg.out_bits != 32:
            raise ValueError("dd FFT engine covers torus32 outputs only "
                             "(~49-bit mantissa)")
        self.precision = precision

    def prepare(self, key_polys):
        key_polys = jnp.asarray(key_polys)
        assert key_polys.shape[-1] == self.cfg.N
        if self.precision == "f64":
            return {"hat": negacyclic_fft(key_polys, precision="highest")}
        return {"hat": tuple(negacyclic_fft_dd_dev(key_polys))}

    def accumulate(self, x, prepared):
        cfg = self.cfg
        x = jnp.asarray(x)
        J = x.shape[-2]
        if self.precision == "f64":
            hk = prepared["hat"]                        # (J, U, N/2) c128
            hx = negacyclic_fft(x, precision="highest") # (..., J, N/2)
            hy = jnp.einsum("...jk,juk->...uk", hx, hk)
            y = negacyclic_ifft(hy, cfg.N)
            dt = jnp.int32 if cfg.out_bits == 32 else jnp.int64
            m = jnp.float64(2.0**cfg.out_bits)
            wrapped = jnp.round(y) - m * jnp.round(y / m)   # centred mod 2^bits
            return wrapped.astype(jnp.int64).astype(dt)
        kh = prepared["hat"]                            # 4 x (J, U, N/2)
        xh = negacyclic_fft_dd_dev(x)                   # 4 x (..., J, N/2)
        # pointwise dd cmul + accumulate over j for each u
        U = kh[0].shape[1]
        outs = []
        for u in range(U):
            acc = None
            for parts in [_dd_cmul(xh[0][..., j, :], xh[1][..., j, :],
                                   xh[2][..., j, :], xh[3][..., j, :],
                                   kh[0][j, u], kh[1][j, u],
                                   kh[2][j, u], kh[3][j, u])
                          for j in range(J)]:
                if acc is None:
                    acc = list(parts)
                else:
                    acc[0], acc[1] = dd_add(acc[0], acc[1], parts[0], parts[1])
                    acc[2], acc[3] = dd_add(acc[2], acc[3], parts[2], parts[3])
            outs.append(negacyclic_ifft_dd_dev(acc, cfg.N, cfg.out_bits))
        return jnp.stack(outs, axis=-2)

    def accumulate_into(self, acc, x, prepared):
        return acc + self.accumulate(x, prepared)

    def cmux_step(self, a, acc, prepared, *, l, bgbit, offset, tm=256):
        return None


def negacyclic_ifft_dd(parts, N: int):
    """Inverse of negacyclic_fft_dd: dd-complex (..., N/2) -> (..., N) f64
    coefficients (combined on host)."""
    rh, rl, ih, il = [jnp.asarray(v) for v in parts]
    # hermitian-odd extension: hat(a)_{N-1-k} = conj(hat(a)_k) under this
    # convention's index map k -> N-1-k
    rh = jnp.concatenate([rh, rh[..., ::-1]], axis=-1)
    rl = jnp.concatenate([rl, rl[..., ::-1]], axis=-1)
    ih = jnp.concatenate([ih, -ih[..., ::-1]], axis=-1)
    il = jnp.concatenate([il, -il[..., ::-1]], axis=-1)
    out = dd_fft(rh, rl, ih, il, inverse=False)
    orh, orl, oih, oil = out
    w = np.exp(-1j * np.pi * np.arange(N) / N)
    wrh, wrl = dd_from_f64(w.real)
    wih, wil = dd_from_f64(w.imag)
    re_h, re_l, _, _ = _dd_cmul(orh, orl, oih, oil, wrh, wrl, wih, wil)
    return (np.asarray(re_h, np.float64) + np.asarray(re_l, np.float64)) / N

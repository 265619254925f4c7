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

def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split(a):
    # Veltkamp split for f32 (24-bit mantissa): factor 2^12+1
    c = jnp.float32(4097.0) * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def dd_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    hi = s + e
    return hi, e - (hi - s)


def dd_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    hi = p + e
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

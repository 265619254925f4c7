"""High-precision anticyclic FFT study — parity with H1-H6 of SURVEY.md §2.2.

The reference subproject (high-precision-anticyclic-fft/src/code.cpp) asks:
what does an EXACT-ish negacyclic FFT over Torus64 cost when the reals are
128-bit fixed point (Real96: signed v/2^64 stored in a __uint128_t,
code.cpp:25-41) instead of doubles?  Its conclusion — viable but expensive —
is what motivated this library's exact int8-limb MXU path (ops/engine.py).
This module is the TPU-native version of that study:

  * **HP fixed point** — arrays of signed fixed-point reals with 64
    fractional bits, stored as ``limbs`` 16-bit limbs in int64 lanes
    (TPU has no u128/i128; 16-bit limbs keep every partial product and
    carry inside the int64 VPU lanes).  ``limbs=6`` is the reference's
    Real96 (96-bit, code.cpp:25), ``limbs=8`` its 128-bit storage; other
    values give the GMP/MPFR-style precision sweep (bench_fft_gmp.cpp:16-25).
  * **Exact twiddles** — cos/sin(2*pi*i/n) rounded to 64 fractional bits,
    computed with stdlib ``decimal`` Taylor series (the NTL-RR analog of
    accurate_cos/sin, code.cpp:246-277); no external bignum dependency.
  * **The transform pair** — iFFT: Torus64^N -> Cplx^{N/2} (twist by
    omega^j then log2(N/4) DIF butterfly stages, code.cpp:391-443);
    FFT: DIT stages, untwist, then an arithmetic >>log2(n/4) for the 1/ns4
    normalization (code.cpp:446-512, the ``>>10`` at :502-503).
  * **Stage-invariant checking** — `naive_eval_check` recomputes slot
    values by naive evaluation like ifft_check/fft_check (code.cpp:302-374).

All arithmetic wraps mod 2^(16*limbs) exactly like the reference's
__uint128_t wraps mod 2^128 — add/sub/neg/mul are bit-faithful models of
add/sub/neg/intmul_ref (code.cpp:47-97) at limbs=8.
"""

from __future__ import annotations

import decimal
import functools
import math

import numpy as np
import jax.numpy as jnp

FRAC_LIMBS = 4          # 64 fractional bits, 16 bits per limb
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


# ---------------------------------------------------------------------------
# HP fixed-point arithmetic (H1: Real96, code.cpp:25-233)
# ---------------------------------------------------------------------------

def _normalize(z, limbs: int):
    """Propagate carries so every limb lands in [0, 2^16); wrap at the top."""
    outs = []
    carry = jnp.zeros_like(z[..., 0])
    for i in range(limbs):
        t = z[..., i] + carry
        outs.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS          # arithmetic shift: signed-safe
    return jnp.stack(outs, axis=-1)


def hp_from_int(v, limbs: int):
    """Signed integer array -> HP value v (an integer-valued real)."""
    v = jnp.asarray(v, jnp.int64)
    fr = [jnp.zeros_like(v)] * FRAC_LIMBS
    out = [(v >> min(LIMB_BITS * i, 63)) & LIMB_MASK
           for i in range(limbs - FRAC_LIMBS)]
    return jnp.stack(fr + out, axis=-1)


def hp_from_t64(x, limbs: int):
    """Torus64 (int64, value x/2^64) -> HP (t64tor96, code.cpp:193-198)."""
    x = jnp.asarray(x, jnp.int64)
    out = [(x >> min(LIMB_BITS * i, 63)) & LIMB_MASK for i in range(limbs)]
    return jnp.stack(out, axis=-1)


def hp_to_t64(a):
    """HP -> Torus64: the low 64 bits of v (FFT output path, code.cpp:502)."""
    a = jnp.asarray(a)
    r = jnp.zeros(a.shape[:-1], jnp.int64)
    for i in range(FRAC_LIMBS):
        r = r | (a[..., i].astype(jnp.int64) << (LIMB_BITS * i))
    return r


def hp_to_float(a) -> np.ndarray:
    """HP -> float64 (display/tests only; mirrors Real96's operator<<)."""
    a = np.asarray(a)
    limbs = a.shape[-1]
    total = np.zeros(a.shape[:-1], object)
    for i in reversed(range(limbs)):
        total = total * (1 << LIMB_BITS) + a[..., i].astype(object)
    half = 1 << (LIMB_BITS * limbs - 1)
    total = np.where(total >= half, total - (1 << (LIMB_BITS * limbs)), total)
    return (total / float(2 ** (LIMB_BITS * FRAC_LIMBS))).astype(np.float64)


def hp_add(a, b):
    return _normalize(a + b, a.shape[-1])


def hp_sub(a, b):
    return _normalize(a - b, a.shape[-1])


def hp_neg(a):
    return _normalize(-a, a.shape[-1])


def hp_rshift(a, s: int):
    """Arithmetic right shift of the signed multi-limb value by s bits
    (the FFT's /ns4 normalization, code.cpp:502-503)."""
    limbs = a.shape[-1]
    q, r = divmod(s, LIMB_BITS)
    sign = (a[..., -1] >> (LIMB_BITS - 1)) & 1
    ext = sign * LIMB_MASK
    shifted = [a[..., i + q] if i + q < limbs else ext for i in range(limbs)]
    if r == 0:
        return jnp.stack(shifted, axis=-1)
    out = []
    for i in range(limbs):
        hi = shifted[i + 1] if i + 1 < limbs else ext
        out.append(((shifted[i] >> r) | (hi << (LIMB_BITS - r))) & LIMB_MASK)
    return jnp.stack(out, axis=-1)


def hp_mul(a, b):
    """Signed fixed-point product, truncated — intmul_ref (code.cpp:79-97):
    dest = (int(a) * int(b)) >> 64, wrapped mod 2^(16*limbs).

    Full 2L-limb unsigned product (partials < 2^32, sums < L*2^32: all in
    int64) + two's-complement sign corrections, then slice the window
    [FRAC_LIMBS, FRAC_LIMBS+L) after carry normalization."""
    limbs = a.shape[-1]
    L2 = 2 * limbs
    z = [jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), jnp.int64)
         for _ in range(L2)]
    for i in range(limbs):
        ai = a[..., i]
        for j in range(limbs):
            p = ai * b[..., j]
            z[i + j] = z[i + j] + (p & LIMB_MASK)
            if i + j + 1 < L2:
                z[i + j + 1] = z[i + j + 1] + (p >> LIMB_BITS)
    # signed correction: a*b = au*bu - sa*bu*2^(16L) - sb*au*2^(16L) (+ drop)
    sa = (a[..., -1] >> (LIMB_BITS - 1)) & 1
    sb = (b[..., -1] >> (LIMB_BITS - 1)) & 1
    for j in range(limbs):
        if limbs + j < FRAC_LIMBS + limbs:   # only limbs inside kept window
            z[limbs + j] = z[limbs + j] - sa * b[..., j] - sb * a[..., j]
    full = _normalize(jnp.stack(z, axis=-1), L2)
    return full[..., FRAC_LIMBS:FRAC_LIMBS + limbs]


def hp_cmul(ar, ai, br, bi):
    """(ar+i*ai)*(br+i*bi) on HP parts — complex<Real96> operator*."""
    rr = hp_sub(hp_mul(ar, br), hp_mul(ai, bi))
    ii = hp_add(hp_mul(ar, bi), hp_mul(ai, br))
    return rr, ii


# ---------------------------------------------------------------------------
# Exact twiddles via decimal Taylor series (H2: accurate_cos/sin,
# code.cpp:246-277 — NTL RR replaced by stdlib arbitrary-precision decimal)
# ---------------------------------------------------------------------------

_PI_50 = decimal.Decimal("3.14159265358979323846264338327950288419716939937511")


def _dec_cos_sin(x: decimal.Decimal):
    """cos(x), sin(x) by Taylor series at 50-digit working precision."""
    with decimal.localcontext() as ctx:
        ctx.prec = 50
        c = decimal.Decimal(1)
        s = decimal.Decimal(0)
        term = decimal.Decimal(1)
        k = 0
        while abs(term) > decimal.Decimal("1e-45"):
            k += 1
            term = term * x / k
            if k % 4 == 1:
                s += term
            elif k % 4 == 2:
                c -= term
            elif k % 4 == 3:
                s -= term
            else:
                c += term
        return c, s


@functools.cache
def _twiddle_ints(n: int):
    """round(cos/sin(2*pi*i/n) * 2^64) as python ints, i < n."""
    cos_i, sin_i = [], []
    scale = 1 << 64
    with decimal.localcontext() as ctx:
        ctx.prec = 50
        for i in range(n):
            x = _PI_50 * 2 * i / n
            c, s = _dec_cos_sin(x)
            cos_i.append(int((c * scale).to_integral_value(
                rounding=decimal.ROUND_HALF_EVEN)))
            sin_i.append(int((s * scale).to_integral_value(
                rounding=decimal.ROUND_HALF_EVEN)))
    return cos_i, sin_i


def _ints_to_hp(vals, limbs: int) -> np.ndarray:
    out = np.zeros((len(vals), limbs), np.int64)
    mod = 1 << (LIMB_BITS * limbs)
    for r, v in enumerate(vals):
        u = v % mod
        for i in range(limbs):
            out[r, i] = (u >> (LIMB_BITS * i)) & LIMB_MASK
    return out


@functools.cache
def precomp_ifft(n: int, limbs: int):
    """powomega[i] = (cos, sin)(2*pi*i/n) as HP parts (code.cpp:378-382)."""
    cos_i, sin_i = _twiddle_ints(n)
    return (jnp.asarray(_ints_to_hp(cos_i, limbs)),
            jnp.asarray(_ints_to_hp(sin_i, limbs)))


@functools.cache
def precomp_fft(n: int, limbs: int):
    """powombar[i] = (cos(i), sin(n-i)) — conjugates (code.cpp:384-388)."""
    cos_i, sin_i = _twiddle_ints(n)
    sbar = [sin_i[(n - i) % n] for i in range(n)]
    return (jnp.asarray(_ints_to_hp(cos_i, limbs)),
            jnp.asarray(_ints_to_hp(sbar, limbs)))


# ---------------------------------------------------------------------------
# The anticyclic transform pair (H3: iFFT/FFT, code.cpp:391-512)
# ---------------------------------------------------------------------------

def hp_ifft(coefs, limbs: int = 6):
    """Torus64 coefficients (..., N) -> evaluations at odd 2N-th roots.

    Returns (re, im) HP arrays of shape (..., N/2, limbs).  Structure per
    code.cpp:391-443: twist out[j] = (in[j] + i*in[j+N/2]) * omega^j, then
    DIF butterflies nn = n/4 .. 2 with twiddle omega^{2*(ns4/halfnn)*off}.
    """
    coefs = jnp.asarray(coefs, jnp.int64)
    N = coefs.shape[-1]
    n = 2 * N
    ns4 = n // 4
    wr, wi = precomp_ifft(n, limbs)
    re = hp_from_t64(coefs[..., :ns4], limbs)
    im = hp_from_t64(coefs[..., ns4:], limbs)
    re, im = hp_cmul(re, im, wr[:ns4], wi[:ns4])
    nn = ns4
    while nn >= 2:
        half = nn // 2
        sh = re.shape[:-2]
        re_b = re.reshape(*sh, ns4 // nn, nn, limbs)
        im_b = im.reshape(*sh, ns4 // nn, nn, limbs)
        t1r, t1i = re_b[..., :half, :], im_b[..., :half, :]
        t2r, t2i = re_b[..., half:, :], im_b[..., half:, :]
        sr, si = hp_add(t1r, t2r), hp_add(t1i, t2i)
        dr, di = hp_sub(t1r, t2r), hp_sub(t1i, t2i)
        idx = (2 * (ns4 // half) * np.arange(half)) % n
        dr, di = hp_cmul(dr, di, wr[idx], wi[idx])
        re = jnp.concatenate([sr, dr], axis=-2).reshape(*sh, ns4, limbs)
        im = jnp.concatenate([si, di], axis=-2).reshape(*sh, ns4, limbs)
        nn = half
    return re, im


def hp_fft(re, im):
    """Evaluations -> Torus64 coefficients (..., N) — code.cpp:446-512.

    DIT butterflies nn = 2 .. n/4 with conjugate twiddles, untwist by
    ombar^j, then >>log2(ns4) (the reference's hardcoded >>10) and the
    low-64-bit extraction."""
    limbs = re.shape[-1]
    ns4 = re.shape[-2]
    n = 4 * ns4
    wr, wi = precomp_fft(n, limbs)
    nn = 2
    while nn <= ns4:
        half = nn // 2
        sh = re.shape[:-2]
        re_b = re.reshape(*sh, ns4 // nn, nn, limbs)
        im_b = im.reshape(*sh, ns4 // nn, nn, limbs)
        t1r, t1i = re_b[..., :half, :], im_b[..., :half, :]
        t2r, t2i = re_b[..., half:, :], im_b[..., half:, :]
        idx = (2 * (ns4 // half) * np.arange(half)) % n
        t2r, t2i = hp_cmul(t2r, t2i, wr[idx], wi[idx])
        sr, si = hp_add(t1r, t2r), hp_add(t1i, t2i)
        dr, di = hp_sub(t1r, t2r), hp_sub(t1i, t2i)
        re = jnp.concatenate([sr, dr], axis=-2).reshape(*sh, ns4, limbs)
        im = jnp.concatenate([si, di], axis=-2).reshape(*sh, ns4, limbs)
        nn *= 2
    re, im = hp_cmul(re, im, wr[:ns4], wi[:ns4])
    s = int(math.log2(ns4))
    lo = hp_to_t64(hp_rshift(re, s))
    hi = hp_to_t64(hp_rshift(im, s))
    return jnp.concatenate([lo, hi], axis=-1)


def hp_ifft_int(a_int, limbs: int = 6):
    """iFFT of an INTEGER polynomial: same pipeline as hp_ifft but with the
    input embedded at integer scale (value a_j, not a_j/2^64) so the
    evaluation values stay exact-magnitude reals.  For the gadget-digit
    operand of an external product (|a| <= Bg/2), the integer part needs
    log2(N * Bg/2) bits — well within limbs=6's 32 integer bits."""
    a_int = jnp.asarray(a_int, jnp.int64)
    N = a_int.shape[-1]
    n = 2 * N
    ns4 = n // 4
    wr, wi = precomp_ifft(n, limbs)
    re = hp_from_int(a_int[..., :ns4], limbs)
    im = hp_from_int(a_int[..., ns4:], limbs)
    re, im = hp_cmul(re, im, wr[:ns4], wi[:ns4])
    nn = ns4
    while nn >= 2:
        half = nn // 2
        sh = re.shape[:-2]
        re_b = re.reshape(*sh, ns4 // nn, nn, limbs)
        im_b = im.reshape(*sh, ns4 // nn, nn, limbs)
        t1r, t1i = re_b[..., :half, :], im_b[..., :half, :]
        t2r, t2i = re_b[..., half:, :], im_b[..., half:, :]
        sr, si = hp_add(t1r, t2r), hp_add(t1i, t2i)
        dr, di = hp_sub(t1r, t2r), hp_sub(t1i, t2i)
        idx = (2 * (ns4 // half) * np.arange(half)) % n
        dr, di = hp_cmul(dr, di, wr[idx], wi[idx])
        re = jnp.concatenate([sr, dr], axis=-2).reshape(*sh, ns4, limbs)
        im = jnp.concatenate([si, di], axis=-2).reshape(*sh, ns4, limbs)
        nn = half
    return re, im


def hp_negacyclic_mul(a_int, b_t64, limbs: int = 6):
    """Precision-study negacyclic product: int poly x Torus64 poly.

    The H4 key-switch use case (code.cpp:590-636): both operands to the
    evaluation domain, pointwise complex product, back.  The int operand
    rides at integer scale (hp_ifft_int) so no torus precision is spent on
    it; the result is the torus64 product a*b mod X^N+1 up to the FFT's
    fixed-point rounding (measured in tests: <= a few thousand ulps of
    2^-64 at limbs=6 — the reference's very_close tolerance, code.cpp:235).
    """
    ar, ai = hp_ifft_int(a_int, limbs)
    br, bi = hp_ifft(b_t64, limbs)
    pr, pi = hp_cmul(ar, ai, br, bi)
    return hp_fft(pr, pi)


# ---------------------------------------------------------------------------
# Stage-invariant oracle (H3 checkers: ifft_check/fft_check,
# code.cpp:302-374) — naive evaluation float oracle.
# ---------------------------------------------------------------------------

def naive_eval(coefs: np.ndarray) -> np.ndarray:
    """Evaluate sum_j c_j X^j (c Torus64) at ALL N odd 2N-th roots
    omega^(2k+1), k < N (conjugate-closed set).

    Float oracle of the checkers' mathematical content (the reference
    asserts stagewise closeness, code.cpp:310-343).  The transform's N/2
    slots land on N/2 conjugate-distinct members of this set in
    bit-reversed block order."""
    N = len(coefs)
    k = np.arange(N)[:, None]
    w = np.exp(1j * np.pi * (2 * k + 1) * np.arange(N)[None, :] / N)
    return (coefs.astype(np.float64)[None, :] * w).sum(axis=1) / 2.0**64


def gmp_sweep_params(alpha_bits: int):
    """Precision-sweep parameter derivation of the GMP/MPFR study
    (bench_fft_gmp.cpp:16-25): noise parameter alpha = 2^-alpha_bits
    determines the minimal ring size and the required fixed-point widths.

    Returns dict(alpha_bits, min_n, log2n, N, fprec, iprec, limbs) where
    `limbs` is the 16-bit limb count covering fprec+iprec bits in this
    module's representation (the ALPHA_BITS -> limbs axis of the sweep).
    """
    import math
    min_n = 1000 * alpha_bits // 35
    log2n = int(math.ceil(math.log2(min_n)))
    N = 1 << log2n
    fprec = alpha_bits + 4
    iprec = fprec // 2
    limbs = -(-(fprec + iprec) // 16)
    return {"alpha_bits": alpha_bits, "min_n": min_n, "log2n": log2n,
            "N": N, "fprec": fprec, "iprec": iprec, "limbs": limbs}

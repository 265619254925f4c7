"""End-to-end circuit-bootstrap anchor vs the PATCHED reference binary
(VERDICT r2 item 3).

native/ref_dump_e2e.cpp drives `tfhe_CircuitBootstrapFFT`
(poc_CircuitBootstrapping.cpp:823-873) with the two PARITY.md rotation bugs
fixed (native/patch_poc.py — the rotation becomes the mathematically
consistent negacyclic `(X^a - 1)*acc`, i.e. exactly the repo's
mul_by_xai_minus_one semantics) under FALSE_RANDOM, and dumps the composed
pipeline: premodswitch, per-level blind-rotation outputs, and the final
TGSW32.  This test reproduces the whole pipeline with repo primitives:

  preKS/modswitch  lwe.keyswitch + mod_switch_from_torus32   (bit-exact)
  blind rotation   PoC composition (testvect*X^{+bbar}, +abar steps) with
                   an independent numpy negacyclic oracle (22-bit limb
                   rFFT, exactness bound asserted)             (bit-exact
                   vs the exact build; envelope vs the asm-FFT build)
  extract+privKS   sample_extract + circuit.priv_keyswitch    (bit-exact)

Regenerate fixtures: cd native && make ref_dump_e2e_exact ref_dump_e2e_fft
  && ./ref_dump_e2e_exact ../tests/fixtures/ref_e2e_exact
  && ./ref_dump_e2e_fft   ../tests/fixtures/ref_e2e_fft
"""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.params import CB_ACTIVE
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import lwe, tlwe, tgsw
from tfhe_tpu import torus as T
from tfhe_tpu.boot import circuit
from tfhe_tpu.ops import poly

P = CB_ACTIVE
n0, N1, N2 = P.n_lvl0, P.n_lvl1, P.n_lvl2
ELL1, BG1 = P.tgsw_lvl1.l, P.tgsw_lvl1.bgbit
FIX = pathlib.Path(__file__).parent / "fixtures"
EXACT = FIX / "ref_e2e_exact"
FFT = FIX / "ref_e2e_fft"

pytestmark = pytest.mark.skipif(
    not (EXACT / "cb_out.i32").exists(),
    reason="e2e fixtures not generated (see module docstring)")


def i32(d, name):
    return np.fromfile(d / name, np.int32)


def i64(d, name):
    return np.fromfile(d / name, np.int64)


# ---------------------------------------------------------------------------
# independent exact negacyclic oracle: 22-bit limb split + length-2N rFFT.
# Exactness: per-limb conv coefficients are bounded by J*N*256*2^21 = 2^43
# (CB_ACTIVE), so float64 holds them exactly and the FFT rounding (~2^43 *
# 11 * 2^-52 ~ 0.02) stays far below the 0.5 rint threshold — asserted.
# ---------------------------------------------------------------------------

LIMB_BITS = 22
NLIMB = 3


def _key_limbs22(bk):
    """bk: (..., N) int64 -> (..., NLIMB, N) float64 balanced 22-bit limbs."""
    u = bk.astype(np.uint64)
    out = []
    for _ in range(NLIMB):
        raw = (u & np.uint64((1 << LIMB_BITS) - 1)).astype(np.int64)
        l = ((raw + (1 << (LIMB_BITS - 1))) & ((1 << LIMB_BITS) - 1)) \
            - (1 << (LIMB_BITS - 1))
        out.append(l)
        u = (u - l.astype(np.uint64)) >> np.uint64(LIMB_BITS)
    return np.stack(out, axis=-2).astype(np.float64)


class ExactProductOracle:
    """sum_j digits[j] (*) bk[j, u] mod X^N+1, exact mod 2^64."""

    def __init__(self, bk_rows):                  # (J, U, N) int64
        self.J, self.U, self.N = bk_rows.shape
        limbs = _key_limbs22(bk_rows)             # (J, U, NLIMB, N)
        self.kf = np.fft.rfft(limbs, 2 * self.N, axis=-1)

    def __call__(self, digits):                   # (J, N) int32
        N = self.N
        df = np.fft.rfft(digits.astype(np.float64), 2 * N, axis=-1)
        out = np.zeros((self.U, N), np.int64)
        for li in range(NLIMB):
            cf = np.einsum("jf,juf->uf", df, self.kf[:, :, li])
            c = np.fft.irfft(cf, 2 * N, axis=-1)
            cn = c[..., :N] - c[..., N:]          # negacyclic fold
            r = np.rint(cn)
            assert np.abs(cn - r).max() < 0.45, "FFT exactness bound blown"
            out += r.astype(np.int64) << (LIMB_BITS * li)
        return out


def _decompose64(acc, p):
    """tGsw64DecompH (poc:492-522): (k+1, N) int64 -> (kpl, N) int32."""
    u = acc.astype(np.uint64) + np.uint64(p.offset)
    digs = []
    for row in u:
        for i in range(p.l):
            s = np.uint64(64 - (i + 1) * p.bgbit)
            digs.append(((row >> s) & np.uint64(p.mask_mod)).astype(np.int64)
                        .astype(np.int32) - p.half_bg)
    return np.stack(digs)


def _mul_by_xai_np(a, x):
    """(X^a) * x negacyclic, numpy (matches poly.mul_by_xai)."""
    N = x.shape[-1]
    a = int(a) % (2 * N)
    sign = 1
    if a >= N:
        a -= N
        sign = -1
    out = np.roll(x, a, axis=-1)
    out[..., :a] = -out[..., :a]
    return sign * out


@pytest.fixture(scope="module")
def frng():
    return TfheRng(false_random=True)


@pytest.fixture(scope="module")
def abar(frng):
    """preKS + preModSwitch chain on the dumped input (bit-exact gate)."""
    x1 = i32(EXACT, "input_lvl1.i32")
    in_key = lwe.LweKey(lwe.LweParams(N1), np.ones(N1, np.int32))
    out_key = lwe.LweKey(lwe.LweParams(n0), np.ones(n0, np.int32))
    preks = lwe.KeySwitchKey.generate(in_key, out_key, P.ks10,
                                      TfheRng(false_random=True))
    u0 = np.asarray(lwe.keyswitch(jnp.asarray(x1)[None], preks))[0]
    ab = np.concatenate([
        np.asarray(T.mod_switch_from_torus32(jnp.asarray(u0[:-1]), 2 * N2)),
        np.asarray(T.mod_switch_from_torus32(jnp.asarray(u0[-1:]), 2 * N2))])
    return ab


def test_premodswitch_matches(abar):
    np.testing.assert_array_equal(abar, i32(EXACT, "premodswitch_out.i32"))


@pytest.fixture(scope="module")
def bk(frng):
    """FALSE_RANDOM bootstrapping key (bit 1 for every lvl0 key bit)."""
    ring2 = tlwe.TLweKey(P.lvl2, np.ones((1, N2), np.int32))
    gsw = tgsw.encrypt(ring2, np.ones(n0, np.int32), P.tgsw_lvl2,
                       TfheRng(false_random=True), stdev=P.bk_stdev)
    return np.asarray(tgsw.rows(gsw))             # (n0, kpl, k+1, N2)


def _blind_rotate_poc(bk_rows, abar, mu1):
    """The PATCHED PoC's circuitBootstrapWoKS (poc:530-659): testvect *
    X^{+bbar}, +abar[i] rotation steps, extract + mu2."""
    mu2 = mu1 >> 1
    tv = np.concatenate([np.full(N2 // 2, -mu2, np.int64),
                         np.full(N2 // 2, mu2, np.int64)])
    acc = np.zeros((2, N2), np.int64)
    acc[1] = _mul_by_xai_np(abar[n0], tv)
    oracles = [ExactProductOracle(bk_rows[i]) for i in range(n0)]
    for i in range(n0):
        if abar[i] == 0:
            continue
        acc2 = _mul_by_xai_np(abar[i], acc.copy()) - acc
        acc += oracles[i](_decompose64(acc2, P.tgsw_lvl2))
    # sample extraction (poc:646-648)
    res = np.empty(N2 + 1, np.int64)
    res[0] = acc[0][0]
    res[1:N2] = -acc[0][N2:0:-1]
    res[N2] = acc[1][0] + mu2
    return res


@pytest.fixture(scope="module")
def boots(bk, abar):
    return [_blind_rotate_poc(bk, abar,
                              np.int64(1) << (64 - (w + 1) * BG1))
            for w in range(ELL1)]


def test_blind_rotation_bit_exact(boots):
    """Our composed rotation == the patched reference, bit for bit, at both
    levels (exact Karatsuba build)."""
    for w in range(ELL1):
        ref = i64(EXACT, f"boot_w{w}.i64")
        np.testing.assert_array_equal(boots[w], ref)


def test_blind_rotation_fft_envelope(boots):
    """vs the asm-FFT build.  Raw ciphertext coefficients DIVERGE between
    the builds (the FFT path's per-conv rounding perturbs low accumulator
    bits, so later decompositions see different digits and the masks drift
    apart chaotically — measured ~2^62) while the PHASE, the quantity the
    scheme preserves, stays within the accumulated spqlios rounding
    envelope: measured ~2^44 on the torus64 scale (2^-20 of the torus,
    vs message amplitude mu2 = 2^55).  Assert the phase envelope at 2^45 —
    2x the measured value, so a real noise regression (e.g. 8x the spqlios
    envelope) fails instead of hiding under a loose bound."""
    key = np.ones(N2, np.int64)
    for w in range(ELL1):
        ref = i64(FFT, f"boot_w{w}.i64")
        ph_ours = np.int64(boots[w][-1] - (boots[w][:-1] * key).sum())
        ph_ref = np.int64(ref[-1] - (ref[:-1] * key).sum())
        diff = abs(int(np.int64(ph_ours - ph_ref)))
        assert diff < 1 << 45, hex(diff)


def test_circuit_bootstrap_out_bit_exact(boots, frng):
    """extract + privKS rows == the patched reference's full TGSW32."""
    sk_stub = circuit.CircuitSecretKey(
        P,
        lwe.LweKey(lwe.LweParams(n0), np.ones(n0, np.int32)),
        tlwe.TLweKey(P.lvl1, np.ones((1, N1), np.int32)),
        tlwe.TLweKey(P.lvl2, np.ones((1, N2), np.int32)),
        lwe.LweKey(lwe.LweParams(N1), np.ones(N1, np.int32)))
    pksk = circuit.PrivKeySwitchKey.generate(sk_stub,
                                             TfheRng(false_random=True))
    ref = i32(EXACT, "cb_out.i32").reshape(2, ELL1, 2, N1)
    for w in range(ELL1):
        x64 = jnp.asarray(boots[w])
        for z in range(2):
            ours = np.asarray(circuit.priv_keyswitch(x64, pksk, z))
            np.testing.assert_array_equal(ours, ref[z, w])

"""Chunked-key 64-bit external-product path (the lvl2 circuit-bootstrap hot
loop, poc_CircuitBootstrapping.cpp:580-642, rebuilt as pre-shifted-key MXU
matmuls + i64pair arithmetic).

Layers checked bit-exactly, bottom-up:
  * i64pair primitives vs numpy int64
  * ChunkedEngine.accumulate vs the NaiveEngine oracle (32- and 64-bit,
    plane-split digits, key_limbs truncation)
  * rotate_decompose64 (interpret) vs mul_by_xai_minus_one + decompose_tlwe
  * ck_dot64p (interpret) vs ChunkedEngine._fold_dot
  * the full cmux_pair_step composition vs the generic engine CMux
  * blind_rotate at CB_TOY-scale lvl2 params: chunked backend == naive
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_tpu.params import TGswParams, TLweParams
from tfhe_tpu import tlwe, tgsw
from tfhe_tpu.ops.decomp import decompose_tlwe
from tfhe_tpu.ops.engine import (EngineConfig, ChunkedEngine, NaiveEngine,
                                 _key_rounded)
from tfhe_tpu.ops import i64pair
from tfhe_tpu.ops.pallas_kernels import (rotate_decompose64,
                                         rotate_decompose64_ck, ck_dot64p)


def test_i64pair_primitives():
    r = np.random.default_rng(0)
    x = r.integers(-2**63, 2**63, 5000).astype(np.int64)
    y = r.integers(-2**63, 2**63, 5000).astype(np.int64)
    xl, xh = i64pair.from_i64(jnp.asarray(x))
    yl, yh = i64pair.from_i64(jnp.asarray(y))
    np.testing.assert_array_equal(np.asarray(i64pair.to_i64(xl, xh)), x)
    np.testing.assert_array_equal(
        np.asarray(i64pair.to_i64(*i64pair.add(xl, xh, yl, yh))), x + y)
    np.testing.assert_array_equal(
        np.asarray(i64pair.to_i64(*i64pair.sub(xl, xh, yl, yh))), x - y)
    np.testing.assert_array_equal(
        np.asarray(i64pair.to_i64(*i64pair.neg(xl, xh))), -x)
    c = int(r.integers(0, 2**64, dtype=np.uint64))
    np.testing.assert_array_equal(
        np.asarray(i64pair.to_i64(*i64pair.add_const(xl, xh, c))),
        x + np.uint64(c).astype(np.int64))
    z = r.integers(-2**31, 2**31, 5000).astype(np.int32)
    for s in (0, 5, 16, 24, 31, 32, 40, 56):
        got = np.asarray(i64pair.to_i64(*i64pair.shift_left_i32(
            jnp.asarray(z), s)))
        np.testing.assert_array_equal(got, z.astype(np.int64) << s, err_msg=str(s))
    for bg, sh in [(8, 24), (8, 56), (9, 28), (9, 55), (9, 37)]:
        got = np.asarray(i64pair.extract_digit(xl, xh, sh, bg))
        want = (((x.astype(np.uint64) >> np.uint64(sh))
                 & np.uint64((1 << bg) - 1)).astype(np.int64)
                - (1 << (bg - 1))).astype(np.int32)
        np.testing.assert_array_equal(got, want, err_msg=f"{sh},{bg}")


@pytest.mark.parametrize("N,J,U,bits,dbits,klimbs,m", [
    (128, 4, 2, 64, 8, 0, 32), (128, 8, 2, 64, 9, 6, 64),
    (256, 6, 3, 32, 7, 3, 64), (128, 4, 2, 64, 8, 6, 64)])
def test_chunked_accumulate_vs_naive(N, J, U, bits, dbits, klimbs, m):
    r = np.random.default_rng(0)
    cfg = EngineConfig(N=N, out_bits=bits, digit_bits=dbits, key_limbs=klimbs)
    kdt = np.int32 if bits == 32 else np.int64
    key = r.integers(-2**(bits - 1), 2**(bits - 1), (J, U, N)).astype(kdt)
    x = r.integers(-(1 << (dbits - 1)), 1 << (dbits - 1),
                   (3, J, N)).astype(np.int32)
    ce = ChunkedEngine(cfg, m=m)
    ne = NaiveEngine(cfg)
    got = np.asarray(ce.accumulate(jnp.asarray(x),
                                   ce.prepare(jnp.asarray(key))))
    kr = (np.asarray(_key_rounded(cfg, jnp.asarray(key))).astype(np.int64)
          << cfg.key_shift)
    want = np.asarray(ne.accumulate(jnp.asarray(x),
                                    ne.prepare(jnp.asarray(kr.astype(kdt)))))
    np.testing.assert_array_equal(got, want.astype(got.dtype))


@pytest.mark.parametrize("N,k,l,bgbit", [(128, 1, 4, 9), (128, 1, 5, 8),
                                         (256, 2, 4, 9)])
def test_rotate_decompose64(N, k, l, bgbit):
    r = np.random.default_rng(1)
    p = TGswParams(l=l, bgbit=bgbit,
                   tlwe=TLweParams(N=N, k=k, stdev=0.0, bits=64))
    B = 4
    acc = r.integers(-2**63, 2**63, (B, k + 1, N)).astype(np.int64)
    a = r.integers(0, 2 * N, (B,)).astype(np.int32)
    lo, hi = i64pair.from_i64(jnp.asarray(acc))
    P = 2 if bgbit > 8 else 1
    got = np.asarray(rotate_decompose64(
        jnp.asarray(a), lo, hi, l=l, bgbit=bgbit, offset=p.offset,
        planes=P, tb=B * (k + 1), interpret=True))
    acc2 = tlwe.mul_by_xai_minus_one(jnp.asarray(a), jnp.asarray(acc))
    digs = np.asarray(decompose_tlwe(acc2, p)).reshape(B, k + 1, l, N)
    got = got.reshape(B, k + 1, l, P, N)
    if P == 1:
        np.testing.assert_array_equal(got[..., 0, :], digs)
    else:
        rec = (got[..., 0, :].astype(np.int32)
               + (got[..., 1, :].astype(np.int32) << 7))
        np.testing.assert_array_equal(rec, digs)
        assert np.abs(got[..., 0, :]).max() <= 64


@pytest.mark.parametrize("N,k,l,bgbit,m", [(128, 1, 5, 8, 32),
                                           (128, 1, 4, 9, 64),
                                           (256, 2, 4, 9, 64)])
def test_rotate_decompose64_ck_layout(N, k, l, bgbit, m):
    """The ck-layout emitter == plain emitter re-laid-out."""
    r = np.random.default_rng(5)
    p = TGswParams(l=l, bgbit=bgbit,
                   tlwe=TLweParams(N=N, k=k, stdev=0.0, bits=64))
    B = 4
    acc = r.integers(-2**63, 2**63, (B, k + 1, N)).astype(np.int64)
    a = r.integers(0, 2 * N, (B,)).astype(np.int32)
    P = 2 if bgbit > 8 else 1
    C = N // m
    lo, hi = i64pair.from_i64(jnp.asarray(acc))
    plain = rotate_decompose64(jnp.asarray(a), lo, hi, l=l, bgbit=bgbit,
                               offset=p.offset, planes=P, tb=B * (k + 1),
                               interpret=True)
    # plain: (B*(k+1), l*P, N); target x[b, (c*P+p)*ckp + (u*l+lv)*m + s]
    x = np.asarray(plain).reshape(B, k + 1, l, P, C, m)
    lou, hiu = i64pair.from_i64(jnp.moveaxis(jnp.asarray(acc), -2, 0))
    got = np.asarray(rotate_decompose64_ck(
        jnp.asarray(a), lou, hiu, l=l, bgbit=bgbit, offset=p.offset,
        m=m, planes=P, tb=B, interpret=True))
    ckp = -(-((k + 1) * l * m) // 128) * 128
    got = got.reshape(B, C * P, ckp)
    for u in range(k + 1):
        for lv in range(l):
            for pp in range(P):
                for c in range(C):
                    off = (u * l + lv) * m
                    np.testing.assert_array_equal(
                        got[:, c * P + pp, off:off + m],
                        x[:, u, lv, pp, c, :])


@pytest.mark.parametrize("N,kp1,l,U,L,m,P,lgsize", [
    (128, 2, 2, 2, 3, 32, 1, 2), (128, 2, 2, 2, 4, 64, 2, 2),
    (256, 3, 2, 3, 2, 64, 1, 3)])
def test_ck_dot64p(N, kp1, l, U, L, m, P, lgsize):
    r = np.random.default_rng(2)
    C = N // m
    lm = l * m
    Jm = kp1 * lm
    ckp = -(-Jm // 128) * 128
    B = 8
    x = jnp.asarray(r.integers(-64, 64, (B, C * P * ckp)).astype(np.int8))
    wm = r.integers(-128, 128, (U * L, Jm, N + m)).astype(np.int8)
    got = np.asarray(ck_dot64p(x, jnp.asarray(wm), N=N, m=m, planes=P,
                               tm=8, lgsize=lgsize, interpret=True))
    # reference via ChunkedEngine._fold_dot: xc (P, B, C, Jm)
    xr = np.asarray(x).reshape(B, C, P, ckp)
    xc = np.stack([xr[:, :, p, :Jm] for p in range(P)])   # (P, B, C, Jm)
    cfg = EngineConfig(N=N, out_bits=64, digit_bits=8 if P == 1 else 9)
    ce = ChunkedEngine(cfg, m=m)
    want = np.asarray(ce._fold_dot(jnp.asarray(xc), jnp.asarray(wm)))
    np.testing.assert_array_equal(np.moveaxis(got, 1, 0), want)


@pytest.mark.parametrize("N,k,l,bgbit,klimbs", [(128, 1, 4, 9, 0),
                                                (128, 1, 5, 8, 6)])
def test_cmux_pair_composition(N, k, l, bgbit, klimbs):
    """Full pair-path step (kernels in interpret mode) == generic CMux."""
    r = np.random.default_rng(3)
    p = TGswParams(l=l, bgbit=bgbit, key_limbs=klimbs,
                   tlwe=TLweParams(N=N, k=k, stdev=0.0, bits=64))
    cfg = tgsw.engine_config(p)
    ce = ChunkedEngine(cfg, m=32)
    B = 4
    key = r.integers(-2**40, 2**40, (p.kpl, k + 1, N)).astype(np.int64)
    acc = r.integers(-2**63, 2**63, (B, k + 1, N)).astype(np.int64)
    a = r.integers(0, 2 * N, (B,)).astype(np.int32)
    prep = ce.prepare(jnp.asarray(key))
    acc2 = tlwe.mul_by_xai_minus_one(jnp.asarray(a), jnp.asarray(acc))
    want = np.asarray(jnp.asarray(acc)
                      + ce.accumulate(decompose_tlwe(acc2, p), prep))
    lo, hi = i64pair.from_i64(jnp.moveaxis(jnp.asarray(acc), -2, 0))
    pb, P = cfg.plane_split
    x = rotate_decompose64_ck(jnp.asarray(a), lo, hi, l=l, bgbit=bgbit,
                              offset=p.offset, m=ce.m, planes=P, tb=B,
                              interpret=True)
    UL = (k + 1) * cfg.num_limbs
    y = ck_dot64p(x, prep["wm"], N=N, m=ce.m, planes=P, tm=B,
                  lgsize=2 if UL % 2 == 0 else 1, interpret=True)
    y = y.reshape(k + 1, cfg.num_limbs, B, N)
    zlo = zhi = None
    for lm in range(cfg.num_limbs):
        s = 8 * lm + cfg.key_shift
        plo, phi = i64pair.shift_left_i32(y[:, lm], s)
        zlo, zhi = ((plo, phi) if zlo is None
                    else i64pair.add(zlo, zhi, plo, phi))
    olo, ohi = i64pair.add(lo, hi, zlo, zhi)
    got = np.asarray(jnp.moveaxis(i64pair.to_i64(olo, ohi), 0, -2))
    np.testing.assert_array_equal(got, want)


def test_blind_rotate_chunked_vs_naive():
    """Toy lvl2 blind rotation: chunked backend == naive backend exactly
    (both exact integer paths; generic engine route on CPU)."""
    from tfhe_tpu.boot import blind_rotate as br
    from tfhe_tpu.params import CB_TOY
    r = np.random.default_rng(4)
    p = CB_TOY.tgsw_lvl2
    n = 6
    B = 3
    N = p.tlwe.N
    k = p.tlwe.k
    key = r.integers(-2**50, 2**50, (n, p.kpl, k + 1, N)).astype(np.int64)
    acc = r.integers(-2**63, 2**63, (B, k + 1, N)).astype(np.int64)
    abar = r.integers(0, 2 * N, (B, n)).astype(np.int32)
    outs = {}
    for backend in ("naive", "chunked"):
        eng = tgsw.make_engine(tgsw.engine_config(p), backend)
        prep = jax.lax.map(eng.prepare, jnp.asarray(key))
        outs[backend] = np.asarray(br.blind_rotate(
            jnp.asarray(acc), prep, jnp.asarray(abar), p, backend))
    np.testing.assert_array_equal(outs["chunked"], outs["naive"])


@pytest.mark.parametrize("N,k,l,bgbit,klimbs,m,tm", [
    (128, 1, 3, 7, 3, 32, 4), (256, 1, 3, 7, 0, 64, 8),
    (128, 2, 2, 8, 3, 64, 8)])
def test_ck_cmux_step32(N, k, l, bgbit, klimbs, m, tm):
    """Fused 32-bit chunked CMux (interpret) == rotate+decompose+engine."""
    from tfhe_tpu.ops.pallas_kernels import ck_cmux_step32
    r = np.random.default_rng(6)
    p = TGswParams(l=l, bgbit=bgbit, key_limbs=klimbs,
                   tlwe=TLweParams(N=N, k=k, stdev=0.0, bits=32))
    cfg = tgsw.engine_config(p)
    ce = ChunkedEngine(cfg, m=m)
    B = 8
    key = r.integers(-2**31, 2**31, (p.kpl, k + 1, N)).astype(np.int32)
    acc = r.integers(-2**31, 2**31, (B, k + 1, N)).astype(np.int32)
    a = r.integers(0, 2 * N, (B,)).astype(np.int32)
    prep = ce.prepare(jnp.asarray(key))
    acc2 = tlwe.mul_by_xai_minus_one(jnp.asarray(a), jnp.asarray(acc))
    want = np.asarray(jnp.asarray(acc)
                      + ce.accumulate(decompose_tlwe(acc2, p), prep))
    got = np.asarray(ck_cmux_step32(
        jnp.asarray(a), jnp.asarray(acc), prep["wm"], l=l, bgbit=bgbit,
        offset=p.offset, key_shift=cfg.key_shift, m=m, tm=tm,
        interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("N,k,l,bgbit,klimbs,m,tm", [
    (128, 1, 2, 9, 3, 64, 2),      # plane-split digits (P=2)
    (128, 1, 3, 8, 0, 64, 2),      # single plane, 8 limbs
    (256, 1, 2, 8, 6, 64, 4),      # CB_MXU-like 6-limb key
])
def test_ck_cmux_step64(N, k, l, bgbit, klimbs, m, tm):
    """Fully fused 64-bit chunked CMux (interpret) == generic pair CMux
    (rotate + decompose + engine accumulate + pair recombination)."""
    from tfhe_tpu.ops.pallas_kernels import ck_cmux_step64
    r = np.random.default_rng(8)
    p = TGswParams(l=l, bgbit=bgbit, key_limbs=klimbs,
                   tlwe=TLweParams(N=N, k=k, stdev=0.0, bits=64))
    cfg = tgsw.engine_config(p)
    ce = ChunkedEngine(cfg, m=m)
    B = 4
    key = r.integers(-2**40, 2**40, (p.kpl, k + 1, N)).astype(np.int64)
    acc = r.integers(-2**63, 2**63, (B, k + 1, N)).astype(np.int64)
    a = r.integers(0, 2 * N, (B,)).astype(np.int32)
    prep = ce.prepare(jnp.asarray(key))
    acc2 = tlwe.mul_by_xai_minus_one(jnp.asarray(a), jnp.asarray(acc))
    want = np.asarray(jnp.asarray(acc)
                      + ce.accumulate(decompose_tlwe(acc2, p), prep))
    # flat (B, (k+1)*N) pair layout
    lo, hi = i64pair.from_i64(jnp.asarray(acc).reshape(B, (k + 1) * N))
    pb, P = cfg.plane_split
    olo, ohi = ck_cmux_step64(jnp.asarray(a), lo, hi, prep["wm"], l=l,
                              bgbit=bgbit, offset=p.offset,
                              key_shift=cfg.key_shift, m=m, planes=P,
                              tm=tm, kp1=k + 1, interpret=True)
    got = np.asarray(i64pair.to_i64(olo, ohi)).reshape(B, k + 1, N)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("N,k,l,bgbit,klimbs,m,tm", [
    (128, 1, 5, 8, 6, 32, 2),        # CB_MXU-shaped (P=1)
    (128, 1, 4, 9, 0, 32, 4),        # CB_ACTIVE-shaped (P=2)
])
def test_ck_dot64p_acc_path(N, k, l, bgbit, klimbs, m, tm):
    """Path A (VERDICT r4 item 2): rotate_decompose64_ck_flat +
    ck_dot64p_acc (interpret) == generic pair CMux, bit for bit."""
    from tfhe_tpu.ops.pallas_kernels import (rotate_decompose64_ck_flat,
                                             ck_dot64p_acc)
    r = np.random.default_rng(9)
    p = TGswParams(l=l, bgbit=bgbit, key_limbs=klimbs,
                   tlwe=TLweParams(N=N, k=k, stdev=0.0, bits=64))
    cfg = tgsw.engine_config(p)
    ce = ChunkedEngine(cfg, m=m)
    B = 4
    key = r.integers(-2**40, 2**40, (p.kpl, k + 1, N)).astype(np.int64)
    acc = r.integers(-2**63, 2**63, (B, k + 1, N)).astype(np.int64)
    a = r.integers(0, 2 * N, (B,)).astype(np.int32)
    prep = ce.prepare(jnp.asarray(key))
    acc2 = tlwe.mul_by_xai_minus_one(jnp.asarray(a), jnp.asarray(acc))
    want = np.asarray(jnp.asarray(acc)
                      + ce.accumulate(decompose_tlwe(acc2, p), prep))
    lo, hi = i64pair.from_i64(jnp.asarray(acc).reshape(B, (k + 1) * N))
    pb, P = cfg.plane_split
    x = rotate_decompose64_ck_flat(jnp.asarray(a), lo, hi, N=N, l=l,
                                   bgbit=bgbit, offset=p.offset, m=m,
                                   planes=P, interpret=True)
    # digits must equal the U-major kernel's (shared layout contract)
    xu = rotate_decompose64_ck(
        jnp.asarray(a), *[v.reshape(B, k + 1, N).swapaxes(0, 1)
                          .reshape(k + 1, B, N) for v in (lo, hi)],
        l=l, bgbit=bgbit, offset=p.offset, m=m, planes=P, interpret=True)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(xu))
    olo, ohi = ck_dot64p_acc(x, prep["wm"], lo, hi, N=N, m=m,
                             key_shift=cfg.key_shift, planes=P, tm=tm,
                             kp1=k + 1, interpret=True)
    got = np.asarray(i64pair.to_i64(olo, ohi)).reshape(B, k + 1, N)
    np.testing.assert_array_equal(got, want)
    # streaming-limb variant (path A'): same contract
    from tfhe_tpu.ops.pallas_kernels import ck_dot64p_sacc
    slo, shi = ck_dot64p_sacc(x, prep["wm"], lo, hi, N=N, m=m,
                              key_shift=cfg.key_shift, planes=P, tm=tm,
                              kp1=k + 1, interpret=True)
    got2 = np.asarray(i64pair.to_i64(slo, shi)).reshape(B, k + 1, N)
    np.testing.assert_array_equal(got2, want)

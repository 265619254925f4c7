"""Interpret-mode CI for the Pallas TPU kernels (VERDICT r1 item 5).

Every production kernel of the gate-bootstrap hot path is checked
bit-exactly against the plain-jnp reference composition it replaces, on
CPU via pallas interpret mode, across (N, k, l) shapes including the two
production sets' shapes (GATE_MXU: k=1/N=1024 blocks at reduced N; GATE_MXU2
ratios: k=2).  The same kernels run un-interpreted on hardware by bench.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_tpu.params import TGswParams, TLweParams
from tfhe_tpu import tlwe, tgsw
from tfhe_tpu.ops.decomp import decompose_tlwe
from tfhe_tpu.ops.pallas_kernels import (
    materialize_w, rotate_decompose, mm_recombine_acc,
    fused_cmux_step, fused_cmux_step_v2)


def _params(N, k, l, bgbit, key_limbs=3):
    return TGswParams(l=l, bgbit=bgbit, key_limbs=key_limbs,
                      tlwe=TLweParams(N=N, k=k, stdev=2.0**-25, bits=32))


def _w_reference(v):
    """W[l, (j,t), (u,i)] = v[l,j,u,(i-t) mod 2N] built by plain indexing."""
    L, J, U, twoN = v.shape
    N = twoN // 2
    t = np.arange(N)[:, None]
    i = np.arange(N)[None, :]
    idx = (i - t) % twoN                               # (t, i)
    m = np.asarray(v)[:, :, :, idx]                    # (L, J, U, t, i)
    m = np.transpose(m, (0, 1, 3, 2, 4))               # (L, J, t, U, i)
    return m.reshape(L, J * N, U * N)


@pytest.mark.parametrize("N,J,U,L", [(128, 4, 2, 3), (256, 6, 3, 2),
                                     (128, 2, 1, 1)])
def test_materialize_w(N, J, U, L):
    r = np.random.default_rng(0)
    v = jnp.asarray(r.integers(-128, 128, (L, J, U, 2 * N)).astype(np.int8))
    got = np.asarray(materialize_w(v, rows=64, interpret=True))
    want = _w_reference(v)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("N,k,l,bgbit", [(128, 1, 3, 7), (128, 2, 3, 7),
                                         (256, 1, 2, 8)])
def test_rotate_decompose(N, k, l, bgbit):
    p = _params(N, k, l, bgbit)
    r = np.random.default_rng(1)
    B = 8
    acc = jnp.asarray(r.integers(-2**31, 2**31, (B, k + 1, N)).astype(np.int32))
    a = jnp.asarray(r.integers(0, 2 * N, (B,)).astype(np.int32))
    got = np.asarray(rotate_decompose(a, acc, l=l, bgbit=bgbit,
                                      offset=p.offset, tb=B * (k + 1),
                                      interpret=True))
    want = np.asarray(decompose_tlwe(tlwe.mul_by_xai_minus_one(a, acc), p))
    np.testing.assert_array_equal(got, want.astype(np.int8))


def test_rotate_decompose_zero_exponent_passthrough():
    """a=0 lanes must decompose (X^0-1)*acc = 0 to all-zero digit rows
    (the reference's `if (barai == 0) continue` shortcut, poc:587)."""
    p = _params(128, 1, 3, 7)
    r = np.random.default_rng(5)
    acc = jnp.asarray(r.integers(-2**31, 2**31, (4, 2, 128)).astype(np.int32))
    a = jnp.zeros((4,), jnp.int32)
    got = np.asarray(rotate_decompose(a, acc, l=3, bgbit=7, offset=p.offset,
                                      tb=8, interpret=True))
    np.testing.assert_array_equal(got, 0)


def _recombine_reference(x, w, acc_in, shift_base):
    B = x.shape[0]
    L, K, UN = w.shape
    out = np.asarray(acc_in).reshape(B, UN).copy()
    for lm in range(L):
        y = (np.asarray(x).astype(np.int64) @
             np.asarray(w[lm]).astype(np.int64)).astype(np.int32)
        out += y << (8 * lm + shift_base)
    return out.reshape(np.asarray(acc_in).shape)


@pytest.mark.parametrize("L,shift", [(3, 8), (2, 0), (4, 0)])
def test_mm_recombine_acc(L, shift):
    r = np.random.default_rng(2)
    B, N, J, U = 8, 128, 4, 2
    x = jnp.asarray(r.integers(-64, 64, (B, J * N)).astype(np.int8))
    w = jnp.asarray(r.integers(-128, 128, (L, J * N, U * N)).astype(np.int8))
    acc = jnp.asarray(r.integers(-2**31, 2**31, (B, U, N)).astype(np.int32))
    got = np.asarray(mm_recombine_acc(x, w, acc, shift_base=shift,
                                      tm=B, tn=N, tk=N, interpret=True))
    want = _recombine_reference(x, w, acc, shift)
    np.testing.assert_array_equal(got, want)


def _cmux_reference(a, acc, w, p, key_shift):
    digits = decompose_tlwe(tlwe.mul_by_xai_minus_one(a, acc), p)
    B, kp1, N = acc.shape
    flat = np.asarray(digits).astype(np.int8).reshape(B, -1)
    return _recombine_reference(flat, w, np.asarray(acc).reshape(B, kp1 * N),
                                key_shift).reshape(B, kp1, N)


@pytest.mark.parametrize("N,k,l,L", [(128, 1, 3, 3), (128, 2, 3, 3),
                                     (256, 1, 2, 2)])
@pytest.mark.parametrize("fused", [fused_cmux_step, fused_cmux_step_v2])
def test_fused_cmux_step(N, k, l, L, fused):
    if fused is fused_cmux_step and L != 3:
        pytest.skip("v1 kernel is specialized to L=3 W operands")
    p = _params(N, k, l, 7)
    key_shift = 32 - 8 * L
    r = np.random.default_rng(3)
    B, J = 8, (k + 1) * l
    acc = jnp.asarray(r.integers(-2**31, 2**31, (B, k + 1, N)).astype(np.int32))
    a = jnp.asarray(r.integers(0, 2 * N, (B,)).astype(np.int32))
    w = jnp.asarray(r.integers(-128, 128,
                               (L, J * N, (k + 1) * N)).astype(np.int8))
    got = np.asarray(fused(a, acc, w, l=l, bgbit=p.bgbit, offset=p.offset,
                           key_shift=key_shift, tm=B, interpret=True))
    want = _cmux_reference(a, acc, w, p, key_shift)
    np.testing.assert_array_equal(got, want)


def test_fused_cmux_step_v2_multi_tile():
    """Exercise the cross-tile VPU software pipeline (nb > 1): the digits of
    tile i+1 are built during tile i's MXU cells."""
    N, k, l, L = 128, 1, 3, 3
    p = _params(N, k, l, 7)
    r = np.random.default_rng(4)
    B, J = 32, (k + 1) * l
    acc = jnp.asarray(r.integers(-2**31, 2**31, (B, k + 1, N)).astype(np.int32))
    a = jnp.asarray(r.integers(0, 2 * N, (B,)).astype(np.int32))
    w = jnp.asarray(r.integers(-128, 128,
                               (L, J * N, (k + 1) * N)).astype(np.int8))
    got = np.asarray(fused_cmux_step_v2(a, acc, w, l=l, bgbit=p.bgbit,
                                        offset=p.offset, key_shift=8,
                                        tm=8, interpret=True))
    want = _cmux_reference(a, acc, w, p, 8)
    np.testing.assert_array_equal(got, want)
    # FLAT scan-carry mode: same kernel, (B, (k+1)N) in/out, no reshape
    gotf = np.asarray(fused_cmux_step_v2(
        a, acc.reshape(B, (k + 1) * N), w, l=l, bgbit=p.bgbit,
        offset=p.offset, key_shift=8, tm=8, kp1=k + 1, interpret=True))
    np.testing.assert_array_equal(gotf.reshape(B, k + 1, N), want)


def test_engine_fused_path_matches_accumulate():
    """OnTheFlyMatmulEngine.accumulate_into (production bench path) ==
    acc + accumulate on the same inputs, via interpret-mode kernels."""
    from tfhe_tpu.ops.engine import EngineConfig, make_engine
    if jax.default_backend() == "tpu":
        pytest.skip("interpret comparison is the CPU job")
    N, k, l = 128, 1, 3
    p = _params(N, k, l, 7)
    cfg = tgsw.engine_config(p.tlwe and p)
    eng = make_engine(cfg, "onthefly")
    r = np.random.default_rng(6)
    key = jnp.asarray(
        r.integers(-2**31, 2**31, ((k + 1) * l, k + 1, N)).astype(np.int32))
    prep = eng.prepare(key)
    acc = jnp.asarray(r.integers(-2**31, 2**31, (4, k + 1, N)).astype(np.int32))
    digits = jnp.asarray(
        r.integers(-64, 64, (4, (k + 1) * l, N)).astype(np.int32))
    want = np.asarray(acc + eng.accumulate(digits, prep))
    # fused path is TPU-only in production; emulate it via the same kernels
    # in interpret mode
    v = np.asarray(prep["v"])
    w = jnp.asarray(_w_reference(v))
    flat = digits.astype(jnp.int8).reshape(4, -1)
    got = np.asarray(mm_recombine_acc(flat, w, acc, shift_base=cfg.key_shift,
                                      tm=4, tn=N, tk=N, interpret=True))
    np.testing.assert_array_equal(got, want)

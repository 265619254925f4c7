"""Blind rotation — the bootstrap hot loop (C21 / R4 of SURVEY.md §2).

The reference iterates n sequential CMux steps per ciphertext
(tfhe_blindRotate_FFT, lwe_functions.cpp:337-357; circuitBootstrapWoKS,
poc_CircuitBootstrapping.cpp:580-642).  TPU-native shape:

  * the step loop is a `lax.scan` whose xs stream the per-step prepared
    TRGSW key material from HBM (exactly the streaming the MXU wants);
  * the whole ciphertext batch advances through each step together, so every
    CMux is one large int8 MXU contraction over the batch;
  * the per-ciphertext rotation exponents enter as `jnp.where`-gated static
    rolls (ops.poly.mul_by_xai) — no gathers, no data-dependent control flow;
  * the reference's `if (barai == 0) continue` shortcut is unnecessary:
    digits of (X^0 - 1) * acc = 0 decompose to all-zero rows, so those batch
    lanes pass through unchanged by construction.

NOTE the reference PoC's rotation has a heap out-of-bounds bug for
aibar >= N (poc_CircuitBootstrapping.cpp:596-597 reads acc1[j-aibar] /
acc1[j-aibar+N] — ASan-verified; it behaves as bounded extra noise because
the test vector is antiperiodic).  This implementation uses the
mathematically consistent negacyclic rotation of the library path
(torusPolynomialMulByXaiMinusOne, numeric_functions.cpp:304-323).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tfhe_tpu.params import TGswParams
from tfhe_tpu import tlwe
from tfhe_tpu.ops.decomp import decompose_tlwe
from tfhe_tpu.ops.engine import make_engine
from tfhe_tpu import tgsw


def _pad_batch(B: int) -> int:
    """Fused-kernel batch granule.  TPU batches not a multiple of a tile
    are ineligible for every Pallas CMux kernel and fall through to the
    generic XLA step — measured ~1.9 ms/step vs ~0.9 ms at tile width
    (bench_results/latency_r5.json, the B=1 rows).  Padding junk rows up
    to the granule keeps the scan on the fused kernel.  The granule is
    tm=128 — the calibrated tile (ops/tiles.py) — NOT the nominally
    accepted tm=64: at M=64 the fused kernels collapse ~17-30x (measured
    20.4 s for a padded B=1 GATE_DEFAULT NAND vs 1.2 s unpadded, i.e. the
    64-row dots appear to leave the MXU path), while a 128-row pad runs
    the exact config every production batch uses."""
    return -(-B // 128) * 128


def blind_rotate(acc, bk_prepared, abar, p: TGswParams, backend: str = "matmul",
                 unroll: int = 1):
    """Run the n-step CMux loop.

    acc:         (B, k+1, N) torus accumulator (noiseless test vector).
    bk_prepared: pytree whose leaves have leading axis n (stacked per-step
                 engine-prepared TRGSW of the small-LWE key bits).
    abar:        (B, n) int32 rotation exponents in [0, 2N).
    Returns the rotated accumulator (B, k+1, N).
    """
    import os as _os
    B = acc.shape[0]
    Bp = _pad_batch(B)
    if (Bp != B and _os.environ.get("TFHE_PAD", "1") != "0"
            and (jax.default_backend() == "tpu"
                 or _os.environ.get("TFHE_FORCE_PAD", "") not in ("", "0"))):
        out = blind_rotate(
            jnp.pad(acc, ((0, Bp - B), (0, 0), (0, 0))), bk_prepared,
            jnp.pad(abar, ((0, Bp - B), (0, 0))), p, backend, unroll)
        return out[:B]
    eng = make_engine(tgsw.engine_config(p), backend)
    fused_rotdec = (jax.default_backend() == "tpu" and p.tlwe.bits == 32
                    and p.bgbit <= 8)

    # 64-bit fused path: Torus64 accumulator carried as an (lo, hi) int32
    # pair through the whole scan (ops/i64pair.py) — the TPU has no native
    # s64 — with rotate_decompose64 + ck_dot64 per step (the lvl2 hot loop,
    # poc_CircuitBootstrapping.cpp:580-642).  Probe once outside the scan so
    # the trace takes exactly one path.
    if (p.tlwe.bits == 64 and hasattr(eng, "cmux_pair_step")
            and jax.default_backend() == "tpu"):
        from tfhe_tpu.ops import i64pair
        import os as _os

        # Fully fused single-kernel step (TFHE_CK64_FUSED=1): FLAT pair
        # carry, rotation pipelined under the dots.  Kept opt-in until the
        # scan-level benchmark beats the two-kernel path (the per-kernel
        # timings on the shared dev chip swing +-30%, so only same-process
        # full-scan numbers decide — tools/bench_cb_paths.py).
        # Epilogue-fused two-kernel step (TFHE_CK64_PATH=acc): FLAT pair
        # carry, limb recombination + accumulator add inside the dot
        # kernel (engine.cmux_pair_step_acc).
        _path = _os.environ.get("TFHE_CK64_PATH", "")
        if _path in ("acc", "sacc") \
                and hasattr(eng, f"cmux_pair_step_{_path}"):
            step_m = getattr(eng, f"cmux_pair_step_{_path}")
            B, kp1, N = acc.shape
            lo, hi = i64pair.from_i64(acc.reshape(B, kp1 * N))
            probe = step_m(
                abar[:, 0], lo, hi,
                jax.tree_util.tree_map(lambda v: v[0], bk_prepared),
                kp1=kp1, l=p.l, bgbit=p.bgbit, offset=p.offset)
            if probe is not None:
                def stepa(carry, xs):
                    prep_i, a_i = xs
                    out = step_m(
                        a_i, carry[0], carry[1], prep_i, kp1=kp1, l=p.l,
                        bgbit=p.bgbit, offset=p.offset)
                    return out, None
                carry, _ = lax.scan(stepa, (lo, hi),
                                    (bk_prepared,
                                     jnp.moveaxis(abar, -1, 0)),
                                    unroll=unroll)
                return i64pair.to_i64(*carry).reshape(B, kp1, N)
        if _os.environ.get("TFHE_CK64_FUSED", "") not in ("", "0") \
                and hasattr(eng, "cmux_pair_step_flat"):
            B, kp1, N = acc.shape
            lo, hi = i64pair.from_i64(acc.reshape(B, kp1 * N))
            probe = eng.cmux_pair_step_flat(
                abar[:, 0], lo, hi,
                jax.tree_util.tree_map(lambda v: v[0], bk_prepared),
                kp1=kp1, l=p.l, bgbit=p.bgbit, offset=p.offset)
            if probe is not None:
                def stepf(carry, xs):
                    prep_i, a_i = xs
                    out = eng.cmux_pair_step_flat(
                        a_i, carry[0], carry[1], prep_i, kp1=kp1, l=p.l,
                        bgbit=p.bgbit, offset=p.offset)
                    return out, None
                carry, _ = lax.scan(stepf, (lo, hi),
                                    (bk_prepared,
                                     jnp.moveaxis(abar, -1, 0)),
                                    unroll=unroll)
                return i64pair.to_i64(*carry).reshape(B, kp1, N)
        # U-major carry layout (k+1, B, N): the rotate kernel serves one u
        # per grid cell and the limb-recombination epilogue needs no
        # transpose; converted back once after the scan.
        lo, hi = i64pair.from_i64(jnp.moveaxis(acc, -2, 0))

        def step64(carry, xs):
            prep_i, a_i = xs
            out = eng.cmux_pair_step(a_i, carry, prep_i, l=p.l,
                                     bgbit=p.bgbit, offset=p.offset)
            return out, None

        # eligibility is static (shape/tile-driven): probe once outside the
        # scan; an ineligible shape (e.g. odd batch) falls through to the
        # generic engine path below instead of crashing mid-scan
        probe = eng.cmux_pair_step(
            abar[:, 0], (lo, hi),
            jax.tree_util.tree_map(lambda v: v[0], bk_prepared),
            l=p.l, bgbit=p.bgbit, offset=p.offset)
        if probe is not None:
            carry, _ = lax.scan(step64, (lo, hi),
                                (bk_prepared, jnp.moveaxis(abar, -1, 0)),
                                unroll=unroll)
            return jnp.moveaxis(i64pair.to_i64(*carry), 0, -2)

    # 32-bit chunked engines: carry the accumulator FLAT through the scan
    # (the (B, k+1, N) int32 view tiles with padded sublanes on TPU, so
    # reshaping it inside every step costs ~100 us of relayout copies).
    if (p.tlwe.bits == 32 and hasattr(eng, "cmux_step_flat")
            and jax.default_backend() == "tpu"):
        B, kp1, N = acc.shape

        def step_flat(accf, xs):
            prep_i, a_i = xs
            out = eng.cmux_step_flat(a_i, accf, prep_i, kp1=kp1, l=p.l,
                                     bgbit=p.bgbit, offset=p.offset)
            return out, None

        probe = eng.cmux_step_flat(abar[:, 0], acc.reshape(B, kp1 * N),
                                   jax.tree_util.tree_map(lambda v: v[0],
                                                          bk_prepared),
                                   kp1=kp1, l=p.l, bgbit=p.bgbit,
                                   offset=p.offset)
        if probe is not None:   # eligibility is static; probe is DCE'd
            accf, _ = lax.scan(step_flat, acc.reshape(B, kp1 * N),
                               (bk_prepared, jnp.moveaxis(abar, -1, 0)),
                               unroll=unroll)
            return accf.reshape(B, kp1, N)

    def step(acc, xs):
        prep_i, a_i = xs
        # Whole CMux in one Pallas kernel (rotation pipelined under the
        # MXU dots) when the engine supports this config; decision is
        # static, so the scan body traces exactly one path.
        fused = eng.cmux_step(a_i, acc, prep_i, l=p.l, bgbit=p.bgbit,
                              offset=p.offset)
        if fused is not None:
            return fused, None
        if fused_rotdec:
            from tfhe_tpu.ops.pallas_kernels import rotate_decompose
            digits = rotate_decompose(a_i, acc, l=p.l, bgbit=p.bgbit,
                                      offset=p.offset)
        else:
            acc2 = tlwe.mul_by_xai_minus_one(a_i, acc)
            digits = decompose_tlwe(acc2, p)
        acc = eng.accumulate_into(acc, digits, prep_i)
        return acc, None

    acc, _ = lax.scan(step, acc, (bk_prepared, jnp.moveaxis(abar, -1, 0)),
                      unroll=unroll)
    return acc


def rotate_and_extract(testvect, bk_prepared, barb, bara, p: TGswParams,
                       backend: str = "matmul", unroll: int = 1):
    """testvector * X^{2N - barb}, blind-rotate by bara, extract coefficient 0
    (tfhe_blindRotateAndExtract_FFT, lwe_functions.cpp:366-393).

    testvect: (N,) or (B, N); barb: (B,); bara: (B, n).
    Returns LWE batch (B, k*N + 1).
    """
    N = p.tlwe.N
    tv = jnp.asarray(testvect)
    if tv.ndim == 1:
        tv = jnp.broadcast_to(tv, (barb.shape[0], N))
    from tfhe_tpu.ops import poly
    tv = poly.mul_by_xai((2 * N - barb) % (2 * N), tv)
    acc = tlwe.noiseless_trivial_poly(tv, p.tlwe.k)
    acc = blind_rotate(acc, bk_prepared, bara, p, backend, unroll)
    return tlwe.extract_lwe(acc, 0)

"""Pallas TPU kernels for the negacyclic hot path.

`materialize_w` — builds the per-step negacyclic matmul operand
W[(j,t), (u,l,i)] = doubled_limbs[l,j,u][(i-t) mod 2N] directly in the
layout the MXU matmul consumes, from the O(N) doubled-limb vectors.

Why: the XLA formulation (tile/reshape + relayout inside dot_general) costs
~2.6 ms per blind-rotation step at N=1024/B=4096 — more than the matmul
itself — because the (L,J,U,t,i) -> ((j,t),(u,l,i)) int8 relayout is a
scattered 50 MB transpose.  Here block row t is the doubled vector rolled
right by t, built with ONE strided `pltpu.roll` per sub-block and DMA'd
straight to its final position: sequential writes, no transpose, no gather.

Toolchain notes (jax 0.9.0 + axon remote compile, discovered empirically):
  * ANY pallas_call using a `grid` fails Mosaic lowering ("failed to
    legalize operation 'func.return'"), so the kernel is one gridless
    invocation with a Python-unrolled block loop and explicit async copies
    into an HBM-resident output;
  * the strided rotate only supports 32-bit lanes, hence the widen/narrow
    around the roll;
  * dynamic sub-8 sublane indexing is rejected, hence the pre-rolled
    per-sub-block vector copies (static shifts everywhere).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-VMEM cap is a SOFT 16 MB (round-4 finding: a
# 64 MB-of-blocks kernel runs fine on v5e once the cap is raised), so the
# round-3 tile choices were fighting an artificial wall.  All kernels
# request this cap; ops/tiles.py budgets tiles against the same number.
VMEM_LIMIT = int(os.environ.get("TFHE_VMEM_LIMIT", str(64 * 2**20)))


def _cparams(*semantics):
    return pltpu.CompilerParams(dimension_semantics=semantics,
                                vmem_limit_bytes=VMEM_LIMIT)


def _make_materialize_kernel(J, U, L, nsub, rows, N):
    def kernel(v_ref, out_ref, scratch0, scratch1, sem):
        twoN = v_ref.shape[-1]
        scratches = (scratch0, scratch1)
        blocks = [(j, u, l, r) for j in range(J) for u in range(U)
                  for l in range(L) for r in range(nsub)]
        copies = []
        for q, (j, u, l, r) in enumerate(blocks):
            buf = q % 2
            if q >= 2:
                copies[q - 2].wait()      # scratch[buf] free again
            v = v_ref[(j * U + u) * L + l, r, :]
            v = v.astype(jnp.int32)[None, :]
            block = jnp.broadcast_to(v, (rows, twoN))
            rolled = pltpu.roll(block, jnp.int32(0), axis=1,
                                stride=1, stride_axis=0)
            scratches[buf][:, :] = rolled[:, :N].astype(jnp.int8)
            copy = pltpu.make_async_copy(
                scratches[buf],
                out_ref.at[jnp.int32(l),  # python int = i64 in x64 mode
                           pl.ds(j * N + r * rows, rows),
                           pl.ds(u * N, N)],
                sem.at[jnp.int32(buf)])
            copy.start()
            copies.append(copy)
        for copy in copies[-2:]:
            copy.wait()
    return kernel


def materialize_w(v, *, rows: int = 256, interpret: bool = False):
    """v: (L, J, U, 2N) int8 doubled limb vectors ->
    W: (L, J*N, U*N) int8 with W[l, (j,t), (u,i)] = v[l,j,u,(i-t) mod 2N].

    The limb-major layout lets consumers take clean 3D VMEM blocks
    (L, tk, tn) — Pallas stages 4D mixed blocks whole, which OOMs VMEM."""
    L, J, U, twoN = v.shape
    N = twoN // 2
    rows = min(rows, N)
    nsub = N // rows
    base = jnp.transpose(v, (1, 2, 0, 3)).reshape(J * U * L, twoN)
    # pre-rolled copy r serves block rows [r*rows, (r+1)*rows): row
    # r*rows + s there is roll(v, r*rows + s) = roll(pre-rolled v, s),
    # so the in-kernel strided roll starts from shift 0 (fully static).
    vv = jnp.stack([jnp.roll(base, r * rows, axis=-1) for r in range(nsub)],
                   axis=1)                                  # (JUL, nsub, 2N)

    kernel = _make_materialize_kernel(J, U, L, nsub, rows, N)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((L, J * N, U * N), jnp.int8),
        scratch_shapes=[pltpu.VMEM((rows, N), jnp.int8),
                        pltpu.VMEM((rows, N), jnp.int8),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(vv)


@functools.cache
def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Fused external-product matmul: int8 MXU contraction + limb recombination +
# accumulator add in one kernel.
#
# Motivation (measured on v5e): XLA's int8 dot_general sustains ~200 TOP/s —
# the bf16 rate — while a hand-tiled Pallas matmul reaches ~412 TOP/s, the
# full int8 MXU throughput (tools/pallas_mm_tune.py).  Fusing the limb
# recombination (sum_l y_l << (8l + shift)) and the CMux `acc +=` epilogue
# into the k-loop also removes the (B, U, L, N) int32 intermediate that
# otherwise round-trips HBM every blind-rotation step.
#
# All arithmetic is exact mod 2^32: int8 x int8 products accumulate in
# int32 (bounded by K * 2^14 < 2^31 for K <= 2^16), and the limb shifts /
# adds wrap natively.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Fused (X^a - 1) rotation + gadget decomposition.
#
# XLA executes the 11 bit-gated negacyclic rolls of mul_by_xai as separate
# HBM passes over the (B, k+1, N) accumulator (~1.35 ms/step at B=4096);
# here the accumulator tile is read once, all roll stages and the
# decomposition run in VMEM, and the int8 digit rows stream out (~16 MB).
# ---------------------------------------------------------------------------

def _rotdec_kernel(N, kp1, l, bgbit, offset, nbits):
    half = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1

    def kernel(a_ref, acc_ref, out_ref):
        a = a_ref[:]                                   # (tb2, 1) int32
        x = acc_ref[:]                                 # (tb2, N) int32 rows
        orig = x
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        for w in range(nbits):
            r = 1 << w
            if r < N:
                rolled = pltpu.roll(x, jnp.int32(r), axis=1)
                neg = jnp.where(lane < r, -rolled, rolled)
            else:                                      # X^N = -1
                neg = -x
            bit = ((a >> w) & 1) > 0                   # (tb2, 1)
            x = jnp.where(bit, neg, x)
        u = (x - orig).astype(jnp.uint32) + jnp.uint32(offset)
        for i in range(l):
            s = 32 - (i + 1) * bgbit
            d = ((u >> jnp.uint32(s)) & jnp.uint32(mask)).astype(jnp.int32) - half
            out_ref[:, i, :] = d.astype(jnp.int8)
    return kernel


def rotate_decompose(a, acc, *, l: int, bgbit: int, offset: int,
                     tb: int = 512, interpret: bool = False):
    """digits of (X^a - 1) * acc for a 32-bit TRLWE accumulator batch.

    a: (B,) int32 exponents in [0, 2N); acc: (B, k+1, N) int32.
    Returns (B, (k+1)*l, N) int8 gadget digits, row-major (bloc, level) —
    decompose_tlwe(mul_by_xai_minus_one(a, acc)) fused into one pass.

    Layout: the batch and polynomial axes fold into one sublane-rich row
    axis of (B*(k+1), N) — each row rolls by its own exponent (rows of one
    sample share it), so the VPU sees full (8,128) tiles instead of
    kp1-sublane slivers.  The (B*(k+1), l, N) digit layout is byte-identical
    to the (B, (k+1)*l, N) row-major (bloc, level) order decompose_tlwe
    produces."""
    B, kp1, N = acc.shape
    tb = min(tb, B * kp1)
    assert (B * kp1) % tb == 0
    nbits = (2 * N - 1).bit_length()
    a2 = jnp.repeat(a.astype(jnp.int32), kp1)[:, None]     # (B*kp1, 1)
    out = pl.pallas_call(
        _rotdec_kernel(N, kp1, l, bgbit, offset, nbits),
        grid=(B * kp1 // tb,),
        in_specs=[  # i - i: typed zero (literal 0 is i64 under x64)
            pl.BlockSpec((tb, 1), lambda i: (i, i - i)),
            pl.BlockSpec((tb, N), lambda i: (i, i - i)),
        ],
        out_specs=pl.BlockSpec((tb, l, N), lambda i: (i, i - i, i - i)),
        out_shape=jax.ShapeDtypeStruct((B * kp1, l, N), jnp.int8),
        compiler_params=_cparams("parallel"),
        interpret=interpret,
    )(a2, acc.reshape(B * kp1, N))
    return out.reshape(B, kp1 * l, N)


# ---------------------------------------------------------------------------
# Fully fused CMux step: rotation + decomposition + limb matmul + recombine +
# accumulator add in ONE kernel, with the VPU work (rolls / digit extraction
# for the NEXT polynomial) software-pipelined against the MXU dots of the
# current one.
#
# Motivation (measured, GATE_MXU2 shapes, B=4096): as separate kernels the
# rotate/decompose costs ~440 us and the matmul ~510 us per blind-rotation
# step — the TensorCore runs them serially.  Inside one kernel Mosaic can
# interleave the independent VPU and MXU instruction streams, so the step
# approaches max(VPU, MXU) instead of their sum.
#
# Schedule: grid (i, k, j) = (batch tile, digit chunk = (in-poly u, level),
# output poly).  The window of l*(k+1) blocks that dots poly u's digit chunks
# also executes, spread one-or-two "units" per block, the rotation pipeline
# (seed, 9 cyclic rolls, sign fixup, l digit extractions) of poly u+1 — and,
# on the last window of a tile, of the NEXT tile's poly 0 (its accumulator
# rows and exponents are streamed in as a second, +1-shifted input).  Digit
# chunks live in two VMEM buffers ping-ponged by global poly parity, so the
# dot of poly g and the extraction of poly g+1 touch different refs and
# Mosaic sees no false dependency.
# ---------------------------------------------------------------------------


def _fused_cmux_kernel(N, kp1, l, L, bgbit, offset, key_shift, nb,
                       skip_vpu=False):
    J = kp1 * l
    nbits = (N - 1).bit_length()               # cyclic-roll stages (mod N)
    half = 1 << (bgbit - 1)
    dmask = (1 << bgbit) - 1
    slots = l * kp1                            # blocks per poly window
    n_units = 1 + nbits + 1 + l                # seed, rolls, sign, extracts
    unit_slot = [min(q * slots // n_units, slots - 1) for q in range(n_units)]

    def kernel(acur_ref, anext_ref, acc_ref, accn_ref, w_ref, out_ref,
               rot_ref, orig_ref, arot_ref, dig0_ref, dig1_ref):
        i = pl.program_id(0)
        k = pl.program_id(1)
        j = pl.program_id(2)
        u = jax.lax.div(k, jnp.int32(l))       # k // l without an i64 const
        kl = k - u * l                         # level within the chunk
        g = i * kp1 + u                        # global poly counter
        p = kl * kp1 + j                       # slot within poly-u's window

        digs = (dig0_ref, dig1_ref)

        def unit_seed(next_tile):
            # stage the rotation source: poly (u+1) of this tile, or poly 0
            # of the next tile (clamped at the end; the waste is never read)
            if next_tile:
                src = accn_ref[:, pl.ds(0, N)]
                arot_ref[:, :] = anext_ref[:]
            else:
                tgt = u + 1    # only called when u < kp1-1
                src = acc_ref[:, pl.ds(tgt * N, N)]
                arot_ref[:, :] = acur_ref[:]
            orig_ref[:, :] = src
            rot_ref[:, :] = src

        def unit_roll(w):
            r = 1 << w
            rolled = pltpu.roll(rot_ref[:], jnp.int32(r), axis=1)
            bit = ((arot_ref[:] >> w) & 1) > 0
            rot_ref[:, :] = jnp.where(bit, rolled, rot_ref[:])

        def unit_sign():
            x = rot_ref[:]
            aN = arot_ref[:] & jnp.int32(N - 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            hi = (arot_ref[:] >> jnp.int32(nbits)) & 1
            neg = (lane < aN).astype(jnp.int32) ^ hi
            rot_ref[:, :] = jnp.where(neg > 0, -x, x)

        def unit_extract(lv, wbuf):
            d32 = (rot_ref[:] - orig_ref[:]).astype(jnp.uint32) + jnp.uint32(offset)
            s = 32 - (lv + 1) * bgbit
            d = ((d32 >> jnp.uint32(s)) & jnp.uint32(dmask)).astype(jnp.int32) - half
            wbuf[:, pl.ds(lv * N, N)] = d.astype(jnp.int8)

        def run_unit(q, wbuf, next_tile):
            if q == 0:
                unit_seed(next_tile)
            elif q <= nbits:
                unit_roll(q - 1)
            elif q == nbits + 1:
                unit_sign()
            else:
                unit_extract(q - nbits - 2, wbuf)

        if skip_vpu:                      # timing probe: MXU path only
            i, k, j, u, kl, g, p = i, k, j, u, kl, g, p
        # ----- prologue: tile 0 / poly 0 built in full before the first dot
        @pl.when((jnp.int32(0 if not skip_vpu else 1) == 0)
                 & (i == 0) & (k == 0) & (j == 0))
        def _():
            orig_ref[:, :] = acc_ref[:, pl.ds(0, N)]
            rot_ref[:, :] = acc_ref[:, pl.ds(0, N)]
            arot_ref[:, :] = acur_ref[:]
            for w in range(nbits):
                unit_roll(w)
            unit_sign()
            for lv in range(l):
                unit_extract(lv, dig0_ref)

        # ----- pipelined units for poly g+1 (ping-pong write buffer)
        for wb in range(2 if not skip_vpu else 0):
            wbuf = digs[wb]
            for nxt in range(2):
                @pl.when((((g + 1) & 1) == wb)
                         & ((u == kp1 - 1) == (nxt == 1)))
                def _(wb=wb, nxt=nxt, wbuf=wbuf):
                    for ps in range(slots):
                        @pl.when(p == ps)
                        def _(ps=ps, wbuf=wbuf, nxt=nxt):
                            for q in range(n_units):
                                if unit_slot[q] == ps:
                                    run_unit(q, wbuf, next_tile=(nxt == 1))

        # ----- MXU: dot this chunk against all key limbs, recombine, add
        for rb in range(2):
            @pl.when((g & 1) == rb)
            def _(rb=rb):
                x = digs[rb][:, pl.ds(kl * N, N)]
                part = None
                for lm in range(L):
                    y = jnp.dot(x, w_ref[lm], preferred_element_type=jnp.int32)
                    sh = 8 * lm + key_shift
                    y = y << sh if sh else y
                    part = y if part is None else part + y
                js = pl.ds(j * N, N)

                @pl.when(k == 0)
                def _():
                    out_ref[:, js] = acc_ref[:, js] + part

                @pl.when(k != 0)
                def _():
                    out_ref[:, js] = out_ref[:, js] + part
    return kernel


def fused_cmux_step(a, acc, w, *, l: int, bgbit: int, offset: int,
                    key_shift: int = 0, tm: int = 256, _skip_vpu: bool = False,
                    interpret: bool = False):
    """One blind-rotation step, fully fused:

        out = acc + recombine(decompose((X^a - 1) * acc) @ w)

    a:   (B,) int32 exponents in [0, 2N)
    acc: (B, k+1, N) int32 TRLWE accumulator batch
    w:   (L, (k+1)*l*N, (k+1)*N) int8 key limb matrices (materialize_w layout)
    Returns (B, k+1, N) int32.
    """
    B, kp1, N = acc.shape
    L, K, UN = w.shape
    J = kp1 * l
    assert K == J * N and UN == kp1 * N and B % tm == 0
    nb = B // tm
    a2 = a.astype(jnp.int32)[:, None]
    out = pl.pallas_call(
        _fused_cmux_kernel(N, kp1, l, L, bgbit, offset, key_shift, nb,
                           skip_vpu=_skip_vpu),
        grid=(nb, J, kp1),
        in_specs=[  # i - i: typed zero (literal 0 is i64 under x64)
            pl.BlockSpec((tm, 1), lambda i, k, j: (i, i - i)),
            pl.BlockSpec((tm, 1), lambda i, k, j: (jnp.minimum(i + 1, nb - 1), i - i)),
            pl.BlockSpec((tm, kp1 * N), lambda i, k, j: (i, i - i)),
            pl.BlockSpec((tm, kp1 * N), lambda i, k, j: (jnp.minimum(i + 1, nb - 1), i - i)),
            pl.BlockSpec((L, N, N), lambda i, k, j: (i - i, k, j)),
        ],
        out_specs=pl.BlockSpec((tm, kp1 * N), lambda i, k, j: (i, i - i)),
        out_shape=jax.ShapeDtypeStruct((B, kp1 * N), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tm, N), jnp.int32),      # rot
            pltpu.VMEM((tm, N), jnp.int32),      # orig
            pltpu.VMEM((tm, 1), jnp.int32),      # arot
            pltpu.VMEM((tm, l * N), jnp.int8),   # dig ping
            pltpu.VMEM((tm, l * N), jnp.int8),   # dig pong
        ],
        compiler_params=_cparams("arbitrary", "arbitrary", "arbitrary"),
        interpret=interpret,
    )(a2, a2, acc.reshape(B, kp1 * N), acc.reshape(B, kp1 * N), w)
    return out.reshape(B, kp1, N)


# ---------------------------------------------------------------------------
# Fused CMux step v2.
#
# Lessons from v1 (measured, GATE_MXU2 shapes, B=4096 on v5e):
#   * 3D (L, N, N) W blocks + tn=N-wide dots ran the MXU at ~160 TOP/s
#     (1042 us/step with the VPU path compiled out);
#   * the same contraction as three separate 2D (tk, UN) operands with
#     full-UN-wide dots sustains ~340 TOP/s (tools/mm_recombine_tune2.py),
#     i.e. MXU speed-of-light for the 3-limb int8 contraction is ~511 us.
#
# v2 therefore uses grid (batch tile i, digit chunk c), c in [0, (k+1)*l):
# each cell dots the current tile's digit chunk c against the three limb
# matrices' row-block c at full output width, while a software pipeline
# spread over the cells runs the rotation/decomposition (seed, 9 cyclic
# rolls, sign fixup, l digit extracts, per accumulator polynomial) of the
# NEXT batch tile into a ping-pong digit buffer.  One tile's VPU work is
# (k+1)*(2+log2(N)+l) ~ 42 vector passes vs 9 MXU cells of ~3.5 us each, so
# the VPU stream fits under the MXU stream when Mosaic interleaves them.
# ---------------------------------------------------------------------------


def _fused_cmux_v2_kernel(N, kp1, l, L, bgbit, offset, key_shift, nb,
                          skip_vpu=False):
    J = kp1 * l
    nbits = (N - 1).bit_length()               # cyclic-roll stages (mod N)
    half = 1 << (bgbit - 1)
    dmask = (1 << bgbit) - 1
    n_units = kp1 * (2 + nbits + l)            # full tile rotation pipeline
    # unit q runs in cell `unit_cell[q]`; spread as evenly as possible
    unit_cell = [min(q * J // n_units, J - 1) for q in range(n_units)]

    def kernel(acur_ref, anext_ref, acc_ref, accn_ref, *rest):
        w_refs = rest[:L]                  # exactly L operands (no padding)
        out_ref = rest[L]
        rot_ref, orig_ref, arot_ref, dig0_ref, dig1_ref, s_ref = rest[L + 1:]
        i = pl.program_id(0)
        c = pl.program_id(1)
        digs = (dig0_ref, dig1_ref)

        # ---- VPU pipeline units (build tile `src`'s digits into `wbuf`) --
        def unit_seed(u, next_tile):
            src = accn_ref if next_tile else acc_ref
            orig_ref[:, :] = src[:, pl.ds(u * N, N)]
            rot_ref[:, :] = src[:, pl.ds(u * N, N)]
            arot_ref[:, :] = anext_ref[:] if next_tile else acur_ref[:]

        def unit_roll(w):
            r = 1 << w
            rolled = pltpu.roll(rot_ref[:], jnp.int32(r), axis=1)
            bit = ((arot_ref[:] >> w) & 1) > 0
            rot_ref[:, :] = jnp.where(bit, rolled, rot_ref[:])

        def unit_sign():
            x = rot_ref[:]
            aN = arot_ref[:] & jnp.int32(N - 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            hi = (arot_ref[:] >> jnp.int32(nbits)) & 1
            neg = (lane < aN).astype(jnp.int32) ^ hi
            rot_ref[:, :] = jnp.where(neg > 0, -x, x)

        def unit_extract(u, lv, wbuf):
            d32 = (rot_ref[:] - orig_ref[:]).astype(jnp.uint32) + jnp.uint32(offset)
            s = 32 - (lv + 1) * bgbit
            d = ((d32 >> jnp.uint32(s)) & jnp.uint32(dmask)).astype(jnp.int32) - half
            wbuf[:, pl.ds((u * l + lv) * N, N)] = d.astype(jnp.int8)

        def run_unit(q, wbuf, next_tile):
            u, uq = q // (2 + nbits + l), q % (2 + nbits + l)
            if uq == 0:
                unit_seed(u, next_tile)
            elif uq <= nbits:
                unit_roll(uq - 1)
            elif uq == nbits + 1:
                unit_sign()
            else:
                unit_extract(u, uq - nbits - 2, wbuf)

        if not skip_vpu:
            # prologue: tile 0's digits built whole before its first dot
            @pl.when((i == 0) & (c == 0))
            def _():
                for q in range(n_units):
                    run_unit(q, dig0_ref, next_tile=False)

            # steady state: next tile's digits, spread over this tile's cells
            for wb in range(2):
                @pl.when(((i + 1) & 1) == wb)
                def _(wb=wb):
                    for cc in range(J):
                        @pl.when(c == cc)
                        def _(cc=cc, wb=wb):
                            for q in range(n_units):
                                if unit_cell[q] == cc:
                                    run_unit(q, digs[wb], next_tile=True)

        # ---- MXU: digit chunk c x three limb row-blocks, full width ------
        for rb in range(2):
            @pl.when((i & 1) == rb)
            def _(rb=rb):
                x = digs[rb][:, pl.ds(c * N, N)]
                part = None
                for lm, wr in enumerate(w_refs):
                    y = jnp.dot(x, wr[:], preferred_element_type=jnp.int32)
                    sh = 8 * lm + key_shift
                    y = y << sh if sh else y
                    part = y if part is None else part + y

                @pl.when(c == 0)
                def _():
                    s_ref[:, :] = acc_ref[:] + part

                @pl.when(c != 0)
                def _():
                    s_ref[:, :] = s_ref[:] + part

        @pl.when(c == J - 1)
        def _():
            out_ref[:, :] = s_ref[:]
    return kernel


def fused_cmux_step_v2(a, acc, w, *, l: int, bgbit: int, offset: int,
                       key_shift: int = 0, tm: int = 256, kp1: int = None,
                       _skip_vpu: bool = False, interpret: bool = False):
    """One blind-rotation step, fully fused (v2 schedule):

        out = acc + recombine(decompose((X^a - 1) * acc) @ w)

    a:   (B,) int32 exponents in [0, 2N)
    acc: (B, k+1, N) int32 TRLWE accumulator batch — or, with kp1 given,
         the FLAT (B, (k+1)*N) scan-carry layout (no reshape in the scan
         body: the 3-D view's padded-sublane tiling makes XLA relayout
         the while carry around the custom call, ~100 us/step measured
         on the GATE_FAST2 adder trace, circuit_adder32_trace_r5.json)
    w:   (L, (k+1)*l*N, (k+1)*N) int8 key limb matrices (materialize_w
         layout); L <= 3.
    Returns the same layout it was given.
    """
    flat = acc.ndim == 2
    if flat:
        assert kp1 is not None
        B, N = acc.shape[0], acc.shape[1] // kp1
    else:
        B, kp1, N = acc.shape
    L, K, UN = w.shape
    J = kp1 * l
    assert K == J * N and UN == kp1 * N and B % tm == 0 and L <= 3
    nb = B // tm
    a2 = a.astype(jnp.int32)[:, None]
    ws = [w[lm] for lm in range(L)]
    out = pl.pallas_call(
        _fused_cmux_v2_kernel(N, kp1, l, L, bgbit, offset, key_shift, nb,
                              skip_vpu=_skip_vpu),
        grid=(nb, J),
        in_specs=[  # i - i: typed zero (literal 0 is i64 under x64)
            pl.BlockSpec((tm, 1), lambda i, c: (i, i - i)),
            pl.BlockSpec((tm, 1), lambda i, c: (jnp.minimum(i + 1, nb - 1), i - i)),
            pl.BlockSpec((tm, kp1 * N), lambda i, c: (i, i - i)),
            pl.BlockSpec((tm, kp1 * N), lambda i, c: (jnp.minimum(i + 1, nb - 1), i - i)),
        ] + [
            pl.BlockSpec((N, UN), lambda i, c: (c, i - i))
            for _ in range(L)
        ],
        out_specs=pl.BlockSpec((tm, kp1 * N), lambda i, c: (i, i - i)),
        out_shape=jax.ShapeDtypeStruct((B, kp1 * N), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tm, N), jnp.int32),          # rot
            pltpu.VMEM((tm, N), jnp.int32),          # orig
            pltpu.VMEM((tm, 1), jnp.int32),          # arot
            pltpu.VMEM((tm, J * N), jnp.int8),       # dig ping
            pltpu.VMEM((tm, J * N), jnp.int8),       # dig pong
            pltpu.VMEM((tm, kp1 * N), jnp.int32),    # output accumulator
        ],
        compiler_params=_cparams("arbitrary", "arbitrary"),
        interpret=interpret,
    )(a2, a2, acc.reshape(B, kp1 * N), acc.reshape(B, kp1 * N), *ws)
    return out if flat else out.reshape(B, kp1, N)


# ---------------------------------------------------------------------------
# 64-bit (lvl2 / Torus64) blind-rotation kernels — the circuit-bootstrap hot
# loop (poc_CircuitBootstrapping.cpp:580-642) on the MXU.
#
# The TPU has no native s64 datapath and Mosaic rejects s64 entirely, so the
# Torus64 accumulator lives as an explicit (lo, hi) int32 pair
# (ops/i64pair.py): rotation, 64-bit subtract, gadget-offset add and digit
# extraction are all int32/uint32 with explicit carries/borrows.
#
# The external product uses CHUNKED PRE-SHIFTED KEYS instead of the 32-bit
# path's per-step Toeplitz materialization (materialize_w): at keygen time
# every key limb polynomial is stored as m acyclically-shifted copies
#     Wm[u, l, (j, s), q] = limb[l, j, u, q - s]   (0 <= s < m, width N+m)
# so one blind-rotation step is C = N/m ordinary int8 MXU matmuls
#     y_c = digits[:, c*m : (c+1)*m over all j] @ Wm      (tm, N+m)
# accumulated at STATIC offset c*m into a (tm, 2N) ring scratch (a chunk
# never wraps: c*m + N + m <= 2N), folded once at the end with X^N = -1:
#     out = ring[:, :N] - ring[:, N:].
# This trades m-fold key-memory blowup (n * U*L*J*m*(N+m) int8, ~8 GB for
# CB_MXU at m=64) for zero per-step key preprocessing and full-width MXU
# dots; HBM per step is just the Wm stream (16 MB) + digits + accumulator.
# ---------------------------------------------------------------------------


def _i32(v: int):
    """Python int (possibly >= 2^31 as unsigned) -> int32 constant."""
    v &= 0xFFFFFFFF
    return jnp.int32(v - (1 << 32) if v >= (1 << 31) else v)


def _rotdec64_kernel(N, l, bgbit, offset, nbits, planes):
    half = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1
    off_lo = offset & 0xFFFFFFFF
    off_hi = (offset >> 32) & 0xFFFFFFFF

    def kernel(a_ref, lo_ref, hi_ref, out_ref):
        a = a_ref[:]                                   # (tb, 1) int32
        lo, hi = lo_ref[:], hi_ref[:]                  # (tb, N) int32 rows
        olo, ohi = lo, hi
        lane = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 1)
        for w in range(nbits):
            r = 1 << w
            if r < N:
                rlo = pltpu.roll(lo, jnp.int32(r), axis=1)
                rhi = pltpu.roll(hi, jnp.int32(r), axis=1)
                wrap = lane < r
                nlo = jnp.where(wrap, -rlo, rlo)
                nhi = jnp.where(wrap, ~rhi + (rlo == 0).astype(jnp.int32), rhi)
            else:                                      # X^N = -1: negate all
                nlo = -lo
                nhi = ~hi + (lo == 0).astype(jnp.int32)
            bit = ((a >> w) & 1) > 0
            lo = jnp.where(bit, nlo, lo)
            hi = jnp.where(bit, nhi, hi)
        # d = rot - orig (64-bit subtract with borrow)
        borrow = (lo.astype(jnp.uint32) < olo.astype(jnp.uint32)).astype(jnp.int32)
        dlo = lo - olo
        dhi = hi - ohi - borrow
        # + gadget offset (64-bit constant add with carry)
        slo = dlo + _i32(off_lo)
        carry = (slo.astype(jnp.uint32) < jnp.uint32(off_lo)).astype(jnp.int32)
        shi = dhi + _i32(off_hi) + carry
        ulo, uhi = slo.astype(jnp.uint32), shi.astype(jnp.uint32)
        for lv in range(l):
            s = 64 - (lv + 1) * bgbit
            if s >= 32:
                v = uhi >> jnp.uint32(s - 32)
            elif s + bgbit <= 32:
                v = ulo >> jnp.uint32(s)
            else:                                      # straddles the words
                v = (ulo >> jnp.uint32(s)) | (uhi << jnp.uint32(32 - s))
            d = (v & jnp.uint32(mask)).astype(jnp.int32) - half
            if planes == 1:
                out_ref[:, lv, :] = d.astype(jnp.int8)
            else:                                      # balanced base-2^7
                p0 = ((d + 64) & 127) - 64
                p1 = (d - p0) >> 7
                out_ref[:, 2 * lv, :] = p0.astype(jnp.int8)
                out_ref[:, 2 * lv + 1, :] = p1.astype(jnp.int8)
    return kernel


def rotate_decompose64(a, acc_lo, acc_hi, *, l: int, bgbit: int, offset: int,
                       planes: int = 1, tb: int = 256,
                       interpret: bool = False):
    """Digits of (X^a - 1) * acc for a Torus64 TRLWE accumulator pair.

    a: (B,) int32 exponents in [0, 2N); acc_lo/acc_hi: (B, k+1, N) int32
    (i64pair representation).  Returns (B*(k+1), l*planes, N) int8 digit
    planes, (level, plane)-major — the 64-bit analog of rotate_decompose,
    matching tGswTorus64PolynomialDecompH digit semantics
    (poc_CircuitBootstrapping.cpp:492-515) with plane-split digits when
    bgbit > 8 (planes=2: balanced base-2^7, digit = p0 + 128*p1)."""
    B, kp1, N = acc_lo.shape
    rows = B * kp1
    tb = min(tb, rows)
    assert rows % tb == 0
    assert planes in (1, 2)
    nbits = (2 * N - 1).bit_length()
    a2 = jnp.repeat(a.astype(jnp.int32), kp1)[:, None]     # (rows, 1)
    return pl.pallas_call(
        _rotdec64_kernel(N, l, bgbit, offset, nbits, planes),
        grid=(rows // tb,),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i: (i, i - i)),
            pl.BlockSpec((tb, N), lambda i: (i, i - i)),
            pl.BlockSpec((tb, N), lambda i: (i, i - i)),
        ],
        out_specs=pl.BlockSpec((tb, l * planes, N),
                               lambda i: (i, i - i, i - i)),
        out_shape=jax.ShapeDtypeStruct((rows, l * planes, N), jnp.int8),
        compiler_params=_cparams("parallel"),
        interpret=interpret,
    )(a2, acc_lo.reshape(rows, N), acc_hi.reshape(rows, N))


def _rotdec64_ck_kernel(N, kp1, l, bgbit, offset, nbits, planes, m, ckp):
    half = 1 << (bgbit - 1)
    mask = (1 << bgbit) - 1
    off_lo = offset & 0xFFFFFFFF
    off_hi = (offset >> 32) & 0xFFFFFFFF
    C = N // m

    def kernel(a_ref, lo_ref, hi_ref, out_ref):
        u = pl.program_id(1)
        a = a_ref[:]
        lo, hi = lo_ref[:], hi_ref[:]
        olo, ohi = lo, hi
        lane = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 1)
        for w in range(nbits):
            r = 1 << w
            if r < N:
                rlo = pltpu.roll(lo, jnp.int32(r), axis=1)
                rhi = pltpu.roll(hi, jnp.int32(r), axis=1)
                wrap = lane < r
                nlo = jnp.where(wrap, -rlo, rlo)
                nhi = jnp.where(wrap, ~rhi + (rlo == 0).astype(jnp.int32), rhi)
            else:                                      # X^N = -1: negate all
                nlo = -lo
                nhi = ~hi + (lo == 0).astype(jnp.int32)
            bit = ((a >> w) & 1) > 0
            lo = jnp.where(bit, nlo, lo)
            hi = jnp.where(bit, nhi, hi)
        borrow = (lo.astype(jnp.uint32) < olo.astype(jnp.uint32)).astype(jnp.int32)
        dlo = lo - olo
        dhi = hi - ohi - borrow
        slo = dlo + _i32(off_lo)
        carry = (slo.astype(jnp.uint32) < jnp.uint32(off_lo)).astype(jnp.int32)
        shi = dhi + _i32(off_hi) + carry
        ulo, uhi = slo.astype(jnp.uint32), shi.astype(jnp.uint32)

        def store(lv, p, d8):
            for uu in range(kp1):          # one real write per grid cell
                @pl.when(u == uu)
                def _(uu=uu):
                    for c in range(C):
                        off = (c * planes + p) * ckp + (uu * l + lv) * m
                        out_ref[:, off:off + m] = d8[:, c * m:(c + 1) * m]

        for lv in range(l):
            s = 64 - (lv + 1) * bgbit
            if s >= 32:
                v = uhi >> jnp.uint32(s - 32)
            elif s + bgbit <= 32:
                v = ulo >> jnp.uint32(s)
            else:
                v = (ulo >> jnp.uint32(s)) | (uhi << jnp.uint32(32 - s))
            d = (v & jnp.uint32(mask)).astype(jnp.int32) - half
            if planes == 1:
                store(lv, 0, d.astype(jnp.int8))
            else:                                      # balanced base-2^7
                p0 = ((d + 64) & 127) - 64
                p1 = (d - p0) >> 7
                store(lv, 0, p0.astype(jnp.int8))
                store(lv, 1, p1.astype(jnp.int8))
    return kernel


def rotate_decompose64_ck(a, acc_lo, acc_hi, *, l: int, bgbit: int,
                          offset: int, m: int, planes: int = 1,
                          tb: int = 256, interpret: bool = False):
    """rotate_decompose64 emitting digits DIRECTLY in ck_dot64's chunk
    layout — no XLA transpose between the kernels (measured 127 us/step of
    pure layout copies at CB_MXU/B=256).

    acc_lo/acc_hi: (k+1, B, N) int32 — the U-MAJOR pair layout the 64-bit
    scan carries; each grid cell serves one u and both cells interleave
    their writes into ONE digit array.  Returns (B, C*planes*ckp) int8
    where ckp = (k+1)*l*m rounded up to a lane tile; chunk (c, p) holds
    the full contraction operand (j=(u,level), s)-major at columns
    [(c*planes+p)*ckp, +(k+1)*l*m) — one K=J*m MXU dot per chunk.
    All refs stay rank-2: Mosaic rejects narrow (sub-128-lane) stores into
    higher-rank blocks (vector reshape (tb,m)->(tb,1,m) fails to lower)
    but takes the same store into a 2-D ref at 64-multiple offsets."""
    kp1, B, N = acc_lo.shape
    tb = min(tb, B)
    assert B % tb == 0 and N % m == 0
    assert planes in (1, 2)
    C = N // m
    nbits = (2 * N - 1).bit_length()
    nb = B // tb
    ckp = -(-(kp1 * l * m) // 128) * 128
    a2 = a.astype(jnp.int32)[:, None]                       # (B, 1)
    out = pl.pallas_call(
        _rotdec64_ck_kernel(N, kp1, l, bgbit, offset, nbits, planes, m, ckp),
        grid=(nb, kp1),        # u INNER: the out block stays resident
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i, u: (i, u - u)),
            pl.BlockSpec((tb, N), lambda i, u: (u * nb + i, u - u)),
            pl.BlockSpec((tb, N), lambda i, u: (u * nb + i, u - u)),
        ],
        out_specs=pl.BlockSpec((tb, C * planes * ckp),
                               lambda i, u: (i, u - u)),
        out_shape=jax.ShapeDtypeStruct((B, C * planes * ckp), jnp.int8),
        compiler_params=_cparams("arbitrary", "arbitrary"),
        interpret=interpret,
    )(a2, acc_lo.reshape(kp1 * B, N), acc_hi.reshape(kp1 * B, N))
    return out


def rotate_decompose64_ck_flat(a, lo_flat, hi_flat, *, N: int, l: int,
                               bgbit: int, offset: int, m: int,
                               planes: int = 1, tb: int = 256,
                               interpret: bool = False):
    """rotate_decompose64_ck on the FLAT (B, (k+1)*N) pair layout: the same
    (tb, N) accumulator blocks are addressed as column tiles of the flat
    array, so neither layout pays a relayout.  Digit output is identical."""
    B, kpN = lo_flat.shape
    kp1 = kpN // N
    tb = min(tb, B)
    assert B % tb == 0 and N % m == 0
    assert planes in (1, 2)
    C = N // m
    nbits = (2 * N - 1).bit_length()
    nb = B // tb
    ckp = -(-(kp1 * l * m) // 128) * 128
    a2 = a.astype(jnp.int32)[:, None]                       # (B, 1)
    return pl.pallas_call(
        _rotdec64_ck_kernel(N, kp1, l, bgbit, offset, nbits, planes, m, ckp),
        grid=(nb, kp1),        # u INNER: the out block stays resident
        in_specs=[
            pl.BlockSpec((tb, 1), lambda i, u: (i, u - u)),
            pl.BlockSpec((tb, N), lambda i, u: (i, u)),
            pl.BlockSpec((tb, N), lambda i, u: (i, u)),
        ],
        out_specs=pl.BlockSpec((tb, C * planes * ckp),
                               lambda i, u: (i, u - u)),
        out_shape=jax.ShapeDtypeStruct((B, C * planes * ckp), jnp.int8),
        compiler_params=_cparams("arbitrary", "arbitrary"),
        interpret=interpret,
    )(a2, lo_flat, hi_flat)


def _ck64p_kernel(N, m, P, C, Jm, ckp, lgsize):
    Npm = N + m

    def kernel(x_ref, w_ref, out_ref, sacc_ref):
        for li in range(lgsize):
            sacc_ref[:, :] = jnp.zeros(sacc_ref.shape, jnp.int32)
            for c in range(C):
                y = None
                for p in range(P):
                    xs = x_ref[:, pl.ds((c * P + p) * ckp, Jm)]
                    yp = jnp.dot(xs, w_ref[li],
                                 preferred_element_type=jnp.int32)
                    yp = (yp << (7 * p)) if p else yp  # plane weight 2^(7p)
                    y = yp if y is None else y + yp
                sacc_ref[:, pl.ds(c * m, Npm)] += y
            out_ref[li, :, :] = (sacc_ref[:, pl.ds(0, N)]
                                 - sacc_ref[:, pl.ds(N, N)])
    return kernel


def ck_dot64p(x, wm, *, N: int, m: int, planes: int = 1, tm: int = 128,
              lgsize: int = 2, interpret: bool = False):
    """Chunked-key negacyclic contraction, per-limb int32 outputs.

    x:  (B, C*P*ckp) int8 digits (rotate_decompose64_ck layout).
    wm: (U*L, J*m, N+m) int8, rows (j, s)-major (ChunkedEngine.prepare).
    Returns (U*L, B, N) int32 folded per-limb products; the 64-bit limb
    recombination happens outside in i64pair arithmetic."""
    B, CPckp = x.shape
    UL, Jm, Npm = wm.shape
    C = N // m
    P = planes
    ckp = -(-Jm // 128) * 128
    assert Npm == N + m and CPckp == C * P * ckp
    assert UL % lgsize == 0 and B % tm == 0
    ng = UL // lgsize
    return pl.pallas_call(
        _ck64p_kernel(N, m, P, C, Jm, ckp, lgsize),
        grid=(B // tm, ng),
        in_specs=[
            pl.BlockSpec((tm, CPckp), lambda i, g: (i, i - i)),
            pl.BlockSpec((lgsize, Jm, Npm), lambda i, g: (g, i - i, i - i)),
        ],
        out_specs=pl.BlockSpec((lgsize, tm, N), lambda i, g: (g, i, i - i)),
        out_shape=jax.ShapeDtypeStruct((UL, B, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tm, 2 * N), jnp.int32)],
        compiler_params=_cparams("arbitrary", "arbitrary"),
        interpret=interpret,
    )(x, wm)


def _ck64p_acc_kernel(N, m, P, C, kp1, L, Jm, ckp, key_shift):
    def kernel(x_ref, w_ref, al_ref, ah_ref, ol_ref, oh_ref, sacc_ref):
        zlo = zhi = None
        for li in range(L):
            sacc_ref[:, :] = jnp.zeros(sacc_ref.shape, jnp.int32)
            for c in range(C):
                y = None
                for p in range(P):
                    xs = x_ref[:, pl.ds((c * P + p) * ckp, Jm)]
                    yp = jnp.dot(xs, w_ref[li],
                                 preferred_element_type=jnp.int32)
                    yp = (yp << (7 * p)) if p else yp
                    y = yp if y is None else y + yp
                sacc_ref[:, pl.ds(c * m, N + m)] += y
            f = sacc_ref[:, pl.ds(0, N)] - sacc_ref[:, pl.ds(N, N)]
            # (plo, phi) += f << (8*li + key_shift) in 64-bit pair arithmetic
            s = 8 * li + key_shift
            if s == 0:
                plo, phi = f, f >> 31
            elif s < 32:
                plo, phi = f << s, f >> (32 - s)
            elif s == 32:
                plo, phi = jnp.zeros_like(f), f
            else:
                plo, phi = jnp.zeros_like(f), f << (s - 32)
            if zlo is None:
                zlo, zhi = plo, phi
            else:
                nlo = zlo + plo
                carry = (nlo.astype(jnp.uint32)
                         < plo.astype(jnp.uint32)).astype(jnp.int32)
                zlo, zhi = nlo, zhi + phi + carry
        av, bv = al_ref[:], ah_ref[:]
        nlo = av + zlo
        carry = (nlo.astype(jnp.uint32)
                 < av.astype(jnp.uint32)).astype(jnp.int32)
        ol_ref[:, :] = nlo
        oh_ref[:, :] = bv + zhi + carry
    return kernel


def _ck64p_sacc_kernel(N, m, P, C, L, Jm, ckp, key_shift):
    def kernel(x_ref, w_ref, al_ref, ah_ref, ol_ref, oh_ref,
               sacc_ref, zlo_ref, zhi_ref):
        li = pl.program_id(2)
        sacc_ref[:, :] = jnp.zeros(sacc_ref.shape, jnp.int32)
        for c in range(C):
            y = None
            for p in range(P):
                xs = x_ref[:, pl.ds((c * P + p) * ckp, Jm)]
                yp = jnp.dot(xs, w_ref[0],
                             preferred_element_type=jnp.int32)
                yp = (yp << (7 * p)) if p else yp
                y = yp if y is None else y + yp
            sacc_ref[:, pl.ds(c * m, N + m)] += y
        f = sacc_ref[:, pl.ds(0, N)] - sacc_ref[:, pl.ds(N, N)]
        # (plo, phi) = f << (8*li + key_shift): the shift is dynamic in li,
        # so select among the L static-shift variants (cheap VPU selects)
        plo = jnp.zeros_like(f)
        phi = jnp.zeros_like(f)
        for lc in range(L):
            s = 8 * lc + key_shift
            if s == 0:
                cl, ch = f, f >> 31
            elif s < 32:
                cl, ch = f << s, f >> (32 - s)
            elif s == 32:
                cl, ch = jnp.zeros_like(f), f
            else:
                cl, ch = jnp.zeros_like(f), f << (s - 32)
            sel = li == lc
            plo = jnp.where(sel, cl, plo)
            phi = jnp.where(sel, ch, phi)

        @pl.when(li == 0)
        def _():
            zlo_ref[:, :] = plo
            zhi_ref[:, :] = phi

        @pl.when(li > 0)
        def _():
            zl = zlo_ref[:]
            nlo = zl + plo
            carry = (nlo.astype(jnp.uint32)
                     < plo.astype(jnp.uint32)).astype(jnp.int32)
            zlo_ref[:, :] = nlo
            zhi_ref[:, :] = zhi_ref[:] + phi + carry

        @pl.when(li == L - 1)
        def _():
            av, bv = al_ref[:], ah_ref[:]
            zl = zlo_ref[:]
            nlo = av + zl
            carry = (nlo.astype(jnp.uint32)
                     < av.astype(jnp.uint32)).astype(jnp.int32)
            ol_ref[:, :] = nlo
            oh_ref[:, :] = bv + zhi_ref[:] + carry
    return kernel


def ck_dot64p_sacc(x, wm, lo_flat, hi_flat, *, N: int, m: int,
                   key_shift: int, planes: int = 1, tm: int = 128,
                   kp1: int = 2, interpret: bool = False):
    """ck_dot64p_acc with the lg=1 STREAMING schedule preserved: grid
    (batch tile, u, limb) so each cell streams ONE (Jm, N+m) W block —
    exactly ck_dot64p's fast shape — while the 64-bit pair recombination
    accumulates in scratch across the limb axis (the standard k-loop
    first/last-iteration predication pattern) and the accumulator add +
    output write happen only at the last limb cell."""
    B, CPckp = x.shape
    UL, Jm, Npm = wm.shape
    C = N // m
    P = planes
    ckp = -(-Jm // 128) * 128
    L = UL // kp1
    assert Npm == N + m and CPckp == C * P * ckp
    assert B % tm == 0 and lo_flat.shape == (B, kp1 * N)
    outs = pl.pallas_call(
        _ck64p_sacc_kernel(N, m, P, C, L, Jm, ckp, key_shift),
        grid=(B // tm, kp1, L),
        in_specs=[
            pl.BlockSpec((tm, CPckp), lambda i, u, li: (i, i - i)),
            pl.BlockSpec((1, Jm, Npm), lambda i, u, li: (u * L + li,
                                                         i - i, i - i)),
            pl.BlockSpec((tm, N), lambda i, u, li: (i, u)),
            pl.BlockSpec((tm, N), lambda i, u, li: (i, u)),
        ],
        out_specs=[pl.BlockSpec((tm, N), lambda i, u, li: (i, u)),
                   pl.BlockSpec((tm, N), lambda i, u, li: (i, u))],
        out_shape=[jax.ShapeDtypeStruct((B, kp1 * N), jnp.int32),
                   jax.ShapeDtypeStruct((B, kp1 * N), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((tm, 2 * N), jnp.int32),
                        pltpu.VMEM((tm, N), jnp.int32),
                        pltpu.VMEM((tm, N), jnp.int32)],
        compiler_params=_cparams("arbitrary", "arbitrary", "arbitrary"),
        interpret=interpret,
    )(x, wm, lo_flat, hi_flat)
    return outs[0], outs[1]


def ck_dot64p_acc(x, wm, lo_flat, hi_flat, *, N: int, m: int,
                  key_shift: int, planes: int = 1, tm: int = 128,
                  kp1: int = 2, interpret: bool = False):
    """ck_dot64p with the 64-bit limb recombination AND the accumulator add
    fused in-kernel (VERDICT r4 item 2, path A — the tools/bisect_ck64.py
    "v2" morph promoted to production).

    vs the two-kernel path's ck_dot64p + XLA i64pair epilogue, this never
    materializes the (U*L, B, N) int32 per-limb products in HBM (21 MB at
    CB_MXU/B=256, written then immediately re-read by the epilogue) and
    retires the epilogue launch itself; outputs are the updated flat
    (lo, hi) pair directly.

    x:               (B, C*P*ckp) int8 digits (rotate_decompose64_ck).
    wm:              (kp1*L, J*m, N+m) int8 (ChunkedEngine.prepare).
    lo_flat/hi_flat: (B, kp1*N) int32 accumulator pair.
    Returns (lo', hi') = acc + sum_l (digits @ wm[u,l]) << (8l+key_shift).
    """
    B, CPckp = x.shape
    UL, Jm, Npm = wm.shape
    C = N // m
    P = planes
    ckp = -(-Jm // 128) * 128
    L = UL // kp1
    assert Npm == N + m and CPckp == C * P * ckp
    assert B % tm == 0 and lo_flat.shape == (B, kp1 * N)
    outs = pl.pallas_call(
        _ck64p_acc_kernel(N, m, P, C, kp1, L, Jm, ckp, key_shift),
        grid=(B // tm, kp1),
        in_specs=[
            pl.BlockSpec((tm, CPckp), lambda i, u: (i, i - i)),
            pl.BlockSpec((L, Jm, Npm), lambda i, u: (u, i - i, i - i)),
            pl.BlockSpec((tm, N), lambda i, u: (i, u)),
            pl.BlockSpec((tm, N), lambda i, u: (i, u)),
        ],
        out_specs=[pl.BlockSpec((tm, N), lambda i, u: (i, u)),
                   pl.BlockSpec((tm, N), lambda i, u: (i, u))],
        out_shape=[jax.ShapeDtypeStruct((B, kp1 * N), jnp.int32),
                   jax.ShapeDtypeStruct((B, kp1 * N), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((tm, 2 * N), jnp.int32)],
        compiler_params=_cparams("arbitrary", "arbitrary"),
        interpret=interpret,
    )(x, wm, lo_flat, hi_flat)
    return outs[0], outs[1]


# ---------------------------------------------------------------------------
# Fused 32-bit chunked-key CMux step — the N=1024 gate path.
#
# fused_cmux_step_v2 (dense per-step Toeplitz via materialize_w) starves
# VMEM above N=512: its full-width key blocks are 2*(L, N, (k+1)N) int8 =
# 12.6 MB at N=1024 (engine.py history).  The chunked-key form needs only
# (J*m, L, N+m) per output polynomial (~1.25 MB at N=1024/m=64) because the
# negacyclic structure was factored into m pre-shifted key copies at keygen
# — so the same fully-fused schedule (rotation/decomposition of the NEXT
# batch tile software-pipelined under the current tile's MXU dots) fits
# comfortably at N=1024.  Limb recombination is exact mod 2^32 (shifts
# wrap), so it fuses into the chunk loop at no carry cost.
#
# Measured schedule facts (v5e, GATE_MXU/B=4096/tm=128), for future tuning:
#   * MXU + ring accumulation alone (_skip_vpu=True): 906 us/step = 98% of
#     the 885 us chunked-formulation floor;
#   * the rotation/extraction pipeline adds 212 us SERIAL (1118 total) —
#     Mosaic does not overlap the up-front predicated VPU block with the
#     dot loop at this shape;
#   * two attempted fixes made it WORSE and are reverted in history:
#     pl.when-predicated work inside the chunk loop (2391 us — predication
#     breaks the MXU pipeline) and u-selected resident W (2.6x slower).
# ---------------------------------------------------------------------------


def _ck_cmux32_kernel(N, m, C, kp1, l, L, bgbit, offset, key_shift, nb,
                      skip_vpu=False):
    lm = l * m
    ckp = -(-(kp1 * lm) // 128) * 128      # interleaved chunk stride
    Jm = kp1 * lm
    Npm = N + m
    nbits = (N - 1).bit_length()               # cyclic-roll stages (mod N)
    half = 1 << (bgbit - 1)
    dmask = (1 << bgbit) - 1
    n_units = kp1 * (2 + nbits + l)            # full tile rotation pipeline
    # VPU unit q runs in cell u = unit_cell[q] of the tile's kp1 MXU cells
    unit_cell = [min(q * kp1 // n_units, kp1 - 1) for q in range(n_units)]

    def kernel(acur_ref, anext_ref, acc_ref, accn_ref, w_ref, out_ref,
               rot_ref, orig_ref, arot_ref, *digs_flat):
        i = pl.program_id(0)
        u = pl.program_id(1)
        # digs_flat: ping + pong scratch + ring accumulator; dig buffers
        # hold the interleaved (j=(u_in,level), s) operand per chunk
        digs = digs_flat[:2]

        # ---- VPU pipeline units (build tile src's digits) ---------------
        def unit_seed(ui, next_tile):
            src = accn_ref if next_tile else acc_ref
            orig_ref[:, :] = src[:, pl.ds(ui * N, N)]
            rot_ref[:, :] = src[:, pl.ds(ui * N, N)]
            arot_ref[:, :] = anext_ref[:] if next_tile else acur_ref[:]

        def unit_roll(w):
            r = 1 << w
            rolled = pltpu.roll(rot_ref[:], jnp.int32(r), axis=1)
            bit = ((arot_ref[:] >> w) & 1) > 0
            rot_ref[:, :] = jnp.where(bit, rolled, rot_ref[:])

        def unit_sign():
            x = rot_ref[:]
            aN = arot_ref[:] & jnp.int32(N - 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            hi = (arot_ref[:] >> jnp.int32(nbits)) & 1
            neg = (lane < aN).astype(jnp.int32) ^ hi
            rot_ref[:, :] = jnp.where(neg > 0, -x, x)

        def unit_extract(ui, lv, wbuf):
            d32 = (rot_ref[:] - orig_ref[:]).astype(jnp.uint32) + jnp.uint32(offset)
            s = 32 - (lv + 1) * bgbit
            d = ((d32 >> jnp.uint32(s)) & jnp.uint32(dmask)).astype(jnp.int32) - half
            d8 = d.astype(jnp.int8)
            for c in range(C):
                off = c * ckp + (ui * l + lv) * m
                wbuf[:, off:off + m] = d8[:, c * m:(c + 1) * m]

        def run_unit(q, wbuf, next_tile):
            ui, uq = q // (2 + nbits + l), q % (2 + nbits + l)
            if uq == 0:
                unit_seed(ui, next_tile)
            elif uq <= nbits:
                unit_roll(uq - 1)
            elif uq == nbits + 1:
                unit_sign()
            else:
                unit_extract(ui, uq - nbits - 2, wbuf)

        if not skip_vpu:
            # prologue: tile 0's digits built whole before its first dot
            @pl.when((i == 0) & (u == 0))
            def _():
                for q in range(n_units):
                    run_unit(q, digs[0], next_tile=False)

            # steady state: next tile's digits, spread over this tile's cells
            for wb in range(2):
                @pl.when(((i + 1) & 1) == wb)
                def _(wb=wb):
                    for uu in range(kp1):
                        @pl.when(u == uu)
                        def _(uu=uu, wb=wb):
                            for q in range(n_units):
                                if unit_cell[q] == uu:
                                    run_unit(q, digs[wb], next_tile=True)

        # ---- MXU: all chunks for output poly u, recombined in int32 -----
        # (W arrives as a per-u (L, Jm, Npm) block; an all-resident
        # (U*L, ...) variant with pl.when-selected u slices was tried and
        # measured 2.6x SLOWER at N=1024/B=4096 — the duplicated dot code
        # under the u-predicates defeats Mosaic's pipelining)
        sacc_ref = digs_flat[2]                    # (tm, 2N) ring scratch
        for rb in range(2):
            @pl.when((i & 1) == rb)
            def _(rb=rb):
                sacc_ref[:, :] = jnp.zeros(sacc_ref.shape, jnp.int32)
                for c in range(C):
                    y = None
                    for li in range(L):
                        d = jnp.dot(digs[rb][:, pl.ds(c * ckp, Jm)],
                                    w_ref[li],
                                    preferred_element_type=jnp.int32)
                        sh = 8 * li + key_shift
                        d = d << sh if sh else d
                        y = d if y is None else y + d
                    sacc_ref[:, pl.ds(c * m, Npm)] += y
                for uu in range(kp1):
                    @pl.when(u == uu)
                    def _(uu=uu):
                        out_ref[:, :] = (acc_ref[:, pl.ds(uu * N, N)]
                                         + sacc_ref[:, pl.ds(0, N)]
                                         - sacc_ref[:, pl.ds(N, N)])
    return kernel


def ck_cmux_step32(a, acc, wm, *, l: int, bgbit: int, offset: int,
                   key_shift: int = 0, m: int = 64, tm: int = 128,
                   kp1: int | None = None,
                   _skip_vpu: bool = False, interpret: bool = False):
    """One 32-bit blind-rotation step, fully fused, chunked pre-shifted keys:

        out = acc + recombine(decompose((X^a - 1) * acc) @ wm)

    a:   (B,) int32 exponents in [0, 2N)
    acc: (B, k+1, N) int32 TRLWE accumulator batch — or, with kp1 given,
         the FLAT (B, (k+1)*N) form (scan-carry layout: the (B, k+1, N)
         int32 view gets a padded sublane tiling on TPU, so reshaping it
         per step costs ~100 us of XLA relayout copies at B=4096/N=1024)
    wm:  (U*L, J*m, N+m) int8 pre-shifted key limbs (ChunkedEngine.prepare)
    Returns acc-shaped int32.
    """
    flat = kp1 is not None
    if not flat:
        B, kp1, N = acc.shape
    else:
        B = acc.shape[0]
        N = acc.shape[1] // kp1
    UL, Jm, Npm = wm.shape
    L = UL // kp1
    lm = l * m
    assert Jm == kp1 * lm and Npm == N + m and B % tm == 0 and N % m == 0
    C = N // m
    nb = B // tm
    a2 = a.astype(jnp.int32)[:, None]
    out = pl.pallas_call(
        _ck_cmux32_kernel(N, m, C, kp1, l, L, bgbit, offset, key_shift, nb,
                          skip_vpu=_skip_vpu),
        grid=(nb, kp1),
        in_specs=[  # i - i: typed zero (literal 0 is i64 under x64)
            pl.BlockSpec((tm, 1), lambda i, u: (i, i - i)),
            pl.BlockSpec((tm, 1), lambda i, u: (jnp.minimum(i + 1, nb - 1), i - i)),
            pl.BlockSpec((tm, kp1 * N), lambda i, u: (i, i - i)),
            pl.BlockSpec((tm, kp1 * N), lambda i, u: (jnp.minimum(i + 1, nb - 1), i - i)),
            pl.BlockSpec((L, Jm, Npm), lambda i, u: (u, i - i, i - i)),
        ],
        out_specs=pl.BlockSpec((tm, N), lambda i, u: (i, u)),
        out_shape=jax.ShapeDtypeStruct((B, kp1 * N), jnp.int32),
        scratch_shapes=(
            [pltpu.VMEM((tm, N), jnp.int32),         # rot
             pltpu.VMEM((tm, N), jnp.int32),         # orig
             pltpu.VMEM((tm, 1), jnp.int32)]         # arot
            + [pltpu.VMEM((tm, C * (-(-(kp1 * l * m) // 128) * 128)),
                          jnp.int8)] * 2               # dig ping/pong
            + [pltpu.VMEM((tm, 2 * N), jnp.int32)]   # ring accumulator
        ),
        compiler_params=_cparams("arbitrary", "arbitrary"),
        interpret=interpret,
    )(a2, a2, acc.reshape(B, kp1 * N), acc.reshape(B, kp1 * N), wm)
    return out if flat else out.reshape(B, kp1, N)


# ---------------------------------------------------------------------------
# Fully fused 64-bit chunked CMux step (VERDICT r3 item 2) — built, bit-
# identical, and MEASURED SLOWER than the two-kernel path; kept OPT-IN
# (TFHE_CK64_FUSED) with the facts recorded for the next attempt.
#
# Round-3 shipped the 64-bit step as TWO kernels (rotate_decompose64_ck then
# ck_dot64p) plus an XLA pair-recombination epilogue; measured at CB_MXU
# B=256 (tools/profile_step64.py): rotate 208 us + dots 627 us + epilogue
# 59 us, executed SERIALLY by the TensorCore.  This kernel ports the
# ck_cmux_step32 schedule to the (lo, hi) int32 pair representation: grid
# (i, u) = (batch tile, output poly); each cell dots ALL limb groups of
# poly u (the whole (L, Jm, Npm) W block is VMEM-resident under the raised
# VMEM_LIMIT) while the rotation/decomposition pipeline of the NEXT batch
# tile runs spread over the cells into ping-pong digit buffers; the 64-bit
# limb recombination (static shifts + explicit carries) happens in-cell, so
# no (UL, B, N) int32 intermediate ever touches HBM.  The pair carry is
# FLAT (B, kp1*N) (not the two-kernel path's U-major (kp1, B, N)), so no
# transpose exists anywhere in the scan.
#
# Scan-level measurement (tools/bench_cb_paths.py, SAME process, 500-step
# scan, CB_MXU/B=256, outputs bit-identical): two-kernel 973 us/step,
# fused 1155-1160 us/step (0.84x) — REPRODUCED after slimming the input
# streams, so the gap is the kernel schedule itself.  Facts for a future
# attempt:
#   * the dot schedule alone (_skip_vpu, predication removed) measured
#     1031-1111 us vs ck_dot64p's 627-1098 across sessions — but a minimal
#     morph of ck_dot64p with scratch digits + in-kernel pair recombination
#     (tools/bisect_ck64.py v2) measured FASTER than plain ck_dot64p in its
#     own session (885 vs 1098); cross-session variance on the shared dev
#     chip is +-30%, so only same-process numbers were trusted;
#   * the VPU pipeline adds ~100-200 us NON-overlapped (the ck32 finding —
#     Mosaic keeps the up-front predicated VPU block serial — recurs here);
#   * dynamic lane-offset VMEM access does not lower (so the digit
#     ping-pong cannot avoid rb-predicated dot bodies);
#   * the rb predication doubles 192-dot bodies; ck_dot64p lg=6 shows 192
#     unpredicated dots per cell are fine.
# ---------------------------------------------------------------------------


def _ck_cmux64_kernel(N, m, C, kp1, l, L, P, bgbit, offset, key_shift,
                      nb, skip_vpu=False):
    Jm = kp1 * l * m
    ckp = -(-Jm // 128) * 128
    Npm = N + m
    nbits = (2 * N - 1).bit_length()       # negacyclic stages (mod 2N)
    half = 1 << (bgbit - 1)
    dmask = (1 << bgbit) - 1
    off_lo = offset & 0xFFFFFFFF
    off_hi = (offset >> 32) & 0xFFFFFFFF
    # pipeline units per tile: seed, rolls, sub+offset, l extracts, per poly
    n_units = kp1 * (1 + nbits + 1 + l)
    n_cells = kp1
    unit_cell = [min(q * n_cells // n_units, n_cells - 1)
                 for q in range(n_units)]

    def kernel(acur_ref, anext_ref, clo_ref, chi_ref,
               nlo_ref, nhi_ref, w_ref, olo_ref, ohi_ref, rlo_ref, rhi_ref,
               glo_ref, ghi_ref, arot_ref, dig0_ref, dig1_ref, ring_ref):
        i = pl.program_id(0)
        u = pl.program_id(1)
        cell = u
        digs = (dig0_ref, dig1_ref)

        # ---- VPU pipeline units: NEXT tile's rotation + decomposition ---
        def unit_seed(ui, next_tile):
            slo = nlo_ref if next_tile else clo_ref
            shi = nhi_ref if next_tile else chi_ref
            glo_ref[:, :] = slo[:, pl.ds(ui * N, N)]
            ghi_ref[:, :] = shi[:, pl.ds(ui * N, N)]
            rlo_ref[:, :] = slo[:, pl.ds(ui * N, N)]
            rhi_ref[:, :] = shi[:, pl.ds(ui * N, N)]
            arot_ref[:, :] = anext_ref[:] if next_tile else acur_ref[:]

        def unit_roll(w):
            r = 1 << w
            lo, hi = rlo_ref[:], rhi_ref[:]
            if r < N:
                rl = pltpu.roll(lo, jnp.int32(r), axis=1)
                rh = pltpu.roll(hi, jnp.int32(r), axis=1)
                lane = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 1)
                wrap = lane < r
                nl = jnp.where(wrap, -rl, rl)
                nh = jnp.where(wrap, ~rh + (rl == 0).astype(jnp.int32), rh)
            else:                              # X^N = -1: negate all
                nl = -lo
                nh = ~hi + (lo == 0).astype(jnp.int32)
            bit = ((arot_ref[:] >> w) & 1) > 0
            rlo_ref[:, :] = jnp.where(bit, nl, lo)
            rhi_ref[:, :] = jnp.where(bit, nh, hi)

        def unit_suboff():
            lo, hi = rlo_ref[:], rhi_ref[:]
            olo, ohi = glo_ref[:], ghi_ref[:]
            borrow = (lo.astype(jnp.uint32)
                      < olo.astype(jnp.uint32)).astype(jnp.int32)
            dlo = lo - olo
            dhi = hi - ohi - borrow
            slo = dlo + _i32(off_lo)
            carry = (slo.astype(jnp.uint32)
                     < jnp.uint32(off_lo)).astype(jnp.int32)
            rlo_ref[:, :] = slo
            rhi_ref[:, :] = dhi + _i32(off_hi) + carry

        def unit_extract(ui, lv, wbuf):
            ulo = rlo_ref[:].astype(jnp.uint32)
            uhi = rhi_ref[:].astype(jnp.uint32)
            s = 64 - (lv + 1) * bgbit
            if s >= 32:
                v = uhi >> jnp.uint32(s - 32)
            elif s + bgbit <= 32:
                v = ulo >> jnp.uint32(s)
            else:
                v = (ulo >> jnp.uint32(s)) | (uhi << jnp.uint32(32 - s))
            d = (v & jnp.uint32(dmask)).astype(jnp.int32) - half
            if P == 1:
                d8 = d.astype(jnp.int8)
                for c in range(C):
                    off = c * ckp + (ui * l + lv) * m
                    wbuf[:, off:off + m] = d8[:, c * m:(c + 1) * m]
            else:                              # balanced base-2^7 planes
                p0 = (((d + 64) & 127) - 64)
                p1 = ((d - p0) >> 7)
                p08, p18 = p0.astype(jnp.int8), p1.astype(jnp.int8)
                for c in range(C):
                    o0 = (c * P) * ckp + (ui * l + lv) * m
                    o1 = (c * P + 1) * ckp + (ui * l + lv) * m
                    wbuf[:, o0:o0 + m] = p08[:, c * m:(c + 1) * m]
                    wbuf[:, o1:o1 + m] = p18[:, c * m:(c + 1) * m]

        def run_unit(q, wbuf, next_tile=True):
            ui, uq = q // (1 + nbits + 1 + l), q % (1 + nbits + 1 + l)
            if uq == 0:
                unit_seed(ui, next_tile)
            elif uq <= nbits:
                unit_roll(uq - 1)
            elif uq == nbits + 1:
                unit_suboff()
            else:
                unit_extract(ui, uq - nbits - 2, wbuf)

        if not skip_vpu:
            # prologue: tile 0's digits built whole before its first dot
            @pl.when((i == 0) & (cell == 0))
            def _():
                for q in range(n_units):
                    run_unit(q, dig0_ref, next_tile=False)

            # steady state: next tile's digits spread over this tile's cells
            for wb in range(2):
                @pl.when(((i + 1) & 1) == wb)
                def _(wb=wb):
                    for cc in range(n_cells):
                        @pl.when(cell == cc)
                        def _(cc=cc, wb=wb):
                            for q in range(n_units):
                                if unit_cell[q] == cc:
                                    run_unit(q, digs[wb])

        # ---- MXU: all limbs for output poly u: chunk dots -> ring fold ->
        # 64-bit limb recombination (static shifts) -> accumulator add ----
        # (skip_vpu probe: also drops the rb predication so the dot
        # schedule can be timed without the duplicated predicated bodies)
        for rb in ((0,) if skip_vpu else (0, 1)):
            @pl.when(((i & 1) == rb) if not skip_vpu else (i >= 0))
            def _(rb=rb):
                zlo = zhi = None
                for li in range(L):
                    ring_ref[:, :] = jnp.zeros(ring_ref.shape, jnp.int32)
                    for c in range(C):
                        y = None
                        for p in range(P):
                            xs = digs[rb][:, pl.ds((c * P + p) * ckp, Jm)]
                            yp = jnp.dot(xs, w_ref[li],
                                         preferred_element_type=jnp.int32)
                            yp = (yp << (7 * p)) if p else yp
                            y = yp if y is None else y + yp
                        ring_ref[:, pl.ds(c * m, Npm)] += y
                    f = ring_ref[:, pl.ds(0, N)] - ring_ref[:, pl.ds(N, N)]
                    # (plo, phi) = f << (8*li + key_shift) as a 64-bit pair
                    s = 8 * li + key_shift
                    if s == 0:
                        plo, phi = f, f >> 31
                    elif s < 32:
                        plo, phi = f << s, f >> (32 - s)
                    elif s == 32:
                        plo, phi = jnp.zeros_like(f), f
                    else:
                        plo, phi = jnp.zeros_like(f), f << (s - 32)
                    if zlo is None:
                        zlo, zhi = plo, phi
                    else:
                        nlo = zlo + plo
                        carry = (nlo.astype(jnp.uint32)
                                 < plo.astype(jnp.uint32)).astype(jnp.int32)
                        zlo, zhi = nlo, zhi + phi + carry
                for uu in range(kp1):
                    @pl.when(u == uu)
                    def _(uu=uu, zlo=zlo, zhi=zhi):
                        alo = clo_ref[:, pl.ds(uu * N, N)]
                        ahi = chi_ref[:, pl.ds(uu * N, N)]
                        nlo = alo + zlo
                        carry = (nlo.astype(jnp.uint32)
                                 < alo.astype(jnp.uint32)).astype(jnp.int32)
                        olo_ref[:, :] = nlo
                        ohi_ref[:, :] = ahi + zhi + carry
    return kernel


def ck_cmux_step64(a, lo_flat, hi_flat, wm, *, l: int, bgbit: int,
                   offset: int, key_shift: int = 0, m: int = 64,
                   planes: int = 1, tm: int = 128,
                   kp1: int = 2, _skip_vpu: bool = False,
                   interpret: bool = False):
    """One 64-bit blind-rotation step, fully fused, chunked pre-shifted keys:

        (lo', hi') = (lo, hi) + recombine64(decompose64((X^a - 1)*acc) @ wm)

    a:               (B,) int32 exponents in [0, 2N)
    lo_flat/hi_flat: (B, kp1*N) int32 — the FLAT i64pair accumulator
    wm:              (kp1*L, J*m, N+m) int8 (ChunkedEngine.prepare, rows
                     (u, limb)-major; the whole (L, Jm, Npm) block of one
                     output poly is VMEM-resident, which needs the raised
                     VMEM_LIMIT — ~8 MB at CB_MXU)
    Returns (lo', hi') with the same flat layout.
    """
    B = lo_flat.shape[0]
    N = lo_flat.shape[1] // kp1
    UL, Jm, Npm = wm.shape
    L = UL // kp1
    assert Jm == kp1 * l * m and Npm == N + m
    assert B % tm == 0 and N % m == 0
    assert planes in (1, 2)
    C = N // m
    nb = B // tm
    ckp = -(-Jm // 128) * 128
    a2 = a.astype(jnp.int32)[:, None]
    outs = pl.pallas_call(
        _ck_cmux64_kernel(N, m, C, kp1, l, L, planes, bgbit, offset,
                          key_shift, nb, skip_vpu=_skip_vpu),
        grid=(nb, kp1),
        in_specs=[  # i - i: typed zero (literal 0 is i64 under x64)
            pl.BlockSpec((tm, 1), lambda i, u: (i, i - i)),
            pl.BlockSpec((tm, 1), lambda i, u: (jnp.minimum(i + 1, nb - 1), i - i)),
            pl.BlockSpec((tm, kp1 * N), lambda i, u: (i, i - i)),
            pl.BlockSpec((tm, kp1 * N), lambda i, u: (i, i - i)),
            pl.BlockSpec((tm, kp1 * N), lambda i, u: (jnp.minimum(i + 1, nb - 1), i - i)),
            pl.BlockSpec((tm, kp1 * N), lambda i, u: (jnp.minimum(i + 1, nb - 1), i - i)),
            pl.BlockSpec((L, Jm, Npm), lambda i, u: (u, i - i, i - i)),
        ],
        out_specs=[
            pl.BlockSpec((tm, N), lambda i, u: (i, u)),
            pl.BlockSpec((tm, N), lambda i, u: (i, u)),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, kp1 * N), jnp.int32),
                   jax.ShapeDtypeStruct((B, kp1 * N), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((tm, N), jnp.int32),          # rot lo
            pltpu.VMEM((tm, N), jnp.int32),          # rot hi
            pltpu.VMEM((tm, N), jnp.int32),          # orig lo
            pltpu.VMEM((tm, N), jnp.int32),          # orig hi
            pltpu.VMEM((tm, 1), jnp.int32),          # arot
            pltpu.VMEM((tm, C * planes * ckp), jnp.int8),   # dig ping
            pltpu.VMEM((tm, C * planes * ckp), jnp.int8),   # dig pong
            pltpu.VMEM((tm, 2 * N), jnp.int32),      # ring accumulator
        ],
        compiler_params=_cparams("arbitrary", "arbitrary"),
        interpret=interpret,
    )(a2, a2, lo_flat, hi_flat, lo_flat, hi_flat, wm)
    return outs[0], outs[1]


def _mm_recombine_kernel(L, shift_base, nk):
    def kernel(x_ref, w_ref, accin_ref, out_ref, scratch):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            scratch[:] = accin_ref[:]

        part = scratch[:]
        for l in range(L):
            y = jnp.dot(x_ref[:], w_ref[l],
                        preferred_element_type=jnp.int32)
            sh = 8 * l + shift_base
            part = part + (y << sh if sh else y)
        scratch[:] = part

        @pl.when(k == nk - 1)
        def _():
            out_ref[:] = scratch[:]
    return kernel


def mm_recombine_acc(x, w, acc_in, *, shift_base: int = 0,
                     tm: int = 1024, tn: int = 512, tk: int = 512,
                     interpret: bool = False):
    """acc_in + recombine_limbs(x @ w) with everything fused.

    x:      (B, K) int8 digit planes (K = J*N)
    w:      (L, K, U*N) int8 key limb matrices (materialize_w layout)
    acc_in: (B, U, N) int32 (or (B, U*N))
    Returns (B, U, N) int32:
        acc_in[b,u,i] + sum_l (x @ w[l])[b, u*N+i] << (8l + shift_base).
    """
    B, K = x.shape
    L, Kw, UN = w.shape
    assert K == Kw
    lead_shape = acc_in.shape
    N = lead_shape[-1] if acc_in.ndim == 3 else UN
    U = UN // N
    tm = min(tm, B)
    tn = min(tn, UN)
    tk = min(tk, K)
    assert B % tm == 0 and UN % tn == 0 and K % tk == 0
    grid = (B // tm, UN // tn, K // tk)
    out = pl.pallas_call(
        _mm_recombine_kernel(L, shift_base, K // tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k)),
            pl.BlockSpec((L, tk, tn), lambda i, j, k: (i - i, k, j)),
            pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((B, UN), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=_cparams("parallel", "parallel", "arbitrary"),
        interpret=interpret,
    )(x, w, acc_in.reshape(B, UN))
    return out.reshape(lead_shape)

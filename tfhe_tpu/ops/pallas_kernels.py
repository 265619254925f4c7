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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_materialize_kernel(J, UL, nsub, rows, N):
    def kernel(v_ref, out_ref, scratch, sem):
        twoN = v_ref.shape[-1]
        for j in range(J):
            for c in range(UL):
                for r in range(nsub):
                    v = v_ref[j * UL + c, r, :].astype(jnp.int32)[None, :]
                    block = jnp.broadcast_to(v, (rows, twoN))
                    rolled = pltpu.roll(block, jnp.int32(0), axis=1,
                                        stride=1, stride_axis=0)
                    scratch[:, :] = rolled[:, :N].astype(jnp.int8)
                    copy = pltpu.make_async_copy(
                        scratch,
                        out_ref.at[pl.ds(j * N + r * rows, rows),
                                   pl.ds(c * N, N)],
                        sem)
                    copy.start()
                    copy.wait()
    return kernel


def materialize_w(v, *, rows: int = 256, interpret: bool = False):
    """v: (L, J, U, 2N) int8 doubled limb vectors ->
    W: (J*N, U*L*N) int8 with W[(j,t),(u,l,i)] = v[l,j,u,(i-t) mod 2N]."""
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

    kernel = _make_materialize_kernel(J, U * L, nsub, rows, N)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((J * N, U * L * N), jnp.int8),
        scratch_shapes=[pltpu.VMEM((rows, N), jnp.int8),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(vv)


@functools.cache
def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"

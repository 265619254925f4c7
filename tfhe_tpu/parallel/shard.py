"""Explicit shard_map scale-out: dp x ep sharding of the bootstrap hot path.

`mesh.py` gives the GSPMD formulation (NamedSharding + jit, collectives
implicit).  This module is the explicit counterpart the reference's OpenMP
layer never needed (SURVEY.md §2.4 table): every device's local work and
every collective is written out with `shard_map` + `lax.psum`, so the
communication pattern is a design artifact, not a compiler inference.

Axes:
  dp — ciphertext batch.  Embarrassingly parallel (the OpenMP parallel-for
       analog, test_parallel_multiplications.cpp:62): no collectives.
  ep — the external-product digit-row axis J = (k+1)*l (SURVEY §2.4 "limb
       sharding").  Each device holds the J/ep slice of every per-step
       prepared TRGSW operand and contracts its digit slice; the partial
       (B/dp, (k+1)*N) products reduce with ONE psum per blind-rotation
       step over the ep axis.  The key-switch matrices shard the same way
       along their contracted one-hot dimension (digit rows), psum'd once.

Key material per device: bk 1/ep-th, ksk 1/ep-th, i.e. the layout scales
to keys larger than a single chip's HBM — the design decision SURVEY.md §7
flags ("key material size & movement") that the reference never faced.

The accumulator is replicated over ep: the rotation/decomposition VPU work
is duplicated ep times, the MXU contraction divides by ep, and each step
moves one (B/dp, (k+1)*N) psum over ICI.  At gate parameters that is a
26 KB/ct reduce per step against ~85 KB/ct of MXU+VPU work — profitable
once the per-chip batch saturates (see tools/scaling_virtual.py).

ep COST MODEL (why ep is a key-MEMORY axis, not a throughput axis): with
the rotation fraction r of a fused step duplicated on every ep member and
only the (1-r) contraction dividing, the speedup ceiling is
1/(r + (1-r)/ep) — at the measured r ~ 0.4 for the 32-bit fused step
(440 of ~950 us at GATE_MXU2) ep=2 caps at ~1.4x BEFORE psum cost, and
tools/multihost_projection.py charges the psum on top (ep=2 ICI
efficiency ~0.54 at gate shapes).  Use ep when the per-step key working
set must shrink (it divides bk and ksk residency by ep); use dp for
throughput.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tfhe_tpu import lwe, tlwe, tgsw
from tfhe_tpu import torus as T
from tfhe_tpu.ops.decomp import decompose_tlwe
from tfhe_tpu.ops.engine import make_engine
from tfhe_tpu.ops import poly


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              ep: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if ep is None:
        ep = 2 if n % 2 == 0 and n > 1 else 1
    if dp is None:
        dp = n // ep
    assert dp * ep == n, (dp, ep, n)
    return Mesh(np.asarray(devs[:n]).reshape(dp, ep), ("dp", "ep"))


def _bk_ep_spec(backend: str) -> P:
    """PartitionSpec of a stacked prepared-bk leaf, J axis sharded over ep.

    onthefly leaves are (n, L, J, U, 2N); matmul leaves are (n, L, J*N, U*N)
    with row-major (j, t) rows, so a contiguous J*N split divides J."""
    if backend == "onthefly":
        return P(None, None, "ep", None, None)
    if backend == "matmul":
        return P(None, None, "ep", None)
    raise ValueError(f"ep sharding not defined for backend {backend!r}")


def key_shardings(mesh: Mesh, key_data, backend: str = "onthefly"):
    """Device placement for a gate CloudKey.data pytree under dp x ep."""
    bk = NamedSharding(mesh, _bk_ep_spec(backend))
    ksw = NamedSharding(mesh, P(None, "ep", None))
    return {"bk": jax.tree.map(lambda _: bk, key_data["bk"]), "ksw": ksw}


def _local_blind_rotate(acc, bk_local, abar, p, eng, ep_axis: str | None):
    """Per-device body: full rotation, local digit-slice contraction,
    psum-reduced accumulator update.  acc replicated over ep."""

    def step(acc, xs):
        prep_i, a_i = xs
        acc2 = tlwe.mul_by_xai_minus_one(a_i, acc)
        digits = decompose_tlwe(acc2, p)               # (B, J, N) local B
        if ep_axis is not None:
            jsz = jax.lax.axis_size(ep_axis)
            jlo = jax.lax.axis_index(ep_axis) * (p.kpl // jsz)
            digits = lax.dynamic_slice_in_dim(digits, jlo, p.kpl // jsz,
                                              axis=-2)
            part = eng.accumulate(digits, prep_i)
            part = lax.psum(part, ep_axis)
        else:
            part = eng.accumulate(digits, prep_i)
        return acc + part, None

    acc, _ = lax.scan(step, acc, (bk_local, jnp.moveaxis(abar, -1, 0)))
    return acc


def _local_keyswitch(samples, w_limbs_local, ks, n_out, ep_axis: str | None):
    """One-hot keyswitch with the contracted dim sharded over ep: each
    device multiplies its digit-row slice, one psum reduces the sum
    (lweKeySwitch, lwe_functions.cpp:163-172)."""
    a, b = samples[..., :-1], samples[..., -1]
    digs = lwe.keyswitch_digits(a, ks)                 # (..., n_in, t)
    onehot = (digs[..., None] == jnp.arange(ks.base)).astype(jnp.int8)
    onehot = onehot.reshape(*samples.shape[:-1], -1)   # (..., n_in*t*base)
    if ep_axis is not None:
        rows = w_limbs_local.shape[1]
        lo = jax.lax.axis_index(ep_axis) * rows
        onehot = lax.dynamic_slice_in_dim(onehot, lo, rows, axis=-1)
    acc = 0
    for l in range(w_limbs_local.shape[0]):
        part = jnp.matmul(onehot, w_limbs_local[l],
                          preferred_element_type=jnp.int32)
        acc = acc + (part << (8 * l))
    if ep_axis is not None:
        acc = lax.psum(acc, ep_axis)
    return lwe.noiseless_trivial(b, n_out) - acc


def make_sharded_bootstrap_fn(params, mesh: Mesh, backend: str = "onthefly",
                              mu: int | None = None):
    """Explicit-collective gate bootstrap over a (dp, ep) mesh.

    Returns (jitted fn(key_data, samples) -> samples, shard placement fn).
    Bit-identical to gate.bootstrap (tests/test_shard_map.py asserts it).
    """
    from tfhe_tpu.boot import gate

    p = params.tgsw
    mu = gate.MU_BOOL if mu is None else mu
    ep = mesh.shape["ep"]
    # always route through the ep collectives (a size-1 psum is free);
    # skipping them when ep == 1 leaves the carry ep-invariant while the
    # bk-derived update is ep-varying, which shard_map's VMA check rejects.
    ep_axis = "ep"
    if p.kpl % ep:
        raise ValueError(
            f"ep={ep} does not divide the digit-row count kpl={p.kpl} "
            f"((k+1)*l for this parameter set): pick ep from its divisors "
            f"or add a dp-only mesh (the bk cannot be row-padded without "
            f"changing the gadget)")
    eng = make_engine(tgsw.engine_config(p), backend)
    N = p.tlwe.N

    def local_fn(key_data, samples):
        # samples: (B/dp, n+1) local; bk leaves J-sliced; ksw row-sliced.
        a, b = samples[..., :-1], samples[..., -1]
        barb = T.mod_switch_from_torus32(b, 2 * N)
        bara = T.mod_switch_from_torus32(a, 2 * N)
        tv = jnp.full((barb.shape[0], N), np.int32(mu), jnp.int32)
        tv = poly.mul_by_xai((2 * N - barb) % (2 * N), tv)
        acc = tlwe.noiseless_trivial_poly(tv, p.tlwe.k)
        acc = _local_blind_rotate(acc, key_data["bk"], bara, p, eng, ep_axis)
        u = tlwe.extract_lwe(acc, 0)
        return _local_keyswitch(u, key_data["ksw"], params.ks, params.lwe.n,
                                ep_axis)

    bk_spec = _bk_ep_spec(backend)
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=({"bk": bk_spec, "ksw": P(None, "ep", None)},
                             P("dp", None)),
                   out_specs=P("dp", None))

    def shard(key_data, samples):
        key_data = jax.device_put(
            key_data, key_shardings(mesh, key_data, backend))
        samples = jax.device_put(
            samples, NamedSharding(mesh, P("dp", None)))
        return key_data, samples

    return jax.jit(fn), shard


def _cb_bk_ep_spec(backend: str) -> P:
    """PartitionSpec of a stacked prepared lvl2-bk leaf, digit-row axis
    sharded over ep.

    chunked leaves are (n, U*L, J*m, N+m) with rows (j, s)-major, so a
    contiguous J*m split divides J; conv leaves are (n, J*U*L, 1, 2N-1)
    with j-major rows, so a contiguous split divides J the same way."""
    if backend == "chunked":
        return P(None, None, "ep", None)
    if backend == "conv":
        return P(None, "ep", None, None)
    raise ValueError(
        f"circuit-bootstrap ep sharding not defined for backend {backend!r}")


def circuit_key_shardings(mesh: Mesh, key_data, backend: str = "chunked"):
    """Device placement for a CircuitCloudKey.data pytree under dp x ep.

    The key-placement policy for circuit bootstrapping (SURVEY §7 "key
    material size & movement" — the axis where multi-chip matters most,
    since the privKS table is ~2.7 GB and the chunked lvl2 bk ~8 GB at
    CB_MXU/m=64, pallas_kernels.py:562-565):

      * lvl2 bk (the dominant term): digit-row axis J = (k+1)*l2 sharded
        over ep — each device holds 1/ep of the pre-shifted wm.  For
        multi-host, build wm per-host from the raw ~160 MB TRGSW bk
        (CircuitCloudKey.generate already builds wm on-device from raw
        rows) so only the raw bk, never the m-fold blowup, exists off
        the accelerators.
      * privKS: one-hot contraction rows ((n2+1)*t*base) sharded over ep;
        each device multiplies its row slice, one psum per key switch.
      * preKS: contraction rows sharded over ep likewise.
      * The (B/dp, k+1, N2) Torus64 accumulator is replicated over ep
        (it is the small operand: 64 KB/ct vs MB-scale per-step key
        traffic) — one psum per blind-rotation step reduces the partial
        external products.
    """
    bk = NamedSharding(mesh, _cb_bk_ep_spec(backend))
    return {
        "bk": jax.tree.map(lambda _: bk, key_data["bk"]),
        "preks": NamedSharding(mesh, P(None, "ep", None)),
        "privks": NamedSharding(mesh, P(None, None, "ep", None)),
    }


def _local_priv_keyswitch(x64, w_local, ks, z: int, k: int, N: int,
                          ep_axis: str):
    """Private functional key switch with the one-hot contraction rows
    sharded over ep (circuitPrivKS, poc_CircuitBootstrapping.cpp:667-698):
    each device multiplies its row slice of privKS[z], one psum reduces."""
    from tfhe_tpu.boot.circuit import priv_keyswitch_digits
    digs = priv_keyswitch_digits(x64, ks)                # (..., n+1, t)
    onehot = (digs[..., None] == jnp.arange(ks.base)).astype(jnp.int8)
    onehot = onehot.reshape(*digs.shape[:-2], -1)
    rows = w_local.shape[2]
    lo = jax.lax.axis_index(ep_axis) * rows
    onehot = lax.dynamic_slice_in_dim(onehot, lo, rows, axis=-1)
    acc = 0
    for l in range(w_local.shape[1]):
        part = jnp.matmul(onehot, w_local[z, l],
                          preferred_element_type=jnp.int32)
        acc = acc + (part << (8 * l))
    acc = lax.psum(acc, ep_axis)
    return (-acc).reshape(*digs.shape[:-2], k + 1, N)


def make_sharded_circuit_bootstrap_fn(p, mesh: Mesh, backend: str = "chunked",
                                      shared_rotation: bool | None = None):
    """Explicit-collective circuit bootstrap over a (dp, ep) mesh
    (tfhe_CircuitBootstrapFFT, poc_CircuitBootstrapping.cpp:823-873,
    composed per boot/circuit.py's corrected composition).

    Batch shards over dp with no collectives (the OpenMP-parallel-for
    analog).  ep shards every contraction's row axis — preKS rows, the
    lvl2 external-product digit rows J=(k+1)*l2, and the privKS rows —
    with exactly one psum per blind-rotation step / key switch; key
    placement per `circuit_key_shardings`.

    ep divides throughput less than dp (the rotation/decomposition VPU
    work replicates over ep — see the module-docstring ep cost model);
    its purpose here is KEY MEMORY: ep=2 halves the ~8 GB chunked wm and
    the 2.7 GB privKS per-device residency at CB_MXU.

    Returns (jitted fn(key_data, samples) -> TRGSW batch, placement fn).
    Bit-identical to boot.circuit.circuit_bootstrap on the same backend
    (int32/int64 wrap addition is associative, so the psum split is exact;
    tests/test_shard_circuit.py asserts it).
    """
    from tfhe_tpu import noise
    from tfhe_tpu.ops import poly as _poly

    N2 = p.n_lvl2
    k = p.lvl1.k
    ell1, bgbit1 = p.tgsw_lvl1.l, p.tgsw_lvl1.bgbit
    ep = mesh.shape["ep"]
    ep_axis = "ep"      # size-1 psum is free; always route (VMA rules)
    if shared_rotation is None:
        shared_rotation = (noise.shared_rotation_penalty(p)
                           <= noise.SHARED_ROTATION_MAX_PENALTY)

    kpl2 = p.tgsw_lvl2.kpl
    if kpl2 % ep:
        raise ValueError(
            f"ep={ep} does not divide the lvl2 digit-row count kpl={kpl2}: "
            f"pick ep from its divisors")
    preks_rows = p.n_lvl1 * p.ks10.t * p.ks10.base
    privks_rows = (p.n_lvl2 + 1) * p.ks21.t * p.ks21.base
    for name, rows in (("preKS", preks_rows), ("privKS", privks_rows)):
        if rows % ep:
            raise ValueError(f"ep={ep} does not divide the {name} "
                             f"contraction rows ({rows})")
    eng2 = make_engine(tgsw.engine_config(p.tgsw_lvl2), backend)

    def local_fn(key_data, samples):
        # 1. preKS lvl1 -> lvl0, rows over ep (poc:832)
        x0 = _local_keyswitch(samples, key_data["preks"], p.ks10,
                              p.n_lvl0, ep_axis)
        # 2. mod switch to Z_{2*N2} (poc:836)
        abar = T.mod_switch_from_torus32(x0[..., :-1], 2 * N2)
        bbar = T.mod_switch_from_torus32(x0[..., -1], 2 * N2)

        # 3. blind rotation(s) at lvl2, digit rows over ep
        def rotate_for(mu2):
            tv = jnp.concatenate([
                jnp.full((N2 // 2,), -mu2, jnp.int64),
                jnp.full((N2 // 2,), mu2, jnp.int64)])
            tv = jnp.broadcast_to(tv, (bbar.shape[0], N2))
            tv = _poly.mul_by_xai((2 * N2 - bbar) % (2 * N2), tv)
            acc = tlwe.noiseless_trivial_poly(tv, p.lvl2.k)
            acc = _local_blind_rotate(acc, key_data["bk"], abar,
                                      p.tgsw_lvl2, eng2, ep_axis)
            ext = tlwe.extract_lwe(acc, 0)
            return ext.at[..., -1].add(mu2)

        if shared_rotation:
            base = rotate_for(jnp.int64(np.int64(1) << (63 - ell1 * bgbit1)))
            exts = [(base.astype(jnp.int64) << (bgbit1 * (ell1 - 1 - w)))
                    for w in range(ell1)]
        else:
            exts = [rotate_for(jnp.int64(np.int64(1)
                                         << (63 - (w + 1) * bgbit1)))
                    for w in range(ell1)]

        # 4. private functional key switches, rows over ep (poc:845-855)
        rows = []
        for w, ext in enumerate(exts):
            for z in range(k + 1):
                rows.append(_local_priv_keyswitch(
                    ext, key_data["privks"], p.ks21, z, k, p.n_lvl1,
                    ep_axis))
        out = jnp.stack(rows, axis=-3)      # (B, ell1*(k+1), k+1, N1)
        B = out.shape[:-3]
        out = out.reshape(*B, ell1, k + 1, k + 1, p.n_lvl1)
        return jnp.swapaxes(out, -4, -3)    # (B, k+1, ell1, k+1, N1)

    bk_spec = _cb_bk_ep_spec(backend)
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=({"bk": bk_spec,
                              "preks": P(None, "ep", None),
                              "privks": P(None, None, "ep", None)},
                             P("dp", None)),
                   out_specs=P("dp", None, None, None, None))

    def place(key_data, samples):
        key_data = jax.device_put(
            key_data, circuit_key_shardings(mesh, key_data, backend))
        samples = jax.device_put(
            samples, NamedSharding(mesh, P("dp", None)))
        return key_data, samples

    return jax.jit(fn), place


def pad_batch(samples, mesh: Mesh):
    """Round a ragged batch up to a multiple of dp with zero rows (they
    bootstrap to valid encryptions of False and are sliced off by the
    caller).  Returns (padded, original_length)."""
    dp = mesh.shape["dp"]
    B = samples.shape[0]
    pad = (-B) % dp
    if pad:
        samples = jnp.concatenate(
            [samples, jnp.zeros((pad,) + samples.shape[1:],
                                samples.dtype)], axis=0)
    return samples, B

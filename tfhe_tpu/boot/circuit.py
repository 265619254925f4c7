"""Circuit bootstrapping: TLWE -> TRGSW via blind rotation + private
functional key switch (C18-C23 of SURVEY.md §2,
poc_CircuitBootstrapping.cpp:437-873).

Pipeline (batched over ciphertexts):

  LWE32(lvl1, bit/2) --preKS--> LWE32(lvl0) --modswitch--> Z_{2N2}
     --blind rotation over the lvl2 Torus64 ring--> LWE64(lvl2, bit*mu_w)
     --private functional KS (u in {0,1})--> TLWE32 rows of a TRGSW(bit)

Deviations from the reference PoC, on purpose (all ASan/instrumentation
findings recorded in PARITY.md):

  * The PoC's rotation exponent is composition-inconsistent: preKeySwitch
    negates the mask (result.a = -sum ks rows, poc:437-465) but
    circuitBootstrapWoKS rotates by +abar (poc:580-642), so the exponent
    carries a uniform 2*sum(a*s) term relative to the phase; its rotation
    also drops the negacyclic sign on wrapped coefficients and reads out of
    bounds for abar >= N (poc:593-597, ASan-verified).  We compose the
    standard (library/CGGI17) way instead: testvector * X^{2N - barb} and
    +abar steps, so the accumulator lands on X^{-phibar} * tv exactly.
  * Optionally one blind rotation serves all ell1 output levels: the
    accumulator is linear in the test vector and mu_w = mu_{w+1} << bgbit1,
    so rotating once with the smallest mu and shifting the extracted sample
    left by bgbit1*(ell1-1-w) reproduces every level.  The shift amplifies
    the rotation noise variance by 2^(2*bgbit1*(ell1-1)), so this is only
    sound when that stays below the privKS noise floor —
    noise.shared_rotation_penalty() decides; shared_rotation=None picks
    automatically (CB_TOY: shared; CB_ACTIVE: falls back to the reference's
    per-level rotations, poc:845-847).

Output bit semantics match the PoC driver: bit = 1 iff the input phase lies
in (1/4, 3/4) — i.e. LWE messages encode bits as {0, 1/2}.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tfhe_tpu.params import CircuitParams, LweParams, KeySwitchParams
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import torus as T
from tfhe_tpu import lwe, tlwe, tgsw
from tfhe_tpu.ops import poly
from tfhe_tpu.boot import blind_rotate as br


@dataclasses.dataclass
class CircuitSecretKey:
    params: CircuitParams
    key_lvl0: lwe.LweKey
    ring_lvl1: tlwe.TLweKey
    ring_lvl2: tlwe.TLweKey
    lwe_lvl1: lwe.LweKey          # ring_lvl1 as LWE(N1) (input side)

    @staticmethod
    def generate(p: CircuitParams, rng: TfheRng) -> "CircuitSecretKey":
        k0 = lwe.LweKey.generate(LweParams(p.n_lvl0), rng)
        r1 = tlwe.TLweKey.generate(p.lvl1, rng)
        r2 = tlwe.TLweKey.generate(p.lvl2, rng)
        l1 = lwe.LweKey(LweParams(p.n_lvl1), r1.key.reshape(-1))
        return CircuitSecretKey(p, k0, r1, r2, l1)


@dataclasses.dataclass
class PrivKeySwitchKey:
    """privKS[z][i][j][v] = TLWE32_{lvl1}(K_z * key2ext[i] * v * 2^(32-(j+1)bb))
    with K_0 = -s1 (mask bloc), K_1 = 1, and key2ext = [s2, -1] so the body
    is handled by the same digit loop (poc:367, 405-419).  Stored as int8
    limb matmul matrices; digit-0 columns zeroed (the `aij != 0` skip)."""

    ks: KeySwitchParams
    n_in: int                       # n_lvl2 (+1 handled internally)
    k: int
    N: int
    w_limbs: jnp.ndarray            # (2, 4, (n_in+1)*t*base, (k+1)*N) int8

    @staticmethod
    def generate(sk: CircuitSecretKey, rng: TfheRng) -> "PrivKeySwitchKey":
        p = sk.params
        ks = p.ks21
        n2, N1, k = p.n_lvl2, p.n_lvl1, p.lvl1.k
        base = ks.base
        mess = _privks_message_table(sk)
        if jax.default_backend() == "tpu" and not rng.false_random:
            return _privks_generate_device(sk, rng, jnp.asarray(mess))
        ws = []
        for z in range(k + 1):
            c = tlwe.encrypt_zero(sk.ring_lvl1, rng, mess.shape, ks.stdev)
            c = c.at[..., z, 0].add(jnp.asarray(mess))  # K_z * m at bloc z
            c = np.array(c)
            c[:, :, 0, :, :] = 0                        # digit-0 rows
            w = c.reshape((n2 + 1) * ks.t * base, (k + 1) * N1)
            ws.append(T.balanced_limbs(jnp.asarray(w), 4, 8))
        return PrivKeySwitchKey(ks, n2, k, N1, jnp.stack(ws, axis=0))


def _privks_message_table(sk: CircuitSecretKey) -> np.ndarray:
    """mess[i, j, v] = (key2ext[i] << shift_j) * v on the torus32, where
    key2ext = [s2, -1] (the -1 extension makes the body row a plain digit
    loop entry, poc:367) and shift_j = 32-(j+1)*basebit (poc:405-419)."""
    p = sk.params
    ks = p.ks21
    key2ext = np.concatenate([sk.ring_lvl2.key.reshape(-1),
                              np.array([-1], np.int32)])      # (n2+1,)
    shifts = np.array([32 - (j + 1) * ks.basebit for j in range(ks.t)])
    mess = (key2ext[:, None, None].astype(np.int64)
            << shifts[None, :, None]) * np.arange(ks.base)[None, None, :]
    return mess.astype(np.uint64).astype(np.uint32).astype(np.int32)


def _privks_generate_device(sk: CircuitSecretKey, rng: TfheRng,
                            mess) -> "PrivKeySwitchKey":
    """Device-side privKS table generation (VERDICT r3 item 6).

    The host path costs 200+ s at CB scale on this box's 2 CPU cores
    (measured: ~104 s of FFT ring products + ~47 s of numpy RNG + ~75 s
    of eager limb splitting PER z-bloc).  Here randomness comes from the
    jax PRNG on the accelerator (key derived from the TfheRng stream, so
    the run stays deterministic per seed), the 327k ring products run as
    int8-limb MXU matmuls (binary key = 1 limb; the torus mask splits
    into five base-2^7 planes — exact), and the limb split is one jitted
    pass; only the final table stays on device.  Keys differ numerically
    from the host path's (different RNG streams) but follow the same
    distribution; FALSE_RANDOM keygen keeps the host path, so the e2e
    reference anchor is unaffected."""
    import functools
    import jax.random as jrandom
    from tfhe_tpu.ops.engine import EngineConfig, make_engine
    p = sk.params
    ks = p.ks21
    n2, N1, k = p.n_lvl2, p.n_lvl1, p.lvl1.k
    # binary ring key as a 1-limb fixed operand; the uniform mask is the
    # varying operand (base-2^7 planes, exact int32 accumulation)
    cfg = EngineConfig(N=N1, out_bits=32, digit_bits=32, key_bits=8)
    eng = make_engine(cfg, "matmul")
    dev = jax.devices()[0]
    prep = jax.device_put(
        eng.prepare(jnp.asarray(sk.ring_lvl1.key.reshape(k, 1, N1)
                                .astype(np.int32))), dev)
    seed = int(np.uint64(rng.uniform64(())))       # from the TfheRng stream
    kb = jrandom.PRNGKey(seed & 0x7FFFFFFFFFFFFFFF)
    sigma = float(ks.stdev) * 2.0**32

    @functools.partial(jax.jit, static_argnames=("z",))
    def build(prep, mess, key, z):
        T_, t_, b_ = mess.shape
        ka, ke = jrandom.split(key)
        a = jrandom.randint(ka, (T_, t_, b_, k, N1), -2**31, 2**31,
                            dtype=jnp.int32)
        e = jnp.trunc(jrandom.normal(ke, (T_, t_, b_, N1), jnp.float32)
                      * sigma).astype(jnp.int32)
        b = e + eng.accumulate(a, prep)[..., 0, :]
        c = jnp.concatenate([a, b[..., None, :]], axis=-2)  # (...,k+1,N)
        c = c.at[..., z, 0].add(mess)
        c = c.at[:, :, 0, :, :].set(0)                      # digit-0 rows
        w = c.reshape((n2 + 1) * t_ * b_, (k + 1) * N1)
        return T.balanced_limbs(w, 4, 8)

    keys = jrandom.split(kb, k + 1)
    ws = [build(prep, mess, keys[z], z=z) for z in range(k + 1)]
    return PrivKeySwitchKey(ks, n2, k, N1, jnp.stack(ws, axis=0))


def priv_keyswitch_digits(x64, ks: KeySwitchParams):
    """64-bit unsigned rounding digits, top-down (circuitPrivKS,
    poc:674-688): aibar = x + 2^(64-(1+bb*t)); digit_j =
    (aibar >> (64-(j+1)bb)) & mask.  x64: (..., n+1).  -> (..., n+1, t)."""
    prec_offset = jnp.uint64(1 << (64 - (1 + ks.basebit * ks.t)))
    aibar = jnp.asarray(x64, jnp.int64).astype(jnp.uint64) + prec_offset
    digs = [((aibar >> jnp.uint64(64 - (j + 1) * ks.basebit))
             & jnp.uint64(ks.base - 1)).astype(jnp.int32) for j in range(ks.t)]
    return jnp.stack(digs, axis=-1)


def priv_keyswitch(x64, pksk: PrivKeySwitchKey, z: int):
    """LWE64(n2) -> TLWE32(lvl1) of K_z * t64tot32(phase(x)): one-hot int8
    matmul replacement of the digit scatter loop (poc:667-698)."""
    digs = priv_keyswitch_digits(x64, pksk.ks)               # (..., n+1, t)
    onehot = (digs[..., None] == jnp.arange(pksk.ks.base)).astype(jnp.int8)
    onehot = onehot.reshape(*digs.shape[:-2], -1)
    acc = 0
    for l in range(pksk.w_limbs.shape[1]):
        part = jnp.matmul(onehot, pksk.w_limbs[z, l],
                          preferred_element_type=jnp.int32)
        acc = acc + (part << (8 * l))
    out = (-acc).reshape(*digs.shape[:-2], pksk.k + 1, pksk.N)
    return out


def prepare_circuit_bk(gsw, p: CircuitParams, backend: str):
    """Raw TRGSW64 bk (n0, k+1, l2, k+1, N2) -> stacked engine-prepared
    pytree, built ON the accelerator when one is present (for the chunked
    backend the pre-shifted wm is ~m/2 x the raw bk — e.g. 8 GB at
    CB_MXU/m=64 — so shipping it through the host link would dominate;
    the raw bk is the only thing that ever crosses)."""
    eng = tgsw.make_engine(tgsw.engine_config(p.tgsw_lvl2), backend)
    dev = jax.devices()[0]
    if backend == "chunked":
        if dev.platform != "cpu":
            gsw = jax.device_put(gsw, dev)
        return jax.jit(lambda g: jax.lax.map(
            lambda x: eng.prepare(tgsw.rows(x)), g))(gsw)
    prep = jax.lax.map(lambda g: eng.prepare(tgsw.rows(g)), gsw)
    if dev.platform != "cpu":
        prep = jax.device_put(prep, dev)
    return prep


@dataclasses.dataclass
class CircuitCloudKey:
    params: CircuitParams
    backend: str
    preks: lwe.KeySwitchKey          # lvl1 -> lvl0 (torus32)
    bk_prepared: object              # stacked prepared TRGSW64 of key_lvl0
    privks: PrivKeySwitchKey
    bk_raw: object | None = None     # host copy of the raw TRGSW64 bk
                                     # (kept for serialization: ~160 MB vs
                                     # the ~8 GB prepared chunked wm)

    @staticmethod
    def generate(sk: CircuitSecretKey, rng: TfheRng, backend: str = "conv",
                 keep_raw_ks: bool = False,
                 keep_raw_bk: bool = False) -> "CircuitCloudKey":
        from tfhe_tpu.boot.gate import host_keygen_device
        from tfhe_tpu.utils import observability as obs
        p = sk.params
        obs.count("keygen.circuit")
        # per-stage spans attribute the keygen cost (VERDICT r3 weak 3):
        # scrape obs.report()["spans"] for keygen.circuit.* after a run.
        with obs.span("keygen.circuit"):
            with host_keygen_device():
                with obs.span("keygen.circuit.preks"):
                    preks = lwe.KeySwitchKey.generate(sk.lwe_lvl1,
                                                      sk.key_lvl0, p.ks10,
                                                      rng,
                                                      keep_raw=keep_raw_ks)
                with obs.span("keygen.circuit.bk_encrypt"):
                    gsw = tgsw.encrypt(sk.ring_lvl2, sk.key_lvl0.key,
                                       p.tgsw_lvl2, rng,
                                       stdev=p.bk_stdev)
                    # (n0, k+1, l2, k+1, N2) torus64
            # outside the host pin: privKS generation runs on the
            # accelerator when one is present (_privks_generate_device)
            with obs.span("keygen.circuit.privks"):
                privks = PrivKeySwitchKey.generate(sk, rng)
                jax.block_until_ready(privks.w_limbs)
            raw = np.asarray(gsw) if keep_raw_bk else None
            with obs.span("keygen.circuit.bk_prepare"):
                prep = prepare_circuit_bk(gsw, p, backend)
                jax.block_until_ready(prep)
            dev = jax.devices()[0]
            if dev.platform != "cpu":
                with obs.span("keygen.circuit.ks_transfer"):
                    preks = dataclasses.replace(
                        preks, w_limbs=jax.device_put(preks.w_limbs, dev))
                    privks = dataclasses.replace(
                        privks, w_limbs=jax.device_put(privks.w_limbs, dev))
                    jax.block_until_ready((preks.w_limbs, privks.w_limbs))
        return CircuitCloudKey(p, backend, preks, prep, privks, bk_raw=raw)

    @property
    def data(self):
        return {"preks": self.preks.w_limbs, "bk": self.bk_prepared,
                "privks": self.privks.w_limbs}


def circuit_bootstrap(samples, key_data, p: CircuitParams,
                      backend: str = "conv",
                      shared_rotation: bool | None = None,
                      unroll: int = 1):
    """LWE32(lvl1, bit/2) batch (B, n1+1) -> TRGSW32 batch
    (B, k+1, ell1, k+1, N1) encrypting bit = [phase in (1/4, 3/4)]
    (tfhe_CircuitBootstrapFFT, poc:823-873, corrected composition)."""
    N2 = p.n_lvl2
    k = p.lvl1.k
    ell1, bgbit1 = p.tgsw_lvl1.l, p.tgsw_lvl1.bgbit
    if shared_rotation is None:
        from tfhe_tpu import noise
        shared_rotation = (noise.shared_rotation_penalty(p)
                           <= noise.SHARED_ROTATION_MAX_PENALTY)

    # 1. pre key switch lvl1 -> lvl0 (poc:832)
    preks = lwe.KeySwitchKey(p.ks10, p.n_lvl1, p.n_lvl0, key_data["preks"])
    x0 = lwe.keyswitch(samples, preks)                        # (B, n0+1)

    # 2. mod switch to Z_{2*N2} (poc:836 / preModSwitch :472)
    abar = T.mod_switch_from_torus32(x0[..., :-1], 2 * N2)    # (B, n0)
    bbar = T.mod_switch_from_torus32(x0[..., -1], 2 * N2)     # (B,)

    # 3. blind rotation(s) at lvl2.  Test vector (poc:552-562):
    #    [-mu2]*N/2 ++ [mu2]*N/2; after X^{-phibar} rotation, coefficient 0
    #    is +mu2 iff phibar in [N/2, 3N/2) iff phase in [1/4, 3/4).
    pksk = PrivKeySwitchKey(p.ks21, p.n_lvl2, k, p.n_lvl1, key_data["privks"])

    def rotate_for(w):
        mu2 = np.int64(1) << (63 - (w + 1) * bgbit1)          # mu_w / 2
        tv = jnp.concatenate([
            jnp.full((N2 // 2,), -mu2, jnp.int64),
            jnp.full((N2 // 2,), mu2, jnp.int64)])
        ext = br.rotate_and_extract(tv, key_data["bk"], bbar, abar,
                                    p.tgsw_lvl2, backend, unroll)
        # recentre: += mu2 so the message is {0, mu_w} (poc:648)
        return ext.at[..., -1].add(jnp.int64(mu2))

    if shared_rotation:
        base_ext = rotate_for(ell1 - 1)
        exts = [(base_ext.astype(jnp.int64) << (bgbit1 * (ell1 - 1 - w)))
                for w in range(ell1)]
    else:
        exts = [rotate_for(w) for w in range(ell1)]

    # 4. private functional key switches fill the TRGSW rows (poc:845-855)
    rows = []
    for w, ext in enumerate(exts):
        for z in range(k + 1):
            rows.append(priv_keyswitch(ext, pksk, z))         # (B, k+1, N1)
    # rows ordered (w, z); TRGSW layout is (bloc z, level w, k+1, N)
    out = jnp.stack(rows, axis=-3)                            # (B, ell1*(k+1), k+1, N1)
    B = out.shape[:-3]
    out = out.reshape(*B, ell1, k + 1, k + 1, p.n_lvl1)
    return jnp.swapaxes(out, -4, -3)                          # (B, k+1, ell1, k+1, N1)


def make_circuit_bootstrap_fn(p: CircuitParams, backend: str = "conv",
                              shared_rotation: bool = True, unroll: int = 1):
    import functools
    return jax.jit(functools.partial(
        circuit_bootstrap, p=p, backend=backend,
        shared_rotation=shared_rotation, unroll=unroll))


def make_circuit_bootstrap_staged(p: CircuitParams, backend: str = "conv",
                                  shared_rotation: bool | None = None,
                                  unroll: int = 1):
    """Staged-compile circuit bootstrap for accelerators.

    The monolithic jit of `circuit_bootstrap` inlines ell1 500-step scans
    plus 2*ell1 privKS contractions into ONE XLA program — measured 30+ min
    of AOT compile at CB_ACTIVE over the remote-compile path.  This variant
    compiles three small programs instead, each reused across loop
    iterations by passing the varying piece (test-vector amplitude mu2,
    privKS matrix slice) as an argument:

      A. preKS + mod switch            (samples -> abar, bbar)
      B. blind rotation + extract      (one compile serves all ell1 levels)
      C. private functional key switch (one compile serves both z blocs)

    Returns fn(samples, key_data) -> TRGSW batch, same semantics as
    `circuit_bootstrap`.
    """
    N2 = p.n_lvl2
    k = p.lvl1.k
    ell1, bgbit1 = p.tgsw_lvl1.l, p.tgsw_lvl1.bgbit
    if shared_rotation is None:
        from tfhe_tpu import noise
        shared_rotation = (noise.shared_rotation_penalty(p)
                           <= noise.SHARED_ROTATION_MAX_PENALTY)

    @jax.jit
    def stage_a(samples, preks_w):
        preks = lwe.KeySwitchKey(p.ks10, p.n_lvl1, p.n_lvl0, preks_w)
        x0 = lwe.keyswitch(samples, preks)
        abar = T.mod_switch_from_torus32(x0[..., :-1], 2 * N2)
        bbar = T.mod_switch_from_torus32(x0[..., -1], 2 * N2)
        return abar, bbar

    @jax.jit
    def stage_b(bk, abar, bbar, mu2):
        tv = jnp.concatenate([
            jnp.full((N2 // 2,), -1, jnp.int64),
            jnp.full((N2 // 2,), 1, jnp.int64)]) * mu2
        ext = br.rotate_and_extract(tv, bk, bbar, abar, p.tgsw_lvl2,
                                    backend, unroll)
        return ext.at[..., -1].add(mu2)

    @jax.jit
    def stage_c(ext, pk_w_z):
        pksk = PrivKeySwitchKey(p.ks21, p.n_lvl2, k, p.n_lvl1,
                                pk_w_z[None])
        return priv_keyswitch(ext, pksk, 0)

    def fn(samples, key_data):
        from tfhe_tpu.utils import observability as obs
        obs.count("bootstrap.circuit_launches")
        abar, bbar = stage_a(samples, key_data["preks"])
        if shared_rotation:
            mu2 = np.int64(1) << (63 - ell1 * bgbit1)
            base = stage_b(key_data["bk"], abar, bbar, jnp.int64(mu2))
            exts = [(base.astype(jnp.int64) << (bgbit1 * (ell1 - 1 - w)))
                    for w in range(ell1)]
        else:
            exts = [stage_b(key_data["bk"], abar, bbar,
                            jnp.int64(np.int64(1) << (63 - (w + 1) * bgbit1)))
                    for w in range(ell1)]
        rows = []
        for w, ext in enumerate(exts):
            for z in range(k + 1):
                rows.append(stage_c(ext, key_data["privks"][z]))
        out = jnp.stack(rows, axis=-3)
        B = out.shape[:-3]
        out = out.reshape(*B, ell1, k + 1, k + 1, p.n_lvl1)
        return jnp.swapaxes(out, -4, -3)

    return fn

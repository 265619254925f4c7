"""Gate bootstrapping (R4 of SURVEY.md §2: lwe_functions.cpp:399-446) and
the homomorphic boolean gate set built on it (the upstream TFHE gate API the
reference's library files imply).

Booleans use the standard TFHE encoding: False = -1/8, True = +1/8 on the
torus.  Each binary gate is one affine combination of input LWE samples
followed by one bootstrap with test vector [1/8, ..., 1/8].

Key material is kept as pure pytrees (CloudKeyData) so the whole bootstrap
jits and scans cleanly; `CloudKey` is the host-side wrapper that generates
and owns them.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from tfhe_tpu.params import GateParams, LweParams
from tfhe_tpu.rng import TfheRng
from tfhe_tpu import lwe, tlwe, tgsw
from tfhe_tpu import torus as T
from tfhe_tpu.boot import blind_rotate as br

MU_BOOL = 1 << 29            # 1/8 as Torus32


def host_keygen_device():
    """Context manager pinning eager ops to the host CPU backend (no-op when
    CPU already is the default).  Keygen math is transfer/dispatch-bound on
    remote accelerators, not compute-bound."""
    import contextlib
    if jax.default_backend() == "cpu":
        return contextlib.nullcontext()
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


@dataclasses.dataclass
class SecretKey:
    params: GateParams
    lwe_key: lwe.LweKey          # small key (level 0 analog)
    ring_key: tlwe.TLweKey       # accumulator ring key
    extracted_key: lwe.LweKey    # ring key reinterpreted as LWE(k*N)

    @staticmethod
    def generate(params: GateParams, rng: TfheRng) -> "SecretKey":
        lk = lwe.LweKey.generate(params.lwe, rng)
        rk = tlwe.TLweKey.generate(params.tgsw.tlwe, rng)
        ek = lwe.LweKey(LweParams(n=rk.params.extracted_n),
                        rk.key.reshape(-1))
        return SecretKey(params, lk, rk, ek)


@dataclasses.dataclass
class CloudKey:
    """Bootstrapping key (TRGSW of every small-key bit, engine-prepared and
    stacked over steps) + key switch back to the small key
    (LweBootstrappingKeyFFT, lwe_functions.cpp:265-309)."""

    params: GateParams
    backend: str
    bk_prepared: object            # pytree, leaves lead with axis n
    ksk: lwe.KeySwitchKey

    @staticmethod
    def generate(sk: SecretKey, rng: TfheRng, backend: str = "matmul",
                 keep_raw_ks: bool = False) -> "CloudKey":
        from tfhe_tpu.utils import observability as obs
        p = sk.params
        obs.count("keygen.gate")
        with obs.span("keygen.gate"), host_keygen_device():
            # keygen is hundreds of small eager ops; against a remote
            # accelerator each becomes a dispatch round-trip (281 s over
            # the dev tunnel).  Run it on the host CPU backend (~3 s) and
            # ship the finished key material across once.
            gsw = tgsw.encrypt(sk.ring_key, sk.lwe_key.key, p.tgsw, rng,
                               stdev=p.tgsw.tlwe.stdev)   # (n, k+1, l, k+1, N)
            eng = tgsw.make_engine(tgsw.engine_config(p.tgsw), backend)
            if backend != "chunked":
                prep = jax.lax.map(lambda g: eng.prepare(tgsw.rows(g)), gsw)
            ksk = lwe.KeySwitchKey.generate(sk.extracted_key, sk.lwe_key,
                                            p.ks, rng, keep_raw=keep_raw_ks)
        dev = jax.devices()[0]
        if backend == "chunked":
            # build the m-fold pre-shifted key ON the accelerator from the
            # raw TRGSW (shipping ~GBs of wm across the host link would
            # dominate keygen; the raw bk is n*(k+1)^2*l*N torus words)
            if dev.platform != "cpu":
                gsw = jax.device_put(gsw, dev)
            prep = jax.jit(lambda g: jax.lax.map(
                lambda x: eng.prepare(tgsw.rows(x)), g))(gsw)
        elif dev.platform != "cpu":
            prep = jax.device_put(prep, dev)
        if dev.platform != "cpu":
            ksk = dataclasses.replace(
                ksk, w_limbs=jax.device_put(ksk.w_limbs, dev))
        return CloudKey(p, backend, prep, ksk)

    @property
    def data(self):
        return {"bk": self.bk_prepared, "ksw": self.ksk.w_limbs}


def bootstrap_woks(samples, bk_prepared, params: GateParams, mu: int = MU_BOOL,
                   backend: str = "matmul", unroll: int = 1):
    """Mod-switch + blind-rotate + extract (tfhe_bootstrap_woKS_FFT,
    lwe_functions.cpp:399-428): output is LWE(k*N) of +-mu by sign(phase)."""
    N = params.N
    samples = jnp.asarray(samples)
    a, b = samples[..., :-1], samples[..., -1]
    barb = T.mod_switch_from_torus32(b, 2 * N)
    bara = T.mod_switch_from_torus32(a, 2 * N)
    testvect = jnp.full((N,), np.int32(mu), jnp.int32)
    return br.rotate_and_extract(testvect, bk_prepared, barb, bara,
                                 params.tgsw, backend, unroll)


def bootstrap(samples, key_data, params: GateParams, mu: int = MU_BOOL,
              backend: str = "matmul", unroll: int = 1):
    """Full gate bootstrap: woKS + key switch (tfhe_bootstrap_FFT,
    lwe_functions.cpp:434-446)."""
    # Count only at un-jitted call boundaries: inside a trace this body runs
    # once at compile time, so counting here would undercount every cached
    # execution (the wave-jit path counts in runtime/scheduler.py instead;
    # make_bootstrap_fn counts in its outer wrapper).
    if not isinstance(samples, jax.core.Tracer):
        from tfhe_tpu.utils import observability as obs
        obs.count("bootstrap.launches")
        obs.count("bootstrap.ciphertexts",
                  int(np.prod(jnp.shape(samples)[:-1])) or 1)
    u = bootstrap_woks(samples, key_data["bk"], params, mu, backend, unroll)
    ksk = lwe.KeySwitchKey(params.ks, params.tgsw.tlwe.extracted_n,
                           params.lwe.n, key_data["ksw"])
    return lwe.keyswitch(u, ksk)


def make_bootstrap_fn(params: GateParams, mu: int = MU_BOOL,
                      backend: str = "matmul", unroll: int = 1):
    """Jitted (key_data, samples) -> bootstrapped samples."""
    jfn = jax.jit(lambda key_data, samples: bootstrap(
        samples, key_data, params, mu, backend, unroll))

    def fn(key_data, samples):
        # counters live OUTSIDE the jit so every cached execution counts
        from tfhe_tpu.utils import observability as obs
        obs.count("bootstrap.launches")
        obs.count("bootstrap.ciphertexts",
                  int(np.prod(jnp.shape(samples)[:-1])) or 1)
        return jfn(key_data, samples)
    return fn


# ---------------------------------------------------------------------------
# Homomorphic gates (upstream TFHE boolean API)
# ---------------------------------------------------------------------------

def _trivial(mu, n):
    return lwe.noiseless_trivial(jnp.full((), np.int32(mu), jnp.int32), n)


def encrypt_bool(sk: SecretKey, bits, rng: TfheRng):
    msgs = np.where(np.asarray(bits).astype(bool), MU_BOOL, -MU_BOOL).astype(np.int32)
    return lwe.encrypt(sk.lwe_key, msgs, rng, sk.params.lwe.stdev)


def decrypt_bool(sk: SecretKey, samples):
    return np.asarray(lwe.phase(samples, sk.lwe_key)) > 0


def gate_nand(ck_data, x, y, params, backend="matmul"):
    t = _trivial(MU_BOOL, params.lwe.n) - x - y
    return bootstrap(t, ck_data, params, MU_BOOL, backend)


def gate_and(ck_data, x, y, params, backend="matmul"):
    t = _trivial(-MU_BOOL, params.lwe.n) + x + y
    return bootstrap(t, ck_data, params, MU_BOOL, backend)


def gate_or(ck_data, x, y, params, backend="matmul"):
    t = _trivial(MU_BOOL, params.lwe.n) + x + y
    return bootstrap(t, ck_data, params, MU_BOOL, backend)


def gate_nor(ck_data, x, y, params, backend="matmul"):
    t = _trivial(-MU_BOOL, params.lwe.n) - x - y
    return bootstrap(t, ck_data, params, MU_BOOL, backend)


def gate_xor(ck_data, x, y, params, backend="matmul"):
    t = _trivial(1 << 30, params.lwe.n) + 2 * (x + y)    # (0, 1/4) + 2(x+y)
    return bootstrap(t, ck_data, params, MU_BOOL, backend)


def gate_xnor(ck_data, x, y, params, backend="matmul"):
    t = _trivial(-(1 << 30), params.lwe.n) - 2 * (x + y)
    return bootstrap(t, ck_data, params, MU_BOOL, backend)


def gate_not(x):
    """NOT is free: negate the sample (no bootstrap needed)."""
    return -jnp.asarray(x)


def gate_constant(value, n: int):
    """Noiseless trivial sample of a known bit (upstream bootsCONSTANT)."""
    return _trivial(MU_BOOL if value else -MU_BOOL, n)


def gate_copy(x):
    """Upstream bootsCOPY (no bootstrap)."""
    return jnp.asarray(x)


def gate_andny(ck_data, x, y, params, backend="matmul"):
    """(NOT x) AND y (upstream bootsANDNY)."""
    t = _trivial(-MU_BOOL, params.lwe.n) - x + y
    return bootstrap(t, ck_data, params, MU_BOOL, backend)


def gate_andyn(ck_data, x, y, params, backend="matmul"):
    """x AND (NOT y) (upstream bootsANDYN)."""
    t = _trivial(-MU_BOOL, params.lwe.n) + x - y
    return bootstrap(t, ck_data, params, MU_BOOL, backend)


def gate_orny(ck_data, x, y, params, backend="matmul"):
    """(NOT x) OR y (upstream bootsORNY)."""
    t = _trivial(MU_BOOL, params.lwe.n) - x + y
    return bootstrap(t, ck_data, params, MU_BOOL, backend)


def gate_oryn(ck_data, x, y, params, backend="matmul"):
    """x OR (NOT y) (upstream bootsORYN)."""
    t = _trivial(MU_BOOL, params.lwe.n) + x - y
    return bootstrap(t, ck_data, params, MU_BOOL, backend)


def gate_mux(ck_data, c, x, y, params, backend="matmul"):
    """MUX(c, x, y) = c ? x : y via two bootstraps + keyswitched sum
    (upstream bootsMUX structure).  The two first-stage bootstraps are
    independent, so they run as ONE double-width launch — one blind-
    rotation scan instead of two (a mux wave costs 2 launches, not 3)."""
    t1 = _trivial(-MU_BOOL, params.lwe.n) + c + x
    t2 = _trivial(-MU_BOOL, params.lwe.n) - c + y
    tt = jnp.stack([t1, t2])
    u = bootstrap(tt.reshape(-1, tt.shape[-1]), ck_data, params, MU_BOOL,
                  backend).reshape(tt.shape)
    t = u[0] + u[1] + _trivial(MU_BOOL, params.lwe.n)
    return bootstrap(t, ck_data, params, MU_BOOL, backend)

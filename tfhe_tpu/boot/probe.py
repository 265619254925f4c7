"""PARANO-style decrypt-probe debugging (SURVEY.md §4.5; VERDICT r1 item 10).

The reference, compiled without NDEBUG, decrypts the blind-rotation
accumulator after every CMux step and prints the sign/offset of each slot's
phase (poc_CircuitBootstrapping.cpp:539-541, 601-640), plus the phase of
every intermediate LWE and TRGSW row at the top level (:837-866) — i.e.
testing-by-decryption with the secret key as oracle.  This module is the
library-facility version: pass a secret key and get per-step phase
statistics from the real pipeline, without touching the production path.

These helpers run the step loop in Python (one device dispatch per step)
so every intermediate can be pulled to host — debug tooling, not the
production scan.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.params import TGswParams
from tfhe_tpu import tlwe, tgsw, lwe
from tfhe_tpu.ops.decomp import decompose_tlwe
from tfhe_tpu.ops.engine import make_engine


@dataclasses.dataclass
class StepProbe:
    """Per-step accumulator state (phases are exact decryptions)."""
    step: int
    exponent: np.ndarray          # (B,) rotation exponents used
    phase: np.ndarray             # (B, N) accumulator phase (torus)
    sign: np.ndarray              # (B, N) sign of the phase (+-1)
    rms_noise: float              # rms distance of slot 0.. from the
                                  # nearest test-vector level


def _phase_stats(step, a_i, acc, ring_key, mu):
    ph = np.asarray(tlwe.tlwe_phase(jnp.asarray(acc), ring_key))
    sign = np.where(ph >= 0, 1, -1).astype(np.int8)
    # distance to the nearest of {+-mu} — the blind-rotation invariant is
    # that every slot sits near a test-vector level (poc:601-606 prints
    # exactly this sign/offset information)
    dt = ph.dtype.type
    dist = np.minimum(np.abs(ph.astype(np.int64) - int(mu)),
                      np.abs(ph.astype(np.int64) + int(mu)))
    bits = 32 if ph.dtype == np.int32 else 64
    rms = float(np.sqrt(np.mean((dist / 2.0**bits) ** 2)))
    return StepProbe(step, np.asarray(a_i), ph, sign, rms)


def blind_rotate_probed(acc, bk_prepared, abar, p: TGswParams,
                        ring_key: tlwe.TLweKey, mu: int,
                        backend: str = "matmul", verbose: bool = False,
                        every: int = 1):
    """Blind rotation with a decrypt probe after every `every` steps.

    Same math as boot.blind_rotate.blind_rotate (Python loop instead of
    lax.scan).  Returns (acc, [StepProbe...]).  `ring_key` is the secret
    accumulator ring key — this is a DEBUG oracle, like the reference's
    PARANO mode.
    """
    import jax
    eng = make_engine(tgsw.engine_config(p), backend)
    abar = jnp.asarray(abar)
    n = abar.shape[-1]
    probes = []
    for i in range(n):
        prep_i = jax.tree.map(lambda a: a[i], bk_prepared)
        a_i = abar[..., i]
        acc2 = tlwe.mul_by_xai_minus_one(a_i, acc)
        digits = decompose_tlwe(acc2, p)
        acc = eng.accumulate_into(acc, digits, prep_i)
        if i % every == 0 or i == n - 1:
            pr = _phase_stats(i, a_i, acc, ring_key, mu)
            probes.append(pr)
            if verbose:
                print(f"[probe] step {i:4d} rms_noise 2^"
                      f"{np.log2(max(pr.rms_noise, 1e-30)):.1f} "
                      f"sign[0,:8]={pr.sign[0, :8].tolist()}")
    return acc, probes


def probe_lwe_phase(samples, key: lwe.LweKey, label: str = "",
                    verbose: bool = False):
    """Phase probe of an LWE batch (the reference's intermediate prints at
    poc:837-842).  Returns the phase array."""
    ph = np.asarray(lwe.phase(jnp.asarray(samples), key))
    if verbose:
        print(f"[probe] {label} phase[:8]={ph.reshape(-1)[:8].tolist()}")
    return ph


def probe_tgsw_rows(gsw, ring_key: tlwe.TLweKey, p: TGswParams,
                    message=None, verbose: bool = False):
    """Decrypt-probe every TLWE row of a TRGSW batch (poc:848-866): row
    (bloc u, level w) must have phase ~= m * K_u * h_w with K = [-s, .., 1].

    Returns (B, k+1, l, N) phase arrays; if `message` is given, also the
    max absolute deviation from the expected phase (as float fraction of
    the torus)."""
    gsw = jnp.asarray(gsw)
    k, l, N = p.tlwe.k, p.l, p.tlwe.N
    phases = np.stack([
        np.stack([np.asarray(tlwe.tlwe_phase(gsw[..., u, w, :, :], ring_key))
                  for w in range(l)], axis=-2)
        for u in range(k + 1)], axis=-3)          # (B, k+1, l, N)
    if message is None:
        return phases, None
    bits = p.tlwe.bits
    dt64 = phases.astype(np.int64)
    m = np.asarray(message).astype(np.int64)
    # expected: bloc k (the b-bloc) row w encodes m * h_w at coeff 0;
    # mask blocs encode -m * s_u * h_w (poly product) — compare b-bloc only
    h = [int(x) for x in np.asarray(p.h, np.int64)]
    devs = []
    for w in range(l):
        exp0 = (m * h[w]) % (1 << bits)
        got = dt64[..., k, w, 0] % (1 << bits)
        d = np.minimum((got - exp0) % (1 << bits),
                       (exp0 - got) % (1 << bits))
        devs.append(d)
    max_dev = float(np.max(devs) / 2.0**bits)
    if verbose:
        print(f"[probe] tgsw b-bloc max dev {max_dev:.3e} of torus")
    return phases, max_dev

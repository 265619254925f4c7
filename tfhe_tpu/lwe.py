"""Batched LWE samples, encryption, phase, and key switching (R3 of
SURVEY.md §2: lwe_functions.cpp:17-241).

Layout: an LWE batch is one int array of shape (..., n+1) with the body b
stored at index n — the library's ``b = &a[n]`` convention (poc_types.h:137).
Encryption follows the reference sign convention b = m + e + sum a_i s_i,
phase = b - sum a_i s_i (lwe_functions.cpp:42-65).

Key switching is reformulated for the MXU: instead of the reference's
digit-indexed scatter-subtract loop (lweKeySwitchTranslate_fromArray,
lwe_functions.cpp:139-156), digits are expanded to a one-hot vector and the
whole translation becomes one (B, n*t*base) x (n*t*base, n_out+1) matmul,
with the key matrix pre-split into int8 limbs so it runs on the MXU int8
path exactly.  Digit-0 rows of the matrix are zeroed, matching the
reference's ``if (aij != 0)`` skip.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from tfhe_tpu import torus as T
from tfhe_tpu.params import LweParams, KeySwitchParams
from tfhe_tpu.rng import TfheRng


@dataclasses.dataclass
class LweKey:
    params: LweParams
    key: np.ndarray                # (n,) int32 bits

    @staticmethod
    def generate(params: LweParams, rng: TfheRng) -> "LweKey":
        return LweKey(params, np.asarray(rng.bit((params.n,)), np.int32))


def encrypt(key: LweKey, messages, rng: TfheRng, stdev: float | None = None):
    """b = gaussian(m, stdev) + sum a_i s_i (lweSymEncrypt, lwe_functions.cpp:42-52).

    messages: (...,) int32 torus values.  Returns (..., n+1) int32.
    """
    stdev = key.params.stdev if stdev is None else stdev
    messages = np.asarray(messages, np.int32)
    n = key.params.n
    a = rng.uniform32(messages.shape + (n,))
    b = rng.gaussian32(messages, stdev, messages.shape)
    # sum in int64, then truncate: astype(int32) wraps mod 2^32 silently
    # (the wrap is the intended torus semantics; a plain int32 add trips
    # numpy's scalar-overflow warning for 0-d messages).
    b = (b.astype(np.int64)
         + a.astype(np.int64) @ key.key.astype(np.int64)).astype(np.int32)
    return jnp.asarray(np.concatenate([a, b[..., None]], axis=-1))


def noiseless_trivial(mu, n: int):
    """(0, mu) (lweNoiselessTrivial, lwe_functions.cpp:75-81)."""
    mu = jnp.asarray(mu, jnp.int32)
    a = jnp.zeros(mu.shape + (n,), jnp.int32)
    return jnp.concatenate([a, mu[..., None]], axis=-1)


def phase(samples, key: LweKey):
    """phi = b - sum a_i s_i (lwePhase, lwe_functions.cpp:55-65)."""
    s = jnp.asarray(key.key, jnp.int32)
    samples = jnp.asarray(samples)
    a, b = samples[..., :-1], samples[..., -1]
    return b - jnp.einsum("...i,i->...", a, s)


def decrypt(samples, key: LweKey, msize: int):
    """approxPhase(phase) (lweSymDecrypt, lwe_functions.cpp:68-73)."""
    return T.approx_phase32(phase(samples, key), msize)


# ---------------------------------------------------------------------------
# Key switching
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class KeySwitchKey:
    """ks[i][j][v] = Enc_{out}(in_key[i] * v * 2^(32-(j+1)basebit))
    (lweCreateKeySwitchKey_fromArray, lwe_functions.cpp:117-131), stored as
    int8 limb matmul matrices plus the raw table for serialization/tests."""

    ks: KeySwitchParams
    n_in: int
    n_out: int
    w_limbs: jnp.ndarray           # (4, n_in*t*base, n_out+1) int8
    raw: np.ndarray | None = None  # (n_in, t, base, n_out+1) int32

    @staticmethod
    def generate(in_key: LweKey, out_key: LweKey, ks: KeySwitchParams,
                 rng: TfheRng, keep_raw: bool = True) -> "KeySwitchKey":
        n_in, n_out = in_key.params.n, out_key.params.n
        base = ks.base
        # messages m[i,j,v] = (in_key[i] << (32-(j+1)basebit)) * v
        shifts = np.array([32 - (j + 1) * ks.basebit for j in range(ks.t)])
        m = (in_key.key[:, None, None].astype(np.int64)
             << shifts[None, :, None]) * np.arange(base)[None, None, :]
        m = m.astype(np.uint64).astype(np.uint32).astype(np.int32)
        table = np.asarray(encrypt(out_key, m, rng, ks.stdev))  # (n_in,t,base,n_out+1)
        w = table.copy()
        w[:, :, 0, :] = 0          # digit 0 contributes nothing (":aij != 0" skip)
        w = w.reshape(n_in * ks.t * base, n_out + 1)
        w_limbs = T.balanced_limbs(jnp.asarray(w), 4, 8)
        return KeySwitchKey(ks, n_in, n_out, w_limbs,
                            raw=table if keep_raw else None)

    @staticmethod
    def from_raw(table, ks: KeySwitchParams, keep_raw: bool = True
                 ) -> "KeySwitchKey":
        """Build the limb-matmul form from a raw (n_in, t, base, n_out+1)
        int32 sample table (e.g. one dumped by an upstream-API reference
        binary, lweCreateKeySwitchKey_fromArray layout)."""
        table = np.asarray(table, np.int32)
        n_in, t, base, np1 = table.shape
        assert t == ks.t and base == ks.base
        w = table.copy()
        w[:, :, 0, :] = 0          # digit 0 contributes nothing
        w = w.reshape(n_in * t * base, np1)
        return KeySwitchKey(ks, n_in, np1 - 1,
                            T.balanced_limbs(jnp.asarray(w), 4, 8),
                            raw=table if keep_raw else None)


def keyswitch_digits(samples_a, ks: KeySwitchParams):
    """Unsigned rounding digit decomposition of LWE mask coefficients
    (lwe_functions.cpp:139-151): aibar = a + prec_offset; digit_j =
    (aibar >> (32-(j+1)basebit)) & (base-1).  Returns (..., n, t) int32."""
    prec_offset = 1 << (32 - (1 + ks.basebit * ks.t))
    aibar = (jnp.asarray(samples_a, jnp.int32).astype(jnp.uint32)
             + jnp.uint32(prec_offset))
    shifts = [32 - (j + 1) * ks.basebit for j in range(ks.t)]
    digs = [((aibar >> jnp.uint32(s)) & jnp.uint32(ks.base - 1)).astype(jnp.int32)
            for s in shifts]
    return jnp.stack(digs, axis=-1)


def keyswitch(samples, ksk: KeySwitchKey):
    """result = (0, b) - sum_{i,j} ks[i][j][digit_ij]  (lweKeySwitch,
    lwe_functions.cpp:163-172) as a one-hot int8 matmul."""
    samples = jnp.asarray(samples)
    a, b = samples[..., :-1], samples[..., -1]
    digs = keyswitch_digits(a, ksk.ks)                       # (..., n, t)
    onehot = (digs[..., None] == jnp.arange(ksk.ks.base)).astype(jnp.int8)
    onehot = onehot.reshape(*samples.shape[:-1], -1)         # (..., n*t*base)
    acc = 0
    for l in range(ksk.w_limbs.shape[0]):
        part = jnp.matmul(onehot, ksk.w_limbs[l],
                          preferred_element_type=jnp.int32)
        acc = acc + (part << (8 * l))
    return noiseless_trivial(b, ksk.n_out) - acc

"""Noise model <-> measurement loop (VERDICT r1 item 8).

noise.gate_bootstrap_variances is a faithful port of the reference's
worksheet (misc/params-gb.html:49-113) with k/key_limbs generalizations —
but a formula nobody compares against the real pipeline is prose.  These
tests run the actual batched bootstrap at scaled-down parameter points,
measure the output phase variance across the batch, and assert it within a
factor of the prediction (a chi^2 spread of ~sqrt(2/B) plus model slack).
"""

import numpy as np
import pytest

from tfhe_tpu import noise
from tfhe_tpu.params import (GateParams, LweParams, TGswParams, TLweParams,
                             KeySwitchParams)
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate

B = 256


def _measured_variance(p: GateParams, seed: int):
    rng = TfheRng(seed)
    sk = gate.SecretKey.generate(p, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
    bits = np.random.default_rng(seed + 1).integers(0, 2, B).astype(bool)
    ct = gate.encrypt_bool(sk, bits, rng)
    out = gate.bootstrap(ct, ck.data, p, backend="onthefly")
    ph = np.asarray(__import__("tfhe_tpu").lwe.phase(out, sk.lwe_key))
    mu = np.where(bits, gate.MU_BOOL, -gate.MU_BOOL).astype(np.int64)
    resid = (ph.astype(np.int64) - mu).astype(np.int32)  # wrap-safe residual
    return float(np.mean((resid / 2.0**32) ** 2))


# Scaled parameter points: small enough for CPU, large enough that the
# dominant worksheet terms (tbk1/tks1/tks2) are exercised with real
# Gaussian noise.  Factors of 8 cover estimator spread (~9% at B=256)
# plus the model's independence approximations.
POINTS = [
    # (name, params)
    ("k1-N256", GateParams(
        lwe=LweParams(n=64, stdev=2.0**-15),
        tgsw=TGswParams(l=3, bgbit=7,
                        tlwe=TLweParams(N=256, k=1, stdev=2.0**-20, bits=32)),
        ks=KeySwitchParams(t=8, basebit=2, stdev=2.0**-15))),
    ("k2-N128-trunc", GateParams(
        lwe=LweParams(n=64, stdev=2.0**-15),
        tgsw=TGswParams(l=3, bgbit=7, key_limbs=3,
                        tlwe=TLweParams(N=128, k=2, stdev=2.0**-20, bits=32)),
        ks=KeySwitchParams(t=8, basebit=2, stdev=2.0**-15))),
]


@pytest.mark.parametrize("name,p", POINTS, ids=[n for n, _ in POINTS])
def test_measured_variance_matches_model(name, p):
    pred = noise.gate_bootstrap_variances(p).final_variance
    if p.tgsw.key_limbs:
        pred = pred + noise.key_truncation_variance(p)
    got = _measured_variance(p, seed=11)
    ratio = got / pred
    assert 1 / 8 < ratio < 8, (name, got, pred, ratio)


def test_model_orders_param_sets_like_measurements():
    """Cross-check the model's RANKING: more bk noise -> more output noise,
    both predicted and measured."""
    quiet = POINTS[0][1]
    loud = GateParams(
        lwe=quiet.lwe,
        tgsw=TGswParams(l=3, bgbit=7,
                        tlwe=TLweParams(N=256, k=1, stdev=2.0**-17, bits=32)),
        ks=quiet.ks)
    pq = noise.gate_bootstrap_variances(quiet).final_variance
    pl = noise.gate_bootstrap_variances(loud).final_variance
    assert pl > pq * 4
    mq = _measured_variance(quiet, seed=21)
    ml = _measured_variance(loud, seed=22)
    assert ml > mq * 2, (ml, mq)

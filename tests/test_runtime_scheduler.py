"""Native circuit scheduler + batched homomorphic evaluation."""

import numpy as np
import pytest

from tfhe_tpu.params import GATE_TOY
from tfhe_tpu.rng import TfheRng
from tfhe_tpu.boot import gate


def _build_adder(circ, xa, xb, cin):
    """Ripple-carry full adders over wire-id lists; returns (sums, cout)."""
    sums = []
    c = cin
    for a, b in zip(xa, xb):
        axb = circ.xor(a, b)
        s = circ.xor(axb, c)
        c = circ.or_(circ.and_(a, b), circ.and_(axb, c))
        sums.append(s)
    return sums, c


def test_scheduler_levelizes_and_folds_frees():
    from tfhe_tpu.runtime import Circuit
    circ = Circuit(4)
    n0 = circ.not_(0)                 # free
    k1 = circ.const(True)             # free
    g1 = circ.and_(n0, 1)
    g2 = circ.xor(2, 3)
    g3 = circ.nand(g1, g2)
    m = circ.mux(g3, g1, k1)
    waves = circ.schedule()
    kinds = [k for k, _ in waves]
    # level 0: and + xor MERGED into one binary wave (one launch);
    # level 1: nand (binary); level 2: mux
    assert kinds == ["binary", "binary", "mux"]
    lvl0 = waves[0][1]
    assert sorted(g[0] for g in lvl0) == [1, 3]        # and + xor kinds
    # NOT folded into a negated reference of wire 0
    and_gate = [g for g in lvl0 if g[0] == 1][0]
    (_k, a_ref, b_ref, _c, _out) = and_gate
    assert a_ref == (0, True, False) and b_ref == (1, False, False)
    # const folded into the mux operand
    mux_wave = dict(waves)["mux"]
    assert mux_wave[0][3][0] == -1 and mux_wave[0][3][2] is True


def test_homomorphic_adder_matches_plain():
    from tfhe_tpu.runtime import Circuit, evaluate
    p = GATE_TOY
    rng = TfheRng(3)
    sk = gate.SecretKey.generate(p, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")

    W = 3                              # 3-bit adder
    circ = Circuit(2 * W + 1)
    xa = list(range(W))
    xb = list(range(W, 2 * W))
    sums, cout = _build_adder(circ, xa, xb, 2 * W)

    r = np.random.default_rng(5)
    va = int(r.integers(0, 2**W))
    vb = int(r.integers(0, 2**W))
    bits = [bool((va >> i) & 1) for i in range(W)] + \
           [bool((vb >> i) & 1) for i in range(W)] + [False]
    ct = gate.encrypt_bool(sk, np.array(bits), rng)

    out = evaluate(circ, ct, ck.data, p, sums + [cout], backend="onthefly")
    dec = gate.decrypt_bool(sk, out)
    got = sum(int(dec[i]) << i for i in range(W)) + (int(dec[W]) << W)
    assert got == va + vb, (va, vb, got)


def test_mux_chain_evaluates():
    from tfhe_tpu.runtime import Circuit, evaluate
    p = GATE_TOY
    rng = TfheRng(7)
    sk = gate.SecretKey.generate(p, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
    circ = Circuit(3)
    m = circ.mux(0, 1, 2)              # sel ? w1 : w2
    n = circ.not_(m)
    for sel in (False, True):
        bits = np.array([sel, True, False])
        ct = gate.encrypt_bool(sk, bits, rng)
        out = evaluate(circ, ct, ck.data, p, [m, n], backend="onthefly")
        dec = gate.decrypt_bool(sk, out)
        want = bits[1] if sel else bits[2]
        assert dec[0] == want and dec[1] == (not want)


def test_observability_records_waves():
    from tfhe_tpu.utils import observability as obs
    from tfhe_tpu.runtime import Circuit, evaluate
    obs.reset()
    p = GATE_TOY
    rng = TfheRng(11)
    sk = gate.SecretKey.generate(p, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
    circ = Circuit(2)
    g1 = circ.and_(0, 1)
    g2 = circ.xor(0, 1)
    ct = gate.encrypt_bool(sk, np.array([True, False]), rng)
    evaluate(circ, ct, ck.data, p, [g1, g2], backend="onthefly")
    rep = obs.report()
    # and + xor merge into ONE binary wave (one launch, two gates)
    assert rep["counters"]["circuit.waves"] == 1
    assert rep["counters"]["circuit.gates"] == 2
    assert rep["counters"]["bootstrap.launches"] == 1
    # the wave-jit cache persists across calls: at most one fresh compile
    assert rep["counters"].get("circuit.wave_compiles", 0) <= 1
    assert "circuit.wave.binary" in rep["spans"]
    assert rep["observations"]["circuit.wave_width"]["max"] == 2.0


def test_wave_width_capping(monkeypatch):
    """TFHE_MAX_WAVE_ROWS splits wide merged waves into capped launches
    without changing results (the HBM guard for wide levels)."""
    import jax.numpy as jnp
    from tfhe_tpu.runtime import Circuit, evaluate
    p = GATE_TOY
    rng = TfheRng(19)
    sk = gate.SecretKey.generate(p, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")
    W = 4
    circ = Circuit(2 * W)
    outs = [circ.xor(i, W + i) for i in range(W)] \
        + [circ.and_(i, W + i) for i in range(W)]     # one wide level
    r = np.random.default_rng(3)
    bits = r.integers(0, 2, 2 * W).astype(bool)
    ct = gate.encrypt_bool(sk, bits, rng)
    want = np.concatenate([bits[:W] ^ bits[W:], bits[:W] & bits[W:]])

    for cap in ("1", "3", "1000000"):
        monkeypatch.setenv("TFHE_MAX_WAVE_ROWS", cap)
        out = evaluate(circ, jnp.asarray(ct), ck.data, p, outs,
                       backend="onthefly")
        got = np.asarray(gate.decrypt_bool(sk, out))
        np.testing.assert_array_equal(got, want, err_msg=f"cap={cap}")


def test_wave_chaining_bit_identical(monkeypatch):
    """TFHE_WAVE_CHAIN=K (K consecutive launches traced into one XLA
    program) is BIT-identical to the per-launch path on a workload that
    exercises every structural case: merged mixed-kind binary waves,
    negated references, constant inputs, MUX waves, batched instances,
    and a chain boundary that cuts through a dependency chain."""
    import jax.numpy as jnp
    from tfhe_tpu.runtime import Circuit, evaluate
    from tfhe_tpu.runtime import scheduler

    p = GATE_TOY
    rng = TfheRng(23)
    sk = gate.SecretKey.generate(p, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")

    # comparator (mux-bearing) wired with an extra const+negation layer
    W = 4
    circ, outs = scheduler.comparator(W)
    k1 = circ.const(True)
    extra = circ.and_(circ.not_(outs[0]), k1)   # NOT + const operands
    outs = outs + [extra]

    B = 3
    xs = np.array([3, 9, 7], np.uint32)
    ys = np.array([5, 9, 2], np.uint32)
    bits = np.zeros((2 * W, B), bool)
    for i in range(W):
        bits[i] = (xs >> i) & 1
        bits[W + i] = (ys >> i) & 1
    cts = np.stack([np.asarray(gate.encrypt_bool(sk, bits[w], rng))
                    for w in range(2 * W)])

    monkeypatch.delenv("TFHE_WAVE_CHAIN", raising=False)
    ref = np.asarray(evaluate(circ, jnp.asarray(cts), ck.data, p, outs,
                              backend="onthefly"))
    for k in ("2", "3", "100"):
        monkeypatch.setenv("TFHE_WAVE_CHAIN", k)
        got = np.asarray(evaluate(circ, jnp.asarray(cts), ck.data, p,
                                  outs, backend="onthefly"))
        np.testing.assert_array_equal(got, ref, err_msg=f"chain={k}")
    dec = np.stack([np.asarray(gate.decrypt_bool(sk, got[:, b]))
                    for b in range(B)])               # (B, 4)
    np.testing.assert_array_equal(dec[:, 0], xs < ys)
    np.testing.assert_array_equal(dec[:, 1], xs == ys)
    np.testing.assert_array_equal(dec[:, 2], xs > ys)
    np.testing.assert_array_equal(dec[:, 3], ~(xs < ys))


def test_homomorphic_comparator_matches_plain(monkeypatch):
    """The MUX-bearing comparator tree (VERDICT r4 item 6): batched
    instances, mixed XNOR/AND level-0 wave, alternating AND/MUX merge
    levels, with the MUX launch-width cap engaged (TFHE_MAX_WAVE_ROWS
    small enough that the 4-wide mux wave x 6 instances splits)."""
    from tfhe_tpu.runtime import Circuit, evaluate
    from tfhe_tpu.runtime import scheduler
    monkeypatch.setenv("TFHE_MAX_WAVE_ROWS", "36")   # 36//(3*6)=2 muxes/launch
    p = GATE_TOY
    rng = TfheRng(11)
    sk = gate.SecretKey.generate(p, rng)
    ck = gate.CloudKey.generate(sk, rng, backend="onthefly")

    W = 8
    circ, outs = scheduler.comparator(W)
    kinds = [k for k, _ in circ.schedule()]
    assert "mux" in kinds, kinds                      # it IS mux-bearing

    xs = np.array([3, 200, 77, 0, 255, 128], np.uint32)
    ys = np.array([5, 200, 13, 0, 0, 127], np.uint32)
    B = len(xs)
    bits = np.zeros((2 * W, B), bool)
    for i in range(W):
        bits[i] = (xs >> i) & 1
        bits[W + i] = (ys >> i) & 1
    cts = np.stack([np.asarray(gate.encrypt_bool(sk, bits[w], rng))
                    for w in range(2 * W)])           # (2W, B, n+1)
    out = evaluate(circ, cts, ck.data, p, outs, backend="onthefly")
    dec = np.stack([np.asarray(gate.decrypt_bool(sk, out[:, b]))
                    for b in range(B)])               # (B, 3) lt/eq/gt
    np.testing.assert_array_equal(dec[:, 0], xs < ys)
    np.testing.assert_array_equal(dec[:, 1], xs == ys)
    np.testing.assert_array_equal(dec[:, 2], xs > ys)

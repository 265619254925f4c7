"""Batched homomorphic boolean-circuit evaluation — the "model" layer.

The reference has no circuit evaluator (its driver bootstraps a single
ciphertext in a loop); this module is the TPU-native replacement for the
upstream TFHE library's intended gate-API usage: circuits are described as
gate lists over wire ids and evaluated wave-by-wave, with every gate in a
wave batched into ONE bootstrap call (so a B-wide batch of C-gate circuits
costs ceil(C/waves) bootstraps of width B * wave_size).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp

from tfhe_tpu.boot import gate as G

# gate opcodes with (0, const) + a*x + b*y preamble before bootstrap(mu=1/8)
_AFFINE = {
    "nand": (G.MU_BOOL, -1, -1),
    "and": (-G.MU_BOOL, 1, 1),
    "or": (G.MU_BOOL, 1, 1),
    "nor": (-G.MU_BOOL, -1, -1),
    "xor": (1 << 30, 2, 2),
    "xnor": (-(1 << 30), -2, -2),
}


@dataclasses.dataclass(frozen=True)
class Gate:
    op: str              # one of _AFFINE keys, or "not" / "copy"
    out: int
    a: int
    b: int = -1


@dataclasses.dataclass
class Circuit:
    n_inputs: int
    n_wires: int
    gates: Sequence[Gate]
    outputs: Sequence[int]

    def schedule(self):
        """Group gates into waves of independent gates (all inputs already
        computed) so each wave is one batched bootstrap."""
        ready = set(range(self.n_inputs))
        pending = list(self.gates)
        waves = []
        while pending:
            wave = [g for g in pending
                    if g.a in ready and (g.b < 0 or g.b in ready)]
            if not wave:
                raise ValueError("circuit has a cycle or missing wire")
            waves.append(wave)
            ready.update(g.out for g in wave)
            pending = [g for g in pending if g not in wave]
        return waves


def evaluate(circ: Circuit, ck_data, params, inputs, backend: str = "onthefly"):
    """inputs: (B, n_inputs, n+1) LWE batch.  Returns (B, n_out, n+1)."""
    inputs = jnp.asarray(inputs)
    B = inputs.shape[0]
    n1 = inputs.shape[-1]
    wires: dict[int, jnp.ndarray] = {
        i: inputs[:, i] for i in range(circ.n_inputs)}

    for wave in circ.schedule():
        boot_gates = [g for g in wave if g.op in _AFFINE]
        for g in wave:
            if g.op == "not":
                wires[g.out] = -wires[g.a]
            elif g.op == "copy":
                wires[g.out] = wires[g.a]
        if boot_gates:
            pre = []
            for g in boot_gates:
                const, ca, cb = _AFFINE[g.op]
                t = jnp.zeros((B, n1), jnp.int32).at[:, -1].set(np.int32(const))
                t = t + ca * wires[g.a] + cb * wires[g.b]
                pre.append(t)
            stacked = jnp.concatenate(pre, axis=0)        # (W*B, n+1)
            out = G.bootstrap(stacked, ck_data, params, G.MU_BOOL, backend)
            for i, g in enumerate(boot_gates):
                wires[g.out] = out[i * B:(i + 1) * B]
    return jnp.stack([wires[o] for o in circ.outputs], axis=1)


def ripple_carry_adder(nbits: int) -> Circuit:
    """nbits-bit adder: inputs x[0..n), y[0..n); outputs sum[0..n) + carry.
    Built from XOR/AND/OR gates (a standard full-adder chain)."""
    gates = []
    wid = 2 * nbits          # next free wire
    x = lambda i: i
    y = lambda i: nbits + i
    outs = []
    carry = -1
    for i in range(nbits):
        if carry < 0:
            s = wid; gates.append(Gate("xor", s, x(i), y(i))); wid += 1
            c = wid; gates.append(Gate("and", c, x(i), y(i))); wid += 1
        else:
            axb = wid; gates.append(Gate("xor", axb, x(i), y(i))); wid += 1
            s = wid; gates.append(Gate("xor", s, axb, carry)); wid += 1
            t1 = wid; gates.append(Gate("and", t1, x(i), y(i))); wid += 1
            t2 = wid; gates.append(Gate("and", t2, axb, carry)); wid += 1
            c = wid; gates.append(Gate("or", c, t1, t2)); wid += 1
        outs.append(s)
        carry = c
    outs.append(carry)
    return Circuit(n_inputs=2 * nbits, n_wires=wid, gates=gates, outputs=outs)

"""Homomorphic boolean-circuit runtime: native scheduler + batched executor.

The graph side (construction, Kahn levelization, wave extraction,
criticality ordering) lives in C++ (native/circuit_sched.cpp, ctypes ABI);
this module is the executor that feeds each wave — a set of independent
same-kind gates — to ONE batched gate call (boot/gate.py), so a circuit
with W waves costs W fused blind-rotation launches regardless of gate
count.  NOT and constants are folded into wire references by the scheduler
and cost nothing (gate_not is sample negation; constants are noiseless
trivial samples).

This is the serving layer the reference never had: its drivers evaluate
one operation at a time on one core (poc drivers, SURVEY §2 L5); here the
batch axis of the TPU pipeline IS the gate-parallelism of the circuit.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np
import jax
import jax.numpy as jnp

_WAVE_JIT: dict = {}     # (kind, shape, params, backend) -> jitted wave fn

_KINDS = {"and": 1, "or": 2, "xor": 3, "nand": 4, "nor": 5, "xnor": 6,
          "not": 7, "const0": 8, "const1": 9, "mux": 10, "binary": 11}
_KIND_NAMES = {v: k for k, v in _KINDS.items()}

# every 2-input boolean gate is bootstrap(w*(x + sy*y) + (0,...,0,c0)):
# kind -> (c0, wx, wy) with t = wx*x + wy*y + c0 at the body coordinate
# (the affine encodings of boot/gate.py's gate_* functions)
_MU = 1 << 29
_AFFINE = {1: (-_MU, 1, 1),            # and
           2: (_MU, 1, 1),             # or
           3: (1 << 30, 2, 2),         # xor
           4: (_MU, -1, -1),           # nand
           5: (-_MU, -1, -1),          # nor
           6: (-(1 << 30), -2, -2)}    # xnor


def _lib():
    native = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")
    path = os.path.join(native, "libcircuit_sched.so")
    if not os.path.exists(path):
        import subprocess
        subprocess.run(["make", "-C", native, "libcircuit_sched.so"],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(path)
    lib.circ_new.restype = ctypes.c_int32
    lib.circ_gate.restype = ctypes.c_int32
    lib.circ_mux.restype = ctypes.c_int32
    lib.circ_schedule.restype = ctypes.c_int32
    lib.circ_wave.restype = ctypes.c_int32
    lib.circ_n_gates.restype = ctypes.c_int32
    lib.circ_n_wires.restype = ctypes.c_int32
    return lib


class Circuit:
    """Boolean circuit builder over wire ids (inputs are wires 0..n-1)."""

    def __init__(self, n_inputs: int):
        self._lib = _lib()
        self._h = self._lib.circ_new(n_inputs)
        self.n_inputs = n_inputs

    def __del__(self):
        try:
            self._lib.circ_free(self._h)
        except Exception:
            pass

    def gate(self, kind: str, a: int, b: int = -1) -> int:
        return int(self._lib.circ_gate(self._h, _KINDS[kind], a, b))

    def __getattr__(self, name):
        if name in ("and_", "or_", "xor", "nand", "nor", "xnor"):
            k = name.rstrip("_")
            return lambda a, b: self.gate(k, a, b)
        raise AttributeError(name)

    def not_(self, a: int) -> int:
        return self.gate("not", a)

    def const(self, v: bool) -> int:
        return self.gate("const1" if v else "const0", 0)

    def mux(self, c: int, x: int, y: int) -> int:
        """c ? x : y."""
        return int(self._lib.circ_mux(self._h, c, x, y))

    def schedule(self):
        """-> [(kind_name, [(gate_kind, a_ref, b_ref, c_ref, out_wire),
        ...]), ...] where each ref is (base_wire|-1, negated, const_val).
        Wave kinds are "binary" (all 2-input boolean gates of a level,
        mixed kinds — gate_kind carries the per-gate affine encoding) and
        "mux"."""
        n_waves = int(self._lib.circ_schedule(self._h))
        waves = []
        cap = max(1, int(self._lib.circ_n_gates(self._h)))
        buf = (ctypes.c_int32 * cap)()
        kind = ctypes.c_int32()
        info = (ctypes.c_int32 * 5)()
        for i in range(n_waves):
            cnt = int(self._lib.circ_wave(self._h, i, ctypes.byref(kind),
                                          buf, cap))
            assert cnt >= 0, cnt
            gates = []
            for g in buf[:cnt]:
                self._lib.circ_gate_info(self._h, g, info)
                gates.append((int(info[0]),
                              self._wire_ref(info[1]),
                              self._wire_ref(info[2]),
                              self._wire_ref(info[3]), int(info[4])))
            waves.append((_KIND_NAMES[kind.value], gates))
        return waves

    def _wire_ref(self, wire: int):
        if wire < 0:
            return None
        out = (ctypes.c_int32 * 3)()
        self._lib.circ_wire_ref(self._h, wire, out)
        return (int(out[0]), bool(out[1]), bool(out[2]))

    def resolve(self, wire: int):
        """Public wire reference for reading outputs."""
        return self._wire_ref(wire)


def evaluate(circ: Circuit, inputs, ck_data, params, outputs,
             backend: str = "matmul"):
    """Run the circuit homomorphically.

    inputs:  (n_inputs, n+1) LWE batch — or (n_inputs, B, n+1) for B
             parallel instances of the circuit (the serving shape: the
             instance axis multiplies every wave's bootstrap width).
    outputs: list of wire ids to return.
    Returns (len(outputs)[, B], n+1) LWE array.

    Each wave is ONE batched gate call; wave widths (x instance batch)
    amortize the fused blind-rotation launch over all independent gates of
    that kind.
    """
    from tfhe_tpu.boot import gate
    from tfhe_tpu.utils import observability as obs

    inputs = jnp.asarray(inputs)
    n = params.lwe.n
    batched = inputs.ndim == 3
    lead = inputs.shape[1:-1]
    store = {}                                   # base wire -> ciphertext
    for i in range(circ.n_inputs):
        store[i] = inputs[i]

    def fetch(ref):
        base, neg, cval = ref
        if base < 0:
            ct = jnp.broadcast_to(
                gate._trivial(gate.MU_BOOL if cval else -gate.MU_BOOL, n),
                (*lead, n + 1))
        else:
            ct = store[base]
        return -ct if neg else ct

    def run(kind, fn, *ops):
        # (W, [B,] n+1) -> flatten the wave x instance axes for the gate;
        # the whole wave runs as ONE jitted call (cached per kind x shape:
        # eager per-op dispatch through a remote accelerator link measured
        # ~10 s/wave of round trips vs ~0.5 s of device compute on the
        # 2048x16-bit-adder workload, bench_results/README.md)
        flat = [o.reshape(-1, n + 1) for o in ops]
        # env knobs read at trace time must key the cache too
        key = (kind, flat[0].shape, params, backend,
               os.environ.get("TFHE_V2_FLAT", "0"))
        if key not in _WAVE_JIT:
            _WAVE_JIT[key] = jax.jit(
                lambda ck, *xs: fn(ck, *xs, params, backend))
            obs.count("circuit.wave_compiles")
        # bootstrap.* counters fire here (the un-jitted boundary), since
        # gate.bootstrap's own counts only run at trace time under jit
        # mux = 2 launches (double-width first stage + recombine stage)
        # bootstrapping 3 ciphertext-widths per gate
        obs.count("bootstrap.launches", 2 if kind == "mux" else 1)
        obs.count("bootstrap.ciphertexts",
                  (3 if kind == "mux" else 1) * flat[0].shape[0])
        res = _WAVE_JIT[key](ck_data, *flat)
        return res.reshape(ops[0].shape)

    def run_binary(a, b, c0, wx, wy):
        # ONE launch for a whole level's mixed binary gates: the affine
        # combination t = wx*x + wy*y + (0,..,0,c0) is computed with the
        # per-gate constants as TRACED arrays, so the jit cache keys only
        # on the wave SHAPE — any kind mix of the same width reuses it.
        key = ("binary", a.shape, params, backend,
               os.environ.get("TFHE_V2_FLAT", "0"))
        if key not in _WAVE_JIT:
            def fnb(ck, a, b, c0, wx, wy):
                sh = (-1,) + (1,) * (a.ndim - 1)
                t = wx.reshape(sh) * a + wy.reshape(sh) * b
                t = t.at[..., -1].add(c0.reshape(sh[:-1]))
                flat = t.reshape(-1, n + 1)
                out = gate.bootstrap(flat, ck, params, gate.MU_BOOL,
                                     backend)
                return out.reshape(a.shape)
            _WAVE_JIT[key] = jax.jit(fnb)
            obs.count("circuit.wave_compiles")
        obs.count("bootstrap.launches")
        obs.count("bootstrap.ciphertexts",
                  int(np.prod(a.shape[:-1])) or 1)
        return _WAVE_JIT[key](ck_data, a, b, jnp.asarray(c0),
                              jnp.asarray(wx), jnp.asarray(wy))

    # Pass 1: walk the schedule into a flat, knee-capped launch list.
    # Each entry is ("binary"|"mux", [gate tuples]) and is exactly one
    # gate-call-sized unit; dependency order is launch-list order.
    launches = []
    max_rows = int(os.environ.get("TFHE_MAX_WAVE_ROWS", 8192))
    inst = int(np.prod(lead)) or 1
    for kind, gates in circ.schedule():
        obs.count("circuit.gates", len(gates))
        obs.count("circuit.waves")
        obs.observe("circuit.wave_width",
                    len(gates) * int(np.prod(lead)) if batched
                    else len(gates))
        if kind == "mux":
            # same launch-width cap as binary waves: each MUX costs 3
            # bootstraps, so cap at max_rows/3 mux gates x instances
            per = max(1, max_rows // (3 * inst))
            for s in range(0, len(gates), per):
                launches.append(("mux", gates[s:s + per]))
        else:
            # diagnostic knob: TFHE_WAVE_SPLIT=1 launches per kind
            # (the pre-round-4 behavior) for A/B measurement
            if os.environ.get("TFHE_WAVE_SPLIT", "") not in ("", "0"):
                groups = {}
                for g in gates:
                    groups.setdefault(g[0], []).append(g)
                groups = list(groups.values())
            else:
                groups = [gates]
            # cap launch width: a wide level (e.g. a 32-bit adder's
            # level 0 = 64 gates) x the instance batch can exceed HBM —
            # the keyswitch one-hot temporaries cost ~32 KB/ct, so a
            # 262k-row launch wants 8+ GB.  Split to <= max_rows.
            # Default 8192 = the measured v5e throughput knee: capping
            # every launch AT the knee measured 8,268 gate-bootstraps/s
            # on 8192-instance 32-bit adders vs 7,137 at a 16384 cap
            # (bench_results/circuit_adder32_r4 A/B).
            per = max(1, max_rows // inst)
            for grp in groups:
                for i in range(0, len(grp), per):
                    launches.append(("binary", grp[i:i + per]))

    # Pass 2: execute.  TFHE_WAVE_CHAIN=K traces K consecutive launches
    # into ONE jitted program (internal bootstraps stay at the knee width;
    # the host dispatch gap between dependent launches — measured ~16% of
    # adder wall-clock through the remote-device link,
    # bench_results/circuit_adder32_trace_r5.json — disappears between
    # chained launches).  Cache keys are structural (external operands by
    # first-use position, gate kinds/negations/constants folded into
    # traced affine arrays), so repeating circuit slices share compiles.
    chain_k = int(os.environ.get("TFHE_WAVE_CHAIN", "1"))
    if chain_k > 1:
        _run_chained(launches, chain_k, store, lead, n, ck_data, params,
                     backend)
    else:
        for kind, grp in launches:
            with obs.span(f"circuit.wave.{kind}"):
                if kind == "mux":
                    c = jnp.stack([fetch(g[1]) for g in grp])
                    x = jnp.stack([fetch(g[2]) for g in grp])
                    y = jnp.stack([fetch(g[3]) for g in grp])
                    res = run(kind, gate.gate_mux, c, x, y)
                else:
                    a = jnp.stack([fetch(g[1]) for g in grp])
                    b = jnp.stack([fetch(g[2]) for g in grp])
                    c0 = np.array([_AFFINE[g[0]][0] for g in grp], np.int32)
                    wx = np.array([_AFFINE[g[0]][1] for g in grp], np.int32)
                    wy = np.array([_AFFINE[g[0]][2] for g in grp], np.int32)
                    res = run_binary(a, b, c0, wx, wy)
                for i, g in enumerate(grp):
                    store[g[4]] = res[i]

    outs = []
    for w in outputs:
        outs.append(fetch(circ.resolve(w)))
    return jnp.stack(outs)


_CHAIN_JIT: dict = {}    # structural chain signature -> jitted chain fn


def _run_chained(launches, K, store, lead, n, ck_data, params, backend):
    """Execute the launch list in chains of K consecutive launches, each
    chain ONE jitted XLA program.

    Every launch inside a chain keeps its knee-capped width, but the host
    round-trip between dependent launches (the measured ~16% device-idle
    of the per-launch path, bench_results/circuit_adder32_trace_r5.json)
    only happens once per chain.  The jit cache keys on the chain's
    STRUCTURE — operand topology with external wires numbered by first
    use — while gate kinds, input negations and constant inputs are
    folded into traced affine/sign arrays, so e.g. every full-adder bit
    slice of a ripple adder hits the same compiled program."""
    from tfhe_tpu.boot import gate
    from tfhe_tpu.utils import observability as obs

    mu = int(gate.MU_BOOL)
    for s in range(0, len(launches), K):
        chain = launches[s:s + K]
        # host pass: structural signature + traced constant arrays
        ext_pos: dict = {}              # base wire -> ext stack index
        ext_wires: list = []
        internal: dict = {}             # base wire -> (desc idx, gate idx)
        sig = []
        tr = []

        def tag_of(ref):
            base, neg, cval = ref
            if base < 0:
                return ("c",), neg, cval
            if base in internal:
                return ("i",) + internal[base], neg, None
            if base not in ext_pos:
                ext_pos[base] = len(ext_wires)
                ext_wires.append(base)
            return ("e", ext_pos[base]), neg, None

        for d, (kind, grp) in enumerate(chain):
            gsig = []
            if kind == "binary":
                c0 = [0] * len(grp)
                wx = [0] * len(grp)
                wy = [0] * len(grp)
                for i, g in enumerate(grp):
                    gc0, gwx, gwy = _AFFINE[g[0]]
                    c0[i] = gc0
                    tags = []
                    for ref, w, arr in ((g[1], gwx, wx), (g[2], gwy, wy)):
                        t, neg, cval = tag_of(ref)
                        ws = -w if neg else w
                        if t[0] == "c":
                            # trivial (0,..,0,±mu) input: only the b
                            # coordinate contributes — fold into c0
                            c0[i] += ws * (mu if cval else -mu)
                            arr[i] = 0
                        else:
                            arr[i] = ws
                        tags.append(t)
                    gsig.append(tuple(tags))
                tr.extend(np.asarray(v, np.int64).astype(np.int32)
                          for v in (c0, wx, wy))
            else:                       # mux: c ? x : y
                sgn = [[1] * len(grp) for _ in range(3)]
                cv = [[0] * len(grp) for _ in range(3)]
                for i, g in enumerate(grp):
                    tags = []
                    for o, ref in enumerate((g[1], g[2], g[3])):
                        t, neg, cval = tag_of(ref)
                        if t[0] == "c":
                            cv[o][i] = (-1 if neg else 1) * (
                                mu if cval else -mu)
                        else:
                            sgn[o][i] = -1 if neg else 1
                        tags.append(t)
                    gsig.append(tuple(tags))
                tr.extend(np.asarray(v, np.int32)
                          for v in (*sgn, *cv))
            sig.append((kind, tuple(gsig)))
            for i, g in enumerate(grp):
                internal[g[4]] = (d, i)

        sig = tuple(sig)
        key = (sig, lead, n, params, backend,
               os.environ.get("TFHE_V2_FLAT", "0"))
        if key not in _CHAIN_JIT:
            _CHAIN_JIT[key] = jax.jit(
                _make_chain_fn(sig, lead, n, params, backend))
            obs.count("circuit.chain_compiles")
        inst = int(np.prod(lead)) or 1
        for kind, grp in chain:
            obs.count("bootstrap.launches", 2 if kind == "mux" else 1)
            obs.count("bootstrap.ciphertexts",
                      (3 if kind == "mux" else 1) * len(grp) * inst)
        if ext_wires:
            ext = jnp.stack([store[w] for w in ext_wires])
        else:
            ext = jnp.zeros((0, *lead, n + 1), jnp.int32)
        with obs.span("circuit.chain"):
            results = _CHAIN_JIT[key](ck_data, ext, *tr)
        for (kind, grp), res in zip(chain, results):
            for i, g in enumerate(grp):
                store[g[4]] = res[i]


def _make_chain_fn(sig, lead, n, params, backend):
    from tfhe_tpu.boot import gate

    def chain_fn(ck, ext, *tr):
        results = []

        def row(t, cv):
            if t[0] == "e":
                return ext[t[1]]
            if t[0] == "i":
                return results[t[1]][t[2]]
            z = jnp.zeros((*lead, n + 1), jnp.int32)
            return z.at[..., -1].set(cv)

        ti = 0
        for kind, gsig in sig:
            if kind == "binary":
                c0, wx, wy = tr[ti:ti + 3]
                ti += 3
                a = jnp.stack([row(t[0], 0) for t in gsig])
                b = jnp.stack([row(t[1], 0) for t in gsig])
                sh = (-1,) + (1,) * (a.ndim - 1)
                t = wx.reshape(sh) * a + wy.reshape(sh) * b
                t = t.at[..., -1].add(c0.reshape(sh[:-1]))
                out = gate.bootstrap(t.reshape(-1, n + 1), ck, params,
                                     gate.MU_BOOL, backend)
                results.append(out.reshape(a.shape))
            else:
                sc, sx, sy, cc, cx, cy = tr[ti:ti + 6]
                ti += 6
                c = jnp.stack([row(t[0], cc[i])
                               for i, t in enumerate(gsig)])
                x = jnp.stack([row(t[1], cx[i])
                               for i, t in enumerate(gsig)])
                y = jnp.stack([row(t[2], cy[i])
                               for i, t in enumerate(gsig)])
                sh = (-1,) + (1,) * (c.ndim - 1)
                c = sc.reshape(sh) * c
                x = sx.reshape(sh) * x
                y = sy.reshape(sh) * y
                flat = [o.reshape(-1, n + 1) for o in (c, x, y)]
                res = gate.gate_mux(ck, *flat, params, backend)
                results.append(res.reshape(c.shape))
        return tuple(results)

    return chain_fn


def comparator(nbits: int):
    """nbits-bit unsigned comparator over wires x[0..n) ++ y[0..n):
    returns (Circuit, [lt, eq, gt]) with lt = (x < y).

    The MUX-bearing second workload (VERDICT r4 item 6): a log-depth
    merge tree.  Level 0 computes per-bit e_i = XNOR(x_i, y_i) and
    l_i = AND(NOT x_i, y_i) as one mixed binary wave; each merge level
    then combines adjacent segments (hi, lo) with

        eq = AND(eq_hi, eq_lo)
        lt = MUX(eq_hi, lt_lo, lt_hi)      # if hi bits equal, low decides

    so the schedule alternates binary and MUX waves of halving width
    (16, 8, 4, 2, 1 for nbits=32) — exactly the ragged irregular-fan-out
    shape the adder workload never exercises.  gt = NOR(lt, eq)."""
    assert nbits & (nbits - 1) == 0, "power-of-two widths only"
    circ = Circuit(2 * nbits)
    # bit i of x is wire i, of y is wire nbits+i; MSB-first segment lists
    eqs = []
    lts = []
    for i in reversed(range(nbits)):
        eqs.append(circ.gate("xnor", i, nbits + i))
        lts.append(circ.gate("and", circ.not_(i), nbits + i))
    while len(eqs) > 1:
        eqs2, lts2 = [], []
        for s in range(0, len(eqs), 2):
            hi_eq, lo_eq = eqs[s], eqs[s + 1]
            hi_lt, lo_lt = lts[s], lts[s + 1]
            lts2.append(circ.mux(hi_eq, lo_lt, hi_lt))
            eqs2.append(circ.gate("and", hi_eq, lo_eq))
        eqs, lts = eqs2, lts2
    gt = circ.gate("nor", lts[0], eqs[0])
    return circ, [lts[0], eqs[0], gt]


def ripple_carry_adder(nbits: int):
    """nbits-bit adder over wires x[0..n) ++ y[0..n): returns
    (Circuit, [sum wires..., carry]) — the standard full-adder chain
    (XOR/AND/OR), the workload of tools/circuit_bench.py."""
    circ = Circuit(2 * nbits)
    outs = []
    carry = -1
    for i in range(nbits):
        x, y = i, nbits + i
        if carry < 0:
            s = circ.gate("xor", x, y)
            carry = circ.gate("and", x, y)
        else:
            axb = circ.gate("xor", x, y)
            s = circ.gate("xor", axb, carry)
            t1 = circ.gate("and", x, y)
            t2 = circ.gate("and", axb, carry)
            carry = circ.gate("or", t1, t2)
        outs.append(s)
    outs.append(carry)
    return circ, outs

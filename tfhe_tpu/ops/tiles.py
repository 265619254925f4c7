"""VMEM-budget-driven tile selection for the fused CMux kernels.

Replaces the hard-coded tm/tb constants and the N<=512 / batch-knee rules
that were scattered through engine.py and bench.py (VERDICT r2 item 7):
every fused-kernel dispatch computes a VMEM model of its blocks and
scratch buffers — fast-streaming operand blocks (key/digit streams)
counted twice for Pallas's double buffering, slowly-revisited accumulator
blocks once — and picks the largest batch tile that fits the budget.

Calibration (v5e measurements, round 3): with a 15 MiB budget the model
reproduces every observed good/bad point: fused_cmux_step_v2 fits
N=512/k=2 at tm=256 (production, 704 us/step) and busts every tile at
N=1024/k=1 (the measured 1.9x starved-pipelining slowdown — engine.py
history — so the chooser returns None and dispatch falls through to the
chunked kernel); ck_cmux_step32 fits N=1024 at tm=128 (1124 us/step,
measured fastest) but not tm=256 (measured 1984 us); ck_dot64p fits
CB_MXU at tm=128/lgsize=1 (measured fastest) but not tm=256.

Round-4 re-validation: the 16 MB Mosaic scoped-VMEM cap turned out to be
SOFT (pallas_kernels.VMEM_LIMIT raises it to 64 MB), so every rejected
point was re-measured with the cap raised (tools/vmem_retune.py):
ck32 N=1024 tm=256/512 are still 2x slower than tm=128 (2057/2017 vs
1035 us), fused_v2 N=1024 still starves (1944 us at tm=128), and
ck_dot64p tm=256 is within noise of tm=128.  The budget below therefore
still encodes the PERFORMANCE frontier, not an allocation limit — do not
raise it without fresh same-process measurements.
"""

from __future__ import annotations

VMEM_BUDGET = 15 * 2**20
_TM_CANDIDATES = (512, 256, 128, 64)
# the chunked kernels measured FASTER at tm=128 than tm=256 even where 256
# fits the budget (1124 vs 1984 us at N=1024; 749 vs 1675 at N=512/k=2):
# their per-chunk ring RMWs scale with tm while the dots pipeline fine at
# M=128, so cap their tiles there.
_TM_CANDIDATES_CK = (128, 64)


def _fit(bytes_fn, B: int, budget: int = VMEM_BUDGET,
         candidates=_TM_CANDIDATES) -> int | None:
    for tm in candidates:
        if tm <= B and B % tm == 0 and bytes_fn(tm) <= budget:
            return tm
    return None


def v2_bytes(N: int, kp1: int, l: int, L: int, tm: int) -> int:
    """fused_cmux_step_v2 (dense per-step Toeplitz) VMEM model."""
    J = kp1 * l
    w = 2 * L * N * kp1 * N                  # L W operands, dbl-buf
    acc = 3 * tm * kp1 * N * 4               # acur/accn/out blocks
    scratch = (2 * tm * N * 4                # rot, orig
               + 2 * tm * J * N              # dig ping/pong
               + tm * kp1 * N * 4)           # output accumulator
    return w + acc + scratch


def ck32_bytes(N: int, kp1: int, l: int, L: int, m: int, tm: int) -> int:
    """ck_cmux_step32 (chunked pre-shifted keys) VMEM model."""
    Jm = kp1 * l * m
    ckp = -(-Jm // 128) * 128
    C = N // m
    w = 2 * L * Jm * (N + m)                 # per-u W block, dbl-buf
    acc = 2 * tm * kp1 * N * 4 + tm * N * 4  # acc/accn + out blocks
    scratch = (2 * tm * N * 4 + 2 * tm * C * ckp + tm * 2 * N * 4)
    return w + acc + scratch


def ck64_bytes(N: int, kp1: int, l: int, P: int, m: int, lgsize: int,
               tm: int) -> int:
    """ck_dot64p VMEM model (the rotate kernel is smaller at equal tb)."""
    Jm = kp1 * l * m
    ckp = -(-Jm // 128) * 128
    C = N // m
    x = 2 * tm * C * P * ckp
    w = 2 * lgsize * Jm * (N + m)
    out = 2 * lgsize * tm * N * 4
    return x + w + out + tm * 2 * N * 4


def choose_v2_tm(N: int, kp1: int, l: int, L: int, B: int) -> int | None:
    # empirical: Mosaic's scoped-vmem accounting for this kernel grows with
    # the grid (measured at GATE_FAST2/tm=256: B=8192 compiles under 16M,
    # B=16384 busts at 16.88M — ~107 bytes/batch-row), so charge that
    # against a matching 15.5 MiB budget; at 16384 the chooser then drops
    # to tm=128.
    return _fit(lambda tm: v2_bytes(N, kp1, l, L, tm) + 107 * B, B,
                budget=int(15.2 * 2**20))


def choose_ck32_tm(N: int, kp1: int, l: int, L: int, m: int,
                   B: int) -> int | None:
    return _fit(lambda tm: ck32_bytes(N, kp1, l, L, m, tm), B,
                candidates=_TM_CANDIDATES_CK)


def choose_ck64_tm(N: int, kp1: int, l: int, P: int, m: int, lgsize: int,
                   B: int) -> int | None:
    return _fit(lambda tm: ck64_bytes(N, kp1, l, P, m, lgsize, tm), B,
                candidates=_TM_CANDIDATES_CK)

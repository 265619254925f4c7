#!/usr/bin/env python3
"""Generate the PATCHED reference TU for the end-to-end circuit-bootstrap
anchor (VERDICT r2 item 3).

The PoC's blind-rotation `(X^aibar - 1) * acc` has two bugs (PARITY.md,
ASan-verified): the aibar < N branch copies wrapped coefficients without
the negacyclic sign flip, and the aibar >= N branch indexes acc1 below the
buffer (heap OOB) on both lines.  This script applies the three-line fix —
the mathematically consistent negacyclic rotation, matching the library's
torusPolynomialMulByXaiMinusOne (numeric_functions.cpp:304-323) — to a
COPY of the TU so `tfhe_CircuitBootstrapFFT` becomes deterministic and
anchorable.  Nothing in /root/reference is modified.

Usage: patch_poc.py <src poc_CircuitBootstrapping.cpp> <dst>
"""
import sys

src, dst = sys.argv[1], sys.argv[2]
text = open(src).read()

FIXES = [
    # aibar < N wrapped half: add the missing negacyclic negation
    ("for (int j = 0; j < aibar; ++j) acc2->a[q].coefs[j] = "
     "acc1->a[q].coefs[j-aibar+N_lvl2] - acc1->a[q].coefs[j];",
     "for (int j = 0; j < aibar; ++j) acc2->a[q].coefs[j] = "
     "- acc1->a[q].coefs[j-aibar+N_lvl2] - acc1->a[q].coefs[j]; /*PATCHED*/"),
    # aibar >= N, j < aibar-N: double wrap -> +2N index (was OOB j-aibar+N)
    ("for (int j = 0; j < aibar-N_lvl2; ++j) acc2->a[q].coefs[j] = "
     "acc1->a[q].coefs[j-aibar+N_lvl2] - acc1->a[q].coefs[j];",
     "for (int j = 0; j < aibar-N_lvl2; ++j) acc2->a[q].coefs[j] = "
     "acc1->a[q].coefs[j-aibar+2*N_lvl2] - acc1->a[q].coefs[j]; /*PATCHED*/"),
    # aibar >= N, j >= aibar-N: single wrap -> +N index (was OOB j-aibar)
    ("for (int j = aibar-N_lvl2; j < N_lvl2; ++j) acc2->a[q].coefs[j] = "
     "-acc1->a[q].coefs[j-aibar] - acc1->a[q].coefs[j];",
     "for (int j = aibar-N_lvl2; j < N_lvl2; ++j) acc2->a[q].coefs[j] = "
     "-acc1->a[q].coefs[j-aibar+N_lvl2] - acc1->a[q].coefs[j]; /*PATCHED*/"),
]
for old, new in FIXES:
    if old not in text:
        sys.exit(f"patch anchor not found in {src}:\n{old}")
    text = text.replace(old, new, 1)
assert text.count("/*PATCHED*/") == 3
open(dst, "w").write(text)
print(f"patched TU written to {dst}")

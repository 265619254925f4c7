#!/usr/bin/env python3
"""Produce build/lwe_functions_fixed.cpp from the reference's
lwe_functions.cpp (read-only mount untouched).

ONE syntax repair, printed below: line 17 of the TU is a mangled
constructor definition —

    struct LweParams(int n, double alpha_min, double alpha_max) {} n(n), ...

which is not C++ (the file is a function-body dump of the upstream API;
the `LweParams::LweParams` qualifier and the `:` of the initializer list
were lost).  Restore the obvious intended form.  Everything else is copied
byte-for-byte.
"""
import sys

BROKEN = ("struct LweParams(int n, double alpha_min, double alpha_max) {} "
          "n(n), alpha_min(alpha_min), alpha_max(alpha_max);")
FIXED = ("LweParams::LweParams(int n, double alpha_min, double alpha_max) : "
         "n(n), alpha_min(alpha_min), alpha_max(alpha_max) {}")


def main(src, dst):
    text = open(src).read()
    assert BROKEN in text, "expected mangled LweParams constructor not found"
    patched = text.replace(BROKEN, FIXED, 1)
    with open(dst, "w") as f:
        f.write(patched)
    print(f"patch_lib: restored LweParams constructor syntax\n"
          f"  - {BROKEN}\n  + {FIXED}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

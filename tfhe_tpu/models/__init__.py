"""Application-level constructions over the crypto layers.

Boolean-circuit evaluation lives in tfhe_tpu.runtime (native scheduler
+ batched executor); this package keeps constructions with their own
math, currently the TGSW LUT/CMux-tree evaluator (lut.py).
"""

"""tfhe_tpu — a TPU-native TFHE primitive library (JAX / XLA / Pallas).

Built from scratch against the capability surface of ``tfhe/experimental-tfhe``
(see SURVEY.md at the repo root).  The compute path is exact integer
arithmetic mapped onto the TPU MXU (int8 limb matmuls / convolutions) rather
than a port of the reference's x86 double-precision FFT: TFHE torus values are
int32/int64 arrays with native two's-complement wrap-around, and every
negacyclic polynomial product is an exact mod-2^32 / mod-2^64 computation.

Layer map (mirrors SURVEY.md §1 of the reference, re-designed TPU-first):

  L0/L1  ops.engine     — negacyclic product engines (MXU matmul / conv / naive)
  L2     ops.poly/fft   — polynomial helpers + anticyclic FFT engines
  L3     lwe/tlwe/tgsw  — batched ciphertext types & sample-level ops
  L4     boot.*         — blind rotation, gate bootstrap, circuit bootstrap
  L5     models.*       — homomorphic boolean API / LUT evaluation
  L6     parallel.*     — Mesh/shard_map scale-out of ciphertext batches
"""

import jax as _jax

# Torus64 (the reference's lvl2 arithmetic, poc_types.h:14) requires 64-bit
# integer lanes; JAX defaults to 32-bit unless x64 is enabled.  Float dtypes
# are kept explicit (f32/bf16) everywhere so TPU never sees f64.
_jax.config.update("jax_enable_x64", True)

from tfhe_tpu import params as params
from tfhe_tpu import torus as torus
from tfhe_tpu import rng as rng

__version__ = "0.1.0"

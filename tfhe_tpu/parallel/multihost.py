"""Multi-host orchestration: jax.distributed startup, host-aware mesh
construction, and cross-host key/batch placement (SURVEY.md §2.4/§5 —
the reference's only parallel runtime is single-process OpenMP,
parallel/src/Makefile:1-2; the TPU-native replacement spans hosts).

Design (the key-placement policy, SURVEY §7 "key material size & movement"):

  * dp (ciphertext batch) is the ONLY axis that crosses hosts.  It needs
    no collectives — the blind-rotation scan, key switches and extraction
    are all batch-local — so nothing rides DCN during a bootstrap except
    the initial batch scatter and final gather, exactly like the
    reference's embarrassingly-parallel OpenMP loop
    (test_parallel_multiplications.cpp:62).
  * ep (key/digit-row sharding) stays INSIDE a host: the mesh is built
    (hosts, local_dp, ep) with ep innermost, so every per-step psum of the
    partial external products reduces over ICI-connected devices only.
  * Key material is generated deterministically (seeded TfheRng) on every
    host and placed host-locally: bk/ksw shards for a host's devices come
    from that host's copy — zero key bytes cross DCN.  (For keys too large
    to generate everywhere, serialize once and broadcast out of band; the
    placement below is unchanged.)

Startup: call `initialize()` (env-driven) or `initialize(coordinator,
num_processes, process_id)` before any jax computation; single-process
callers may skip it entirely — every helper degrades to the local mesh.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env fallbacks (TFHE_COORDINATOR,
    TFHE_NUM_PROCESSES, TFHE_PROCESS_ID).  No-op when single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "TFHE_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("TFHE_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("TFHE_PROCESS_ID", "0"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multihost_mesh(ep: int = 1) -> Mesh:
    """(dp, ep) mesh with hosts on the OUTER dp blocks and every ep group
    contained in one host (ep collectives ride ICI, dp crosses DCN with no
    collectives).  Works single-process too (then it's just device order)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    per_host = len(jax.local_devices())
    assert per_host % ep == 0, (
        f"ep={ep} must divide the {per_host} devices of each host so the "
        "per-step psum stays intra-host")
    dp = n // ep
    grid = np.array(devs).reshape(n // per_host, per_host // ep, ep)
    return Mesh(grid.reshape(dp, ep), ("dp", "ep"))


def place_batch(samples_local, mesh: Mesh):
    """Host-local batch slice -> global (dp-sharded) array.  Each process
    passes ITS rows; globally the batch is the host-order concatenation."""
    return multihost_utils.host_local_array_to_global_array(
        samples_local, mesh, P("dp", None))


def place_keys(key_data, mesh: Mesh, backend: str = "onthefly"):
    """Deterministically-regenerated key pytree -> global placement: bk
    leaves sharded over ep (each host serves its own devices from its own
    copy), key-switch rows likewise; nothing crosses DCN."""
    from tfhe_tpu.parallel.shard import _bk_ep_spec
    bk_spec = _bk_ep_spec(backend)
    return {
        "bk": jax.tree.map(
            lambda v: multihost_utils.host_local_array_to_global_array(
                v, mesh, bk_spec), key_data["bk"]),
        "ksw": multihost_utils.host_local_array_to_global_array(
            key_data["ksw"], mesh, P(None, "ep", None)),
    }


def place_circuit_keys(key_data, mesh: Mesh, backend: str = "chunked"):
    """CircuitCloudKey.data -> global placement (key policy per
    shard.circuit_key_shardings): every host regenerates or loads the raw
    keys and builds its wm locally, so the ~8 GB pre-shifted lvl2 bk and
    the 2.7 GB privKS table never cross DCN; leaves shard over ep."""
    from tfhe_tpu.parallel.shard import _cb_bk_ep_spec
    bk_spec = _cb_bk_ep_spec(backend)
    g = multihost_utils.host_local_array_to_global_array
    return {
        "bk": jax.tree.map(lambda v: g(v, mesh, bk_spec), key_data["bk"]),
        "preks": g(key_data["preks"], mesh, P(None, "ep", None)),
        "privks": g(key_data["privks"], mesh, P(None, None, "ep", None)),
    }


def gather_batch(out_global, mesh: Mesh):
    """Global dp-sharded result -> this host's local rows (numpy).
    Works for any rank (LWE batches are rank 2, TRGSW batches rank 5)."""
    spec = P("dp", *([None] * (out_global.ndim - 1)))
    return multihost_utils.global_array_to_host_local_array(
        out_global, mesh, spec)

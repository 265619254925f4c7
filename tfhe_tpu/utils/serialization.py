"""Key-material serialization (the checkpoint subsystem the reference lacks:
SURVEY.md §5 — "Keys live only in RAM (Globals ctor)"; bootstrap keys are
hundreds of MB, so a stable on-disk format is required for deployment).

Format: one .npz holding every array leaf plus a JSON skeleton describing
the nesting (dicts / lists / tuples with leaf references) and the parameter
dataclasses.  No pickling anywhere.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp


def _params_to_dict(obj):
    if dataclasses.is_dataclass(obj):
        return {"__dc__": type(obj).__name__,
                **{f.name: _params_to_dict(getattr(obj, f.name))
                   for f in dataclasses.fields(obj)}}
    return obj


def _params_from_dict(d):
    if isinstance(d, dict) and "__dc__" in d:
        from tfhe_tpu import params as P
        cls = getattr(P, d["__dc__"])
        kw = {k: _params_from_dict(v) for k, v in d.items() if k != "__dc__"}
        return cls(**kw)
    return d


def _encode(tree, arrays: dict, prefix: str = "r"):
    if isinstance(tree, dict):
        return {"__t__": "dict",
                "items": {k: _encode(v, arrays, f"{prefix}.{k}")
                          for k, v in tree.items()}}
    if isinstance(tree, (list, tuple)):
        return {"__t__": "list" if isinstance(tree, list) else "tuple",
                "items": [_encode(v, arrays, f"{prefix}.{i}")
                          for i, v in enumerate(tree)]}
    key = f"leaf_{len(arrays)}"
    arrays[key] = np.asarray(tree)
    return {"__t__": "leaf", "key": key}


def _decode(skel, z, device):
    t = skel["__t__"]
    if t == "dict":
        return {k: _decode(v, z, device) for k, v in skel["items"].items()}
    if t in ("list", "tuple"):
        items = [_decode(v, z, device) for v in skel["items"]]
        return items if t == "list" else tuple(items)
    arr = z[skel["key"]]
    return jax.device_put(arr, device) if device is not None else arr


def save_keydata(path: str, key_data, params=None, meta: dict | None = None,
                 compress: bool = True):
    """Serialize a key pytree (e.g. CloudKey.data: nested dict/list/tuple of
    arrays) with its parameter dataclasses.

    compress=False skips zlib: encrypted key material is uniformly random
    (incompressible), and compressing a multi-GB circuit key measured
    ~400 s on a 2-core host vs seconds of raw IO."""
    arrays: dict[str, np.ndarray] = {}
    skel = _encode(key_data, arrays)
    header = {
        "skeleton": skel,
        "params": _params_to_dict(params) if params is not None else None,
        "meta": meta or {},
        "version": 1,
    }
    savez = np.savez_compressed if compress else np.savez
    savez(path, __header__=np.frombuffer(json.dumps(header).encode(),
                                         np.uint8), **arrays)
    return path


def load_keydata(path: str, device=None):
    """-> (key_pytree, params, meta)."""
    z = np.load(path)
    header = json.loads(bytes(z["__header__"]).decode())
    tree = _decode(header["skeleton"], z, device)
    return tree, _params_from_dict(header["params"]), header["meta"]


def save_circuit_key(path: str, ck):
    """Serialize a CircuitCloudKey at RAW-bk scale.

    The chunked backend's prepared wm is ~m/2 x the raw bk (~8 GB at
    CB_MXU/m=64) — far too large to ship or store.  The stable on-disk
    form is therefore {preks limbs, privks limbs, RAW TRGSW64 bk}; the
    prepared form is rebuilt ON the accelerator at load
    (circuit.prepare_circuit_bk), exactly like keygen does.  Requires
    CircuitCloudKey.generate(keep_raw_bk=True).
    """
    if ck.bk_raw is None:
        raise ValueError("CircuitCloudKey was generated without "
                         "keep_raw_bk=True: no raw bk to serialize")
    return save_keydata(path, {
        "preks": np.asarray(ck.preks.w_limbs),
        "privks": np.asarray(ck.privks.w_limbs),
        "bk_raw": np.asarray(ck.bk_raw),
    }, params=ck.params, meta={"backend": ck.backend,
                               "format": "circuit_raw_bk", "version": 1},
        compress=False)


def load_circuit_key(path: str, backend: str | None = None, device=None):
    """-> (key_data dict for circuit_bootstrap, CircuitParams).

    Rebuilds the engine-prepared bk from the stored raw TRGSW64 on the
    accelerator; preks/privks load verbatim.  `backend` overrides the
    stored one (the raw bk serves any engine)."""
    from tfhe_tpu.boot import circuit as _circuit
    from tfhe_tpu.utils import observability as obs
    tree, params, meta = load_keydata(path)
    if meta.get("format") != "circuit_raw_bk":
        raise ValueError(f"not a circuit key file: {meta}")
    backend = backend or meta["backend"]
    if device is None and jax.devices()[0].platform != "cpu":
        device = jax.devices()[0]
    with obs.span("keyload.circuit.bk_prepare"):
        prep = _circuit.prepare_circuit_bk(jnp.asarray(tree["bk_raw"]),
                                           params, backend)
        jax.block_until_ready(prep)
    with obs.span("keyload.circuit.ks_transfer"):
        preks = jax.device_put(tree["preks"], device) \
            if device is not None else jnp.asarray(tree["preks"])
        privks = jax.device_put(tree["privks"], device) \
            if device is not None else jnp.asarray(tree["privks"])
        jax.block_until_ready((preks, privks))
    return {"preks": preks, "bk": prep, "privks": privks}, params

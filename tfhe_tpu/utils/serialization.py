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


def save_keydata(path: str, key_data, params=None, meta: dict | None = None):
    """Serialize a key pytree (e.g. CloudKey.data: nested dict/list/tuple of
    arrays) with its parameter dataclasses."""
    arrays: dict[str, np.ndarray] = {}
    skel = _encode(key_data, arrays)
    header = {
        "skeleton": skel,
        "params": _params_to_dict(params) if params is not None else None,
        "meta": meta or {},
        "version": 1,
    }
    np.savez_compressed(
        path, __header__=np.frombuffer(json.dumps(header).encode(), np.uint8),
        **arrays)
    return path


def load_keydata(path: str, device=None):
    """-> (key_pytree, params, meta)."""
    z = np.load(path)
    header = json.loads(bytes(z["__header__"]).decode())
    tree = _decode(header["skeleton"], z, device)
    return tree, _params_from_dict(header["params"]), header["meta"]

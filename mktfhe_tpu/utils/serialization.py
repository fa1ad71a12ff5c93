"""Key/scheme serialization.

The reference has no serialization whatsoever (SURVEY.md section 5): keys
live only in process memory, so the minutes-scale keygen reruns on every
start.  Here every key object (party bootstrapping keys, aggregated
schemes) is a flat dataclass/NamedTuple of arrays, so checkpoints are plain
.npz archives with a tiny manifest.
"""

from __future__ import annotations

import dataclasses
import importlib

import jax.numpy as jnp
import numpy as np


def _fields(obj):
    if dataclasses.is_dataclass(obj):
        return [f.name for f in dataclasses.fields(obj)]
    if hasattr(obj, "_fields"):  # NamedTuple
        return list(obj._fields)
    raise TypeError(f"not a serializable key object: {type(obj)}")


def save(path: str, obj) -> None:
    """Save a dataclass/NamedTuple of arrays to an .npz archive."""
    arrays = {name: np.asarray(getattr(obj, name)) for name in _fields(obj)}
    cls = type(obj)
    np.savez(
        path,
        __module__=np.array(cls.__module__),
        __qualname__=np.array(cls.__qualname__),
        **arrays,
    )


def load(path: str):
    """Load an object saved by `save`, reconstructing its class."""
    with np.load(path, allow_pickle=False) as z:
        mod = importlib.import_module(str(z["__module__"]))
        cls = mod
        for part in str(z["__qualname__"]).split("."):
            cls = getattr(cls, part)
        kwargs = {
            k: jnp.asarray(z[k])
            for k in z.files
            if k not in ("__module__", "__qualname__")
        }
    return cls(**kwargs)

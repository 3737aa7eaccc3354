"""Checkpoint / resume (SURVEY.md §5).

The reference inherits opaque binary checkpoints and XML serialization from
OpenMM (§2b N8); here the State pytree (positions, velocities, box, RNG key,
step count, every extended variable — thermostat chains, SIN(R) v1/v2,
barostat statistics, neighbor buckets) flattens losslessly into one
np.savez file. Exact resume: a restored state continues bit-for-bit on the
same build. For multi-host sharded states, switch to orbax; single-chip runs
(the reference's scope) need only this.
"""
from __future__ import annotations

import dataclasses
import importlib
import json

import jax
import jax.numpy as jnp
import numpy as np

from .state import State
from .utils import replace

_SCHEMA = "atomsmm_tpu-state-v1"
_SYS_SCHEMA = "atomsmm_tpu-system-v1"


def save_checkpoint(path: str, state: State) -> None:
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(
        path,
        __schema__=np.asarray(_SCHEMA),
        __extra_keys__=np.asarray(sorted(state.extra), dtype=object),
        **arrays,
    )


def load_checkpoint(path: str, like: State) -> State:
    """Restore a state with the same pytree structure as `like` (the schema
    carries values, not structure — the System/Integrator define structure)."""
    with np.load(path, allow_pickle=True) as data:
        schema = str(data["__schema__"])
        if schema != _SCHEMA:
            raise ValueError(f"unknown checkpoint schema {schema!r}")
        saved_keys = [str(k) for k in data["__extra_keys__"]]
        cur_keys = sorted(like.extra)
        fresh = {}
        if saved_keys != cur_keys:
            missing = [k for k in cur_keys if k not in saved_keys]
            unknown = [k for k in saved_keys if k not in cur_keys]
            if unknown or not missing:
                raise ValueError(
                    "checkpoint extended variables do not match the current "
                    f"integrator: saved {saved_keys}, expected {cur_keys}"
                )
            # Forward compatibility: extended variables ADDED since the
            # checkpoint was written (e.g. a new zero-initialized counter
            # like baro_nbadtrials) restore from `like`'s freshly
            # initialized values instead of refusing to resume. Unknown
            # saved keys still raise — dropping saved dynamics state would
            # not be an exact resume.
            import warnings

            warnings.warn(
                f"checkpoint predates extended variables {missing}; "
                "initializing them fresh (everything else resumes exactly)",
                stacklevel=2,
            )
            fresh = {k: like.extra[k] for k in missing}
            like = replace(
                like, extra={k: like.extra[k] for k in saved_keys}
            )
        leaves_like, treedef = jax.tree.flatten(like)
        leaves = [
            jnp.asarray(data[f"leaf_{i}"], leaves_like[i].dtype)
            for i in range(len(leaves_like))
        ]
    restored = jax.tree.unflatten(treedef, leaves)
    return restored.with_extra(**fresh) if fresh else restored


# ---------------------------------------------------------------------------
# System serialization — the XmlSerializer analog (SURVEY.md §2b N8).
#
# Every engine object (System, Force subclasses, NeighborSpec,
# BlockNeighborSpec, ConstraintSet) is a pytree dataclass, so serialization
# is generic: record class path + per-field values, with arrays hoisted into
# the npz payload and structure in a JSON header. Deserialization imports
# classes ONLY from this package (no arbitrary code execution).
#
# Known limitation vs the reference: OpenMM's XmlSerializer stores Lepton
# energy *strings*; our Custom{Nonbonded,Bond}Force carry Python callables,
# which cannot be serialized — saving one raises with a pointer to rebuild
# it in code. All built-in forces round-trip bitwise.
# ---------------------------------------------------------------------------


def _serialize(obj, arrays: dict):
    if obj is None or isinstance(obj, (bool, int, str)):
        return obj
    if isinstance(obj, float):
        return {"__float__": repr(obj)}  # exact round-trip
    if isinstance(obj, (jnp.ndarray, np.ndarray)) or np.isscalar(obj):
        key = f"a{len(arrays)}"
        arrays[key] = np.asarray(obj)
        return {"__array__": key}
    if isinstance(obj, tuple):
        return {"__tuple__": [_serialize(v, arrays) for v in obj]}
    if isinstance(obj, list):
        return {"__list__": [_serialize(v, arrays) for v in obj]}
    if isinstance(obj, dict):
        return {"__dict__": {k: _serialize(v, arrays) for k, v in obj.items()}}
    if dataclasses.is_dataclass(obj):
        cls = type(obj)
        if not cls.__module__.startswith("atomsmm_tpu"):
            raise TypeError(f"cannot serialize foreign dataclass {cls}")
        fields = {}
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if callable(v) and not isinstance(v, (jnp.ndarray, np.ndarray)):
                raise TypeError(
                    f"{cls.__name__}.{f.name} is a Python callable and cannot "
                    "be serialized (the reference stores Lepton strings; "
                    "rebuild Custom*Force objects in code after loading)"
                )
            fields[f.name] = _serialize(v, arrays)
        return {
            "__class__": f"{cls.__module__}:{cls.__qualname__}",
            "fields": fields,
        }
    raise TypeError(f"cannot serialize {type(obj)!r}")


def _deserialize(node, data):
    if node is None or isinstance(node, (bool, int, str)):
        return node
    if isinstance(node, dict):
        if "__float__" in node:
            return float(node["__float__"])
        if "__array__" in node:
            return jnp.asarray(data[node["__array__"]])
        if "__tuple__" in node:
            return tuple(_deserialize(v, data) for v in node["__tuple__"])
        if "__list__" in node:
            return [_deserialize(v, data) for v in node["__list__"]]
        if "__dict__" in node:
            return {
                k: _deserialize(v, data) for k, v in node["__dict__"].items()
            }
        if "__class__" in node:
            mod_name, qual = node["__class__"].split(":")
            if not mod_name.startswith("atomsmm_tpu"):
                raise ValueError(f"refusing to import {mod_name!r}")
            cls = importlib.import_module(mod_name)
            for part in qual.split("."):
                cls = getattr(cls, part)
            kwargs = {
                k: _deserialize(v, data) for k, v in node["fields"].items()
            }
            return cls(**kwargs)
    raise ValueError(f"cannot deserialize node {node!r}")


def save_system(path: str, system) -> None:
    """Serialize a System (forces, parameters, neighbor specs, constraints)
    so a run can resume WITHOUT re-running builder code — the reference's
    XmlSerializer role (SURVEY.md §2b N8)."""
    arrays: dict = {}
    tree = _serialize(system, arrays)
    np.savez(
        path,
        __schema__=np.asarray(_SYS_SCHEMA),
        __tree__=np.asarray(json.dumps(tree)),
        **arrays,
    )


def load_system(path: str):
    with np.load(path, allow_pickle=False) as data:
        schema = str(data["__schema__"])
        if schema != _SYS_SCHEMA:
            raise ValueError(f"unknown system schema {schema!r}")
        tree = json.loads(str(data["__tree__"]))
        return _deserialize(tree, data)

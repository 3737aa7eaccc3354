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

import jax
import jax.numpy as jnp
import numpy as np

from .state import State
from .utils import replace

_SCHEMA = "atomsmm_tpu-state-v1"


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
        saved_keys = list(data["__extra_keys__"])
        if saved_keys != sorted(like.extra):
            raise ValueError(
                "checkpoint extended variables do not match the current "
                f"integrator: saved {saved_keys}, expected {sorted(like.extra)}"
            )
        leaves_like, treedef = jax.tree.flatten(like)
        leaves = [
            jnp.asarray(data[f"leaf_{i}"], leaves_like[i].dtype)
            for i in range(len(leaves_like))
        ]
    return jax.tree.unflatten(treedef, leaves)

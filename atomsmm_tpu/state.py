"""Simulation state pytree.

In the reference, dynamical state lives inside an opaque `openmm.Context` and
integrator "global"/"per-DOF" variables live in the CustomIntegrator VM
(SURVEY.md §2b N4). Here the whole thing is one explicit, functional pytree
that flows through the jitted step function: positions, velocities, box,
RNG key, step counter, and a dict of extended variables (thermostat chain
positions/velocities, SIN(R) auxiliary velocities v1/v2, barostat statistics…).

Examples:

>>> import jax.numpy as jnp
>>> s = make_state(jnp.zeros((4, 3)), box=jnp.full(3, 2.0), seed=1)
>>> s.v.shape, int(s.step)
((4, 3), 0)
>>> s2 = s.with_extra(nhc_xi=jnp.zeros(3))
>>> sorted(s2.extra)
['nhc_xi']
>>> masses = jnp.asarray([1.0, 1.0, 16.0, 16.0])
>>> v = maxwell_boltzmann_velocities(jax.random.PRNGKey(0), masses, 300.0)
>>> v.shape
(4, 3)
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .utils import pytree_dataclass, replace


@pytree_dataclass
class State:
    """Dynamical state of a simulation (counterpart of openmm.State + the
    CustomIntegrator variable store).

    Attributes:
      x:    (N, 3) positions [nm]
      v:    (N, 3) velocities [nm/ps]
      box:  (3,) orthorhombic box lengths, or (3, 3) reduced triclinic cell
            matrix (rows = lattice vectors) [nm] — see ops/pbc.py
      rng:  jax.random key for stochastic propagators
      step: scalar int32 step counter
      extra: dict of named extended variables (per-DOF or global arrays);
             keys are static, values are pytree leaves.
    """

    x: jnp.ndarray
    v: jnp.ndarray
    box: jnp.ndarray
    rng: jax.Array
    step: jnp.ndarray
    extra: Dict[str, Any]

    @property
    def num_particles(self) -> int:
        return self.x.shape[0]

    def with_extra(self, **kv):
        extra = dict(self.extra)
        extra.update(kv)
        return replace(self, extra=extra)


def make_state(x, v=None, box=None, seed: int = 0, extra=None) -> State:
    x = jnp.asarray(x)
    if v is None:
        v = jnp.zeros_like(x)
    else:
        v = jnp.asarray(v, dtype=x.dtype)
    if box is None:
        raise ValueError(
            "box is required: (3,) orthorhombic lengths or a (3, 3) "
            "triclinic cell matrix"
        )
    box = jnp.asarray(box, dtype=x.dtype)
    return State(
        x=x,
        v=v,
        box=box,
        rng=jax.random.PRNGKey(seed),
        step=jnp.zeros((), jnp.int32),
        extra=dict(extra or {}),
    )


def kinetic_energy(masses: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Total kinetic energy [kJ/mol]; masses (N,) [amu], v (N,3) [nm/ps]."""
    return 0.5 * jnp.sum(masses[:, None] * v * v)


def instantaneous_temperature(masses, v, dof: int) -> jnp.ndarray:
    from .units import BOLTZMANN

    return 2.0 * kinetic_energy(masses, v) / (dof * BOLTZMANN)


def maxwell_boltzmann_velocities(rng, masses, temperature, dtype=None):
    """Draw velocities from the MB distribution at `temperature` [K]."""
    from .units import BOLTZMANN

    dtype = dtype or jnp.result_type(float)
    n = masses.shape[0]
    # massless rows (virtual sites, SCF Drude particles) carry no momentum
    sigma = jnp.where(
        masses > 0,
        jnp.sqrt(BOLTZMANN * temperature / jnp.where(masses > 0, masses, 1.0)),
        0.0,
    ).astype(dtype)
    return sigma[:, None] * jax.random.normal(rng, (n, 3), dtype=dtype)


def remove_com_motion(masses, v):
    p = jnp.sum(masses[:, None] * v, axis=0)
    return v - p / jnp.sum(masses)

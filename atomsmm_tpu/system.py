"""System container — counterpart of openmm.System under atomsmm's idiom.

A `System` owns particle masses, molecule assignment, and a tuple of Force
objects (each carrying its RESPA force group). It is an immutable pytree:
the reference's "deep-copy and transform" system classes
(atomsmm/systems.py::RESPASystem etc. — see systems.py here) become pure
functions System -> System.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .forces import Force
from .utils import pytree_dataclass, static_field, replace


@pytree_dataclass
class System:
    """Immutable simulation system.

    Attributes:
      masses: (N,) particle masses [amu].
      forces: tuple of Force pytrees.
      molecule: (N,) int32 molecule id per atom (for molecular virial/pressure,
        COM reporting, and MC-barostat molecular scaling).
      num_molecules: static count of molecules.
      num_constraints: static total count (SETTLE + iterative), used for
        degree-of-freedom bookkeeping (SURVEY.md §2b N5).
      remove_com_motion: static; affects degree-of-freedom counting.
      default_box: (3,) box lengths used when building the initial State.
    """

    masses: jnp.ndarray = None
    forces: Tuple[Force, ...] = ()
    molecule: jnp.ndarray = None
    default_box: jnp.ndarray = None
    neighbors: object = None  # Optional[ops.neighbors.NeighborSpec] (default)
    extra_neighbor_specs: dict = None  # name -> NeighborSpec (e.g. 'near')
    constraints: object = None  # Optional[ops.constraints.ConstraintSet]
    settle: object = None  # Optional[ops.settle.SettleSet] (analytic waters)
    virtual_sites: object = None  # Optional[ops.virtual_sites.VirtualSiteSet]
    num_molecules: int = static_field(default=0)
    num_constraints: int = static_field(default=0)
    remove_com_motion: bool = static_field(default=True)

    def with_neighbors(self, spec, **named) -> "System":
        """Attach the default NeighborSpec (and optionally named ones, e.g.
        near=<finer spec>): Contexts built from this system use the
        fixed-capacity cell-list production path for nonbonded forces."""
        extra = dict(self.extra_neighbor_specs or {})
        extra.update(named)
        return replace(self, neighbors=spec, extra_neighbor_specs=extra or None)

    @property
    def num_particles(self) -> int:
        return self.masses.shape[0]

    def add_force(self, force: Force) -> "System":
        return replace(self, forces=self.forces + (force,))

    def replace_forces(self, forces) -> "System":
        return replace(self, forces=tuple(forces))

    @property
    def force_groups(self):
        return sorted({f.group for f in self.forces})


def make_exclusions_array(n: int, pairs, max_exclusions: int | None = None):
    """Build the (N, M) padded exclusion table from a list of (i, j) pairs.

    Symmetric: each pair is recorded on both rows. Padded with -1.
    """
    lists = [[] for _ in range(n)]
    for i, j in pairs:
        i, j = int(i), int(j)
        lists[i].append(j)
        lists[j].append(i)
    m = max((len(l) for l in lists), default=0)
    if max_exclusions is not None:
        m = max(m, max_exclusions)
    m = max(m, 1)
    out = np.full((n, m), -1, dtype=np.int32)
    for i, l in enumerate(lists):
        out[i, : len(l)] = sorted(l)
    return jnp.asarray(out)

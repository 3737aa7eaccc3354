"""LJ argon fluid — BASELINE.md config 1 (the minimum end-to-end slice).

Parameters: the standard argon LJ model (sigma = 0.3405 nm,
epsilon/kB = 119.8 K -> epsilon = 0.99607 kJ/mol, m = 39.948 amu).
Initial condition: simple-cubic lattice at reduced density rho* = N sigma^3/V
(default 0.8, liquid-like), optionally jittered.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..forces import NonbondedForce
from ..system import System
from ..units import BOLTZMANN

ARGON_SIGMA = 0.3405  # nm
ARGON_EPSILON = 119.8 * BOLTZMANN  # kJ/mol
ARGON_MASS = 39.948  # amu


def argon_system(
    n: int = 4000,
    rho_star: float = 0.8,
    r_cut: float = 2.5 * ARGON_SIGMA,
    r_switch: float = 2.2 * ARGON_SIGMA,
    jitter: float = 0.0,
    seed: int = 0,
    dtype=None,
    chunk: int = 256,
    neighbors: bool = False,
    skin: float = 0.1,
    dispersion_correction: bool = False,
):
    """Build (System, positions, box). No charges, no exclusions.

    neighbors=True attaches a NeighborSpec (production cell-list path);
    dispersion_correction adds the analytic LJ tail (E = coeff/V)."""
    dtype = dtype or jnp.result_type(float)
    volume = n * ARGON_SIGMA**3 / rho_star
    box_l = volume ** (1.0 / 3.0)
    if r_cut > 0.5 * box_l:
        from ..utils import InputError

        raise InputError(
            f"r_cut={r_cut} exceeds half the box ({box_l:.3f}/2) — minimum "
            "image breaks; increase n or reduce the cutoff"
        )

    n_side = int(np.ceil(n ** (1.0 / 3.0)))
    spacing = box_l / n_side
    grid = np.arange(n_side) * spacing
    xyz = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), axis=-1)
    x = xyz.reshape(-1, 3)[:n].astype(np.float64)
    if jitter > 0:
        rs = np.random.RandomState(seed)
        x = x + rs.uniform(-jitter, jitter, x.shape) * spacing

    disp = None
    if dispersion_correction:
        from ..forces import compute_dispersion_coefficient

        disp = jnp.asarray(
            compute_dispersion_coefficient(
                np.full(n, ARGON_SIGMA), np.full(n, ARGON_EPSILON),
                r_switch, r_cut,
            ),
            dtype,
        )
    force = NonbondedForce(
        group=0,
        dispersion_coeff=disp,
        charge=jnp.zeros(n, dtype),
        sigma=jnp.full((n,), ARGON_SIGMA, dtype),
        epsilon=jnp.full((n,), ARGON_EPSILON, dtype),
        exclusions=jnp.full((n, 1), -1, jnp.int32),
        r_cut=jnp.asarray(r_cut, dtype),
        r_switch=jnp.asarray(r_switch, dtype),
        eps_rf=jnp.asarray(1e15, dtype),
        method="cutoff",
        use_switch=True,
        chunk=chunk,
    )
    box = jnp.full((3,), box_l, dtype)
    system = System(
        masses=jnp.full((n,), ARGON_MASS, dtype),
        forces=(force,),
        molecule=jnp.arange(n, dtype=jnp.int32),
        default_box=box,
        num_molecules=n,
    )
    if neighbors:
        from ..ops.neighbors import make_neighbor_spec

        system = system.with_neighbors(
            make_neighbor_spec(np.full(3, box_l), n, r_cut, skin=skin,
                               occupancy_floor_from=x)
        )
    return system, jnp.asarray(x, dtype), box

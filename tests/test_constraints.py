"""Constraints (SHAKE/RATTLE) + rigid TIP3P water (SURVEY.md §2b N5)."""
import numpy as np
import pytest

import jax.numpy as jnp

from atomsmm_tpu import (
    Context,
    GlobalThermostatIntegrator,
    VelocityVerletIntegrator,
    make_state,
)
from atomsmm_tpu.integrate.propagators import VelocityRescalingPropagator
from atomsmm_tpu.minimize import minimize_energy
from atomsmm_tpu.models import rigid_water_system
from atomsmm_tpu.ops.constraints import constraint_residual


@pytest.fixture(scope="module")
def tip3p():
    # analytic=False: these tests exercise the iterative SHAKE/RATTLE path
    # (the general-topology fallback); SETTLE has its own file (test_settle.py)
    return rigid_water_system(n_molecules=125, r_cut=0.75, r_switch=0.65,
                              seed=2, analytic=False)


def test_rigid_geometry_preserved(tip3p):
    system, x, box = tip3p
    ctx = Context(system, VelocityVerletIntegrator(0.002), make_state(x, box=box))
    ctx.set_velocities_to_temperature(300.0, seed=3)
    ctx.step(200)  # 0.4 ps at 2 fs — impossible for flexible water VV
    res = float(constraint_residual(system.constraints, ctx.state.x))
    assert res < 1e-6, res


def test_dof_accounts_for_constraints(tip3p):
    system, _, _ = tip3p
    from atomsmm_tpu.utils import count_degrees_of_freedom

    # 3*375 - 3*125 constraints - 3 COM = 747
    assert count_degrees_of_freedom(system) == 3 * 375 - 3 * 125 - 3


@pytest.mark.slow
def test_rigid_water_nve_stability(tip3p):
    """2 fs velocity Verlet on RIGID water must conserve energy from an
    equilibrated state (constraints remove the stiff modes).

    Preparation note: TIP3P hydrogens carry no LJ — minimizing an overlapped
    lattice with charges on lets H collapse into a foreign O (bottomless
    Coulomb well). The standard remedy: relax the O-O packing with charges
    OFF, re-project the rigid geometry, then thermalize with full charges.
    """
    system, x, box = tip3p
    from atomsmm_tpu.ops.constraints import shake_positions
    from atomsmm_tpu.utils import replace as dreplace

    uncharged = system.replace_forces(
        [dreplace(system.forces[0], charge=jnp.zeros_like(system.forces[0].charge))]
    )
    thermo = VelocityRescalingPropagator(300.0, 747, 0.1)
    ctx0 = Context(uncharged, VelocityVerletIntegrator(0.002), make_state(x, box=box))
    minimize_energy(ctx0, steps=300)
    x_fix = shake_positions(
        system.constraints, ctx0.state.x, ctx0.state.x,
        1.0 / system.masses, sweeps=120,
    )

    ctx = Context(system, GlobalThermostatIntegrator(0.001, thermo),
                  make_state(x_fix, box=box))
    ctx.set_velocities_to_temperature(300.0, seed=4)
    ctx.step(1000)  # 1 ps NVT equilibration
    x_eq, v_eq = ctx.state.x.copy(), ctx.state.v.copy()

    nve = Context(system, VelocityVerletIntegrator(0.002), make_state(x_eq, v_eq, box))
    e0 = float(nve.conserved_energy())
    nve.step(500)  # 1 ps
    e1 = float(nve.conserved_energy())
    drift = abs(e1 - e0) / 375
    assert drift < 2e-2, drift
    res = float(constraint_residual(system.constraints, nve.state.x))
    assert res < 1e-6, res

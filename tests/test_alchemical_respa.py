"""Direct AlchemicalRespaSystem tests (VERDICT r3 #9 — previously only
smoked indirectly through SolvationSystem + RESPASystem).

The dangerous interactions are exactly the composed ones:
  * WHERE the softcore term lands in the RESPA split (group 1, near — it
    is short-ranged, so lambda sweeps must not touch the far force);
  * the near+far(+softcore+solute-solute) identity under lambda < 1 — the
    RESPA split must never change the potential at ANY coupling;
  * forces (not just energies) agreeing through the split at lambda < 1;
  * a short ΔG smoke through the full RESPA-split sampling path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atomsmm_tpu import (
    AlchemicalRespaSystem,
    Context,
    MultipleTimeScaleIntegrator,
    SolvationSystem,
    make_state,
)
from atomsmm_tpu.forces import (
    FarNonbondedForce,
    NearNonbondedForce,
    SoftcoreLennardJonesForce,
)
from atomsmm_tpu.models.phenol import phenol_in_water
from atomsmm_tpu.potential import group_energies, potential_energy


@pytest.fixture(scope="module")
def systems():
    system, x, box, solute = phenol_in_water(n_water=80, r_cut=0.55,
                                             r_switch=0.47, seed=3)
    solv = SolvationSystem(system, solute_atoms=solute)
    ars = AlchemicalRespaSystem(system, rcut_in=0.35, rswitch_in=0.3,
                                solute_atoms=solute)
    return solv, ars, x, box


LAMBDA_GRID = [
    {"lambda_vdw": 1.0, "lambda_coul": 1.0},
    {"lambda_vdw": 0.7, "lambda_coul": 0.4},
    {"lambda_vdw": 0.5, "lambda_coul": 0.0},
    {"lambda_vdw": 0.0, "lambda_coul": 0.0},
]


def test_softcore_placed_in_near_group(systems):
    _, ars, _, _ = systems
    soft = [f for f in ars.forces if isinstance(f, SoftcoreLennardJonesForce)]
    assert len(soft) == 1 and soft[0].group == 1
    # and the split levels exist around it
    assert any(isinstance(f, NearNonbondedForce) and not f.subtract
               for f in ars.forces)
    assert any(isinstance(f, FarNonbondedForce) for f in ars.forces)


@pytest.mark.parametrize("lams", LAMBDA_GRID)
def test_split_identity_under_lambda(systems, lams):
    """near + far + softcore + solute-solute == SolvationSystem total at
    every coupling — the RESPA split never changes the potential."""
    solv, ars, x, box = systems
    e_solv = float(potential_energy(solv, x, box, lams))
    e_ars = float(potential_energy(ars, x, box, lams))
    np.testing.assert_allclose(e_ars, e_solv, rtol=1e-12)


@pytest.mark.parametrize("lams", LAMBDA_GRID[1:2])
def test_forces_identity_under_lambda(systems, lams):
    solv, ars, x, box = systems
    g_solv = jax.grad(lambda xx: potential_energy(solv, xx, box, lams))(x)
    g_ars = jax.grad(lambda xx: potential_energy(ars, xx, box, lams))(x)
    np.testing.assert_allclose(np.asarray(g_ars), np.asarray(g_solv),
                               atol=1e-9)


def test_lambda_moves_only_near_group(systems):
    """Changing lambda_vdw must change ONLY group 1 (softcore lives there):
    the far force's energy is lambda_vdw-independent, so lambda sweeps
    reuse the expensive far evaluation (the reference's design point)."""
    _, ars, x, box = systems
    g_hi = group_energies(ars, x, box,
                          {"lambda_vdw": 1.0, "lambda_coul": 1.0})
    g_lo = group_energies(ars, x, box,
                          {"lambda_vdw": 0.3, "lambda_coul": 1.0})
    assert abs(float(g_hi[1] - g_lo[1])) > 1.0  # softcore responded
    np.testing.assert_allclose(float(g_hi[2]), float(g_lo[2]), rtol=1e-12)
    np.testing.assert_allclose(float(g_hi[0]), float(g_lo[0]), rtol=1e-12)


@pytest.mark.slow
def test_mts_integration_stable_at_partial_coupling(systems):
    """A short MTS run on the AlchemicalRespaSystem at lambda = 0.5 — the
    composed softcore-inside-RESPA stepping path — stays finite and holds
    temperature."""
    _, ars, x, box = systems
    dof = 3 * ars.num_particles - 3
    integ = MultipleTimeScaleIntegrator(
        0.002, [2, 2, 1], temperature=300.0, time_scale=0.1,
        degrees_of_freedom=dof,
    )
    ctx = Context(ars, integ, make_state(x, box=box, seed=2))
    ctx.set_velocities_to_temperature(300.0, seed=3)
    ctx.set_parameter("lambda_vdw", 0.5)
    ctx.set_parameter("lambda_coul", 0.25)
    # lattice melt dumps PE faster than the tau=0.1 bath removes it —
    # rescale between chunks (bench.py protocol), then measure
    for _ in range(4):
        ctx.step(50)
        t_now = float(ctx.temperature())
        ctx.set_velocities((300.0 / t_now) ** 0.5 * ctx.state.v)
    ctx.step(100)
    assert np.isfinite(float(ctx.get_state().potential_energy))
    assert 150.0 < float(ctx.temperature()) < 550.0


@pytest.mark.slow
def test_delta_g_smoke_through_respa_split(systems):
    """ΔG machinery driven end-to-end THROUGH the RESPA split: finite,
    chemically sensible, MBAR/TI in rough agreement (a smoke, not a
    converged estimate)."""
    from atomsmm_tpu.alchemy import solvation_free_energy

    _, ars, x, box = systems
    out = solvation_free_energy(
        ars, x, box, jnp.linspace(0.0, 1.0, 7), temperature=300.0,
        dt=0.001, n_equil=100, n_samples=12, sample_interval=15, seed=8,
    )
    assert np.isfinite(out["dg_mbar"]) and np.isfinite(out["dg_ti"])
    assert -300.0 < out["dg_mbar"] < 50.0

"""Per-commit smoke tier: `pytest -m smoke` (<2 min on one CPU core).

One fast representative per subsystem — every force class, every integrator
family, neighbors, constraints, barostat, alchemy, reporters, checkpointing.
The full suite (~10 min) stays the round gate; this tier exists so the tests
run on EVERY commit instead of rotting under time pressure (VERDICT r01
weak #8). Golden energy fixtures (tests/test_goldens.py) are also marked
smoke.
"""
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import atomsmm_tpu as amm
from atomsmm_tpu.models import argon_system, water_system
from atomsmm_tpu.potential import force_fn, potential_energy

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def water125():
    return water_system(n_molecules=125, r_cut=0.75, r_switch=0.65)


def test_argon_nve_drift():
    system, x, box = argon_system(n=125, jitter=0.05, seed=1)
    ctx = amm.Context(
        system, amm.VelocityVerletIntegrator(dt=0.002), amm.make_state(x, box=box)
    )
    ctx.set_velocities_to_temperature(120.0, seed=2)
    e0 = float(ctx.conserved_energy())
    ctx.step(100)
    assert abs(float(ctx.conserved_energy()) - e0) / 125 < 1e-4


def test_respa_split_consistency(water125):
    system, x, box = water125
    respa = amm.RESPASystem(system, rcut_in=0.5, rswitch_in=0.4)
    full = potential_energy(system, x, box)
    split = potential_energy(respa, x, box)
    np.testing.assert_allclose(float(split), float(full), rtol=1e-10)


def test_respa_nvt_runs(water125):
    system, x, box = water125
    respa = amm.RESPASystem(system, rcut_in=0.5, rswitch_in=0.4)
    integ = amm.MultipleTimeScaleIntegrator(
        0.002, [2, 2, 1], temperature=300.0, time_scale=0.1,
        degrees_of_freedom=3 * system.num_particles - 3,
    )
    ctx = amm.Context(respa, integ, amm.make_state(x, box=box))
    ctx.set_velocities_to_temperature(300.0, seed=3)
    ctx.step(20)
    assert np.isfinite(float(ctx.temperature()))


def test_neighbor_path_matches_dense():
    system, x, box = argon_system(n=216, jitter=0.2, seed=3, neighbors=True)
    from atomsmm_tpu.ops.neighbors import make_aux, neighbor_list_extras

    aux = make_aux(system, neighbor_list_extras(system.neighbors, x, box))
    e_d = potential_energy(system, x, box)
    e_n = potential_energy(system, x, box, aux=aux)
    np.testing.assert_allclose(float(e_n), float(e_d), rtol=1e-12)


def test_pme_vs_cutoff_small():
    system, x, box = water_system(
        n_molecules=64, method="pme", r_cut=0.55, r_switch=0.45
    )
    e = potential_energy(system, x, box)
    _, f = force_fn(system)(x, box)
    assert np.isfinite(float(e)) and bool(jnp.all(jnp.isfinite(f)))


def test_softcore_endpoint(water125):
    system, x, box = water125
    solv = amm.SolvationSystem(system, solute_atoms=jnp.arange(3))
    e_full = potential_energy(system, x, box)
    e_on = potential_energy(
        solv, x, box, {"lambda_vdw": 1.0, "lambda_coul": 1.0}
    )
    np.testing.assert_allclose(float(e_on), float(e_full), rtol=1e-9)


def test_alchemy_vmap_matches_loop(water125):
    from atomsmm_tpu.alchemy import multistate_energies

    system, x, box = water125
    solv = amm.SolvationSystem(system, solute_atoms=jnp.arange(3))
    lams = jnp.asarray([0.0, 0.5, 1.0])
    es = multistate_energies(
        solv, x, box, {"lambda_vdw": lams, "lambda_coul": lams}
    )
    e_mid = potential_energy(
        solv, x, box, {"lambda_vdw": 0.5, "lambda_coul": 0.5}
    )
    np.testing.assert_allclose(float(es[1]), float(e_mid), rtol=1e-12)


def test_sinr_isokinetic_constraint():
    from atomsmm_tpu.integrate.sinr import V1
    from atomsmm_tpu.units import BOLTZMANN

    system, x, box = argon_system(n=216, jitter=0.05, seed=4)
    respa = amm.RESPASystem(system, rcut_in=0.6, rswitch_in=0.5)
    integ = amm.SIN_R_Integrator(
        0.002, [2, 1], temperature=120.0, time_scale=0.05, friction=10.0
    )
    ctx = amm.Context(respa, integ, amm.make_state(x, box=box, seed=5))
    ctx.step(10)
    kt = BOLTZMANN * 120.0
    q1 = kt * 0.05**2
    m = respa.masses[:, None]
    c = m * ctx.state.v**2 + 0.5 * q1 * ctx.state.extra[V1] ** 2
    assert float(jnp.max(jnp.abs(c / kt - 1.0))) < 1e-8


def test_nhl_runs():
    system, x, box = argon_system(n=216, jitter=0.05, seed=4)
    system = amm.RESPASystem(system, rcut_in=0.6, rswitch_in=0.5)
    integ = amm.NHL_R_Integrator(
        0.002, [2, 1], temperature=120.0, time_scale=0.1, friction=10.0
    )
    ctx = amm.Context(system, integ, amm.make_state(x, box=box, seed=6))
    ctx.set_velocities_to_temperature(120.0, seed=6)
    ctx.step(10)
    assert np.isfinite(float(ctx.temperature()))


def test_constraints_shake_rattle():
    from atomsmm_tpu.models import rigid_water_system
    from atomsmm_tpu.ops.constraints import constraint_residual

    # analytic=False: drive the iterative SHAKE/RATTLE path here (the
    # default SETTLE split is smoked in test_settle.py)
    system, x, box = rigid_water_system(n_molecules=216, analytic=False)
    ctx = amm.Context(
        system, amm.VelocityVerletIntegrator(dt=0.001), amm.make_state(x, box=box)
    )
    ctx.set_velocities_to_temperature(300.0, seed=7)
    ctx.step(20)
    res = constraint_residual(system.constraints, ctx.state.x)
    assert float(jnp.max(jnp.abs(res))) < 1e-8


def test_barostat_step_runs():
    system, x, box = water_system(n_molecules=64, r_cut=0.55, r_switch=0.45)
    system = system.add_force(
        amm.MonteCarloBarostat(pressure=1.0, temperature=300.0, frequency=5)
    )
    integ = amm.GlobalThermostatIntegrator(
        0.001, thermostat=amm.VelocityRescalingPropagator(
            temperature=300.0, time_scale=0.05,
            degrees_of_freedom=3 * system.num_particles - 3,
        )
    )
    ctx = amm.Context(system, integ, amm.make_state(x, box=box, seed=8))
    ctx.set_velocities_to_temperature(300.0, seed=8)
    v0 = float(jnp.prod(ctx.state.box))
    ctx.step(25)
    assert np.isfinite(float(jnp.prod(ctx.state.box)))
    assert float(jnp.prod(ctx.state.box)) != v0  # at least one attempt moved


def test_reporter_and_checkpoint_roundtrip(tmp_path, water125):
    from atomsmm_tpu.checkpoint import load_checkpoint, save_checkpoint
    from atomsmm_tpu.reporters import StateDataReporter

    system, x, box = water125
    integ = amm.VelocityVerletIntegrator(dt=0.001)
    ctx = amm.Context(system, integ, amm.make_state(x, box=box))
    ctx.set_velocities_to_temperature(300.0, seed=9)
    stream = io.StringIO()
    sim = amm.Simulation(system, integ)
    sim.set_positions(x)
    sim.context.set_velocities_to_temperature(300.0, seed=9)
    sim.reporters.append(StateDataReporter(stream, 5))
    sim.step(10)
    ctx = sim.context
    assert len(stream.getvalue().strip().splitlines()) >= 3  # header + 2 rows

    path = tmp_path / "ck.npz"
    save_checkpoint(str(path), ctx.state)
    state2 = load_checkpoint(str(path), like=ctx.state)
    assert bool(jnp.all(state2.x == ctx.state.x))


def test_describe_instruction_dump():
    integ = amm.MultipleTimeScaleIntegrator(
        0.002, [2, 2, 1], temperature=300.0, time_scale=0.1,
        degrees_of_freedom=100,
    )
    text = integ.describe()
    assert "F[1]" in text and "bath" in text

"""M1: LJ argon end-to-end NVE (BASELINE.md config 1).

Physics property tests the reference lacks but SURVEY.md §4 calls for:
energy-drift bounds, momentum conservation, plus split_potential_energy
consistency.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomsmm_tpu import (
    Context,
    VelocityVerletIntegrator,
    make_state,
    split_potential_energy,
)
from atomsmm_tpu.models import argon_system
from atomsmm_tpu.state import kinetic_energy


@pytest.fixture(scope="module")
def argon_ctx():
    system, x, box = argon_system(n=216, jitter=0.05, seed=1)
    integrator = VelocityVerletIntegrator(dt=0.002)  # 2 fs
    state = make_state(x, box=box, seed=0)
    ctx = Context(system, integrator, state)
    ctx.set_velocities_to_temperature(120.0, seed=42)
    return ctx


def test_energy_conservation(argon_ctx):
    ctx = argon_ctx
    e0 = float(ctx.conserved_energy())
    ctx.step(200)
    e1 = float(ctx.conserved_energy())
    n = ctx.system.num_particles
    # velocity-Verlet at 2 fs on LJ argon: drift well under 1e-4 kJ/mol/atom
    assert abs(e1 - e0) / n < 1e-4, (e0, e1)


def test_momentum_conservation(argon_ctx):
    ctx = argon_ctx
    m = ctx.system.masses[:, None]
    p = jnp.sum(m * ctx.state.v, axis=0)
    assert float(jnp.max(jnp.abs(p))) < 1e-8


def test_split_potential_energy(argon_ctx):
    ctx = argon_ctx
    split = split_potential_energy(
        ctx.system, ctx.state.x, ctx.state.box, ctx.parameters
    )
    assert "NonbondedForce" in split
    total = sum(float(v) for k, v in split.items() if k != "Total")
    np.testing.assert_allclose(total, float(split["Total"]), rtol=1e-12)
    snap = ctx.get_state()
    np.testing.assert_allclose(
        float(snap.potential_energy), float(split["Total"]), rtol=1e-12
    )


def test_forces_match_numerical_gradient():
    system, x, box = argon_system(n=125, jitter=0.1, seed=2)
    from atomsmm_tpu.potential import force_fn

    f = force_fn(system)
    _, forces = f(x, box, {})
    # central differences on a few random coordinates
    rs = np.random.RandomState(0)
    h = 1e-6
    for _ in range(5):
        i = rs.randint(125)
        d = rs.randint(3)
        xp = x.at[i, d].add(h)
        xm = x.at[i, d].add(-h)
        from atomsmm_tpu.potential import potential_energy

        num = -(potential_energy(system, xp, box) - potential_energy(system, xm, box)) / (2 * h)
        np.testing.assert_allclose(float(forces[i, d]), float(num), rtol=1e-5, atol=1e-6)


def test_temperature_sane(argon_ctx):
    t = float(argon_ctx.temperature())
    assert 20.0 < t < 400.0

"""M6: SIN(R) isokinetic multiple-timescale integrator (BASELINE.md config 4).

Distribution tests per SURVEY.md §4: the per-DOF isokinetic constraint must
hold exactly at every step, and the L = 1 ensemble gives <m v^2> = kT/2 per
DOF (NOT the Maxwell-Boltzmann kT) while configurational sampling stays
canonical.
"""
import numpy as np
import pytest

from atomsmm_tpu import Context, make_state
from atomsmm_tpu.integrate.sinr import (
    NHL_R_Integrator,
    SIN_R_Integrator,
    V1,
    V2,
    initialize_isokinetic,
)
from atomsmm_tpu.models import argon_system, water_system
from atomsmm_tpu.units import BOLTZMANN

TEMP = 120.0


def constraint_residual(system, state, temperature, tau):
    kT = BOLTZMANN * temperature
    q1 = kT * tau**2
    m = np.asarray(system.masses)[:, None]
    v = np.asarray(state.v)
    v1 = np.asarray(state.extra[V1])
    c = m * v**2 + 0.5 * q1 * v1**2
    return np.abs(c / kT - 1.0).max()


@pytest.fixture(scope="module")
def argon_sinr():
    system, x, box = argon_system(n=216, jitter=0.05, seed=1)
    integ = SIN_R_Integrator(
        0.004, [2, 1], temperature=TEMP, time_scale=0.05, friction=10.0
    )
    # argon has one force (group 0); give it a 2-group split for RESPA
    from atomsmm_tpu import RESPASystem

    respa = RESPASystem(system, rcut_in=0.6, rswitch_in=0.5)
    ctx = Context(respa, integ, make_state(x, box=box, seed=3))
    return ctx, respa, integ


def test_initialization_on_constraint(argon_sinr):
    ctx, system, integ = argon_sinr
    res = constraint_residual(system, ctx.state, TEMP, integ.tau)
    assert res < 1e-5, res


def test_constraint_preserved_during_dynamics(argon_sinr):
    ctx, system, integ = argon_sinr
    ctx.step(200)
    res = constraint_residual(system, ctx.state, TEMP, integ.tau)
    assert res < 5e-4, res


def test_isokinetic_kinetic_energy(argon_sinr):
    """<m v^2> per DOF = kT/2 for L = 1 (half the MB value)."""
    ctx, system, integ = argon_sinr
    kT = BOLTZMANN * TEMP
    samples = []
    for _ in range(20):
        ctx.step(25)
        m = np.asarray(system.masses)[:, None]
        v = np.asarray(ctx.state.v)
        samples.append((m * v**2).mean())
    mv2 = np.mean(samples)
    np.testing.assert_allclose(mv2, 0.5 * kT, rtol=0.08)


def test_sinr_stable_large_outer_step():
    """SIN(R)'s selling point: large outer steps remain stable (water,
    15 fs outer with bonded at ~0.94 fs)."""
    system, x, box = water_system(n_molecules=64, r_cut=0.55, r_switch=0.45)
    from atomsmm_tpu import RESPASystem
    from atomsmm_tpu.minimize import minimize_energy

    respa = RESPASystem(system, rcut_in=0.4, rswitch_in=0.3)
    integ = SIN_R_Integrator(
        0.015, [16, 2, 1], temperature=300.0, time_scale=0.02, friction=50.0
    )
    ctx = Context(respa, integ, make_state(x, box=box, seed=5))
    minimize_energy(ctx, steps=300)
    ctx.state = integ.initialize(respa, ctx.state)  # re-draw on constraint
    ctx.step(50)
    x_now = np.asarray(ctx.state.x)
    assert np.isfinite(x_now).all()
    res = constraint_residual(respa, ctx.state, 300.0, integ.tau)
    assert res < 5e-3, res


def test_nhl_r_controls_temperature():
    system, x, box = argon_system(n=216, jitter=0.05, seed=1)
    from atomsmm_tpu import RESPASystem

    respa = RESPASystem(system, rcut_in=0.6, rswitch_in=0.5)
    integ = NHL_R_Integrator(
        0.004, [2, 1], temperature=TEMP, time_scale=0.05, friction=5.0
    )
    ctx = Context(respa, integ, make_state(x, box=box, seed=4))
    ctx.set_velocities_to_temperature(2 * TEMP, seed=9)
    ctx.step(1200)
    t = float(ctx.temperature())
    assert 0.75 * TEMP < t < 1.3 * TEMP, t

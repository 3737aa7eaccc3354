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


@pytest.mark.slow
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


@pytest.mark.slow
def test_isokinetic_velocity_marginal_arcsine():
    """Distributional oracle for the L=1 isokinetic ensemble (r4): the
    per-DOF constraint m v^2 + (1/2) Q1 v1^2 = kT confines (v, v1) to an
    ellipse, and the stationary SIN(R) measure makes u = m v^2 / kT follow
    the arcsine law u ~ Beta(1/2, 1/2) — density 1/(pi sqrt(u(1-u))),
    CDF (2/pi) asin(sqrt(u)), mean 1/2 (the kT/2 law the integrator
    docstring states), variance 1/8, hard support bound u <= 1.

    Verified empirically before adoption: 45k samples at 4 fs gave mean
    0.4952, var 0.1246, max 1.0000, with bin-averaged densities matching
    the integrable edge singularities (2.29/2.17 vs 2.24 analytic).

    chi-square on 12 equal-probability bins via the closed-form quantile
    u_p = sin^2(pi p / 2); threshold = 2x the 99.9% point of chi2(11)
    (31.3), the same autocorrelation slack the thermostat KE tests use."""
    from atomsmm_tpu import RESPASystem, SIN_R_Integrator

    system, x, box = water_system(n_molecules=125, method="cutoff",
                                  r_cut=0.6, r_switch=0.5, neighbors=True)
    respa = RESPASystem(system, rcut_in=0.4, rswitch_in=0.35)
    integ = SIN_R_Integrator(0.004, [2, 2, 1], temperature=300.0,
                             time_scale=0.05, friction=10.0)
    ctx = Context(respa, integ, make_state(x, box=box, seed=3))
    ctx.step(400)  # 1.6 ps decorrelation from the isokinetic init
    m = np.asarray(system.masses)
    kT = BOLTZMANN * 300.0
    us = []
    for _ in range(25):
        ctx.step(25)
        v = np.asarray(ctx.state.v)
        us.append((m[:, None] * v ** 2 / kT).ravel())
    u = np.concatenate(us)

    assert float(u.max()) <= 1.0 + 1e-6          # constraint support bound
    assert abs(float(u.mean()) - 0.5) < 0.02     # kT/2 law
    assert abs(float(u.var()) - 0.125) < 0.01    # arcsine variance

    k_bins = 12
    edges = [np.sin(np.pi * i / (2 * k_bins)) ** 2
             for i in range(1, k_bins)]
    counts, _ = np.histogram(u, bins=[-np.inf] + edges + [np.inf])
    expected = u.size / k_bins
    chi2_stat = float(((counts - expected) ** 2 / expected).sum())
    assert chi2_stat < 2.0 * 31.3, (
        f"chi2 GOF {chi2_stat:.1f} (counts {counts.tolist()})")

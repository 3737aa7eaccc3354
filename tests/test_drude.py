"""Drude-oscillator polarizability (ops/drude.py, integrate/drude.py —
the reference substrate's OpenMM DrudeForce / DrudeLangevinIntegrator /
DrudeSCFIntegrator capability, SURVEY.md §2b input breadth).

Oracles are analytic where possible: the spring constant from the
polarizability, the induced dipole alpha*E in a uniform field (exact SCF
fixed point), the bare-Coulomb limit of Thole screening, and a
hand-evaluated screened pair. Dynamics checks: SCF trajectories stay on
the Born-Oppenheimer surface (tiny Drude-row force residual), and
extended-Lagrangian dual-bath dynamics pins the core-Drude relative
motion near 1 K while the atoms sit at 300 K with SETTLE geometry exact.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import atomsmm_tpu as am
from atomsmm_tpu.integrate.drude import find_drude_set
from atomsmm_tpu.models import swm4_water_system
from atomsmm_tpu.models.water import (
    SWM4_ALPHA_O,
    SWM4_Q_D,
    SWM4_Q_H,
    SWM4_Q_M,
    SWM4_R_OH,
)
from atomsmm_tpu.ops.drude import (
    drude_displacements,
    drude_scf_minimize,
    drude_spring_energy,
    drude_temperatures,
    make_drude_set,
    thole_screening_energy,
)
from atomsmm_tpu.potential import force_fn, potential_energy
from atomsmm_tpu.units import BOLTZMANN, ONE_4PI_EPS0


def test_spring_constant_from_polarizability():
    ds = make_drude_set([[1, 0]], charge=[SWM4_Q_D],
                        polarizability=[SWM4_ALPHA_O])
    k = ONE_4PI_EPS0 * SWM4_Q_D ** 2 / SWM4_ALPHA_O
    np.testing.assert_allclose(np.asarray(ds.k), [k], rtol=1e-14)
    # alpha roundtrip: induced dipole per field is kC q^2 / k = alpha
    np.testing.assert_allclose(
        ONE_4PI_EPS0 * np.asarray(ds.charge) ** 2 / np.asarray(ds.k),
        [SWM4_ALPHA_O], rtol=1e-14)


def test_scf_induced_dipole_matches_alpha_e():
    """In a uniform field E the SCF displacement is -qE/k, so the induced
    dipole is q*d = q^2 E / k = alpha E / kC exactly (linear response with
    no approximation: the fixed point solves the quadratic minimization)."""
    ds = make_drude_set([[1, 0]], charge=[SWM4_Q_D],
                        polarizability=[SWM4_ALPHA_O])
    e_field = jnp.asarray([30.0, -10.0, 50.0])  # kJ/mol/nm/e
    x = jnp.zeros((2, 3))

    def energy(xx):
        return drude_spring_energy(ds, xx) + ds.charge[0] * jnp.dot(
            e_field, xx[1])

    xs = drude_scf_minimize(energy, ds, x, n_iter=6)
    mu = float(ds.charge[0]) * np.asarray(xs[1])
    # stationarity: k d + q E = 0 -> mu = q d = -q^2 E / k = -(alpha/kC) E
    np.testing.assert_allclose(
        mu, -float(ds.charge[0]) ** 2 * np.asarray(e_field)
        / float(ds.k[0]), rtol=1e-12)
    np.testing.assert_allclose(
        mu, -SWM4_ALPHA_O * np.asarray(e_field) / ONE_4PI_EPS0, rtol=1e-12)


def _two_dipole_set(a_ij):
    # dipole 0: core at origin, drude at +x*0.01; dipole 1: core at (0.4,0,0)
    pairs = [[1, 0], [3, 2]]
    ds = make_drude_set(pairs, charge=[-1.2, -1.2],
                        polarizability=[1e-3, 1e-3],
                        screened_pairs=[[0, 1]], thole=a_ij)
    x = jnp.asarray([
        [0.0, 0.0, 0.0],
        [0.01, 0.0, 0.0],
        [0.4, 0.0, 0.0],
        [0.4, 0.012, 0.0],
    ])
    return ds, x


def test_thole_bare_coulomb_limit():
    """As a_ij -> inf, f(u) -> 1 and the screened-pair energy reduces to the
    bare Coulomb sum of the four site-site dipole-charge terms."""
    ds, x = _two_dipole_set(a_ij=500.0)
    box = jnp.full((3,), 10.0)
    e = float(thole_screening_energy(ds, x, box))
    q = -1.2
    bare = 0.0
    for i, si in ((1, +1), (0, -1)):
        for j, sj in ((3, +1), (2, -1)):
            r = float(jnp.linalg.norm(x[i] - x[j]))
            bare += si * sj * q * q / r
    bare *= ONE_4PI_EPS0
    np.testing.assert_allclose(e, bare, rtol=1e-10)


def test_thole_hand_value():
    """One screened pair, hand-evaluated damping at a_ij = 2.6."""
    ds, x = _two_dipole_set(a_ij=2.6)
    box = jnp.full((3,), 10.0)
    e = float(thole_screening_energy(ds, x, box))
    q = -1.2
    inv = (1e-3 * 1e-3) ** (-1.0 / 6.0)
    hand = 0.0
    for i, si in ((1, +1), (0, -1)):
        for j, sj in ((3, +1), (2, -1)):
            r = float(jnp.linalg.norm(x[i] - x[j]))
            u = 2.6 * r * inv
            f = 1.0 - (1.0 + 0.5 * u) * np.exp(-u)
            hand += si * sj * q * q * f / r
    hand *= ONE_4PI_EPS0
    np.testing.assert_allclose(e, hand, rtol=1e-10)
    # screening reduces the magnitude vs bare
    ds_b, _ = _two_dipole_set(a_ij=500.0)
    e_bare = float(thole_screening_energy(ds_b, x, box))
    assert abs(e) < abs(e_bare)


def test_swm4_builder_invariants():
    system, x, box = swm4_water_system(n_molecules=8, r_cut=0.3,
                                       r_switch=0.25)
    # each molecule is neutral: O core +|q_D|, D -|q_D|, 2 q_H + q_M = 0
    nb = system.forces[am.find_nonbonded_force(system)]
    q = np.asarray(nb.charge).reshape(8, 5)
    np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-12)
    np.testing.assert_allclose(q[:, 0], -SWM4_Q_D)
    np.testing.assert_allclose(2 * SWM4_Q_H + SWM4_Q_M, 0.0, atol=1e-12)
    # PE and forces finite with every Drude exactly on its core
    e = potential_energy(system, x, box, {})
    assert np.isfinite(float(e))
    _, f = force_fn(system)(x, box, {})
    assert bool(jnp.all(jnp.isfinite(f)))
    # massless rows: M sites; Drude rows carry the debited 0.4 amu
    m = np.asarray(system.masses).reshape(8, 5)
    np.testing.assert_allclose(m[:, 4], 0.0)
    np.testing.assert_allclose(m[:, 1], 0.4)
    np.testing.assert_allclose(m.sum(axis=1), 15.9994 + 2 * 1.008,
                               rtol=1e-12)


def test_maxwell_massless_rows_regression():
    """maxwell_boltzmann_velocities must hand massless rows zero velocity,
    not sqrt(kT/0) garbage (bug found wiring DrudeSCFIntegrator)."""
    masses = jnp.asarray([15.6, 0.4, 1.008, 1.008, 0.0])
    v = am.maxwell_boltzmann_velocities(jax.random.PRNGKey(0), masses, 300.0)
    assert bool(jnp.all(jnp.isfinite(v)))
    np.testing.assert_allclose(np.asarray(v[4]), 0.0)
    assert float(jnp.max(jnp.abs(v[:4]))) > 0.0


@pytest.mark.slow
def test_scf_trajectory_stays_on_bo_surface():
    """DrudeSCFIntegrator (massless Drudes): after dynamics, the force on
    every Drude row is negligible vs typical atomic forces, geometry is
    exact, Drude rows carry no kinetic energy, and nothing is NaN."""
    system, x, box = swm4_water_system(n_molecules=8, r_cut=0.3,
                                       r_switch=0.25, drude_mass=0.0)
    integ = am.DrudeSCFIntegrator(0.001, n_iter=8, temperature=300.0,
                                  system=system)
    ctx = am.Context(system, integ)
    ctx.set_positions(x)
    ctx.set_velocities_to_temperature(300.0, seed=3)
    ctx.step(100)
    e, f = force_fn(system)(ctx.state.x, ctx.state.box, {})
    assert np.isfinite(float(e))
    ds = find_drude_set(system)
    di = np.asarray(ds.pairs[:, 0])
    f = np.asarray(f)
    assert np.abs(f[di]).max() < 1e-4 * np.abs(f).max()
    o = 5 * np.arange(8)
    xx = np.asarray(ctx.state.x)
    roh = np.linalg.norm(xx[o + 2] - xx[o], axis=-1)
    np.testing.assert_allclose(roh, SWM4_R_OH, atol=1e-10)
    # displacements stay physical (<< 0.05 nm) — no polarization catastrophe
    d = np.asarray(drude_displacements(ds, ctx.state.x))
    assert np.linalg.norm(d, axis=-1).max() < 0.05


def test_describe_lists_dual_bath():
    system, x, box = swm4_water_system(n_molecules=8, r_cut=0.3,
                                       r_switch=0.25)
    integ = am.DrudeLangevinIntegrator(0.001, 300.0, system=system)
    text = integ.describe()
    assert "v_rel" in text and "T=1.0K" in text and "T=300.0K" in text


@pytest.mark.slow
def test_el_dual_temperatures_and_geometry():
    """Extended-Lagrangian SWM4: after equilibration the atom bath reads
    ~300 K (constraint-aware DoF) and the relative Drude motion is pinned
    cold (< 15 K, target 1 K); SETTLE geometry exact; dipoles physical."""
    system, x, box = swm4_water_system(n_molecules=32, r_cut=0.45,
                                       r_switch=0.4)
    integ = am.DrudeLangevinIntegrator(0.001, 300.0, system=system)
    ctx = am.Context(system, integ)
    ctx.set_positions(x)
    ctx.set_velocities_to_temperature(300.0, seed=1)
    ctx.step(2000)
    tas, tds = [], []
    for _ in range(5):
        ctx.step(200)
        ta, td = drude_temperatures(integ.thermostat.drude, ctx.state.v,
                                    system.masses, n_constraints=96)
        tas.append(float(ta))
        tds.append(float(td))
    assert 240.0 < np.mean(tas) < 360.0, tas
    assert np.mean(tds) < 15.0, tds
    o = 5 * np.arange(32)
    xx = np.asarray(ctx.state.x)
    roh = np.linalg.norm(xx[o + 2] - xx[o], axis=-1)
    np.testing.assert_allclose(roh, SWM4_R_OH, atol=1e-10)
    d = np.asarray(drude_displacements(integ.thermostat.drude, ctx.state.x))
    assert np.linalg.norm(d, axis=-1).max() < 0.05


@pytest.mark.slow
def test_drude_composes_with_respa():
    """DrudeForce is a group-0 (bond-like) term: RESPASystem's near/far
    split leaves it in the innermost level and the split energies still sum
    to the unsplit total; r-RESPA dynamics with the dual OU bath spliced at
    the outermost level keeps the relative motion cold and geometry exact."""
    from atomsmm_tpu import (
        MultipleTimeScaleIntegrator,
        PropagatorIntegrator,
        RESPASystem,
        split_potential_energy,
    )
    from atomsmm_tpu.integrate.drude import DrudeOrnsteinUhlenbeckPropagator

    system, x, box = swm4_water_system(n_molecules=32, r_cut=0.45,
                                       r_switch=0.4)
    e_full = float(potential_energy(system, x, box, {}))
    rsys = RESPASystem(system, rcut_in=0.3, rswitch_in=0.25)
    groups = sorted({f.group for f in rsys.forces})
    e_split = sum(
        float(potential_energy(rsys, x, box, {}, groups=[g]))
        for g in groups
    )
    np.testing.assert_allclose(e_split, e_full, rtol=1e-10)
    # DrudeForce stayed in group 0
    assert any(type(f).__name__ == "DrudeForce" and f.group == 0
               for f in rsys.forces)

    ds = find_drude_set(system)
    bath = DrudeOrnsteinUhlenbeckPropagator(ds, 300.0, 5.0)
    integ = MultipleTimeScaleIntegrator(0.002, [2, 1], baths={-1: bath})
    ctx = am.Context(rsys, integ)
    ctx.set_positions(x)
    ctx.set_velocities_to_temperature(300.0, seed=4)
    ctx.step(500)
    assert bool(jnp.all(jnp.isfinite(ctx.state.x)))
    _, td = drude_temperatures(ds, ctx.state.v, system.masses,
                               n_constraints=96)
    assert float(td) < 20.0
    o = 5 * np.arange(32)
    xx = np.asarray(ctx.state.x)
    roh = np.linalg.norm(xx[o + 2] - xx[o], axis=-1)
    np.testing.assert_allclose(roh, SWM4_R_OH, atol=1e-10)


def test_langevin_with_massless_drudes_is_rejected():
    """Regression: DrudeLangevinIntegrator on an SCF-configured system
    (drude_mass=0) used to inject infinite noise into the massless relative
    coordinate (mu = 0 made sqrt(kT_d/mu) = inf) and NaN the whole
    trajectory silently. The integrator now refuses up front, and the OU
    propagator itself pins massless rows finite when driven directly."""
    from atomsmm_tpu.integrate.drude import DrudeOrnsteinUhlenbeckPropagator
    from atomsmm_tpu.integrate.propagators import StepContext
    from atomsmm_tpu.utils import InputError

    system, x, box = swm4_water_system(n_molecules=8, r_cut=0.3,
                                       r_switch=0.25, drude_mass=0.0)
    with pytest.raises(InputError, match="DrudeSCFIntegrator"):
        am.DrudeLangevinIntegrator(0.001, 300.0, system=system)

    # building-block robustness: direct apply with massless pairs stays
    # finite and pins v_rel = 0 exactly (satellite rides its core). Checked
    # on an unconstrained copy: the SETTLE velocity projection afterwards
    # legitimately shifts core rows, which would mask the v_rel pinning.
    import dataclasses

    ds = find_drude_set(system)
    prop = DrudeOrnsteinUhlenbeckPropagator(ds, 300.0, 5.0, 1.0, 20.0)
    ctx = am.Context(system, am.VelocityVerletIntegrator(dt=0.001))
    ctx.set_positions(x)
    ctx.set_velocities_to_temperature(300.0, seed=7)
    free = dataclasses.replace(system, constraints=None, settle=None)
    out = prop.apply(StepContext(free, {}, 0.001), ctx.state, 1.0)
    v = np.asarray(out.v)
    assert np.all(np.isfinite(v))
    di, ci = np.asarray(ds.pairs[:, 0]), np.asarray(ds.pairs[:, 1])
    np.testing.assert_allclose(v[di], v[ci], atol=1e-12)

"""Hydrogen mass repartitioning (systems.py::HydrogenMassRepartitionedSystem).

Counterpart of OpenMM's createSystem(hydrogenMass=...) on the reference's
substrate. Oracles: exact mass bookkeeping (per-molecule totals invariant),
the rebuilt SETTLE triangle must encode the SAME molecular geometry
(d_AB/d_BC recovered to roundoff) under the NEW mass-weighted COM split, and
a rigid-water NVE trajectory at 4 fs — unstable at physical masses — must
hold geometry and energy with HMR 3x.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from atomsmm_tpu import (
    Context,
    HydrogenMassRepartitionedSystem,
    InputError,
    VelocityVerletIntegrator,
    make_state,
)
from atomsmm_tpu.models import rigid_water_system, water_system
from atomsmm_tpu.models.water import MASS_H, MASS_O
from atomsmm_tpu.ops.settle import settle_positions, settle_residual
from atomsmm_tpu.potential import potential_energy


def _rigid(m=64, **kw):
    kw.setdefault("r_cut", 0.55)
    kw.setdefault("r_switch", 0.5)
    return rigid_water_system(n_molecules=m, **kw)


def test_mass_bookkeeping():
    system, x, box = _rigid()
    hmr = HydrogenMassRepartitionedSystem(system, factor=3.0)
    m0 = np.asarray(system.masses, np.float64)
    m1 = np.asarray(hmr.masses, np.float64)
    assert np.allclose(m1[1::3], 3.0 * MASS_H)
    assert np.allclose(m1[0::3], MASS_O - 2 * 2.0 * MASS_H)
    # per-molecule totals exactly invariant
    assert np.allclose(m1.reshape(-1, 3).sum(1), m0.reshape(-1, 3).sum(1))
    # static bookkeeping untouched
    assert hmr.num_constraints == system.num_constraints
    assert hmr.num_molecules == system.num_molecules


def test_settle_triangle_same_geometry_new_com_split():
    system, x, box = _rigid()
    hmr = HydrogenMassRepartitionedSystem(system, factor=3.0)
    s0, s1 = system.settle, hmr.settle
    for ss in (s0, s1):
        assert ss is not None and ss.size == system.num_molecules
    # recovered target distances identical (geometry is mass-independent)
    def dists(ss):
        ra, rb, rc = (np.asarray(a, np.float64) for a in (ss.ra, ss.rb, ss.rc))
        return np.sqrt(rc**2 + (ra + rb) ** 2), 2.0 * rc

    d_ab0, d_bc0 = dists(s0)
    d_ab1, d_bc1 = dists(s1)
    assert np.allclose(d_ab0, d_ab1, rtol=1e-12)
    assert np.allclose(d_bc0, d_bc1, rtol=1e-12)
    # but the COM split must follow the new masses: m_A ra == (m_B+m_C) rb
    m1 = np.asarray(hmr.masses, np.float64)
    ra1, rb1 = np.asarray(s1.ra, np.float64), np.asarray(s1.rb, np.float64)
    t = np.asarray(s1.triplets)
    assert np.allclose(m1[t[:, 0]] * ra1, (m1[t[:, 1]] + m1[t[:, 2]]) * rb1)
    # and ra actually changed (lighter apex sits farther from the COM)
    assert np.all(ra1 > np.asarray(s0.ra, np.float64))


def test_settle_projection_exact_with_new_masses():
    system, x, box = _rigid(m=27, r_cut=0.4, r_switch=0.35)
    hmr = HydrogenMassRepartitionedSystem(system, factor=3.0)
    ss, masses = hmr.settle, hmr.masses
    rs = np.random.RandomState(3)
    x1 = x + 0.004 * rs.normal(size=x.shape)
    xout = settle_positions(ss, jnp.asarray(x1), x, masses)
    assert float(settle_residual(ss, xout)) < 1e-10
    # per-molecule COM (new masses) preserved by the projection
    w = np.asarray(masses, np.float64)[:, None]
    com_in = (w * np.asarray(x1)).reshape(-1, 3, 3).sum(1)
    com_out = (w * np.asarray(xout, np.float64)).reshape(-1, 3, 3).sum(1)
    assert np.allclose(com_in, com_out, atol=1e-10)


def test_potential_energy_is_mass_independent():
    system, x, box = _rigid()
    hmr = HydrogenMassRepartitionedSystem(system, factor=3.0)
    e0 = float(potential_energy(system, x, box))
    e1 = float(potential_energy(hmr, x, box))
    assert e0 == e1


@pytest.mark.slow
def test_rigid_nve_4fs_stable_with_hmr():
    """4 fs NVE on rigid TIP3P: the HMR headline claim (bench config 6b)."""
    system, x, box = _rigid(m=64)
    hmr = HydrogenMassRepartitionedSystem(system, factor=3.0)
    ctx = Context(hmr, VelocityVerletIntegrator(0.004),
                  make_state(x, box=box))
    ctx.set_velocities_to_temperature(300.0, seed=5)
    ctx.step(50)  # settle into the manifold-consistent flow
    e0 = ctx.get_state().potential_energy + ctx.get_state().kinetic_energy
    ctx.step(400)
    st = ctx.get_state()
    e1 = st.potential_energy + st.kinetic_energy
    # geometry exact, energy drift small per-DOF (f64 CPU)
    assert float(settle_residual(hmr.settle, st.positions)) < 1e-8
    n_dof = 3 * hmr.num_particles - hmr.num_constraints - 3
    kT = 0.0083144626 * 300.0
    assert abs(e1 - e0) / (n_dof * kT) < 0.02


def test_flexible_water_connectivity_via_bond_force():
    system, x, box = water_system(n_molecules=27, r_cut=0.4, r_switch=0.35,
                                  template_bonded=False)
    hmr = HydrogenMassRepartitionedSystem(system, factor=2.0)
    m1 = np.asarray(hmr.masses, np.float64)
    assert np.allclose(m1[1::3], 2.0 * MASS_H)
    assert np.allclose(m1[0::3], MASS_O - 2 * MASS_H)


def test_template_bonded_requires_explicit_bonds():
    system, x, box = water_system(n_molecules=27, r_cut=0.4, r_switch=0.35,
                                  template_bonded=True)
    with pytest.raises(InputError, match="connectivity"):
        HydrogenMassRepartitionedSystem(system)
    o = 3 * np.arange(27)
    bonds = np.concatenate([np.stack([o, o + 1], 1), np.stack([o, o + 2], 1)])
    hmr = HydrogenMassRepartitionedSystem(system, factor=3.0, bonds=bonds)
    assert np.allclose(np.asarray(hmr.masses)[1::3], 3.0 * MASS_H)


def test_error_paths():
    system, x, box = _rigid(m=27, r_cut=0.4, r_switch=0.35)
    with pytest.raises(InputError, match="positive"):
        HydrogenMassRepartitionedSystem(system, factor=-1.0)
    # factor 9: O loses 2*8*1.008 = 16.128 > 15.9994 amu
    with pytest.raises(InputError, match="non-positive"):
        HydrogenMassRepartitionedSystem(system, factor=9.0)


def test_virtual_sites_untouched():
    from atomsmm_tpu.models import tip4p_water_system

    system, x, box = tip4p_water_system(n_molecules=64, r_cut=0.55,
                                        r_switch=0.5)
    hmr = HydrogenMassRepartitionedSystem(system, factor=3.0)
    m0 = np.asarray(system.masses, np.float64)
    m1 = np.asarray(hmr.masses, np.float64)
    assert np.allclose(m1[m0 == 0], 0.0)  # M sites stay massless
    assert abs(m1.sum() - m0.sum()) < 1e-9


@pytest.mark.slow
def test_hmr_respa_16fs_outer_stable():
    """Bench config 6c claim: HMR 3x + RESPA [1,4,1] at 16 fs outer holds
    the NVT ensemble (T, PE) and exact geometry (CPU f64 ladder, round 4:
    8/12/16 fs all at the 2 fs equilibrium PE/N = -13.2 kJ/mol/atom)."""
    from atomsmm_tpu import MultipleTimeScaleIntegrator, RESPASystem

    system, x, box = rigid_water_system(n_molecules=125, r_cut=0.62,
                                        r_switch=0.55, neighbors=True)
    hmr = HydrogenMassRepartitionedSystem(system, factor=3.0)
    respa = RESPASystem(hmr, rcut_in=0.45, rswitch_in=0.4)
    n = hmr.num_particles
    dof = 3 * n - hmr.num_constraints - 3
    integ = MultipleTimeScaleIntegrator(0.016, [1, 4, 1], temperature=300.0,
                                        time_scale=0.1,
                                        degrees_of_freedom=dof)
    ctx = Context(respa, integ, make_state(x, box=box))
    ctx.set_velocities_to_temperature(300.0, seed=9)
    # chunked velocity-rescale melt off the lattice, then NHC settle
    for _ in range(6):
        ctx.step(40)
        t_now = float(ctx.temperature())
        ctx.set_velocities((300.0 / t_now) ** 0.5 * ctx.state.v)
    ctx.step(150)
    kB = 0.0083144626
    t_s, pe_s = [], []
    for _ in range(4):
        ctx.step(50)
        st = ctx.get_state()
        t_s.append(2 * float(st.kinetic_energy) / (dof * kB))
        pe_s.append(float(st.potential_energy) / n)
    assert 260.0 < np.mean(t_s) < 340.0
    assert -14.2 < np.mean(pe_s) < -12.2
    res = float(settle_residual(hmr.settle, ctx.get_state().positions))
    assert res < 1e-10

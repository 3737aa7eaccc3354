"""SETTLE — closed-form 3-site rigid constraints (SURVEY.md §2b N5).

Oracles: SETTLE is "an analytical version of SHAKE and RATTLE" (Miyamoto &
Kollman 1992) — it solves exactly the system Jacobi SHAKE/RATTLE iterates
on, so converged SHAKE/RATTLE IS the reference implementation to match.
Plus invariants no iteration can hide behind: exact geometry after one
shot, per-molecule COM preservation (position stage) and linear-momentum
conservation (velocity stage), and exact constraint-velocity tangency.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from atomsmm_tpu import (
    Context,
    GlobalThermostatIntegrator,
    VelocityVerletIntegrator,
    make_state,
)
from atomsmm_tpu.integrate.propagators import NoseHooverChainPropagator
from atomsmm_tpu.models import rigid_water_system
from atomsmm_tpu.models.water import MASS_H, MASS_O, TIP3P_R_OH, TIP3P_THETA
from atomsmm_tpu.ops.constraints import (
    ConstraintSet,
    rattle_velocities,
    shake_positions,
)
from atomsmm_tpu.ops.settle import (
    make_settle_set,
    partition_constraints,
    settle_positions,
    settle_residual,
    settle_velocities,
)


def _random_waters(m=32, seed=0, spread=0.6):
    """(x0 on the manifold, masses, SettleSet, ConstraintSet) for m waters."""
    rs = np.random.RandomState(seed)
    r, t = TIP3P_R_OH, TIP3P_THETA
    mol = np.stack([
        np.zeros(3),
        [r * np.sin(t / 2), r * np.cos(t / 2), 0.0],
        [-r * np.sin(t / 2), r * np.cos(t / 2), 0.0],
    ])
    # random rigid placements
    x = []
    for _ in range(m):
        q = rs.normal(size=4)
        q /= np.linalg.norm(q)
        w, xq, yq, zq = q
        rot = np.array([
            [1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - w * zq), 2 * (xq * zq + w * yq)],
            [2 * (xq * yq + w * zq), 1 - 2 * (xq * xq + zq * zq), 2 * (yq * zq - w * xq)],
            [2 * (xq * zq - w * yq), 2 * (yq * zq + w * xq), 1 - 2 * (xq * xq + yq * yq)],
        ])
        x.append(mol @ rot.T + rs.uniform(0, spread * m ** (1 / 3), 3))
    x = jnp.asarray(np.concatenate(x))
    masses = jnp.asarray(np.tile([MASS_O, MASS_H, MASS_H], m))
    o = 3 * np.arange(m)
    pairs = np.concatenate([
        np.stack([o, o + 1], 1), np.stack([o, o + 2], 1),
        np.stack([o + 1, o + 2], 1),
    ]).astype(np.int32)
    d_hh = 2 * r * np.sin(t / 2)
    d0 = np.concatenate([np.full(m, r), np.full(m, r), np.full(m, d_hh)])
    cons = ConstraintSet(pairs=jnp.asarray(pairs), d0=jnp.asarray(d0))
    ss = make_settle_set(np.stack([o, o + 1, o + 2], 1), r, d_hh, masses)
    return x, masses, ss, cons


def test_positions_exact_geometry_and_com():
    x0, masses, ss, _ = _random_waters(m=48, seed=1)
    rs = np.random.RandomState(2)
    x1 = x0 + jnp.asarray(rs.normal(0, 0.01, x0.shape))  # ~2 fs of motion
    x = settle_positions(ss, x1, x0, masses)
    assert float(settle_residual(ss, x)) < 1e-12
    # the projection never moves a molecule's center of mass
    m3 = np.asarray(masses).reshape(-1, 3)
    com_unc = np.einsum("mi,mij->mj", m3, np.asarray(x1).reshape(-1, 3, 3))
    com_set = np.einsum("mi,mij->mj", m3, np.asarray(x).reshape(-1, 3, 3))
    np.testing.assert_allclose(com_set, com_unc, atol=1e-13)


def test_positions_match_converged_shake():
    """SETTLE is the analytic solution of the equations SHAKE iterates on:
    fully converged Jacobi SHAKE must land on the same point."""
    x0, masses, ss, cons = _random_waters(m=24, seed=3)
    rs = np.random.RandomState(4)
    x1 = x0 + jnp.asarray(rs.normal(0, 0.008, x0.shape))
    xs = settle_positions(ss, x1, x0, masses)
    xi = shake_positions(cons, x1, x0, 1.0 / masses, sweeps=400)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xi), atol=1e-10)


def test_velocities_exact_tangency_momentum_and_rattle_match():
    x0, masses, ss, cons = _random_waters(m=24, seed=5)
    rs = np.random.RandomState(6)
    v1 = jnp.asarray(rs.normal(0, 1.0, x0.shape))
    vs = settle_velocities(ss, x0, v1, masses)
    # exact tangency: d/dt |r_ij|^2 = 0 for all three constraints
    i, j = np.asarray(cons.pairs[:, 0]), np.asarray(cons.pairs[:, 1])
    r = np.asarray(x0)[i] - np.asarray(x0)[j]
    rv = np.einsum("ck,ck->c", np.asarray(vs)[i] - np.asarray(vs)[j], r)
    np.testing.assert_allclose(rv, 0.0, atol=1e-12)
    # per-molecule momentum unchanged
    m3 = np.asarray(masses).reshape(-1, 3)
    p_in = np.einsum("mi,mij->mj", m3, np.asarray(v1).reshape(-1, 3, 3))
    p_out = np.einsum("mi,mij->mj", m3, np.asarray(vs).reshape(-1, 3, 3))
    np.testing.assert_allclose(p_out, p_in, atol=1e-12)
    # converged iterative RATTLE lands on the same projection
    vi = rattle_velocities(cons, x0, v1, 1.0 / masses, sweeps=400)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vi), atol=1e-10)


def test_positions_large_rotation_step():
    """A hot step (0.015 nm rms per coordinate — several times a physical
    2 fs displacement, enough to rotate molecules noticeably beyond the
    SHAKE linearization's comfort zone) must still return exact geometry.
    SETTLE's domain: the apex's out-of-plane excursion relative to the COM
    within one step must stay below ra (~0.0065 nm for TIP3P) — satisfied
    by orders of magnitude for any physical timestep."""
    x0, masses, ss, _ = _random_waters(m=16, seed=7)
    rs = np.random.RandomState(8)
    x1 = x0 + jnp.asarray(rs.normal(0, 0.015, x0.shape))
    x = settle_positions(ss, x1, x0, masses)
    assert float(settle_residual(ss, x)) < 1e-12


def test_partition_constraints_classification():
    # pure water set -> all SETTLE, no leftover
    _, masses, _, cons = _random_waters(m=5, seed=9)
    ss, rest = partition_constraints(cons, masses)
    assert ss is not None and ss.size == 5 and rest is None
    np.testing.assert_allclose(np.asarray(ss.ra + ss.rb),
                               TIP3P_R_OH * np.cos(TIP3P_THETA / 2),
                               rtol=1e-12)
    # a 4-atom chain (3 constraints over 4 atoms) stays iterative
    chain = ConstraintSet(
        pairs=jnp.asarray([[0, 1], [1, 2], [2, 3]], jnp.int32),
        d0=jnp.asarray([0.1, 0.1, 0.1]),
    )
    ss2, rest2 = partition_constraints(chain, jnp.ones(4))
    assert ss2 is None and rest2.size == 3
    # scalene triangle (no equal-distance apex) stays iterative
    tri = ConstraintSet(
        pairs=jnp.asarray([[0, 1], [1, 2], [2, 0]], jnp.int32),
        d0=jnp.asarray([0.10, 0.11, 0.12]),
    )
    ss3, rest3 = partition_constraints(tri, jnp.ones(3))
    assert ss3 is None and rest3.size == 3
    # mixed set splits: water + chain
    mixed = ConstraintSet(
        pairs=jnp.concatenate([cons.pairs, 15 + chain.pairs]),
        d0=jnp.concatenate([cons.d0, chain.d0]),
    )
    ss4, rest4 = partition_constraints(mixed, jnp.concatenate(
        [masses, jnp.ones(4)]))
    assert ss4.size == 5 and rest4.size == 3


def test_rigid_water_nvt_geometry_held():
    """End-to-end: the default (analytic) rigid water under NVT holds its
    geometry to machine precision over a trajectory — VERDICT r3 #4's
    'geometry held to <= 1e-6 nm' done two orders better, with no RATTLE
    sweeps anywhere in the step."""
    system, x, box = rigid_water_system(n_molecules=64, r_cut=0.6,
                                        r_switch=0.5, seed=2)
    assert system.settle is not None and system.constraints is None
    bath = NoseHooverChainPropagator(300.0, 3 * 192 - 3 * 64 - 3, 0.1)
    ctx = Context(system, GlobalThermostatIntegrator(0.002, bath),
                  make_state(x, box=box))
    ctx.set_velocities_to_temperature(300.0, seed=3)
    # lattice melt dumps PE; rescale between chunks (bench.py protocol)
    for _ in range(4):
        ctx.step(75)
        t_now = float(ctx.temperature())
        ctx.set_velocities((300.0 / t_now) ** 0.5 * ctx.state.v)
    ctx.step(250)  # 0.5 ps at 2 fs
    res = float(settle_residual(system.settle, ctx.state.x))
    assert res < 1e-10, res
    t = float(ctx.temperature())
    assert 200.0 < t < 450.0, t


@pytest.mark.slow
def test_rigid_water_npt_barostat_preserves_geometry():
    """Composition: MC barostat + SETTLE — molecular COM scaling must leave
    the rigid geometry exact through accepted volume moves, and the box
    must actually move."""
    from atomsmm_tpu import MonteCarloBarostat
    from atomsmm_tpu.integrate.propagators import (
        VelocityRescalingPropagator,
    )

    system, x, box = rigid_water_system(n_molecules=64, r_cut=0.6,
                                        r_switch=0.5, seed=2)
    system = system.add_force(
        MonteCarloBarostat(pressure=1.0, temperature=300.0, frequency=10))
    dof = 3 * 192 - 3 * 64 - 3
    thermo = VelocityRescalingPropagator(300.0, dof, 0.1)
    ctx = Context(system, GlobalThermostatIntegrator(0.002, thermo),
                  make_state(x, box=box, seed=5))
    ctx.set_velocities_to_temperature(300.0, seed=6)
    v0 = float(ctx.state.box[0]) ** 3
    ctx.step(300)
    assert int(ctx.state.extra["baro_nattempted"]) >= 25
    assert int(ctx.state.extra["baro_naccepted"]) >= 1
    v1 = float(ctx.state.box[0]) ** 3
    assert v1 != v0  # at least one accepted volume move
    res = float(settle_residual(system.settle, ctx.state.x))
    assert res < 1e-10, res


@pytest.mark.slow
def test_settle_and_shake_trajectories_agree():
    """analytic=True and analytic=False are the same physics: short NVE
    trajectories from identical states agree to SHAKE's convergence level."""
    sys_a, x, box = rigid_water_system(n_molecules=27, r_cut=0.45,
                                       r_switch=0.38, seed=4, analytic=True)
    sys_i, _, _ = rigid_water_system(n_molecules=27, r_cut=0.45,
                                     r_switch=0.38, seed=4, analytic=False)
    ca = Context(sys_a, VelocityVerletIntegrator(0.001), make_state(x, box=box))
    ca.set_velocities_to_temperature(300.0, seed=5)
    v0 = ca.state.v
    ci = Context(sys_i, VelocityVerletIntegrator(0.001),
                 make_state(x, v=v0, box=box))
    ca.step(20)
    ci.step(20)
    np.testing.assert_allclose(np.asarray(ci.state.x), np.asarray(ca.state.x),
                               atol=5e-7)


def test_partition_rejects_degenerate_and_malformed_groups():
    """Review findings (round 4): eligibility must imply a non-degenerate
    canonical triangle and never crash on malformed input — everything
    else stays on SHAKE/RATTLE."""
    # linear symmetric molecule (constrained CO2): d_BC == 2 d_AB, h == 0 —
    # SETTLE would divide by ra = 0 and NaN the trajectory
    lin = ConstraintSet(
        pairs=jnp.asarray([[0, 1], [0, 2], [1, 2]], jnp.int32),
        d0=jnp.asarray([0.116, 0.116, 0.232]),
    )
    ss, rest = partition_constraints(lin, jnp.asarray([12.0, 16.0, 16.0]))
    assert ss is None and rest.size == 3
    # impossible geometry (d_BC > 2 d_AB): sqrt of a negative at build time
    imp = ConstraintSet(
        pairs=jnp.asarray([[0, 1], [0, 2], [1, 2]], jnp.int32),
        d0=jnp.asarray([0.116, 0.116, 0.30]),
    )
    ss, rest = partition_constraints(imp, jnp.asarray([12.0, 16.0, 16.0]))
    assert ss is None and rest.size == 3
    # duplicated pair: 3 constraints over 3 atoms but not a triangle —
    # used to KeyError out of system construction
    dup = ConstraintSet(
        pairs=jnp.asarray([[0, 1], [0, 1], [1, 2]], jnp.int32),
        d0=jnp.asarray([0.1, 0.1, 0.1]),
    )
    ss, rest = partition_constraints(dup, jnp.ones(3))
    assert ss is None and rest.size == 3
    # near-equal satellite masses right at the old tolerance mismatch:
    # partition and make_settle_set now share one predicate, so whatever
    # the classification, construction must not raise
    tri = ConstraintSet(
        pairs=jnp.asarray([[0, 1], [0, 2], [1, 2]], jnp.int32),
        d0=jnp.asarray([0.09572, 0.09572, 0.15139]),
    )
    masses = jnp.asarray([15.999, 100.0, 100.0 + 5e-8])
    ss, rest = partition_constraints(tri, masses)
    assert (ss is not None and ss.size == 1) or (rest is not None
                                                 and rest.size == 3)


def test_make_settle_set_rejects_degenerate_triangle():
    with pytest.raises(ValueError, match="non-degenerate"):
        make_settle_set(np.asarray([[0, 1, 2]], np.int32), 0.116, 0.232,
                        np.asarray([12.0, 16.0, 16.0]))

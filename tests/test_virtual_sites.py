"""Virtual sites (massless interaction points — TIP4P/TIP5P extra sites;
SURVEY.md §2b substrate capability, VERDICT r3 missing #5).

The TPU-native formulation evaluates the potential at placed coordinates,
so force redistribution onto parents is the vjp of the placement — the
oracles are therefore independent consistency checks: explicit-force path
vs autodiff-through-placement, finite differences w.r.t. PARENT
coordinates only, zero force/velocity on virtual rows, and rigid TIP4P/Ew
dynamics with exact geometry and a conserved energy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atomsmm_tpu import Context, VelocityVerletIntegrator, make_state
from atomsmm_tpu.models import tip4p_water_system
from atomsmm_tpu.models.water import TIP4P_EW_D_OM
from atomsmm_tpu.ops.settle import settle_residual
from atomsmm_tpu.ops.virtual_sites import (
    VirtualSiteSet,
    place_virtual_sites,
)
from atomsmm_tpu.potential import force_fn, potential_energy
from atomsmm_tpu.utils import count_degrees_of_freedom


@pytest.fixture(scope="module")
def tip4p():
    return tip4p_water_system(n_molecules=27, r_cut=0.45, r_switch=0.4,
                              seed=2)


def test_m_site_placement(tip4p):
    system, x, box = tip4p
    xm = np.asarray(x).reshape(-1, 4, 3)
    d_om = np.linalg.norm(xm[:, 3] - xm[:, 0], axis=1)
    np.testing.assert_allclose(d_om, TIP4P_EW_D_OM, atol=1e-12)
    # M on the bisector: equidistant from both hydrogens
    d1 = np.linalg.norm(xm[:, 3] - xm[:, 1], axis=1)
    d2 = np.linalg.norm(xm[:, 3] - xm[:, 2], axis=1)
    np.testing.assert_allclose(d1, d2, atol=1e-12)


def test_force_pullback_matches_autodiff_and_fd(tip4p):
    """The explicit-forces path (energy_and_forces at placed coordinates +
    vjp pullback) must equal -grad of potential_energy (autodiff straight
    through the placement) AND central differences w.r.t. parent atoms;
    virtual rows carry exactly zero force."""
    system, x, box = tip4p
    e, f = force_fn(system)(x, box, {}, None)
    g = jax.grad(lambda xx: potential_energy(system, xx, box))(x)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), atol=1e-9)
    vs_rows = np.asarray(system.virtual_sites.sites)
    np.testing.assert_array_equal(np.asarray(f)[vs_rows], 0.0)
    # FD on a hydrogen (feels its own charge AND the M-site pullback)
    h = 1e-6
    for dim in range(3):
        xp = x.at[1, dim].add(h)
        xm_ = x.at[1, dim].add(-h)
        fd = -(potential_energy(system, xp, box)
               - potential_energy(system, xm_, box)) / (2 * h)
        np.testing.assert_allclose(float(f[1, dim]), float(fd), rtol=5e-5,
                                   atol=5e-5)


def test_out_of_plane_site_fd():
    """TIP5P-style out-of-plane construction: placement leaves the parent
    plane, and pullback forces match finite differences."""
    x = jnp.asarray([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0], [0.0, 0.1, 0.0],
                     [9.0, 9.0, 9.0]])
    vs = VirtualSiteSet(
        sites=jnp.asarray([3]),
        parents=jnp.asarray([[0, 1, 2]]),
        weights=jnp.asarray([[0.4, 0.3, 0.3]]),
        oop=jnp.asarray([5.0]),
    )
    xp = place_virtual_sites(vs, x)
    assert abs(float(xp[3, 2])) > 1e-3  # genuinely out of the z=0 plane

    # toy energy: spring pulling the virtual site to a target point
    target = jnp.asarray([0.05, 0.02, 0.08])

    def e_of(xx):
        xx = place_virtual_sites(vs, xx)
        return jnp.sum((xx[3] - target) ** 2)

    g = jax.grad(e_of)(x)
    assert float(jnp.max(jnp.abs(g[3]))) == 0.0  # no force on the vs row
    h = 1e-6
    for atom in range(3):
        for dim in range(3):
            xp_ = x.at[atom, dim].add(h)
            xm_ = x.at[atom, dim].add(-h)
            fd = (e_of(xp_) - e_of(xm_)) / (2 * h)
            np.testing.assert_allclose(float(g[atom, dim]), float(fd),
                                       rtol=1e-6, atol=1e-10)


def test_dof_excludes_virtual_sites(tip4p):
    system, _, _ = tip4p
    m = 27
    # 12m coords - 3m SETTLE constraints - 3m virtual rows - 3 COM
    assert count_degrees_of_freedom(system) == 6 * m - 3


@pytest.mark.slow
def test_tip4p_nve_dynamics(tip4p):
    """Rigid TIP4P/Ew under velocity Verlet: energy conserved, SETTLE
    geometry exact, M sites track their construction, virtual velocities
    stay zero.

    Preparation mirrors the rigid-TIP3P NVE test: relax the O-O packing
    with charges OFF first — H and M carry no LJ, so a lattice overlap
    would let an H collapse into a foreign M (bare opposite charges, no
    repulsive core) — then thermalize briefly with full charges."""
    system, x, box = tip4p
    from atomsmm_tpu.minimize import minimize_energy
    from atomsmm_tpu.utils import replace as dreplace

    uncharged = system.replace_forces([
        dreplace(system.forces[0],
                 charge=jnp.zeros_like(system.forces[0].charge))
    ])
    ctx0 = Context(uncharged, VelocityVerletIntegrator(0.002),
                   make_state(x, box=box))
    minimize_energy(ctx0, steps=300)
    ctx = Context(system, VelocityVerletIntegrator(0.002),
                  make_state(ctx0.state.x, box=box))
    ctx.set_velocities_to_temperature(300.0, seed=3)
    for _ in range(6):  # short full-charge thermalization, rescaled
        ctx.step(75)
        t_now = float(ctx.temperature())
        ctx.set_velocities((300.0 / t_now) ** 0.5 * ctx.state.v)
    vs_rows = np.asarray(system.virtual_sites.sites)
    assert np.all(np.asarray(ctx.state.v)[vs_rows] == 0.0)
    e0 = float(ctx.conserved_energy())
    ctx.step(200)
    e1 = float(ctx.conserved_energy())
    drift = abs(e1 - e0) / system.num_particles
    # 2 fs rigid water from a briefly-thermalized small box: ~1e-3
    # kJ/mol/atom over 0.4 ps (vs ~1 when the pullback/placement was
    # exercised from the raw overlapped lattice)
    assert drift < 4e-3, drift
    assert float(settle_residual(system.settle, ctx.state.x)) < 1e-10
    # stored M rows equal their construction from the current parents
    placed = place_virtual_sites(system.virtual_sites, ctx.state.x)
    np.testing.assert_allclose(np.asarray(ctx.state.x)[vs_rows],
                               np.asarray(placed)[vs_rows], atol=1e-12)
    assert np.all(np.asarray(ctx.state.v)[vs_rows] == 0.0)
    t = float(ctx.temperature())
    assert 100.0 < t < 700.0, t


def test_chained_virtual_sites_rejected():
    """Review finding (round 4): single-pass placement cannot express a
    virtual site whose parent is itself virtual — reject at construction
    instead of silently reading the stale stored row."""
    from atomsmm_tpu.ops.virtual_sites import (
        VirtualSiteSet,
        validate_virtual_sites,
    )
    from atomsmm_tpu.utils import InputError

    ok = VirtualSiteSet(
        sites=jnp.asarray([3], jnp.int32),
        parents=jnp.asarray([[0, 1, 2]], jnp.int32),
        weights=jnp.asarray([[0.8, 0.1, 0.1]]),
        oop=jnp.zeros(1),
    )
    assert validate_virtual_sites(ok) is ok
    chained = VirtualSiteSet(
        sites=jnp.asarray([3, 4], jnp.int32),
        parents=jnp.asarray([[0, 1, 2], [3, 1, 2]], jnp.int32),
        weights=jnp.asarray([[0.8, 0.1, 0.1], [0.5, 0.25, 0.25]]),
        oop=jnp.zeros(2),
    )
    with pytest.raises(InputError, match="chained"):
        validate_virtual_sites(chained)
    dup = VirtualSiteSet(
        sites=jnp.asarray([3, 3], jnp.int32),
        parents=jnp.asarray([[0, 1, 2], [0, 1, 2]], jnp.int32),
        weights=jnp.asarray([[0.8, 0.1, 0.1], [0.5, 0.25, 0.25]]),
        oop=jnp.zeros(2),
    )
    with pytest.raises(InputError, match="duplicate"):
        validate_virtual_sites(dup)


def test_cold_start_capacity_covers_lattice_aliasing():
    """r4 gate regression: 750 TIP4P molecules on the default cutoff give a
    3^3 cell grid whose coarse cells alias whole lattice planes (~213 sites
    in one cell vs the 200 the 1.7x mean-density margin provisions). Before
    occupancy_floor_from, the bucket overflowed at SETUP and the direct-aux
    path (no Context auto-recovery) silently dropped pairs: the on-TPU gate
    read dE = +194.7 kJ/mol / max|dF| = 1.7e3 vs the dense reference — a
    path bug masquerading as an f32 precision failure. Builders now floor
    the capacity at the measured setup occupancy, and assert_neighbor_health
    gives direct consumers a loud check."""
    from atomsmm_tpu.ops.neighbors import (
        all_neighbor_extras,
        assert_neighbor_health,
        make_aux,
        _max_cell_occupancy,
    )
    from atomsmm_tpu.potential import group_energies

    system, x, box = tip4p_water_system(n_molecules=750, neighbors=True)
    spec = system.neighbors
    occ = _max_cell_occupancy(np.asarray(x), np.asarray(box), spec.grid)
    assert spec.cell_capacity >= occ, (spec.cell_capacity, occ)

    rng = np.random.RandomState(0)
    xj = x + jnp.asarray(rng.normal(0.0, 0.004, np.shape(x)))
    extras = all_neighbor_extras(system, xj, box)
    assert_neighbor_health(extras)
    aux = make_aux(system, extras)
    e_cell = float(group_energies(system, xj, box, {}, aux)[0])
    e_dense = float(group_energies(system, xj, box, {}, None)[0])
    assert abs(e_cell - e_dense) < 1e-6 * max(abs(e_dense), 1.0)


def test_assert_neighbor_health_raises_on_overflow():
    from atomsmm_tpu.ops.neighbors import (
        NBR_OVERFLOW,
        assert_neighbor_health,
    )

    with pytest.raises(RuntimeError, match="overflow"):
        assert_neighbor_health({NBR_OVERFLOW: jnp.asarray(True)})
    assert_neighbor_health({NBR_OVERFLOW: jnp.asarray(False)})

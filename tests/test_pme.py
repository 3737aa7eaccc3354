"""M5: PME vs. direct Ewald summation and physical limits.

No OpenMM available (SURVEY.md §0), so the oracles are (a) a slow plane-wave
Ewald reciprocal sum, (b) alpha-independence of the total Ewald energy, and
(c) the NaCl Madelung constant — analytic goldens per SURVEY.md §7.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomsmm_tpu.ops.pme import (
    bspline_weights,
    choose_pme_parameters,
    ewald_reference_energy,
    pme_corrections,
    pme_exclusion_correction,
    pme_reciprocal_energy,
    pme_self_energy,
)
from atomsmm_tpu.units import ONE_4PI_EPS0


def random_neutral_system(n=32, seed=0, box_l=2.0):
    rs = np.random.RandomState(seed)
    x = rs.uniform(0, box_l, (n, 3))
    q = rs.uniform(-1, 1, n)
    q -= q.mean()  # neutral
    return jnp.asarray(x), jnp.asarray(q), jnp.asarray([box_l] * 3)


def test_bspline_weights_sum_to_one():
    t = jnp.linspace(0.0, 0.999, 41)
    for order in (3, 4, 5, 6):
        w = bspline_weights(t, order)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-12)
        assert float(w.min()) >= 0.0


def test_low_spline_orders_rejected():
    """order < 2 has no valid recurrence seed; differentiating order < 3
    would return M_2 values mislabeled as M_1 and silently corrupt PME
    forces (ADVICE r3) — both must raise, and PME spreading requires >= 3."""
    t = jnp.linspace(0.0, 0.999, 8)
    with pytest.raises(ValueError, match="order must be >= 2"):
        bspline_weights(t, 1)
    # order-2 VALUES are exact (the seed itself)
    w2 = bspline_weights(t, 2)
    np.testing.assert_allclose(np.asarray(w2.sum(-1)), 1.0, atol=1e-12)
    with pytest.raises(ValueError, match="requires order >= 3"):
        jax.jacfwd(lambda tt: bspline_weights(tt, 2))(t)
    from atomsmm_tpu.ops.pme import spread_charges
    with pytest.raises(ValueError, match="spline_order must be >= 3"):
        spread_charges(jnp.zeros((4, 3)), jnp.ones(3), jnp.ones(4),
                       (8, 8, 8), order=2)


def test_bspline_derivative_exact_on_grid_plane():
    """Regression: an atom sitting EXACTLY on a grid plane (t = 0) used to
    get a catastrophically wrong PME force — autodiff through the M_2
    recurrence's max/abs kinks picked subgradients whose row sum was -1
    instead of 0.  The custom_jvp analytic derivative
    d/du M_n(u) = M_{n-1}(u) - M_{n-1}(u-1) is branch-free and exact there.
    Found via a frozen-state hydrogen at x = 0.8 L that broke every grid
    with 5 | K (tools/pme_order_study.py)."""
    for order in (4, 5, 6, 8):
        for t0 in (0.0, 0.25, 0.5):
            d = jax.grad(lambda t: bspline_weights(t, order).sum())(
                jnp.float64(t0))
            np.testing.assert_allclose(float(d), 0.0, atol=1e-12)
            # FD cross-check of each weight's derivative
            g = jax.jacfwd(lambda t: bspline_weights(t, order))(
                jnp.float64(t0))
            h = 1e-6
            fd = (bspline_weights(jnp.float64(t0 + h), order)
                  - bspline_weights(jnp.float64(t0 - h), order)) / (2 * h)
            np.testing.assert_allclose(np.asarray(g), np.asarray(fd),
                                       atol=5e-6)


def test_pme_force_exact_for_atom_on_grid_node():
    """The end-to-end version of the regression above: place one charge at a
    coordinate that is an exact multiple of the grid spacing (K divisible by
    5, x = 0.8 L) and check grad(E) against central finite differences."""
    x, q, box = random_neutral_system(n=12, seed=3)
    x = x.at[0].set(jnp.asarray([0.8 * box[0], 0.5 * box[1], 0.0]))
    alpha = 3.0

    @jax.jit
    def e(xx):
        return pme_reciprocal_energy(xx, box, q, alpha, (15, 15, 15), order=6)

    f = -jax.grad(e)(x)
    h = 1e-5
    for dim in range(3):
        xp = x.at[0, dim].add(h)
        xm = x.at[0, dim].add(-h)
        fd = -(e(xp) - e(xm)) / (2 * h)
        np.testing.assert_allclose(float(f[0, dim]), float(fd),
                                   rtol=2e-4, atol=2e-4)


def test_choose_pme_parameters_orders():
    """Order-aware grid rule: higher order → coarser grid, openmm-identical
    at order 4; odd-order Nyquist moduli are finite after zeroing."""
    a4, g4, o4 = choose_pme_parameters(0.9, np.array([3.0, 3.0, 3.0]),
                                       order=4)
    a6, g6, o6 = choose_pme_parameters(0.9, np.array([3.0, 3.0, 3.0]))
    assert o4 == 4 and o6 == 6 and a4 == a6
    assert all(k6 <= k4 for k6, k4 in zip(g6, g4))
    # order 5 on an even grid exercises the odd-order Nyquist singularity
    x, q, box = random_neutral_system(n=8, seed=1)
    e = pme_reciprocal_energy(x, box, q, 2.5, (12, 12, 12), order=5)
    assert np.isfinite(float(e))


def test_reciprocal_matches_plane_wave_ewald():
    x, q, box = random_neutral_system(n=32)
    alpha = 3.0
    e_pme = pme_reciprocal_energy(x, box, q, alpha, (48, 48, 48), order=6)
    e_ref = ewald_reference_energy(x, box, q, alpha, kmax=14)
    np.testing.assert_allclose(float(e_pme), float(e_ref), rtol=2e-6)


def test_pme_accuracy_across_npt_volume_swing():
    """NPT validity (VERDICT r3 #7): a STATIC (alpha, grid) chosen by
    choose_pme_parameters must keep the reciprocal energy within its design
    tolerance across a +-5% volume swing (+-1.6% box lengths) — exactly the
    fluctuation range of a 1-bar water box — and the inverse bound
    pme_validity_lengths must cover that swing."""
    from atomsmm_tpu.ops.pme import (
        choose_pme_parameters,
        pme_validity_lengths,
    )

    x, q, box = random_neutral_system(n=32, box_l=2.0)
    r_cut = 0.9
    alpha, grid, order = choose_pme_parameters(r_cut, np.full(3, 2.0))
    bounds = pme_validity_lengths(alpha, grid, order, r_cut)
    for vol_scale in (0.95, 1.0, 1.05):
        s = vol_scale ** (1.0 / 3.0)
        xs, bs = x * s, box * s
        e_pme = pme_reciprocal_energy(xs, bs, q, alpha, grid, order=order)
        e_ref = ewald_reference_energy(xs, bs, q, alpha, kmax=14)
        # 5e-4 design tolerance, relative to the reciprocal magnitude
        err = abs(float(e_pme) - float(e_ref)) / abs(float(e_ref))
        assert err < 5e-4, (vol_scale, err)
        if vol_scale <= 1.05:
            assert all(float(b) * s <= bd for b, bd in zip(box, bounds)), (
                "validity bound should cover a +5% volume swing: "
                f"{[float(b) * s for b in box]} vs {bounds}"
            )


def test_pme_npt_guard_and_retune():
    """The sticky pme_*_undercover flag must trip when the box grows past
    the static grid's validity bound, and Context.retune_pme() must regrid
    for the new box and clear it."""
    import pytest

    from atomsmm_tpu import Context, VelocityVerletIntegrator, make_state
    from atomsmm_tpu.models import water_system

    system, x, box = water_system(n_molecules=48, method="pme", r_cut=0.45,
                                  r_switch=0.38)
    ctx = Context(system, VelocityVerletIntegrator(0.0005),
                  make_state(x, box=box))
    ctx.step(2)  # in-bounds: no flag
    # inflate the box 30% (far past any headroom), scale positions with it
    s = 1.3
    ctx.set_positions(ctx.state.x * s)
    ctx.setPeriodicBoxVectors(ctx.state.box * s)
    with pytest.raises(RuntimeError, match="PME grid coverage"):
        ctx.step(1)
    old_grid = system.forces[0].grid_shape
    ctx.retune_pme()
    new_grid = ctx.system.forces[0].grid_shape
    assert all(b >= a for a, b in zip(old_grid, new_grid))
    assert any(b > a for a, b in zip(old_grid, new_grid))
    ctx.step(2)  # regridded: steps cleanly


@pytest.mark.slow
def test_pme_npt_short_run_guard_quiet():
    """A PME system under the MC barostat at 1 bar must step cleanly: normal
    volume fluctuations stay inside the static grid's validity bound (the
    round-3 bench quietly avoided PME under NPT — VERDICT r3 #7)."""
    from atomsmm_tpu import (
        Context,
        GlobalThermostatIntegrator,
        MonteCarloBarostat,
        make_state,
    )
    from atomsmm_tpu.integrate.propagators import (
        VelocityRescalingPropagator,
    )
    from atomsmm_tpu.models import water_system

    system, x, box = water_system(n_molecules=64, method="pme", r_cut=0.5,
                                  r_switch=0.42)
    system = system.add_force(
        MonteCarloBarostat(pressure=1.0, temperature=300.0, frequency=10))
    thermo = VelocityRescalingPropagator(300.0, 3 * 192 - 3, 0.1)
    ctx = Context(system, GlobalThermostatIntegrator(0.0005, thermo),
                  make_state(x, box=box, seed=6))
    ctx.set_velocities_to_temperature(300.0, seed=7)
    ctx.step(120)  # several barostat attempts; raises if the guard trips
    assert float(ctx.state.extra["baro_nattempted"]) >= 10


def test_total_ewald_energy_alpha_independent():
    """direct(erfc) + reciprocal + self must not depend on alpha."""
    from atomsmm_tpu.ops.pairfuncs import damped_coulomb
    from atomsmm_tpu.ops.pairs import dense_pair_energy

    x, q, box = random_neutral_system(n=24, box_l=2.5)
    exclusions = jnp.full((24, 1), -1, jnp.int32)

    def total(alpha):
        def pair(r, pi, pj):
            return damped_coulomb(r, pi["q"] * pj["q"], alpha)

        e_dir = dense_pair_energy(
            pair, x, box, {"q": q}, exclusions, 1.2, chunk=8
        )
        e_rec = pme_reciprocal_energy(x, box, q, alpha, (64, 64, 64), order=6)
        return float(e_dir + e_rec + pme_self_energy(q, alpha))

    e1, e2 = total(3.2), total(3.8)
    np.testing.assert_allclose(e1, e2, rtol=2e-5)


def test_madelung_nacl():
    """Rock-salt lattice: E per ion pair = -M k_e e^2 / a_nn,
    Madelung constant M = 1.7475645946..."""
    n_side = 4  # 4^3 = 64 ions
    a = 0.3  # nm nearest-neighbor distance
    pts = np.array(
        [
            (i, j, k)
            for i in range(n_side)
            for j in range(n_side)
            for k in range(n_side)
        ],
        np.float64,
    )
    x = jnp.asarray(pts * a)
    q = jnp.asarray([(-1.0) ** (i + j + k) for i, j, k in pts])
    box = jnp.asarray([n_side * a] * 3)
    alpha = 8.0
    from atomsmm_tpu.ops.pairfuncs import damped_coulomb
    from atomsmm_tpu.ops.pairs import dense_pair_energy

    def pair(r, pi, pj):
        return damped_coulomb(r, pi["q"] * pj["q"], alpha)

    e_dir = dense_pair_energy(
        pair, x, box, {"q": q}, jnp.full((64, 1), -1, jnp.int32), 0.58, chunk=16
    )
    e_rec = pme_reciprocal_energy(x, box, q, alpha, (96, 96, 96), order=6)
    e = float(e_dir + e_rec + pme_self_energy(q, alpha))
    # energy per ION PAIR (32 pairs in 64 ions): U = -M k e^2 / a_nn
    madelung = -e / 32.0 * a / ONE_4PI_EPS0
    np.testing.assert_allclose(madelung, 1.7475645946, rtol=1e-5)


def test_exclusion_correction():
    """Excluding a pair must remove exactly its full Coulomb interaction:
    (direct erfc term skipped) + (reciprocal) + (-erf correction) == no pair."""
    x = jnp.asarray([[0.5, 0.5, 0.5], [0.72, 0.5, 0.5]])
    q = jnp.asarray([0.5, -0.5])
    box = jnp.asarray([2.0, 2.0, 2.0])
    alpha = 4.0
    exc = jnp.asarray([[1], [0]], jnp.int32)
    corr = pme_exclusion_correction(x, box, q, exc, alpha)
    r = 0.22
    expected = -ONE_4PI_EPS0 * (-0.25) * math.erf(alpha * r) / r
    np.testing.assert_allclose(float(corr), expected, rtol=1e-10)


@pytest.mark.slow
def test_pme_forces_match_numerical_gradient():
    x, q, box = random_neutral_system(n=16, box_l=1.8)
    alpha = 3.5

    def efn(xx):
        return pme_reciprocal_energy(xx, box, q, alpha, (32, 32, 32), order=4)

    g = jax.grad(efn)(x)
    h = 1e-6
    rs = np.random.RandomState(1)
    for _ in range(4):
        i, d = rs.randint(16), rs.randint(3)
        ep = float(efn(x.at[i, d].add(h)))
        em = float(efn(x.at[i, d].add(-h)))
        np.testing.assert_allclose(
            float(g[i, d]), (ep - em) / (2 * h), rtol=1e-4, atol=1e-7
        )


@pytest.mark.slow
def test_nonbonded_pme_method_end_to_end():
    """NonbondedForce(method='pme') total == erfc-pair + recip + corrections,
    and the neighbor path agrees with the dense path."""
    from atomsmm_tpu.models import water_system
    from atomsmm_tpu.ops.neighbors import neighbor_list_extras, make_aux
    from atomsmm_tpu.potential import force_fn, potential_energy

    system, x, box = water_system(
        n_molecules=64, method="pme", r_cut=0.55, r_switch=0.45, neighbors=True
    )
    aux = make_aux(system, neighbor_list_extras(system.neighbors, x, box))
    e_dense = potential_energy(system, x, box)
    e_nbr = potential_energy(system, x, box, aux=aux)
    np.testing.assert_allclose(float(e_nbr), float(e_dense), rtol=1e-10)
    _, f_dense = force_fn(system)(x, box)
    _, f_nbr = force_fn(system)(x, box, aux=aux)
    np.testing.assert_allclose(
        np.asarray(f_nbr), np.asarray(f_dense), rtol=1e-7, atol=1e-7
    )


# --------------------------------------------------------------------------
# Block-binned spreading (spread_charges_blocked) — round 4
# --------------------------------------------------------------------------


def _blocked_imports():
    from atomsmm_tpu.ops.pme import (
        choose_spread_blocks,
        spread_block_overflow,
        spread_charges,
        spread_charges_blocked,
    )
    return (choose_spread_blocks, spread_block_overflow, spread_charges,
            spread_charges_blocked)


@pytest.mark.parametrize("order", [4, 6])
def test_blocked_spreading_matches_dense(order):
    """The block-binned spreading produces the SAME charge grid as the dense
    one-hot path (same weights, different summation structure), including
    atoms whose spline support wraps across the periodic boundary."""
    _, _, spread, spread_blk = _blocked_imports()
    x, q, box = random_neutral_system(n=96, seed=3)
    # push some atoms right up against the box faces to exercise the wrap
    x = jnp.concatenate([x, jnp.asarray([[1.999, 0.001, 1.998],
                                         [0.0005, 1.9995, 0.001]])])
    q = jnp.concatenate([q, jnp.asarray([0.5, -0.5])])
    grid = (12, 12, 12)
    qd = spread(x, box, q, grid, order)
    qb = spread_blk(x, box, q, grid, order, block=(6, 6, 6), cap=64)
    np.testing.assert_allclose(np.asarray(qb), np.asarray(qd),
                               rtol=1e-12, atol=1e-13)


@pytest.mark.slow
def test_blocked_spreading_gradients_match_dense():
    """Reciprocal energy AND its position gradient agree between the two
    spreading formulations — including an atom sitting EXACTLY on a grid
    plane (the custom_jvp hard case) placed on a block boundary."""
    from atomsmm_tpu.ops.pme import pme_reciprocal_energy

    x, q, box = random_neutral_system(n=48, seed=7)
    # exactly on a grid plane AND a block boundary (grid 12, block 6)
    x = x.at[0].set(jnp.asarray([1.0, 0.5, 1.5]))
    grid, order, alpha = (12, 12, 12), 6, 2.2

    def e_dense(xx):
        return pme_reciprocal_energy(xx, box, q, alpha, grid, order)

    def e_blocked(xx):
        return pme_reciprocal_energy(xx, box, q, alpha, grid, order,
                                     spread_block=(6, 6, 6), spread_cap=48)

    ed, gd = jax.value_and_grad(e_dense)(x)
    eb, gb = jax.value_and_grad(e_blocked)(x)
    np.testing.assert_allclose(float(eb), float(ed), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gd),
                               rtol=1e-9, atol=1e-10)


def test_blocked_spreading_triclinic():
    from atomsmm_tpu.ops.pbc import triclinic_from_lengths_angles
    _, _, spread, spread_blk = _blocked_imports()
    rs = np.random.RandomState(11)
    box = jnp.asarray(
        triclinic_from_lengths_angles(2.0, 2.1, 1.9, 80.0, 95.0, 70.0))
    frac = rs.uniform(0, 1, (64, 3))
    x = jnp.asarray(frac) @ box
    q = jnp.asarray(rs.uniform(-1, 1, 64))
    q = q - q.mean()
    grid = (12, 12, 12)
    qd = spread(x, box, q, grid, 6)
    qb = spread_blk(x, box, q, grid, 6, block=(6, 6, 6), cap=48)
    np.testing.assert_allclose(np.asarray(qb), np.asarray(qd),
                               rtol=1e-11, atol=1e-12)


def test_spread_block_overflow_flag():
    _, overflow, _, _ = _blocked_imports()
    x, q, box = random_neutral_system(n=64, seed=1)
    grid, order, block = (12, 12, 12), 6, (6, 6, 6)
    assert not bool(overflow(x, box, grid, order, block, cap=64))
    # all atoms in one corner -> one block holds everything
    x_tight = x * 0.01
    assert bool(overflow(x_tight, box, grid, order, block, cap=8))


def test_choose_spread_blocks_valid_and_beneficial():
    choose, _, _, _ = _blocked_imports()
    rs = np.random.RandomState(2)
    n, grid, order = 30000, (48, 48, 48), 6
    x = rs.uniform(0, 6.4, (n, 3))
    box = np.full(3, 6.4)
    block, cap = choose(grid, order, n, x=x, box=box)
    assert block is not None
    for k, b in zip(grid, block):
        assert k % b == 0 and b >= order - 1
    nbtot = int(np.prod([k // b for k, b in zip(grid, block)]))
    assert cap * nbtot >= n  # capacity covers the atom count
    macs = nbtot * cap * int(np.prod([b + order - 1 for b in block]))
    assert macs * 2 <= n * int(np.prod(grid))  # >= 2x cheaper than dense
    # tiny grids: blocking cannot win -> dense fallback
    block_none, cap0 = choose((8, 8, 8), 6, 64)
    assert block_none is None and cap0 == 0


@pytest.mark.slow
def test_retune_pme_spread_end_to_end():
    """retune_pme_spread flips a PME water system to blocked spreading with
    identical energies/forces, and Context seeds + trips the overflow flag."""
    from atomsmm_tpu.forces import retune_pme_spread
    from atomsmm_tpu.models import water_system
    from atomsmm_tpu.potential import force_fn, potential_energy

    system, x, box = water_system(
        n_molecules=64, method="pme", r_cut=0.55, r_switch=0.45
    )
    tuned = retune_pme_spread(system, x, box)
    carriers = [f for f in tuned.forces
                if getattr(f, "spread_block", ())]
    if not carriers:  # grid too small to benefit on this box — force it
        from atomsmm_tpu.utils import replace
        grid = next(f.grid_shape for f in tuned.forces
                    if getattr(f, "method", None) == "pme")
        block = tuple(min(d for d in range(5, k + 1) if k % d == 0)
                      for k in grid)
        tuned = tuned.replace_forces([
            replace(f, spread_block=block, spread_cap=1024)
            if getattr(f, "method", None) == "pme" else f
            for f in tuned.forces
        ])
    e0 = potential_energy(system, x, box)
    e1 = potential_energy(tuned, x, box)
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-11)
    _, f0 = force_fn(system)(x, box)
    _, f1 = force_fn(tuned)(x, box)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-8, atol=1e-8)


def test_spread_overflow_raises_in_context():
    """Context seeds the sticky spread-overflow flag and step() raises when
    a block's capacity is exceeded (atoms dropped from the reciprocal sum
    must be loud, never silent)."""
    from atomsmm_tpu import Context, VelocityVerletIntegrator, make_state
    from atomsmm_tpu.models import water_system
    from atomsmm_tpu.utils import replace

    system, x, box = water_system(
        n_molecules=64, method="pme", r_cut=0.55, r_switch=0.45
    )
    grid = next(f.grid_shape for f in system.forces
                if getattr(f, "method", None) == "pme")
    block = tuple(min(d for d in range(5, k + 1) if k % d == 0)
                  for k in grid)
    rigged = system.replace_forces([
        replace(f, spread_block=block, spread_cap=1)  # guaranteed overflow
        if getattr(f, "method", None) == "pme" else f
        for f in system.forces
    ])
    ctx = Context(rigged, VelocityVerletIntegrator(dt=0.0005),
                  make_state(x, box=box))
    assert any(k.endswith("spread_overflow") for k in ctx.state.extra)
    with pytest.raises(RuntimeError, match="spreading-block overflow"):
        ctx.step(1)


def test_bucket_binning_methods_identical():
    """'hist' (MXU histogram ranking) and 'sort' (packed value sort) produce
    IDENTICAL buckets — both rank ascending-atom-id within a block — across
    chunk boundaries (n > 128), empty blocks, and over-capacity drops."""
    from atomsmm_tpu.ops.pme import _bucket_by_block

    rs = np.random.RandomState(9)
    nbtot, cap = 37, 6
    for n in (5, 128, 129, 500):
        bid = jnp.asarray(rs.randint(0, nbtot, n), jnp.int32)
        bh = _bucket_by_block(bid, n, nbtot, cap, "hist")
        bs = _bucket_by_block(bid, n, nbtot, cap, "sort")
        np.testing.assert_array_equal(np.asarray(bh), np.asarray(bs))
    # crowded: every atom in block 3 -> first cap ids kept, rest dropped
    bid = jnp.full((300,), 3, jnp.int32)
    bh = _bucket_by_block(bid, 300, nbtot, cap, "hist")
    np.testing.assert_array_equal(np.asarray(bh[3]), np.arange(cap))
    assert int((np.asarray(bh) != 300).sum()) == cap


def test_blocked_spreading_gradient_fast():
    """Middle-tier gradient-parity guard for the default-enabled blocked
    spreading (bench.py retunes PME configs onto this path): tiny order-4
    system so the jit cost stays in seconds; the thorough order-6 grid-plane
    case runs in the slow tier (test_blocked_spreading_gradients_match_dense).
    """
    from atomsmm_tpu.ops.pme import pme_reciprocal_energy

    x, q, box = random_neutral_system(n=12, seed=4)
    grid, order, alpha = (8, 8, 8), 4, 2.0

    def e_dense(xx):
        return pme_reciprocal_energy(xx, box, q, alpha, grid, order)

    def e_blocked(xx):
        return pme_reciprocal_energy(xx, box, q, alpha, grid, order,
                                     spread_block=(4, 4, 4), spread_cap=12)

    ed, gd = jax.value_and_grad(e_dense)(x)
    eb, gb = jax.value_and_grad(e_blocked)(x)
    np.testing.assert_allclose(float(eb), float(ed), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gd),
                               rtol=1e-10, atol=1e-12)


def test_retune_pme_spread_wiring_fast():
    """Middle-tier wiring guard: retune_pme_spread attaches (block, cap) to
    the PME carrier (or leaves the system unchanged when blocking cannot
    win) and never changes the energy. End-to-end Context/overflow coverage
    runs in the slow tier (test_retune_pme_spread_end_to_end)."""
    from atomsmm_tpu.forces import retune_pme_spread
    from atomsmm_tpu.potential import potential_energy
    from atomsmm_tpu.utils import replace

    x, q, box = random_neutral_system(n=40, seed=6)
    from atomsmm_tpu.forces import PMEReciprocalForce
    from atomsmm_tpu.system import System

    f = PMEReciprocalForce(charge=q, ewald_alpha=2.0, grid_shape=(16, 16, 16),
                           spline_order=4)
    system = System(forces=(f,), masses=jnp.ones(40))
    tuned = retune_pme_spread(system, np.asarray(x), np.asarray(box))
    g = tuned.forces[0]
    if g.spread_block:  # heuristic may decline tiny grids — both legal
        assert g.spread_cap > 0
        for k, b in zip(g.grid_shape, g.spread_block):
            assert k % b == 0 and b >= g.spline_order - 1
    e0 = potential_energy(system, x, box)
    # force a known-valid blocked layout to pin the identity regardless of
    # what the heuristic chose
    forced = system.replace_forces(
        [replace(f, spread_block=(8, 8, 8), spread_cap=40)])
    e1 = potential_energy(forced, x, box)
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-12)


# --------------------------------------------------------------------------
# Amortized spreading buckets (spread_charges_stale) — round 4
# --------------------------------------------------------------------------


def _stale_imports():
    from atomsmm_tpu.ops.pme import (
        build_spread_bucket,
        spread_bucket_rebuild_trigger,
        spread_charges,
        spread_charges_stale,
        spread_stale_exceeded,
    )
    return (build_spread_bucket, spread_bucket_rebuild_trigger,
            spread_charges, spread_charges_stale, spread_stale_exceeded)


def test_stale_spreading_exact_within_pad():
    """The frozen-bucket spreading is EXACT (not approximate) while every
    atom's support base stays within `pad` grid cells of its build-time
    block — including atoms whose spline support wraps the periodic
    boundary and atoms that crossed a block boundary since the build."""
    build, _, spread, spread_stale, exceeded = _stale_imports()
    x0, q, box = random_neutral_system(n=96, seed=3)
    x0 = jnp.concatenate([x0, jnp.asarray([[1.999, 0.001, 1.998],
                                           [0.0005, 1.9995, 0.001]])])
    q = jnp.concatenate([q, jnp.asarray([0.5, -0.5])])
    grid, order, block, cap, pad = (12, 12, 12), 6, (6, 6, 6), 98, 2
    bucket, ov = build(x0, box, grid, order, block, cap)
    assert not bool(ov)
    # fresh positions: parity with the dense one-hot path
    np.testing.assert_allclose(
        np.asarray(spread_stale(x0, box, q, grid, order, block, cap, pad,
                                bucket)),
        np.asarray(spread(x0, box, q, grid, order)),
        rtol=1e-12, atol=1e-13)
    # drift every atom by up to (pad - 0.7) cells in a random direction:
    # many cross block boundaries, none leaves the padded window
    rs = np.random.RandomState(5)
    cell = 2.0 / 12
    x1 = x0 + jnp.asarray(rs.uniform(-1, 1, x0.shape)) * (pad - 0.7) * cell
    assert not bool(exceeded(x1, box, grid, order, block, pad, x0, box))
    np.testing.assert_allclose(
        np.asarray(spread_stale(x1, box, q, grid, order, block, cap, pad,
                                bucket)),
        np.asarray(spread(x1, box, q, grid, order)),
        rtol=1e-12, atol=1e-13)


def test_stale_spreading_two_block_spill():
    """Small blocks (B < order - 1 + pad) make the padded window spill into
    TWO following blocks; the generalized fold must still reproduce the
    dense grid exactly."""
    build, _, spread, spread_stale, _ = _stale_imports()
    x, q, box = random_neutral_system(n=64, seed=9)
    grid, order, block, cap, pad = (12, 12, 12), 6, (4, 4, 4), 64, 1
    bucket, ov = build(x, box, grid, order, block, cap)
    assert not bool(ov)
    np.testing.assert_allclose(
        np.asarray(spread_stale(x, box, q, grid, order, block, cap, pad,
                                bucket)),
        np.asarray(spread(x, box, q, grid, order)),
        rtol=1e-12, atol=1e-13)


def test_stale_spreading_flags_and_drops_beyond_pad():
    """An atom that drifts beyond the padded window trips the EXACT
    staleness flag and contributes ZERO to the grid (dropped, never
    mis-placed); the conservative rebuild trigger fires well before."""
    build, trigger, spread, spread_stale, exceeded = _stale_imports()
    x0, q, box = random_neutral_system(n=64, seed=1)
    grid, order, block, cap, pad = (12, 12, 12), 6, (6, 6, 6), 64, 1
    bucket, _ = build(x0, box, grid, order, block, cap)
    cell = 2.0 / 12
    x2 = x0.at[7].add(jnp.asarray([10 * cell, 0.0, 0.0]))
    assert bool(exceeded(x2, box, grid, order, block, pad, x0, box))
    assert bool(trigger(x2, box, grid, pad, x0, box))
    qs = spread_stale(x2, box, q, grid, order, block, cap, pad, bucket)
    qd = spread(x2, box, q, grid, order)
    np.testing.assert_allclose(float(qs.sum()), float(qd.sum() - q[7]),
                               rtol=1e-10, atol=1e-12)
    # tiny drift: neither the trigger nor the exact bound fires
    x3 = x0 + 0.05 * cell
    assert not bool(trigger(x3, box, grid, pad, x0, box))
    assert not bool(exceeded(x3, box, grid, order, block, pad, x0, box))
    # a box change fires the conservative rebuild trigger, but NOT the
    # exact bound by itself: binning is by fractional grid position, which
    # an affine rescale preserves — only actual base drift can drop charge
    # (ADVICE r4: the blanket box term falsely tripped the sticky flag on
    # every accepted MC-barostat move)
    assert bool(trigger(x0, box * 1.01, grid, pad, x0, box))
    assert bool(
        exceeded(x0 * 1.01, box * 1.01, grid, order, block, pad, x0, box)
    ) is False  # barostat-style affine move: fractional coords unchanged


def test_stale_exceeded_matches_kernel_drop_boundary():
    """Regression for the ADVICE r4 high finding: the exact staleness bound
    must use the KERNEL's predicate (d in [-pad, B + pad - 1] in the
    wrap(base_now - origin) frame). The old bound B + 2*pad - 1 left a
    pad-wide gap where spread_charges_stale silently dropped a drifted
    charge without flagging. Sweep an atom from the end of its block
    across the boundary and assert flag <-> drop at every point."""
    build, _, spread, spread_stale, exceeded = _stale_imports()
    grid, order, block, cap, pad = (12, 12, 12), 6, (6, 6, 6), 8, 1
    box = jnp.asarray([2.0, 2.0, 2.0])
    cell = 2.0 / 12
    # one probe atom near the END of block 0 along x (base = b - 1 = 5
    # requires t in cell 5 + (order-1)/2 = 7 -> x ~ 7.5 cells), plus a far
    # spectator so the system is neutral
    x0 = jnp.asarray([[7.45 * cell, 0.3, 0.3], [1.7, 1.7, 1.7]])
    q = jnp.asarray([1.0, -1.0])
    bucket, ov = build(x0, box, grid, order, block, cap)
    assert not bool(ov)
    for drift_cells in (0.0, 0.4, pad - 0.1, pad + 0.1, pad + 1.0,
                        pad + 2.5, 2 * pad + 1.5):
        x1 = x0.at[0, 0].add(drift_cells * cell)
        flagged = bool(exceeded(x1, box, grid, order, block, pad, x0, box))
        qs = np.asarray(spread_stale(x1, box, q, grid, order, block, cap,
                                     pad, bucket))
        qd = np.asarray(spread(x1, box, q, grid, order))
        dropped = not np.allclose(qs, qd, rtol=1e-10, atol=1e-12)
        assert flagged == dropped, (
            f"drift {drift_cells} cells: flagged={flagged} "
            f"dropped={dropped} — flag must track the kernel exactly")


def test_stale_spreading_gradient_matches_dense():
    from atomsmm_tpu.ops.pme import pme_reciprocal_energy

    build, _, _, _, _ = _stale_imports()
    x, q, box = random_neutral_system(n=48, seed=7)
    x = x.at[0].set(jnp.asarray([1.0, 0.5, 1.5]))  # grid plane + boundary
    grid, order, alpha, block, cap, pad = (12, 12, 12), 6, 2.2, (6, 6, 6), 48, 1
    bucket, _ = build(x, box, grid, order, block, cap)

    ed, gd = jax.value_and_grad(
        lambda xx: pme_reciprocal_energy(xx, box, q, alpha, grid, order))(x)
    eb, gb = jax.value_and_grad(
        lambda xx: pme_reciprocal_energy(
            xx, box, q, alpha, grid, order, spread_block=block,
            spread_cap=cap, spread_pad=pad, spread_bucket=bucket))(x)
    np.testing.assert_allclose(float(eb), float(ed), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gd),
                               rtol=1e-9, atol=1e-10)


def test_update_pme_spread_lifecycle():
    """forces.update_pme_spread: keep path preserves the reference build,
    a past-trigger drift rebuilds (new reference, fresh validity), and a
    teleport beyond the pad sets the sticky exact-staleness flag."""
    import jax as _jax

    from atomsmm_tpu.forces import (
        NonbondedForce,
        pme_spread_extras,
        pme_spread_stale_flags,
        update_pme_spread,
    )
    from atomsmm_tpu.models import water_system
    from atomsmm_tpu.utils import replace as _replace

    system, x, box = water_system(n_molecules=48, method="pme", r_cut=0.45,
                                  r_switch=0.4)
    [nb] = [f for f in system.forces if isinstance(f, NonbondedForce)]
    grid = nb.grid_shape
    order = int(nb.spline_order)
    block = tuple(next(b for b in range(max(4, order - 1), k + 1)
                       if k % b == 0) for k in grid)
    n = int(x.shape[0])
    sys2 = system.replace_forces([
        _replace(f, spread_block=block, spread_cap=n, spread_pad=1)
        if f is nb else f for f in system.forces
    ])
    extras = pme_spread_extras(sys2, x, box)
    [kb] = [k for k in extras if k.endswith("_bucket")]
    [kx] = [k for k in extras if k.endswith("_x")]
    assert not any(bool(v) for k, v in extras.items() if k.endswith("flow"))

    cell = float(np.min(np.asarray(box) / np.asarray(grid)))
    # tiny drift: keep (reference unchanged)
    out = update_pme_spread(sys2, extras, x + 0.05 * cell, box)
    assert np.allclose(np.asarray(out[kx]), np.asarray(extras[kx]))
    assert not bool(out[kb] is None)
    # past-trigger drift (> pad/2 cells): rebuild, new reference
    x_far = x + 0.7 * cell
    out = update_pme_spread(sys2, extras, x_far, box)
    assert np.allclose(np.asarray(out[kx]), np.asarray(x_far))
    [kst] = [k for k in out if k.endswith("spread_stale")]
    assert not bool(out[kst])
    # teleport one atom beyond the pad: the EXACT sticky flag trips
    x_tel = x.at[0].add(jnp.asarray([5 * cell, 0.0, 0.0]))
    flags = pme_spread_stale_flags(sys2, extras, x_tel, box)
    assert bool(flags[kst])
    del _jax


def test_amortized_context_matches_per_step_spreading():
    """End-to-end: a Context whose PME force amortizes its spreading bucket
    (spread_pad=1) steps the SAME trajectory as the dense-spreading
    baseline — the amortized path is exact, not an approximation, while
    the drift guard holds (which the run verifies via the sticky flags)."""
    from atomsmm_tpu import Context, VelocityVerletIntegrator
    from atomsmm_tpu.forces import NonbondedForce
    from atomsmm_tpu.models import water_system
    from atomsmm_tpu.state import make_state
    from atomsmm_tpu.utils import replace as _replace

    system, x, box = water_system(n_molecules=48, method="pme", r_cut=0.45,
                                  r_switch=0.4, neighbors=True)
    [nb] = [f for f in system.forces if isinstance(f, NonbondedForce)]
    grid = nb.grid_shape
    order = int(nb.spline_order)
    block = tuple(next(b for b in range(max(4, order - 1), k + 1)
                       if k % b == 0) for k in grid)
    n = int(x.shape[0])
    sys_am = system.replace_forces([
        _replace(f, spread_block=block, spread_cap=n, spread_pad=1)
        if f is nb else f for f in system.forces
    ])

    def run(sys_):
        ctx = Context(sys_, VelocityVerletIntegrator(0.0005),
                      make_state(x, box=box))
        ctx.set_velocities_to_temperature(300.0, seed=11)
        ctx.step(10)
        snap = ctx.get_state(lite=True)
        return np.asarray(snap.positions), float(snap.potential_energy)

    x_base, e_base = run(system)
    x_am, e_am = run(sys_am)
    np.testing.assert_allclose(e_am, e_base, rtol=1e-8)
    np.testing.assert_allclose(x_am, x_base, rtol=0, atol=1e-8)


@pytest.mark.slow
def test_amortized_spreading_survives_npt_volume_moves():
    """NPT + amortized spreading buckets (ADVICE r4 medium): an ACCEPTED
    MC-barostat volume move rescales positions and box affinely, which
    preserves fractional grid coordinates — the frozen bucket stays exact
    and the sticky stale flag must NOT trip. Before the r5 fix, the blanket
    box!=box_ref term in spread_stale_exceeded made every accepted move
    raise spuriously and unrecoverably."""
    from atomsmm_tpu import (
        Context,
        GlobalThermostatIntegrator,
        MonteCarloBarostat,
        make_state,
    )
    from atomsmm_tpu.forces import NonbondedForce
    from atomsmm_tpu.integrate.barostat import BARO_NACC
    from atomsmm_tpu.integrate.propagators import NoseHooverChainPropagator
    from atomsmm_tpu.models import water_system
    from atomsmm_tpu.state import make_state as _mk  # noqa: F401
    from atomsmm_tpu.utils import replace as _replace

    system, x, box = water_system(n_molecules=48, method="pme", r_cut=0.45,
                                  r_switch=0.4, neighbors=True)
    [nb] = [f for f in system.forces if isinstance(f, NonbondedForce)]
    grid = nb.grid_shape
    order = int(nb.spline_order)
    block = tuple(next(b for b in range(max(4, order - 1), k + 1)
                       if k % b == 0) for k in grid)
    n = int(x.shape[0])
    sys_am = system.replace_forces([
        _replace(f, spread_block=block, spread_cap=n, spread_pad=1)
        if f is nb else f for f in system.forces
    ]).add_force(
        # high pressure + frequency 2 so accepted moves certainly happen
        # within the short run
        MonteCarloBarostat(pressure=1000.0, temperature=300.0, frequency=2)
    )
    dof = 3 * system.num_particles - 3
    ctx = Context(sys_am, GlobalThermostatIntegrator(
        0.0005, NoseHooverChainPropagator(300.0, dof, 0.1)),
        make_state(x, box=box, seed=3))
    ctx.set_velocities_to_temperature(300.0, seed=4)
    ctx.step(30)  # raises on any sticky spread_stale/overflow flag
    assert int(ctx.state.extra[BARO_NACC]) > 0, (
        "no volume move accepted — the regression scenario was not "
        "exercised; raise the pressure or steps")
    assert np.isfinite(float(ctx.get_state(lite=True).potential_energy))


def test_choose_spread_blocks_pad_aware():
    from atomsmm_tpu.ops.pme import choose_spread_blocks

    rs = np.random.RandomState(2)
    n, grid, order = 30000, (48, 48, 48), 6
    x = rs.uniform(0, 6.4, (n, 3))
    box = np.full(3, 6.4)
    block, cap = choose_spread_blocks(grid, order, n, x=x, box=box, pad=1)
    assert block is not None
    for k, b in zip(grid, block):
        assert k % b == 0 and b >= 1
    # the pad-aware cost model prices the bigger windows
    nbtot = int(np.prod([k // b for k, b in zip(grid, block)]))
    macs = nbtot * cap * int(np.prod([b + order - 1 + 2 for b in block]))
    assert macs * 2 <= n * int(np.prod(grid))

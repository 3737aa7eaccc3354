"""Dense pair evaluator vs. a plain numpy brute-force sum (golden-path check).

The reference validates force classes against hard-coded energies from
OpenMM's Reference platform (SURVEY.md §4); with no OpenMM available, the
primitive evaluators are validated against independent numpy implementations
and analytic limits instead (provenance: SURVEY.md §7 "Goldens without
OpenMM").
"""
import jax.numpy as jnp
import numpy as np
from scipy.special import erfc  # noqa: F401  (available via jax.scipy too)

from atomsmm_tpu.ops.pairs import dense_pair_energy, pairlist_energy
from atomsmm_tpu.ops import pairfuncs
from atomsmm_tpu.system import make_exclusions_array
from atomsmm_tpu.units import ONE_4PI_EPS0


def brute_force_energy(x, box, charge, sigma, eps, excl_set, r_cut, pairfn):
    n = len(x)
    total = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) in excl_set or (j, i) in excl_set:
                continue
            dx = x[i] - x[j]
            dx -= box * np.round(dx / box)
            r = np.sqrt((dx**2).sum())
            if r < r_cut:
                s = 0.5 * (sigma[i] + sigma[j])
                e = np.sqrt(eps[i] * eps[j])
                total += pairfn(r, s, e, charge[i] * charge[j])
    return total


def make_random(n=24, seed=3):
    rs = np.random.RandomState(seed)
    box = np.array([2.0, 2.2, 2.4])
    x = rs.uniform(0, 1, (n, 3)) * box
    charge = rs.uniform(-0.5, 0.5, n)
    sigma = rs.uniform(0.25, 0.35, n)
    eps = rs.uniform(0.2, 1.0, n)
    excl = [(0, 1), (2, 3), (4, 7)]
    return x, box, charge, sigma, eps, excl


def test_dense_lj_coulomb_vs_numpy():
    x, box, charge, sigma, eps, excl = make_random()
    r_cut, r_switch = 0.9, 0.75
    alpha = 1.8

    def np_pair(r, s, e, qq):
        u_lj = 4 * e * ((s / r) ** 12 - (s / r) ** 6)
        u_c = ONE_4PI_EPS0 * qq * erfc(alpha * r) / r
        sw = np.clip((r - r_switch) / (r_cut - r_switch), 0, 1)
        S = 1 + sw**3 * (-10 + sw * (15 - 6 * sw))
        return (u_lj + u_c) * S

    expected = brute_force_energy(
        x, box, charge, sigma, eps, set(excl), r_cut, np_pair
    )

    def pair_fn(r, pi, pj):
        s, e = pairfuncs.lorentz_berthelot(
            pi["sigma"], pj["sigma"], pi["epsilon"], pj["epsilon"]
        )
        return pairfuncs.damped_smoothed_energy(
            r, s, e, pi["charge"] * pj["charge"], alpha, r_switch, r_cut
        )

    per_particle = {
        "charge": jnp.asarray(charge),
        "sigma": jnp.asarray(sigma),
        "epsilon": jnp.asarray(eps),
    }
    got = dense_pair_energy(
        pair_fn,
        jnp.asarray(x),
        jnp.asarray(box),
        per_particle,
        make_exclusions_array(len(x), excl),
        r_cut,
        chunk=7,  # deliberately unaligned chunking
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-12)


def test_chunking_invariance():
    x, box, charge, sigma, eps, excl = make_random(n=37, seed=5)

    def pair_fn(r, pi, pj):
        s, e = pairfuncs.lorentz_berthelot(
            pi["sigma"], pj["sigma"], pi["epsilon"], pj["epsilon"]
        )
        return pairfuncs.lj(r, s, e)

    per_particle = {
        "charge": jnp.asarray(charge),
        "sigma": jnp.asarray(sigma),
        "epsilon": jnp.asarray(eps),
    }
    args = (
        jnp.asarray(x),
        jnp.asarray(box),
        per_particle,
        make_exclusions_array(len(x), excl),
        0.8,
    )
    vals = [float(dense_pair_energy(pair_fn, *args, chunk=c)) for c in (1, 8, 37, 64)]
    np.testing.assert_allclose(vals, vals[0], rtol=1e-13)


def test_pairlist_energy_masks_padding():
    x = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (6, 3)))
    box = jnp.ones(3) * 5.0
    pairs = jnp.asarray([[0, 1], [2, 3], [0, 0]], jnp.int32)  # last is padding
    params = {"k": jnp.asarray([1.0, 2.0, 77.0])}
    mask = jnp.asarray([True, True, False])

    def pair(r, p):
        return p["k"] * r**2

    got = float(pairlist_energy(pair, x, box, pairs, params, mask))
    dx01 = np.asarray(x[0] - x[1])
    dx23 = np.asarray(x[2] - x[3])
    expected = 1.0 * (dx01**2).sum() + 2.0 * (dx23**2).sum()
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_near_pair_energy_vanishes_at_cutoff():
    """Shifted-force + switch: energy AND derivative -> 0 at r_cut."""
    import jax

    r_cut, r_switch = jnp.float64(0.8), jnp.float64(0.7)

    def u(r):
        return pairfuncs.near_pair_energy(
            r, 0.3, 0.6, 0.05, 2.0, r_switch, r_cut
        )

    du = jax.grad(u)
    assert abs(float(u(r_cut))) < 1e-14
    assert abs(float(du(r_cut))) < 1e-12
    # continuity from inside
    assert abs(float(u(r_cut - 1e-7))) < 1e-10


def test_dispersion_correction_uniform_gas():
    """Tail coefficient oracle: on uniform-random positions (g(r) = 1 by
    construction), E(small rc, switched) + coeff/V must equal
    E(large rc) + coeff_large/V."""
    import jax.numpy as jnp

    from atomsmm_tpu.forces import NonbondedForce, compute_dispersion_coefficient
    from atomsmm_tpu.potential import potential_energy
    from atomsmm_tpu.system import System
    from atomsmm_tpu.utils import replace as dreplace

    rs = np.random.RandomState(0)
    n, box_l = 2000, 6.0
    x = jnp.asarray(rs.uniform(0, box_l, (n, 3)))
    box = jnp.full(3, box_l)
    nb = NonbondedForce(
        charge=jnp.zeros(n), sigma=jnp.full(n, 0.34), epsilon=jnp.full(n, 0.8),
        exclusions=jnp.full((n, 1), -1, jnp.int32),
        r_cut=jnp.asarray(0.85), r_switch=jnp.asarray(0.75),
        eps_rf=jnp.asarray(1e15),
    )
    system = System(
        masses=jnp.ones(n), forces=(nb,),
        molecule=jnp.arange(n, dtype=jnp.int32), default_box=box,
        num_molecules=n,
    )
    v = box_l**3
    c_small = compute_dispersion_coefficient(nb.sigma, nb.epsilon, 0.75, 0.85)
    c_big = compute_dispersion_coefficient(nb.sigma, nb.epsilon, 2.85, 2.9)
    e_small = float(potential_energy(system, x, box))
    big = dreplace(nb, r_cut=jnp.asarray(2.9), r_switch=jnp.asarray(2.85))
    e_big = float(potential_energy(system.replace_forces([big]), x, box))
    np.testing.assert_allclose(
        e_small + c_small / v, e_big + c_big / v, atol=2.0
    )

"""Interpret-mode parity for the Pallas pair kernels (VERDICT r01 weak #3).

Both kernels (full-stencil `stage_and_run`, Newton half-stencil
`stage_and_run_half`) are run with interpret=True on CPU and compared against
the dense O(N^2) reference path for every production pair force: plain LJ,
LJ + reaction-field (cutoff water), the RESPA near force, the fused far force
(full + negated near), and softcore LJ with a captured lambda (exercising the
SMEM const-hoisting in _hoist_consts).

Tolerances: the kernel trace swaps exact erfc for the A&S approximation
(|err| <= 1.5e-7), so damped-Coulomb cases compare at ~1e-6 relative.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Pallas kernels execute in interpret mode on the CPU host (slow);
# kernel-vs-dense parity runs in the slow tier, on-TPU checks in tpu_gate
pytestmark = pytest.mark.slow

from atomsmm_tpu.models import argon_system, water_system
from atomsmm_tpu.ops.neighbors import NBR_BUCKET, neighbor_list_extras
from atomsmm_tpu.ops.pairs import dense_pair_energy
from atomsmm_tpu.ops.pallas_pair import stage_and_run, stage_and_run_half


def _dense_ef(pair_fn, x, box, pp, exclusions, r_cut):
    e, g = jax.value_and_grad(
        lambda xx: dense_pair_energy(pair_fn, xx, box, pp, exclusions, r_cut)
    )(x)
    return e, -g


def _kernel_ef(force, system, x, box, half: bool, globals=None):
    spec = system.neighbors
    bucket = neighbor_list_extras(spec, x, box)[NBR_BUCKET]
    pair_fn = force._pair_fn(globals or {})
    pp = force._per_particle(globals or {})
    r_cut = getattr(force, "r_cut", None)
    if r_cut is None:
        r_cut = force.full.r_cut
    run = stage_and_run_half if half else stage_and_run
    if not half:
        spec = dataclasses.replace(spec, half_stencil=False)
    return run(spec, pair_fn, x, box, pp, bucket, r_cut, interpret=True)


def _check(force, system, x, box, half, rtol=1e-9, atol=1e-10, globals=None):
    pair_fn = force._pair_fn(globals or {})
    pp = force._per_particle(globals or {})
    r_cut = getattr(force, "r_cut", None) or force.full.r_cut
    e_ref, f_ref = _dense_ef(pair_fn, x, box, pp, force.exclusions, r_cut)
    e_k, f_k = _kernel_ef(force, system, x, box, half, globals)
    np.testing.assert_allclose(float(e_k), float(e_ref), rtol=rtol)
    np.testing.assert_allclose(
        np.asarray(f_k), np.asarray(f_ref), rtol=rtol, atol=atol
    )


@pytest.fixture(scope="module")
def argon():
    return argon_system(n=500, jitter=0.25, seed=3, neighbors=True)


@pytest.fixture(scope="module")
def water():
    return water_system(
        n_molecules=400, r_cut=0.7, r_switch=0.6, seed=2, neighbors=True
    )


@pytest.mark.parametrize("half", [True, False], ids=["half", "full"])
def test_lj_argon(argon, half):
    system, x, box = argon
    _check(system.forces[0], system, x, box, half)


@pytest.mark.slow
@pytest.mark.parametrize("half", [True, False], ids=["half", "full"])
def test_water_cutoff_rf(water, half):
    """Full nonbonded: switched LJ + reaction-field Coulomb."""
    system, x, box = water
    from atomsmm_tpu.utils import find_nonbonded_force

    nb = system.forces[find_nonbonded_force(system)]
    _check(nb, system, x, box, half)


@pytest.mark.slow
@pytest.mark.parametrize("half", [True, False], ids=["half", "full"])
def test_near_and_fused_far(water, half):
    """RESPA near (shifted-force, switched) and the fused far pair function
    (full + negated near in one tile pass)."""
    from atomsmm_tpu import RESPASystem

    system, x, box = water
    respa = RESPASystem(system, rcut_in=0.45, rswitch_in=0.35)
    near = next(f for f in respa.forces if f.name == "NearNonbondedForce")
    far = next(f for f in respa.forces if f.name == "FarNonbondedForce")
    _check(near, system, x, box, half)
    # fused far: pair part only (recip/dispersion corrections live outside
    # the pair pass)
    _check(far, system, x, box, half)


@pytest.mark.parametrize("half", [True, False], ids=["half", "full"])
def test_pme_direct_term(half):
    """Damped-Coulomb (erfc) direct-space PME term: exercises the A&S erfc
    swap inside kernel traces."""
    system, x, box = water_system(
        n_molecules=400, r_cut=0.7, r_switch=0.6, seed=4, neighbors=True,
        method="pme",
    )
    from atomsmm_tpu.utils import find_nonbonded_force

    # erfc value error (1.5e-7) scaled by k*qq/r^2 bounds force parity at
    # ~3e-4 kJ/mol/nm absolute — well below f32 roundoff on the production
    # path; the derivative itself is exact (custom_jvp in pairfuncs).
    nb = system.forces[find_nonbonded_force(system)]
    _check(nb, system, x, box, half, rtol=3e-4, atol=1e-3)


@pytest.mark.parametrize("half", [True, False], ids=["half", "full"])
def test_softcore_lambda_capture(half):
    """Softcore LJ with a captured traced lambda: the pair function's closure
    constants must ride to the kernel through SMEM (_hoist_consts)."""
    from atomsmm_tpu import SolvationSystem

    system, x, box = water_system(
        n_molecules=400, r_cut=0.7, r_switch=0.6, seed=5, neighbors=True
    )
    solv = SolvationSystem(system, solute_atoms=list(range(3)))
    sc = next(
        f for f in solv.forces if f.name == "SoftcoreLennardJonesForce"
    )
    glb = {"lambda_vdw": jnp.asarray(0.5)}
    target = solv if solv.neighbors is not None else system
    _check(sc, target, x, box, half, globals=glb)


@pytest.mark.slow
def test_boundary_crossing_between_rebuilds():
    """Review r2: an atom crossing the periodic face between rebuilds (well
    within the skin/2 reuse window) must keep its pair interactions on the
    kernel path — staging tricks that wrap current positions break this."""
    import dataclasses

    import jax.numpy as jnp

    from atomsmm_tpu.models import argon_system
    from atomsmm_tpu.ops.neighbors import (
        build_cell_buckets,
        cell_pair_energy_forces,
    )
    from atomsmm_tpu.ops.pallas_pair import stage_and_run_half

    system, x, box = argon_system(n=1728, jitter=0.1, seed=3, neighbors=True)
    spec = system.neighbors
    assert spec.half_stencil and spec.excbits is not None
    # put one atom just inside the face, build, then move it across
    x = x.at[7, 0].set(0.0009)
    bucket, ov = build_cell_buckets(spec, x, box)
    assert not bool(ov)
    x1 = x.at[7, 0].add(-0.011)   # crosses the face; |disp| << skin/2

    force = system.forces[0]
    pair_fn = force._pair_fn({})
    pp = force._per_particle({})
    xla = dataclasses.replace(spec, backend="xla")
    e_ref, f_ref = cell_pair_energy_forces(
        pair_fn, x1, box, pp, xla, bucket, force.r_cut
    )
    e_k, f_k = stage_and_run_half(
        spec, pair_fn, x1, box, pp, bucket, force.r_cut, interpret=True
    )
    np.testing.assert_allclose(float(e_k), float(e_ref), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(f_k), np.asarray(f_ref), rtol=1e-7,
        atol=1e-7 * float(jnp.max(jnp.abs(f_ref))),
    )

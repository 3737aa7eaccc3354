"""Config 4 end-to-end: emim/BF4 ionic liquid, PME far force, SIN(R)
isokinetic multiple-timescale integrator (BASELINE.md)."""
import numpy as np
import pytest

import jax.numpy as jnp

from atomsmm_tpu import Context, RESPASystem, make_state
from atomsmm_tpu.integrate.sinr import SIN_R_Integrator, V1
from atomsmm_tpu.minimize import minimize_energy
from atomsmm_tpu.models import ionic_liquid_system
from atomsmm_tpu.potential import potential_energy, split_potential_energy
from atomsmm_tpu.units import BOLTZMANN


@pytest.fixture(scope="module")
def il():
    return ionic_liquid_system(n_pairs=24, r_cut=0.65, r_switch=0.55,
                               method="pme", seed=1)


def test_system_sane(il):
    system, x, box = il
    assert system.num_particles == 24 * 13
    # net neutral, each molecule integer charge
    nb = system.forces[0]
    q = np.asarray(nb.charge)
    np.testing.assert_allclose(q.sum(), 0.0, atol=1e-10)
    np.testing.assert_allclose(q[:8].sum(), 1.0, atol=1e-10)
    np.testing.assert_allclose(q[8:13].sum(), -1.0, atol=1e-10)
    split = split_potential_energy(system, x, box)
    for k, v in split.items():
        assert np.isfinite(float(v)), k


def test_respa_split_consistency(il):
    system, x, box = il
    respa = RESPASystem(system, rcut_in=0.45, rswitch_in=0.35)
    e_f = split_potential_energy(system, x, box)
    e_r = split_potential_energy(respa, x, box)
    np.testing.assert_allclose(
        float(e_r["NearNonbondedForce"]) + float(e_r["FarNonbondedForce"]),
        float(e_f["NonbondedForce"]),
        rtol=1e-10,
    )
    # near force inherits the PME damping alpha
    near = next(f for f in respa.forces if f.name == "NearNonbondedForce")
    assert near.alpha == pytest.approx(system.forces[0].ewald_alpha)


@pytest.mark.slow
def test_sinr_pme_dynamics(il):
    """The headline capability: SIN(R) sustains large outer steps on the
    charged system with PME far electrostatics."""
    system, x, box = il
    respa = RESPASystem(system, rcut_in=0.45, rswitch_in=0.35)
    temp = 350.0
    integ = SIN_R_Integrator(
        0.010, [10, 2, 1], temperature=temp, time_scale=0.02, friction=50.0
    )
    ctx = Context(respa, integ, make_state(x, box=box, seed=2))
    minimize_energy(ctx, steps=300)
    ctx.state = integ.initialize(respa, ctx.state)
    ctx.step(60)  # 0.6 ps at 10 fs outer steps
    assert np.isfinite(np.asarray(ctx.state.x)).all()
    # isokinetic constraint still holds per DOF
    kT = BOLTZMANN * temp
    q1 = kT * integ.tau**2
    m = np.asarray(system.masses)[:, None]
    c = m * np.asarray(ctx.state.v) ** 2 + 0.5 * q1 * np.asarray(
        ctx.state.extra[V1]
    ) ** 2
    assert np.abs(c / kT - 1).max() < 5e-3

"""Replica-parallel λ sampling + Hamiltonian replica exchange
(SURVEY.md §2c DP row: cross-replica reductions over the mesh).

Oracles:
  * identical Hamiltonians -> Δ = 0 -> every eligible pair must accept;
    the permutation really exchanges the configurations pairwise;
  * detailed balance at the criterion level: acceptance uses
    log u < -βΔ with Δ computed symmetrically (checked by swapping roles);
  * λ stays pinned to its replica row (MBAR bookkeeping unchanged);
  * end-to-end: ΔG(MBAR) from the 8-device replica-parallel sampler
    statistically matches the sequential path on the same system.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atomsmm_tpu import SolvationSystem
from atomsmm_tpu.models.phenol import phenol_in_water
from atomsmm_tpu.parallel.hrex import (
    HREXSampler,
    hrex_sample_lambda_states,
    make_hrex_swap,
)
from atomsmm_tpu.parallel.replicas import replicate_state
from atomsmm_tpu.state import make_state


@pytest.fixture(scope="module")
def solvated():
    system, x, box, solute = phenol_in_water(n_water=60, r_cut=0.5,
                                             r_switch=0.42, seed=5)
    return SolvationSystem(system, solute_atoms=solute), x, box


def _stacked_states(x, box, k, seed=0, jitter=0.0):
    state = make_state(x, box=box, seed=seed)
    states = replicate_state(state, k, seed)
    if jitter:
        rs = np.random.RandomState(seed + 1)
        xs = np.asarray(states.x) + rs.normal(0, jitter, states.x.shape)
        from atomsmm_tpu.utils import replace

        states = replace(states, x=jnp.asarray(xs, states.x.dtype))
    return states


def test_identical_states_always_swap(solvated):
    """Δ = 0 when all replicas share one Hamiltonian and configuration:
    every eligible pair accepts, and the pairwise exchange is exact."""
    solv, x, box = solvated
    k = 6
    states = _stacked_states(x, box, k, jitter=0.005)
    lams = {"lambda_vdw": jnp.ones(k), "lambda_coul": jnp.ones(k)}
    swap = make_hrex_swap(solv, 300.0)
    x_before = np.asarray(states.x)
    out, acc, att = jax.jit(swap)(states, lams, jax.random.PRNGKey(0), 0)
    assert int(att) == 3  # pairs (0,1), (2,3), (4,5)
    assert int(acc) == 3
    x_after = np.asarray(out.x)
    for a, b in [(0, 1), (2, 3), (4, 5)]:
        np.testing.assert_array_equal(x_after[a], x_before[b])
        np.testing.assert_array_equal(x_after[b], x_before[a])
    # odd parity: pairs (1,2), (3,4) — row 0 and row 5 stay put
    out2, acc2, att2 = jax.jit(swap)(states, lams, jax.random.PRNGKey(1), 1)
    assert int(att2) == 2 and int(acc2) == 2
    np.testing.assert_array_equal(np.asarray(out2.x)[0], x_before[0])
    np.testing.assert_array_equal(np.asarray(out2.x)[5], x_before[5])


def test_hopeless_swaps_rejected(solvated):
    """A pair whose energy difference is enormous must never swap: give one
    replica an overlapping (near-singular) configuration under the coupled
    Hamiltonian and a decoupled neighbor — βΔ is astronomically positive in
    one direction of the ladder."""
    solv, x, box = solvated
    k = 2
    states = _stacked_states(x, box, k)
    # replica 0 decoupled, replica 1 coupled; replica 0's configuration has
    # the solute overlapping a water (fine at λ=0, catastrophic at λ=1)
    xs = np.array(states.x)  # writable copy
    xs[0, 0:3] = xs[0, 15:18] + 0.01  # solute atoms onto a solvent molecule
    from atomsmm_tpu.utils import replace

    states = replace(states, x=jnp.asarray(xs, states.x.dtype))
    lams = {"lambda_vdw": jnp.asarray([0.0, 1.0]),
            "lambda_coul": jnp.asarray([0.0, 1.0])}
    swap = make_hrex_swap(solv, 300.0)
    accepts = 0
    for s in range(5):
        _, acc, att = jax.jit(swap)(states, lams, jax.random.PRNGKey(s), 0)
        assert int(att) == 1
        accepts += int(acc)
    assert accepts == 0


@pytest.mark.slow
def test_acceptance_monotone_in_ladder_spacing(solvated):
    """Coarser λ ladders must accept less: run short HREX chains with K=4
    adjacent vs distant spacing and compare measured acceptance."""
    solv, x, box = solvated
    lams_tight = {"lambda_vdw": jnp.asarray([1.0, 0.97, 0.94, 0.91]),
                  "lambda_coul": jnp.asarray([1.0, 0.97, 0.94, 0.91])}
    lams_wide = {"lambda_vdw": jnp.asarray([1.0, 0.6, 0.25, 0.0]),
                 "lambda_coul": jnp.asarray([1.0, 0.6, 0.25, 0.0])}

    def rate(lams, seed):
        sampler = HREXSampler(solv, x, box, lams, 300.0, dt=0.001, seed=seed)
        sampler.run(150)  # brief thermalization
        for _ in range(12):
            sampler.run(25)
            sampler.attempt_swaps()
        return sampler.acceptance_rate

    r_tight = rate(lams_tight, 1)
    r_wide = rate(lams_wide, 2)
    assert 0.0 <= r_wide <= 1.0 and 0.0 <= r_tight <= 1.0
    assert r_tight > r_wide, (r_tight, r_wide)
    assert r_tight > 0.5  # near-identical neighbors swap readily


def test_parallel_sampling_without_exchange(solvated):
    """swap_every=0: the replica-parallel sampler is usable as a pure
    K-fold parallel λ sampler — correct (xs, n_k) contract, no swap
    statistics."""
    solv, x, box = solvated
    lams = {"lambda_vdw": jnp.asarray([1.0, 0.5]),
            "lambda_coul": jnp.asarray([1.0, 0.5])}
    xs, n_k, info = hrex_sample_lambda_states(
        solv, x, box, lams, 300.0, dt=0.001, n_equil=20, n_samples=3,
        sample_interval=5, swap_every=0, seed=2)
    assert xs.shape == (6, x.shape[0], 3)
    np.testing.assert_array_equal(np.asarray(n_k), [3, 3])
    assert info["swap_attempts"] == 0
    assert np.isfinite(np.asarray(xs)).all()


def test_tremd_zero_delta_swaps_and_velocity_rescale(solvated):
    """Temperature exchange: identical configurations make Δ = 0 at ANY
    temperature pair (the β terms cancel pairwise), so the swap always
    accepts — and the exchanged velocities must be rescaled by
    sqrt(T_new/T_old)."""
    solv, x, box = solvated
    states = _stacked_states(x, box, 2)
    rs = np.random.RandomState(1)
    from atomsmm_tpu.utils import replace

    v = jnp.asarray(rs.normal(0, 1.0, states.v.shape))
    states = replace(states, v=v)
    temps = jnp.asarray([300.0, 450.0])
    lams = {"lambda_vdw": jnp.ones(2), "lambda_coul": jnp.ones(2)}
    swap = make_hrex_swap(solv, temps)
    out, acc, att = jax.jit(swap)(states, lams, jax.random.PRNGKey(0), 0)
    assert int(att) == 1 and int(acc) == 1
    np.testing.assert_allclose(
        np.asarray(out.v)[0], np.asarray(v)[1] * np.sqrt(300.0 / 450.0),
        rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out.v)[1], np.asarray(v)[0] * np.sqrt(450.0 / 300.0),
        rtol=1e-12)


@pytest.mark.slow
def test_combined_hamiltonian_temperature_ladder(solvated):
    """λ and temperature ladders compose: per-row Hamiltonians AND bath
    setpoints, per-row β in the criterion, velocity rescaling on
    exchange — the machinery runs end-to-end and keeps sane statistics."""
    solv, x, box = solvated
    lams = {"lambda_vdw": jnp.asarray([1.0, 0.95, 0.9, 0.85]),
            "lambda_coul": jnp.asarray([1.0, 0.95, 0.9, 0.85])}
    temps = jnp.asarray([300.0, 320.0, 341.0, 364.0])
    sampler = HREXSampler(solv, x, box, lams, 300.0, dt=0.001,
                          friction=10.0, seed=5, temperatures=temps)
    sampler.run(100)
    for _ in range(6):
        sampler.run(20)
        sampler.attempt_swaps()
    # alternating parities at K=4: even swaps try 2 pairs, odd try 1
    assert sampler.swap_attempts == 2 + 1 + 2 + 1 + 2 + 1
    assert 0.0 <= sampler.acceptance_rate <= 1.0
    assert np.isfinite(np.asarray(sampler.states.x)).all()


@pytest.mark.slow
def test_tremd_rows_hold_their_setpoints():
    """Pure T-REMD on argon (one Hamiltonian, a 4-rung temperature
    ladder): each replica ROW must hold its own bath setpoint even while
    configurations migrate through accepted swaps, and neighboring rungs
    at ~15% spacing must actually exchange."""
    from atomsmm_tpu.models import argon_system
    from atomsmm_tpu.state import kinetic_energy

    system, x, box = argon_system(n=216, jitter=0.1, seed=4, neighbors=True)
    temps = jnp.asarray([100.0, 115.0, 132.0, 152.0])
    sampler = HREXSampler(system, x, box, {}, 100.0, dt=0.002, friction=10.0,
                          seed=7, temperatures=temps)
    sampler.run(400)  # thermalize each rung at its own T
    t_rows = np.zeros(4)
    n_samp = 30
    for _ in range(n_samp):
        sampler.run(20)
        sampler.attempt_swaps()
        for k in range(4):
            ke = float(kinetic_energy(system.masses, sampler.states.v[k]))
            t_rows[k] += 2.0 * ke / (3 * 216 * 0.00831446261815324)
    t_rows /= n_samp
    assert sampler.swap_accepts > 0, "no exchanges at 15% rung spacing"
    assert sampler.acceptance_rate < 1.0
    for k in range(4):
        assert abs(t_rows[k] - float(temps[k])) < 0.12 * float(temps[k]), (
            k, t_rows)
    # the ladder ordering survives the swaps (row k is the k-th rung)
    assert np.all(np.diff(t_rows) > 0), t_rows


@pytest.mark.slow
def test_parallel_dg_matches_sequential(solvated):
    """ΔG(MBAR) from the replica-parallel HREX sampler on the virtual
    8-device mesh must statistically match the sequential single-Context
    path (VERDICT r3 next-step #3)."""
    from jax.sharding import Mesh

    from atomsmm_tpu.alchemy import solvation_free_energy

    solv, x, box = solvated
    schedule = jnp.linspace(0.0, 1.0, 8)
    seq = solvation_free_energy(
        solv, x, box, schedule, temperature=300.0,
        dt=0.001, n_equil=150, n_samples=24, sample_interval=20, seed=4,
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    par = solvation_free_energy(
        solv, x, box, schedule, temperature=300.0, mesh=mesh,
        dt=0.001, n_equil=150, n_samples=24, sample_interval=20, seed=9,
    )
    dg_s, dg_p = seq["dg_mbar"], par["dg_mbar"]
    assert np.isfinite(dg_p)
    assert 0.0 <= par["swap_acceptance"] <= 1.0
    joint = np.hypot(seq["err_mbar"], par["err_mbar"])
    # two independent estimates of the same coupling free energy
    assert abs(dg_s - dg_p) < 4.0 * joint + 0.2 * abs(dg_s), (
        f"sequential {dg_s:.2f}+-{seq['err_mbar']:.2f} vs "
        f"parallel {dg_p:.2f}+-{par['err_mbar']:.2f} "
        f"(acc {par['swap_acceptance']:.2f})"
    )


def test_replicas_start_with_independent_velocities(solvated):
    """Review finding (round 4): a tiled single Maxwell-Boltzmann draw
    started the ladder perfectly correlated."""
    solv, x, box = solvated
    lams = {"lambda_vdw": jnp.asarray([0.0, 0.5, 1.0])}
    sampler = HREXSampler(solv, x, box, lams, 300.0, dt=0.001, seed=3)
    v = np.asarray(sampler.states.v)
    assert np.abs(v[0] - v[1]).max() > 1e-3
    assert np.abs(v[1] - v[2]).max() > 1e-3


def test_attempt_swaps_refuses_mid_anneal_globals(solvated):
    """Review finding (round 4): exchanging while replicas were last
    propagated under non-ladder globals evaluates the Metropolis criterion
    at the wrong Hamiltonians — must raise, not silently bias."""
    solv, x, box = solvated
    lams = {"lambda_vdw": jnp.asarray([0.0, 0.5, 1.0])}
    sampler = HREXSampler(solv, x, box, lams, 300.0, dt=0.001, seed=4)
    sampler.run(5, {"lambda_vdw": jnp.asarray([0.9, 0.95, 1.0])})
    with pytest.raises(RuntimeError, match="ladder"):
        sampler.attempt_swaps()
    # back at the ladder -> swaps fine again
    sampler.run(5)
    sampler.attempt_swaps()
    # a full anneal ends exactly at the target ladder -> swaps allowed
    sampler.anneal(8, chunks=4)
    sampler.attempt_swaps()


# ---- grouped neighbor updates (Context.neighbor_update_every analog) ----


@pytest.fixture(scope="module")
def solvated_nbr():
    system, x, box, solute = phenol_in_water(n_water=60, r_cut=0.5,
                                             r_switch=0.42, seed=5,
                                             neighbors=True)
    return SolvationSystem(system, solute_atoms=solute), x, box


def _ladder(k):
    from atomsmm_tpu.alchemy import coupling_path

    return coupling_path(jnp.linspace(0.0, 1.0, k))


def test_grouped_updates_match_every_step(solvated_nbr):
    """neighbor_update_every=4 must produce the same trajectory as =1 over a
    window where the lists stay valid (same pair coverage -> same forces to
    summation-order roundoff)."""
    solv, x, box = solvated_nbr
    runs = {}
    for k_upd in (1, 4):
        s = HREXSampler(solv, x, box, _ladder(4), 300.0, dt=0.0005, seed=7,
                        neighbor_update_every=k_upd)
        s.run(12)
        runs[k_upd] = np.asarray(s.states.x)
    np.testing.assert_allclose(runs[1], runs[4], atol=1e-8)


def test_grouped_updates_staleness_guard_trips(solvated_nbr):
    """Shrinking the spec's skin to ~0 must trip the sticky staleness flag
    inside a grouped run and surface as a loud error (the same guard
    contract as Context.step)."""
    import dataclasses

    solv, x, box = solvated_nbr
    tiny = dataclasses.replace(solv.neighbors,
                               skin=jnp.asarray(1e-5, jnp.float64))
    solv_tiny = dataclasses.replace(solv, neighbors=tiny)
    s = HREXSampler(solv_tiny, x, box, _ladder(4), 300.0, dt=0.001, seed=7,
                    neighbor_update_every=6)
    with pytest.raises(RuntimeError, match="staleness"):
        s.run(30)

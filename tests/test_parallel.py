"""Parallel paths (SURVEY.md §2c): DP replicas over a device mesh (virtual
8-CPU mesh from conftest) and vmapped lambda ensembles. Plus the
jit-vs-nojit consistency check (SURVEY.md §5, the race-detector analog).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atomsmm_tpu import (
    Context,
    VelocityVerletIntegrator,
    make_state,
)
from atomsmm_tpu.context import refresh_force_caches
from atomsmm_tpu.models import argon_system
from atomsmm_tpu.parallel import make_replicated_step, replicate_state


def _flagship(n=64):
    system, x, box = argon_system(n=n, jitter=0.05, seed=1, r_cut=0.5,
                                  r_switch=0.4)
    integ = VelocityVerletIntegrator(0.002)
    state = make_state(x, box=box, seed=0)
    state = integ.initialize(system, state)
    state = refresh_force_caches(system, state, {})
    return integ.make_step(), system, state


def test_replicated_step_matches_single():
    """Each sharded replica must evolve exactly like a single-box run with
    the same RNG key (deterministic NVE: identical trajectories)."""
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    step, system, state = _flagship()
    states = replicate_state(state, n_dev)
    sharding = NamedSharding(mesh, P("dp"))
    states = jax.tree.map(lambda a: jax.device_put(a, sharding), states)
    run = jax.jit(make_replicated_step(step, mesh))
    for _ in range(5):
        states = run(system, states, {})

    single = state
    for _ in range(5):
        single = step(system, single, {})

    # NVE step is RNG-independent: every replica equals the single run
    for k in range(n_dev):
        np.testing.assert_allclose(
            np.asarray(states.x[k]), np.asarray(single.x), rtol=1e-12
        )


def test_replicas_diverge_with_stochastic_dynamics():
    """Replicas carry distinct RNG keys: stochastic thermostats decorrelate
    them (the point of multi-box throughput sampling)."""
    from atomsmm_tpu import GlobalThermostatIntegrator
    from atomsmm_tpu.integrate.propagators import OrnsteinUhlenbeckPropagator

    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    system, x, box = argon_system(n=64, jitter=0.05, seed=1, r_cut=0.5,
                                  r_switch=0.4)
    integ = GlobalThermostatIntegrator(
        0.002, OrnsteinUhlenbeckPropagator(120.0, 5.0)
    )
    state = make_state(x, box=box, seed=0)
    state = integ.initialize(system, state)
    state = refresh_force_caches(system, state, {})
    states = replicate_state(state, n_dev)
    sharding = NamedSharding(mesh, P("dp"))
    states = jax.tree.map(lambda a: jax.device_put(a, sharding), states)
    run = jax.jit(make_replicated_step(integ.make_step(), mesh))
    for _ in range(20):
        states = run(system, states, {})
    v = np.asarray(states.v)
    assert not np.allclose(v[0], v[1])
    assert not np.allclose(v[1], v[2])


def test_jit_vs_nojit_consistency():
    """The step function must produce identical results jitted and unjitted
    (SURVEY.md §5: jit-vs-nojit as the sanitizer analog)."""
    step, system, state = _flagship()
    jstep = jax.jit(step)
    s1 = step(system, state, {})
    s2 = jstep(system, state, {})
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), atol=1e-14)
    np.testing.assert_allclose(np.asarray(s1.v), np.asarray(s2.v), atol=1e-13)


def test_f32_vs_f64_consistency():
    """One step in f32 must track the f64 trajectory at f32 precision."""
    import jax.numpy as jnp

    step64, system64, state64 = _flagship()
    s64 = step64(system64, state64, {})

    to32 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.float64
        else a,
        t,
    )
    system32, state32 = to32(system64), to32(state64)
    s32 = step64(system32, state32, {})
    np.testing.assert_allclose(
        np.asarray(s32.x), np.asarray(s64.x), atol=5e-6
    )

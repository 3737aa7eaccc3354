"""Direct tests for the generic propagator building blocks.

Closes the two PARITY.md rows that previously had no dedicated tests:
`atomsmm/propagators.py::GenericBoostPropagator` /
`::GenericScalingPropagator` (closed-form single-step semantics on both the
velocity target and a named State.extra variable) and
`::TrotterSuzukiPropagator` (the B(t/2) A(t) B(t/2) composition, checked
bitwise against the manual sequence and against VelocityVerletPropagator,
which is its Boost/Translation instantiation).
"""
import numpy as np
import pytest

from atomsmm_tpu import Context, make_state
from atomsmm_tpu.integrate.propagators import (
    BoostPropagator,
    GenericBoostPropagator,
    GenericScalingPropagator,
    StepContext,
    TranslationPropagator,
    TrotterSuzukiPropagator,
    VelocityVerletPropagator,
)
from atomsmm_tpu.models import argon_system

pytestmark = pytest.mark.smoke

DT = 0.002


@pytest.fixture(scope="module")
def argon():
    system, x, box = argon_system(n=216, jitter=0.05, seed=1)
    return system, x, box


def _state(x, box, seed=3, **extra):
    rng = np.random.default_rng(seed)
    v = 0.1 * rng.standard_normal(np.shape(x))
    return make_state(x, v=v.astype(np.asarray(x).dtype), box=box,
                      extra=extra or None)


def test_generic_boost_velocity_closed_form(argon):
    system, x, box = argon
    state = _state(x, box)
    g = 0.75  # constant rate [nm/ps^2]
    prop = GenericBoostPropagator(lambda ctx, s: g)
    ctx = StepContext(system, {}, DT)
    out = prop.apply(ctx, state, 0.5)
    np.testing.assert_allclose(
        np.asarray(out.v), np.asarray(state.v) + g * 0.5 * DT, rtol=0, atol=0)
    # positions untouched
    assert out.x is state.x


def test_generic_boost_extra_target(argon):
    system, x, box = argon
    state = _state(x, box, zeta=np.float32(0.25))
    prop = GenericBoostPropagator(lambda ctx, s: 2.0, target="zeta")
    ctx = StepContext(system, {}, DT)
    out = prop.apply(ctx, state, 1.0)
    assert float(out.extra["zeta"]) == pytest.approx(0.25 + 2.0 * DT,
                                                     rel=1e-6)
    assert out.v is state.v


def test_generic_scaling_closed_form(argon):
    system, x, box = argon
    state = _state(x, box)
    rate = 3.0  # friction [1/ps]
    prop = GenericScalingPropagator(lambda ctx, s: rate)
    ctx = StepContext(system, {}, DT)
    out = prop.apply(ctx, state, 1.0)
    np.testing.assert_allclose(
        np.asarray(out.v),
        np.asarray(state.v) * np.exp(-rate * DT, dtype=np.float32),
        rtol=1e-7)


def test_generic_scaling_extra_target(argon):
    system, x, box = argon
    state = _state(x, box, eta=np.float32(1.5))
    prop = GenericScalingPropagator(lambda ctx, s: 4.0, target="eta")
    ctx = StepContext(system, {}, DT)
    out = prop.apply(ctx, state, 0.5)
    assert float(out.extra["eta"]) == pytest.approx(
        1.5 * np.exp(-4.0 * 0.5 * DT), rel=1e-6)


def test_trotter_suzuki_matches_manual_sequence(argon):
    """exp(t/2 B) exp(t A) exp(t/2 B) — bitwise vs the hand-applied split."""
    system, x, box = argon
    inner = GenericScalingPropagator(lambda ctx, s: 2.0)      # A
    outer = GenericBoostPropagator(lambda ctx, s: 0.5)        # B
    ts = TrotterSuzukiPropagator(inner, outer)
    ctx = StepContext(system, {}, DT)

    state = _state(x, box)
    composed = ts.apply(ctx, state, 1.0)

    manual = outer.apply(ctx, state, 0.5)
    manual = inner.apply(ctx, manual, 1.0)
    manual = outer.apply(ctx, manual, 0.5)
    np.testing.assert_array_equal(np.asarray(composed.v),
                                  np.asarray(manual.v))


def test_trotter_suzuki_is_velocity_verlet(argon):
    """TS(Translation, Boost) over a real potential reproduces the packaged
    VelocityVerletPropagator trajectory step for step."""
    system, x, box = argon
    ts = TrotterSuzukiPropagator(TranslationPropagator(),
                                 BoostPropagator(cache=None))
    ctx_a = Context(system, ts.integrator(DT), _state(x, box, seed=7))
    ctx_b = Context(system, VelocityVerletPropagator(cached=False)
                    .integrator(DT), _state(x, box, seed=7))
    ctx_a.step(25)
    ctx_b.step(25)
    np.testing.assert_allclose(np.asarray(ctx_a.state.x),
                               np.asarray(ctx_b.state.x), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ctx_a.state.v),
                               np.asarray(ctx_b.state.v), rtol=0, atol=1e-12)


def test_generic_blocks_compose_into_running_integrator(argon):
    """A Langevin-like O-piece built purely from the generic blocks runs
    through the public integrator factory and damps the temperature."""
    from atomsmm_tpu.integrate.propagators import ChainedPropagator

    system, x, box = argon
    damp = GenericScalingPropagator(lambda ctx, s: 20.0)
    vv = VelocityVerletPropagator(cached=False)
    integ = ChainedPropagator([damp, vv]).integrator(DT)
    ctx = Context(system, integ, _state(x, box, seed=11))
    ctx.set_velocities_to_temperature(120.0, seed=5)
    t0 = float(ctx.temperature())
    ctx.step(50)
    t1 = float(ctx.temperature())
    assert t1 < 0.5 * t0  # un-thermostatted damping drains KE

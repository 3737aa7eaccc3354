"""Energy minimization — counterpart of openmm.LocalEnergyMinimizer.

FIRE (Fast Inertial Relaxation Engine, Bitzek et al. PRL 2006): robust,
jittable (fixed iteration count, lax.scan), no line searches. Used to relax
the programmatic lattice initial conditions the model builders produce
(the reference reads pre-equilibrated AMBER files instead — SURVEY.md §4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .potential import force_fn
from .utils import replace


def fire_minimize(
    system,
    x,
    box,
    globals=None,
    steps: int = 200,
    dt_start: float = 1e-4,
    dt_max: float = 2e-3,
    f_inc: float = 1.1,
    f_dec: float = 0.5,
    alpha_start: float = 0.1,
    f_alpha: float = 0.99,
    n_min: int = 5,
    max_step: float = 0.02,
):
    """Return minimized positions. All device-side (one jitted scan).

    max_step [nm] caps per-atom displacement per iteration — without it the
    astronomic forces of overlapping lattice starts make the first kick
    diverge (trust-region-style clamp)."""
    f = force_fn(system)
    m = system.masses
    # virtual sites are massless and forceless: kick 0, not nan
    inv_m = jnp.where(m > 0, 1.0 / jnp.where(m > 0, m, 1.0), 0.0)[:, None]

    def body(carry, _):
        x, v, dt, alpha, n_pos = carry
        _, F = f(x, box, globals or {})
        v = v + dt * F * inv_m
        power = jnp.sum(F * v)
        fnorm = jnp.sqrt(jnp.sum(F * F)) + 1e-30
        vnorm = jnp.sqrt(jnp.sum(v * v))
        v_mixed = (1.0 - alpha) * v + alpha * vnorm * F / fnorm
        uphill = power <= 0.0
        v = jnp.where(uphill, jnp.zeros_like(v), v_mixed)
        grow = (~uphill) & (n_pos >= n_min)
        dt = jnp.where(uphill, dt * f_dec, jnp.where(grow, jnp.minimum(dt * f_inc, dt_max), dt))
        alpha = jnp.where(uphill, alpha_start, jnp.where(grow, alpha * f_alpha, alpha))
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        dx = dt * v
        step_norm = jnp.sqrt(jnp.sum(dx * dx, axis=1, keepdims=True))
        scale = jnp.minimum(1.0, max_step / jnp.maximum(step_norm, 1e-30))
        x = x + dx * scale
        return (x, v, dt, alpha, n_pos), None

    init = (
        x,
        jnp.zeros_like(x),
        jnp.asarray(dt_start, x.dtype),
        jnp.asarray(alpha_start, x.dtype),
        jnp.zeros((), jnp.int32),
    )
    (x, *_), _ = jax.lax.scan(body, init, None, length=steps)
    return x


def minimize_energy(context, steps: int = 200, **kwargs):
    """In-place minimization of a Context's positions (openmm
    LocalEnergyMinimizer.minimize analog)."""
    x = fire_minimize(
        context.system,
        context.state.x,
        context.state.box,
        context.parameters,
        steps=steps,
        **kwargs,
    )
    context.state = replace(context.state, x=x)
    return context

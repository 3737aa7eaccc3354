"""Profiling / tracing utilities (SURVEY.md §5).

The reference has essentially no profiling story (its only hooks are the
CustomIntegrator dump and reporter); the BASELINE metric however is literally
"pair-force kernel ms/step", so the harness ships one: in-loop timers that
measure each force group's evaluation and the whole step on the real device
(dispatch-overhead-free: the measured function is iterated inside one jitted
fori_loop with a forced data dependency), plus a jax.profiler trace helper.
"""
from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from .ops.neighbors import make_aux
from .potential import force_fn


def _inloop_time(fn, x, reps: int = 30, tries: int = 3) -> float:
    """Best-of wall time per call of fn(x)->(N,3), measured inside one jitted
    loop with a serializing dependency. Returns milliseconds."""

    @jax.jit
    def loop(x):
        def body(i, acc):
            return acc + fn(x + 1e-30 * acc)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))

    out = loop(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        out = loop(x)
        float(out[0, 0])  # host fetch = reliable barrier (axon)
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def profile_forces(context, reps: int = 30) -> Dict[str, float]:
    """ms per evaluation for every force group of a Context's system (the
    'pair-force kernel ms/step' metric), plus the measurement floor."""
    system = context.system
    state = context.state
    aux = make_aux(system, state.extra)
    out = {"overhead": _inloop_time(lambda xx: xx * 1.0, state.x, reps)}
    for g in system.force_groups:
        out[f"group {g}"] = _inloop_time(
            lambda xx, g=g: force_fn(system, {g})(
                xx, state.box, context.parameters, aux
            )[1],
            state.x,
            reps,
        )
    return out


def profile_step(context, steps: int = 100, tries: int = 3) -> float:
    """ms per integrator step, end to end (includes neighbor rebuilds,
    thermostats, barostat attempts)."""
    context.step(1)
    float(context.state.x[0, 0])
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        context.step(steps)
        float(context.state.x[0, 0])
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1e3


def trace(path: str):
    """Context manager writing a jax.profiler trace (view with XProf or
    TensorBoard): `with trace('/tmp/tb'): ctx.step(100)`."""
    return jax.profiler.trace(path)

"""Potential-energy assembly and decomposition.

The per-force-group energy/force evaluation that OpenMM exposes through
`context.getState(groups={...})` and that atomsmm's test suite reaches through
`atomsmm/utils.py::splitPotentialEnergy` (SURVEY.md §3.5). Here every
decomposition comes out of the same traced functions — no auxiliary context.

`aux` carries evaluation-time structures that are state, not parameters —
today the neighbor list (ops/neighbors.py). Forces exposing an explicit
`energy_and_forces` (gather-only, no autodiff scatter) are used directly;
everything else is differentiated with jax.value_and_grad.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp


def _resolve_x(system, x):
    """Positions as the forces see them: virtual-site rows replaced by
    their construction from parents (ops/virtual_sites.py)."""
    vs = getattr(system, "virtual_sites", None)
    if vs is None:
        return x
    from .ops.virtual_sites import place_virtual_sites

    return place_virtual_sites(vs, x)


def potential_energy(system, x, box, globals=None, groups: Optional[Iterable[int]] = None, aux=None):
    """Total potential energy, optionally restricted to a set of force groups."""
    globals = globals or {}
    x = _resolve_x(system, x)
    total = jnp.zeros((), x.dtype)
    for f in system.forces:
        if groups is None or f.group in groups:
            total = total + f.energy(x, box, globals, aux)
    return total


def force_fn(system, groups: Optional[Iterable[int]] = None):
    """Return f(x, box, globals, aux) -> (energy, forces) for the given groups.

    Per force: the explicit energy_and_forces when available (the production
    neighbor path), otherwise -grad of its energy (SURVEY.md §2b N4: per-group
    force requests f0/f1/f2). With virtual sites, forces are evaluated at the
    placed coordinates and pulled back through the placement's vjp — the
    chain-rule redistribution onto parent atoms, exact for every site type;
    virtual rows come out exactly zero.
    """
    groups = None if groups is None else frozenset(groups)
    selected = [
        f for f in system.forces if groups is None or f.group in groups
    ]
    has_vs = getattr(system, "virtual_sites", None) is not None

    def f(x, box, globals=None, aux=None):
        globals = globals or {}
        if has_vs:
            x_eval, pullback = jax.vjp(lambda xx: _resolve_x(system, xx), x)
        else:
            x_eval = x
        e_total = jnp.zeros((), x.dtype)
        f_total = jnp.zeros_like(x)
        for force in selected:
            if hasattr(force, "energy_and_forces"):
                e, fr = force.energy_and_forces(x_eval, box, globals, aux)
            else:
                e, g = jax.value_and_grad(
                    lambda xx, fo=force: fo.energy(xx, box, globals, aux)
                )(x_eval)
                fr = -g
            e_total = e_total + e
            f_total = f_total + fr
        if has_vs:
            (f_total,) = pullback(f_total)
        return e_total, f_total

    return f


def split_potential_energy(system, x, box, globals=None, aux=None) -> "OrderedDict[str, jnp.ndarray]":
    """Energy per force object, keyed by class name (with #k suffix on
    duplicates), plus 'Total' — mirrors atomsmm/utils.py::splitPotentialEnergy.
    """
    globals = globals or {}
    x = _resolve_x(system, x)
    out = OrderedDict()
    counts: Dict[str, int] = {}
    total = jnp.zeros((), x.dtype)
    for f in system.forces:
        name = f.name
        counts[name] = counts.get(name, 0) + 1
        if counts[name] > 1:
            name = f"{name}#{counts[name]}"
        e = f.energy(x, box, globals, aux)
        out[name] = e
        total = total + e
    out["Total"] = total
    return out


def group_energies(system, x, box, globals=None, aux=None) -> Dict[int, jnp.ndarray]:
    """Energy per force group (the RESPA decomposition)."""
    globals = globals or {}
    x = _resolve_x(system, x)
    out: Dict[int, jnp.ndarray] = {}
    for f in system.forces:
        e = f.energy(x, box, globals, aux)
        out[f.group] = out.get(f.group, jnp.zeros((), x.dtype)) + e
    return out

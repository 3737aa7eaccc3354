"""Switching / smoothing and shifted-force transformations.

These are the building blocks of the reference's nonbonded energy expressions
(atomsmm/forces.py::DampedSmoothedForce, ::NearNonbondedForce — SURVEY.md §2a):
a quintic switching polynomial applied over [rswitch, rcut], and the
shifted-force form U(r) - U(rc) - U'(rc) (r - rc) that makes both energy and
force vanish continuously at the cutoff (Fennell & Gezelter DSF).

In the reference these are Lepton strings JIT-compiled by OpenMM; here they are
plain jittable functions fused by XLA into the pair kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def switch_quintic(r, r_switch, r_cut):
    """OpenMM-style quintic switching function S(r).

    S = 1 for r <= r_switch; S = 0 for r >= r_cut; in between
    S(u) = 1 - 10 u^3 + 15 u^4 - 6 u^5 with u = (r - rs)/(rc - rs).
    C2-continuous at both ends.

    >>> import jax.numpy as jnp
    >>> float(switch_quintic(jnp.float64(0.5), 0.7, 0.9))
    1.0
    >>> float(switch_quintic(jnp.float64(0.9), 0.7, 0.9))
    0.0
    >>> round(float(switch_quintic(jnp.float64(0.8), 0.7, 0.9)), 6)
    0.5
    """
    # reciprocal of the (scalar) switch width so the per-element op is a mul
    u = (r - r_switch) * (1.0 / (r_cut - r_switch))
    u = jnp.clip(u, 0.0, 1.0)
    return 1.0 + u * u * u * (-10.0 + u * (15.0 - 6.0 * u))


def shifted_force(u_fn):
    """Transform u(r) -> u(r) - u(rc) - u'(rc) (r - rc).

    Returns a function sf(r, rc, *args) given u_fn(r, *args). The derivative at
    the cutoff is obtained with jax.grad at trace time — no hand differentiation
    (this replaces the reference's symbolically-shifted Lepton expressions).
    """
    du = jax.grad(u_fn, argnums=0)

    def sf(r, rc, *args):
        return u_fn(r, *args) - u_fn(rc, *args) - du(rc, *args) * (r - rc)

    return sf


def shifted_potential(u_fn):
    """Transform u(r) -> u(r) - u(rc): energy (not force) continuous at rc."""

    def sp(r, rc, *args):
        return u_fn(r, *args) - u_fn(rc, *args)

    return sp

"""Periodic boundary helpers (orthorhombic boxes).

All benchmark systems of the reference (q-SPC/FW water, emim/BF4, phenol in
water, LJ argon — BASELINE.md configs) use rectangular boxes, so the minimum
image convention is the cheap, branch-free `dx - box*round(dx/box)` form that
XLA fuses into the pair kernels. Triclinic boxes are NOT supported — the
reference inherits them from OpenMM but ships only orthorhombic test systems
(SURVEY.md §4); attach a triclinic reduction upstream if ever needed.

Examples:

>>> import jax.numpy as jnp
>>> box = jnp.asarray([2.0, 2.0, 2.0])
>>> [round(v, 6) for v in minimum_image(jnp.asarray([1.9, -1.9, 0.4]), box).tolist()]
[-0.1, 0.1, 0.4]
>>> float(minimum_image(jnp.asarray([1.0, 0.0, 0.0]), box)[0])  # half-box edge
1.0
"""
from __future__ import annotations

import jax.numpy as jnp


def minimum_image(dx: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Minimum-image displacement for orthorhombic box; dx (..., 3), box (3,).

    Multiplies by the (3,)-vector reciprocal instead of dividing elementwise:
    the reciprocal is hoisted out of the pair tile, the per-slot op is a mul.
    """
    return dx - box * jnp.round(dx * (1.0 / box))


def wrap_positions(x: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Wrap positions into [0, box)."""
    return x - box * jnp.floor(x / box)


def pair_displacement(xi: jnp.ndarray, xj: jnp.ndarray, box: jnp.ndarray):
    """Minimum-image displacement xi - xj, any broadcastable shapes (...,3)."""
    return minimum_image(xi - xj, box)

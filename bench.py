"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): ns/day, 30k-atom q-SPC/Fw water, 2-level RESPA
(near/far split) + Nosé-Hoover NVT, on the real TPU chip. Secondary numbers
(pair-kernel ms/step, argon config) go to stderr; stdout carries exactly the
one JSON line.

vs_baseline: the OpenMM-CPU comparator cannot be measured here (no OpenMM, no
network — BASELINE.md "Comparator caveat"); a provisional literature-scale
comparator of 5 ns/day (OpenMM CPU, ~30k atoms, multicore) is used — treat
the ratio as conditional until a real comparator run exists.
"""
from __future__ import annotations

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_water_respa(n_molecules=10000, steps=200, dt=0.002, method="cutoff"):
    from atomsmm_tpu import (
        Context,
        MultipleTimeScaleIntegrator,
        RESPASystem,
        make_state,
    )
    from atomsmm_tpu.models import water_system

    system, x, box = water_system(
        n_molecules=n_molecules, method=method, neighbors=True
    )
    respa = RESPASystem(system, rcut_in=0.7, rswitch_in=0.6)
    respa = respa.with_neighbors(system.neighbors)
    dof = 3 * system.num_particles - 3
    integ = MultipleTimeScaleIntegrator(
        dt, [4, 2, 1], temperature=300.0, time_scale=0.1,
        degrees_of_freedom=dof,
    )
    ctx = Context(respa, integ, make_state(x, box=box))
    ctx.set_velocities_to_temperature(300.0, seed=7)

    def sync():
        # axon: fetching a host value is the reliable barrier
        return float(ctx.state.x[0, 0])

    t0 = time.perf_counter()
    ctx.step(1)
    sync()
    log(f"water {3*n_molecules} ({method}): compile+first "
        f"{time.perf_counter()-t0:.0f}s")
    # steady state: equilibrate off the lattice, then size cell capacities to
    # measured occupancy (pair work ~ cap^2; Context.retune_neighbors)
    ctx.step(300)
    ctx.retune_neighbors()
    ctx.step(1)
    sync()

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        ctx.step(steps)
        sync()
        dtw = time.perf_counter() - t0
        best = dtw if best is None else min(best, dtw)
    ms_per_step = best / steps * 1e3
    ns_day = dt * 1e-3 * steps / best * 86400.0
    log(f"water {3*n_molecules} RESPA[4,2,1]@{dt*1e3:.0f}fs {method}: "
        f"{ms_per_step:.2f} ms/step, {ns_day:.2f} ns/day")
    return ns_day, ms_per_step


def bench_secondary():
    """Extra configs (BENCH_ALL=1): PME headline, 100k NPT, argon."""
    import jax.numpy as jnp

    from atomsmm_tpu import (
        Context,
        MonteCarloBarostat,
        MultipleTimeScaleIntegrator,
        RESPASystem,
        make_state,
    )
    from atomsmm_tpu.models import water_system

    bench_water_respa(method="pme")

    nmol = 33334
    system, x, box = water_system(n_molecules=nmol, neighbors=True)
    system = system.add_force(
        MonteCarloBarostat(pressure=1.0, temperature=300.0, frequency=25)
    )
    respa = RESPASystem(system, rcut_in=0.7, rswitch_in=0.6)
    integ = MultipleTimeScaleIntegrator(
        0.002, [4, 2, 1], temperature=300.0, time_scale=0.1,
        degrees_of_freedom=3 * 3 * nmol - 3,
    )
    ctx = Context(respa, integ, make_state(x, box=box))
    ctx.set_velocities_to_temperature(300.0, seed=3)
    ctx.step(1)
    float(ctx.state.x[0, 0])
    t0 = time.perf_counter()
    ctx.step(100)
    float(ctx.state.x[0, 0])
    per = (time.perf_counter() - t0) / 100
    log(f"water 100k NPT RESPA[4,2,1]@2fs: {per*1e3:.1f} ms/step, "
        f"{0.002e-3*86400/per:.2f} ns/day")


def main():
    import os

    ns_day, ms_step = bench_water_respa()
    if os.environ.get("BENCH_ALL"):
        bench_secondary()
    comparator = 5.0  # provisional OpenMM-CPU scale (see module docstring)
    print(
        json.dumps(
            {
                "metric": "ns/day, 30k-atom q-SPC/Fw water, 2-level RESPA "
                          "+ NHC NVT (TPU v5e, 1 core)",
                "value": round(ns_day, 2),
                "unit": "ns/day",
                "vs_baseline": round(ns_day / comparator, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

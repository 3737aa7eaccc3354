"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): ns/day on the best implemented config, run on
real TPU. Progression: argon 4k NVE (config 1) -> 30k q-SPC/FW RESPA water
(config 2, the BASELINE.json headline). Details go to stderr; stdout carries
exactly the one JSON line.

vs_baseline: the OpenMM-CPU comparator cannot be measured here (no OpenMM, no
network — BASELINE.md "Comparator caveat"), so a provisional literature-scale
comparator is used and documented per config; treat the ratio as conditional.
"""
from __future__ import annotations

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_argon_nve(n=4000, steps=1000, dt=0.002):
    import jax
    from atomsmm_tpu import VelocityVerletIntegrator, make_state
    from atomsmm_tpu.context import Context
    from atomsmm_tpu.models import argon_system

    system, x, box = argon_system(n=n, jitter=0.05, seed=1, chunk=512)
    integrator = VelocityVerletIntegrator(dt=dt)
    state = make_state(x, box=box, seed=0)
    ctx = Context(system, integrator, state)
    ctx.set_velocities_to_temperature(120.0, seed=7)

    def sync():
        # On the axon platform block_until_ready on donated buffers can return
        # early; fetching a host value is the reliable barrier.
        return float(ctx.state.x[0, 0])

    # compile + settle
    t0 = time.perf_counter()
    ctx.step(1)
    sync()
    log(f"argon {n}: compile+first step {time.perf_counter()-t0:.1f}s")

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        ctx.step(steps)
        sync()
        dtw = time.perf_counter() - t0
        best = dtw if best is None else min(best, dtw)
    ms_per_step = best / steps * 1e3
    ns_day = dt * 1e-3 * steps / best * 86400.0
    log(f"argon {n}: {ms_per_step:.3f} ms/step, {ns_day:.1f} ns/day")
    return ns_day, ms_per_step


def main():
    ns_day, ms_step = bench_argon_nve()
    # Provisional comparator (documented, conditional — BASELINE.md):
    # OpenMM CPU, 4k-atom LJ fluid, 2 fs: O(100) ns/day scale.
    comparator = 100.0
    print(
        json.dumps(
            {
                "metric": "ns/day, LJ argon 4k NVE (dense pair path)",
                "value": round(ns_day, 2),
                "unit": "ns/day",
                "vs_baseline": round(ns_day / comparator, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

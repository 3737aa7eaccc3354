"""SIN(R) outer-step study on emim/BF4 (VERDICT r3 #4; SINR_TIMESTEP.md).

SIN(R)'s entire point is very large outer steps (Leimkuhler/Margul/Tuckerman
2013 sustain ~100 fs): the per-DOF isokinetic constraint m v^2 + Q1 v1^2/2
= kT bounds |v| and suppresses the RESPA resonance that limits deterministic
NVT to ~5 fs. This study measures throughput and ensemble fidelity as the
outer (PME far-force) step grows, from one common equilibrated state
(bench_data/eq_emim.npz).

Ensemble metrics (SIN(R) is stochastic — no conserved quantity):
  * PE per atom vs the 4 fs reference row (the configurational-ensemble
    check; the method leaves configurational averages canonical)
  * kinetic T — expected kT/2 per DOF (= 176.5 K at 353 K) for L = 1
  * isokinetic constraint residual (must stay at f32 rounding)

Usage: python tools/sinr_study.py [quick]
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


def constraint_residual(ctx):
    """Max per-DOF |m v^2 + 0.5 Q1 v1^2 - kT| / kT."""
    import jax.numpy as jnp

    from atomsmm_tpu.integrate.sinr import V1
    from atomsmm_tpu.units import BOLTZMANN

    integ = ctx.integrator
    kT = BOLTZMANN * integ.temperature
    q1 = kT * integ.tau**2
    m = ctx.system.masses[:, None]
    v, v1 = ctx.state.v, ctx.state.extra[V1]
    res = jnp.abs(m * v * v + 0.5 * q1 * v1 * v1 - kT) / kT
    return float(jnp.max(res))


def run_candidate(dt, loops, steps, sample_every=250, rin=0.7):
    from atomsmm_tpu import Context, RESPASystem, SIN_R_Integrator, make_state
    from atomsmm_tpu.models import ionic_liquid_system

    system, x, box = ionic_liquid_system(n_pairs=400, method="pme",
                                         neighbors=True)
    respa = RESPASystem(system, rcut_in=rin, rswitch_in=rin - 0.1)
    integ = SIN_R_Integrator(
        dt, list(loops), temperature=353.0, time_scale=0.05, friction=10.0
    )
    eq = load_eq("eq_emim")
    if eq is None:
        raise SystemExit("run tools/gen_eq_states.py emim first")
    ex, ev, ebox = eq
    from atomsmm_tpu.ops.neighbors import retune_neighbor_specs

    respa = retune_neighbor_specs(respa, ex, ebox)
    ctx = Context(respa, integ, make_state(ex, v=ev, box=ebox, seed=11))
    t0 = time.perf_counter()
    ctx.step(1)
    float(ctx.state.x[0, 0])
    compile_s = time.perf_counter() - t0
    ctx.step(100)

    n = system.num_particles
    t_hist, pe_hist = [], []
    t_wall = time.perf_counter()
    done = 0
    while done < steps:
        ctx.step(sample_every)
        done += sample_every
        t_hist.append(float(ctx.temperature()))
        pe_hist.append(float(ctx.get_state().potential_energy))
        if not np.isfinite(pe_hist[-1]):
            log(f"  BLEW UP at step {done}")
            break
    wall = time.perf_counter() - t_wall
    tail = slice(int(len(t_hist) * 0.4), None)
    row = {
        "dt_fs": dt * 1e3,
        "loops": list(loops),
        "rin": rin,
        "steps": done,
        "ms_step": round(wall / max(done, 1) * 1e3, 2),
        "ns_day": round(dt * 1e-3 * done / wall * 86400.0, 2),
        "T_kin_K": round(float(np.mean(t_hist[tail])), 2),
        "PE_per_atom": round(float(np.mean(pe_hist[tail])) / n, 4),
        "constraint_residual": round(constraint_residual(ctx), 7),
        "finite": bool(np.isfinite(pe_hist[-1])),
        "compile_s": round(compile_s, 1),
    }
    log(json.dumps(row))
    return row


# loops [n0, n1, 1]: bonded dt/(n0*n1), near dt/n1, far (PME) dt.
# near is held at ~2 fs and bonded at ~0.5 fs while the outer step grows.
CANDIDATES = [
    (0.004, [8, 2, 1], 3000, 0.7),   # the r2 bench row (reference)
    (0.008, [4, 4, 1], 2500, 0.7),   # bonded 0.5, near 2, far 8
    (0.012, [4, 6, 1], 2000, 0.7),   # bonded 0.5, near 2, far 12
    (0.016, [4, 8, 1], 1500, 0.7),   # bonded 0.5, near 2, far 16
    (0.020, [4, 10, 1], 1200, 0.7),  # bonded 0.5, near 2, far 20
    (0.030, [4, 15, 1], 800, 0.7),   # bonded 0.5, near 2, far 30
]

# pass 2: at large outer steps the near evals dominate; push the near step
# (SIN(R) thermostats every RESPA level, so near-level resonance is also
# suppressed) and shrink the near region
PASS2 = [
    (0.020, [4, 8, 1], 1200, 0.7),   # near 2.5 fs
    (0.024, [4, 8, 1], 1000, 0.7),   # near 3 fs, far 24
    (0.030, [4, 10, 1], 800, 0.7),   # near 3 fs, far 30
    (0.020, [4, 10, 1], 1200, 0.5),  # near 2 fs, small near region
    (0.030, [4, 15, 1], 800, 0.5),   # near 2 fs, small near region
]


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else ""
    quick = arg == "quick"
    cands = PASS2 if arg == "pass2" else CANDIDATES
    rows = []
    for dt, loops, steps, rin in cands:
        if quick:
            steps = min(steps, 600)
        try:
            rows.append(run_candidate(dt, loops, steps, rin=rin))
        except Exception as e:
            log(f"candidate {dt} {loops} failed: {e}")
    log("| dt | loops | ms/step | ns/day | T_kin [K] | PE/N | constraint |")
    log("|" + "---|" * 7)
    for r in rows:
        log(f"| {r['dt_fs']:.0f} fs | {r['loops']} rin={r['rin']} | {r['ms_step']} | "
            f"{r['ns_day']} | {r['T_kin_K']} | {r['PE_per_atom']} | "
            f"{r['constraint_residual']:.1e} |")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()

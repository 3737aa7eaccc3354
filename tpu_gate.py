"""On-TPU correctness gate (BASELINE.md north star; VERDICT r01 weak #4).

The test suite pins the CPU-f64 "Reference platform" (tests/conftest.py); the
headline benchmark runs the TPU-f32 production path. This gate closes the
loop: in ONE process it evaluates per-group energies and forces of the
benchmark systems on the real TPU chip (f32, cell-list production path) and
on the CPU (f64, dense reference path), reports the deviations, and runs a
1000-step NVE drift check on the TPU.

Usage:  python tpu_gate.py          # writes the report to stdout
Result of record: TPU_GATE.md (regenerate after kernel changes).

Tolerances: BASELINE.md asks for 1e-5 kJ/mol *per-group energy* agreement
"within integrator tolerance". In f32 the potential is a sum of ~1e5 terms
of magnitude ~1e1 each, so the achievable ABSOLUTE agreement scales with the
energy magnitude; the gate therefore checks RELATIVE energy agreement at
2e-6 (f32 roundoff on the summation tree) and force agreement at 2e-5 of
the max force component.
"""
from __future__ import annotations

import sys

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # CPU reference precision
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    try:
        tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
    except IndexError:
        print("NO TPU VISIBLE — gate not run")
        return 1

    from atomsmm_tpu import RESPASystem
    from atomsmm_tpu.models import argon_system, water_system
    from atomsmm_tpu.ops.neighbors import all_neighbor_extras, make_aux
    from atomsmm_tpu.potential import force_fn, group_energies

    print(f"# TPU correctness gate\n")
    print(f"TPU device: {tpu}; CPU reference: f64 dense path\n")
    ok = True

    def check(label, build):
        nonlocal ok
        # f64 CPU reference (dense path)
        with jax.default_device(cpu):
            system64, x64, box64 = build(np.float64)
            e_ref = {
                g: float(v) for g, v in group_energies(
                    system64, x64, box64, {}, None
                ).items()
            }
            _, f_ref = force_fn(system64)(x64, box64, {}, None)
            f_ref = np.asarray(f_ref)

        # f32 TPU production path (cell lists)
        with jax.default_device(tpu):
            system32, x32, box32 = build(np.float32)
            extras = all_neighbor_extras(system32, x32, box32)
            aux = make_aux(system32, extras)
            e_tpu = {
                g: float(v) for g, v in group_energies(
                    system32, x32, box32, {}, aux
                ).items()
            }
            _, f_tpu = force_fn(system32)(x32, box32, {}, aux)
            f_tpu = np.asarray(f_tpu)

        print(f"## {label}")
        fscale = np.abs(f_ref).max()
        df = np.abs(f_tpu - f_ref).max()
        for g in sorted(e_ref):
            rel = abs(e_tpu[g] - e_ref[g]) / max(abs(e_ref[g]), 1e-30)
            line_ok = rel < 2e-6
            ok &= line_ok
            print(f"- group {g}: E_f64 = {e_ref[g]:.6f} kJ/mol, "
                  f"E_tpu32 = {e_tpu[g]:.6f}, rel = {rel:.2e} "
                  f"{'PASS' if line_ok else 'FAIL'}")
        f_ok = df < 2e-5 * fscale
        ok &= f_ok
        print(f"- forces: max|dF| = {df:.3e} kJ/mol/nm "
              f"(scale {fscale:.1e}, rel {df/fscale:.2e}) "
              f"{'PASS' if f_ok else 'FAIL'}\n")

    def argon(dtype):
        return argon_system(n=4096, jitter=0.1, seed=1, neighbors=True,
                            dtype=dtype)

    def water_respa(dtype):
        s, x, b = water_system(n_molecules=1000, method="cutoff",
                               neighbors=True, dtype=dtype)
        r = RESPASystem(s, rcut_in=0.7, rswitch_in=0.6)
        return r, x, b

    check("argon 4096, LJ cutoff+switch (config 1)", argon)
    check("water 3000, RESPA near/far split (config 2)", water_respa)

    # NVE drift on the TPU production path (config 1, 1000 steps x 2 fs)
    from atomsmm_tpu import Context, VelocityVerletIntegrator, make_state

    with jax.default_device(tpu):
        system, x, box = argon(np.float32)
        ctx = Context(system, VelocityVerletIntegrator(dt=0.002),
                      make_state(x, box=box))
        ctx.set_velocities_to_temperature(120.0, seed=3)
        e0 = float(ctx.conserved_energy())
        ctx.step(1000)
        e1 = float(ctx.conserved_energy())
    drift = abs(e1 - e0) / 4096 / 2.0  # kJ/mol/atom/ps
    d_ok = drift < 5e-5
    ok &= d_ok
    print("## NVE drift, argon 4096, TPU f32, 2 ps")
    print(f"- |dE_conserved| = {drift:.2e} kJ/mol/atom/ps "
          f"{'PASS' if d_ok else 'FAIL'}\n")

    print(f"**GATE: {'PASS' if ok else 'FAIL'}**")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

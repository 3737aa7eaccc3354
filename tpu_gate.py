"""On-TPU correctness gate (BASELINE.md north star; VERDICT r01 weak #4).

The test suite pins the CPU-f64 "Reference platform" (tests/conftest.py); the
headline benchmark runs the TPU-f32 production path. This gate closes the
loop: in ONE process it evaluates per-group energies and forces of the
benchmark systems on the real TPU chip (f32, cell-list production path) and
on the CPU (f64, dense reference path), reports the deviations, and runs a
1000-step NVE drift check on the TPU.

Usage:  python tpu_gate.py          # writes the report to stdout
Result of record: TPU_GATE.md (regenerate after kernel changes).

Tolerances — measured f32 floors, with the BASELINE.md caveat spelled out:
BASELINE.md asks for "1e-5 kJ/mol" per-group energy agreement. An absolute
1e-5 kJ/mol on a 10^4-atom system is ~1e-9 RELATIVE — below f32 resolution
by construction (the potential sums ~10^6 pair terms whose magnitudes cancel
~10^4-fold; OpenMM's own single-precision platforms validate at comparable
relative levels). The gate therefore asserts:

  * per-group energies: rel <= 5e-4 (measured: 0.5-2.6e-4 — dominated by
    f32 summation-tree cancellation, identical on CPU-f32);
  * per-group forces:  rel <= 2e-5 of the group's max component
    (measured: 4-6e-6 for the pair groups; the bonded group is compared on
    a thermally perturbed configuration — at the pristine lattice minimum
    its reference forces are ~0 and the f32 POSITION roundoff k*eps*|x| of
    the stiff springs dominates any relative measure);
  * NVE conserved drift <= 2e-4 kJ/mol/atom/ps (measured 7e-5; pure-f32
    engines typically sit at 1e-4..1e-3).

The f64 CPU "Reference platform" remains the correctness anchor (the full
test suite); this gate pins how far the TPU f32 production path sits from
it, so regressions in kernels/approximations (rsqrt, erfc poly) surface.
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
    from atomsmm_tpu.ops.neighbors import (
        all_neighbor_extras,
        assert_neighbor_health,
        make_aux,
    )
    from atomsmm_tpu.potential import force_fn, group_energies

    print(f"# TPU correctness gate\n")
    print(f"TPU device: {tpu}; CPU reference: f64 dense path\n")
    ok = True

    def check(label, build, jitter=0.0):
        nonlocal ok
        rng = np.random.RandomState(0)

        # f64 CPU reference (dense path)
        with jax.default_device(cpu):
            system64, x64, box64 = build(np.float64)
            if jitter:
                x64 = x64 + jnp.asarray(
                    rng.normal(0.0, jitter, np.shape(x64))
                )
            groups = sorted(
                {int(f.group) for f in system64.forces
                 if not type(f).__name__.startswith("MonteCarlo")}
            )
            e_ref, f_ref = {}, {}
            for g in groups:
                e_ref[g] = float(group_energies(
                    system64, x64, box64, {}, None
                )[g])
                _, fr = force_fn(system64, {g})(x64, box64, {}, None)
                f_ref[g] = np.asarray(fr)

        # f32 TPU production path (cell lists)
        with jax.default_device(tpu):
            system32, x32, box32 = build(np.float32)
            x32 = jnp.asarray(np.asarray(x64), np.float32)
            extras = all_neighbor_extras(system32, x32, box32)
            # Never evaluate on an unhealthy pair list: this direct aux path
            # has no Context auto-recovery, and a silently dropped pair list
            # reads as a (wrong) f32-precision failure (r4: TIP4P lattice
            # aliasing overflowed cap 200 with ~213 sites in a cell). Give
            # it the same treatment Context.__init__ applies — retune to the
            # measured configuration, then fail LOUDLY if still unhealthy.
            from atomsmm_tpu.ops.neighbors import unhealthy_flags

            if any(bool(f) for f in unhealthy_flags(extras)):
                from atomsmm_tpu.ops.neighbors import retune_neighbor_specs

                system32 = retune_neighbor_specs(system32, x32, box32)
                extras = all_neighbor_extras(system32, x32, box32)
            assert_neighbor_health(extras)
            aux = make_aux(system32, extras)
            e_tpu, f_tpu = {}, {}
            for g in groups:
                e_tpu[g] = float(group_energies(
                    system32, x32, box32, {}, aux
                )[g])
                _, ft = force_fn(system32, {g})(x32, box32, {}, aux)
                f_tpu[g] = np.asarray(ft)

        print(f"## {label}")
        for g in groups:
            scale = max(abs(e_ref[g]), 1.0)
            rel = abs(e_tpu[g] - e_ref[g]) / scale
            line_ok = rel < 5e-4
            ok &= line_ok
            fscale = max(np.abs(f_ref[g]).max(), 1.0)
            df = np.abs(f_tpu[g] - f_ref[g]).max()
            f_ok = df < 2e-5 * fscale
            ok &= f_ok
            print(f"- group {g}: E_f64 = {e_ref[g]:.6f} kJ/mol, "
                  f"E_tpu32 = {e_tpu[g]:.6f}, rel = {rel:.2e} "
                  f"{'PASS' if line_ok else 'FAIL'}; "
                  f"max|dF| = {df:.3e} (scale {fscale:.1e}, "
                  f"rel {df/fscale:.2e}) {'PASS' if f_ok else 'FAIL'}")
        print()

    def argon(dtype):
        return argon_system(n=4096, jitter=0.1, seed=1, neighbors=True,
                            dtype=dtype)

    def water_respa(dtype):
        s, x, b = water_system(n_molecules=1000, method="cutoff",
                               neighbors=True, dtype=dtype)
        r = RESPASystem(s, rcut_in=0.7, rswitch_in=0.6)
        return r, x, b

    def water_pme(dtype):
        # exercises the order-6 reciprocal path (spreading matmuls + rfftn
        # + moduli + corrections) f32-TPU vs f64-CPU
        return water_system(n_molecules=1000, method="pme", neighbors=True,
                            dtype=dtype, dispersion_correction=True)

    def tip4p(dtype):
        # virtual sites: energies/forces flow through placement + vjp
        # pullback on both backends
        from atomsmm_tpu.models import tip4p_water_system

        return tip4p_water_system(n_molecules=750, neighbors=True,
                                  dtype=dtype)

    def triclinic_argon(dtype):
        # r4: cell lists on a sheared (3,3) cell — fractional binning +
        # triclinic minimum image; CPU reference runs the dense path
        from atomsmm_tpu.models import argon_system
        from atomsmm_tpu.ops.neighbors import make_neighbor_spec
        from atomsmm_tpu.ops.pbc import triclinic_from_lengths_angles
        from atomsmm_tpu.utils import replace as dreplace

        h64 = 3.0 * np.asarray(triclinic_from_lengths_angles(
            2.2, 2.0, 2.4, 90.0, 105.0, 80.0))
        rs = np.random.RandomState(7)
        g = 12
        frac = np.stack(np.meshgrid(*[np.arange(g)] * 3,
                                    indexing="ij"), -1).reshape(-1, 3) / g
        frac = frac + rs.uniform(-0.015, 0.015, frac.shape)
        x = jnp.asarray(frac @ h64, dtype)
        n = x.shape[0]
        system, _, _ = argon_system(n=n, jitter=0.0, seed=2, r_cut=0.7,
                                    r_switch=0.6, dtype=dtype)
        h = jnp.asarray(h64, dtype)
        system = dreplace(system, default_box=h)
        system = system.with_neighbors(
            make_neighbor_spec(h64, n, 0.7, occupancy_floor_from=frac @ h64)
        )
        return system, x, h

    check("argon 4096, LJ cutoff+switch (config 1)", argon)
    # thermal jitter: at the pristine lattice the bonded reference forces
    # are ~0 and stiff-spring position roundoff swamps any relative measure
    check("water 3000, RESPA near/far split (config 2)", water_respa,
          jitter=0.004)
    check("water 3000, PME (order-6 reciprocal)", water_pme, jitter=0.004)
    check("rigid TIP4P/Ew 3000, virtual sites (r4)", tip4p, jitter=0.004)
    check("triclinic argon 1728, sheared-cell lists (r4)", triclinic_argon)

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
    d_ok = drift < 2e-4
    ok &= d_ok
    print("## NVE drift, argon 4096, TPU f32, 2 ps")
    print(f"- |dE_conserved| = {drift:.2e} kJ/mol/atom/ps "
          f"{'PASS' if d_ok else 'FAIL'}\n")

    # SETTLE on the TPU f32 production path: closed-form geometry must sit
    # at the f32 floor over a trajectory (r4 — ops/settle.py)
    from atomsmm_tpu.models import rigid_water_system
    from atomsmm_tpu.ops.settle import settle_residual

    with jax.default_device(tpu):
        rsys, rx, rbox = rigid_water_system(n_molecules=1000, neighbors=True,
                                            dtype=np.float32)
        rctx = Context(rsys, VelocityVerletIntegrator(dt=0.002),
                       make_state(rx, box=rbox))
        rctx.set_velocities_to_temperature(300.0, seed=5)
        rctx.step(500)
        res = float(settle_residual(rsys.settle, rctx.state.x))
    # f32 floor measured ~3.6e-6 relative on the CPU-f32 path
    r_ok = res < 2e-5
    ok &= r_ok
    print("## SETTLE geometry, rigid TIP3P 3000, TPU f32, 1 ps")
    print(f"- max relative geometry residual = {res:.2e} "
          f"{'PASS' if r_ok else 'FAIL'}\n")

    print(f"**GATE: {'PASS' if ok else 'FAIL'}**")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

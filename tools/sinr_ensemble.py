"""SIN(R) 30 fs ensemble validation: structure (RDFs) + transport (D)
vs the 4 fs reference (VERDICT r3 #6 — the 61.6 ns/day headline row must
be backed by more than T_kin/PE agreement).

Protocol: from the common equilibrated state (bench_data/eq_emim.npz),
run BOTH the 4 fs [8,2,1] reference and the 30 fs [4,10,1] headline
configuration (rin 0.7 — SINR_TIMESTEP.md pass 2) for --ps picoseconds,
sampling positions every ~0.3 ps. Observables:

  * site-site RDFs g(r): N1-B (cation-anion contact), B-B, N1-N1 —
    first-peak position/height + RMS difference over r < 1.2 nm;
  * self-diffusion D of cation/anion molecular COMs from the Einstein
    MSD slope (system-COM drift removed; positions are never wrapped by
    the integrator, so COM trajectories are naturally unwrapped).

A 30 fs integrator that distorts the configurational ensemble shows up
as shifted/damped RDF peaks; one that distorts dynamics shows up in D.

Usage: python tools/sinr_ensemble.py [--ps 100] [--pairs 400] [--cpu]
Writes a markdown table to stdout (pasted into SINR_TIMESTEP.md).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_CAT, N_AN, N_PER = 8, 5, 13


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_config(dt, loops, n_pairs, ps, sample_ps=0.3, seed=11):
    """Returns (samples (S, N, 3) float32 UNWRAPPED, boxes (S, 3), masses)."""
    from atomsmm_tpu import Context, RESPASystem, SIN_R_Integrator, make_state
    from atomsmm_tpu.minimize import minimize_energy
    from atomsmm_tpu.models import ionic_liquid_system
    from atomsmm_tpu.ops.neighbors import retune_neighbor_specs

    system, x, box = ionic_liquid_system(n_pairs=n_pairs, method="pme",
                                         neighbors=True)
    respa = RESPASystem(system, rcut_in=0.7, rswitch_in=0.6)
    integ = SIN_R_Integrator(dt, loops, temperature=353.0, time_scale=0.05,
                             friction=10.0)
    eq = None
    if n_pairs == 400:
        path = os.path.join(os.path.dirname(__file__), "..", "bench_data",
                            "eq_emim.npz")
        if os.path.exists(path):
            d = np.load(path)
            eq = d["x"], d["v"], d["box"]
    if eq is not None:
        ex, ev, ebox = eq
        respa = retune_neighbor_specs(respa, ex, ebox)
        ctx = Context(respa, integ, make_state(ex, v=ev, box=ebox, seed=seed))
        ctx.step(max(int(2.0 / (dt)), 50))  # 2 ps re-equilibration
    else:
        ctx = Context(respa, integ, make_state(x, box=box, seed=seed))
        minimize_energy(ctx, steps=200)
        ctx.step(max(int(5.0 / dt), 200))
        ctx.retune_neighbors()
        ctx.step(1)
    every = max(int(round(sample_ps / dt)), 1)
    n_samp = int(ps / (every * dt))
    log(f"  dt={dt*1e3:.0f}fs: {n_samp} samples x {every} steps "
        f"({n_samp * every * dt:.0f} ps)")
    xs, t0 = [], time.perf_counter()
    for s in range(n_samp):
        ctx.step(every)
        xs.append(np.asarray(ctx.state.x, np.float32))
        if (s + 1) % 50 == 0:
            el = time.perf_counter() - t0
            log(f"    {s+1}/{n_samp}  T={float(ctx.temperature()):.1f}K "
                f"({el/(s+1)*1e3/every:.1f} ms/step)")
    box_now = np.asarray(ctx.state.box, np.float32)
    masses = np.asarray(ctx.system.masses)
    return np.stack(xs), box_now, masses, every * dt


def run_config_water(dt, loops, n_molecules, ps, sample_ps=0.3, seed=11):
    """Water analog of run_config: flexible q-SPC/Fw under the same SIN(R)
    bath as bench config 2b (bench.py::bench_water_sinr). Returns
    (samples, box, masses, dt_samp)."""
    from atomsmm_tpu import Context, RESPASystem, SIN_R_Integrator, make_state
    from atomsmm_tpu.minimize import minimize_energy
    from atomsmm_tpu.models import water_system
    from atomsmm_tpu.ops.neighbors import retune_neighbor_specs

    system, x, box = water_system(n_molecules=n_molecules, method="cutoff",
                                  neighbors=True)
    respa = RESPASystem(system, rcut_in=0.5, rswitch_in=0.4)
    integ = SIN_R_Integrator(dt, loops, temperature=300.0, time_scale=0.05,
                             friction=10.0)
    eq = None
    if n_molecules == 10000:
        path = os.path.join(os.path.dirname(__file__), "..", "bench_data",
                            "eq_water30k.npz")
        if os.path.exists(path):
            d = np.load(path)
            eq = d["x"], d["v"], d["box"]
    if eq is not None:
        ex, ev, ebox = eq
        respa = retune_neighbor_specs(respa, ex, ebox)
        ctx = Context(respa, integ, make_state(ex, v=ev, box=ebox, seed=seed))
        ctx.step(max(int(2.0 / dt), 50))
    else:
        ctx = Context(respa, integ, make_state(x, box=box, seed=seed))
        minimize_energy(ctx, steps=200)
        ctx.step(max(int(5.0 / dt), 200))
        ctx.retune_neighbors()
        ctx.step(1)
    every = max(int(round(sample_ps / dt)), 1)
    n_samp = int(ps / (every * dt))
    log(f"  dt={dt*1e3:.0f}fs: {n_samp} samples x {every} steps "
        f"({n_samp * every * dt:.0f} ps)")
    xs, t0 = [], time.perf_counter()
    for s in range(n_samp):
        ctx.step(every)
        xs.append(np.asarray(ctx.state.x, np.float32))
        if (s + 1) % 50 == 0:
            el = time.perf_counter() - t0
            log(f"    {s+1}/{n_samp}  T={float(ctx.temperature()):.1f}K "
                f"({el/(s+1)*1e3/every:.1f} ms/step)")
    box_now = np.asarray(ctx.state.box, np.float32)
    masses = np.asarray(ctx.system.masses)
    return np.stack(xs), box_now, masses, every * dt


def rdf(samples, box, idx_a, idx_b, r_max=1.2, nbins=120, same=False,
        mol_a=None, mol_b=None):
    """Minimum-image site-site g(r) averaged over samples. Pass mol_a/mol_b
    (per-site molecule ids) to drop intramolecular pairs (e.g. the bonded
    O-H at 0.1 nm, which would otherwise dwarf the intermolecular peak)."""
    edges = np.linspace(0.0, r_max, nbins + 1)
    hist = np.zeros(nbins)
    vol = float(np.prod(box))
    n_a, n_b = len(idx_a), len(idx_b)
    ma = mb = None
    n_intra = 0
    if mol_a is not None:
        ma, mb = np.asarray(mol_a), np.asarray(mol_b)
        # intra count without the (n_a, n_b) boolean matrix: pairs sharing a
        # molecule id = sum over ids of count_a * count_b
        nmol = int(max(ma.max(), mb.max())) + 1
        n_intra = int((np.bincount(ma, minlength=nmol)
                       * np.bincount(mb, minlength=nmol)).sum())
    # Row-chunked distance evaluation: the dense (n_a, n_b, 3) displacement
    # array is ~5 GB at 20k sites — cap each block at ~5M pair entries
    # (~60 MB of f32 temporaries) so full-scale runs fit in host RAM.
    chunk = max(1, int(5e6) // max(n_b, 1))
    cols = np.arange(n_b)[None, :]
    for x in samples:
        xa, xb = x[idx_a], x[idx_b]
        for i0 in range(0, n_a, chunk):
            i1 = min(i0 + chunk, n_a)
            d = xa[i0:i1, None, :] - xb[None, :, :]
            d -= box * np.round(d / box)
            r = np.sqrt((d * d).sum(-1))
            # histogram range caps at r_max, so pushing masked entries past
            # it drops them without materializing index lists
            if ma is not None:
                r = np.where(ma[i0:i1, None] == mb[None, :], r_max + 1.0, r)
            if same:  # strict upper triangle in global indices
                r = np.where(cols > np.arange(i0, i1)[:, None], r,
                             r_max + 1.0)
            h, _ = np.histogram(r, bins=edges)
            hist += h
    pairs = (n_a * (n_a - 1) / 2) if same else n_a * n_b
    if mol_a is not None:
        # intra-pair correction: for same-list RDFs the intra count includes
        # the i==j diagonal (n_a entries) and double-counts each off-diagonal
        # pair. Guarded: with no molecule ids there is nothing to subtract
        # (the unguarded form ADDED n_a/2 phantom pairs, deflating g(r)).
        pairs -= ((n_intra - n_a) // 2) if same else n_intra
    shell = 4.0 / 3.0 * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    ideal = pairs * shell / vol
    g = hist / len(samples) / ideal
    r_mid = 0.5 * (edges[1:] + edges[:-1])
    return r_mid, g


def first_peak(r, g):
    i = int(np.argmax(g))
    return r[i], g[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ps", type=float, default=100.0)
    ap.add_argument("--pairs", type=int, default=400)
    ap.add_argument("--system", choices=("emim", "water"), default="emim")
    ap.add_argument("--molecules", type=int, default=216,
                    help="water mode: molecule count (10000 = eq state)")
    ap.add_argument("--rdf-molecules", type=int, default=2000,
                    help="water mode: max molecules entering the RDF "
                    "histograms (random subset; diffusion uses all)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--candidate-dt-fs", type=float, default=24.0,
                    help="water mode: candidate outer step [fs]")
    ap.add_argument("--candidate-loops", type=str, default="4,12,1",
                    help="water mode: candidate RESPA loops, e.g. 8,6,1 "
                    "(r5 near-work scan, VERDICT r4 #7)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.system == "water":
        return main_water(args)

    n_pairs = args.pairs
    n1 = np.arange(n_pairs) * N_PER
    boron = np.arange(n_pairs) * N_PER + N_CAT

    configs = [
        ("4fs ref", 0.004, [8, 2, 1]),
        ("30fs", 0.030, [4, 10, 1]),
    ]
    results = {}
    for name, dt, loops in configs:
        log(f"config {name}")
        xs, box, masses, dt_samp = run_config(dt, loops, n_pairs, args.ps)
        out = {}
        for tag, ia, ib, same in (("N1-B", n1, boron, False),
                                  ("B-B", boron, boron, True),
                                  ("N1-N1", n1, n1, True)):
            r, g = rdf(xs, box, ia, ib, same=same)
            out[tag] = (r, g)
        # molecular-COM diffusion (Einstein MSD slope, drift removed)
        s_, n_, _ = xs.shape
        mols = xs.reshape(s_, n_pairs, N_PER, 3)
        m_mol = masses.reshape(n_pairs, N_PER)[0]
        com_all = (xs * masses[None, :, None]).sum(1) / masses.sum()

        def mol_d(sel):
            coms = (mols[:, :, sel, :] * m_mol[sel][None, None, :, None]
                    ).sum(2) / m_mol[sel].sum()
            coms = coms - com_all[:, None, :]
            lags = np.arange(1, int(0.6 * s_))
            msd = np.array([((coms[lag:] - coms[:-lag]) ** 2).sum(-1).mean()
                            for lag in lags])
            lo, hi = max(int(0.2 * s_), 1), int(0.6 * s_) - 1
            if hi - lo < 2:  # too few samples for a slope (tiny --ps)
                return float("nan")
            t = lags * dt_samp
            return np.polyfit(t[lo:hi], msd[lo:hi], 1)[0] / 6.0

        out["D_cat"] = mol_d(slice(0, N_CAT))
        out["D_an"] = mol_d(slice(N_CAT, N_PER))
        results[name] = out

    print(f"\n# SIN(R) ensemble validation, {n_pairs} pairs, "
          f"{args.ps:.0f} ps per config\n")
    print("| observable | 4 fs ref | 30 fs | agreement |")
    print("|---|---|---|---|")
    for tag in ("N1-B", "B-B", "N1-N1"):
        (r4, g4), (r30, g30) = results["4fs ref"][tag], results["30fs"][tag]
        p4, h4 = first_peak(r4, g4)
        p30, h30 = first_peak(r30, g30)
        rms = float(np.sqrt(np.mean((g4 - g30) ** 2)))
        print(f"| g(r) {tag} first peak | {p4:.3f} nm / {h4:.2f} | "
              f"{p30:.3f} nm / {h30:.2f} | RMS Δg = {rms:.3f} |")
    for k, label in (("D_cat", "D(emim+)"), ("D_an", "D(BF4-)")):
        d4, d30 = results["4fs ref"][k], results["30fs"][k]
        rel = abs(d30 - d4) / max(abs(d4), 1e-12)
        print(f"| {label} [nm²/ps] | {d4:.2e} | {d30:.2e} | "
              f"{rel * 100:.0f}% rel diff |")


def main_water(args):
    """Water mode: bench config 2b's 24 fs [4,12,1] SIN(R) vs the 4 fs
    [4,2,1] reference (same bath), O-O / O-H / H-H intermolecular RDFs +
    molecular self-diffusion."""
    m = args.molecules
    # RDF cost is quadratic in site count; above ~2000 molecules a random
    # subset gives the same curves (2000 mols x ~300 samples ≈ 6e5
    # independent environments) at a tiny fraction of the analysis time.
    # Self-diffusion below still averages over ALL molecule COMs.
    m_rdf = min(m, args.rdf_molecules)
    sel = (np.sort(np.random.default_rng(0).choice(m, m_rdf, replace=False))
           if m_rdf < m else np.arange(m))
    o_idx = sel * 3
    h_idx = np.concatenate([o_idx + 1, o_idx + 2])
    mol_o = o_idx // 3
    mol_h = h_idx // 3

    cand_loops = [int(v) for v in args.candidate_loops.split(",")]
    cand_label = f"{args.candidate_dt_fs:.0f}fs {cand_loops}"
    configs = [
        ("4fs ref", 0.004, [4, 2, 1]),
        (cand_label, args.candidate_dt_fs * 1e-3, cand_loops),
    ]
    results = {}
    for name, dt, loops in configs:
        log(f"config {name}")
        xs, box, masses, dt_samp = run_config_water(dt, loops, m, args.ps)
        out = {}
        for tag, ia, ib, same, ma, mb in (
            ("O-O", o_idx, o_idx, True, None, None),
            ("O-H", o_idx, h_idx, False, mol_o, mol_h),
            ("H-H", h_idx, h_idx, True, mol_h, mol_h),
        ):
            r, g = rdf(xs, box, ia, ib, same=same, mol_a=ma, mol_b=mb)
            out[tag] = (r, g)
        # molecular COM diffusion (system drift removed)
        s_ = xs.shape[0]
        mols = xs.reshape(s_, m, 3, 3)
        m_mol = masses.reshape(m, 3)[0]
        com_all = (xs * masses[None, :, None]).sum(1) / masses.sum()
        coms = (mols * m_mol[None, None, :, None]).sum(2) / m_mol.sum()
        coms = coms - com_all[:, None, :]
        lags = np.arange(1, int(0.6 * s_))
        msd = np.array([((coms[lag:] - coms[:-lag]) ** 2).sum(-1).mean()
                        for lag in lags])
        lo, hi = max(int(0.2 * s_), 1), int(0.6 * s_) - 1
        t = lags * dt_samp
        # too few samples for a slope (tiny --ps): report NaN, keep the RDFs
        out["D"] = (np.polyfit(t[lo:hi], msd[lo:hi], 1)[0] / 6.0
                    if hi - lo >= 2 else float("nan"))
        results[name] = out

    print(f"\n# SIN(R) water ensemble validation, {m} molecules, "
          f"{args.ps:.0f} ps per config\n")
    print(f"| observable | 4 fs ref | {cand_label} | agreement |")
    print("|---|---|---|---|")
    for tag in ("O-O", "O-H", "H-H"):
        (r4, g4), (r24, g24) = (results["4fs ref"][tag],
                                results[cand_label][tag])
        # skip the r=0 region (empty below first contact) for the first peak
        sel = r4 > 0.15
        p4, h4 = first_peak(r4[sel], g4[sel])
        p24, h24 = first_peak(r24[sel], g24[sel])
        rms = float(np.sqrt(np.mean((g4 - g24) ** 2)))
        print(f"| g(r) {tag} first peak | {p4:.3f} nm / {h4:.2f} | "
              f"{p24:.3f} nm / {h24:.2f} | RMS Δg = {rms:.3f} |")
    d4, d24 = results["4fs ref"]["D"], results[cand_label]["D"]
    rel = abs(d24 - d4) / max(abs(d4), 1e-12)
    print(f"| D(H2O) [nm²/ps] | {d4:.2e} | {d24:.2e} | "
          f"{rel * 100:.0f}% rel diff |")


if __name__ == "__main__":
    main()

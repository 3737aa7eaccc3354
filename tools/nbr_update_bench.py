"""Neighbor maybe-update cost decomposition on the real TPU (axon).

Question: what is the ~1.5 ms/step keep-path cost made of?
  (a) the rebuild predicate (max displacement reduce)
  (b) per-lax.cond overhead (2 conds/step, one per spec)
  (c) the buffer flow-through of the cond outputs
  (d) the rebuild branch itself (if the cond is de-facto eager)

Variants timed over the frozen 30k equilibrated state (x static, keep
branch always taken):
  pred      - predicates only, both specs
  cond2     - production update_all_neighbors (two lax.conds)
  cond1     - single merged cond (either predicate -> rebuild both)
  rebuild   - unconditional rebuild of both specs every call
  noop      - loop body without any neighbor code (loop overhead floor)

Run: python tools/nbr_update_bench.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import HEADLINE_RCUT_IN, load_eq  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from atomsmm_tpu import RESPASystem
    from atomsmm_tpu.models import water_system
    from atomsmm_tpu.ops.neighbors import (
        all_neighbor_extras,
        build_cell_buckets,
        iter_specs,
        needs_rebuild,
        retune_neighbor_specs,
        update_all_neighbors,
        _keys,
    )

    system, x0, box0 = water_system(n_molecules=10000, method="cutoff",
                                    neighbors=True)
    respa = RESPASystem(system, rcut_in=HEADLINE_RCUT_IN,
                        rswitch_in=HEADLINE_RCUT_IN - 0.1)
    ex, ev, ebox = load_eq("eq_water30k")
    respa = retune_neighbor_specs(respa, ex, ebox, safety=1.03)
    specs = list(iter_specs(respa))
    for name, spec in specs:
        log(f"{name}: grid={spec.grid} cap={spec.cell_capacity} "
            f"skin={float(spec.skin):.4f}")

    extra = jax.jit(all_neighbor_extras)(respa, ex, ebox)
    extra = {k: v for k, v in extra.items()}
    x = jnp.asarray(ex)
    box = jnp.asarray(ebox)

    REPS = 100

    def timed(tag, make_body, carry):
        @jax.jit
        def loop(carry):
            def body(i, c):
                return make_body(c)
            return jax.lax.fori_loop(0, REPS, body, carry)

        out = loop(carry)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(carry)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        log(f"{tag:8s}: {best / REPS * 1e3:7.3f} ms/call")
        return best / REPS * 1e3

    # noop floor: jiggle x so the loop isn't folded away
    timed("noop", lambda c: (c[0] + 1e-30, c[1]), (x, box))

    # predicates only
    def pred_body(c):
        xx, e = c
        flags = [needs_rebuild(spec, e, xx, box, name) for name, spec in specs]
        xx = xx + 1e-30 * jnp.float32(sum(jnp.float32(f) for f in flags))
        return (xx, e)

    timed("pred", pred_body, (x, extra))

    # production: two lax.conds
    def cond2_body(c):
        xx, e = c
        e = dict(e)
        e.update(update_all_neighbors(respa, e, xx, box))
        xx = xx + 1e-30 * jnp.float32(e["nbr_bucket"][0, 0])
        return (xx, e)

    timed("cond2", cond2_body, (x, extra))

    # merged single cond: either predicate -> rebuild both
    def cond1_body(c):
        xx, e = c
        e = dict(e)
        trig = jnp.zeros((), bool)
        for name, spec in specs:
            trig = trig | needs_rebuild(spec, e, xx, box, name)

        def rebuild(e):
            out = dict(e)
            for name, spec in specs:
                kb, kx, kbox, kov = _keys(name)
                bucket, overflow = build_cell_buckets(spec, xx, box)
                out[kb] = bucket
                out[kx] = xx
                out[kbox] = box
                out[kov] = e[kov] | overflow
            return out

        e = jax.lax.cond(trig, rebuild, lambda e: dict(e), e)
        xx = xx + 1e-30 * jnp.float32(e["nbr_bucket"][0, 0])
        return (xx, e)

    timed("cond1", cond1_body, (x, extra))

    # unconditional rebuild of both specs
    def rebuild_body(c):
        xx, e = c
        e = dict(e)
        for name, spec in specs:
            kb, kx, kbox, kov = _keys(name)
            bucket, overflow = build_cell_buckets(spec, xx, box)
            e[kb] = bucket
            e[kov] = e[kov] | overflow
        xx = xx + 1e-30 * jnp.float32(e["nbr_bucket"][0, 0])
        return (xx, e)

    timed("rebuild", rebuild_body, (x, extra))


if __name__ == "__main__":
    main()

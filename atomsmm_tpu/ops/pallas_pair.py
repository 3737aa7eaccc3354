"""Pallas TPU kernel for cell-pair nonbonded evaluation.

Why a kernel: the XLA cell-block path (ops/neighbors.py) materializes its
(cap, S*cap) pair tiles — r^2, masks, u, du/dr — in HBM between fused ops,
and is measured to be HBM-bandwidth-bound. This kernel keeps every pair tile
in VMEM; HBM sees only the staged per-cell features and the (cap, 4) outputs.

Layouts (staged in XLA once per evaluation, coarse block gathers only):

  home_feats (ncells, capP, LANE)  f32 — per home cell, per atom: columns
      [x, y, z, p0..p_{P-1}] (pair-function parameters), lane-padded;
  home_meta  (ncells, capP, LANE)  i32 — columns [id, exc_0..exc_{M-1}];
  cand_feats (ncells, F8, SJ)      f32 — candidate rows [x, y, z, p...],
      SJ = S*capP lane-padded to the J-chunk size;
  cand_ids   (ncells, 8, SJ)       i32 — row 0: candidate atom ids;
  scal       (1, 8)                f32 in SMEM — [bx, by, bz, rc2].

Grid: (ncells, SJ // JT). Each program computes a (capP, JT) pair tile:
home atoms along sublanes, candidates along lanes. Forces use the symmetric
full-list identity F_i = -sum_j u'(r_ij) r_hat_ij (ops/neighbors.py), with
u and u' from one jvp of the pair function traced into the kernel —
the same traced-JAX energy expressions the rest of the engine uses (no
separate kernel-side physics to keep in sync).

Output (ncells, capP, LANE) f32: columns [fx, fy, fz, e_half_sum].
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rv import Rv, make_rv

LANE = 128

# Scoped-VMEM working-set model: each program holds ~20 live (capP, JT) f32
# tiles (r2, the three dx planes, masks, u, du/dr2, jvp temporaries). The
# TPU scoped-vmem stack limit is 16 MB; budget 10 MB so the staged block
# inputs/outputs fit beside the tile stack. Exceeding it is a COMPILE-time
# OOM ("Ran out of memory in memory space vmem ... on stack"), so both the
# tile sizing here and the backend auto-selection (ops/neighbors.py) gate
# on this model.
_VMEM_TILE_BUDGET = 10 << 20


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fit_j_tile(capP: int, j_tile: int = 512) -> int:
    """Largest power-of-two J-tile <= j_tile whose (capP, JT) working set
    fits the scoped-VMEM budget (never below one lane tile)."""
    # snap any caller-supplied tile to a lane-aligned power of two first:
    # halving e.g. 384 would yield 192, which violates TPU lane tiling
    j_tile = max(LANE, 1 << (max(j_tile, 1).bit_length() - 1))
    while j_tile > LANE and capP * j_tile * 4 * 20 > _VMEM_TILE_BUDGET:
        j_tile //= 2
    return j_tile


def pallas_fits(cap: int) -> bool:
    """True when a cap-atom home cell's pair tile fits scoped VMEM at the
    minimum J-tile. False for very coarse grids (e.g. a sub-1000-atom box
    whose cell list degenerates to one cell) — the backend auto-selection
    falls back to the XLA sweep there."""
    return _round_up(cap, 8) * LANE * 4 * 20 <= _VMEM_TILE_BUDGET


def _check_fits(capP: int, j_tile: int, where: str):
    if capP * j_tile * 4 * 20 > _VMEM_TILE_BUDGET:
        raise ValueError(
            f"{where}: cell capacity {capP} needs "
            f"{capP * j_tile * 4 * 20 / 2**20:.1f} MB of scoped VMEM per "
            f"(capP, {j_tile}) pair tile, over the {_VMEM_TILE_BUDGET >> 20}"
            " MB budget (TPU stack limit 16 MB) — the grid is too coarse "
            "for the Pallas kernel; use backend='xla' (or 'auto', which "
            "checks pallas_fits)"
        )


def _pair_kernel(pair_fn, takes_rv, n_consts, param_names, n_atoms, max_exc,
                 cell_block, scal_ref, hf_ref, hm_ref, cf_ref, ci_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bx = scal_ref[0, 0]
    by = scal_ref[0, 1]
    bz = scal_ref[0, 2]
    rc2 = scal_ref[0, 3]
    box = (bx, by, bz)
    consts = [scal_ref[0, 8 + k] for k in range(n_consts)]

    for c in range(cell_block):
        # home columns: (capP, 1); candidate rows: (1, JT)
        r2 = None
        dxs = []
        for k in range(3):
            xi = hf_ref[c, :, k : k + 1]
            xj = cf_ref[c, k : k + 1, :]
            d = xi - xj
            d = d - box[k] * jnp.round(d * (1.0 / box[k]))
            dxs.append(d)
            r2 = d * d if r2 is None else r2 + d * d

        hid = hm_ref[c, :, 0:1]
        cid = ci_ref[c, 0:1, :]
        mask = (hid < n_atoms) & (cid < n_atoms) & (hid != cid) & (r2 < rc2)
        for e in range(max_exc):
            mask &= hm_ref[c, :, 1 + e : 2 + e] != cid

        r2m = jnp.where(mask, r2, 1.0)
        pi = {
            name: hf_ref[c, :, 3 + k : 4 + k]
            for k, name in enumerate(param_names)
        }
        pj = {
            name: cf_ref[c, 3 + k : 4 + k, :]
            for k, name in enumerate(param_names)
        }

        def f(s):
            rv = make_rv(s)
            return pair_fn(rv if takes_rv else rv.r, pi, pj, *consts)

        u, dudr2 = jax.jvp(f, (r2m,), (jnp.ones_like(r2m),))
        zero = jnp.zeros_like(r2m)
        e_half = 0.5 * jnp.sum(jnp.where(mask, u, zero), axis=1, keepdims=True)
        fmag = jnp.where(mask, 2.0 * dudr2, zero)

        out_ref[c, :, 3:4] += e_half
        for k in range(3):
            out_ref[c, :, k : k + 1] += -jnp.sum(
                fmag * dxs[k], axis=1, keepdims=True
            )


def cell_pair_kernel_call(
    pair_fn,
    param_names,
    n_atoms: int,
    max_exc: int,
    scal,        # (1, 8) f32
    home_feats,  # (ncells, capP, LANE) f32
    home_meta,   # (ncells, capP, LANE) i32
    cand_feats,  # (ncells, F8, SJ) f32
    cand_ids,    # (ncells, 8, SJ) i32
    j_tile: int = 512,
    cell_block: int = 8,
    interpret: bool = False,
):
    ncells, capP, _ = home_feats.shape
    sj = cand_feats.shape[-1]
    assert sj % j_tile == 0, (sj, j_tile)
    while ncells % cell_block:
        cell_block //= 2
    grid = (ncells // cell_block, sj // j_tile)

    # Hoist traced closure scalars (cutoffs, switch radii, lambdas...) out of
    # the pair function: Pallas kernels cannot capture tracers. The converted
    # function takes them as explicit trailing args, delivered via SMEM.
    dtype = home_feats.dtype
    names = list(param_names)
    converted, consts, takes_rv = _hoist_consts(
        pair_fn, names, capP, j_tile, dtype
    )
    n_scal = 8 + len(consts)
    scal_full = jnp.zeros((1, _round_up(max(n_scal, 8), 8)), dtype)
    scal_full = scal_full.at[0, :8].set(scal[0, :8])
    for k, c in enumerate(consts):
        scal_full = scal_full.at[0, 8 + k].set(c.astype(dtype))

    kernel = functools.partial(
        _pair_kernel, converted, takes_rv, len(consts), tuple(names), n_atoms,
        max_exc, cell_block,
    )
    cb = cell_block
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, scal_full.shape[1]),
                lambda i, j: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((cb, capP, LANE), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((cb, capP, LANE), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((cb, cand_feats.shape[1], j_tile), lambda i, j: (i, 0, j)),
            pl.BlockSpec((cb, 8, j_tile), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((cb, capP, LANE), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((ncells, capP, LANE), home_feats.dtype),
        interpret=interpret,
    )(scal_full, home_feats, home_meta, cand_feats, cand_ids)
    return out


def _hoist_consts(pair_fn, param_names, capP, j_tile, dtype):
    """Close the pair function into a jaxpr and pull its captured scalars
    (cutoffs, switch radii, lambdas, shifted-force constants...) out as
    explicit trailing args: Pallas kernels cannot capture tracers, so the
    captures travel via SMEM instead. Returns (converted_fn, consts,
    takes_rv)."""
    names = list(param_names)
    takes_rv = getattr(pair_fn, "takes_rv", False)
    sds = jax.ShapeDtypeStruct((capP, j_tile), dtype)
    ex_r = Rv(sds, sds, sds) if takes_rv else sds
    ex_pi = {k: jax.ShapeDtypeStruct((capP, 1), dtype) for k in names}
    ex_pj = {k: jax.ShapeDtypeStruct((1, j_tile), dtype) for k in names}
    from . import pairfuncs

    with pairfuncs.kernel_safe_math():
        closed = jax.make_jaxpr(lambda rr, pi, pj: pair_fn(rr, pi, pj))(
            ex_r, ex_pi, ex_pj
        )
    consts = closed.consts
    for c in consts:
        assert jnp.ndim(c) == 0, (
            "pair-function closure captures a non-scalar; the Pallas path "
            f"supports scalar captures only (got shape {jnp.shape(c)})"
        )

    def converted(rr, pi, pj, *const_vals):
        flat_args = jax.tree.leaves((rr, pi, pj))
        (out,) = jax.core.eval_jaxpr(closed.jaxpr, const_vals, *flat_args)
        return out

    return converted, consts, takes_rv


def _half_kernel(pair_fn, takes_rv, n_consts, param_names, n_atoms, max_exc,
                 cell_block, capP, sj_used, j_tile, use_excbits,
                 scal_ref, hf_ref, hm_ref, cf_ref, ci_ref,
                 oh_ref, oc_ref):
    """Grid (ncells/cb, SJ/JT). Each program: `cell_block` home cells against
    one J-tile of the half-stencil candidate axis (self cell occupies global
    columns [0, capP), Newton directions after).

    Every (capP, JT) pair tile — r2, mask, u, du/dr — lives in VMEM only; HBM
    sees the staged per-cell features and two compact outputs:
      oh (capP, 8): [fx fy fz e] per home atom, accumulated over J-tiles
          (self columns weighted 1/2, Newton columns weight 1);
      oc (8, SJ):   rows 0-2 = candidate-side reaction sums per J-tile (zero
          for self columns, already both-ordered inside the tile).

    Fast-mask form (use_excbits): exclusions + the self pair collapse to one
    relative-offset bitmask op (ops/tilepair.py convention) instead of the
    per-exclusion-column compare loop. Minimum-image rounding stays per slot
    in BOTH forms: a pre-shift by build-time cell wraps is NOT valid over the
    skin-tolerant bucket-reuse window (an atom crossing the periodic face
    between rebuilds teleports by a box length in wrapped coordinates —
    caught by review r2). Legacy form is used for systems whose excluded
    pairs span more than +-14 atom indices.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        oh_ref[...] = jnp.zeros_like(oh_ref)

    bx = scal_ref[0, 0]
    by = scal_ref[0, 1]
    bz = scal_ref[0, 2]
    rc2 = scal_ref[0, 3]
    box = (bx, by, bz)
    consts = [scal_ref[0, 8 + k] for k in range(n_consts)]
    col = j * j_tile + jax.lax.broadcasted_iota(jnp.int32, (1, j_tile), 1)
    is_self = col < capP
    w_col = jnp.where(is_self, 0.5, 1.0)
    j_col = jnp.where(is_self | (col >= sj_used), 0.0, 1.0)

    for c in range(cell_block):
        r2 = None
        dxs = []
        for k in range(3):
            xi = hf_ref[c, :, k : k + 1]
            xj = cf_ref[c, k : k + 1, :]
            d = xi - xj
            d = d - box[k] * jnp.round(d * (1.0 / box[k]))
            dxs.append(d)
            r2 = d * d if r2 is None else r2 + d * d

        if use_excbits:
            oid_h = hm_ref[c, :, 0:1]
            exc_h = hm_ref[c, :, 1:2]
            oid_c = ci_ref[c, 0:1, :]
            off = jnp.clip(oid_c - oid_h + 16, 0, 31)
            bit = jax.lax.shift_right_logical(
                jnp.broadcast_to(exc_h, off.shape), off
            ) & 1
            # sentinel ids are n (> any real id): the bitmask can't express
            # them, so validity compares stay (minimum image above folds any
            # poisoned coordinate back into range)
            mask = (
                (oid_h < n_atoms) & (oid_c < n_atoms) & (r2 < rc2)
                & (bit == 0)
            )
        else:
            hid = hm_ref[c, :, 0:1]
            cid = ci_ref[c, 0:1, :]
            mask = (
                (hid < n_atoms) & (cid < n_atoms) & (hid != cid)
                & (r2 < rc2)
            )
            for e in range(max_exc):
                mask &= hm_ref[c, :, 1 + e : 2 + e] != cid

        r2m = jnp.where(mask, r2, 1.0)
        pi = {
            name: hf_ref[c, :, 3 + k : 4 + k]
            for k, name in enumerate(param_names)
        }
        pj = {
            name: cf_ref[c, 3 + k : 4 + k, :]
            for k, name in enumerate(param_names)
        }

        def f(s):
            rv = make_rv(s)
            return pair_fn(rv if takes_rv else rv.r, pi, pj, *consts)

        u, dudr2 = jax.jvp(f, (r2m,), (jnp.ones_like(r2m),))
        zero = jnp.zeros_like(r2m)
        e_home = jnp.sum(jnp.where(mask, u, zero) * w_col, axis=1,
                         keepdims=True)
        fmag = jnp.where(mask, 2.0 * dudr2, zero)

        oh_ref[c, :, 3:4] += e_home
        for k in range(3):
            fvec = fmag * dxs[k]
            oh_ref[c, :, k : k + 1] += -jnp.sum(fvec, axis=1, keepdims=True)
            oc_ref[c, k : k + 1, :] = (
                jnp.sum(fvec, axis=0, keepdims=True) * j_col
            )


def stage_and_run_half(
    spec,
    pair_fn,
    x,
    box,
    per_particle: Dict[str, jnp.ndarray],
    bucket,
    r_cut,
    interpret: bool = False,
):
    """Newton half-stencil Pallas path: stage compact bucket-layout features
    (XLA, coarse gathers only), run the VMEM pair kernel over
    spec.nbr_cells_half, then route the candidate-side reaction sums back
    through spec.inv_cells_half (same write-back as the XLA half path in
    ops/neighbors.py::_cell_pair_sums_half). Returns (energy, forces (N, 3)).
    """
    n = x.shape[0]
    ncells, cap = bucket.shape
    capP = _round_up(cap, 8)
    s_half = spec.nbr_cells_half.shape[1]
    names = list(per_particle.keys())
    f_cols = 3 + len(names)
    assert f_cols <= 8, "at most 5 per-particle parameters in the kernel path"
    exc = spec.exclusions
    max_exc = exc.shape[1]
    use_excbits = spec.excbits is not None
    assert use_excbits or 1 + max_exc <= 8, (
        "at most 7 exclusions/atom in the legacy half-kernel path"
    )

    dtype = x.dtype
    cols = [x] + [p[:, None].astype(dtype) for p in per_particle.values()]
    feats = jnp.concatenate(cols, axis=1)
    feats = jnp.concatenate([feats, jnp.zeros((1, f_cols), dtype)])
    feats = jnp.pad(feats, ((0, 0), (0, 8 - f_cols)))
    if use_excbits:
        meta = jnp.stack(
            [jnp.arange(n + 1, dtype=jnp.int32), spec.excbits], axis=1
        )
        meta = jnp.pad(meta, ((0, 0), (0, 8 - 2)))
    else:
        meta = jnp.concatenate(
            [jnp.arange(n + 1, dtype=jnp.int32)[:, None],
             jnp.concatenate([exc, jnp.full((1, max_exc), -1, jnp.int32)])],
            axis=1,
        )
        meta = jnp.pad(meta, ((0, 0), (0, 8 - 1 - max_exc)),
                       constant_values=-1)

    bucket_p = jnp.pad(bucket, ((0, 0), (0, capP - cap)), constant_values=n)
    hf = feats[bucket_p]              # (ncells, capP, 8)
    hm = meta[bucket_p]               # (ncells, capP, 8)

    sj_used = s_half * capP
    # J-tile: big enough to amortize, small enough that ~20 live (capP, JT)
    # f32 tiles stay under the VMEM budget
    j_tile = _fit_j_tile(capP)
    _check_fits(capP, j_tile, "stage_and_run_half")
    sj = _round_up(sj_used, j_tile)
    nbr = spec.nbr_cells_half        # (ncells, S_half), always valid ids
    # candidate staging via the TRANSPOSED layout: the axis swap then moves
    # contiguous capP-rows (cheap) instead of 8-element columns
    hft = hf.transpose(0, 2, 1)      # (ncells, 8, capP)
    cf = hft[nbr]                    # (ncells, S_half, 8, capP)
    ci = hm.transpose(0, 2, 1)[nbr][:, :, :1, :]   # (ncells, S_half, 1, capP)
    cf = cf.transpose(0, 2, 1, 3).reshape(ncells, 8, sj_used)
    ci = ci.transpose(0, 2, 1, 3).reshape(ncells, 1, sj_used)
    cf = jnp.pad(cf, ((0, 0), (0, 0), (0, sj - sj_used)))
    ci = jnp.pad(ci, ((0, 0), (0, 8 - 1), (0, sj - sj_used)),
                 constant_values=n)

    scal = jnp.zeros((1, 8), dtype)
    scal = scal.at[0, :3].set(box.astype(dtype))
    scal = scal.at[0, 3].set(jnp.asarray(r_cut, dtype) ** 2)

    converted, consts, takes_rv = _hoist_consts(
        pair_fn, names, capP, j_tile, dtype
    )
    n_scal = 8 + len(consts)
    scal_full = jnp.zeros((1, _round_up(max(n_scal, 8), 8)), dtype)
    scal_full = scal_full.at[0, :8].set(scal[0, :8])
    for k, c in enumerate(consts):
        scal_full = scal_full.at[0, 8 + k].set(c.astype(dtype))

    # VMEM budget: ~20 live (capP, JT) f32 tiles per home cell
    per_cell = capP * j_tile * 4 * 20
    cell_block = max(1, min(8, _VMEM_TILE_BUDGET // per_cell))
    while ncells % cell_block:
        cell_block -= 1

    kernel = functools.partial(
        _half_kernel, converted, takes_rv, len(consts), tuple(names), n,
        max_exc, cell_block, capP, sj_used, j_tile, use_excbits,
    )
    cb = cell_block
    oh, oc = pl.pallas_call(
        kernel,
        grid=(ncells // cb, sj // j_tile),
        in_specs=[
            pl.BlockSpec(
                (1, scal_full.shape[1]),
                lambda i, j: (0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((cb, capP, 8), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((cb, capP, 8), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((cb, 8, j_tile), lambda i, j: (i, 0, j)),
            pl.BlockSpec((cb, 8, j_tile), lambda i, j: (i, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((cb, capP, 8), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((cb, 8, j_tile), lambda i, j: (i, 0, j)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ncells, capP, 8), dtype),
            jax.ShapeDtypeStruct((ncells, 8, sj), dtype),
        ),
        interpret=interpret,
    )(scal_full, hf, hm, cf, ci)

    energy = jnp.sum(oh[:, :cap, 3])
    # reaction write-back, component-major (no (..., 3)-minor transposes):
    # cell c receives, for direction k, the J-side sums computed by home
    # cell inv[c, k] = c - d_k
    inv = spec.inv_cells_half
    dirs = jnp.arange(s_half)[None, :]
    comps = []
    for k in range(3):
        comp = oc[:, k, :sj_used].reshape(ncells, s_half, capP)
        comps.append(oh[:, :, k] + jnp.sum(comp[inv, dirs], axis=1))
    f_bucket = jnp.stack(comps, axis=-1)[:, :cap]       # (ncells, cap, 3)
    forces = jnp.zeros((n + 1, 3), dtype)
    forces = forces.at[bucket.reshape(-1)].add(f_bucket.reshape(-1, 3))
    return energy, forces[:n]


def stage_and_run(
    spec,
    pair_fn,
    x,
    box,
    per_particle: Dict[str, jnp.ndarray],
    bucket,
    r_cut,
    j_tile: int = 512,
    cell_block: int = 8,
    interpret: bool = False,
):
    """Stage bucket-layout features (XLA, coarse gathers) and run the kernel.

    Returns (energy, forces (N, 3)).
    """
    n = x.shape[0]
    ncells, cap = bucket.shape
    capP = _round_up(cap, 8)
    s = spec.nbr_cells.shape[1]
    names = list(per_particle.keys())
    f_cols = 3 + len(names)
    assert f_cols <= 8, "at most 5 per-particle parameters in the kernel path"
    exc = spec.exclusions
    max_exc = exc.shape[1]
    assert 1 + max_exc <= LANE

    dtype = x.dtype
    # --- stacked per-atom features with a sentinel row at index n
    cols = [x] + [p[:, None].astype(dtype) for p in per_particle.values()]
    feats = jnp.concatenate(cols, axis=1)  # (N, f_cols)
    feats = jnp.concatenate([feats, jnp.zeros((1, f_cols), dtype)])
    meta = jnp.concatenate(
        [jnp.arange(n + 1, dtype=jnp.int32)[:, None],
         jnp.concatenate([exc, jnp.full((1, max_exc), -1, jnp.int32)])],
        axis=1,
    )  # (N+1, 1+M)

    bucket_p = jnp.pad(bucket, ((0, 0), (0, capP - cap)), constant_values=n)

    # home layout: (ncells, capP, LANE)
    hf = feats[bucket_p]  # (ncells, capP, f_cols)
    hf = jnp.pad(hf, ((0, 0), (0, 0), (0, LANE - f_cols)))
    hm = meta[bucket_p]
    hm = jnp.pad(
        hm, ((0, 0), (0, 0), (0, LANE - 1 - max_exc)), constant_values=-1
    )

    # candidate layout: (ncells, F8, SJ)
    f8 = 8
    j_tile = _fit_j_tile(capP, j_tile)
    _check_fits(capP, j_tile, "stage_and_run")
    sj = _round_up(s * capP, j_tile)
    cf_cells = hf[..., :f_cols]  # reuse home gather: (ncells, capP, f_cols)
    ci_cells = hm[..., :1]
    nbr = jnp.where(spec.nbr_cells >= 0, spec.nbr_cells, ncells)
    cf_pad = jnp.concatenate(
        [cf_cells, jnp.zeros((1,) + cf_cells.shape[1:], dtype)]
    )
    ci_pad = jnp.concatenate(
        [ci_cells, jnp.full((1,) + ci_cells.shape[1:], n, jnp.int32)]
    )
    cf = cf_pad[nbr]  # (ncells, S, capP, f_cols)
    ci = ci_pad[nbr]  # (ncells, S, capP, 1)
    cf = cf.transpose(0, 3, 1, 2).reshape(ncells, f_cols, s * capP)
    ci = ci.transpose(0, 3, 1, 2).reshape(ncells, 1, s * capP)
    cf = jnp.pad(cf, ((0, 0), (0, f8 - f_cols), (0, sj - s * capP)))
    ci = jnp.pad(
        ci, ((0, 0), (0, 8 - 1), (0, sj - s * capP)), constant_values=n
    )

    scal = jnp.zeros((1, 8), dtype)
    scal = scal.at[0, :3].set(box.astype(dtype))
    scal = scal.at[0, 3].set(jnp.asarray(r_cut, dtype) ** 2)

    out = cell_pair_kernel_call(
        pair_fn, names, n, max_exc, scal, hf, hm, cf, ci,
        j_tile=j_tile, cell_block=cell_block, interpret=interpret,
    )
    energy = jnp.sum(out[:, :cap, 3])
    f_bucket = out[:, :cap, :3]
    forces = jnp.zeros((n + 1, 3), dtype)
    forces = forces.at[bucket.reshape(-1)].add(f_bucket.reshape(-1, 3))
    return energy, forces[:n]

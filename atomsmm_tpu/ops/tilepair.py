"""Flat tile-pair nonbonded backend (EXPERIMENTAL — not wired into Context).

Both earlier formulations pay multiplicatively for padding: cell buckets pad
home rows AND candidate columns to the max cell occupancy (~1.7x each at
water density), and per-home-row candidate lists (ops/blocks.py) pad every
row to the heavy-tailed max candidate count (max/mean ~2). Measured slot
efficiency of the cell path at 30k water: ~4% of tile slots are real
in-range pairs.

This module uses the NAMD/OpenMM-GPU *tile list* idea, reshaped for the TPU
VPU and Pallas:

  * atoms sort by serpentine cell key (ops/blocks.py::_serpentine_key);
    consecutive B-atom HOME BLOCKS are 100% dense by construction;
  * a FLAT list of block PAIRS (i <= j, periodic AABB gap <= r_build) is
    built device-side at rebuild — flat, so total work scales with the SUM
    of candidate counts (the mean), never NB x K_max;
  * two candidate blocks pack per kernel entry -> every pair tile is a dense
    (B, 2B)=(64, 128) VPU register tile at full lane utilization;
  * one Pallas kernel walks the entry list with ALL features VMEM-resident;
    TPU Pallas grid programs execute sequentially on the core, so home AND
    reaction forces accumulate race-free into two VMEM accumulators
    (row-major for home, transposed for the candidate side) — no scatter,
    no inverse-stencil write-back;
  * per-entry wrap vectors (from AABB centers at build time) replace the
    per-slot minimum-image round: block extents are << box/2, so the center
    image is safe for every in-range pair AT the staged image — positions
    must be staged continuously relative to the build reference (pass xref
    to the evaluators; see _stage);
  * exclusions + self-pairs are ONE relative-offset bitmask op: bit
    (j - i + 16) of a per-atom int32 (requires |i - j| <= 14 for every
    excluded pair — molecules number their atoms contiguously; checked at
    setup); sentinel slots carry poisoned coordinates (r2 >> rcut2), so the
    kernel needs no id-validity compares at all.

Counterpart of OpenMM's CUDA neighbor/tile machinery under atomsmm's forces
(SURVEY.md §2b N2); same NeighborSpec-style contract as ops/neighbors.py
(fixed shapes, overflow flagged never dropped, skin/2 displacement rebuild).

STATUS: measured at 30k water on v5e, this matches the cell path on the near
force (+10%) but loses on the far force and pays a heavy list rebuild, so it
is NOT dispatched by System.with_neighbors/Context (attach a TilePairSpec
there and you get an explicit error) — drive it via build_tile_pairs +
tile_pair_energy_forces directly.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import pytree_dataclass, static_field
from .blocks import _serpentine_key
from .pbc import minimum_image
from .rv import make_rv

EXC_OFF = 16          # exclusion bit for relative offset 0 (self)
EXC_WINDOW = 14       # max |i - j| representable in the exclusion bitmask
POISON = 1.0e4        # sentinel coordinate [nm]


def _keys(name: str):
    prefix = "nbr" if name == "default" else f"nbr_{name}"
    return (
        f"{prefix}_order",     # (NB*B,) int32 sorted atom ids, sentinel n
        f"{prefix}_hb",        # (E,) int32 home block per entry, sentinel NB
        f"{prefix}_cb",        # (E, 2) int32 candidate blocks, sentinel NB
        f"{prefix}_wrap",      # (E, 2, 3) int32 periodic wrap per half
        f"{prefix}_xref",
        f"{prefix}_boxref",
        f"{prefix}_overflow",
    )


@pytree_dataclass
class TilePairSpec:
    """Static-shape flat tile-pair configuration."""

    excbits: jnp.ndarray = None      # (N+1,) int32 relative-offset exclusion bits
    r_build: jnp.ndarray = None      # scalar: cutoff + skin
    skin: jnp.ndarray = None         # scalar
    block_size: int = static_field(default=64)
    n_blocks: int = static_field(default=1)
    max_entries: int = static_field(default=1)   # E
    sort_grid: Tuple[int, int, int] = static_field(default=(8, 8, 8))
    entry_block: int = static_field(default=8)   # entries per kernel program
    multi_image: bool = static_field(default=False)
    interpret: bool = static_field(default=False)

    @property
    def n_padded(self) -> int:
        return self.n_blocks * self.block_size

    @property
    def backend(self) -> str:
        return "tilepair"


def make_exclusion_bits(n: int, exclusions) -> np.ndarray:
    """(N+1,) int32: bit (j - i + EXC_OFF) set for every excluded pair and
    for offset 0 (self). exclusions: (N, M) int32 j-lists padded with -1."""
    exc = np.asarray(exclusions)
    bits = np.full(n + 1, np.int64(1) << EXC_OFF, dtype=np.int64)
    if exc.size:
        ii = np.repeat(np.arange(n), exc.shape[1])
        jj = exc.reshape(-1)
        ok = jj >= 0
        ii, jj = ii[ok], jj[ok]
        d = jj - ii
        if d.size and np.abs(d).max() > EXC_WINDOW:
            raise ValueError(
                f"tilepair backend requires excluded pairs within +-{EXC_WINDOW} "
                f"atom indices (got {np.abs(d).max()}); renumber atoms or use "
                "the cell backend"
            )
        np.bitwise_or.at(bits, ii, np.int64(1) << (d + EXC_OFF))
    return bits.astype(np.int32)


def make_tilepair_spec(
    box,
    n: int,
    r_cut_max: float,
    skin: float = 0.1,
    exclusions=None,
    block_size: int = 64,
    max_entries: int | None = None,
    occupancy_from=None,
    entry_safety: float = 1.25,
    multi_image: bool | None = None,
    interpret: bool = False,
) -> TilePairSpec:
    """Host-side setup. The entry budget E comes from the Minkowski volume of
    a block (exact for cubic blocks) times a fragmentation margin, or — much
    tighter — from a measured configuration (`occupancy_from`).

    multi_image=None auto-selects: small boxes (where one block pair can
    reach through two periodic images) enumerate all 27 image offsets; large
    boxes use the provably-safe per-pair nearest image (cheaper build)."""
    box = np.asarray(box, np.float64)
    r_build = float(r_cut_max) + float(skin)
    nb = -(-n // block_size)
    rho = n / float(np.prod(box))
    side = (block_size / rho) ** (1.0 / 3.0)
    sort_grid = tuple(max(1, int(round(b / side))) for b in box)
    if multi_image is None:
        # block AABBs span up to ~2 sort cells -> ext_sum <= ~4 sides; the
        # runtime `second` flag backstops this heuristic
        multi_image = bool(float(np.min(box)) < 4.0 * side + 2.0 * r_build)
    if exclusions is None:
        exclusions = np.full((n, 1), -1, np.int32)
    if max_entries is None:
        a = side
        vol = (
            a ** 3
            + 6.0 * a * a * r_build
            + 3.0 * math.pi * a * r_build ** 2
            + (4.0 / 3.0) * math.pi * r_build ** 3
        )
        pairs = nb * (vol * rho / block_size) / 2.0
        frag = 1.8
        max_entries = int(math.ceil(pairs / 2.0 * entry_safety * frag)) + nb
    spec = TilePairSpec(
        excbits=jnp.asarray(make_exclusion_bits(n, exclusions)),
        r_build=jnp.asarray(r_build),
        skin=jnp.asarray(float(skin)),
        block_size=block_size,
        n_blocks=nb,
        max_entries=max_entries,
        sort_grid=sort_grid,
        multi_image=multi_image,
        interpret=interpret,
    )
    if occupancy_from is not None:
        spec = retune_tilepair_spec(
            spec, jnp.asarray(occupancy_from), jnp.asarray(box), entry_safety
        )
    return spec


def _block_geometry(spec: TilePairSpec, x, box):
    """(order, ctr, ext, empty) — sorted atom ids + per-block periodic AABBs
    (shared with ops/blocks.py)."""
    from .blocks import sorted_block_aabbs

    return sorted_block_aabbs(
        x, box, spec.sort_grid, spec.block_size, spec.n_blocks, spec.n_padded
    )


def _wrap_set(spec: TilePairSpec):
    """Candidate image offsets. Single-image mode ([None]) uses the per-pair
    nearest-image wrap — valid when no block pair can be in range through two
    images at once (production boxes; checked at build via the safety flag).
    Multi-image mode enumerates all 27 offsets (small boxes — exact whenever
    the global minimum-image convention itself holds, box/2 > r_cut)."""
    if not spec.multi_image:
        return [None]
    out = []
    for wx in (-1, 0, 1):
        for wy in (-1, 0, 1):
            for wz in (-1, 0, 1):
                out.append((wx, wy, wz))
    return out


def _acceptance(spec: TilePairSpec, x, box):
    """(order, keep (NB, NB, W), wvec_single, second): the Newton block-pair
    acceptance tensor over the image-offset set."""
    nb = spec.n_blocks
    order, ctr, ext, empty = _block_geometry(spec, x, box)
    dtype = x.dtype

    ids = jnp.arange(nb, dtype=jnp.int32)
    rb2 = spec.r_build.astype(dtype) ** 2
    ext_sum = ext[:, None, :] + ext[None, :, :]
    dc_raw = ctr[:, None, :] - ctr[None, :, :]
    valid = ~empty[None, :] & ~empty[:, None]

    wraps = _wrap_set(spec)
    nw = len(wraps)
    keeps = []
    wvec_single = None
    for w in wraps:
        if w is None:
            wvec_single = jnp.round(dc_raw / box).astype(jnp.int32)
            d = dc_raw - wvec_single.astype(dtype) * box
            newton = ids[None, :] >= ids[:, None]
        else:
            d = dc_raw - jnp.asarray(w, dtype) * box
            if w >= (0, 0, 0):
                newton = ids[None, :] >= ids[:, None]
            else:
                # lex-negative wraps: the (j, i, -w) twin is lex-positive
                newton = ids[None, :] > ids[:, None]
        gap = jnp.maximum(jnp.abs(d) - ext_sum, 0.0)
        d2 = jnp.sum(gap * gap, axis=-1)
        keeps.append((d2 <= rb2) & newton & valid)
    keep = jnp.stack(keeps, axis=2)                   # (NB, NB, W)

    if not spec.multi_image:
        # single-image safety: some kept pair could also reach through a
        # second image in some dim — rebuild the spec with multi_image=True
        d_min = jnp.abs(dc_raw - jnp.round(dc_raw / box) * box)
        slack = (box - d_min - ext_sum) - spec.r_build.astype(dtype)
        second = jnp.min(
            jnp.where(keep[:, :, 0, None], slack, jnp.asarray(jnp.inf, dtype))
        ) <= 0.0
    else:
        second = jnp.zeros((), bool)
    return order, keep, wvec_single, second


def build_tile_pairs(spec: TilePairSpec, x, box):
    """(order, hb, cb, wrap, overflow): flat Newton block-pair list, two
    candidate blocks packed per entry, grouped by home block. Device-side.

    overflow also encodes the single-image safety violation (a block pair
    that could reach through two images — rebuild with multi_image=True)."""
    nb = spec.n_blocks
    e_max = spec.max_entries
    wraps = _wrap_set(spec)
    nw = len(wraps)
    ids = jnp.arange(nb, dtype=jnp.int32)
    order, keep, wvec_single, second = _acceptance(spec, x, box)

    counts = jnp.sum(keep, axis=(1, 2)).astype(jnp.int32)       # (NB,)
    starts = jnp.cumsum(counts) - counts
    ecounts = (counts + 1) // 2
    estarts = jnp.cumsum(ecounts) - ecounts
    total_entries = jnp.sum(ecounts)
    overflow = (total_entries > e_max) | second

    big = nb * nb * nw
    flat_id = (
        ids[:, None, None] * (nb * nw)
        + ids[None, :, None] * nw
        + jnp.arange(nw, dtype=jnp.int32)[None, None, :]
    )
    key = jnp.where(keep, flat_id, big).reshape(-1)
    skey = jnp.sort(key)                                        # (NB^2 W,)
    live = skey < big
    i_of = jnp.where(live, skey // (nb * nw), nb)
    rem = jnp.where(live, skey % (nb * nw), 0)
    j_of = jnp.where(live, rem // nw, nb)
    w_of = rem % nw

    p = jnp.arange(skey.shape[0], dtype=jnp.int32)
    prow = p - starts[jnp.clip(i_of, 0, nb - 1)]
    ent = jnp.where(
        live, estarts[jnp.clip(i_of, 0, nb - 1)] + prow // 2, e_max
    )
    ent = jnp.where(ent < e_max, ent, e_max)                    # drop overflow
    half = prow % 2

    hb = jnp.full((e_max + 1,), nb, jnp.int32)
    cb = jnp.full((e_max + 1, 2), nb, jnp.int32)
    hb = hb.at[ent].set(jnp.where(live, i_of, nb), mode="drop")
    cb = cb.at[ent, half].set(jnp.where(live, j_of, nb), mode="drop")

    if spec.multi_image:
        wv = jnp.asarray(wraps, jnp.int32)[w_of]                # (NB^2 W, 3)
    else:
        wv = wvec_single.reshape(-1, 3)[jnp.clip(skey, 0, nb * nb - 1)]
    wrap = jnp.zeros((e_max + 1, 2, 3), jnp.int32)
    wrap = wrap.at[ent, half].set(
        jnp.where(live[:, None], wv, 0), mode="drop"
    )
    return order, hb[:e_max], cb[:e_max], wrap[:e_max], overflow


def retune_tilepair_spec(spec: TilePairSpec, x, box, safety: float = 1.25):
    """Measure the real entry count for configuration x and resize E."""
    import dataclasses

    _, keep, _, second = _acceptance(spec, jnp.asarray(x), jnp.asarray(box))
    if bool(second):
        spec = dataclasses.replace(spec, multi_image=True)
        _, keep, _, _ = _acceptance(spec, jnp.asarray(x), jnp.asarray(box))
    counts = jnp.sum(keep, axis=(1, 2)).astype(jnp.int32)
    total = int(jnp.sum((counts + 1) // 2))
    e = int(math.ceil(total * safety)) + 8
    return dataclasses.replace(spec, max_entries=e)


def tilepair_extras(spec, x, box, name: str = "default") -> Dict[str, jnp.ndarray]:
    ko, kh, kc, kw, kx, kbox, kov = _keys(name)
    order, hb, cb, wrap, overflow = build_tile_pairs(spec, x, box)
    return {ko: order, kh: hb, kc: cb, kw: wrap, kx: x, kbox: box,
            kov: overflow}


def needs_rebuild(spec, extra, x, box, name: str = "default"):
    from .neighbors import moved_beyond_half_skin

    _, _, _, _, kx, kbox, _ = _keys(name)
    return moved_beyond_half_skin(spec.skin, extra[kx], extra[kbox], x, box)


def update_tile_pairs(spec, extra, x, box, name: str = "default"):
    ko, kh, kc, kw, kx, kbox, kov = _keys(name)

    def rebuild(_):
        order, hb, cb, wrap, overflow = build_tile_pairs(spec, x, box)
        return order, hb, cb, wrap, x, box, extra[kov] | overflow

    def keep_fn(_):
        return (extra[ko], extra[kh], extra[kc], extra[kw], extra[kx],
                extra[kbox], extra[kov])

    order, hb, cb, wrap, xref, boxref, overflow = jax.lax.cond(
        needs_rebuild(spec, extra, x, box, name), rebuild, keep_fn, None
    )
    return {ko: order, kh: hb, kc: cb, kw: wrap, kx: xref, kbox: boxref,
            kov: overflow}


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------


def _tile_kernel(pair_fn, takes_rv, n_consts, param_names, nb, b, entry_block,
                 hb_ref, cb_ref, wrap_ref, scal_ref,
                 feats_ref, hmeta_ref, featsC_ref, cmeta_ref,
                 oacc_ref, oaccT_ref):
    """Grid (E/EB,). Entry e: home block hb[e] against candidate blocks
    cb[e, 0] and cb[e, 1] as one (B, 2B) pair tile. Sequential grid ->
    race-free accumulation into the two VMEM accumulators."""
    prog = pl.program_id(0)

    @pl.when(prog == 0)
    def _():
        oacc_ref[...] = jnp.zeros_like(oacc_ref)
        oaccT_ref[...] = jnp.zeros_like(oaccT_ref)

    bx = scal_ref[0]
    by = scal_ref[1]
    bz = scal_ref[2]
    rc2 = scal_ref[3]
    box = (bx, by, bz)
    consts = [scal_ref[8 + k] for k in range(n_consts)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * b), 1)
    lo = lane < b

    for t in range(entry_block):
        e = prog * entry_block + t
        hb = hb_ref[e]
        # cb/wrap arrive flattened 1-D (multi-dim SMEM prefetch operands get
        # lane-padded to 128 by Mosaic — 64x memory blowup)
        cb0 = cb_ref[2 * e]
        cb1 = cb_ref[2 * e + 1]

        home_f = feats_ref[hb]                       # (B, 8) f32
        oid_h = hmeta_ref[hb, :, 0:1]                # (B, 1) i32
        exc_h = hmeta_ref[hb, :, 1:2]
        cf0 = featsC_ref[cb0]                        # (8, B)
        cf1 = featsC_ref[cb1]
        cand_f = jnp.concatenate([cf0, cf1], axis=1)  # (8, 2B)
        oid_c = jnp.concatenate(
            [cmeta_ref[cb0, 0:1, :], cmeta_ref[cb1, 0:1, :]], axis=1
        )                                            # (1, 2B) i32

        r2 = None
        dxs = []
        for k in range(3):
            s0 = wrap_ref[6 * e + k].astype(home_f.dtype) * box[k]
            s1 = wrap_ref[6 * e + 3 + k].astype(home_f.dtype) * box[k]
            xj = cand_f[k : k + 1, :] + jnp.where(lo, s0, s1)
            d = home_f[:, k : k + 1] - xj
            dxs.append(d)
            r2 = d * d if r2 is None else r2 + d * d

        # exclusions + self in ONE bitmask op (module docstring)
        off = jnp.clip(oid_c - oid_h + EXC_OFF, 0, 31)
        bit = jax.lax.shift_right_logical(
            jnp.broadcast_to(exc_h, off.shape), off
        ) & 1
        mask = (r2 < rc2) & (bit == 0)

        # Newton weights per lane half: the self tile (same block, zero wrap)
        # carries both orderings (energy x 1/2, no reaction); cross pairs —
        # including a block against its own nonzero periodic image — appear
        # once (full weight + reaction).
        w0z = (wrap_ref[6 * e] == 0) & (wrap_ref[6 * e + 1] == 0) & (
            wrap_ref[6 * e + 2] == 0
        )
        w1z = (wrap_ref[6 * e + 3] == 0) & (wrap_ref[6 * e + 4] == 0) & (
            wrap_ref[6 * e + 5] == 0
        )
        self0 = (cb0 == hb) & w0z
        self1 = (cb1 == hb) & w1z
        w0 = jnp.where(self0, 0.5, 1.0)
        w1 = jnp.where(self1, 0.5, 1.0)
        w_col = jnp.where(lo, w0, w1)
        j0 = jnp.where(self0, 0.0, 1.0)
        j1 = jnp.where(self1, 0.0, 1.0)
        j_col = jnp.where(lo, j0, j1)

        r2m = jnp.where(mask, r2, 1.0)
        pi = {
            name: home_f[:, 3 + k : 4 + k]
            for k, name in enumerate(param_names)
        }
        pj = {
            name: cand_f[3 + k : 4 + k, :]
            for k, name in enumerate(param_names)
        }

        def f(s):
            rv = make_rv(s)
            return pair_fn(rv if takes_rv else rv.r, pi, pj, *consts)

        u, dudr2 = jax.jvp(f, (r2m,), (jnp.ones_like(r2m),))
        zero = jnp.zeros_like(r2m)
        e_row = jnp.sum(jnp.where(mask, u, zero) * w_col, axis=1,
                        keepdims=True)
        fmag = jnp.where(mask, 2.0 * dudr2, zero)

        oacc_ref[hb, :, 3:4] += e_row
        for k in range(3):
            fvec = fmag * dxs[k]
            oacc_ref[hb, :, k : k + 1] += -jnp.sum(fvec, axis=1,
                                                   keepdims=True)
            row = jnp.sum(fvec, axis=0, keepdims=True) * j_col  # (1, 2B)
            oaccT_ref[cb0, k : k + 1, :] += row[:, :b]
            oaccT_ref[cb1, k : k + 1, :] += row[:, b:]


def _stage(spec, x, box, per_particle, excbits, order, xref=None):
    """Feature staging: sorted block-major layouts (row-major for the home
    side, transposed for the candidate side). One gather + one transpose.

    Coordinates must live in the SAME periodic image the tile list was built
    in (the per-entry wrap vectors come from build-time AABB centers).
    Wrapping the *current* positions breaks that whenever an atom crosses a
    box face between rebuilds — it teleports by a box length while its block
    assignment is stale (review r2, confirmed +8.7 kJ/mol / 127 kJ/mol/nm on
    a 0.011 nm face crossing). With `xref` (the build-time reference
    positions) each atom is staged at wrap(xref) + min_image(x - xref):
    continuous across faces, exact for displacements < box/2 (the skin/2
    reuse window is far tighter). xref=None wraps x directly — only valid AT
    the build configuration."""
    n = x.shape[0]
    b = spec.block_size
    nb = spec.n_blocks
    dtype = x.dtype
    names = list(per_particle.keys())
    f_cols = 3 + len(names)
    assert f_cols <= 8, "at most 5 per-particle parameters in the tile path"

    if xref is None:
        xw = x - box * jnp.floor(x * (1.0 / box))
    else:
        xref_w = xref - box * jnp.floor(xref * (1.0 / box))
        xw = xref_w + minimum_image(x - xref, box)
    cols = [xw] + [p[:, None].astype(dtype) for p in per_particle.values()]
    feats = jnp.concatenate(cols, axis=1)
    poison = jnp.zeros((1, f_cols), dtype).at[0, :3].set(POISON)
    feats = jnp.concatenate([feats, poison])
    feats = jnp.pad(feats, ((0, 0), (0, 8 - f_cols)))
    fs = feats[order].reshape(nb, b, 8)
    # sentinel block NB: poison coordinates
    fs = jnp.concatenate([fs, jnp.broadcast_to(feats[-1], (1, b, 8))])
    fsC = fs.transpose(0, 2, 1)                      # (NB+1, 8, B)

    meta = jnp.stack(
        [jnp.concatenate([jnp.arange(n, dtype=jnp.int32),
                          jnp.full((1,), n, jnp.int32)]),
         excbits], axis=1,
    )                                                # (N+1, 2)
    meta = jnp.pad(meta, ((0, 0), (0, 8 - 2)))
    ms = meta[order].reshape(nb, b, 8)
    ms = jnp.concatenate([ms, jnp.broadcast_to(meta[-1], (1, b, 8))])
    msC = ms.transpose(0, 2, 1)
    return fs, ms, fsC, msC, names


def _tile_xla_eval(pair_fn, spec, box, r_cut, fs, ms, fsC, msC, names,
                   order, hb, cb, wrap, n):
    """XLA fallback (CPU reference / f64 goldens): a lax.scan over entries
    applying EXACTLY the kernel's math — same masks, weights, wrap shifts."""
    from .rv import pair_eval

    b = spec.block_size
    nb = spec.n_blocks
    dtype = fs.dtype
    rc2 = jnp.asarray(r_cut, dtype) ** 2
    lane = jnp.arange(2 * b, dtype=jnp.int32)[None, :]
    lo = lane < b

    def body(carry, inp):
        hb_e, cb_e, wrap_e = inp
        home_f = fs[hb_e]                                  # (B, 8)
        oid_h = ms[hb_e, :, 0:1]
        exc_h = ms[hb_e, :, 1:2]
        cand_f = jnp.concatenate([fsC[cb_e[0]], fsC[cb_e[1]]], axis=1)
        oid_c = jnp.concatenate(
            [msC[cb_e[0], 0:1, :], msC[cb_e[1], 0:1, :]], axis=1
        )
        shift = wrap_e.astype(dtype) * box[None, :]        # (2, 3)
        r2 = None
        dxs = []
        for k in range(3):
            xj = cand_f[k : k + 1, :] + jnp.where(
                lo, shift[0, k], shift[1, k]
            )
            d = home_f[:, k : k + 1] - xj
            dxs.append(d)
            r2 = d * d if r2 is None else r2 + d * d
        off = jnp.clip(oid_c - oid_h + EXC_OFF, 0, 31)
        bit = jax.lax.shift_right_logical(
            jnp.broadcast_to(exc_h, off.shape), off
        ) & 1
        mask = (r2 < rc2) & (bit == 0)

        w0z = jnp.all(wrap_e[0] == 0)
        w1z = jnp.all(wrap_e[1] == 0)
        self0 = (cb_e[0] == hb_e) & w0z
        self1 = (cb_e[1] == hb_e) & w1z
        w_col = jnp.where(lo, jnp.where(self0, 0.5, 1.0),
                          jnp.where(self1, 0.5, 1.0))
        j_col = jnp.where(lo, jnp.where(self0, 0.0, 1.0),
                          jnp.where(self1, 0.0, 1.0))

        r2m = jnp.where(mask, r2, 1.0)
        pi = {k: home_f[:, 3 + i : 4 + i] for i, k in enumerate(names)}
        pj = {k: cand_f[3 + i : 4 + i, :] for i, k in enumerate(names)}
        u, dudr2 = pair_eval(pair_fn, r2m, pi, pj, True)
        e = jnp.sum(jnp.where(mask, u, 0.0) * w_col)
        fmag = jnp.where(mask, 2.0 * dudr2, 0.0)
        fvec = fmag[:, :, None] * jnp.stack(dxs, axis=-1)  # (B, 2B, 3)
        f_home = -jnp.sum(fvec, axis=1)                    # (B, 3)
        rows = jnp.sum(fvec, axis=0) * j_col[0, :, None]   # (2B, 3)
        return carry + e, (f_home, rows.reshape(2, b, 3))

    energy, (f_home, f_rows) = jax.lax.scan(
        body, jnp.zeros((), dtype), (hb, cb, wrap)
    )
    facc = jnp.zeros((nb + 1, b, 3), dtype)
    facc = facc.at[hb].add(f_home, mode="drop")
    facc = facc.at[cb[:, 0]].add(f_rows[:, 0], mode="drop")
    facc = facc.at[cb[:, 1]].add(f_rows[:, 1], mode="drop")
    f_sorted = facc[:nb]
    forces = jnp.zeros((n + 1, 3), dtype)
    forces = forces.at[order].add(f_sorted.reshape(-1, 3), mode="drop")
    return energy, forces[:n]


def tile_pair_energy_forces(pair_fn, x, box, per_particle, spec, order, hb,
                            cb, wrap, r_cut, xref=None,
                            interpret: bool | None = None):
    """(energy, forces (N, 3)) over the flat tile-pair list.

    Pass `xref` (the positions the list was built at) whenever x may have
    drifted since the build — see _stage for why."""
    from .pallas_pair import _hoist_consts, _round_up

    n = x.shape[0]
    b = spec.block_size
    nb = spec.n_blocks
    dtype = x.dtype
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if interpret is None and (spec.interpret or not on_tpu):
        # CPU / reference path: identical math as a plain lax.scan (exact in
        # f64 — Mosaic interpret mode cannot run 64-bit)
        fs, ms, fsC, msC, names = _stage(
            spec, x, box, per_particle, spec.excbits, order, xref
        )
        return _tile_xla_eval(
            pair_fn, spec, box, r_cut, fs, ms, fsC, msC, names, order, hb,
            cb, wrap, n,
        )
    interpret = bool(interpret)

    fs, ms, fsC, msC, names = _stage(
        spec, x, box, per_particle, spec.excbits, order, xref
    )

    converted, consts, takes_rv = _hoist_consts(pair_fn, names, b, 2 * b,
                                                dtype)
    n_scal = 8 + len(consts)
    scal = jnp.zeros((_round_up(max(n_scal, 8), 8),), dtype)
    scal = scal.at[:3].set(box.astype(dtype))
    scal = scal.at[3].set(jnp.asarray(r_cut, dtype) ** 2)
    for k, c in enumerate(consts):
        scal = scal.at[8 + k].set(c.astype(dtype))

    eb = spec.entry_block
    e_pad = _round_up(spec.max_entries, eb)
    hb_p = jnp.concatenate([hb, jnp.full((e_pad - hb.shape[0],), nb,
                                         jnp.int32)])
    cb_p = jnp.concatenate([cb, jnp.full((e_pad - cb.shape[0], 2), nb,
                                         jnp.int32)])
    wrap_p = jnp.concatenate(
        [wrap, jnp.zeros((e_pad - wrap.shape[0], 2, 3), jnp.int32)]
    )

    kernel = functools.partial(
        _tile_kernel, converted, takes_rv, len(consts), tuple(names), nb, b,
        eb,
    )
    def whole(shape):
        # full-array VMEM block, constant index map (loaded once, resident
        # across the whole sequential grid)
        return pl.BlockSpec(
            shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,       # hb, cb, wrap, scal
        grid=(e_pad // eb,),
        in_specs=[
            whole((nb + 1, b, 8)),
            whole((nb + 1, b, 8)),
            whole((nb + 1, 8, b)),
            whole((nb + 1, 8, b)),
        ],
        out_specs=(
            whole((nb + 1, b, 8)),
            whole((nb + 1, 8, b)),
        ),
    )
    oacc, oaccT = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb + 1, b, 8), dtype),
            jax.ShapeDtypeStruct((nb + 1, 8, b), dtype),
        ),
        interpret=interpret,
    )(hb_p, cb_p.reshape(-1), wrap_p.reshape(-1), scal, fs, ms, fsC, msC)

    energy = jnp.sum(oacc[:nb, :, 3])
    f_sorted = oacc[:nb, :, :3] + oaccT[:nb, :3, :].transpose(0, 2, 1)
    forces = jnp.zeros((n + 1, 3), dtype)
    forces = forces.at[order].add(f_sorted.reshape(-1, 3), mode="drop")
    return energy, forces[:n]


def tile_pair_energy(pair_fn, x, box, per_particle, spec, order, hb, cb,
                     wrap, r_cut, xref=None):
    e, _ = tile_pair_energy_forces(
        pair_fn, x, box, per_particle, spec, order, hb, cb, wrap, r_cut, xref
    )
    return e

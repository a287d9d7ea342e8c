"""Pallas TPU kernel: the pose-dependent FOV fill as block-slice + matmuls.

The egocentric fill gathers one world-map cell per view pixel at a
pose-dependent rotated/translated location.  XLA lowers that to a scalar
gather (~400 ms for 200 robots x 166k slots, measured with forced fetches —
benchmarks/fill_bench.py).  This kernel exploits the sorted layout's
structure instead:

  * slots are ordered (FOV gate, radial chunk, angle) with connected arcs
    padded to ``fill_window`` boundaries — see PolarStatics.build — so the
    kernel covers just the gated prefix, and any aligned fill window is one
    short arc of a thin ring whose DIAMETER is pose-independent
    (``ps.max_window_diam``).  All its cells fit one small [BM, BN] map
    block whose corner is the window's min cell.
  * the per-robot occupancy decode (id-packed map -> 0/1, raster.py
    encoding) runs ONCE per robot over the whole VMEM-resident map, into
    int8 copies lane-shifted by 32 so block corners need only 32-lane
    alignment (BN collapses to one 128-lane tile when the span allows).
  * within the block, "gather" is a one-hot int8 MXU contraction over the
    columns plus a masked cross-sublane reduce over the rows:
        tmp[m, f] = sum_n block[m, n] * (n == b_f)     # [BM, FW] matmul
        out[f]    = sum_m (m == a_f) * tmp[m, f]       # sublane reduce

All coordinate math and block corners for a step's windows run as one
[WIN_PER_STEP, FW] tensor pass; per robot the windows cost a few hundred
MXU tile-passes instead of ~400 ms of scalar gathers.

Out-of-map view pixels produce garbage block reads; the caller masks them
with the (cheap, vectorized) inside test, exactly as the XLA path does.
Reference semantics: agent.cpp:356-404 (view fill), img_env.cpp:620-629
(other-robots-only presence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_dims(ps, res: float):
    """(BM, BN, n_copies) covering any fill window at map resolution ``res``.

    The row corner aligns down to 8 sublanes and the map pads to (8, 128)
    multiples, so alignment never pushes in-map offsets out of the block
    (see fill_values_pallas).  When the span fits 128 lanes minus a 32-lane
    alignment slack, the kernel keeps FOUR lane-shifted copies of the
    decoded map, so the column corner aligns to 32 and BN collapses to one
    128-lane tile — half the MXU tile-passes of BN=256.
    """
    span = int(np.ceil(ps.max_window_diam / res)) + 2
    bm = (span + 8 + 7) // 8 * 8
    if span <= 96:
        return bm, 128, 4
    bn = (span + 128 + 127) // 128 * 128
    return bm, bn, 1


WIN_PER_STEP = 64   # fill windows per grid step (8-sublane-aligned
                    # blocks).  8 -> 64 swept in round 5 on the stable
                    # scan-mode bench: 15.37 -> 14.94 (16) -> 14.63 (32)
                    # -> 14.55 ms (64) — more independent dots in the
                    # phase-ordered straight-line body pipeline at issue
                    # rate; multi-scene 4x50 17.5 -> 16.7 ms.  Parity
                    # suite bit-green at 64 (tests/test_pallas_fill.py,
                    # test_fullres_parity, test_multiscene_flat).


def _fill_kernel(pose_ref, pixx_ref, pixy_ref, map_ref, out_ref,
                 occ_ref, *,
                 res: float, h: int, w: int, fw: int, bm: int, bn: int,
                 n_copies: int, nps: int):
    r = pl.program_id(0)
    c = pose_ref[r * 5 + 0]
    s = pose_ref[r * 5 + 1]
    px = pose_ref[r * 5 + 2]
    py = pose_ref[r * 5 + 3]
    shift = 128 // n_copies

    # Once per robot: occupancy decode over the whole map (raster.py
    # packing): occupied = static|ped, or >=2 robots, or 1 robot that is
    # not me.  The map travels as int16 (id <= 4095) to halve VMEM.
    # Copy cp holds the decode shifted LEFT by shift*cp lanes, so block
    # corners only need 32-lane alignment when n_copies == 4.
    # Multi-scene: the map BlockSpec selects scene r // nps; robot ids in
    # the packed map are per-scene, carried explicitly in the pose row
    # (heterogeneous sensor groups run each group's robots as a separate
    # flat batch, so r is not the in-scene robot id).
    @pl.when(pl.program_id(1) == 0)
    def _decode():
        v = map_ref[0, :, :].astype(jnp.int32)
        rid = pose_ref[r * 5 + 4].astype(jnp.int32)
        occ = ((v & 1) > 0) | (((v >> 1) & 3) >= 2) | \
              ((((v >> 1) & 3) == 1) & ((v >> 3) != rid))
        occ8 = occ.astype(jnp.int8)
        occ_ref[0, :, :] = occ8
        for cp in range(1, n_copies):
            occ_ref[cp, :, : w - shift * cp] = occ8[:, shift * cp:]
            occ_ref[cp, :, w - shift * cp:] = jnp.zeros(
                (h, shift * cp), jnp.int8)

    # Coordinate math for ALL windows of the step at once: [WPS, FW] tensors
    # use full (8, 128) vregs instead of WPS serial [FW]-vector chains, and
    # the per-window corner mins become one axis-reduce.
    bx = pixx_ref[:, :]                                       # [WPS, FW]
    by = pixy_ref[:, :]
    wx = c * bx - s * by + px
    wy = s * bx + c * by + py
    # round-half-away (grid_map.cpp:40-44)
    fm = wx / res
    fn = wy / res
    cm = jnp.where(fm >= 0, jnp.floor(fm + 0.5), jnp.ceil(fm - 0.5)).astype(jnp.int32)
    cn = jnp.where(fn >= 0, jnp.floor(fn + 0.5), jnp.ceil(fn - 0.5)).astype(jnp.int32)
    # block corners from VALID (non-dead) pixels only: dead slots carry
    # coords ~1e6 that would poison the min.  Aligned down (Mosaic needs
    # tile-aligned dynamic slices); in-map cells keep in-block offsets
    # because bm/bn include the span + alignment slack.
    valid = bx < 1e5
    big = jnp.int32(2 ** 30)
    m0s = (jnp.clip(jnp.min(jnp.where(valid, cm, big), axis=1),
                    0, h - bm) // 8) * 8                      # [WPS]
    # column corner at ``shift`` granularity; copy index recovers the
    # 128-aligned position within the shifted map copy
    n0s = (jnp.clip(jnp.min(jnp.where(valid, cn, big), axis=1),
                    0, w - bn) // shift) * shift
    cps = (n0s // shift) % n_copies                           # [WPS]
    cols = n0s - shift * cps                                  # 128-aligned
    a_all = jnp.clip(cm - m0s[:, None], 0, bm - 1)            # [WPS, FW]
    b_all = jnp.clip(cn - n0s[:, None], 0, bn - 1)

    subT = jax.lax.broadcasted_iota(jnp.int32, (bm, fw), 0)
    laneT = jax.lax.broadcasted_iota(jnp.int32, (bn, fw), 0)

    # Phase-ordered straight-line code: all block loads, then all one-hot
    # builds, then all MXU contractions back-to-back (independent dots
    # pipeline at issue rate instead of serializing at latency), then the
    # selects/stores.
    blocks = [
        occ_ref[cps[k],
                pl.ds(pl.multiple_of(m0s[k], 8), bm),
                pl.ds(pl.multiple_of(cols[k], 128), bn)]      # [BM, BN] i8
        for k in range(WIN_PER_STEP)
    ]
    one_bs = [
        (laneT == b_all[k][None, :]).astype(jnp.int8)         # [BN, FW]
        for k in range(WIN_PER_STEP)
    ]
    # transposed gather: tmp[m, f] = block[m, b_f] via one MXU contraction
    # over BN, then a masked SUBLANE reduce over BM picks row a_f
    # (cross-sublane sums are much cheaper than cross-lane).
    tmps = [
        jax.lax.dot_general(
            blocks[k], one_bs[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                     # [BM, FW]
        for k in range(WIN_PER_STEP)
    ]
    for k in range(WIN_PER_STEP):
        sel = jnp.where(subT == a_all[k][None, :], tmps[k], 0)
        vals = jnp.sum(sel, axis=0)                           # [FW]
        out_ref[k, :] = (vals > 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("res", "fw", "bm", "bn",
                                             "n_copies", "nps", "interpret"))
def fill_values_pallas(packed_map_i16, poses, pix_x, pix_y, *,
                       res: float, fw: int, bm: int, bn: int,
                       n_copies: int = 1, nps: int = 0,
                       rids=None, interpret: bool = False):
    """[N, len(pix_x)] 0/1 occupancy (self excluded) at the given pixels.

    packed_map_i16: [S, H, W] int16 id-packed map(s) (prepare_map: H
    multiple of 8, W multiple of 128, H >= bm, W >= bn).  poses: [N, 3] —
    scene-major when S > 1; robot i reads map i // nps (``nps`` robots per
    scene, default all of them).  pix_x/pix_y: [n_fill] f32 base-frame
    pixel coords — the GATED slot prefix of the (gated, chunk, angle)
    sorted layout, connected arcs padded to ``fw`` slots
    (PolarStatics.build fill_window).  Out-of-map and dead-padding pixels
    are garbage — callers apply the inside mask.
    """
    if packed_map_i16.ndim == 2:
        packed_map_i16 = packed_map_i16[None]
    _, h, w = packed_map_i16.shape
    n = poses.shape[0]
    nps = nps or n
    if rids is None:
        # in-scene robot ids 1..nps (scene-major flat order)
        rids = jnp.tile(jnp.arange(1, nps + 1, dtype=jnp.int32),
                        n // nps if nps else 1)
    p0 = pix_x.shape[0]
    pad = (-p0) % (fw * WIN_PER_STEP)
    if pad:
        pix_x = jnp.concatenate([pix_x, jnp.full((pad,), 1e6, pix_x.dtype)])
        pix_y = jnp.concatenate([pix_y, jnp.full((pad,), 1e6, pix_y.dtype)])
    p = p0 + pad
    windows = p // fw
    steps = windows // WIN_PER_STEP
    pose_flat = jnp.stack(
        [jnp.cos(poses[:, 2]), jnp.sin(poses[:, 2]),
         poses[:, 0], poses[:, 1],
         rids.astype(jnp.float32)], axis=-1).astype(jnp.float32).reshape(-1)
    pixx2 = pix_x.reshape(windows, fw).astype(jnp.float32)
    pixy2 = pix_y.reshape(windows, fw).astype(jnp.float32)

    kern = functools.partial(_fill_kernel, res=res, h=h, w=w, fw=fw,
                             bm=bm, bn=bn, n_copies=n_copies, nps=nps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, steps),
        in_specs=[
            pl.BlockSpec((WIN_PER_STEP, fw), lambda i, j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WIN_PER_STEP, fw), lambda i, j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, j, *_: (i // nps, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((WIN_PER_STEP, fw),
                               lambda i, j, *_: (i * steps + j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_copies, h, w), jnp.int8)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n * windows, fw), jnp.int32),
        interpret=interpret,
    )(pose_flat, pixx2, pixy2, packed_map_i16)
    return out.reshape(n, p)[:, :p0]


def prepare_map(packed_map_i32, bm: int, bn: int) -> jnp.ndarray:
    """Pad the id-packed map(s) to kernel-friendly int16 [H8 >= bm, W128 >= bn].

    Accepts [H, W] or a scene-batched [S, H, W].  Only the fill-relevant
    low 15 bits (occupancy, count, id) survive the int16 narrowing; the
    collision-category bits 15..17 are masked off.
    """
    h, w = packed_map_i32.shape[-2:]
    lead = packed_map_i32.shape[:-2]
    h2 = max((h + 7) // 8 * 8, bm)
    w2 = max((w + 127) // 128 * 128, bn)
    out = jnp.zeros(lead + (h2, w2), jnp.int16)
    return out.at[..., :h, :w].set(
        (packed_map_i32 & 0x7FFF).astype(jnp.int16))


def fill_sorted_pallas(ps, packed_map, resolution, poses, t=None,
                       rids=None, interpret=False):
    """Drop-in for ops/polar.fill_sorted using the Pallas matmul kernel.

    Returns [N, P'] boolean GATED occupancy (self excluded): equal to
    ``polar.fill_sorted(...) & ps.gates_sorted`` up to f32-vs-f64 coordinate
    rounding at cell borders.  Every consumer (raycast/shadow/plain) reads
    occupancy through the gates, so the gating is free information.

    Multi-scene: packed_map may be [S, H, W] with poses [S*N, 3] flat in
    scene-major order — robot i reads map i // (N per scene); this keeps
    all S scenes in ONE kernel grid (no per-scene robot-chunk padding).
    """
    from img_env_tpu.ops.raster import round_half_away

    h, w = packed_map.shape[-2:]
    n = poses.shape[0]
    nps = n // packed_map.shape[0] if packed_map.ndim == 3 else n
    # the id-packed int16 map carries robot ids <= 4095.  Explicit rids
    # (heterogeneous sensor groups) can exceed the GROUP size but are
    # traced here; the global bound is enforced statically at statics
    # build time (nav_env.build_statics).
    if rids is None and nps >= 4096:
        raise ValueError("id-packed int16 map supports at most 4095 robots")
    bm, bn, n_copies = _block_dims(ps, float(resolution))
    bx = (t.pix_x if t is not None else jnp.asarray(ps.pix_x_sorted)).astype(jnp.float32)
    by = (t.pix_y if t is not None else jnp.asarray(ps.pix_y_sorted)).astype(jnp.float32)
    nf = int(ps.n_fill_slots)
    big = prepare_map(packed_map, bm, bn)
    occ = fill_values_pallas(big, poses.astype(jnp.float32),
                             bx[:nf], by[:nf],
                             res=float(resolution), fw=int(ps.fill_window),
                             bm=bm, bn=bn, n_copies=n_copies, nps=nps,
                             rids=rids, interpret=interpret)

    def inside_mask(pose):
        c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
        wx = c * bx[:nf] - s * by[:nf] + pose[0]
        wy = s * bx[:nf] + c * by[:nf] + pose[1]
        cm = round_half_away(wx / resolution).astype(jnp.int32)
        cn = round_half_away(wy / resolution).astype(jnp.int32)
        return (cm >= 0) & (cm < h) & (cn >= 0) & (cn < w)

    inside = jax.vmap(inside_mask)(poses.astype(jnp.float32))
    prefix = (occ > 0) & inside
    # ungated suffix: occupancy is never read through the gates — zero
    return jnp.concatenate(
        [prefix,
         jnp.zeros((n, ps.n_slots - nf), bool)], axis=1)

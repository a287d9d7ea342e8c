"""Pallas TPU kernel: robot footprint rasterization as block one-hot dots.

``raster.build_layers`` scatters ~N x 1000 footprint points with
``.at[].add``/``.at[].max`` — XLA serializes those (~10 ms at 200 robots,
profiled).  This kernel rasterizes each robot's footprint as ONE small
block instead:

  * the robot's cells fit a [40, 128] block (diameter <= ~0.5 m at
    1.5 cm cells; asserted);  its per-cell POINT COUNT is an int8 one-hot
    MXU contraction  count[a, b] = sum_p (a == row_p)(b == col_p),
    and presence = count > 0 reproduces ``scatter_presence``'s per-agent
    dedup exactly;
  * presence accumulates into a VMEM-resident map as a single int32
    ``(id_sum << 12) | robot_count`` — the decode only consults the id
    when count == 1, where the sum IS the id (raster.py's packed decode,
    collision_codes and the fill's self-exclusion all follow that rule);
  * column corners align DOWN to 128 lanes and the block is 256 wide
    (alignment loss <= 127 + footprint span fits), so a single VMEM
    accumulator map suffices — four 32-lane-shifted copies would OOM
    VMEM on large maps (21 MB at 1067^2 cells, measured);
  * the grid is sequential over robots (single TPU core), so the
    read-modify-write accumulation has no races.

Out-of-map points never match a one-hot row/column, reproducing the
reference's is_in_map drop.  Bit-equal to the XLA scatters (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 40          # block rows (8-aligned corner + <=32-cell footprint span)
BC = 256         # block cols (128-aligned corner: loss <=127 + span)


def _raster_kernel(scalars_ref, cells_ref, out_ref, *, n: int,
                   h8: int, w128: int, p: int):
    # out_ref is the accumulator: its block index is constant, so it stays
    # VMEM-resident across the whole (sequential) robot grid and flushes
    # once at the end.
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _init():
        out_ref[...] = jnp.zeros((h8, w128), jnp.int32)

    r0 = scalars_ref[0, r]
    c0 = scalars_ref[1, r]          # 128-aligned column corner

    rows = cells_ref[0, :, 0] - r0                     # [P]
    cols = cells_ref[0, :, 1] - c0
    ia = jax.lax.broadcasted_iota(jnp.int32, (BR, p), 0)
    ib = jax.lax.broadcasted_iota(jnp.int32, (p, BC), 1)
    one_a = (ia == rows[None, :]).astype(jnp.int8)     # [BR, P]
    one_b = (ib == cols[:, None]).astype(jnp.int8)     # [P, BC]
    cnt = jax.lax.dot_general(
        one_a, one_b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # [BR, BC] point count
    contrib = jnp.where(cnt > 0, ((r + 1) << 12) | 1, 0)

    blk = out_ref[pl.ds(pl.multiple_of(r0, 8), BR),
                  pl.ds(pl.multiple_of(c0, 128), BC)]
    out_ref[pl.ds(pl.multiple_of(r0, 8), BR),
            pl.ds(pl.multiple_of(c0, 128), BC)] = blk + contrib


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def robot_maps_pallas(cells, valid, *, h: int, w: int,
                      interpret: bool = False):
    """(robot_count [H,W] i32, robot_id_sum [H,W] i32) from footprints.

    cells: [N, P, 2] int32 world cells; valid: [N, P].  robot_id_sum equals
    1 + robot index wherever robot_count == 1 (the only case decodes use).
    """
    n, p2, _ = cells.shape
    p = (p2 + 127) // 128 * 128
    h8 = max((h + 7) // 8 * 8, BR)
    w128 = max((w + 127) // 128 * 128 + 128, BC)
    big = jnp.int32(1 << 20)
    cm = jnp.where(valid, cells[..., 0], big)
    cn = jnp.where(valid, cells[..., 1], big)
    if p != p2:
        padc = jnp.full((n, p - p2), big, jnp.int32)
        cm = jnp.concatenate([cm, padc], axis=1)
        cn = jnp.concatenate([cn, padc], axis=1)

    r0 = jnp.clip(jnp.min(cm, axis=1), 0, h8 - BR) // 8 * 8        # [N]
    c0 = jnp.clip(jnp.min(cn, axis=1), 0, w128 - BC) // 128 * 128
    scalars = jnp.stack([r0, c0]).astype(jnp.int32)                # [2, N]
    cells_p = jnp.stack([cm, cn], axis=-1)                         # [N, P, 2]

    kern = functools.partial(_raster_kernel, n=n, h8=h8, w128=w128, p=p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, p, 2), lambda r, s: (r, 0, 0))],
        out_specs=pl.BlockSpec((h8, w128), lambda r, s: (0, 0)),
    )
    total = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h8, w128), jnp.int32),
        interpret=interpret,
    )(scalars, cells_p)

    count = total & 0xFFF
    id_sum = total >> 12
    return count[:h, :w], id_sum[:h, :w]


def max_footprint_span(robot_points, resolution: float) -> int:
    """Conservative per-robot footprint span in cells (for the BR/BC check)."""
    pts = np.asarray(robot_points)
    if pts.size == 0:
        return 0
    span_m = max(
        float(pts[..., 0].max() - pts[..., 0].min()),
        float(pts[..., 1].max() - pts[..., 1].min()),
    )
    return int(np.ceil(span_m / resolution)) + 2

"""Pallas TPU kernel: 3-channel pedestrian map as a sequential overwrite.

The reference draws each range-sorted pedestrian's disc into the 48x48 ped
map in order, later (farther) peds overwriting earlier pixels
(yaml_env.py:392-458).  The XLA formulation needs a full [N, M] argsort, a
max-index decode over a [N, M, H, W] cover tensor and winner gathers —
~19-30 ms at N = M = 200 however it is laid out.

This kernel needs NO sort: "last sorted writer" is exactly the
lexicographic max of (range^2, original index) over the covering peds
(jnp.argsort is stable, so equal ranges keep original order).  One grid
step per robot loops the peds with register-resident accumulators
(best range^2, vx, vy) over a [psub, 128] pixel tile (48*48 = 2304 = 18
rows of 128 lanes — no padding), updating wherever the ped covers with
range^2 >= the incumbent (>= makes the later index win ties).

Exactness: the scalars are the UNTRANSFORMED base-frame coords (px, py),
and every derived quantity (window center -px+3, range^2, the floor-div
index bounds of observe.pixel_cover_bounds_exact, the circle test) is
computed with the identical f32 formula and operand order as the XLA path
— on-device outputs bit-match observe.ped_vectors_and_map's map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pedmap_kernel(sc_ref, out_ref, *, m: int, r2c: float, res: float,
                   r_img: float, half: float, hs: int, psub: int):
    r = pl.program_id(0)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (psub, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (psub, LANES), 1))
    h = flat // hs
    w = flat % hs
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    xc = (hf + 0.5) * res
    yc = (wf + 0.5) * res
    valid_pix = flat < hs * hs

    base = r * m * 4

    def body(i, accs):
        best, avx, avy = accs
        px = sc_ref[base + 4 * i + 0]
        py = sc_ref[base + 4 * i + 1]
        vxs = sc_ref[base + 4 * i + 2]
        vys = sc_ref[base + 4 * i + 3]
        rsq = px * px + py * py               # == XLA range_sq, same f32 ops
        in_w = ((px <= half) & (px >= -half)
                & (py <= half) & (py >= -half))
        tx = jnp.where(in_w, -px + half, jnp.float32(1e9))
        ty = -py + half
        lox = jnp.floor((tx - r_img) / res)   # pixel_cover_bounds_exact
        hix = jnp.floor((tx + r_img) / res)
        loy = jnp.floor((ty - r_img) / res)
        hiy = jnp.floor((ty + r_img) / res)
        dx = xc - tx
        dy = yc - ty
        cov = ((dx * dx + dy * dy < r2c)
               & (hf >= lox) & (hf < hix)
               & (wf >= loy) & (wf < hiy))
        # later sorted writer == lex-max (range^2, index): ascending index
        # loop + '>=' makes the later original index win range ties
        upd = cov & (rsq >= best)
        return (jnp.where(upd, rsq, best),
                jnp.where(upd, vxs, avx),
                jnp.where(upd, vys, avy))

    zeros = jnp.zeros((psub, LANES), jnp.float32)
    best, avx, avy = jax.lax.fori_loop(
        0, m, body, (jnp.full((psub, LANES), -1.0, jnp.float32),
                     zeros, zeros))
    occ = (best >= 0.0) & valid_pix
    out_ref[0, :psub] = occ.astype(jnp.float32)
    out_ref[0, psub:2 * psub] = jnp.where(occ, avx, 0.0)
    out_ref[0, 2 * psub:] = jnp.where(occ, avy, 0.0)


@functools.partial(jax.jit, static_argnames=("res", "ped_image_r", "half",
                                             "image_size", "interpret"))
def ped_map_pallas(px, py, vx, vy, *, res: float, ped_image_r: float,
                   image_size: int, half: float = 3.0,
                   interpret: bool = False):
    """[N, 3, hs, hs] ped map (occupancy, vx, vy), reference overwrite order.

    px/py/vx/vy: [N, M] UNSORTED base-frame ped positions/velocities
    (observe.peds_in_base outputs) — the winner rule needs no sort.
    """
    n, m = px.shape
    hs = image_size
    psub = (hs * hs + LANES - 1) // LANES
    f32 = jnp.float32
    sc = jnp.stack([px.astype(f32), py.astype(f32),
                    vx.astype(f32), vy.astype(f32)],
                   axis=-1).reshape(-1)      # [N*M*4] scalar prefetch (SMEM)

    kern = functools.partial(_pedmap_kernel, m=m,
                             r2c=float(ped_image_r) ** 2, res=float(res),
                             r_img=float(ped_image_r), half=float(half),
                             hs=hs, psub=psub)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[],
        out_specs=pl.BlockSpec((1, 3 * psub, LANES), lambda i, s: (i, 0, 0)),
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 3 * psub, LANES), jnp.float32),
        interpret=interpret,
    )(sc)
    out = out.reshape(n, 3, psub * LANES)[:, :, : hs * hs]
    return out.reshape(n, 3, hs, hs)

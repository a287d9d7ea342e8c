"""Pallas TPU kernel: the exact laser-map painter decode.

The XLA version (ops/painter.paint_sorted) re-streams ~10 MB of static
window tables from HBM for every robot and keeps [N, nb, W, BM] int16
intermediates in flight (~17 ms/step at 200 robots).  This kernel walks the
same tables once per ROBOT-CHUNK instead:

  * grid = (robot-chunk, block) with the chunk OUTER: the chunk's per-beam
    thresholds (s_hit / s_tail rows, [R_pad, 8] int32) load once per outer
    iteration; the block tables stream once per chunk (~10 MB x N/8);
  * the block's window rows slice the threshold arrays at the 16-aligned
    ``rbase`` (PainterStatics.build guarantees the alignment);
  * per robot: a tiny one-hot MXU dot broadcasts its threshold column
    across the 128 slot lanes, then ONE [W, BM] integer pass (codes + key)
    and a cross-sublane max pick the highest-index writing beam and its
    value — the painter semantics of agent.cpp:511-624;
  * one pallas_call per window-width class, all writing into ONE aliased
    accumulator initialized to 200 (the laser canvas) — constant-200
    regions and the dense near-sensor "wide" slots stay on the XLA path.

Bit-identical to paint_sorted (same tables, integer arithmetic).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from img_env_tpu.constants import CELL_UNSEEN, CELL_VIEW_FREE
from img_env_tpu.ops.painter import PainterStatics, _BM

NR = 32  # robots per grid step (fewer grid steps -> less per-step overhead)


_LANES = 2 * _BM   # two neighbouring 64-slot blocks per 128-lane pass


class PaintClass(NamedTuple):
    w: int
    sstep: np.ndarray      # [npair, W, 128] int16 (two blocks side by side)
    scalars: np.ndarray    # [3, npair] int32: rbase A, rbase B, out row


class PaintKernelStatics(NamedTuple):
    classes: Tuple[PaintClass, ...]
    r_pad: int
    n_slots: int

    @staticmethod
    def build(pst: PainterStatics) -> "PaintKernelStatics":
        by_w = {}
        r_pad = 128
        for reg in pst.regions:
            if reg.W == 0:
                continue
            by_w.setdefault(reg.W, []).append(reg)
            r_pad = max(r_pad, int(np.max(reg.rbase) + reg.W))
        r_pad = (r_pad + 127) // 128 * 128
        classes = []
        for w in sorted(by_w):
            ss, ra, rb, ob = [], [], [], []
            for reg in by_w[w]:
                assert reg.nb % 2 == 0 and reg.lo % _LANES == 0
                # pair neighbouring 64-slot blocks side by side
                ss.append(np.concatenate(
                    [reg.sstep[0::2], reg.sstep[1::2]], axis=2))
                ra.append(reg.rbase[0::2])
                rb.append(reg.rbase[1::2])
                ob.append(np.arange(reg.nb // 2, dtype=np.int64)
                          + reg.lo // _LANES)
            classes.append(PaintClass(
                w=int(w), sstep=np.concatenate(ss, axis=0),
                scalars=np.stack([
                    np.concatenate(ra), np.concatenate(rb),
                    np.concatenate(ob)]).astype(np.int32)))
        return PaintKernelStatics(
            classes=tuple(classes), r_pad=int(r_pad), n_slots=pst.n_slots)


def _paint_kernel(scalars_ref, acc_ref, tbl_ref, sh_ref, st_ref, out_ref, *,
                  w: int):
    b = pl.program_id(1)
    rb_a = scalars_ref[0, b]          # window start, lanes [0, 64)
    rb_b = scalars_ref[1, b]          # window start, lanes [64, 128)
    T = tbl_ref[0]                    # [W, 128] i16 (two blocks side by side)
    sh_a = sh_ref[0, pl.ds(pl.multiple_of(rb_a, 8), w), :]   # [W, NR] i32
    st_a = st_ref[0, pl.ds(pl.multiple_of(rb_a, 8), w), :]
    sh_b = sh_ref[0, pl.ds(pl.multiple_of(rb_b, 8), w), :]
    st_b = st_ref[0, pl.ds(pl.multiple_of(rb_b, 8), w), :]
    T32 = T.astype(jnp.int32)
    vis32 = T32 > 0
    wkey = jax.lax.broadcasted_iota(jnp.int32, (w, _LANES), 0) << 2
    half_a = jax.lax.broadcasted_iota(jnp.int32, (w, _LANES), 1) < _BM

    # Unrolled robot loop, all-int32: int16 vector ops crash the Mosaic
    # compile helper, a fori_loop serializes 2.3x slower, and NR=64
    # unrolled emits a 12 MB module the helper rejects -- measured.
    for k in range(NR):
        # lane-broadcast robot k's thresholds (static lane slice + splat):
        # lanes < 64 read window A, lanes >= 64 window B.  Replaces the
        # earlier one-hot f32 MXU dots, whose K=32 contractions dominated
        # the kernel (the quarter-block dead end measured the same cost).
        sh = jnp.where(
            half_a,
            jnp.broadcast_to(sh_a[:, k:k + 1], (w, _LANES)),
            jnp.broadcast_to(sh_b[:, k:k + 1], (w, _LANES)))
        st = jnp.where(
            half_a,
            jnp.broadcast_to(st_a[:, k:k + 1], (w, _LANES)),
            jnp.broadcast_to(st_b[:, k:k + 1], (w, _LANES)))
        code = jnp.where(
            T32 <= sh, 2,
            jnp.where(T32 == sh + 1, 3, jnp.where(T32 > st, 1, 0)))
        key = jnp.where(vis32 & (code > 0), wkey | code, -1)
        win = jnp.max(key, axis=0)                           # [128]
        c = win & 3
        val = jnp.where(
            win < 0, float(CELL_UNSEEN),
            jnp.where(c == 2, float(CELL_VIEW_FREE),
                      jnp.where(c == 3, 0.0, float(CELL_UNSEEN))))
        out_ref[0, k, :] = val.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def _paint_class(scalars, acc, tbl, sh3, st3, *, w: int,
                 interpret: bool = False):
    """acc: [Np, NBTOT, BM] f32 (donated/aliased); tbl: [nbc, W, BM] i16;
    sh3/st3: [Np//NR, R_pad, NR] i32.  Writes this class's blocks."""
    nbc = tbl.shape[0]
    steps = sh3.shape[0]
    r_pad = sh3.shape[1]

    kern = functools.partial(_paint_kernel, w=w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps, nbc),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # acc (aliased)
            pl.BlockSpec((1, w, _LANES), lambda nc, b, s: (b, 0, 0)),
            pl.BlockSpec((1, r_pad, NR), lambda nc, b, s: (nc, 0, 0)),
            pl.BlockSpec((1, r_pad, NR), lambda nc, b, s: (nc, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, NR, _LANES), lambda nc, b, s: (s[2, b], nc, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.float32),
        input_output_aliases={1: 0},      # acc (first operand after scalars)
        interpret=interpret,
    )(scalars, acc, tbl, sh3, st3)


def make_paint_tables(ks: PaintKernelStatics, device_put=True):
    put = jax.device_put if device_put else jnp.asarray
    return tuple((put(jnp.asarray(cl.sstep)), put(jnp.asarray(cl.scalars)))
                 for cl in ks.classes)


def paint_sorted_pallas(pst: PainterStatics, ks: PaintKernelStatics,
                        s_hit, s_tail, tables=None,
                        interpret: bool = False):
    """Exact painter values [N, P'] f32 via the Pallas kernel.

    s_hit/s_tail: [N, R] int (painter.hit_steps).  tables: device (tbl,
    scalars) pairs from make_paint_tables.  The wide near-sensor slots are
    overlaid on the XLA path (few slots).
    """
    n, r = s_hit.shape
    n_pad = (n + NR - 1) // NR * NR
    steps = n_pad // NR
    big = jnp.int32(2 ** 14)

    def prep(x):
        xt = jnp.full((ks.r_pad, n_pad), big, jnp.int32)
        xt = xt.at[:r, :n].set(x.T.astype(jnp.int32))
        # [R_pad, Np] -> [steps, R_pad, NR]
        return xt.reshape(ks.r_pad, steps, NR).transpose(1, 0, 2)

    sh3 = prep(s_hit)
    st3 = prep(s_tail)

    nb_total = ks.n_slots // _LANES
    acc = jnp.full((nb_total, n_pad, _LANES), float(CELL_UNSEEN),
                   jnp.float32)
    for ci, cl in enumerate(ks.classes):
        tbl, scalars = (tables[ci] if tables is not None
                        else (jnp.asarray(cl.sstep), jnp.asarray(cl.scalars)))
        acc = _paint_class(scalars, acc, tbl, sh3, st3, w=cl.w,
                           interpret=interpret)
    vals = acc.transpose(1, 0, 2).reshape(n_pad, nb_total * _LANES)[
        :n, : ks.n_slots]

    # wide near-sensor slots: dense rows on the XLA path (painter.py)
    if pst.wide_slots is not None and pst.wide_slots.size:
        wt = jnp.asarray(pst.wide_sstep).astype(jnp.int16)[None]
        sh = s_hit[:, None, :].astype(jnp.int16)
        st = s_tail[:, None, :].astype(jnp.int16)
        code = jnp.where(
            (wt > 0) & (wt <= sh), jnp.int16(2),
            jnp.where((wt > 0) & (wt == sh + 1), jnp.int16(3),
                      jnp.where((wt > 0) & (wt > st), jnp.int16(1),
                                jnp.int16(0))))
        beam = jnp.arange(wt.shape[2], dtype=jnp.int16)[None, None, :]
        key = jnp.where(code > 0, (beam << 2) | code, jnp.int16(-1))
        win = key.max(axis=-1)
        c = win & 3
        wvals = jnp.where(
            win < 0, float(CELL_UNSEEN),
            jnp.where(c == 2, float(CELL_VIEW_FREE),
                      jnp.where(c == 3, 0.0, float(CELL_UNSEEN))))
        vals = vals.at[:, jnp.asarray(pst.wide_slots)].set(
            wvals.astype(jnp.float32))
    return vals

"""Pallas TPU kernel: transposed exact painter decode (robots in lanes).

Second-generation layout for the exact laser-map painter
(agent.cpp:511-624 semantics, same integer tables as ops/painter.py).
The first kernel (ops/pallas_paint.py) puts SLOTS in the 128 lanes and
unrolls robots, paying two threshold lane-splats plus a ~16-op compare
chain per (entry, robot).  This kernel transposes the problem:

  * ROBOTS ride the 128 lanes (one chunk = 128 robots), so per-beam
    thresholds are [1, 128] rows — a free sublane broadcast instead of a
    per-robot lane splat;
  * slots live in SUBLANES in groups of 8, which shrinks the beam window
    to the group's true span (+8-alignment): 0.90 M window entries per
    robot vs 2.93 M for 64-slot half-block windows at the production
    400x400/960 shape — windows were dominated by angular drift across
    the block, not by true beam incidence;
  * visibility is folded into the tables as sentinels (no `vis &` ops),
    and the code/key chain uses  key = c2 ? (K3 - c1) : (c3 ? K1 : -1)
    — c1 (pre-hit) implies c2 (hit-or-earlier), so K3-c1 yields code 2
    exactly when the sample is strictly before the hit: ~9 VPU ops per
    entry vs ~16;
  * groups whose window exceeds WIDE_W beams join the dense per-slot
    XLA "wide" rows (they are near-sensor slots with near-full beam
    incidence anyway).

Output rows are class-major (each width class is one pallas_call over
contiguous rows, no aliasing); a single static lane-gather re-orders the
painted rows back to sorted-slot space.  Bit-identical to
painter.paint_sorted: same tables, same integer arithmetic, and the max
key still picks the highest-index writing beam because window positions
are beam-index-monotonic within each group.
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
from img_env_tpu.ops.painter import PainterStatics, _BIG, _BM

NRT = 128          # robots per chunk (the lane dimension)
G8 = 8             # slots per group (the sublane dimension)
WIDE_W = 256       # window wider than this -> dense XLA wide row
_SENT_A = np.int16(32000)   # invisible-sample sentinel for the hit-side
                            # table: > any real threshold (s_hit <= 2**14)
# width buckets: few classes (= few pallas_calls), cheap padding
_WBUCKETS = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256)


class PaintTClass(NamedTuple):
    w: int
    groups: int             # groups per grid tile
    rbase: np.ndarray       # [ng_pad] int32 window start beam (8-aligned)
    ta: np.ndarray          # [ng_pad, G8, w] int16 step+1, invisible=32000
    tb: np.ndarray          # [ng_pad, G8, w] int16 step+1, invisible=0
    slot0: np.ndarray       # [ng_pad] int32 first slot id (-1 = padding)


class PaintTStatics(NamedTuple):
    classes: Tuple[PaintTClass, ...]
    r_pad: int
    n_slots: int
    inv_idx: np.ndarray     # [n_slots] int32 painted-row column per slot
                            # (sentinel column = all-UNSEEN)
    wide_slots: np.ndarray  # [ns] int32 (pst wide + ex-wide groups)
    wide_sstep: np.ndarray  # [ns, R] int16

    @staticmethod
    def build(pst: PainterStatics) -> "PaintTStatics":
        R = pst.globstep.shape[0]
        by_w = {}
        ex_wide_slots, ex_wide_rows = [], []
        for reg in pst.regions:
            if reg.W == 0:
                continue
            for b in range(reg.nb):
                ss = reg.sstep[b]                       # [W, BM] int16
                for g in range(_BM // G8):
                    sub = ss[:, g * G8:(g + 1) * G8]
                    rows = np.nonzero((sub > 0).any(axis=1))[0]
                    if len(rows) == 0:
                        continue
                    slot0 = reg.lo + b * _BM + g * G8
                    rb = int(reg.rbase[b] + rows.min()) // 8 * 8
                    hi = int(reg.rbase[b] + rows.max())
                    w_need = hi - rb + 1
                    if w_need > WIDE_W:
                        # dense per-slot rows over ALL beams (reg.W may be
                        # lane-padded past R — those columns are always 0)
                        dense = np.zeros((G8, R), np.int16)
                        lo_r = int(reg.rbase[b])
                        hi_r = min(lo_r + reg.W, R)
                        dense[:, lo_r:hi_r] = sub.T[:, :hi_r - lo_r]
                        ex_wide_slots.append(
                            np.arange(slot0, slot0 + G8, dtype=np.int32))
                        ex_wide_rows.append(dense)
                        continue
                    w = next(x for x in _WBUCKETS if x >= w_need)
                    rb = min(rb, max(0, ((R + 127) // 128 * 128) - w))
                    # ta/tb window: [G8, w] slice at rb (8-aligned)
                    win = np.zeros((G8, w), np.int16)
                    off = rb - int(reg.rbase[b])
                    lo_w = max(off, 0)
                    hi_w = min(off + w, reg.W)
                    win[:, lo_w - off:hi_w - off] = sub[lo_w:hi_w].T
                    by_w.setdefault(w, []).append((slot0, rb, win))
        r_pad = (R + 127) // 128 * 128
        classes = []
        row_slots = []          # first-slot per painted output row group
        for w in sorted(by_w):
            items = by_w[w]
            groups = max(1, min(32, 256 // w))
            ng = len(items)
            ng_pad = (ng + groups - 1) // groups * groups
            rbase = np.zeros(ng_pad, np.int32)
            ta = np.full((ng_pad, G8, w), _SENT_A, np.int16)
            tb = np.zeros((ng_pad, G8, w), np.int16)
            slot0 = np.full(ng_pad, -1, np.int32)
            for i, (s0, rb, win) in enumerate(items):
                rbase[i] = rb
                ta[i] = np.where(win > 0, win, _SENT_A)
                tb[i] = win
                slot0[i] = s0
            classes.append(PaintTClass(
                w=int(w), groups=int(groups), rbase=rbase,
                ta=ta, tb=tb, slot0=slot0))
            row_slots.append(slot0)
        # slot -> painted column map (class-major rows, G8 slots per row)
        n_rows = sum(c.slot0.shape[0] for c in classes)
        inv = np.full(pst.n_slots, n_rows * G8, np.int64)   # sentinel col
        base = 0
        for c in classes:
            for i, s0 in enumerate(c.slot0):
                if s0 >= 0:
                    inv[s0:s0 + G8] = (base + i) * G8 + np.arange(G8)
            base += c.slot0.shape[0]
        # merged wide rows (pst wide slots + ex-wide groups); pst pads
        # wide_sstep to >=1 row even when it has no wide slots — trim
        ws = [np.asarray(pst.wide_slots, np.int32)]
        wr = [np.asarray(pst.wide_sstep, np.int16)[:len(ws[0])]]
        if ex_wide_slots:
            ws.append(np.concatenate(ex_wide_slots))
            wr.append(np.concatenate(ex_wide_rows, axis=0))
        wide_slots = np.concatenate(ws)
        wide_sstep = (np.concatenate(wr, axis=0) if wide_slots.size
                      else np.zeros((0, R), np.int16))
        return PaintTStatics(
            classes=tuple(classes), r_pad=int(r_pad),
            n_slots=int(pst.n_slots), inv_idx=inv.astype(np.int32),
            wide_slots=wide_slots, wide_sstep=wide_sstep)


def _paint_t_kernel(rb_ref, ta_ref, tb_ref, sh_ref, st_ref, out_ref, *,
                    w: int, groups: int):
    t = pl.program_id(1)
    for g in range(groups):
        rb = rb_ref[t * groups + g]
        shg = sh_ref[pl.ds(pl.multiple_of(rb, 8), w), :]      # [w, NRT] i32
        stg = st_ref[pl.ds(pl.multiple_of(rb, 8), w), :]
        sh1g = shg + 1
        ta_g = ta_ref[g].astype(jnp.int32)                    # [G8, w]
        tb_g = tb_ref[g].astype(jnp.int32)
        acc = jnp.full((G8, NRT), -1, jnp.int32)
        for wp in range(w):
            ta = jnp.broadcast_to(ta_g[:, wp:wp + 1], (G8, NRT))
            tb = jnp.broadcast_to(tb_g[:, wp:wp + 1], (G8, NRT))
            sh = jnp.broadcast_to(shg[wp:wp + 1, :], (G8, NRT))
            sh1 = jnp.broadcast_to(sh1g[wp:wp + 1, :], (G8, NRT))
            st = jnp.broadcast_to(stg[wp:wp + 1, :], (G8, NRT))
            c1 = (ta <= sh).astype(jnp.int32)    # pre-hit (implies c2)
            c2 = ta <= sh1                       # hit or earlier
            c3 = tb > st                         # post-run (200)
            key = jnp.where(
                c2, ((wp << 2) | 3) - c1,
                jnp.where(c3, (wp << 2) | 1, -1))
            acc = jnp.maximum(acc, key)
        c = acc & 3
        val = jnp.where(
            acc < 0, float(CELL_UNSEEN),
            jnp.where(c == 2, float(CELL_VIEW_FREE),
                      jnp.where(c == 3, 0.0, float(CELL_UNSEEN))))
        out_ref[g] = val.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("w", "groups", "interpret"))
def _paint_t_class(rbase, ta, tb, sh3, st3, *, w: int, groups: int,
                   interpret: bool = False):
    """rbase: [ng_pad] i32; ta/tb: [ng_pad, G8, w] i16;
    sh3/st3: [r_pad, n_pad] i32.  Returns [ng_pad, G8, n_pad] f32."""
    ng_pad = ta.shape[0]
    ntiles = ng_pad // groups
    r_pad, n_pad = sh3.shape
    nch = n_pad // NRT

    kern = functools.partial(_paint_t_kernel, w=w, groups=groups)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch, ntiles),
        in_specs=[
            pl.BlockSpec((groups, G8, w), lambda c, t, s: (t, 0, 0)),
            pl.BlockSpec((groups, G8, w), lambda c, t, s: (t, 0, 0)),
            pl.BlockSpec((r_pad, NRT), lambda c, t, s: (0, c)),
            pl.BlockSpec((r_pad, NRT), lambda c, t, s: (0, c)),
        ],
        out_specs=pl.BlockSpec(
            (groups, G8, NRT), lambda c, t, s: (t, 0, c)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng_pad, G8, n_pad), jnp.float32),
        interpret=interpret,
    )(rbase, ta, tb, sh3, st3)


def make_paint_t_tables(kst: PaintTStatics, device_put=True):
    put = jax.device_put if device_put else jnp.asarray
    return {
        "classes": tuple(
            (put(jnp.asarray(c.rbase)), put(jnp.asarray(c.ta)),
             put(jnp.asarray(c.tb)))
            for c in kst.classes),
        "inv_idx": put(jnp.asarray(kst.inv_idx)),
        "wide_slots": put(jnp.asarray(kst.wide_slots)),
        "wide_sstep": put(jnp.asarray(kst.wide_sstep)),
    }


def paint_sorted_pallas_t(kst: PaintTStatics, s_hit, s_tail, tables=None,
                          interpret: bool = False):
    """Exact painter values [N, P'] f32 via the transposed kernel.

    s_hit/s_tail: [N, R] int (painter.hit_steps). tables: device dict from
    make_paint_t_tables.
    """
    n, r = s_hit.shape
    n_pad = (n + NRT - 1) // NRT * NRT
    big = jnp.int32(_BIG)

    def prep(x):
        xt = jnp.full((kst.r_pad, n_pad), big, jnp.int32)
        return xt.at[:r, :n].set(x.T.astype(jnp.int32))

    sh3 = prep(s_hit)
    st3 = prep(s_tail)

    outs = []
    for ci, cl in enumerate(kst.classes):
        rbase, ta, tb = (tables["classes"][ci] if tables is not None
                         else (jnp.asarray(cl.rbase), jnp.asarray(cl.ta),
                               jnp.asarray(cl.tb)))
        out = _paint_t_class(rbase, ta, tb, sh3, st3, w=cl.w,
                             groups=cl.groups, interpret=interpret)
        outs.append(out.reshape(-1, n_pad))
    painted = (jnp.concatenate(outs, axis=0) if outs
               else jnp.zeros((0, n_pad), jnp.float32))
    # sentinel column (constant-200 slots) + static lane-gather reorder
    cols = jnp.concatenate(
        [painted.T, jnp.full((n_pad, 1), float(CELL_UNSEEN), jnp.float32)],
        axis=1)
    inv = (tables["inv_idx"] if tables is not None
           else jnp.asarray(kst.inv_idx))
    vals = jnp.take(cols, inv, axis=1)[:n]

    # wide slots (pst wide + ex-wide groups): dense rows on the XLA path
    if kst.wide_slots.size:
        wt, ws = ((tables["wide_sstep"], tables["wide_slots"])
                  if tables is not None
                  else (jnp.asarray(kst.wide_sstep),
                        jnp.asarray(kst.wide_slots)))
        T = wt[None].astype(jnp.int16)                       # [1, ns, R]
        sh = s_hit[:, None, :].astype(jnp.int16)
        st = s_tail[:, None, :].astype(jnp.int16)
        code = jnp.where(
            (T > 0) & (T <= sh), jnp.int16(2),
            jnp.where((T > 0) & (T == sh + 1), jnp.int16(3),
                      jnp.where((T > 0) & (T > st), jnp.int16(1),
                                jnp.int16(0))))
        beam = jnp.arange(wt.shape[1], dtype=jnp.int16)[None, None, :]
        key = jnp.where(code > 0, (beam << 2) | code, jnp.int16(-1))
        win = key.max(axis=-1)
        c = win & 3
        wvals = jnp.where(
            win < 0, float(CELL_UNSEEN),
            jnp.where(c == 2, float(CELL_VIEW_FREE),
                      jnp.where(c == 3, 0.0, float(CELL_UNSEEN))))
        vals = vals.at[:, ws].set(wvals.astype(jnp.float32))
    return vals

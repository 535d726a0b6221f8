"""Pallas TPU kernel for the banded DP segment (the framework's hot op).

The XLA path (ops/align.banded_dp_segment) expresses each DP row as one
lax.scan step; the [B, W] carry round-trips through HBM every row and the
best-cell bookkeeping is a separate pass over stacked rows.  This kernel
keeps the whole wavefront in VMEM: the band carry, the query/target segments
and the running best-cell trackers never leave the core, and the only HBM
traffic is the 2-bit-packed move matrix (needed by the traceback) plus an
[8, B] best-cell record.

Layout: **transposed** — the band lives on the sublane axis and the batch on
the lane axis.  That is what makes the kernel legal Mosaic: the per-row
dynamic accesses (query char i−1, target window [i−1, i−1+W)) become sublane
offsets, which support arbitrary dynamic indices, while lane offsets must be
128-aligned.  It also vectorises naturally: every row update is a [W, B]
VPU op with B = 128·n pairs in lanes.

The horizontal closure (prefix min over the band) is log2(W) shift+min steps
(pltpu.roll along sublanes).  Moves are packed 16 2-bit codes per int32 word
([S, W/16, B]) — 16× less HBM write traffic than byte codes, and the layout
the host traceback consumes directly (ops/align._read_move).

Semantics match the XLA path exactly (same move attribution, same
first-argmax tie-breaks as pick_end_local); tests/test_pallas_dp.py checks
bit-for-bit agreement.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from .align import IND_K

# plain python ints: jnp scalars would be captured consts inside the kernel
INF = 1 << 20
VINF = 1 << 30   # must equal ops.align.VINF
_NEG = -(1 << 26)
_K1 = IND_K + 1


#: best-cell tracking strategy: "elem" replaces the 3 per-row sublane
#: log-reductions with 2 elementwise ops on a packed (score, -row) key per
#: (band, lane) cell + ONE final reduction after the row loop — same
#: first-flat-argmax tie-breaks (key = score*1024 - i orders exactly like
#: pick_end_local; tests/test_pallas_dp.py pins bit-identity).  Measured
#: with tools/roll_micro.py; default decided by the on-chip A/B.
_BEST_MODE = os.environ.get("MECAT_TPU_DP_BEST", "elem")


def _dp_kernel(q_ref, t_ref, tmax_ref, segq_ref, active_ref, *out_refs,
               S: int, W: int, with_moves: bool, best_mode: str):
    # transposed layout: q_ref [S, B], t_ref [S+W, B], tmax/segq/active
    # [1, B], moves_ref [S, W/16, B] (with_moves only), best_ref [8, B].
    # The counts-only extension path (overlap detection) never reads moves:
    # skipping them removes the kernel's entire HBM write stream
    # (S * W/16 * B words per segment) plus the packing ALU work.
    #
    # Dead-block skip: the segmented extension loop calls this kernel once
    # per segment for the WHOLE batch, but lanes stop extending at very
    # different segment counts (junk candidates die in 1-2 segments, a full
    # overlap takes 10+).  When every lane of this grid block is inactive
    # the entire DP is skipped (pl.when) and the block writes only a
    # VINF/zero best record — callers already gate every state update on
    # their own active mask, so skipped lanes' outputs are never consumed.
    # Callers sort lanes by expected mortality so whole blocks die together.
    moves_ref = out_refs[0] if with_moves else None
    best_ref = out_refs[-1]
    B = q_ref.shape[1]
    half = W // 2
    Wp = W // 16
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    k_idx = (jax.lax.broadcasted_iota(jnp.int32, (Wp, 16, B), 1)
             if with_moves else None)
    tmax = tmax_ref[0:1, :]                      # [1, B]
    segq = segq_ref[0:1, :]

    # row 0: val[0][j] = j leading deletions (packed), VINF outside [0, tmax]
    j0 = w_idx - half
    row0 = jnp.where((j0 >= 0) & (j0 <= tmax), jnp.maximum(j0, 0) * _K1, VINF)

    def row_update(i, r, q_blk, t_blk, carry):
        # i = traced row index (base + r + 1); q_blk/t_blk are the aligned
        # group loads, indexed with STATIC offset r (Mosaic requires dynamic
        # sublane offsets to be 8-aligned; the group base is).
        prev, best_s, best_r, best_w, best_d = carry
        qc = q_blk[r:r + 1, :]                                # [1, B]
        td = t_blk[r:r + W, :]                                # [W, B]
        sub = jnp.where(qc == td, 0, 1)
        diag = prev + sub * IND_K
        # vertical: prev shifted one sublane up (prev[w+1]); non-negative
        # roll: W-1 down == 1 up (circularly), edge masked to VINF
        vert = jnp.where(w_idx < W - 1,
                         pltpu.roll(prev, shift=W - 1, axis=0), VINF) + _K1
        cand = jnp.minimum(diag, vert)
        j = i - half + w_idx
        valid = (j >= 0) & (j <= tmax)
        cand = jnp.where(valid, cand, VINF)
        # horizontal closure: cur[w] = min_{u<=w}(cand[u] - u*K1) + w*K1
        y = cand - w_idx * _K1
        k = 1
        while k < W:
            y = jnp.minimum(y, jnp.where(w_idx >= k,
                                         pltpu.roll(y, shift=k, axis=0),
                                         VINF))
            k *= 2
        cur = y + w_idx * _K1
        cur = jnp.where(valid, jnp.minimum(cur, VINF), VINF)

        if with_moves:
            # move attribution, priority match/mismatch > vert > horizontal
            # (match/mismatch code == sub value, as in ops/align)
            move = jnp.where(cur == vert, jnp.int32(2), jnp.int32(3))
            move = jnp.where(cur == diag, sub, move)
            # pack 16 2-bit codes per int32 word along the band axis
            packed = jnp.sum(move.reshape(Wp, 16, B) << (2 * k_idx), axis=1)
            moves_ref[pl.ds(i - 1, 1), :, :] = (
                packed.astype(jnp.int32).reshape(1, Wp, B))

        # best-cell tracking (pick_end_local: score = r + j - 2*penalty*D)
        dist = cur // IND_K
        ok = valid & (cur < VINF) & (i <= segq)
        if best_mode == "elem":
            # per-(band, lane) packed key: score*1024 - i orders by (score
            # desc, row asc) — same first-flat-argmax as the log path but
            # only 2 elementwise [W, B] ops per row; the cross-band
            # reduction happens ONCE after the row loop.  i <= S < 1024 so
            # the row never aliases into the score field; invalid cells get
            # a key below any real one (real keys >= -4*2^18*1024 > -2^30).
            score = i + j - 2 * C.ALIGN_TRIM_PENALTY * dist
            key = jnp.where(ok, score * 1024 - i, jnp.int32(-(1 << 30)))
            upd = key > best_s                       # best_s: [W, B] keys
            best_s = jnp.where(upd, key, best_s)
            best_d = jnp.where(upd, cur, best_d)     # best_d: [W, B] vals
            return cur, best_s, best_r, best_w, best_d
        score = jnp.where(ok, i + j - 2 * C.ALIGN_TRIM_PENALTY * dist, _NEG)
        row_max = jnp.max(score, axis=0, keepdims=True)          # [1, B]
        row_arg = jnp.min(jnp.where(score == row_max, w_idx, W),
                          axis=0, keepdims=True)
        row_d = jnp.min(jnp.where(w_idx == row_arg, cur, VINF),
                        axis=0, keepdims=True)
        upd = row_max > best_s
        best_s = jnp.where(upd, row_max, best_s)
        best_r = jnp.where(upd, i, best_r)
        best_w = jnp.where(upd, row_arg, best_w)
        best_d = jnp.where(upd, row_d, best_d)
        return cur, best_s, best_r, best_w, best_d

    def group(g, carry):
        base = pl.multiple_of(g * 8, 8)
        q_blk = q_ref[pl.ds(base, 8), :].astype(jnp.int32)        # [8, B]
        t_blk = t_ref[pl.ds(base, W + 8), :].astype(jnp.int32)    # [W+8, B]
        for r in range(8):
            carry = row_update(base + r + 1, r, q_blk, t_blk, carry)
        return carry

    any_active = jnp.any(active_ref[0:1, :] != 0)

    @pl.when(any_active)
    def _run():
        zero = jnp.zeros((1, B), jnp.int32)
        if best_mode == "elem":
            # row-0 cells participate too: score = j - 2p*dist, row index 0
            d0 = row0 // IND_K
            key0 = jnp.where((j0 >= 0) & (j0 <= tmax),
                             (j0 - 2 * C.ALIGN_TRIM_PENALTY * d0) * 1024,
                             jnp.int32(-(1 << 30)))
            init = (row0, key0, zero, zero, row0)
            _, key_wb, _, _, val_wb = jax.lax.fori_loop(
                0, S // 8, group, init)
            kmax = jnp.max(key_wb, axis=0, keepdims=True)        # [1, B]
            warg = jnp.min(jnp.where(key_wb == kmax, w_idx, W),
                           axis=0, keepdims=True)
            vbest = jnp.min(jnp.where(w_idx == warg, val_wb, VINF),
                            axis=0, keepdims=True)
            best_ref[0:1, :] = (-kmax) & 1023       # row (mod-1024 exact)
            best_ref[1:2, :] = warg
            best_ref[2:3, :] = vbest
            best_ref[3:8, :] = jnp.zeros((5, B), jnp.int32)
            return
        init = (row0, zero, zero, jnp.full((1, B), half, jnp.int32), zero)
        _, best_s, best_r, best_w, best_d = jax.lax.fori_loop(
            0, S // 8, group, init)
        best_ref[0:1, :] = best_r
        best_ref[1:2, :] = best_w
        best_ref[2:3, :] = best_d
        best_ref[3:4, :] = best_s
        best_ref[4:8, :] = jnp.zeros((4, B), jnp.int32)

    @pl.when(jnp.logical_not(any_active))
    def _skip():
        # unconsumed record: r=0, w=half, v=VINF (=> d=INF, callers' ok=False)
        best_ref[0:1, :] = jnp.zeros((1, B), jnp.int32)
        best_ref[1:2, :] = jnp.full((1, B), half, jnp.int32)
        best_ref[2:3, :] = jnp.full((1, B), VINF, jnp.int32)
        best_ref[3:8, :] = jnp.zeros((5, B), jnp.int32)


@partial(jax.jit, static_argnames=("S", "W", "block_b", "interpret",
                                   "with_moves", "best_mode"))
def dp_segment_best_pallas(q_seg: jnp.ndarray, tpad: jnp.ndarray,
                           tmax: jnp.ndarray, seg_q: jnp.ndarray,
                           active: jnp.ndarray | None = None,
                           *, S: int, W: int, block_b: int = 256,
                           interpret: bool = False, with_moves: bool = True,
                           best_mode: str | None = None):
    """Banded DP + local-best endpoint, one fused kernel.

    Args:
      q_seg: uint8 [B, S] (sentinel-padded query segment)
      tpad:  uint8 [B, S + W] target window with W/2 leading sentinel pad
             (tpad[:, x] = t_window[x - W/2])
      tmax:  int32 [B] usable target window length
      seg_q: int32 [B] rows eligible as endpoints (partial final segment)
      active: bool [B] or None; a grid block whose lanes are ALL inactive
        skips its DP entirely and returns an unconsumable best record
        (r=0, j=0, d=INF) with unspecified moves — callers must gate
        consumption on their own active mask (they already do).
      with_moves: emit the packed move matrix (needed for traceback/ops;
        the counts-only overlap path passes False and gets moves=None)

    Returns (moves int32 [S, W//16, B] packed or None, r_best, w_best,
    j_best, d_best, ind_best) — identical to banded_dp_segment +
    pick_end_local for lanes in blocks with any active lane.
    """
    B = q_seg.shape[0]
    assert B % block_b == 0 and block_b % 128 == 0, (B, block_b)
    grid = (B // block_b,)
    Wp = W // 16
    act = (jnp.ones((1, B), jnp.int32) if active is None
           else active.reshape(1, B).astype(jnp.int32))
    out_specs = [pl.BlockSpec((8, block_b), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((8, B), jnp.int32)]
    if with_moves:
        out_specs.insert(0, pl.BlockSpec((S, Wp, block_b),
                                         lambda i: (0, 0, i),
                                         memory_space=pltpu.VMEM))
        out_shape.insert(0, jax.ShapeDtypeStruct((S, Wp, B), jnp.int32))
    if best_mode is None:
        best_mode = _BEST_MODE
    out = pl.pallas_call(
        partial(_dp_kernel, S=S, W=W, with_moves=with_moves,
                best_mode=best_mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S + W, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(q_seg.T, tpad.T, tmax.reshape(1, B), seg_q.reshape(1, B), act)
    moves = out[0] if with_moves else None
    best = out[-1]
    r_best = best[0]
    w_best = best[1]
    v_best = best[2]  # packed val = d * IND_K + indels
    d_best = jnp.where(v_best >= VINF, jnp.int32(INF), v_best // IND_K)
    ind_best = jnp.where(v_best >= VINF, 0, v_best % IND_K)
    j_best = r_best - W // 2 + w_best
    return moves, r_best, w_best, j_best, d_best, ind_best


def pallas_available(S: int, W: int, B: int) -> bool:
    """Shape/backend gate for the Pallas path (lane-aligned, TPU backend).

    The band lives on the SUBLANE axis, so W needs only 8·16 alignment for
    the rolls and the 16-codes-per-word move packing; W=64 (half the DP
    work per row, drift tolerance ±32/segment — ~5 sigma at 15% indel
    noise over a re-centred 512 bp segment) is a supported quality/perf
    knob.  Batch stays lane-aligned (128)."""
    if os.environ.get("MECAT_NO_PALLAS") == "1":
        return False
    if W % 32 or W < 32 or S % 128 or (S + W) % 8 or B % 128:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False

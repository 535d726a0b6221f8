"""Banded edit-distance extension aligner — batched wavefront DP.

Counterpart of the reference's diff/DW gap aligner (SURVEY.md §3.5; reference
``src/mecat2cns/dw.cpp`` / ``src/common/diff_gapalign.*`` — unverified, mount
empty).  The reference runs a Myers O(ND) loop per pair per pthread; here the
same seed-extend contract — extend a candidate seed in both directions in
~segment-sized steps, re-centering after each segment, stopping when quality
degrades — is restated as fixed-shape batched DP:

* The DP is a **banded Levenshtein** over band-relative coordinates: at query
  row ``i`` the band covers target positions ``j ∈ [i-W/2, i+W/2)``, so the
  band shifts right one column per row and indel drift up to ±W/2 per segment
  is representable.  Re-centering between segments (the reference's segmented
  extension) keeps W small even for long noisy reads.
* Each row update is vectorised across the whole band and the whole batch:
  diagonal/vertical candidates are shifts, and the horizontal (gap-in-query)
  closure ``cur[w] = min_{u<=w}(cand[u] + (w-u))`` is an associative prefix
  scan (``lax.cummin`` of ``cand - w``), eliminating the serial intra-row
  dependency — this is what makes the kernel a wavefront.
* Moves are recorded per cell (2 bits of information, stored as uint8 in the
  JAX reference implementation) and traced back **batched**: one
  ``fori_loop`` over steps, each step a [B]-wide gather.

Distances/coords are int32; bases are uint8 codes with sentinel padding
(query pad 0xFF, target pad 0xFE) so padding never matches anything.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C

# plain ints, NOT jnp scalars: a module-level device constant initialises
# the XLA backend at import time, which breaks jax.distributed.initialize
# (it must run before any backend touch).  Weak typing keeps the arithmetic
# int32 wherever these meet int32 arrays.
INF = 1 << 20
Q_SENTINEL = 255
T_SENTINEL = 254

#: DP values are packed as val = edit_distance * IND_K + indel_count, so a
#: single integer min gives the lexicographic (distance, indels) optimum and
#: exact match counts come from a closed form instead of a traceback:
#: with qc query / jc target chars consumed, matches = (qc+jc+indels)/2 - d.
#: IND_K must exceed any possible per-segment indel count (<= 2S+W).
IND_K = 4096
#: masked-cell value: large, but IND_K * INF-safe in int32 arithmetic.
VINF = 1 << 30

# move codes
MOVE_MATCH = 0     # diagonal, q char == t char
MOVE_MISMATCH = 1  # diagonal, substitution
MOVE_VERT = 2      # query char vs gap (insertion in query)
MOVE_HORIZ = 3     # target char vs gap (deletion from target)


def banded_dp_segment(q_seg: jnp.ndarray, t_seg: jnp.ndarray,
                      tmax: jnp.ndarray, W: int):
    """Banded edit-distance DP of one segment per pair.

    Args:
      q_seg: uint8 [B, S] query chars (sentinel-padded beyond segment).
      t_seg: uint8 [B, S + W//2] target window chars (sentinel-padded).
      tmax: int32 [B] usable target window length (cells with j > tmax are
        invalid; j == tmax is a legal end state).
      W: band width (target positions covered at row i: [i-W/2, i+W/2)).

    Returns:
      rows: int32 [B, S+1, W] packed DP values per row (row r = after
        consuming r query chars): val = dist * IND_K + indels, VINF outside
        the band.
      moves: int32 [S, W//16, B] move codes for rows 1..S, 16 2-bit codes
        packed per word (canonical packed-transposed layout, shared with the
        Pallas kernel: code at (row i, band w, pair b) is
        (moves[i-1, w//16, b] >> (2*(w%16))) & 3).
    """
    B, S = q_seg.shape
    half = W // 2
    K1 = IND_K + 1  # cost of one indel step in packed-val units
    w_idx = jnp.arange(W, dtype=jnp.int32)

    # tpad[x] = t_seg[x - half]: left sentinel padding so the diagonal gather
    # for row i is the static-length slice tpad[:, i-1 : i-1+W].  A caller
    # that already gathered a sentinel-FRAMED wide window (width exactly
    # S + W, see _extend_direction_impl) skips this re-materialisation —
    # the per-segment copy was measurable wrapper overhead
    # (tools/roll_micro.py: raw kernel ~2x the wrapped cell rate).
    if t_seg.shape[1] == S + W:
        tpad = t_seg
    else:
        tpad = jnp.full((B, S + W), T_SENTINEL, dtype=q_seg.dtype)
        tpad = tpad.at[:, half:half + t_seg.shape[1]].set(t_seg)

    j0 = w_idx - half  # target position of band cell w at row 0
    row0 = jnp.where((j0[None, :] >= 0) & (j0[None, :] <= tmax[:, None]),
                     (jnp.maximum(j0, 0) * K1)[None, :].astype(jnp.int32),
                     VINF)

    pack_w = jnp.asarray([1 << (2 * k) for k in range(16)],
                         dtype=jnp.int32)  # 2-bit packing weights

    def step(prev, i):
        # i: row index 1..S (i query chars consumed)
        qc = jax.lax.dynamic_slice_in_dim(q_seg, i - 1, 1, axis=1)  # [B,1]
        td = jax.lax.dynamic_slice_in_dim(tpad, i - 1, W, axis=1)   # [B,W]
        sub = jnp.where(qc == td, 0, 1).astype(jnp.int32)
        diag = prev + sub * IND_K
        vert = jnp.concatenate(
            [prev[:, 1:], jnp.full((B, 1), VINF, jnp.int32)], axis=1) + K1
        cand = jnp.minimum(diag, vert)
        j = i - half + w_idx  # [W] target position of each band cell
        valid = (j[None, :] >= 0) & (j[None, :] <= tmax[:, None])
        cand = jnp.where(valid, cand, VINF)
        # horizontal closure: cur[w] = min_{u<=w} cand[u] + (w-u)*K1
        cur = (jax.lax.cummin(cand - w_idx[None, :] * K1, axis=1)
               + w_idx[None, :] * K1)
        cur = jnp.where(valid, jnp.minimum(cur, VINF), VINF)
        # move attribution, priority: match/mismatch > vertical > horizontal
        # (MOVE_MATCH/MISMATCH == sub value)
        move = jnp.full((B, W), MOVE_HORIZ, dtype=jnp.int32)
        move = jnp.where(cur == vert, MOVE_VERT, move)
        move = jnp.where(cur == diag, sub, move)
        # pack 16 2-bit codes per int32 word, transpose to [Wp, B]
        packed = jnp.sum(move.reshape(B, W // 16, 16) * pack_w[None, None, :],
                         axis=2).astype(jnp.int32).T
        return cur, (cur, packed)

    last, (rows, moves) = jax.lax.scan(
        step, row0, jnp.arange(1, S + 1, dtype=jnp.int32))
    rows = jnp.concatenate([row0[:, None, :],
                            jnp.moveaxis(rows, 0, 1)], axis=1)
    return rows, moves


def pick_end_local(rows: jnp.ndarray, seg_qlen: jnp.ndarray,
                   tmax: jnp.ndarray, W: int,
                   penalty: int = C.ALIGN_TRIM_PENALTY):
    """Best-scoring cell over the WHOLE segment (local-alignment endpoint).

    Score of cell (r, j) = (r + j) - 2*penalty*D[r][j]: a match column adds
    +2, a substitution 2-2p, an indel 1-2p — so for p=2 any error is
    negative and the argmax is the furthest point at which the alignment was
    still "profitable".  This realises the reference's stop-on-degradation
    rule (SURVEY.md §3.5: "stop when score degrades") and trims junk tails:
    if the best cell is not on the final row, quality degraded inside the
    segment and the caller stops extending.  TODO(ref): reference scoring
    constants unknown (mount empty).
    """
    B, S1, _ = rows.shape
    half = W // 2
    w_idx = jnp.arange(W, dtype=jnp.int32)
    r_idx = jnp.arange(S1, dtype=jnp.int32)
    dist = rows // IND_K
    j = r_idx[None, :, None] - half + w_idx[None, None, :]   # [1, S+1, W]
    valid = ((j >= 0) & (j <= tmax[:, None, None])
             & (r_idx[None, :, None] <= seg_qlen[:, None, None]))
    score = jnp.where(valid & (rows < VINF),
                      r_idx[None, :, None] + j - 2 * penalty * dist,
                      jnp.int32(-(1 << 26)))
    flat = score.reshape(B, S1 * W)
    best = jnp.argmax(flat, axis=1).astype(jnp.int32)
    r_best = best // W
    w_best = best % W
    v_best = jnp.take_along_axis(rows.reshape(B, S1 * W), best[:, None],
                                 axis=1)[:, 0]
    d_best = jnp.where(v_best >= VINF, INF, v_best // IND_K)
    i_best = jnp.where(v_best >= VINF, 0, v_best % IND_K)
    j_best = r_best - half + w_best
    return r_best, w_best, j_best, d_best, i_best


def _read_move(flat: jnp.ndarray, i, w, S: int, W: int):
    """Read the 2-bit move at (row i, band w) from packed moves [S*Wp, B]."""
    Wp = W // 16
    idx = jnp.clip((i - 1) * Wp + w // 16, 0, S * Wp - 1)
    word = jnp.take_along_axis(flat, idx[None, :], axis=0)[0]
    # arithmetic >> then & 3 is sign-safe for the top 2-bit slot
    return (word >> (2 * (w % 16))) & 3


def traceback_counts(moves: jnp.ndarray, seg_qlen: jnp.ndarray,
                     w_end: jnp.ndarray, W: int):
    """Batched traceback from (seg_qlen, w_end) to row 0: match/column counts.

    moves: packed [S, W//16, B] (see banded_dp_segment).  Returns
    (matches, align_len, lead_del) where lead_del is the number of leading
    target deletions charged by the D[0][j]=j start row.
    """
    S, Wp, B = moves.shape
    half = W // 2
    flat = moves.reshape(S * Wp, B)

    def body(_, state):
        i, w, m, alen = state
        active = i > 0
        mv = _read_move(flat, i, w, S, W)
        is_diag = (mv == MOVE_MATCH) | (mv == MOVE_MISMATCH)
        di = jnp.where(is_diag | (mv == MOVE_VERT), 1, 0)
        dw = jnp.where(mv == MOVE_VERT, 1, jnp.where(mv == MOVE_HORIZ, -1, 0))
        i2 = jnp.where(active, i - di, i)
        w2 = jnp.where(active, w + dw, w)
        m2 = jnp.where(active & (mv == MOVE_MATCH), m + 1, m)
        a2 = jnp.where(active, alen + 1, alen)
        return (i2, w2, m2, a2)

    zeros = jnp.zeros_like(seg_qlen)
    # bound: alen <= (diag+vert) + horiz <= S + (S + W/2) columns
    i, w, m, alen = jax.lax.fori_loop(
        0, 2 * S + W, body,
        (seg_qlen.astype(jnp.int32), w_end.astype(jnp.int32), zeros, zeros))
    lead_del = w - half  # at row 0, remaining j = w - half leading deletions
    return m, alen + jnp.maximum(lead_del, 0), jnp.maximum(lead_del, 0)


def max_tape_cols(S: int, W: int, min_seg_identity: float) -> int:
    """Tape width sufficient for any segment that passes the identity gate.

    A segment's alignment-column count a = m + mism + ins + del obeys
    a <= 2*r_end + W/2 - (m + mism) (from r_end <= S and the band's
    j_end - r_end <= W/2 drift limit) and m <= m + mism, so with the
    seg_step acceptance rule (identity m/a >= p, or a < 32) the worst
    accepted segment has a <= (2S + W/2)/(1 + p).  Segments failing the
    gate keep their tapes but are masked to n_cols = 0 by the caller, so
    truncating their walk is harmless.  Rounded up to a lane multiple.
    """
    bound = int((2 * S + W // 2) / (1.0 + min_seg_identity)) + 1
    return min(2 * S + W, -(-max(bound, 32) // 64) * 64)


def traceback_ops(moves: jnp.ndarray, seg_qlen: jnp.ndarray,
                  w_end: jnp.ndarray, W: int, max_cols: int = 0):
    """Batched traceback emitting the full op tape (for consensus tags).

    Returns (ops, qi, tj, n_cols):
      ops: int8 [B, MAXC] move codes in TEMPLATE-FORWARD order (tape is
        written backwards from the end state and right-aligned, so column
        c of pair b lives at ops[b, MAXC - n_cols[b] + c]);
      qi:  int32 [B, MAXC] query char index of the column (-1 for deletions);
      tj:  int32 [B, MAXC] target char index (for insertions: the target
        position the insert precedes);
      n_cols: int32 [B].
    MAXC = max_cols if given else 2*S + W (the unconditional worst case);
    callers that gate segments on identity can pass max_tape_cols(...) —
    the serial walk length and every downstream per-column array shrink
    with it.  moves: packed [S, W//16, B] (see banded_dp_segment).
    """
    S, Wp, B = moves.shape
    half = W // 2
    MAXC = max_cols if max_cols else 2 * S + W
    flat = moves.reshape(S * Wp, B)

    def body(state, _):
        i, w, n = state
        j = i - half + w
        in_dp = i > 0
        tail_del = (i == 0) & (j > 0)   # leading target deletions at row 0
        mv = jnp.where(in_dp, _read_move(flat, i, w, S, W),
                       jnp.where(tail_del, MOVE_HORIZ, -1)).astype(jnp.int8)
        active = mv >= 0
        is_diag = (mv == MOVE_MATCH) | (mv == MOVE_MISMATCH)
        di = jnp.where(is_diag | (mv == MOVE_VERT), 1, 0)
        dw = jnp.where(mv == MOVE_VERT, 1,
                       jnp.where(mv == MOVE_HORIZ, -1, 0))
        # tail deletions: i stays 0, j decreases => w decreases
        dw = jnp.where(in_dp, dw, -1)
        i2 = jnp.where(active & in_dp, i - di, i)
        w2 = jnp.where(active, w + dw, w)
        n2 = jnp.where(active, n + 1, n)
        # step s emits forward column n-1-s; scan stacks outputs (no
        # scatters in the loop body), the flip below right-aligns them —
        # the fori_loop + .at[] formulation measured ~100x slower.  ONLY
        # the move code is emitted here: the per-column q/t indices are
        # pure cumsums of the op sequence, reconstructed vectorised below
        # (the 3-output loop body measured ~25% slower on v5e — the serial
        # walk is the latency-bound hot spot of the whole cns chunk).
        return (i2, w2, n2), mv

    zeros = jnp.zeros((B,), jnp.int32)
    (_, _, n), mv_s = jax.lax.scan(
        body, (seg_qlen.astype(jnp.int32), w_end.astype(jnp.int32), zeros),
        None, length=MAXC)
    ops = jnp.flip(mv_s, axis=0).T          # [B, MAXC], right-aligned
    # forward-order reconstruction: the walk ends at (0, 0), so in forward
    # order q/t indices are inclusive cumsums of consumed chars (invalid
    # slots are a right-aligned prefix and emit -1, exactly as the loop did)
    consumes_q = ((ops == MOVE_MATCH) | (ops == MOVE_MISMATCH)
                  | (ops == MOVE_VERT))
    consumes_t = (ops >= 0) & (ops != MOVE_VERT)
    cq = jnp.cumsum(consumes_q.astype(jnp.int32), axis=1)
    ct = jnp.cumsum(consumes_t.astype(jnp.int32), axis=1)
    qi = jnp.where(consumes_q, cq - 1, -1)
    tj = jnp.where(ops >= 0, ct - consumes_t.astype(jnp.int32), -1)
    return ops, qi, tj, n


def traceback_rows(moves: jnp.ndarray, seg_qlen: jnp.ndarray,
                   w_end: jnp.ndarray, W: int):
    """Row-major traceback: walk DP ROWS (<= S steps), not tape columns.

    The column walk (:func:`traceback_ops`) pays one element-gather per tape
    column per lane — latency-bound at ~21 ns/element on v5e, the single
    hottest phase of the cns chunk (124 of 286 ms at full-scale shapes,
    measured 2026-08-19).  This walk exploits the band structure instead:
    within a DP row the backward path is a maximal run of HORIZ cells ending
    at the first non-HORIZ cell at-or-left-of the entry column, so one row
    costs a handful of VPU ops over a [B, W] one-hot — no gathers at all.
    The scan also runs S steps instead of max_tape_cols(...) ~ 1.4*S.

    moves: packed [S, W//16, B] (banded_dp_segment layout).  Returns
    (mv, h, w_out, w0):
      mv:  int32 [B, S]; mv[b, r-1] = the diagonal/vertical move that left
        row r (MOVE_MATCH/MISMATCH/VERT), or -1 if the walk never visited
        row r (r > seg_qlen or the path broke — broken paths only occur on
        endpoint-gated segments, whose tapes callers mask out).
      h:   int32 [B, S]; number of HORIZ (target-deletion) columns emitted
        at row r before the exit move (forward tape order: mv then HORIZ^h).
      w_out: int32 [B, S]; band column of the exit move (-1 if none).
      w0:  int32 [B]; band column at row 0 (leading target deletions =
        max(w0 - W//2, 0), exactly traceback_counts' lead_del).
    """
    S, Wp, B = moves.shape
    w_iota = jnp.arange(W, dtype=jnp.int32)
    shift16 = 2 * jnp.arange(16, dtype=jnp.int32)
    r_end = seg_qlen.astype(jnp.int32)

    def step(state, xs):
        oh, alive, r = state                     # oh [B, W] bool
        words = xs.T                             # [Wp, B] -> [B, Wp]
        mv = ((words[:, :, None] >> shift16[None, None, :]) & 3)
        mv = mv.reshape(B, W)
        act = alive & (r <= r_end)
        w_in = jnp.sum(jnp.where(oh, w_iota[None, :], 0), axis=1)
        cand = (mv != MOVE_HORIZ) & (w_iota[None, :] <= w_in[:, None])
        w_out = jnp.max(jnp.where(cand, w_iota[None, :], -1), axis=1)
        found = act & (w_out >= 0)
        oh_out = w_iota[None, :] == w_out[:, None]
        mv_out = jnp.where(found,
                           jnp.sum(jnp.where(oh_out, mv, 0), axis=1), -1)
        h = jnp.where(found, w_in - w_out, 0)
        # VERT leaves to (r-1, w+1); diagonal to (r-1, w)
        oh_shift = jnp.concatenate(
            [jnp.zeros((B, 1), bool), oh_out[:, :-1]], axis=1)
        oh_next = jnp.where((mv_out == MOVE_VERT)[:, None], oh_shift, oh_out)
        oh2 = jnp.where(found[:, None], oh_next, oh)
        alive2 = alive & (found | ~act)
        return (oh2, alive2, r - 1), (mv_out, h, jnp.where(found, w_out, -1))

    oh0 = w_iota[None, :] == w_end.astype(jnp.int32)[:, None]
    mv_flip = jnp.flip(moves, axis=0)            # step s -> row S - s
    (oh_f, _, _), (mv_s, h_s, wo_s) = jax.lax.scan(
        step, (oh0, jnp.ones((B,), bool), jnp.int32(S)), mv_flip)
    w0 = jnp.sum(jnp.where(oh_f, w_iota[None, :], 0), axis=1)
    # flip to ascending row order: index r-1 = row r
    return (jnp.flip(mv_s, axis=0).T, jnp.flip(h_s, axis=0).T,
            jnp.flip(wo_s, axis=0).T, w0)


def rows_to_tape(mv: jnp.ndarray, h: jnp.ndarray, w0: jnp.ndarray,
                 W: int, max_cols: int):
    """Row-walk outputs -> the right-aligned op tape (traceback_ops contract).

    Forward tape = HORIZ^lead_del, then per visited row r ascending:
    mv_r followed by HORIZ^h_r.  Used by the tape-compatibility path and the
    differential tests; the cns hot path consumes the row form directly.
    Returns (ops, qi, tj, n_cols) exactly as :func:`traceback_ops` for any
    walk that fits max_cols (longer walks differ only in which end is
    truncated — both paths only produce them on endpoint-gated segments).
    """
    B, S = mv.shape
    half = W // 2
    MAXC = max_cols
    emitted = mv >= 0
    hc = jnp.cumsum(h, axis=1)
    n_rows = jnp.sum(emitted.astype(jnp.int32), axis=1)
    lead = jnp.maximum(w0 - half, 0)
    n_full = n_rows + hc[:, -1] + lead
    n_cols = jnp.minimum(n_full, MAXC)
    r_iota = jnp.arange(S, dtype=jnp.int32)[None, :]
    p = lead[:, None] + r_iota + (hc - h)        # forward col of mv_r
    slot = p + (MAXC - n_full)[:, None]
    slot = jnp.where(emitted & (slot >= 0), slot, MAXC)
    col = jnp.arange(MAXC, dtype=jnp.int32)[None, :]
    ops = jnp.where(col >= (MAXC - n_cols)[:, None],
                    jnp.int8(MOVE_HORIZ), jnp.int8(-1))
    ops = ops.at[jnp.arange(B, dtype=jnp.int32)[:, None], slot].set(
        mv.astype(jnp.int8), mode="drop", unique_indices=True)
    consumes_q = ((ops == MOVE_MATCH) | (ops == MOVE_MISMATCH)
                  | (ops == MOVE_VERT))
    consumes_t = (ops >= 0) & (ops != MOVE_VERT)
    cq = jnp.cumsum(consumes_q.astype(jnp.int32), axis=1)
    ct = jnp.cumsum(consumes_t.astype(jnp.int32), axis=1)
    qi = jnp.where(consumes_q, cq - 1, -1)
    tj = jnp.where(ops >= 0, ct - consumes_t.astype(jnp.int32), -1)
    return ops, qi, tj, n_cols


def dp_segment_best(q_seg: jnp.ndarray, t_seg: jnp.ndarray,
                    tmax: jnp.ndarray, seg_q: jnp.ndarray, S: int, W: int,
                    want_moves: bool = True, active: jnp.ndarray = None):
    """One DP segment + local-best endpoint; Pallas on TPU, XLA elsewhere.

    t_seg: [B, S + W//2] window chars.  Returns
    (moves [S,W//16,B] packed, r_best, w_best, j_best, d_best, ind_best) —
    both backends produce identical values (tests/test_pallas_dp.py).
    With want_moves=False, moves is None (counts-only overlap path: the
    Pallas kernel skips its whole HBM move stream; the XLA path relies on
    jit DCE of the unused scan output).  ``active`` (bool [B] or None) is a
    Pallas-path hint: a 128-lane block whose lanes are ALL inactive skips
    its DP and returns d=INF for those lanes (the segmented extension gates
    every state update on its own active mask, so the values are never
    consumed; the XLA path ignores the hint).
    """
    from .pallas_dp import dp_segment_best_pallas, pallas_available

    B = q_seg.shape[0]
    if pallas_available(S, W, B):
        half = W // 2
        if t_seg.shape[1] == S + W:          # pre-framed wide window
            tpad = t_seg
        else:
            tpad = jnp.full((B, S + W), T_SENTINEL, dtype=q_seg.dtype)
            tpad = tpad.at[:, half:half + t_seg.shape[1]].set(t_seg)
        block_b = 128   # fastest measured tile; larger blocks LOSE (v5e)
        return dp_segment_best_pallas(q_seg, tpad, tmax, seg_q, active,
                                      S=S, W=W, block_b=block_b,
                                      with_moves=want_moves)
    rows, moves = banded_dp_segment(q_seg, t_seg, tmax, W)
    r_end, w_end, j_end, d_seg, ind = pick_end_local(rows, seg_q, tmax, W)
    return (moves if want_moves else None), r_end, w_end, j_end, d_seg, ind


class ExtensionResult(NamedTuple):
    q_adv: jnp.ndarray     # query bases consumed from the start point
    t_adv: jnp.ndarray     # target bases consumed
    dist: jnp.ndarray      # accumulated edit distance
    matches: jnp.ndarray   # accumulated exact matches on the traceback path
    align_len: jnp.ndarray # accumulated alignment columns
    n_segs: jnp.ndarray    # DP segments this lane actually computed (the
                           # USEFUL-cell surface: issued cells count padded
                           # and dead lanes too — VERDICT r4 weak #3)


def _extend_direction_impl(q_pad, t_pad, q0, t0, qlen, tlen, *, S, W,
                           max_segs, min_seg_identity, collect_ops):
    """Segmented banded extension in one direction (SURVEY.md §3.5 loop).

    q_pad/t_pad are sentinel-padded so every dynamic slice below stays in
    bounds: q_pad [B, >= max(q0)+qlen+S]; t_pad carries a W//2 sentinel
    PREFIX (offsets t0 are relative to it) and a tail so that
    [B, >= W//2 + max(t0)+tlen+S+W] — the per-segment window gather then
    directly produces the kernel's framed [B, S+W] layout.
    q0/t0: starting offsets of the extension; qlen/tlen: bases available in
    this direction.  A segment whose identity falls below min_seg_identity is
    rolled back and the extension stops (TODO(ref): exact reference stop rule
    unknown; it stops when alignment quality degrades).

    With collect_ops, also returns per-segment op tapes
    (ops, qi, tj, n_cols, qoff_before, toff_before, applied), each with a
    leading max_segs axis — the raw material for consensus tags.
    """
    B = q_pad.shape[0]
    half = W // 2

    def seg_step(state, _):
        qoff, toff, dist, matches, alen, nsegs, active = state
        seg_q = jnp.clip(qlen - qoff, 0, S).astype(jnp.int32)
        rem_t = jnp.clip(tlen - toff, 0, S + half).astype(jnp.int32)

        q_seg = jax.vmap(
            lambda row, o: jax.lax.dynamic_slice(row, (o,), (S,))
        )(q_pad, (q0 + qoff).astype(jnp.int32))
        # t_pad carries a W//2 sentinel PREFIX (see the _pair_batch pads):
        # one gather yields the kernel's framed [B, S+W] window — no
        # per-segment tpad re-materialisation in dp_segment_best.
        t_seg = jax.vmap(
            lambda row, o: jax.lax.dynamic_slice(row, (o,), (S + W,))
        )(t_pad, (t0 + toff).astype(jnp.int32))

        moves, r_end, w_end, j_end, d_seg, ind_seg = dp_segment_best(
            q_seg, t_seg, rem_t, seg_q, S, W, want_moves=collect_ops,
            active=active)
        # closed-form match/column counts from the packed DP value (no
        # traceback needed): matches = (qc + jc + indels)/2 - d.
        m_seg = jnp.maximum((r_end + j_end + ind_seg) // 2 - d_seg, 0)
        a_seg = m_seg + d_seg

        ident = m_seg / jnp.maximum(a_seg, 1)
        ok = active & (r_end + j_end > 0) & (d_seg < INF) & (
            (ident >= min_seg_identity) | (a_seg < 32))
        qoff2 = jnp.where(ok, qoff + r_end, qoff)
        toff2 = jnp.where(ok, toff + j_end, toff)
        dist2 = jnp.where(ok, dist + d_seg, dist)
        m2 = jnp.where(ok, matches + m_seg, matches)
        a2 = jnp.where(ok, alen + a_seg, alen)
        # Keep extending while the best-scoring cell is near the segment end
        # (the unconsumed tail, e.g. a trailing error burst, is re-aligned by
        # the next, re-centred segment).  A best cell well inside the segment
        # means quality genuinely degraded there: stop, already trimmed.
        slack = max(1, S // 4)
        active2 = (ok & (r_end >= seg_q - slack) & (r_end >= 1)
                   & (qoff2 < qlen) & (toff2 < tlen))
        nsegs2 = nsegs + active.astype(jnp.int32)
        ys = None
        if collect_ops:
            # store only the packed moves + endpoints here; the tracebacks
            # of all segments are independent and run BATCHED after the
            # scan (one vmapped pass over G*B lanes instead of G sequential
            # MAXC-step loops — the per-segment form measured ~10x slower)
            ys = (moves, r_end, w_end, qoff, toff, ok)
        return (qoff2, toff2, dist2, m2, a2, nsegs2, active2), ys

    zeros = jnp.zeros((B,), jnp.int32)
    init = (zeros, zeros, zeros, zeros, zeros, zeros,
            (qlen > 0) & (tlen > 0))
    if collect_ops:
        (qoff, toff, dist, matches, alen, nsegs, _), raw = jax.lax.scan(
            seg_step, init, None, length=max_segs)
        # raw = (moves, r_end, w_end, qoff_before, toff_before, ok); the
        # caller runs ONE traceback over both directions' segments combined
        # (the serial MAXC-step walk is latency-bound, so separate walks
        # per direction doubled its cost).
        ys = raw
    else:
        # early exit once every pair has stopped extending: most pairs use
        # far fewer than max_segs segments, and DP cost scales with the max
        # active segment count in the batch, not the worst case.
        def cond(state):
            n, st = state
            return (n < max_segs) & jnp.any(st[6])

        def body(state):
            n, st = state
            st2, _ = seg_step(st, None)
            return n + 1, st2

        _, (qoff, toff, dist, matches, alen, nsegs, _) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), init))
        ys = None
    return ExtensionResult(qoff, toff, dist, matches, alen, nsegs), ys


@partial(jax.jit, static_argnames=("S", "W", "max_segs", "min_seg_identity"))
def extend_direction(q_pad: jnp.ndarray, t_pad: jnp.ndarray,
                     q0: jnp.ndarray, t0: jnp.ndarray,
                     qlen: jnp.ndarray, tlen: jnp.ndarray,
                     *, S: int = C.ALIGN_SEGMENT, W: int = C.ALIGN_BAND,
                     max_segs: int = 64,
                     min_seg_identity: float = C.MIN_SEGMENT_IDENTITY
                     ) -> ExtensionResult:
    res, _ = _extend_direction_impl(
        q_pad, t_pad, q0, t0, qlen, tlen, S=S, W=W, max_segs=max_segs,
        min_seg_identity=min_seg_identity, collect_ops=False)
    return res


class PairAlignment(NamedTuple):
    """Both-direction extension of a seed; coords in the scanned orientation."""

    qbeg: jnp.ndarray
    qend: jnp.ndarray
    tbeg: jnp.ndarray
    tend: jnp.ndarray
    dist: jnp.ndarray
    matches: jnp.ndarray
    align_len: jnp.ndarray
    identity: jnp.ndarray  # float32 percent
    n_segs: jnp.ndarray    # int32: DP segments actually computed, both dirs


def _pair_batch_impl(q, t, qlen, tlen, qseed, tseed, *, S, W, max_segs,
                     min_seg_identity, collect_ops, max_segs_left=0):
    B, Lq = q.shape
    Lt = t.shape[1]
    max_segs_left = max_segs_left or max_segs

    def pad(a, extra, sentinel, prefix=0):
        out = jnp.full((B, prefix + a.shape[1] + extra), sentinel,
                       dtype=a.dtype)
        return out.at[:, prefix:prefix + a.shape[1]].set(a)

    # mask out the padded tails so flipped rows can't leak real-looking bases
    col = jnp.arange(Lq, dtype=jnp.int32)
    qm = jnp.where(col[None, :] < qlen[:, None], q, Q_SENTINEL).astype(q.dtype)
    colt = jnp.arange(Lt, dtype=jnp.int32)
    tm = jnp.where(colt[None, :] < tlen[:, None], t, T_SENTINEL).astype(t.dtype)

    q_fwd = pad(qm, S, Q_SENTINEL)
    t_fwd = pad(tm, S + W, T_SENTINEL, prefix=W // 2)
    q_rev = pad(jnp.flip(qm, axis=1), S, Q_SENTINEL)
    t_rev = pad(jnp.flip(tm, axis=1), S + W, T_SENTINEL, prefix=W // 2)

    if not collect_ops:
        # counts path: BOTH directions as one 2B-lane batch — the early-exit
        # while_loop then runs max(left, right) segment steps instead of
        # left + right, and the DP grid amortises better.  (The ops path
        # keeps directions separate for per-direction segment budgets.)
        both, _ = _extend_direction_impl(
            jnp.concatenate([q_fwd, q_rev], axis=0),
            jnp.concatenate([t_fwd, t_rev], axis=0),
            jnp.concatenate([qseed, Lq - qseed]),
            jnp.concatenate([tseed, Lt - tseed]),
            jnp.concatenate([qlen - qseed, qseed]),
            jnp.concatenate([tlen - tseed, tseed]),
            S=S, W=W, max_segs=max(max_segs, max_segs_left),
            min_seg_identity=min_seg_identity, collect_ops=False)
        right = ExtensionResult(*(x[:B] for x in both))
        left = ExtensionResult(*(x[B:] for x in both))
        right_raw = left_raw = None
    else:
        right, right_raw = _extend_direction_impl(
            q_fwd, t_fwd, qseed, tseed, qlen - qseed, tlen - tseed,
            S=S, W=W, max_segs=max_segs, min_seg_identity=min_seg_identity,
            collect_ops=collect_ops)
        left, left_raw = _extend_direction_impl(
            q_rev, t_rev, Lq - qseed, Lt - tseed, qseed, tseed,
            S=S, W=W, max_segs=max_segs_left,
            min_seg_identity=min_seg_identity, collect_ops=collect_ops)

    right_ys = left_ys = None
    if collect_ops:
        # one batched traceback over BOTH directions' segments (2*max_segs
        # lanes, a single serial walk) with the identity-gated tape width
        TC = max_tape_cols(S, W, min_seg_identity)
        moves2, r2, w2, qo2, to2, ok2 = [
            jnp.concatenate([r, l], axis=0)
            for r, l in zip(right_raw, left_raw)]
        ops2, qi2, tj2, nc2 = jax.vmap(
            lambda m, r, w: traceback_ops(m, r, w, W, max_cols=TC))(
            moves2, r2, w2)
        nc2 = jnp.where(ok2, nc2, 0)
        G = max_segs
        right_ys = (ops2[:G], qi2[:G], tj2[:G], nc2[:G], qo2[:G], to2[:G],
                    ok2[:G])
        left_ys = (ops2[G:], qi2[G:], tj2[G:], nc2[G:], qo2[G:], to2[G:],
                   ok2[G:])

    matches = left.matches + right.matches
    alen = left.align_len + right.align_len
    identity = 100.0 * matches / jnp.maximum(alen, 1)
    pa = PairAlignment(
        qbeg=qseed - left.q_adv, qend=qseed + right.q_adv,
        tbeg=tseed - left.t_adv, tend=tseed + right.t_adv,
        dist=left.dist + right.dist, matches=matches, align_len=alen,
        identity=identity.astype(jnp.float32),
        n_segs=left.n_segs + right.n_segs)
    return pa, right_ys, left_ys


@partial(jax.jit, static_argnames=("S", "W", "max_segs", "min_seg_identity"))
def extend_pair_batch(q: jnp.ndarray, t: jnp.ndarray,
                      qlen: jnp.ndarray, tlen: jnp.ndarray,
                      qseed: jnp.ndarray, tseed: jnp.ndarray,
                      *, S: int = C.ALIGN_SEGMENT, W: int = C.ALIGN_BAND,
                      max_segs: int = 64,
                      min_seg_identity: float = C.MIN_SEGMENT_IDENTITY
                      ) -> PairAlignment:
    """Extend candidate seeds both directions (SURVEY.md §3.1 HOT LOOP 2).

    q: uint8 [B, Lq] queries in scanned orientation; t: uint8 [B, Lt] targets
    (forward volume orientation); seeds from the DDF scan.
    """
    pa, _, _ = _pair_batch_impl(q, t, qlen, tlen, qseed, tseed, S=S, W=W,
                                max_segs=max_segs,
                                min_seg_identity=min_seg_identity,
                                collect_ops=False)
    return pa


def _pair_batch_rows_impl(q, t, qlen, tlen, qseed, tseed, *, S, W, max_segs,
                          min_seg_identity, max_segs_left):
    """extend + ROW-MAJOR traceback of every segment (no op tapes).

    Same DP as extend_pair_batch_with_ops, but the tracebacks run
    :func:`traceback_rows` (gather-free) and the per-segment outputs stay in
    row form — the raw material for the banded consensus tag emitter
    (ops/consensus_banded.py), which never builds the
    [G, B, MAXC] column tapes at all.  Returns (pa, right_rows, left_rows);
    each rows tuple is (mv, h, wo [G, B, S], w0 [G, B], qoff, toff, ok
    [G, B]) in the direction's local coordinates.
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    max_segs_left = max_segs_left or max_segs

    def pad(a, extra, sentinel, prefix=0):
        out = jnp.full((B, prefix + a.shape[1] + extra), sentinel,
                       dtype=a.dtype)
        return out.at[:, prefix:prefix + a.shape[1]].set(a)

    col = jnp.arange(Lq, dtype=jnp.int32)
    qm = jnp.where(col[None, :] < qlen[:, None], q, Q_SENTINEL).astype(q.dtype)
    colt = jnp.arange(Lt, dtype=jnp.int32)
    tm = jnp.where(colt[None, :] < tlen[:, None], t, T_SENTINEL).astype(t.dtype)
    q_fwd = pad(qm, S, Q_SENTINEL)
    t_fwd = pad(tm, S + W, T_SENTINEL, prefix=W // 2)
    q_rev = pad(jnp.flip(qm, axis=1), S, Q_SENTINEL)
    t_rev = pad(jnp.flip(tm, axis=1), S + W, T_SENTINEL, prefix=W // 2)

    right, right_raw = _extend_direction_impl(
        q_fwd, t_fwd, qseed, tseed, qlen - qseed, tlen - tseed,
        S=S, W=W, max_segs=max_segs, min_seg_identity=min_seg_identity,
        collect_ops=True)
    left, left_raw = _extend_direction_impl(
        q_rev, t_rev, Lq - qseed, Lt - tseed, qseed, tseed,
        S=S, W=W, max_segs=max_segs_left,
        min_seg_identity=min_seg_identity, collect_ops=True)

    moves2, r2, w2, qo2, to2, ok2 = [
        jnp.concatenate([r, l], axis=0) for r, l in zip(right_raw, left_raw)]
    # ONE flat walk over every (segment, pair) lane instead of a vmap over
    # segments: the scan-under-vmap form MISCOMPILES on XLA:TPU at larger
    # segment counts (G=32/S=512: trajectories silently drift cols while
    # emitting plausible op sequences — caught 2026-08-19 by the banded
    # full-scale accuracy drop; CPU was exact).  Flat lanes lower cleanly.
    G2 = moves2.shape[0]
    S_m, Wp = moves2.shape[1], moves2.shape[2]
    flat_m = jnp.moveaxis(moves2, 0, -1).reshape(S_m, Wp, B * G2)
    flat_r = r2.T.reshape(-1)
    flat_w = w2.T.reshape(-1)
    mv2, h2, wo2, w02 = traceback_rows(flat_m, flat_r, flat_w, W)
    unflat = lambda a: jnp.moveaxis(a.reshape(B, G2, -1), 1, 0)
    mv2, h2, wo2 = unflat(mv2), unflat(h2), unflat(wo2)
    w02 = w02.reshape(B, G2).T
    G = max_segs
    right_rows = (mv2[:G], h2[:G], wo2[:G], w02[:G], qo2[:G], to2[:G],
                  ok2[:G])
    left_rows = (mv2[G:], h2[G:], wo2[G:], w02[G:], qo2[G:], to2[G:],
                 ok2[G:])

    matches = left.matches + right.matches
    alen = left.align_len + right.align_len
    identity = 100.0 * matches / jnp.maximum(alen, 1)
    pa = PairAlignment(
        qbeg=qseed - left.q_adv, qend=qseed + right.q_adv,
        tbeg=tseed - left.t_adv, tend=tseed + right.t_adv,
        dist=left.dist + right.dist, matches=matches, align_len=alen,
        identity=identity.astype(jnp.float32),
        n_segs=left.n_segs + right.n_segs)
    return pa, right_rows, left_rows


@partial(jax.jit, static_argnames=("S", "W", "max_segs", "min_seg_identity",
                                   "max_segs_left"))
def extend_pair_batch_rows(q: jnp.ndarray, t: jnp.ndarray,
                           qlen: jnp.ndarray, tlen: jnp.ndarray,
                           qseed: jnp.ndarray, tseed: jnp.ndarray,
                           *, S: int = C.ALIGN_SEGMENT,
                           W: int = C.ALIGN_BAND, max_segs: int = 64,
                           min_seg_identity: float = C.MIN_SEGMENT_IDENTITY,
                           max_segs_left: int = 0):
    """Jitted :func:`_pair_batch_rows_impl` (see its docstring)."""
    return _pair_batch_rows_impl(q, t, qlen, tlen, qseed, tseed, S=S, W=W,
                                 max_segs=max_segs,
                                 min_seg_identity=min_seg_identity,
                                 max_segs_left=max_segs_left)


@partial(jax.jit, static_argnames=("S", "W", "max_segs", "min_seg_identity",
                                   "max_segs_left"))
def extend_pair_batch_with_ops(q: jnp.ndarray, t: jnp.ndarray,
                               qlen: jnp.ndarray, tlen: jnp.ndarray,
                               qseed: jnp.ndarray, tseed: jnp.ndarray,
                               *, S: int = C.ALIGN_SEGMENT,
                               W: int = C.ALIGN_BAND, max_segs: int = 64,
                               min_seg_identity: float = C.MIN_SEGMENT_IDENTITY,
                               max_segs_left: int = 0):
    """extend_pair_batch + per-segment op tapes for consensus (mecat2cns).

    Returns (PairAlignment, right_tapes, left_tapes); each tapes tuple is
    (ops[G,B,MAXC], qi, tj, n_cols[G,B], qoff_before, toff_before,
    applied[G,B]) in the respective direction's local coordinates (left
    direction: positions in the REVERSED prefixes).  G is max_segs for the
    right tapes and max_segs_left (default max_segs) for the left tapes —
    callers that know the seed's position in the template can budget each
    direction separately, and every per-segment cost (DP, traceback lanes,
    tag-fold width) scales with the budget.
    """
    return _pair_batch_impl(q, t, qlen, tlen, qseed, tseed, S=S, W=W,
                            max_segs=max_segs,
                            min_seg_identity=min_seg_identity,
                            collect_ops=True, max_segs_left=max_segs_left)

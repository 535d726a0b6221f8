"""DDF (distance-difference-factor) candidate filter — batched, sort-based.

Counterpart of the reference's pseudo-linear candidate scan (SURVEY.md §0 idea
1 and §3.1 HOT LOOP 1; reference ``src/mecat2pw/pw_impl.*`` — unverified,
mount empty).  The reference walks each read's k-mers one thread at a time,
probing a chained hash table and scatter-accumulating per-(target, block)
scores in scalar RAM.  Random scatter is the TPU's weak spot, so this
implementation restates the same math as fixed-shape dataflow:

1. sample query k-mers at a stride (``KMER_SCAN_STRIDE``),
2. probe the CSR index — a fixed-[B, Q, O] gather,
3. map hits to (target read, diagonal = qpos − tpos) pairs,
4. **sort** hits lexicographically by (target, diagonal-bin) with
   ``lax.sort`` (two int32 keys — no 64-bit key packing needed),
5. score = run length of equal (target, bin) keys (segment-sum),
6. ``lax.top_k`` run starts → candidates, each with a seed hit taken from
   the middle of its run (the gapped-extension start point, mecat2pw ``-g``).

Hits whose diagonals agree within ``DDF_DIAG_BIN`` are exactly the
"position-consistent" hits of the reference's DDF scoring; binning quantises
the |Δq−Δt| tolerance (TODO(ref): the reference uses a relative threshold —
re-derive once the mount is populated).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..index.kmer_index import global_to_read, kmer_codes_jnp, probe_index

#: diagonals are shifted by this before binning so they are non-negative
#: (supports reads/genome chunks up to 2^20 bases on either side).
_DIAG_SHIFT = 1 << 20
_INVALID_RID = jnp.int32(2 ** 31 - 1)


class Candidates(NamedTuple):
    """Top-n overlap candidates per query (fixed shape [B, N])."""

    target: jnp.ndarray   # int32 target read id within the index
    score: jnp.ndarray    # int32 DDF block score (k-mer hits in the bin)
    qseed: jnp.ndarray    # int32 query position of the seed hit
    tseed: jnp.ndarray    # int32 target (local) position of the seed hit
    valid: jnp.ndarray    # bool


@partial(jax.jit, static_argnames=("k", "stride", "max_occ", "num_candidates",
                                   "diag_bin"))
def scan_candidates(
    bases: jnp.ndarray,        # uint8 [B, L] query bases (already oriented)
    lengths: jnp.ndarray,      # int32 [B]
    offsets: jnp.ndarray,      # index CSR offsets
    positions: jnp.ndarray,    # index positions
    read_starts: jnp.ndarray,  # int32 [n_reads] of the indexed volume
    read_lengths: jnp.ndarray, # int32 [n_reads]
    cutoff: jnp.ndarray,       # int32 scalar high-frequency k-mer cutoff
    self_id: jnp.ndarray,      # int32 [B] target id to exclude (-1: none)
    *,
    k: int = C.KMER_SIZE,
    stride: int = C.KMER_SCAN_STRIDE,
    max_occ: int = C.MAX_OCC_PER_KMER,
    num_candidates: int = C.DEFAULT_NUM_CANDIDATES,
    diag_bin: int = C.DDF_DIAG_BIN,
) -> Candidates:
    B, L = bases.shape
    Q = (L + stride - 1) // stride
    H = Q * max_occ

    # -- 1. sampled query k-mer codes ---------------------------------------
    all_codes = kmer_codes_jnp(bases, k)                      # [B, L]
    qpos = jnp.arange(Q, dtype=jnp.int32) * stride            # [Q]
    codes = all_codes[:, ::stride][:, :Q]                     # [B, Q]
    qvalid = qpos[None, :] + k <= lengths[:, None]            # [B, Q]

    # -- 2. probe ------------------------------------------------------------
    hit_pos, hit_valid = probe_index(offsets, positions, codes, qvalid,
                                     cutoff, max_occ=max_occ)  # [B, Q, O]

    # -- 3. hits → (target read, diagonal) -----------------------------------
    rid, toff = global_to_read(read_starts, read_lengths,
                               hit_pos.reshape(B, H))
    hqpos = jnp.broadcast_to(qpos[None, :, None],
                             (B, Q, max_occ)).reshape(B, H)
    hvalid = hit_valid.reshape(B, H)
    hvalid &= rid != self_id[:, None]
    dbin = ((hqpos - toff + _DIAG_SHIFT) // diag_bin).astype(jnp.int32)

    # -- 4. lexicographic sort by (target, diagonal bin) ----------------------
    rid_key = jnp.where(hvalid, rid, _INVALID_RID)
    rid_s, dbin_s, qpos_s, toff_s = jax.lax.sort(
        (rid_key, dbin, hqpos, toff), num_keys=2, dimension=-1)
    svalid = rid_s != _INVALID_RID

    # -- 5. run-length scores -------------------------------------------------
    same_prev = jnp.zeros((B, H), dtype=bool).at[:, 1:].set(
        (rid_s[:, 1:] == rid_s[:, :-1]) & (dbin_s[:, 1:] == dbin_s[:, :-1]))
    is_start = svalid & ~same_prev
    run_id = jnp.cumsum(is_start.astype(jnp.int32), axis=-1) - 1  # [B, H]
    run_id_c = jnp.clip(run_id, 0, H - 1)
    brow = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, H))
    run_len = jnp.zeros((B, H), jnp.int32).at[brow, run_id_c].add(
        svalid.astype(jnp.int32))
    score_at_start = jnp.where(is_start, jnp.take_along_axis(
        run_len, run_id_c, axis=-1), 0)

    # -- 6. top-n candidates ---------------------------------------------------
    n = min(num_candidates, H)
    top_score, top_idx = jax.lax.top_k(score_at_start, n)     # [B, n]
    # seed = middle hit of the run (stable sort keeps within-run qpos order)
    seed_idx = jnp.minimum(top_idx + top_score // 2, H - 1)
    cand = Candidates(
        target=jnp.take_along_axis(rid_s, top_idx, axis=-1),
        score=top_score,
        qseed=jnp.take_along_axis(qpos_s, seed_idx, axis=-1),
        tseed=jnp.take_along_axis(toff_s, seed_idx, axis=-1),
        valid=top_score >= C.MIN_BLOCK_SCORE,
    )
    return cand

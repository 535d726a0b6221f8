"""Fused device-side overlap step: scan → candidate select → gather → extend.

This is the framework's "flagship forward step": one jit-compiled program
that takes a batch of query reads plus a device-resident volume (flat codes +
k-mer table) and returns scored, extended overlaps — the device side of
SURVEY.md §3.1 with no host round-trip between the DDF filter and the
aligner.  The host pipeline (pipeline/pw.py) currently stages through the
host for flexible filtering; this fused step is the performance path and the
unit that gets sharded across a mesh (parallel/).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..ops.align import extend_pair_batch
from ..ops.ddf import scan_candidates


class OverlapStepOut(NamedTuple):
    target: jnp.ndarray    # int32 [B, N] target read ids (volume-local)
    score: jnp.ndarray     # int32 [B, N] DDF scores
    qbeg: jnp.ndarray      # int32 [B, N] (scanned-orientation coords)
    qend: jnp.ndarray
    tbeg: jnp.ndarray
    tend: jnp.ndarray
    identity: jnp.ndarray  # float32 [B, N]
    valid: jnp.ndarray     # bool [B, N] passed score/identity/size filters
    qseed: jnp.ndarray     # int32 [B, N] seed point (scanned orientation)
    tseed: jnp.ndarray     # int32 [B, N] seed point on the forward target


@partial(jax.jit, static_argnames=(
    "k", "stride", "max_occ", "num_candidates", "diag_bin", "L_target",
    "S", "W", "max_segs", "min_align_size", "min_identity"))
def overlap_step(
    bases: jnp.ndarray,          # uint8 [B, L] oriented query bases
    lengths: jnp.ndarray,        # int32 [B]
    self_id: jnp.ndarray,        # int32 [B]
    vol_codes: jnp.ndarray,      # uint8 [total_bases] flat volume
    offsets: jnp.ndarray,        # k-mer CSR
    pos_rid: jnp.ndarray,        # occurrence read ids
    pos_loc: jnp.ndarray,        # occurrence in-read offsets
    read_starts: jnp.ndarray,    # int32 [n_reads]
    read_lengths: jnp.ndarray,   # int32 [n_reads]
    cutoff: jnp.ndarray,         # int32 scalar
    *,
    k: int = C.KMER_SIZE,
    stride: int = C.KMER_SCAN_STRIDE,
    max_occ: int = C.MAX_OCC_PER_KMER,
    num_candidates: int = 16,
    diag_bin: int = C.DDF_DIAG_BIN,
    L_target: int = 4096,
    S: int = C.ALIGN_SEGMENT,
    W: int = C.ALIGN_BAND,
    max_segs: int = 16,
    min_align_size: int = C.DEFAULT_MIN_ALIGN_SIZE,
    min_identity: float = C.MIN_OVERLAP_IDENTITY,
) -> OverlapStepOut:
    B, L = bases.shape
    N = num_candidates

    cand = scan_candidates(
        bases, lengths, offsets, pos_rid, pos_loc,
        cutoff, self_id, k=k, stride=stride, max_occ=max_occ,
        num_candidates=N, diag_bin=diag_bin)

    # flatten [B, N] candidates into a [B*N] extension batch
    tgt = jnp.clip(cand.target, 0, read_starts.shape[0] - 1).reshape(-1)
    q_pairs = jnp.repeat(bases, N, axis=0)                 # [B*N, L]
    qlen_pairs = jnp.repeat(lengths, N)
    # target rows are CONTIGUOUS volume slices: a vmapped dynamic_slice is
    # ~35x faster than the equivalent [B*N, L] element gather on v5e
    t_start = read_starts[tgt].astype(jnp.int32)
    t_len = read_lengths[tgt].astype(jnp.int32)
    vol_pad = jnp.concatenate(
        [vol_codes, jnp.zeros(L_target, dtype=vol_codes.dtype)])
    rows = jax.vmap(
        lambda o: jax.lax.dynamic_slice(vol_pad, (o,), (L_target,)))(t_start)
    col = jnp.arange(L_target, dtype=jnp.int32)
    t_pairs = jnp.where(col[None, :] < t_len[:, None], rows, 0)

    res = extend_pair_batch(
        q_pairs, t_pairs, qlen_pairs, t_len,
        jnp.maximum(cand.qseed.reshape(-1), 0),
        jnp.minimum(jnp.maximum(cand.tseed.reshape(-1), 0),
                    jnp.maximum(t_len - 1, 0)),
        S=S, W=W, max_segs=max_segs)

    qspan = (res.qend - res.qbeg).reshape(B, N)
    tspan = (res.tend - res.tbeg).reshape(B, N)
    ok = (cand.valid
          & (res.identity.reshape(B, N) >= min_identity)
          & (jnp.minimum(qspan, tspan) >= min_align_size))
    return OverlapStepOut(
        target=cand.target, score=cand.score,
        qbeg=res.qbeg.reshape(B, N), qend=res.qend.reshape(B, N),
        tbeg=res.tbeg.reshape(B, N), tend=res.tend.reshape(B, N),
        identity=res.identity.reshape(B, N), valid=ok,
        qseed=cand.qseed, tseed=cand.tseed)

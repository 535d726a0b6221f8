"""mecat2pw equivalent: all-vs-all pairwise overlap detection.

Counterpart of the reference tool (SURVEY.md §2.1 component 2 and call stack
§3.1; reference ``src/mecat2pw/*`` — unverified, mount empty).  The volume
structure is the reference's (index volume i, stream volumes j >= i; queries
from volume j probe volume i's k-mer table), but the inner loop is device
dataflow instead of pthreads: reads are scanned in padded batches through the
DDF filter (ops/ddf.py), candidates are merged across strands on the host,
and surviving pairs are extended in fixed-size batches through the banded
wavefront aligner (ops/align.py).

Task modes mirror the reference CLI: ``-j 0`` emits extension candidates
(seed points, no alignment), ``-j 1`` emits full M4 overlaps.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..index.kmer_index import build_index
from ..io.m4 import CandidateRecord, M4Record, format_block
from ..io.packed_db import PackedDB
from ..ops.align import extend_pair_batch
from ..ops.ddf import scan_candidates
from ..utils.log import get_logger
from .common import (bucket_length, gather_rows, max_segs_for, oriented_batch,
                     pad_to_batch)

log = get_logger("pw")


@dataclass
class PwOptions:
    """CLI-mirroring options (reference mecat2pw flags, SURVEY.md App. A)."""

    task: int = 1                      # -j: 0 candidates, 1 M4 overlaps
    num_candidates: int = C.DEFAULT_NUM_CANDIDATES       # -n
    min_align_size: int = C.DEFAULT_MIN_ALIGN_SIZE       # -a
    min_identity: float = C.MIN_OVERLAP_IDENTITY
    kmer_size: int = C.KMER_SIZE
    scan_stride: int = C.KMER_SCAN_STRIDE
    max_occ: int = C.MAX_OCC_PER_KMER                    # ~ -k freq cutoff
    diag_bin: int = C.DDF_DIAG_BIN
    volume_bases: int = C.DEFAULT_VOLUME_BASES
    scan_batch: int = C.DEFAULT_SCAN_BATCH
    extend_batch: int = C.DEFAULT_EXTEND_BATCH
    align_segment: int = C.ALIGN_SEGMENT
    align_band: int = C.ALIGN_BAND
    min_block_score: int = C.MIN_BLOCK_SCORE
    print_ext: int = 0                 # -g: 1 = two extra seed columns


@dataclass
class PwStats:
    reads: int = 0
    candidates: int = 0
    extended: int = 0
    overlaps: int = 0
    seconds: float = 0.0
    cells: int = 0      # DP cells computed (for speed-of-light accounting)


def _merge_strand_candidates(cands_by_strand, lens, n_keep: int,
                             min_score: int):
    """Host merge of per-strand candidate lists → top-n per query row.

    Returns an array [n_pairs, 6]: (row, strand, target, score, qseed, tseed).
    """
    rows = []
    for strand, cand in cands_by_strand:
        target = np.asarray(cand.target)
        score = np.asarray(cand.score)
        qseed = np.asarray(cand.qseed)
        tseed = np.asarray(cand.tseed)
        valid = np.asarray(cand.valid) & (score >= min_score)
        B, N = target.shape
        r, c = np.nonzero(valid)
        rows.append(np.stack([
            r, np.full_like(r, strand), target[r, c], score[r, c],
            qseed[r, c], tseed[r, c]], axis=1))
    allc = np.concatenate(rows, axis=0) if rows else np.zeros((0, 6), int)
    if len(allc) == 0:
        return allc
    # keep the top n_keep by score per query row (stable by score desc)
    order = np.lexsort((-allc[:, 3], allc[:, 0]))
    allc = allc[order]
    out = []
    row_ids, starts = np.unique(allc[:, 0], return_index=True)
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(allc)
        out.append(allc[s:min(e, s + n_keep)])
    return np.concatenate(out, axis=0)


def process_query_batch(db: PackedDB, vol_base: int, dev, cutoff: int,
                        query_ids: List[int], opts: PwOptions,
                        vol_db: PackedDB, stats: PwStats,
                        L_query: int, L_target: int):
    """Scan + (optionally) extend one batch of query reads against a volume.

    Returns (m4_records, candidate_records) — one of them empty per task.
    """
    B = opts.scan_batch
    fwd, rev, lens = oriented_batch(db, query_ids, L_query)
    fwd_p, rev_p, lens_p = pad_to_batch([fwd, rev, lens], B)
    # exclude self-hits when the query read lives in the indexed volume
    self_ids = np.array(
        [qid - vol_base if vol_base <= qid < vol_base + vol_db.n_reads else -1
         for qid in query_ids], dtype=np.int32)
    self_p, = pad_to_batch([self_ids], B)

    cands_by_strand = []
    for strand, bases in ((0, fwd_p), (1, rev_p)):
        cand = scan_candidates(
            jnp.asarray(bases), jnp.asarray(lens_p), dev["offsets"],
            dev["pos_rid"], dev["pos_loc"],
            jnp.int32(cutoff), jnp.asarray(self_p),
            k=opts.kmer_size, stride=opts.scan_stride, max_occ=opts.max_occ,
            num_candidates=opts.num_candidates, diag_bin=opts.diag_bin)
        cands_by_strand.append((strand, cand))

    pairs = _merge_strand_candidates(cands_by_strand, lens_p,
                                     opts.num_candidates,
                                     opts.min_block_score)
    pairs = pairs[pairs[:, 0] < len(query_ids)] if len(pairs) else pairs
    stats.candidates += len(pairs)

    m4_out: List[M4Record] = []
    cand_out: List[CandidateRecord] = []
    if len(pairs) == 0:
        return m4_out, cand_out

    if opts.task == 0:
        for row, strand, tgt, score, qseed, tseed in pairs:
            qid = query_ids[row]
            cand_out.append(CandidateRecord(
                qid=qid + 1, sid=vol_base + tgt + 1, score=int(score),
                qdir=int(strand), qext=int(qseed), qsize=int(lens[row]),
                sdir=0, sext=int(tseed), ssize=int(vol_db.lengths[tgt])))
        return m4_out, cand_out

    # -- extension batches ----------------------------------------------------
    P = opts.extend_batch
    S, W = opts.align_segment, opts.align_band
    msegs = max_segs_for(max(L_query, L_target), S)
    oriented = {0: fwd, 1: rev}
    for ofs in range(0, len(pairs), P):
        chunk = pairs[ofs:ofs + P]
        n = len(chunk)
        rowi = chunk[:, 0].astype(np.int64)
        strand = chunk[:, 1]
        tgt = chunk[:, 2].astype(np.int64)
        q_b = np.where(strand[:, None] == 0, fwd[rowi], rev[rowi])
        t_b = gather_rows(vol_db.codes, vol_db.starts, vol_db.lengths,
                          tgt, L_target)
        qlen_b = lens[rowi].astype(np.int32)
        tlen_b = vol_db.lengths[tgt].astype(np.int32)
        qs_b = chunk[:, 4].astype(np.int32)
        ts_b = chunk[:, 5].astype(np.int32)
        q_b, t_b, qlen_b, tlen_b, qs_b, ts_b = pad_to_batch(
            [q_b, t_b, qlen_b, tlen_b, qs_b, ts_b], P)
        res = extend_pair_batch(
            jnp.asarray(q_b), jnp.asarray(t_b), jnp.asarray(qlen_b),
            jnp.asarray(tlen_b), jnp.asarray(qs_b), jnp.asarray(ts_b),
            S=S, W=W, max_segs=msegs)
        stats.extended += n
        stats.cells += 2 * msegs * S * W * P

        qbeg = np.asarray(res.qbeg)[:n]
        qend = np.asarray(res.qend)[:n]
        tbeg = np.asarray(res.tbeg)[:n]
        tend = np.asarray(res.tend)[:n]
        ident = np.asarray(res.identity)[:n]

        qspan = qend - qbeg
        tspan = tend - tbeg
        keep = ((ident >= opts.min_identity)
                & (np.minimum(qspan, tspan) >= opts.min_align_size))
        best = {}
        for i in np.nonzero(keep)[0]:
            qid = query_ids[int(chunk[i, 0])]
            sid = vol_base + int(chunk[i, 2])
            key = (qid, sid, int(chunk[i, 1]))
            if key not in best or qspan[i] + tspan[i] > best[key][0]:
                best[key] = (qspan[i] + tspan[i], i)
        for (qid, sid, sdir), (_, i) in sorted(best.items()):
            qsize = int(lens[int(chunk[i, 0])])
            ssize = int(vol_db.lengths[int(chunk[i, 2])])
            if sdir == 0:
                qs, qe = int(qbeg[i]), int(qend[i])
            else:  # query was scanned reverse-complemented; normalise to fwd
                qs, qe = qsize - int(qend[i]), qsize - int(qbeg[i])
            m4_out.append(M4Record(
                qid=qid + 1, sid=sid + 1, identity=float(ident[i]),
                score=int(chunk[i, 3]), qstrand=0, qstart=qs, qend=qe,
                qsize=qsize, sstrand=sdir, sstart=int(tbeg[i]),
                send=int(tend[i]), ssize=ssize,
                qext=int(chunk[i, 4]) if opts.print_ext else None,
                sext=int(chunk[i, 5]) if opts.print_ext else None))
    stats.overlaps += len(m4_out)
    return m4_out, cand_out


def process_query_batch_fused(db: PackedDB, vol_base: int, dev, cutoff: int,
                              query_ids: List[int], opts: PwOptions,
                              vol_db: PackedDB, stats: PwStats,
                              L_query: int, L_target: int
                              ) -> List[M4Record]:
    """Fused-device variant of :func:`process_query_batch` for task=1.

    One jit-compiled launch per strand (scan → top-n → extend, no host
    round-trip between filter and aligner; pipeline/device_step.py); the
    host only converts the valid [B, N] outputs to M4 records.  Slightly
    more sensitive than the staged path: candidates are capped top-n PER
    STRAND rather than per read (same semantics as parallel/dist.py).
    """
    import jax.numpy as jnp

    from .device_step import overlap_step

    B = opts.scan_batch
    fwd, rev, lens = oriented_batch(db, query_ids, L_query)
    fwd_p, rev_p, lens_p = pad_to_batch([fwd, rev, lens], B)
    lens_p = lens_p.copy()
    lens_p[len(query_ids):] = 0
    self_ids = np.array(
        [qid - vol_base if vol_base <= qid < vol_base + vol_db.n_reads else -1
         for qid in query_ids], dtype=np.int32)
    self_p, = pad_to_batch([self_ids], B)

    S, W = opts.align_segment, opts.align_band
    msegs = max_segs_for(max(L_query, L_target), S)
    best = {}
    for strand, bases in ((0, fwd_p), (1, rev_p)):
        out = overlap_step(
            jnp.asarray(bases), jnp.asarray(lens_p), jnp.asarray(self_p),
            dev["vol_codes"], dev["offsets"], dev["pos_rid"], dev["pos_loc"],
            dev["read_starts"], dev["read_lengths"], jnp.int32(cutoff),
            k=opts.kmer_size, stride=opts.scan_stride, max_occ=opts.max_occ,
            num_candidates=opts.num_candidates, diag_bin=opts.diag_bin,
            L_target=L_target, S=S, W=W, max_segs=msegs,
            min_align_size=opts.min_align_size,
            min_identity=opts.min_identity)
        valid = (np.asarray(out.valid)[:len(query_ids)]
                 & (np.asarray(out.score)[:len(query_ids)]
                    >= opts.min_block_score))
        tgt = np.asarray(out.target)[:len(query_ids)]
        score = np.asarray(out.score)[:len(query_ids)]
        qbeg = np.asarray(out.qbeg)[:len(query_ids)]
        qend = np.asarray(out.qend)[:len(query_ids)]
        tbeg = np.asarray(out.tbeg)[:len(query_ids)]
        tend = np.asarray(out.tend)[:len(query_ids)]
        ident = np.asarray(out.identity)[:len(query_ids)]
        oqseed = np.asarray(out.qseed)[:len(query_ids)]
        otseed = np.asarray(out.tseed)[:len(query_ids)]
        stats.candidates += int(valid.sum())
        stats.extended += int(valid.sum())
        for r, c in zip(*np.nonzero(valid)):
            qid = query_ids[r]
            sid = vol_base + int(tgt[r, c])
            qsize = int(lens[r])
            span = int(qend[r, c] - qbeg[r, c]) + int(tend[r, c] - tbeg[r, c])
            key = (qid, sid, strand)
            if key in best and best[key][0] >= span:
                continue
            if strand == 0:
                qs, qe = int(qbeg[r, c]), int(qend[r, c])
            else:
                qs, qe = qsize - int(qend[r, c]), qsize - int(qbeg[r, c])
            best[key] = (span, M4Record(
                qid=qid + 1, sid=sid + 1, identity=float(ident[r, c]),
                score=int(score[r, c]), qstrand=0, qstart=qs, qend=qe,
                qsize=qsize, sstrand=strand, sstart=int(tbeg[r, c]),
                send=int(tend[r, c]),
                ssize=int(vol_db.lengths[int(tgt[r, c])]),
                qext=int(oqseed[r, c]) if opts.print_ext else None,
                sext=int(otseed[r, c]) if opts.print_ext else None))
    m4s = [rec for _, rec in (best[k] for k in sorted(best))]
    stats.overlaps += len(m4s)
    return m4s


def _use_fused(opts: PwOptions) -> bool:
    import jax

    return (os.environ.get("MECAT_TPU_HOST_PW") != "1"
            and opts.task == 1 and jax.default_backend() == "tpu")


def run_pw(reads_path: str, out_path: str, wrk_dir: str,
           opts: Optional[PwOptions] = None, db: Optional[PackedDB] = None
           ) -> PwStats:
    """Full mecat2pw run: volumes × volumes, M4/candidate file out.

    Failure recovery (SURVEY.md §5): each volume pair writes an idempotent
    shard file ``<wrk>/pw_v{i}_v{j}.txt`` (atomic rename); a rerun skips
    completed shards and only re-processes the missing ones — the same
    artifact-granularity resume contract as the reference's volume files.
    """
    opts = opts or PwOptions()
    os.makedirs(wrk_dir, exist_ok=True)
    t0 = time.time()
    if db is None:
        db = PackedDB.from_fasta(reads_path)
    stats = PwStats(reads=db.n_reads)
    vols = db.split_volumes(opts.volume_bases)
    from ..utils.metrics import Metrics, profile_scope
    met = Metrics("pw")
    log.info("pw: %d reads, %d bases, %d volume(s)", db.n_reads,
             db.total_bases, len(vols))

    shard_paths = []
    with profile_scope("pw"):
        for vi, (va, vb) in enumerate(vols):
            pending = [vj for vj in range(vi, len(vols))
                       if not os.path.exists(
                           os.path.join(wrk_dir, f"pw_v{vi}_v{vj}.txt"))]
            shard_paths += [os.path.join(wrk_dir, f"pw_v{vi}_v{vj}.txt")
                            for vj in range(vi, len(vols))]
            if not pending:
                continue
            vol_db = db.subset(range(va, vb))
            with met.stage("index_build", volume=vi):
                idx = build_index(vol_db.codes, vol_db.starts,
                                  vol_db.lengths, k=opts.kmer_size)
                dev = idx.as_device_arrays()
                if _use_fused(opts):
                    dev["vol_codes"] = jnp.asarray(vol_db.codes)
            L_target = bucket_length(int(vol_db.lengths.max()))
            for vj in pending:
                qa, qb = vols[vj]
                shard = os.path.join(wrk_dir, f"pw_v{vi}_v{vj}.txt")
                L_query = bucket_length(int(db.lengths[qa:qb].max()))
                with met.stage("volume_pair", vi=vi, vj=vj), \
                        open(shard + ".tmp", "w") as fh:
                    for bs in range(qa, qb, opts.scan_batch):
                        qids = list(range(bs, min(qb, bs + opts.scan_batch)))
                        if _use_fused(opts):
                            m4s = process_query_batch_fused(
                                db, va, dev, idx.max_occ_cutoff, qids, opts,
                                vol_db, stats, L_query, L_target)
                            cands = []
                        else:
                            m4s, cands = process_query_batch(
                                db, va, dev, idx.max_occ_cutoff, qids, opts,
                                vol_db, stats, L_query, L_target)
                        fh.write(format_block(m4s))
                        fh.write(format_block(cands))
                os.replace(shard + ".tmp", shard)
                log.info("pw: volume %d vs %d done (%d candidates, "
                         "%d overlaps)", vi, vj, stats.candidates,
                         stats.overlaps)

    with open(out_path, "wb") as out:
        for p in shard_paths:
            with open(p, "rb") as fh:
                out.write(fh.read())
    stats.seconds = time.time() - t0
    met.set("reads", stats.reads)
    met.set("candidates", stats.candidates)
    met.set("overlaps", stats.overlaps)
    met.set("overlaps_per_s", stats.overlaps / max(stats.seconds, 1e-9))
    met.emit_summary()
    return stats

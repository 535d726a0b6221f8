"""Contig consensus (utgcns role): layout → backbone → polished contig.

Counterpart of mecat2canu's utgcns/libcns (SURVEY.md §2.2 component 15,
``mecat2canu/src/utgcns/`` — unverified, mount empty).  The reference runs a
pbdagcon-style POA per contig; here the same result is produced with the
framework's existing batched machinery:

1. **stitch**: walk the unitig layout left→right appending each read's
   non-overlapped suffix — a draft backbone whose error rate equals the
   (already corrected) read error rate;
2. **polish**: align every layout read (dovetail + re-attached contained)
   back to the backbone with the banded wavefront aligner (device, batched
   across reads), accumulate tag votes in a CnsTable, and emit the
   majority-vote sequence, keeping backbone bases where support coverage is
   thin (CnsTable.call_polished — no splitting at this stage).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..io.packed_db import PackedDB, revcomp
from ..ops.consensus import CnsTable, columns_to_tags, tapes_to_columns
from ..pipeline.common import bucket_length, max_segs_for, pad_to_batch
from ..utils.log import get_logger
from .unitig import Unitig

log = get_logger("ctgcns")


@dataclass
class CtgCnsOptions:
    polish: bool = True
    min_coverage: int = 2          # below this, keep backbone base
    extend_batch: int = 64
    align_segment: int = 512
    align_band: int = 128
    min_identity: float = 70.0


def _oriented(db: PackedDB, row) -> np.ndarray:
    r = db.read(row.read)
    return revcomp(r) if row.orient else r


def stitch_backbone(db: PackedDB, tig: Unitig) -> np.ndarray:
    """Draft contig from the dovetail layout (offsets are overlap-derived)."""
    rows = sorted((r for r in tig.rows if not r.contained),
                  key=lambda r: (r.offset, r.read))
    if not rows:
        return np.zeros(0, dtype=np.uint8)
    parts: List[np.ndarray] = []
    end = 0
    for row in rows:
        bases = _oriented(db, row)
        start = row.offset
        if not parts:
            parts.append(bases)
            end = start + len(bases)
            continue
        if start + len(bases) <= end:
            continue  # fully covered by previous reads
        # overlap-hang offsets drift by a few bases vs the true alignment;
        # clamp so a positive gap (should not happen inside a unitig)
        # degrades to plain concatenation rather than a hole
        skip = max(0, min(end - start, len(bases)))
        parts.append(bases[skip:])
        end = max(end, start + len(bases))
    return np.concatenate(parts)


def polish_contig(db: PackedDB, tig: Unitig, backbone: np.ndarray,
                  opts: CtgCnsOptions) -> np.ndarray:
    """Batched realign of layout reads to the backbone + tag vote.

    Tags are tallied and voted on device (ops/consensus_device, T=1 table,
    keep_template mode) unless the contig's count table would exceed the
    memory cap — then the host CnsTable path below runs (exact same vote:
    tests/test_assembly.py::test_polish_device_matches_host).
    """
    import os as _os

    D1 = 16  # C.MAX_INS_DELTA + 1
    cap = int(_os.environ.get("MECAT_TPU_POLISH_TABLE_BYTES", 2 << 30))
    if (_os.environ.get("MECAT_TPU_HOST_POLISH") != "1"
            and bucket_length(len(backbone)) * D1 * 5 * 4 <= cap):
        return _polish_contig_device(db, tig, backbone, opts)
    return _polish_contig_host(db, tig, backbone, opts)


def _polish_contig_device(db: PackedDB, tig: Unitig, backbone: np.ndarray,
                          opts: CtgCnsOptions) -> np.ndarray:
    from .. import constants as C
    from ..ops.align import extend_pair_batch_with_ops
    from ..ops.consensus_device import accumulate_tags, call_tables
    import jax.numpy as jnp

    if len(backbone) == 0 or len(tig.rows) == 0:
        return backbone
    L_t = bucket_length(len(backbone))
    L_s = bucket_length(max(int(db.lengths[r.read]) for r in tig.rows))
    S, W = opts.align_segment, opts.align_band
    msegs = max_segs_for(L_s, S) + 2
    P = opts.extend_batch
    D1 = C.MAX_INS_DELTA + 1

    counts = jnp.zeros((1, L_t, D1, 5), jnp.int32)
    cov_diff = jnp.zeros((1, L_t + 1), jnp.int32)
    t_row = np.zeros(L_t, dtype=np.uint8)
    t_row[:len(backbone)] = backbone
    t_dev = jnp.asarray(t_row)

    rows = sorted(tig.rows, key=lambda r: (r.offset, r.read))
    scale = len(backbone) / max(1, max(r.offset + int(db.lengths[r.read])
                                       for r in rows))
    zero_slot = jnp.zeros(P, jnp.int32)
    for ofs in range(0, len(rows), P):
        chunk = rows[ofs:ofs + P]
        n = len(chunk)
        q_b = np.zeros((n, L_s), dtype=np.uint8)
        qlen = np.zeros(n, np.int32)
        qs = np.zeros(n, np.int32)
        ts = np.zeros(n, np.int32)
        for i, row in enumerate(chunk):
            sb = _oriented(db, row)[:L_s]
            q_b[i, :len(sb)] = sb
            qlen[i] = len(sb)
            qs[i] = len(sb) // 2
            ts[i] = int(np.clip((row.offset + len(sb) // 2) * scale, 0,
                                len(backbone) - 1))
        real = np.zeros(P, dtype=bool)
        real[:n] = True
        q_p, qlen_p, qs_p, ts_p = pad_to_batch([q_b, qlen, qs, ts], P)
        tlen_p = np.full(P, len(backbone), np.int32)
        q_dev = jnp.asarray(q_p)
        qs_dev = jnp.asarray(qs_p)
        ts_dev = jnp.asarray(ts_p)
        pa, right_t, left_t = extend_pair_batch_with_ops(
            q_dev, jnp.broadcast_to(t_dev[None, :], (P, L_t)),
            jnp.asarray(qlen_p), jnp.asarray(tlen_p), qs_dev, ts_dev,
            S=S, W=W, max_segs=msegs)
        keep = jnp.asarray(real) & (pa.identity >= opts.min_identity)
        counts, cov_diff = accumulate_tags(
            counts, cov_diff, right_t, left_t, qs_dev, ts_dev, q_dev,
            jnp.asarray(qlen_p), jnp.asarray(tlen_p), zero_slot, keep,
            pa.tbeg, pa.tend, L_t=L_t)

    emit, _ = call_tables(counts, cov_diff, t_dev[None, :],
                          jnp.asarray(np.array([len(backbone)], np.int32)),
                          jnp.ones(1, bool),
                          jnp.int32(opts.min_coverage), keep_template=True)
    flat = np.asarray(emit.astype(jnp.int8))[0, :len(backbone)].reshape(-1)
    return flat[flat >= 0].astype(np.uint8)


def _polish_contig_host(db: PackedDB, tig: Unitig, backbone: np.ndarray,
                        opts: CtgCnsOptions) -> np.ndarray:
    """Host CnsTable fallback (exact reference for the device path)."""
    from ..ops.align import extend_pair_batch_with_ops
    import jax.numpy as jnp

    if len(backbone) == 0 or len(tig.rows) == 0:
        return backbone
    L_t = bucket_length(len(backbone))
    L_s = bucket_length(max(int(db.lengths[r.read]) for r in tig.rows))
    S, W = opts.align_segment, opts.align_band
    msegs = max_segs_for(L_s, S) + 2
    P = opts.extend_batch
    table = CnsTable(backbone)

    rows = sorted(tig.rows, key=lambda r: (r.offset, r.read))
    scale = len(backbone) / max(1, max(r.offset + int(db.lengths[r.read])
                                       for r in rows))
    for ofs in range(0, len(rows), P):
        chunk = rows[ofs:ofs + P]
        n = len(chunk)
        q_b = np.zeros((n, L_s), dtype=np.uint8)
        t_b = np.zeros((n, L_t), dtype=np.uint8)
        qlen = np.zeros(n, np.int32)
        qs = np.zeros(n, np.int32)
        ts = np.zeros(n, np.int32)
        sup = []
        t_b[:, :len(backbone)] = backbone
        for i, row in enumerate(chunk):
            sb = _oriented(db, row)[:L_s]
            q_b[i, :len(sb)] = sb
            qlen[i] = len(sb)
            qs[i] = len(sb) // 2
            # seed the template side at the layout-predicted position of the
            # read midpoint, shrunk by the stitch compression ratio
            ts[i] = int(np.clip((row.offset + len(sb) // 2) * scale, 0,
                                len(backbone) - 1))
            sup.append(sb)
        tlen = np.full(n, len(backbone), np.int32)
        q_p, t_p, qlen_p, tlen_p, qs_p, ts_p = pad_to_batch(
            [q_b, t_b, qlen, tlen, qs, ts], P)
        pa, right_t, left_t = extend_pair_batch_with_ops(
            jnp.asarray(q_p), jnp.asarray(t_p), jnp.asarray(qlen_p),
            jnp.asarray(tlen_p), jnp.asarray(qs_p), jnp.asarray(ts_p),
            S=S, W=W, max_segs=msegs)
        cols = tapes_to_columns(right_t, left_t, qs_p, ts_p, n_pairs=n)
        ident = np.asarray(pa.identity)[:n]
        tbeg = np.asarray(pa.tbeg)[:n]
        tend = np.asarray(pa.tend)[:n]
        for i in range(n):
            if ident[i] < opts.min_identity:
                continue
            pos, delta, base = columns_to_tags(
                *cols[i], support=sup[i], tlen=len(backbone))
            table.add_tags(pos, delta, base, (int(tbeg[i]), int(tend[i])))
    return table.call_polished(min_coverage=opts.min_coverage)


def contig_consensus(db: PackedDB, tigs: List[Unitig],
                     opts: Optional[CtgCnsOptions] = None,
                     min_length: int = 0) -> List[Tuple[str, np.ndarray]]:
    """All contigs: stitch (+polish).  Returns [(name, codes)] sorted long→short."""
    opts = opts or CtgCnsOptions()
    out = []
    for tig in tigs:
        backbone = stitch_backbone(db, tig)
        if len(backbone) == 0:
            continue
        seq = (polish_contig(db, tig, backbone, opts) if opts.polish
               else backbone)
        if len(seq) >= min_length:
            out.append((len(tig.rows), seq, tig.circular))
    out.sort(key=lambda x: -len(x[1]))
    return [(f"ctg{i:05d} reads={nr} len={len(s)}"
             + (" circular=yes" if circ else ""), s)
            for i, (nr, s, circ) in enumerate(out)]

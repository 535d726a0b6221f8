"""Overlap-based trimming of corrected reads (the correct+trim pipeline).

Role counterpart of the reference flow's trimming stage (SURVEY.md §2.2
component 12, mecat2canu's overlapBasedTrimming — unverified, mount empty;
the MECAT README reaches it via ``mecat2canu -trim-assemble``).  BASELINE
config 4 makes "correct+trim" the contractual surface, so this is a native
stage here rather than a Canu fork: overlaps among corrected reads are
computed with the pw machinery, per-read evidence coverage is accumulated
from overlap spans, and each read is cut back to its longest interval with
at least ``min_evidence`` overlapping supports — splitting at uncovered
interior gaps (chimera/junction suspects).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..io.fasta import format_fasta
from ..io.m4 import read_m4
from ..io.packed_db import PackedDB
from ..utils.log import get_logger
from .pw import PwOptions, run_pw

log = get_logger("trim")


@dataclass
class TrimOptions:
    min_evidence: int = 2          # overlaps covering a base to keep it
    min_trimmed_length: int = 1000
    pw: Optional[PwOptions] = None  # overlap detection settings


@dataclass
class TrimStats:
    reads_in: int = 0
    reads_out: int = 0
    bases_in: int = 0
    bases_out: int = 0
    seconds: float = 0.0


def coverage_intervals(L: int, spans: List[Tuple[int, int]],
                       min_evidence: int, min_len: int
                       ) -> List[Tuple[int, int]]:
    """Maximal intervals of length >= min_len with coverage >= min_evidence."""
    diff = np.zeros(L + 1, dtype=np.int32)
    for a, b in spans:
        a, b = max(0, a), min(L, b)
        if b > a:
            diff[a] += 1
            diff[b] -= 1
    cov = np.cumsum(diff[:-1])
    ok = cov >= min_evidence
    if not ok.any():
        return []
    edges = np.flatnonzero(np.diff(ok.astype(np.int8)))
    bounds = np.concatenate([[0], edges + 1, [L]])
    out = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        if ok[a] and b - a >= min_len:
            out.append((int(a), int(b)))
    return out


def run_trim(corrected_path: str, out_path: str, wrk_dir: str,
             opts: Optional[TrimOptions] = None,
             overlaps_path: Optional[str] = None) -> TrimStats:
    """Trim corrected reads; optionally reuse an existing M4 overlap file."""
    opts = opts or TrimOptions()
    os.makedirs(wrk_dir, exist_ok=True)
    t0 = time.time()
    db = PackedDB.from_fasta(corrected_path)
    stats = TrimStats(reads_in=db.n_reads, bases_in=db.total_bases)

    if overlaps_path is None:
        overlaps_path = os.path.join(wrk_dir, "trim_overlaps.m4")
        pw_opts = opts.pw or PwOptions(task=1)
        run_pw(corrected_path, overlaps_path, os.path.join(wrk_dir, "pw"),
               pw_opts, db=db)

    spans: Dict[int, List[Tuple[int, int]]] = {}
    for r in read_m4(overlaps_path):
        spans.setdefault(r.qid - 1, []).append((r.qstart, r.qend))
        spans.setdefault(r.sid - 1, []).append((r.sstart, r.send))

    with open(out_path, "wb") as fh:
        for i in range(db.n_reads):
            L = int(db.lengths[i])
            for k, (a, b) in enumerate(coverage_intervals(
                    L, spans.get(i, []), opts.min_evidence,
                    opts.min_trimmed_length)):
                fh.write(format_fasta(f"{db.name(i)}_trim{k}",
                                      db.read(i)[a:b]))
                stats.reads_out += 1
                stats.bases_out += b - a
    stats.seconds = time.time() - t0
    log.info("trim: %d reads (%d bases) -> %d reads (%d bases)",
             stats.reads_in, stats.bases_in, stats.reads_out, stats.bases_out)
    return stats

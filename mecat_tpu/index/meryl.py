"""k-mer counting / spectrum (meryl role).

Counterpart of mecat2canu's meryl k-mer counter (SURVEY.md §2.2 component 9,
``mecat2canu/src/meryl/`` — unverified, mount empty), at the scope this
pipeline needs it: canu uses meryl to derive the overlap-seeding frequency
threshold from the k-mer spectrum.  The count itself reuses the index
machinery's k-mer encoding (one bincount over the volume — the same counting
sort the CSR index build does), so there is no separate k-mer database on
disk, just the spectrum histogram and the derived cutoff.
"""
from __future__ import annotations

import numpy as np

from ..io.packed_db import PackedDB
from .kmer_index import kmer_codes_np


def kmer_counts(db: PackedDB, k: int = 16) -> np.ndarray:
    """Occurrence count per distinct k-mer (int64 [n_distinct], unordered)."""
    codes = kmer_codes_np(np.asarray(db.codes, dtype=np.uint8), k)
    starts = db.starts.astype(np.int64)
    lengths = db.lengths.astype(np.int64)
    read_ids = np.repeat(np.arange(db.n_reads, dtype=np.int64), lengths)
    local = np.arange(len(codes), dtype=np.int64) - starts[read_ids]
    valid = local <= (lengths[read_ids] - k)
    vcodes = codes[valid]
    if len(vcodes) == 0:
        return np.zeros(0, dtype=np.int64)
    # counting per distinct k-mer without a 4^k table: sort + run lengths
    vcodes = np.sort(vcodes)
    edges = np.flatnonzero(np.diff(vcodes)) + 1
    bounds = np.concatenate([[0], edges, [len(vcodes)]])
    return np.diff(bounds).astype(np.int64)


def kmer_histogram(db: PackedDB, k: int = 16, max_count: int = 1000
                   ) -> np.ndarray:
    """Spectrum: hist[c] = number of distinct k-mers occurring c times."""
    counts = kmer_counts(db, k)
    if len(counts) == 0:
        return np.zeros(max_count + 1, dtype=np.int64)
    return np.bincount(np.minimum(counts, max_count),
                       minlength=max_count + 1).astype(np.int64)


def pick_freq_cutoff(hist: np.ndarray, tail_frac: float = 0.0001,
                     min_cutoff: int = 16) -> int:
    """Seeding-frequency cutoff: drop the heaviest ``tail_frac`` of k-mer
    OCCURRENCES (repeat k-mers), canu-style 'distinct=...' threshold logic."""
    occ = hist * np.arange(len(hist), dtype=np.int64)
    total = occ.sum()
    if total == 0:
        return min_cutoff
    tail = np.cumsum(occ[::-1])[::-1]
    ok = np.nonzero(tail <= total * tail_frac)[0]
    cutoff = int(ok[0]) if len(ok) else len(hist) - 1
    return max(cutoff, min_cutoff)

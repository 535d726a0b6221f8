"""Device-friendly k-mer index (L2 of SURVEY.md §1).

Counterpart of the reference ``build_lookup_table`` (SURVEY.md §2.1 component 1,
``src/common/lookup_table.*`` — unverified, mount empty).  The reference uses a
chained hash table probed one k-mer at a time by pthread workers; on TPU the
same contract — k-mer → list of occurrence positions, with high-frequency
k-mers dropped — is served by a **direct-address CSR table**:

* ``offsets``: int32[4^k + 1], prefix sums of per-k-mer occurrence counts
  (direct addressing — the k-mer's 2k-bit integer code is the slot index),
* ``positions``: int32[M], global base positions sorted by k-mer code.

Probing is a fixed-shape vectorized gather: ``off = offsets[code]``,
``cnt = offsets[code+1] - off``, then gather ``positions[off + j]`` for
``j < min(cnt, MAX_OCC)``.  High-frequency k-mers are dropped at probe time
by masking slots whose count exceeds the cutoff — identical selectivity to
dropping them at build, but keeps the build a pure counting sort.

The index is built host-side with NumPy counting-sort primitives (bincount +
stable argsort) and uploaded to HBM once per volume; probes run on device.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C


def kmer_codes_np(codes: np.ndarray, k: int) -> np.ndarray:
    """k-mer integer codes at every start position (host build path).

    Returns int64[N] where out[p] encodes bases[p:p+k] big-endian (base p is
    the most significant 2 bits).  Positions closer than k to the end of the
    array hold garbage; validity is handled by the caller via read bounds.
    """
    n = len(codes)
    out = np.zeros(n, dtype=np.int64)
    c = codes.astype(np.int64)
    for j in range(k):
        shifted = np.zeros(n, dtype=np.int64)
        shifted[: n - j] = c[j:]
        out = (out << 2) | shifted
    return out


def kmer_codes_jnp(bases: jnp.ndarray, k: int) -> jnp.ndarray:
    """Same encoding as :func:`kmer_codes_np`, on device, over [..., L] bases.

    Uses int32 when 2k <= 31 (always true for k <= 15, MECAT's range).
    """
    assert 2 * k <= 31, "k too large for int32 codes"
    L = bases.shape[-1]
    out = jnp.zeros(bases.shape, dtype=jnp.int32)
    b = bases.astype(jnp.int32)
    for j in range(k):
        shifted = jnp.zeros_like(b).at[..., : L - j].set(b[..., j:]) if j else b
        out = (out << 2) | shifted
    return out


@dataclass
class KmerIndex:
    """CSR direct-address k-mer table over one packed volume (or a genome)."""

    k: int
    offsets: np.ndarray        # int32 [4^k + 1]
    positions: np.ndarray      # int32 [M] global positions, sorted by k-mer
    read_starts: np.ndarray    # int32 [n_reads] (volume < 2^31 bases)
    read_lengths: np.ndarray   # int32 [n_reads]
    max_occ_cutoff: int        # slots with more occurrences are dropped

    @property
    def n_reads(self) -> int:
        return len(self.read_starts)

    def as_device_arrays(self):
        """Upload the probe-side arrays once; returns a dict of jnp arrays."""
        return dict(
            offsets=jnp.asarray(self.offsets),
            positions=jnp.asarray(self.positions),
            read_starts=jnp.asarray(self.read_starts),
            read_lengths=jnp.asarray(self.read_lengths),
        )


def build_index(codes: np.ndarray, starts: np.ndarray, lengths: np.ndarray,
                k: int = C.KMER_SIZE,
                freq_cutoff_multiple: float = C.KMER_FREQ_CUTOFF_MULTIPLE,
                ) -> KmerIndex:
    """Build the CSR k-mer table over a volume's flat code array.

    Every position of every read contributes its k-mer (index-side stride 1,
    matching the reference lookup table); k-mers spanning a read boundary are
    excluded.
    """
    n_slots = 1 << (2 * k)
    starts = starts.astype(np.int64)
    lengths = lengths.astype(np.int64)
    n = len(codes)

    all_codes = kmer_codes_np(np.asarray(codes, dtype=np.uint8), k)
    # valid iff the k-mer fits inside its read
    read_ids = np.repeat(np.arange(len(starts), dtype=np.int64), lengths)
    local = np.arange(n, dtype=np.int64) - starts[read_ids]
    valid = local <= (lengths[read_ids] - k)
    vpos = np.nonzero(valid)[0]
    vcodes = all_codes[vpos]

    counts = np.bincount(vcodes, minlength=n_slots)
    offsets = np.zeros(n_slots + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    order = np.argsort(vcodes, kind="stable")
    positions = vpos[order].astype(np.int32)

    mean_occ = max(1.0, len(vcodes) / max(1, np.count_nonzero(counts)))
    cutoff = max(int(mean_occ * freq_cutoff_multiple), C.MAX_OCC_PER_KMER)
    assert offsets[-1] == len(positions)
    return KmerIndex(k=k, offsets=offsets.astype(np.int32),
                     positions=positions,
                     read_starts=starts.astype(np.int32),
                     read_lengths=lengths.astype(np.int32),
                     max_occ_cutoff=cutoff)


@partial(jax.jit, static_argnames=("max_occ",))
def probe_index(offsets: jnp.ndarray, positions: jnp.ndarray,
                query_codes: jnp.ndarray, query_valid: jnp.ndarray,
                cutoff: jnp.ndarray, max_occ: int = C.MAX_OCC_PER_KMER):
    """Vectorized index probe.

    Args:
      offsets, positions: device CSR arrays.
      query_codes: int32[..., Q] k-mer codes to look up.
      query_valid: bool[..., Q] validity of each code.
      cutoff: scalar int32; slots with count > cutoff are dropped entirely
        (high-frequency k-mer filtering, SURVEY.md §2.1).
      max_occ: static cap on occurrences gathered per k-mer.

    Returns:
      hit_pos: int32[..., Q, max_occ] global positions (0 where invalid)
      hit_valid: bool[..., Q, max_occ]
    """
    codes = jnp.where(query_valid, query_codes, 0)
    off = offsets[codes]
    cnt = offsets[codes + 1] - off
    keep = query_valid & (cnt <= cutoff)
    cnt = jnp.where(keep, jnp.minimum(cnt, max_occ), 0)
    j = jnp.arange(max_occ, dtype=jnp.int32)
    idx = off[..., None] + j  # [..., Q, max_occ]
    hit_valid = j < cnt[..., None]
    idx = jnp.where(hit_valid, idx, 0)
    hit_pos = positions[idx]
    return hit_pos, hit_valid


def global_to_read(read_starts: jnp.ndarray, read_lengths: jnp.ndarray,
                   gpos: jnp.ndarray):
    """Map global base positions → (read_id, local_offset) via binary search."""
    rid = jnp.searchsorted(read_starts, gpos, side="right") - 1
    rid = jnp.clip(rid, 0, read_starts.shape[0] - 1).astype(jnp.int32)
    return rid, gpos - read_starts[rid]

"""Distributed overlap pipeline: mesh-sharded mecat2pw with per-host shards.

The multi-host restatement of the reference's grid scale-out (SURVEY.md §2.3,
§2.4; BASELINE config 5 shape): every process runs this same driver under
``jax.distributed``; queries are data-parallel over the ``data`` mesh axis,
the k-mer index is sharded by hash range over ``hash``, hits ride an
``all_to_all`` over ICI (parallel/sharded.py), and every HOST writes only the
M4 records of its addressable query slices to its own shard file — the data
plane is collectives, not a shared filesystem; only the final merge (rank 0)
touches the shard files, mirroring the reference's per-volume-output
concatenation.

Single-host this degrades gracefully: one process, all local devices, one
shard, same code path (tests run it on the virtual 8-device CPU mesh).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..io.m4 import M4Record, format_block
from ..io.packed_db import PackedDB
from ..index.kmer_index import build_index
from ..pipeline.common import bucket_length, max_segs_for
from ..pipeline.pw import PwOptions, PwStats
from ..utils.log import get_logger
from .sharded import (make_mesh, place_sharded_inputs, shard_index_by_hash,
                      sharded_overlap_step)

log = get_logger("dist")


def init_distributed() -> Tuple[int, int]:
    """Initialise jax.distributed from env when configured.

    Returns (process_index, process_count).  With no coordinator configured
    (single-host run) this is (0, 1) and no init happens.
    """
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        from jax._src import distributed as _dist

        if _dist.global_state.client is None:  # not yet initialised
            jax.distributed.initialize(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]))
    return jax.process_index(), jax.process_count()


_step_cache: dict = {}


def _cached_step(mesh, **params):
    """Reuse the jitted sharded step across volume pairs with equal shapes
    (sharded_overlap_step builds a fresh jit wrapper per call)."""
    key = (id(mesh),) + tuple(sorted(params.items()))
    if key not in _step_cache:
        _step_cache[key] = sharded_overlap_step(mesh, **params)
    return _step_cache[key]


def _iter_addressable_blocks(arrs):
    """Yield (row0, [np blocks]) for THIS process's addressable row slices.

    Multi-controller contract: a process must only read the output shards
    resident on its own devices — np.asarray on the global array would
    require non-addressable data.  Shards replicated across the 'hash' axis
    repeat row slices; deduped by row start.  Plain numpy inputs (host
    fallback paths) yield one full block.
    """
    ref = arrs[0]
    if not hasattr(ref, "addressable_shards"):
        yield 0, [np.asarray(a) for a in arrs]
        return
    seen = set()
    for i, sh in enumerate(ref.addressable_shards):
        r0 = sh.index[0].start or 0
        if r0 in seen:
            continue
        seen.add(r0)
        yield r0, [np.asarray(a.addressable_shards[i].data) for a in arrs]


def _emit_from_step(out, strand: int, qids: np.ndarray, vol_base: int,
                    qlens: np.ndarray, tlens: np.ndarray, n_valid_rows: int,
                    best: dict) -> None:
    """Fold one sharded-step output (one strand) into the best-overlap dict.

    Consumes only this process's addressable output shards, so each process
    emits exactly the query rows it owns (per-host shard files)."""
    fields = [out.valid, out.target, out.score, out.qbeg, out.qend,
              out.tbeg, out.tend, out.identity]
    for r0, (valid, tgt, score, qbeg, qend, tbeg, tend,
             ident) in _iter_addressable_blocks(fields):
        rows, cols = np.nonzero(valid)
        for r, c in zip(rows, cols):
            gr = r0 + r
            if gr >= n_valid_rows:
                continue
            qid = int(qids[gr])
            sid = vol_base + int(tgt[r, c])
            qsize = int(qlens[gr])
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
                send=int(tend[r, c]), ssize=int(tlens[int(tgt[r, c])])))


def run_pw_dist(reads_path: str, out_path: str, wrk_dir: str,
                opts: Optional[PwOptions] = None,
                n_data: Optional[int] = None, n_hash: int = 2,
                db: Optional[PackedDB] = None) -> PwStats:
    """Mesh-sharded all-vs-all overlap run → merged M4 file.

    Slightly MORE sensitive than run_pw task=1: the fused sharded step scans
    one orientation per launch and keeps top-n candidates per strand, where
    the host pipeline merges both strands before the top-n cap — so this
    driver's output is a superset of run_pw's (tests/test_dist.py), within
    the M4 contract's "modulo tie-breaking" allowance.

    Multi-controller: every process runs this same function; inputs are
    device_put with identical host data on all processes, each process
    consumes only its addressable output shards (_emit_from_step), writes
    its own shard file, and rank 0 concatenates after a barrier.  Exercised
    for real by tests/test_dist.py::test_dist_pw_two_processes (2 processes
    x 4 virtual CPU devices over a localhost coordinator).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    opts = opts or PwOptions(task=1)
    os.makedirs(wrk_dir, exist_ok=True)
    pidx, pcount = init_distributed()
    devs = jax.devices()
    if n_data is None:
        n_data = max(1, len(devs) // n_hash)
    mesh = make_mesh(n_data=n_data, n_hash=n_hash)
    if db is None:
        db = PackedDB.from_fasta(reads_path)
    stats = PwStats(reads=db.n_reads)
    vols = db.split_volumes(opts.volume_bases)
    B = opts.scan_batch * n_data * n_hash  # global query batch
    log.info("dist pw: %d reads, mesh data=%d hash=%d, %d volume(s), "
             "process %d/%d", db.n_reads, n_data, n_hash, len(vols),
             pidx, pcount)

    import time as _time
    t0 = _time.time()
    shard_path = os.path.join(wrk_dir, f"pw_shard_p{pidx}.m4")
    best: dict = {}
    for vi, (va, vb) in enumerate(vols):
        vol_db = db.subset(range(va, vb))
        idx = build_index(vol_db.codes, vol_db.starts, vol_db.lengths,
                          k=opts.kmer_size)
        off_sh, rid_sh, loc_sh, lo = shard_index_by_hash(idx, n_hash)
        L_target = bucket_length(int(vol_db.lengths.max()))
        for vj in range(vi, len(vols)):
            qa, qb = vols[vj]
            L_query = bucket_length(int(db.lengths[qa:qb].max()))
            S, W = opts.align_segment, opts.align_band
            step = _cached_step(
                mesh, k=opts.kmer_size, stride=opts.scan_stride,
                max_occ=opts.max_occ, num_candidates=opts.num_candidates,
                diag_bin=opts.diag_bin, L_target=L_target, S=S, W=W,
                max_segs=max_segs_for(max(L_query, L_target), S),
                min_align_size=opts.min_align_size,
                min_identity=opts.min_identity)
            for bs in range(qa, qb, B):
                qids = np.arange(bs, min(qb, bs + B), dtype=np.int64)
                n_rows = len(qids)
                pad_ids = np.concatenate(
                    [qids, np.full(B - n_rows, qids[-1], dtype=np.int64)])
                bases, lens = db.padded_batch(pad_ids, pad_to=L_query)
                self_id = np.where(
                    (pad_ids >= va) & (pad_ids < vb),
                    pad_ids - va, -1).astype(np.int32)
                # mask the padded tail so it can't produce hits
                lens = lens.copy()
                lens[n_rows:] = 0
                from ..io.packed_db import revcomp
                rev = np.zeros_like(bases)
                for i in range(n_rows):
                    n = int(lens[i])
                    rev[i, :n] = revcomp(bases[i, :n])
                for strand, oriented in ((0, bases), (1, rev)):
                    args = place_sharded_inputs(
                        mesh, oriented, lens, self_id, vol_db.codes,
                        off_sh, rid_sh, loc_sh, lo,
                        idx.read_starts, idx.read_lengths,
                        np.int32(idx.max_occ_cutoff))
                    out = step(*args)
                    _emit_from_step(out, strand, pad_ids, va, lens,
                                    vol_db.lengths, n_rows, best)
            log.info("dist pw: volume %d vs %d done (%d overlaps so far)",
                     vi, vj, len(best))

    records = [rec for _, rec in
               (best[k] for k in sorted(best))]
    stats.overlaps = len(records)
    with open(shard_path, "w") as fh:
        fh.write(format_block(records))

    # deterministic merge on rank 0 (shared-filesystem output contract)
    if pcount > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("pw_dist_shards")
    if pidx == 0:
        with open(out_path, "wb") as out:
            for p in range(pcount):
                sp = os.path.join(wrk_dir, f"pw_shard_p{p}.m4")
                if os.path.exists(sp):
                    with open(sp, "rb") as fh:
                        out.write(fh.read())
    stats.seconds = _time.time() - t0
    return stats

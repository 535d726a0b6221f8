"""Benchmark: overlaps/s/chip for the fused device overlap step.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "overlaps/s/chip", "vs_baseline": N}

Workload: simulated PacBio-like reads (the reference's bundled E. coli data
is unavailable — /root/reference is empty, see SURVEY.md provenance notice),
all-vs-all overlap via the fused scan→score→extend step on the real chip.

vs_baseline: ratio against the SAME step compiled for the host CPU backend
(one socket) on a subsample — a provisional stand-in for the reference C++
on one socket until the reference binaries exist (BASELINE.md).  The
north-star target for this ratio is >= 50.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# --scaling / BENCH_SCALING=1: run the strong-scaling harness instead
# (mecat_tpu/utils/scaling.py).  Needs a multi-device platform: with a
# single real chip we fall back to a virtual 8-device CPU mesh, which must
# be requested before the backend initialises.
_SCALING = "--scaling" in sys.argv or os.environ.get("BENCH_SCALING") == "1"
if _SCALING:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
import jax

if _SCALING:
    # Force the CPU platform BEFORE the backend initialises: probing a
    # single-chip (or unreachable) accelerator platform here would either
    # hang on a downed tunnel or yield a 1-device mesh that cannot scale.
    # Ambient JAX_PLATFORMS (the sandbox exports axon) is deliberately
    # ignored; a real multi-chip slice opts in with MECAT_TPU_PLATFORM.
    # Must go through the config API — sitecustomize imports jax before this
    # file runs, so mutating the JAX_PLATFORMS env var here is too late.
    if not os.environ.get("MECAT_TPU_PLATFORM"):
        jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# bench shape knobs (env-overridable for quick local runs)
GENOME = int(os.environ.get("BENCH_GENOME", 500_000))
COVERAGE = float(os.environ.get("BENCH_COVERAGE", 15))
MEAN_LEN = int(os.environ.get("BENCH_MEAN_LEN", 5000))
L = int(os.environ.get("BENCH_L", 8192))
B = int(os.environ.get("BENCH_B", 128))
N_CAND = int(os.environ.get("BENCH_NCAND", 16))
CFG = dict(k=13, stride=10, max_occ=16, num_candidates=N_CAND, diag_bin=256,
           L_target=L, S=512, W=128, max_segs=30, min_align_size=1000,
           min_identity=70.0)


def build_workload():
    from mecat_tpu.index.kmer_index import build_index
    from mecat_tpu.utils.sim import random_genome, simulate_reads

    n_reads = int(GENOME * COVERAGE / MEAN_LEN)
    n_reads -= n_reads % B or B  # multiple of B, at least B
    n_reads = max(n_reads, B)
    log(f"bench: genome={GENOME} reads={n_reads} mean_len={MEAN_LEN}")
    genome = random_genome(GENOME, seed=91)
    db, _ = simulate_reads(genome, n_reads, mean_len=MEAN_LEN, min_len=2000,
                           seed=92, error_rate=0.12)
    t0 = time.time()
    idx = build_index(db.codes, db.starts, db.lengths, k=CFG["k"])
    log(f"bench: index build {time.time() - t0:.1f}s "
        f"({len(idx.positions)} positions)")
    return db, idx


def run_on(device, db, idx, n_batches, collect_supports=False):
    from mecat_tpu.io.packed_db import upload_codes
    from mecat_tpu.pipeline.device_step import overlap_step

    with jax.default_device(device):
        dev = dict(
            vol_codes=upload_codes(db.codes),
            offsets=jnp.asarray(idx.offsets),
            pos_rid=jnp.asarray(idx.pos_rid),
            pos_loc=jnp.asarray(idx.pos_loc),
            read_starts=jnp.asarray(idx.read_starts),
            read_lengths=jnp.asarray(idx.read_lengths))
        cutoff = jnp.int32(idx.max_occ_cutoff)

        def batch_args(bi):
            ids = range(bi * B, (bi + 1) * B)
            bases, lens = db.padded_batch(ids, pad_to=L)
            return (jnp.asarray(bases), jnp.asarray(lens),
                    jnp.asarray(np.arange(bi * B, (bi + 1) * B,
                                          dtype=np.int32)))

        # warmup/compile (timed separately: the remote-compile cache state is
        # the main round-over-round noise source — report, don't mix in)
        t_c = time.time()
        a = batch_args(0)
        out = overlap_step(a[0], a[1], a[2], dev["vol_codes"], dev["offsets"],
                           dev["pos_rid"], dev["pos_loc"], dev["read_starts"],
                           dev["read_lengths"], cutoff, **CFG)
        jax.block_until_ready(out)
        compile_s = time.time() - t_c

        # pre-stage host batches once (the weak sandbox host must not sit on
        # the timed path), then dispatch all steps async and sync at the end
        # — the production pipeline overlaps host prep with device compute
        # the same way.
        n_cycle = db.n_reads // B
        staged = [batch_args(bi % n_cycle) for bi in range(min(n_batches,
                                                               n_cycle))]
        t0 = time.time()
        outs = []
        segs = []
        for bi in range(n_batches):
            a = staged[bi % len(staged)]
            o = overlap_step(
                a[0], a[1], a[2], dev["vol_codes"],
                dev["offsets"], dev["pos_rid"], dev["pos_loc"],
                dev["read_starts"], dev["read_lengths"],
                cutoff, **CFG)
            outs.append(o.valid)
            segs.append(o.n_segs)
        # one stacked pull for both tallies (single tunnel round-trip)
        tallies = np.asarray(jnp.stack(
            [jnp.sum(jnp.stack([jnp.sum(v) for v in outs])),
             jnp.sum(jnp.stack([jnp.sum(s) for s in segs]))]))
        overlaps, useful_segs = int(tallies[0]), int(tallies[1])
        dt = time.time() - t0

        supports = None
        if collect_supports:
            # pull full outputs of a few batches -> cns bench support table
            supports = []
            for bi in range(min(4, n_cycle)):
                a = staged[bi % len(staged)]
                o = overlap_step(
                    a[0], a[1], a[2], dev["vol_codes"], dev["offsets"],
                    dev["pos_rid"], dev["pos_loc"], dev["read_starts"],
                    dev["read_lengths"], cutoff, **CFG)
                supports.append((np.asarray(a[2]),
                                 {f: np.asarray(getattr(o, f))
                                  for f in ("target", "score", "qseed",
                                            "tseed", "valid")}))
    return overlaps, useful_segs, dt, compile_s, supports


def run_cns(db, supports):
    """Device consensus bench: supports/s/chip on real pw-produced piles.

    The support table comes from the fused overlap step's own output
    (real seeds/scores, forward strand), so the cns chunk sees the same
    pile shapes the production pipeline feeds it (BASELINE.json north star:
    'overlaps/s/chip + corrected reads/s')."""
    from mecat_tpu import constants as Cst
    from mecat_tpu.pipeline.cns import (CnsOptions, CnsStats,
                                        correct_batch_device, device_volume)

    max_templates = int(os.environ.get("BENCH_CNS_TEMPLATES", 128))
    by_template = {}
    for qids, o in supports:
        b, n = np.nonzero(o["valid"])
        for qid, tgt, score, qs, ts in zip(
                qids[b], o["target"][b, n], o["score"][b, n],
                o["qseed"][b, n], o["tseed"][b, n]):
            if int(qid) != int(tgt):
                by_template.setdefault(int(tgt), []).append(
                    (int(qid), 0, int(qs), int(ts), int(score)))
    templates = sorted(
        (t for t, s in by_template.items() if len(s) >= 5),
        key=lambda t: -len(by_template[t]))[:max_templates]
    if not templates:
        return None
    # pacbio preset EXCEPT min corrected length: the preset's 5000 filters
    # out nearly every mean-5kb bench read (round 3 corrected exactly 1
    # read — a useless regression signal).  2000 keeps the alignment work
    # identical while making "corrected reads" a real, ≥50-read surface.
    opts = CnsOptions.for_tech(Cst.TECH_PACBIO, min_length=2000)
    dev_vol = device_volume(db)

    def one_pass():
        stats = CnsStats()
        t0 = time.time()
        for _ in correct_batch_device(db, sorted(templates), by_template,
                                      opts, stats, dev_vol=dev_vol):
            pass
        return stats, time.time() - t0

    _, cold_dt = one_pass()            # compile ladder (or cache hits)
    stats, dt = one_pass()             # steady state
    return dict(
        cns_supports_per_s=round(stats.supports_aligned / dt, 1)
        if dt > 0 else None,
        cns_templates=stats.templates,
        cns_supports=stats.supports_aligned,
        cns_corrected_reads=stats.corrected_reads,
        cns_corrected_reads_per_s=round(stats.corrected_reads / dt, 2)
        if dt > 0 else None,
        cns_steady_s=round(dt, 2), cns_first_pass_s=round(cold_dt, 2))


def main():
    t_ix = time.time()
    db, idx = build_workload()
    index_build_s = time.time() - t_ix
    platform = jax.devices()[0].platform
    log(f"bench: primary device {jax.devices()[0]} ({platform})")

    want_cns = os.environ.get("BENCH_CNS", "1") == "1" or "--cns" in sys.argv
    n_batches = int(os.environ.get("BENCH_BATCHES", 32))
    t0 = time.time()
    overlaps, useful_segs, dt, compile_s, supports = run_on(
        jax.devices()[0], db, idx, n_batches, collect_supports=want_cns)
    rate = overlaps / dt if dt > 0 else 0.0
    # Issued DP-cell rate (speed-of-light accounting, VERDICT r3 weak #4):
    # the fused step statically issues B*N candidate extensions x 2
    # directions x max_segs segments of SxW cells per batch; the Pallas
    # kernel's dead-block skip means ACTUAL cells are lower, so this is the
    # shape-budget rate to compare against tools/roofline.py's VPU bound.
    cells_issued = (n_batches * B * CFG["num_candidates"] * 2
                    * CFG["max_segs"] * CFG["S"] * CFG["W"])
    cells_per_s = cells_issued / dt if dt > 0 else 0.0
    # USEFUL cells: sum of per-lane actual DP segments (live lanes only,
    # both directions) x S x W — the apples-to-apples rate against the
    # forced-occupancy roofline (issued counts padded/dead lanes and can
    # read far above it; VERDICT r4 weak #3)
    cells_useful_per_s = useful_segs * CFG["S"] * CFG["W"] / dt \
        if dt > 0 else 0.0
    log(f"bench: chip: {overlaps} overlaps in {dt:.2f}s -> {rate:.1f}/s "
        f"({cells_per_s / 1e9:.1f} Gcells/s issued, "
        f"{cells_useful_per_s / 1e9:.1f} useful, compile {compile_s:.1f}s,"
        f" total {time.time() - t0:.1f}s)")

    # 1-core baseline: the measured scalar single-thread C++ engine
    # (native/src/scalar_baseline.cpp) on the SAME workload/filters in
    # fwd-only step-parity mode — a real reference-style denominator
    # (VERDICT r4 next #1), replacing the old XLA:CPU stand-in (4.2 ovl/s,
    # kept as a secondary field).  BENCH_SCALAR=1 re-measures inline
    # (~2 min, one host core); otherwise the recorded quiet-host rate is
    # used (BENCH_SCALAR_RATE, BASELINE.md round-5 row).
    vs = None
    # recorded quiet-host measurement 2026-08-20 (evidence/round5/
    # scalar_bench_fwd.json); an inline re-measure on a busy host would
    # UNDERSTATE the denominator and flatter the ratio
    scalar_rate = float(os.environ.get("BENCH_SCALAR_RATE", 741.0)) or None
    if os.environ.get("BENCH_SCALAR") == "1" or scalar_rate is None:
        try:
            import time as _t

            from mecat_tpu import constants as Cst
            from mecat_tpu.native.scalar import ScalarEngine

            eng = ScalarEngine(db.codes, db.starts, db.lengths,
                               k=CFG["k"])
            n_q = min(48, db.n_reads)
            t0s = _t.time()
            r = eng.overlap_range(
                0, n_q, task=1, stride=CFG["stride"],
                max_occ=CFG["max_occ"], cutoff=eng.cutoff(),
                diag_bin=CFG["diag_bin"], n_cand=CFG["num_candidates"],
                min_block_score=Cst.MIN_BLOCK_SCORE, S=CFG["S"],
                W=CFG["W"], penalty=Cst.ALIGN_TRIM_PENALTY,
                min_seg_identity=Cst.MIN_SEGMENT_IDENTITY,
                min_identity=CFG["min_identity"],
                min_align_size=CFG["min_align_size"], strands=1)
            sdt = _t.time() - t0s
            scalar_rate = r["passed"] / sdt if sdt > 0 else None
            log(f"bench: scalar 1-core baseline: {r['passed']} passed in "
                f"{sdt:.2f}s -> {scalar_rate:.1f}/s")
        except Exception as e:  # pragma: no cover
            log(f"bench: scalar baseline unavailable: {e}")
    if scalar_rate:
        vs = rate / scalar_rate

    result = {
        "metric": "pairwise overlap throughput (fused scan+extend, simulated "
                  "PacBio reads)",
        "value": round(rate, 2),
        "unit": "overlaps/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "baseline_scalar_core_ovl_s": (round(scalar_rate, 1)
                                       if scalar_rate else None),
        "baseline_xla_cpu_ovl_s": 4.2,   # superseded stand-in, kept for
                                         # round-over-round comparability
        # hygiene fields: compile-cache state must not contaminate
        # round-over-round comparisons of the throughput line
        "index_build_s": round(index_build_s, 1),
        "compile_s": round(compile_s, 1),
        "steady_s": round(dt, 2),
        "dp_gcells_per_s_issued": round(cells_per_s / 1e9, 2),
        "dp_gcells_per_s_useful": round(cells_useful_per_s / 1e9, 2),
        "cache": "warm" if compile_s < 15.0 else "cold",
    }
    if want_cns and supports:
        try:
            cns = run_cns(db, supports)
            if cns:
                result.update(cns)
                log(f"bench: cns: {cns['cns_supports']} supports in "
                    f"{cns['cns_steady_s']}s -> "
                    f"{cns['cns_supports_per_s']}/s")
        except Exception as e:  # pragma: no cover - never fail the headline
            log(f"bench: cns bench failed: {e}")
    print(json.dumps(result))


if __name__ == "__main__":
    if _SCALING:
        from mecat_tpu.utils.scaling import main as scaling_main

        sys.exit(scaling_main())
    main()

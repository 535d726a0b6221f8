"""DP-kernel roofline measurement: cells/s vs a v5e VPU speed-of-light.

VERDICT r2 weak #1: nobody could say how far the 6930 ovl/s bench sits from
the chip ceiling.  This tool measures the banded-DP segment kernel in
isolation under forced-full-occupancy conditions (every lane extends to its
max_segs budget — near-identical sequence pairs, so no early exit and no
skipped blocks) and reports:

  * cells/s             = S * W * lanes * segs / dt   (all lanes active)
  * ops/cell            (static count from the kernel's row update)
  * VPU utilisation     = measured int32 ops/s vs the v5e VPU bound

v5e VPU bound: 8x128 vector lanes x 4 ALUs x ~0.94 GHz ~= 3.85e12 int32
op/s/chip (the MXU does not apply: the DP row update is pure elementwise
VPU work — min/add/compare/select; there is no contraction to feed the
systolic array).  The kernel's row update costs ~36 VPU ops/cell:
7 roll+min+select closure steps (~21), diag/vert/cand (~6), validity+pack
masks (~4), best-cell tracking amortised (~5).

Usage: python tools/roofline.py [--segs 8] [--b 2048] [--s 512] [--w 128]
Writes one JSON line; run on the real chip.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2048, help="DP lanes")
    ap.add_argument("--s", type=int, default=512)
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--segs", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--err", type=float, default=0.02,
                    help="pair error rate (low => no early exit)")
    ap.add_argument("--with-moves", action="store_true",
                    help="measure the tape-emitting (cns) variant")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from mecat_tpu.ops.align import extend_pair_batch, extend_pair_batch_with_ops
    from mecat_tpu.utils.sim import mutate, random_genome

    B, S, W, G = args.b, args.s, args.w, args.segs
    L = G * S + W  # long enough that no lane runs out of sequence
    rng = np.random.default_rng(11)
    q = np.zeros((B, L), np.uint8)
    t = np.zeros((B, L), np.uint8)
    base_seqs = [random_genome(L, seed=100 + i) for i in range(8)]
    for b in range(B):
        src = base_seqs[b % 8]
        q[b] = src
        m = mutate(src, rng, args.err / 3, args.err / 3, args.err / 3)[:L]
        t[b, :len(m)] = m
    lens = np.full(B, L, np.int32)
    seeds = np.zeros(B, np.int32)  # extend rightwards through all G segments

    kw = dict(S=S, W=W)
    fn = (extend_pair_batch_with_ops if args.with_moves
          else extend_pair_batch)

    qd, td = jnp.asarray(q), jnp.asarray(t)
    ld, sd = jnp.asarray(lens), jnp.asarray(seeds)

    def dispatch(segs):
        out = fn(qd, td, ld, ld, sd, sd, max_segs=segs, **kw)
        return out[0] if args.with_moves else out

    def sync(pa):
        # force a sync the tunnel-safe way (CLAUDE.md: block_until_ready
        # does not reliably sync on this system)
        np.asarray(pa.q_adv[0] if hasattr(pa, "q_adv") else pa.qbeg[0])

    def run(segs):
        pa = dispatch(segs)
        sync(pa)
        return pa

    # warm both shapes, then time the delta of one extra segment sweep.
    # All reps are dispatched async and synced ONCE: a per-rep sync pays an
    # erratic tunnel round-trip (50-500 ms) that swamps the compute delta
    # (the 2026-08-20 campaign run measured t_full < t_half that way).
    run(G)
    run(G // 2)

    def timed(segs):
        t0 = time.time()
        last = None
        for _ in range(args.reps):
            last = dispatch(segs)
        sync(last)
        return (time.time() - t0) / args.reps

    t_full = timed(G)
    t_half = timed(G // 2)

    # counts path runs both directions as one 2B-lane batch; the left
    # direction dies immediately (seed at 0) => active lanes = B.  The
    # while_loop still runs `segs` iterations over the 2B-lane batch, but
    # dead-block skipping removes the left half's DP, so effective lanes=B.
    segs_delta = G - G // 2
    cells = S * W * B * segs_delta
    dt = max(t_full - t_half, 1e-9)
    cells_s = cells / dt
    OPS_PER_CELL = 36
    VPU_OPS = 3.85e12
    sol_cells_s = VPU_OPS / OPS_PER_CELL
    qa = run(G)
    adv = int(np.asarray(qa.q_adv if hasattr(qa, "q_adv") else qa.qend).sum())
    print(json.dumps({
        "metric": "banded-DP cells/s (forced full occupancy)",
        "value": round(cells_s / 1e9, 2), "unit": "Gcells/s",
        "lanes": B, "S": S, "W": W, "segs": G,
        "t_full_s": round(t_full, 4), "t_half_s": round(t_half, 4),
        "ops_per_cell_est": OPS_PER_CELL,
        "vpu_util_pct": round(100 * cells_s * OPS_PER_CELL / VPU_OPS, 1),
        "speed_of_light_Gcells_s": round(sol_cells_s / 1e9, 2),
        "with_moves": bool(args.with_moves),
        "total_q_advance": adv,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""DP-kernel row-update cost decomposition (VERDICT r4 next #3).

The round-4 roofline (14.26 Gcells/s counts = 13.3% of the 36-ops/cell VPU
bound) was EXPLAINED by an unmeasured cost model ("8 pltpu.rolls per row at
several instructions per element").  This tool measures it: the same
[S, W, B] row-update loop is timed in variants that surgically remove one
cost at a time, on-chip, same shapes:

  full     — faithful copy of the production counts-only kernel row update
  noroll   — the 7 closure rolls + 1 vertical roll replaced by no-ops
             (same min/where/add ALU count, no sublane rotations; results
             are WRONG — timing only)
  nobest   — best-cell tracking (3 sublane log-reductions/row) removed
  elembest — best tracking restated as 2 elementwise ops/row on a packed
             (score, -r) key with ONE final reduction (semantics-preserving
             candidate optimisation)
  baremin  — noroll + nobest (the irreducible diag/vert/closure-ALU floor)

Usage: python tools/roll_micro.py [--b 2048] [--s 512] [--w 128] [--reps 16]
Writes one JSON line; run on the real chip.
"""
import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

INF = 1 << 20
VINF = 1 << 30
_NEG = -(1 << 26)
IND_K = 4096
_K1 = IND_K + 1
PENALTY = 2


def make_kernel(S, W, rolls, best):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(q_ref, t_ref, tmax_ref, segq_ref, best_ref):
        B = q_ref.shape[1]
        half = W // 2
        w_idx = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
        tmax = tmax_ref[0:1, :]
        segq = segq_ref[0:1, :]
        j0 = w_idx - half
        row0 = jnp.where((j0 >= 0) & (j0 <= tmax),
                         jnp.maximum(j0, 0) * _K1, VINF)

        def row_update(i, r, q_blk, t_blk, carry):
            prev, bs, br, bw, bd = carry
            qc = q_blk[r:r + 1, :]
            td = t_blk[r:r + W, :]
            sub = jnp.where(qc == td, 0, 1)
            diag = prev + sub * IND_K
            if rolls:
                vert = jnp.where(w_idx < W - 1,
                                 pltpu.roll(prev, shift=W - 1, axis=0),
                                 VINF) + _K1
            else:
                vert = jnp.where(w_idx < W - 1, prev, VINF) + _K1
            cand = jnp.minimum(diag, vert)
            j = i - half + w_idx
            valid = (j >= 0) & (j <= tmax)
            cand = jnp.where(valid, cand, VINF)
            y = cand - w_idx * _K1
            k = 1
            while k < W:
                if rolls:
                    y = jnp.minimum(y, jnp.where(
                        w_idx >= k, pltpu.roll(y, shift=k, axis=0), VINF))
                else:
                    y = jnp.minimum(y, jnp.where(w_idx >= k, y, VINF))
                k *= 2
            cur = y + w_idx * _K1
            cur = jnp.where(valid, jnp.minimum(cur, VINF), VINF)

            if best == "log":
                dist = cur // IND_K
                score = jnp.where(valid & (cur < VINF) & (i <= segq),
                                  i + j - 2 * PENALTY * dist, _NEG)
                row_max = jnp.max(score, axis=0, keepdims=True)
                row_arg = jnp.min(jnp.where(score == row_max, w_idx, W),
                                  axis=0, keepdims=True)
                row_d = jnp.min(jnp.where(w_idx == row_arg, cur, VINF),
                                axis=0, keepdims=True)
                upd = row_max > bs
                bs = jnp.where(upd, row_max, bs)
                br = jnp.where(upd, i, br)
                bw = jnp.where(upd, row_arg, bw)
                bd = jnp.where(upd, row_d, bd)
            elif best == "elem":
                # bs here is [W, B]: per-(band,lane) packed (score, -r) key;
                # bd [W, B] the packed DP val at that key.  2 elementwise
                # ops/row instead of 3 log-reductions.
                dist = cur // IND_K
                score = jnp.where(valid & (cur < VINF) & (i <= segq),
                                  i + j - 2 * PENALTY * dist, _NEG)
                key = score * 1024 - i
                upd = key > bs
                bs = jnp.where(upd, key, bs)
                bd = jnp.where(upd, cur, bd)
            return cur, bs, br, bw, bd

        def group(g, carry):
            base = pl.multiple_of(g * 8, 8)
            q_blk = q_ref[pl.ds(base, 8), :].astype(jnp.int32)
            t_blk = t_ref[pl.ds(base, W + 8), :].astype(jnp.int32)
            for r in range(8):
                carry = row_update(base + r + 1, r, q_blk, t_blk, carry)
            return carry

        B_ = q_ref.shape[1]
        zero = jnp.zeros((1, B_), jnp.int32)
        if best == "elem":
            initb = (jnp.full((W, B_), _NEG, jnp.int32), zero, zero,
                     jnp.full((W, B_), VINF, jnp.int32))
        else:
            initb = (zero, zero, jnp.full((1, B_), W // 2, jnp.int32), zero)
        init = (row0,) + initb
        out = jax.lax.fori_loop(0, S // 8, group, init)
        if best == "elem":
            _, key_wb, _, _, val_wb = out
            # final reduction: max key over the band, then its val
            kmax = jnp.max(key_wb, axis=0, keepdims=True)
            warg = jnp.min(jnp.where(key_wb == kmax, w_idx, W),
                           axis=0, keepdims=True)
            vbest = jnp.min(jnp.where(w_idx == warg, val_wb, VINF),
                            axis=0, keepdims=True)
            best_ref[0:1, :] = (-kmax) % 1024          # r
            best_ref[1:2, :] = warg
            best_ref[2:3, :] = vbest
            best_ref[3:8, :] = jnp.zeros((5, B_), jnp.int32)
        elif best == "log":
            _, bs, br, bw, bd = out
            best_ref[0:1, :] = br
            best_ref[1:2, :] = bw
            best_ref[2:3, :] = bd
            best_ref[3:4, :] = bs
            best_ref[4:8, :] = jnp.zeros((4, B_), jnp.int32)
        else:  # none: write the final row's first sublane (forces the loop)
            prev = out[0]
            best_ref[0:8, :] = prev[0:8, :]

    return kern


def build_call(S, W, B, block_b, rolls, best):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    kern = make_kernel(S, W, rolls, best)
    call = pl.pallas_call(
        kern,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((S, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S + W, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )
    return jax.jit(call)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--s", type=int, default=512)
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--block-b", type=int, default=128)
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from mecat_tpu.utils.sim import mutate, random_genome

    B, S, W = args.b, args.s, args.w
    rng = np.random.default_rng(11)
    src = random_genome(S + W, seed=7)
    q = np.tile(src[:S], (B, 1)).astype(np.uint8).T.copy()       # [S, B]
    t = np.tile(mutate(src, rng, .01, .01, .01)[:S + W],
                (B, 1)).astype(np.uint8).T.copy()                # [S+W, B]
    tmax = np.full((1, B), S + W // 2, np.int32)
    segq = np.full((1, B), S, np.int32)
    qd, td = jnp.asarray(q), jnp.asarray(t)
    tmaxd, segqd = jnp.asarray(tmax), jnp.asarray(segq)

    variants = {
        "full": (True, "log"),
        "noroll": (False, "log"),
        "nobest": (True, "none"),
        "elembest": (True, "elem"),
        "baremin": (False, "none"),
    }
    out = {"lanes": B, "S": S, "W": W, "block_b": args.block_b,
           "reps": args.reps}
    cells = S * W * B
    for name, (rolls, best) in variants.items():
        call = build_call(S, W, B, args.block_b, rolls, best)
        r = call(qd, td, tmaxd, segqd)
        np.asarray(r[0, 0])          # compile + sync
        t0 = time.time()
        last = None
        for _ in range(args.reps):
            last = call(qd, td, tmaxd, segqd)
        np.asarray(last[0, 0])
        dt = (time.time() - t0) / args.reps
        out[name + "_gcells_s"] = round(cells / dt / 1e9, 2)
        out[name + "_ms"] = round(dt * 1e3, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

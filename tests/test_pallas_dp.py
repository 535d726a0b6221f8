"""Pallas DP kernel vs XLA reference: bit-for-bit agreement (interpret mode)."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mecat_tpu.ops.align import (Q_SENTINEL, T_SENTINEL, banded_dp_segment,
                                 pick_end_local)
from mecat_tpu.ops.pallas_dp import dp_segment_best_pallas
from mecat_tpu.utils.sim import mutate

S = 128  # pallas-eligible shapes (lane-aligned)
W = 128


@pytest.mark.slow
@pytest.mark.parametrize("W", [64, 128])
@pytest.mark.parametrize("best_mode", ["log", "elem"])
def test_pallas_matches_xla_interpret(W, best_mode):
    rng = np.random.default_rng(121)
    B = 128
    q = np.full((B, S), Q_SENTINEL, np.uint8)
    t = np.full((B, S + W // 2), T_SENTINEL, np.uint8)
    seg_q = np.zeros(B, np.int32)
    tmax = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(40, S))
        src = rng.integers(0, 4, n, dtype=np.uint8)
        dst = mutate(src, rng, 0.04, 0.04, 0.04)[:S + W // 2]
        q[b, :n] = src
        t[b, :len(dst)] = dst
        seg_q[b] = n
        tmax[b] = len(dst)

    rows, moves_x = banded_dp_segment(jnp.asarray(q), jnp.asarray(t),
                                      jnp.asarray(tmax), W)
    r_x, w_x, j_x, d_x, i_x = pick_end_local(rows, jnp.asarray(seg_q),
                                             jnp.asarray(tmax), W)

    half = W // 2
    tpad = np.full((B, S + W), T_SENTINEL, np.uint8)
    tpad[:, half:half + t.shape[1]] = t
    moves_p, r_p, w_p, j_p, d_p, i_p = dp_segment_best_pallas(
        jnp.asarray(q), jnp.asarray(tpad), jnp.asarray(tmax),
        jnp.asarray(seg_q), S=S, W=W, block_b=128, interpret=True,
        best_mode=best_mode)

    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_x))
    np.testing.assert_array_equal(np.asarray(w_p), np.asarray(w_x))
    np.testing.assert_array_equal(np.asarray(j_p), np.asarray(j_x))
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_x))
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
    # packed move matrices agree for every in-band word (out-of-band words
    # may differ only where both encode unreachable cells; require equality
    # on rows fully inside the target: conservative full check per row 1..S
    # restricted to pairs whose band never exits [0, tmax])
    mx = np.asarray(moves_x)   # [S, W/16, B]
    mp = np.asarray(moves_p)
    np.testing.assert_array_equal(mp, mx)


@pytest.mark.slow
def test_pallas_inactive_block_skip():
    """A 128-lane block whose lanes are all inactive must be skipped (d=INF
    unconsumable record) while blocks with any active lane compute the
    exact same DP as an all-active call."""
    from mecat_tpu.ops.align import INF

    rng = np.random.default_rng(77)
    B = 256
    q = np.full((B, S), Q_SENTINEL, np.uint8)
    t = np.full((B, S + W // 2), T_SENTINEL, np.uint8)
    seg_q = np.zeros(B, np.int32)
    tmax = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(40, S))
        src = rng.integers(0, 4, n, dtype=np.uint8)
        dst = mutate(src, rng, 0.04, 0.04, 0.04)[:S + W // 2]
        q[b, :n] = src
        t[b, :len(dst)] = dst
        seg_q[b] = n
        tmax[b] = len(dst)
    half = W // 2
    tpad = np.full((B, S + W), T_SENTINEL, np.uint8)
    tpad[:, half:half + t.shape[1]] = t

    # block 0: one active lane (whole block computes); block 1: none
    active = np.zeros(B, bool)
    active[3] = True
    out_masked = dp_segment_best_pallas(
        jnp.asarray(q), jnp.asarray(tpad), jnp.asarray(tmax),
        jnp.asarray(seg_q), jnp.asarray(active),
        S=S, W=W, block_b=128, interpret=True)
    out_full = dp_segment_best_pallas(
        jnp.asarray(q), jnp.asarray(tpad), jnp.asarray(tmax),
        jnp.asarray(seg_q), None, S=S, W=W, block_b=128, interpret=True)
    # block 0 (any-active): identical to the all-active run, every lane
    for a, b in zip(out_masked[1:], out_full[1:]):
        np.testing.assert_array_equal(np.asarray(a)[:128],
                                      np.asarray(b)[:128])
    np.testing.assert_array_equal(np.asarray(out_masked[0])[:, :, :128],
                                  np.asarray(out_full[0])[:, :, :128])
    # block 1 (all-inactive): unconsumable best record
    r_m, _, j_m, d_m, _ = out_masked[1:]
    assert (np.asarray(d_m)[128:] == INF).all()
    assert (np.asarray(r_m)[128:] == 0).all()
    assert (np.asarray(j_m)[128:] == 0).all()

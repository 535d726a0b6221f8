"""Subprocess worker for the 2-process jax.distributed test.

Invoked by tests/test_dist.py::test_dist_pw_two_processes as
``python tests/dist_worker.py <port> <nproc> <pid> <datadir>`` with
JAX_PLATFORMS=cpu and 4 virtual devices per process; runs the same
run_pw_dist as the in-process tests, writing dist_mp.m4 (rank 0).
"""
import os
import sys


def main():
    port, nproc, pid, d = sys.argv[1:5]
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = nproc
    os.environ["JAX_PROCESS_ID"] = pid

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mecat_tpu.parallel.dist import run_pw_dist
    from mecat_tpu.pipeline.pw import PwOptions

    opts = PwOptions(task=1, kmer_size=9, scan_stride=4, min_align_size=500,
                     num_candidates=8, scan_batch=4, extend_batch=64,
                     align_segment=128, align_band=64, min_block_score=2)
    stats = run_pw_dist(os.path.join(d, "reads.fasta"),
                        os.path.join(d, "dist_mp.m4"),
                        os.path.join(d, "wrk_mp"), opts,
                        n_data=4, n_hash=2)
    print(f"worker {pid}: {stats.overlaps} overlaps", flush=True)


if __name__ == "__main__":
    main()

"""mecat2ref tests: mapping accuracy vs simulation truth, SAM validity."""
import re

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mecat_tpu.io.fasta import decode_bases, write_fasta
from mecat_tpu.io.m4 import read_m4
from mecat_tpu.io.sam import cigar_from_ops
from mecat_tpu.ops.align import MOVE_HORIZ, MOVE_MATCH, MOVE_MISMATCH, MOVE_VERT
from mecat_tpu.pipeline.ref import RefOptions, run_ref
from mecat_tpu.utils.sim import random_genome, simulate_reads

OPTS = dict(num_candidates=8, num_extend=3, min_align_size=400,
            kmer_size=10, scan_stride=5, scan_batch=16, extend_batch=32,
            align_segment=128, align_band=64)


def test_cigar_from_ops():
    ops = np.array([MOVE_MATCH, MOVE_MATCH, MOVE_MISMATCH, MOVE_VERT,
                    MOVE_MATCH, MOVE_HORIZ, MOVE_HORIZ, MOVE_MATCH], np.int32)
    assert cigar_from_ops(ops, 2, 8, 10) == "2S3M1I1M2D1M2S"
    assert cigar_from_ops(np.zeros(0, np.int32), 0, 0, 5) == "5S"


@pytest.fixture(scope="module")
def ref_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ref")
    g1 = random_genome(30000, seed=81)
    g2 = random_genome(20000, seed=82)
    ref = str(tmp / "genome.fasta")
    write_fasta(ref, [("chr1", g1), ("chr2", g2)])
    db, truths = simulate_reads(g1, 12, mean_len=2000, min_len=1000, seed=83,
                                error_rate=0.08)
    db2, truths2 = simulate_reads(g2, 8, mean_len=2000, min_len=1000, seed=84,
                                  error_rate=0.08)
    names, seqs, truth_all = [], [], []
    for i in range(db.n_reads):
        names.append(("chr1", truths[i]))
        seqs.append((f"c1_{i}", db.read(i)))
    for i in range(db2.n_reads):
        names.append(("chr2", truths2[i]))
        seqs.append((f"c2_{i}", db2.read(i)))
    # one junk read that must stay unmapped
    seqs.append(("junk", random_genome(1500, seed=99)))
    names.append((None, None))
    reads = str(tmp / "reads.fasta")
    write_fasta(reads, seqs)
    return tmp, reads, ref, names, seqs, (g1, g2)


def parse_sam(path):
    header, lines = [], []
    for ln in open(path):
        (header if ln.startswith("@") else lines).append(ln.rstrip("\n"))
    return header, [ln.split("\t") for ln in lines]


def cigar_consumes(cigar):
    q = r = 0
    for n, op in re.findall(r"(\d+)([MIDSH])", cigar):
        n = int(n)
        if op in "MIS":
            q += n
        if op in "MD":
            r += n
    return q, r


def test_ref_sam(ref_setup):
    tmp, reads, ref, names, seqs, genomes = ref_setup
    out = str(tmp / "out.sam")
    stats = run_ref(reads, ref, out, str(tmp / "wrk"),
                    RefOptions(output_format="sam", **OPTS))
    header, lines = parse_sam(out)
    assert any("SN:chr1" in h and "LN:30000" in h for h in header)
    assert any("SN:chr2" in h and "LN:20000" in h for h in header)
    by_name = {f[0]: f for f in lines}
    assert len(lines) == len(seqs)  # one line per read

    n_correct = 0
    for (contig, truth), (name, seq) in zip(names, seqs):
        f = by_name[name]
        flag = int(f[1])
        if contig is None:
            assert flag == 4, f
            continue
        assert flag in (0, 16), f
        assert f[2] == contig
        # position within truth span (allow 100bp fuzz for clipping)
        pos = int(f[3]) - 1
        assert truth.start - 150 <= pos <= truth.end, (name, pos, truth)
        assert (flag == 16) == (truth.strand == 1)
        # CIGAR consumes the whole read and a plausible ref span
        qc, rc = cigar_consumes(f[5])
        assert qc == len(seq), (name, qc, len(seq))
        assert abs(rc - (truth.end - truth.start)) < 0.4 * len(seq)
        # SEQ orientation: flag 16 → reverse-complemented read
        n_correct += 1
    assert n_correct == len(seqs) - 1
    assert stats.mapped == n_correct


def test_ref_m4(ref_setup):
    tmp, reads, ref, names, seqs, genomes = ref_setup
    out = str(tmp / "out.m4ref")
    stats = run_ref(reads, ref, out, str(tmp / "wrk2"),
                    RefOptions(output_format="m4", **OPTS))
    recs = list(read_m4(out))
    assert stats.mapped == len(recs) == len(seqs) - 1
    for r in recs:
        contig, truth = names[r.qid - 1]
        assert r.sid == (1 if contig == "chr1" else 2)
        assert truth.start - 150 <= r.sstart <= truth.end
        assert r.identity > 70


def test_ref_cli(ref_setup):
    tmp, reads, ref, names, seqs, genomes = ref_setup
    from mecat_tpu.cli.mecat2ref import main
    out = str(tmp / "cli.sam")
    rc = main(["-d", reads, "-r", ref, "-w", str(tmp / "w3"), "-o", out,
               "-x", "1", "-a", "400", "--kmer-size", "10",
               "--scan-stride", "5", "--scan-batch", "16",
               "--extend-batch", "32", "--align-segment", "128",
               "--align-band", "64"])
    assert rc == 0
    header, lines = parse_sam(out)
    assert len(lines) == len(seqs)

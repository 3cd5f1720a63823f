"""Whole-system check with no prebuilt fixtures: synthesize reads from
a reference/variant mix, count them with the real `count` CLI, and
recover the planted variant with the real `find_mutation` CLI — the
end-to-end capability the reference achieves with fastq-dump +
jellyfish + km (reference: example/run_leucegene.sh:16-35)."""

import io
import re
from contextlib import redirect_stdout

import numpy as np

from km_tpu import cli

K = 31
BASES = "ACGT"


def _random_linear_seq(rng, n):
    """A random sequence whose k-mer chain is linear at k=31 (random
    200-mers virtually never repeat a 31-mer; verified below)."""
    while True:
        seq = "".join(BASES[b] for b in rng.integers(0, 4, n))
        kmers = {seq[i:i + K] for i in range(n - K + 1)}
        if len(kmers) == n - K + 1:
            return seq


def _reads(rng, seq, n_reads, read_len=60):
    out = []
    for _ in range(n_reads):
        off = int(rng.integers(0, len(seq) - read_len + 1))
        out.append(seq[off:off + read_len])
    return out


def test_planted_insertion_recovered_from_reads(tmp_path):
    rng = np.random.default_rng(42)
    ref = _random_linear_seq(rng, 200)
    ins_pos = 100
    insert = "TGCA"
    alt = ref[:ins_pos] + insert + ref[ins_pos:]

    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as f:
        i = 0
        for seq in _reads(rng, ref, 400) + _reads(rng, alt, 400):
            f.write("@r%d\n%s\n+\n%s\n" % (i, seq, "I" * len(seq)))
            i += 1

    target = tmp_path / "target.fa"
    with open(target, "w") as f:
        f.write(">chr1:1000-%d\n%s\n" % (1000 + len(ref) - 1, ref))

    table = tmp_path / "sample.npz"
    cli.main(["count", "-k", str(K), "-L", "2", "-o", str(table),
              str(fq)])

    out = io.StringIO()
    with redirect_stdout(out):
        cli.main(["find_mutation", str(target), str(table)])
    rows = [line.split("\t") for line in out.getvalue().splitlines()
            if line and not line.startswith("#")][1:]
    assert rows, "no paths found"
    variant_rows = [r for r in rows if r[2] not in ("Reference",)
                    and r[11] == "vs_ref"]
    assert variant_rows, rows
    r = variant_rows[0]
    assert r[2] == "Insertion"
    # the variant name reports the CANONICAL placement (slid through
    # repeated context), so assert semantics instead of the string: the
    # reported alternative path sequence is exactly the mutated target
    assert r[8] == alt
    m = re.match(r"(\d+):/(\w+):(\d+)", r[3])
    assert m, r[3]
    assert len(m.group(2)) == len(insert)
    assert abs(int(m.group(1)) - ins_pos) <= len(insert)
    # a 50/50 read mix quantifies near 0.5 (loose: coverage noise)
    rvaf = float(r[4])
    assert 0.3 < rvaf < 0.7, rvaf

"""Generate the self-contained test fixtures in this directory.

Deterministic stand-ins for the reference's bundled data (a catalog
target FASTA + a subset Jellyfish table per variant case,
/root/reference/data/{catalog,jf}): a random 180 bp "exon" pair with
engineered variants, and count tables built by counting k-mers of
simulated wild-type + mutant haplotypes at known depths. Because the
depths are exact (every k-mer of a haplotype appears exactly depth
times), the NNLS fit is exact and the expected rVAF/Expression values
are computable by hand: alt coef = mutant depth, ref coef = wild-type
depth, rVAF = mut / (mut + wt).

Run from the repo root to regenerate:  python tests/fixtures/make_fixtures.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from km_tpu.io.jf import write_jf  # noqa: E402
from km_tpu.models.table import CountTable  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
K = 31
BASES = np.array(list("ACGT"))


def _random_seq(rng, n):
    return "".join(rng.choice(BASES, n))


def _write_fasta(name, entries):
    with open(os.path.join(HERE, name), "w") as f:
        for header, seq in entries:
            f.write(">" + header + "\n")
            for off in range(0, len(seq), 60):
                f.write(seq[off:off + 60] + "\n")


def _write_table(name, haplotypes):
    """haplotypes: [(sequence, depth)] -> canonical count table on disk
    (k-mer count = sum of depth over haplotypes containing it)."""
    counts: dict[int, int] = {}
    for seq, depth in haplotypes:
        table = CountTable.from_sequences([seq], K, canonical=True)
        for key, cnt in zip(table.keys, table.counts):
            counts[int(key)] = counts.get(int(key), 0) + int(cnt) * depth
    keys = np.array(sorted(counts), dtype=np.uint64)
    vals = np.array([counts[int(c)] for c in keys], dtype=np.uint32)
    write_jf(os.path.join(HERE, name), keys, vals, K, canonical=True)


def main():
    rng = np.random.default_rng(20260820)

    # two "exons" on a fake chromosome; the concatenated target is the
    # analysis sequence, the headers carry the genome coordinates
    exon1 = _random_seq(rng, 80)
    exon2 = _random_seq(rng, 100)
    target = exon1 + exon2
    _write_fasta("SYN1_two_exons.fa", [
        ("chrT:1000-1079 | name=SYN1", exon1),
        ("chrT:2000-2099 | name=SYN1", exon2),
    ])

    # substitution case: flip one base mid-exon2 (target index 120)
    pos = 120
    base = target[pos]
    alt = "ACGT"[("ACGT".index(base) + 2) % 4]
    mutant_sub = target[:pos] + alt + target[pos + 1:]
    _write_table("SYN1_sub.jf", [(target, 20), (mutant_sub, 30)])

    # ITD case: tandem-duplicate the 12 bases before index 100
    dup = target[88:100]
    mutant_itd = target[:100] + dup + target[100:]
    _write_table("SYN1_itd.jf", [(target, 10), (mutant_itd, 40)])

    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()

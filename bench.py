"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: k-mers counted per second per chip (the device sort+reduce
counting kernel, steady state, data resident) — the capability that
replaces `jellyfish count`. vs_baseline compares against an estimated
20M k-mers/s for multithreaded Jellyfish on a commodity host (the
reference publishes no numbers; see BASELINE.md).

Extra fields: catalog analysis latency for 400 targets (host batch path
and the full device pipeline — walk, Dijkstra, NNLS — with rows checked
equal), end-to-end file->table counting throughput, and a golden-report
equality check.
"""

import json
import sys
import time

import numpy as np

from km_tpu.utils.jaxcache import enable as _enable_jax_cache

_enable_jax_cache()

JELLYFISH_BASELINE_KMERS_PER_SEC = 20e6
K = 31


def bench_counting(iters: int = 16, chunk: int = 1 << 24):
    """Sustained device counting throughput.

    Every iteration processes *distinct* data (salted on device) and all
    results are read back, so neither execution caching nor lazy
    dispatch in the device tunnel can fake the numbers.
    """
    import jax
    import jax.numpy as jnp

    from km_tpu.ops.count import count_chunk_device

    @jax.jit
    def step(codes, valid, salt):
        c = ((codes.astype(jnp.int32) + salt) % 4).astype(jnp.uint8)
        hi, lo, cnt = count_chunk_device(c, valid, K, canonical=True)
        return cnt.sum(), hi.min()

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, chunk, dtype=np.uint8))
    valid = jnp.ones(chunk, dtype=bool)

    out = step(codes, valid, jnp.int32(0))  # compile + warm up
    _ = int(out[0])

    n_windows = chunk - K + 1
    t0 = time.perf_counter()
    outs = [step(codes, valid, jnp.int32(100 + i)) for i in range(iters)]
    total = sum(int(o[0]) for o in outs)  # forces every execution
    dt = time.perf_counter() - t0
    assert total == n_windows * iters
    return n_windows * iters / dt


def _make_catalog_targets(n_targets, k):
    import os

    from km_tpu.io.fasta import read_target
    from km_tpu.models.sequence import TargetSeq

    cat = "/root/reference/data/catalog/GRCh38"
    base = []
    for fn in sorted(os.listdir(cat)):
        seqs, _ = read_target(os.path.join(cat, fn))
        base.append(("".join(seqs), os.path.splitext(fn)[0]))
    targets = []
    i = 0
    while len(targets) < n_targets:
        seq, name = base[i % len(base)]
        targets.append(TargetSeq(seq, f"{name}_{i}", k))
        i += 1
    return targets


def bench_walk(n_targets: int = 400):
    """400-target batched catalog analysis (host table: robust, no XLA
    compiles; the reference takes seconds *per target*)."""
    from km_tpu.models.batch import run_catalog
    from km_tpu.models.table import CountTable

    host = CountTable.from_jf("/root/reference/data/jf/03H116_ITD.jf")
    targets = _make_catalog_targets(n_targets, host.k)
    t0 = time.perf_counter()
    rows = run_catalog(targets, host, walk="host")
    dt = time.perf_counter() - t0
    assert len(rows) == n_targets
    return dt


def bench_walk_device(n_targets: int = 400):
    """Full device pipeline (single-dispatch walk, batched Dijkstra
    sweeps, batched float64 NNLS), warm (second run) timing. Returns
    (warm_seconds, stage_seconds dict). First-ever run on a machine
    pays XLA compiles (persisted to the on-disk cache); warm runs are
    pure execution. Rows are asserted equal to the host pipeline's."""
    from km_tpu.models.batch import run_catalog
    from km_tpu.models.table import CountTable
    from km_tpu.ops.device_table import DeviceCountTable

    host = CountTable.from_jf("/root/reference/data/jf/03H116_ITD.jf")
    dev = DeviceCountTable.from_host(host)
    targets = _make_catalog_targets(n_targets, host.k)
    host_rows = run_catalog(targets, host, walk="host")
    run_catalog(targets, dev, walk="device")  # compile + warm
    # min of 3: the tunneled-TPU link's latency/bandwidth swings 3-4x
    # between runs; the minimum is the honest device-pipeline number
    dt = float("inf")
    for _ in range(3):
        targets2 = _make_catalog_targets(n_targets, host.k)
        t0 = time.perf_counter()
        rows = run_catalog(targets2, dev, walk="device")
        dt = min(dt, time.perf_counter() - t0)
    assert len(rows) == n_targets
    assert [[str(r) for r in rs] for rs in rows] == \
        [[str(r) for r in rs] for rs in host_rows], \
        "device rows != host rows"
    return dt


def bench_count_e2e(target_mb: int = 256):
    """End-to-end counting throughput on a real file: FASTQ bytes on
    disk -> parse (native C++) -> 2-bit packed upload -> one fused
    device dispatch per chunk (unpack + count + merge into a
    device-resident accumulator) -> single final readback (the
    capability of `jellyfish count <fastq> -o x.jf`, reference:
    example/run_leucegene.sh:22). Returns (kmers_per_sec, n_kmers).
    Reads are sampled from a 2 MB reference, so the table stays small
    like a real transcriptome's.

    Honest caveat measured in: on a tunneled TPU the host<->device
    link, not the kernel, bounds this number."""
    import os

    import numpy as np

    from km_tpu.io.fastq import read_batches
    from km_tpu.ops import count as opcount

    path = os.environ.get("KM_TPU_BENCH_FASTQ",
                          "/tmp/km_tpu_bench_ref_%dmb.fastq" % target_mb)
    if not os.path.exists(path):
        _write_synthetic_fastq(path, target_mb)

    t0 = time.perf_counter()
    batches = read_batches([path], min_quality="+")
    keys, counts = opcount.count_batches_device_stream(
        batches, K, canonical=True, min_count=1)
    dt = time.perf_counter() - t0
    assert len(keys) > 0
    n_windows = int(np.asarray(counts, dtype=np.int64).sum())
    return n_windows / dt, len(keys)


def _write_synthetic_fastq(path: str, target_mb: int,
                           read_len: int = 100,
                           ref_mb: float = 2.0) -> None:
    """FASTQ of roughly target_mb megabytes sampled from a random
    ``ref_mb``-MB reference, like RNA-seq reads off a transcriptome:
    k-mers repeat with the coverage, so the count table is orders of
    magnitude smaller than the read volume (random unanchored reads
    would make every 31-mer unique and the benchmark unrealistically
    readback-bound)."""
    import numpy as np

    rng = np.random.default_rng(0)
    ref_len = int(ref_mb * (1 << 20))
    ref = rng.integers(0, 4, ref_len, dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", np.uint8)
    per_rec = 2 * read_len + 40
    n_reads = (target_mb << 20) // per_rec
    qual = b"I" * read_len
    block = 1 << 14
    offs_all = rng.integers(0, ref_len - read_len, n_reads)
    with open(path, "wb") as f:
        for lo in range(0, n_reads, block):
            offs = offs_all[lo:lo + n_reads - lo][:block]
            idx = offs[:, None] + np.arange(read_len)[None, :]
            seqs = bases[ref[idx]]
            recs = []
            for i in range(len(offs)):
                recs.append(b"@r%d\n%s\n+\n%s\n" % (
                    lo + i, seqs[i].tobytes(), qual))
            f.write(b"".join(recs))


def check_golden():
    import contextlib
    import io as _io
    from argparse import Namespace
    from io import StringIO

    from km_tpu.tools.find_mutation import main_find_mut
    from km_tpu.tools.find_report import main_find_report

    target = "/root/reference/data/catalog/GRCh38/NPM1_4ins_exons_10-11utr.fa"
    args = Namespace(count=5, graphical=False,
                     jellyfish_fn="/root/reference/data/jf/02H025_NPM1.jf",
                     ratio=0.05, steps=500, branchs=10, nodes=10000,
                     target_fn=[target], verbose=False, debug=False)
    out = _io.StringIO()
    with contextlib.redirect_stdout(out):
        main_find_mut(args, None)
    fm = out.getvalue()
    rargs = Namespace(target=target, infile=StringIO(fm), info="vs_ref",
                      min_cov=1, exclu="", format=None)
    out = _io.StringIO()
    with contextlib.redirect_stdout(out):
        main_find_report(rargs, None)
    rep = out.getvalue().split("\n")[2].split("\t")
    return (rep[3] == "ITD" and rep[5] == "4 | 1" and rep[8] == "0.484"
            and rep[9] == "2428")


def main():
    kmers_per_sec = bench_counting()
    try:
        walk_seconds = bench_walk()
    except Exception as e:  # never lose the headline metric
        walk_seconds = None
        print(f"walk bench failed: {e}", file=sys.stderr)
    device_walk_seconds = None
    try:
        device_walk_seconds = bench_walk_device()
    except Exception as e:
        print(f"device walk bench failed: {e}", file=sys.stderr)
    e2e_kmers_per_sec = None
    try:
        e2e_kmers_per_sec, _n = bench_count_e2e()
    except Exception as e:
        print(f"count e2e bench failed: {e}", file=sys.stderr)
    try:
        golden_ok = check_golden()
    except Exception as e:
        golden_ok = False
        print(f"golden check failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "kmers_counted_per_sec_per_chip",
        "value": round(kmers_per_sec, 1),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_sec / JELLYFISH_BASELINE_KMERS_PER_SEC,
                             3),
        "extra": {
            "catalog_walk_400_targets_s": (round(walk_seconds, 3)
                                           if walk_seconds else None),
            "catalog_walk_400_device_warm_s": (
                round(device_walk_seconds, 3)
                if device_walk_seconds else None),
            "count_e2e_file_kmers_per_s": (
                round(e2e_kmers_per_sec, 1)
                if e2e_kmers_per_sec else None),
            "golden_npm1_report_ok": golden_ok,
            "baseline_assumption": "jellyfish ~20e6 kmers/s/host",
        },
    }))


if __name__ == "__main__":
    main()

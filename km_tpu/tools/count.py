"""count: build a k-mer count table from FASTQ/FASTA reads.

Replaces the external ``jellyfish count`` step of km's pipeline
(reference: example/run_leucegene.sh:22). Counting runs on the TPU via
sort + segment reduction (km_tpu.ops.count) or on the host (numpy) for
small inputs / machines without an accelerator. The strategy selection
lives in :func:`count_read_files` and is shared with the cohort tool.
"""

from __future__ import annotations

import os
import sys
import time

from ..io.fastq import read_batches
from ..models.table import CountTable
from ..ops import count as opcount


def count_read_files(paths, k: int, canonical: bool = True,
                     min_count: int = 2, min_quality=None,
                     device: str = "auto", mode: str = "auto"):
    """Count k-mers of read files with the best strategy for the
    attached backend; returns host (keys, counts).

    device: 'auto' (host for tiny inputs, device otherwise), 'host',
    or any accelerator choice. mode picks the device strategy:
    'stream' (single device-resident accumulator, one readback — the
    default everywhere since the accumulator merge's compile blowup
    was root-caused to its segmented associative_scan and fixed;
    compiles now measure flat, 42s->54s from 1M to 21M elements even
    through a remote-compile tunnel, docs/COLDSTART.md) or 'chunked'
    (per-chunk compacted readbacks + native host k-way merge — no
    device-side capacity to size, useful when host RAM is the roomier
    resource). 'auto' = 'stream'.
    """
    batches = read_batches(paths, min_quality=min_quality)

    use_device = device != "host"
    if device == "auto":
        # tiny inputs: a device round-trip costs a fresh XLA compile
        # (tens of seconds through a remote tunnel) for work numpy does
        # in milliseconds
        total = sum(os.path.getsize(p) for p in paths
                    if os.path.exists(p))
        if total < 8 << 20:
            use_device = False

    if not use_device:
        return opcount.count_batches_host(
            batches, k, canonical=canonical, min_count=min_count)

    import jax

    n_devices = len(jax.devices())
    if n_devices > 1 and jax.process_count() == 1:
        # single-process multi-device mesh: every device counts a read
        # shard and the (key, count) runs are routed to their owner key
        # range with one all_to_all per step (parallel.sharded_table).
        # Guarded to one process: in multi-host cohort mode each process
        # counts DIFFERENT samples with different chunk counts, so
        # collectives over the global mesh would run mismatched programs
        # across processes (hang/corruption); there, each sample counts
        # on this host's default device instead.
        from ..parallel.sharded_table import make_mesh, sharded_count

        sys.stderr.write("counting on a %d-device mesh\n" % n_devices)
        return sharded_count(batches, make_mesh(), k,
                             canonical=canonical, min_count=min_count)

    if mode == "auto":
        mode = "stream"
    if mode == "chunked":
        return opcount.count_batches_device_compact(
            batches, k, canonical=canonical, min_count=min_count)

    # streaming accumulator: counts live on device, one readback at the
    # end; on capacity overflow re-read the files with a larger table
    # (counting is stateless, so a retry is exact)
    capacity = 1 << 22
    while True:
        try:
            return opcount.count_batches_device_stream(
                batches, k, canonical=canonical, min_count=min_count,
                capacity=capacity)
        except opcount.CountCapacityOverflow:
            capacity *= 4
            sys.stderr.write(
                "count table capacity exceeded; retrying with "
                "%d slots\n" % capacity)
            batches = read_batches(paths, min_quality=min_quality)


def main_count(args, argparser):
    t0 = time.time()
    keys, counts = count_read_files(
        args.reads_fn, args.k, canonical=args.canonical,
        min_count=args.min_count, min_quality=args.min_quality,
        device=("host" if args.device == "host" else args.device),
        mode=getattr(args, "mode", "auto"))
    table = CountTable.from_arrays(keys, counts, args.k, args.canonical,
                                   name=args.output, presorted=True)
    table.save(args.output)
    dt = time.time() - t0
    sys.stderr.write(
        "counted %d distinct k-mers (k=%d) in %.2fs -> %s\n"
        % (table.n_kmers, args.k, dt, args.output))

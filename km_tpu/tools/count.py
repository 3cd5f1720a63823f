"""count: build a k-mer count table from FASTQ/FASTA reads.

Replaces the external ``jellyfish count`` step of km's pipeline
(reference: example/run_leucegene.sh:22). Counting runs on the TPU via
sort + segment reduction (km_tpu.ops.count) or on the host (numpy) for
small inputs / machines without an accelerator.
"""

from __future__ import annotations

import sys
import time

from ..io.fastq import read_batches
from ..models.table import CountTable
from ..ops import count as opcount


def main_count(args, argparser):
    t0 = time.time()
    batches = read_batches(args.reads_fn, min_quality=args.min_quality)

    use_device = args.device in ("auto", "tpu", "cpu")
    if args.device == "auto":
        # tiny inputs: a device round-trip costs a fresh XLA compile
        # (tens of seconds through a remote tunnel) for work numpy does
        # in milliseconds
        import os

        total = sum(os.path.getsize(p) for p in args.reads_fn
                    if os.path.exists(p))
        if total < 8 << 20:
            use_device = False
    n_devices = 0
    if use_device:
        import jax

        n_devices = len(jax.devices())
    if use_device and n_devices > 1:
        # multi-device mesh: every device counts a read shard and the
        # (key, count) runs are routed to their owner key range with
        # one all_to_all per step (parallel.sharded_table)
        from ..parallel.sharded_table import make_mesh, sharded_count

        mesh = make_mesh()
        sys.stderr.write("counting on a %d-device mesh\n" % n_devices)
        keys, counts = sharded_count(
            batches, mesh, args.k, canonical=args.canonical,
            min_count=args.min_count)
    elif use_device:
        mode = getattr(args, "mode", "auto")
        if mode == "auto":
            # the fused stream-accumulator program is the better design
            # on a directly-attached chip (one readback total), but on
            # the experimental tunneled backend its single large
            # program's remote compile has been observed to hang; the
            # chunked path (per-chunk dispatch + native host k-way
            # merge, exact same counts) compiles like any other kernel
            mode = ("chunked" if jax.default_backend() == "axon"
                    else "stream")
        if mode == "chunked":
            keys, counts = opcount.count_batches_device_compact(
                batches, args.k, canonical=args.canonical,
                min_count=args.min_count)
        else:
            # streaming accumulator: counts live on device, one
            # readback at the end; on capacity overflow re-read the
            # files with a larger table (counting is stateless, so a
            # retry is exact)
            capacity = 1 << 22
            while True:
                try:
                    keys, counts = opcount.count_batches_device_stream(
                        batches, args.k, canonical=args.canonical,
                        min_count=args.min_count, capacity=capacity)
                    break
                except opcount.CountCapacityOverflow:
                    capacity *= 4
                    sys.stderr.write(
                        "count table capacity exceeded; retrying with "
                        "%d slots\n" % capacity)
                    batches = read_batches(args.reads_fn,
                                           min_quality=args.min_quality)
    else:
        keys, counts = opcount.count_batches_host(
            batches, args.k, canonical=args.canonical,
            min_count=args.min_count)

    table = CountTable.from_arrays(keys, counts, args.k, args.canonical,
                                   name=args.output, presorted=True)
    table.save(args.output)
    dt = time.time() - t0
    sys.stderr.write(
        "counted %d distinct k-mers (k=%d) in %.2fs -> %s\n"
        % (table.n_kmers, args.k, dt, args.output))

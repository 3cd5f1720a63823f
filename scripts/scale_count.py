"""GB-scale counting artifact: a billion-base sample counted into one
device-resident table, with the memory envelope reported.

Replicates the scale of the reference's real workload — `jellyfish
count` over one Leucegene RNA-seq sample (~1e9 bases of reads, 8 GB
host RAM, reference: example/README.rst:29) — on one TPU chip. The
read stream is synthesized ON DEVICE (reads sampled from a resident
reference with point mutations, like RNA-seq off a transcriptome), so
the measurement exercises the full counting+merge pipeline at GB scale
without being bounded by this environment's tunneled host<->device
link; the link-bound end-to-end file number lives in bench stage
`e2e` (64 MB fixture) alongside.

Pipeline per chunk (all device-resident, one dispatch):
  synthesize 2^24 bases -> window-pack + canonicalize (Pallas) ->
  chunk sort + run detection (Pallas, fused) -> merge into the
  persistent accumulator (sort + prefix-sum run totals + compaction).
Readback happens ONCE at the end (the stream design).

Usage: python scripts/scale_count.py [--chunks N] [--capacity LOG2]
Writes a JSON line; run with the tunnel healthy and the cache warm.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from km_tpu.utils.jaxcache import enable  # noqa: E402

enable()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from km_tpu.ops.count import (SENTINEL32, count_chunk_device,  # noqa: E402
                              merge_accum_device)

K = 31
CHUNK = 1 << 24          # bases per device chunk
REF_LOG2 = 21            # 2 MB reference -> ~2M distinct k-mers + mutations


def build_step(capacity: int):
    """One fused dispatch: synthesize a read chunk on device, count it,
    merge into the donated accumulator."""

    def step(acc_hi, acc_lo, acc_cnt, key):
        k1, k2, k3 = jax.random.split(key, 3)
        ref = jax.random.randint(jax.random.key(7), (1 << REF_LOG2,),
                                 0, 4, jnp.int32)
        # reads = the reference tiled, with random point mutations
        # (rate 1e-4: ~50k novel k-mers per chunk, keeping the distinct
        # set inside the accumulator like a real transcriptome sample)
        # and a random per-chunk rotation, like sampling read starts
        reps = CHUNK >> REF_LOG2
        codes = jnp.tile(ref, reps)
        shift = jax.random.randint(k1, (), 0, 1 << REF_LOG2, jnp.int32)
        codes = jnp.roll(codes, shift)
        mut_at = jax.random.uniform(k2, (CHUNK,)) < 1e-4
        mut_to = jax.random.randint(k3, (CHUNK,), 0, 4, jnp.int32)
        codes = jnp.where(mut_at, mut_to, codes).astype(jnp.uint8)
        valid = jnp.ones(CHUNK, bool)
        rhi, rlo, rcnt = count_chunk_device(codes, valid, K,
                                            canonical=True)
        return merge_accum_device(acc_hi, acc_lo, acc_cnt,
                                  rhi, rlo, rcnt.astype(jnp.int32),
                                  capacity)

    return jax.jit(step, donate_argnums=(0, 1, 2))


def main():
    chunks = 64
    cap_log2 = 23
    args = sys.argv[1:]
    if "--chunks" in args:
        chunks = int(args[args.index("--chunks") + 1])
    if "--capacity" in args:
        cap_log2 = int(args[args.index("--capacity") + 1])
    C = 1 << cap_log2

    print("backend: %s" % jax.default_backend(), file=sys.stderr)
    step = build_step(C)
    acc_hi = jnp.full(C, np.uint32(SENTINEL32))
    acc_lo = jnp.full(C, np.uint32(SENTINEL32))
    acc_cnt = jnp.zeros(C, jnp.int32)

    # warm (compile + first exec), outside the timed region
    t_compile = time.perf_counter()
    acc_hi, acc_lo, acc_cnt, n_unique = step(acc_hi, acc_lo, acc_cnt,
                                             jax.random.key(0))
    jax.block_until_ready(acc_cnt)
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for i in range(1, chunks):
        acc_hi, acc_lo, acc_cnt, n_unique = step(acc_hi, acc_lo, acc_cnt,
                                                 jax.random.key(i))
    hi = np.asarray(acc_hi, dtype=np.uint64)   # the single readback
    lo = np.asarray(acc_lo, dtype=np.uint64)
    cnt = np.asarray(acc_cnt).astype(np.int64)
    dt = time.perf_counter() - t0

    n_uni = int(np.asarray(n_unique))
    assert n_uni <= C, "accumulator capacity exceeded: %d > %d" % (n_uni, C)
    keys = ((hi << np.uint64(32)) | lo)[cnt > 0]
    counts = cnt[cnt > 0]
    total_kmers = int(counts.sum())
    bases = chunks * CHUNK
    windows = chunks * (CHUNK - K + 1)
    assert total_kmers == windows, (total_kmers, windows)

    hbm_bytes = C * 12 + CHUNK * 2 * 16  # accumulator + transient buffers
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    out = {
        "metric": "count_gb_scale_device_kmers_per_s",
        "value": round((chunks - 1) * (CHUNK - K + 1) / dt, 1),
        "unit": "kmers/s",
        "bases_counted": bases,
        "gb_of_reads_equiv": round(bases * 2.4 / 1e9, 2),
        "distinct_kmers": len(keys),
        "accumulator_slots": C,
        "hbm_envelope_mb": round(hbm_bytes / 1e6, 1),
        "host_rss_mb": round(rss_mb, 1),
        "first_chunk_incl_compile_s": round(compile_s, 1),
        "steady_wall_s": round(dt, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

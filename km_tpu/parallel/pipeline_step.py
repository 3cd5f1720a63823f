"""The full multi-device pipeline step, as one jitted program over a 2-D
mesh — the 'training step' analog of this framework.

Mesh axes:
- ``reads`` (data-parallel): independent read chunks / query batches —
  the analog of batch DP; samples of a cohort fan out here.
- ``shard`` (tensor-parallel): the count table's key space — the analog
  of TP; each device holds one slice of the sorted table.

One step does, entirely inside shard_map with XLA collectives:
1. count the local read chunk (sort + segment-reduce);
2. route (key, count) runs to their owner shard with ``all_to_all``
   over the shard axis (the counting exchange);
3. merge received runs locally (the owner's table delta);
4. look up a data-parallel batch of walk queries against the persistent
   sharded table: local binary search + ``psum`` over the shard axis;
5. expand each query's 4 children and threshold them (one walk step).

Outputs stay sharded: table deltas over (reads, shard), query counts and
child masks over reads.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import count as count_mod
from ..ops.count import count_chunk_device
from ..ops.device_table import child_keys_split, canonical_kernel
from .sharded_table import SENTINEL, _local_lookup


def build_full_step(mesh: Mesh, k: int, chunk: int, bucket_cap: int,
                    rounds: int, canonical: bool = True,
                    reads_axis: str = "reads", shard_axis: str = "shard"):
    n_shards = mesh.shape[shard_axis]
    shard_bits = max(1, int(np.ceil(np.log2(max(n_shards, 2)))))

    def kernel(codes, valid, keys_hi, keys_lo, counts, qhi, qlo,
               ratio, n_cutoff):
        # ---- 1. local count (codes arrive [1, 1, chunk] per device) ----
        hi, lo, cnt = count_chunk_device(codes[0, 0], valid[0, 0], k,
                                         canonical=canonical)

        # ---- 2./3. counting exchange over the shard axis ----
        owner = (hi >> jnp.uint32(32 - shard_bits)).astype(jnp.int32)
        owner = jnp.minimum(owner * n_shards >> shard_bits, n_shards - 1)
        owner = jnp.where(cnt > 0, owner, n_shards)
        order = jnp.argsort(owner, stable=True)
        owner_s, hi_s, lo_s, cnt_s = (owner[order], hi[order], lo[order],
                                      cnt[order])
        idx = jnp.arange(owner.shape[0])
        group_start = jnp.searchsorted(owner_s, jnp.arange(n_shards + 1))
        rank = idx - group_start[jnp.minimum(owner_s, n_shards)]
        keep = (owner_s < n_shards) & (rank < bucket_cap)
        slot = jnp.where(keep, owner_s * bucket_cap + rank,
                         n_shards * bucket_cap)
        dropped = jnp.sum((owner_s < n_shards) & (rank >= bucket_cap))
        bhi = jnp.full((n_shards * bucket_cap + 1,), SENTINEL, jnp.uint32) \
            .at[slot].set(hi_s)[:-1].reshape(n_shards, bucket_cap)
        blo = jnp.full((n_shards * bucket_cap + 1,), SENTINEL, jnp.uint32) \
            .at[slot].set(lo_s)[:-1].reshape(n_shards, bucket_cap)
        bcnt = jnp.zeros((n_shards * bucket_cap + 1,), jnp.int32) \
            .at[slot].set(cnt_s)[:-1].reshape(n_shards, bucket_cap)
        rhi = jax.lax.all_to_all(bhi, shard_axis, 0, 0).reshape(-1)
        rlo = jax.lax.all_to_all(blo, shard_axis, 0, 0).reshape(-1)
        rcnt = jax.lax.all_to_all(bcnt, shard_axis, 0, 0).reshape(-1)
        delta_hi, delta_lo, delta_cnt = count_mod.sum_runs_device(
            rhi, rlo, rcnt)

        # ---- 4. data-parallel lookup on the persistent table ----
        qh = qhi[0]  # [1, Q/R] local -> [Q/R]
        ql = qlo[0]
        if canonical:
            qh, ql = canonical_kernel(qh, ql, k=k)
        qh = jax.lax.pcast(qh, (shard_axis,), to="varying")
        ql = jax.lax.pcast(ql, (shard_axis,), to="varying")
        tip_counts = jax.lax.psum(
            _local_lookup(keys_hi[0], keys_lo[0], counts[0], qh, ql,
                          rounds), shard_axis)

        # ---- 5. one walk step: thresholded child expansion ----
        chi, clo = child_keys_split(qhi[0], qlo[0], k, forward=True)
        ch, cl = (canonical_kernel(chi, clo, k=k) if canonical
                  else (chi, clo))
        ch = jax.lax.pcast(ch, (shard_axis,), to="varying")
        cl = jax.lax.pcast(cl, (shard_axis,), to="varying")
        child_counts = jax.lax.psum(
            _local_lookup(keys_hi[0], keys_lo[0], counts[0], ch, cl,
                          rounds), shard_axis)
        sums = child_counts.sum(axis=-1, keepdims=True)
        thr = jnp.maximum(sums.astype(jnp.float32) * ratio,
                          n_cutoff.astype(jnp.float32))
        child_mask = child_counts.astype(jnp.float32) >= thr

        return (delta_hi[None, None], delta_lo[None, None],
                delta_cnt[None, None], tip_counts[None],
                child_mask[None], dropped[None, None])

    mapped = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(reads_axis, shard_axis),        # codes [R, S, chunk]
                  P(reads_axis, shard_axis),        # valid
                  P(None, shard_axis),              # table keys_hi [1, N]
                  P(None, shard_axis),              # table keys_lo
                  P(None, shard_axis),              # table counts
                  P(reads_axis),                    # qhi [R, Q/R]
                  P(reads_axis),                    # qlo
                  P(), P()),                        # ratio, n_cutoff
        out_specs=(P(reads_axis, shard_axis), P(reads_axis, shard_axis),
                   P(reads_axis, shard_axis), P(reads_axis),
                   P(reads_axis), P(reads_axis, shard_axis)),
    )
    return jax.jit(mapped)


def demo_step(mesh: Mesh, k: int = 31, chunk: int = 4096,
              queries_per_row: int = 256):
    """Build tiny sharded inputs and run one full step on ``mesh``.
    Used by the multichip dry-run and the parallel tests."""
    R = mesh.shape["reads"]
    S = mesh.shape["shard"]
    rng = np.random.default_rng(0)

    codes = rng.integers(0, 4, (R, S, chunk), dtype=np.uint8)
    valid = np.ones((R, S, chunk), dtype=bool)

    # persistent table: random sorted keys, padded per shard
    n_keys = 1 << 12
    keys = np.unique(rng.integers(0, 1 << 62, n_keys, dtype=np.uint64))
    per = -(-len(keys) // S)
    pad = per * S - len(keys)
    hi = ((keys >> np.uint64(32)).astype(np.uint32))
    lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = np.concatenate([hi, np.full(pad, SENTINEL, np.uint32)])[None]
    lo = np.concatenate([lo, np.full(pad, SENTINEL, np.uint32)])[None]
    cnts = np.concatenate([rng.integers(1, 100, len(keys)),
                           np.zeros(pad)]).astype(np.int32)[None]
    rounds = max(1, int(np.ceil(np.log2(max(per, 2)))) + 1)

    q = rng.integers(0, 1 << 62, (R, queries_per_row), dtype=np.uint64)
    qhi = (q >> np.uint64(32)).astype(np.uint32)
    qlo = (q & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    bucket_cap = chunk  # safe bound
    step = build_full_step(mesh, k, chunk, bucket_cap, rounds)
    out = step(jnp.asarray(codes), jnp.asarray(valid), jnp.asarray(hi),
               jnp.asarray(lo), jnp.asarray(cnts), jnp.asarray(qhi),
               jnp.asarray(qlo), jnp.float32(0.05), jnp.int32(5))
    return jax.tree.map(lambda x: np.asarray(x), out)

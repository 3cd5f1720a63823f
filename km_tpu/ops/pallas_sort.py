"""Pallas bitonic chunk sort for the counting pipeline.

XLA's comparator sort costs ~3.4 ns/element on a v5e chip regardless of
segmenting (measured: 16M (u32,u32) pairs = 55 ms) and is ~90% of the
k-mer counting step (capability replaced: the grouping phase of
`jellyfish count`; reference reaches it via
/root/reference/example/run_leucegene.sh:22). This kernel sorts each
chunk entirely in VMEM instead with a bitonic network whose every
compare-exchange is two circular rolls plus masked selects:

- the chunk lives as a (rows, 128) row-major matrix;
- a stage with stride j >= 128 pairs rows r and r ^ (j/128): both
  pairing directions come from sublane rolls by ±j/128;
- a stage with stride j < 128 pairs lanes c and c ^ j: lane rolls by
  ±j (hardware lane rotation);
- XOR-partner selection and the ascending/descending direction bit
  ((element_index & block) != 0) are elementwise masks from iotas.

No reshapes, no transposes, no gather/scatter — every stage is the
same handful of full-tile VPU ops, so the Mosaic compile stays small
even though the network is fully unrolled (log^2 stages).

Chunks are sorted independently (the counting pipeline merges sorted
runs downstream anyway), so one dispatch sorts n/CHUNK chunks on a 1-D
grid and HBM traffic is one read + one write of the data.

Keys are (hi, lo) uint32 pairs compared lexicographically — the packed
k-mer split produced by km_tpu.ops.pallas_pack / count.
"""

from __future__ import annotations

import functools


# Default chunk: 2^17 keys = 512 KB per u32 array — the in/out pair
# plus stage temporaries fit a v5e core's 16 MB of scoped VMEM (2^18
# exceeded it: 18.8 MB).
CHUNK = 1 << 17
_LANES = 128


def _stage(hi, lo, j: int, desc, roll, row_iota, lane_iota):
    """One compare-exchange: pair element i with i ^ j; ``desc`` marks
    the descending blocks of the current level (hoisted per level — it
    only depends on the level's block size)."""
    import jax.numpy as jnp

    if j >= _LANES:
        # (a reshape+concat "half-block swap" formulation of the XOR
        # partner was tried here and measured ~35% SLOWER than the two
        # sublane rolls in Mosaic — keep the rolls)
        jr = j // _LANES
        is_low = (row_iota & jr) == 0
        p_hi = jnp.where(is_low, roll(hi, -jr, 0), roll(hi, jr, 0))
        p_lo = jnp.where(is_low, roll(lo, -jr, 0), roll(lo, jr, 0))
    else:
        is_low = (lane_iota & j) == 0
        p_hi = jnp.where(is_low, roll(hi, -j, 1), roll(hi, j, 1))
        p_lo = jnp.where(is_low, roll(lo, -j, 1), roll(lo, j, 1))

    take_min = is_low ^ desc
    lt = (hi < p_hi) | ((hi == p_hi) & (lo < p_lo))
    sel_self = take_min == lt
    return (jnp.where(sel_self, hi, p_hi), jnp.where(sel_self, lo, p_lo))


def _sort_kernel(hi_ref, lo_ref, out_hi_ref, out_lo_ref, *, chunk: int,
                 interpret: bool):
    import jax
    import jax.numpy as jnp

    if interpret:
        def roll(x, shift, axis):
            return jnp.roll(x, shift, axis)
    else:
        from jax.experimental.pallas import tpu as pltpu

        def roll(x, shift, axis):
            return pltpu.roll(x, shift % x.shape[axis], axis)

    R = chunk // _LANES
    hi = hi_ref[:].reshape(R, _LANES)
    lo = lo_ref[:].reshape(R, _LANES)

    shape = (R, _LANES)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    elem = row_iota * _LANES + lane_iota

    levels = chunk.bit_length() - 1  # chunk = 2^levels
    for lv in range(1, levels + 1):
        desc = (elem & (1 << lv)) != 0  # hoisted: constant per level
        for p in range(lv - 1, -1, -1):
            hi, lo = _stage(hi, lo, 1 << p, desc, roll, row_iota,
                            lane_iota)

    out_hi_ref[:] = hi.reshape(chunk)
    out_lo_ref[:] = lo.reshape(chunk)


def _sort_runs_kernel(hi_ref, lo_ref, out_hi_ref, out_lo_ref, len_ref, *,
                      chunk: int, interpret: bool):
    """Bitonic sort + in-VMEM run-length detection in one kernel: the
    sorted chunk never leaves VMEM between the sort and the run scan,
    so the XLA passes this fuses away (boundary compare, index
    selection, reverse cummin, sentinel zeroing — each a full HBM
    read+write at counting scale) cost nothing but ~5% more VPU work
    (a log2(chunk)-step suffix-min over the resident tile)."""
    import jax
    import jax.numpy as jnp

    if interpret:
        def roll(x, shift, axis):
            return jnp.roll(x, shift, axis)
    else:
        from jax.experimental.pallas import tpu as pltpu

        def roll(x, shift, axis):
            return pltpu.roll(x, shift % x.shape[axis], axis)

    R = chunk // _LANES
    hi = hi_ref[:].reshape(R, _LANES)
    lo = lo_ref[:].reshape(R, _LANES)

    shape = (R, _LANES)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    elem = row_iota * _LANES + lane_iota

    levels = chunk.bit_length() - 1
    for lv in range(1, levels + 1):
        desc = (elem & (1 << lv)) != 0  # hoisted: constant per level
        for p in range(lv - 1, -1, -1):
            hi, lo = _stage(hi, lo, 1 << p, desc, roll, row_iota,
                            lane_iota)

    # previous element in flattened order (garbage at elem 0, masked)
    y_hi, y_lo = roll(hi, 1, 1), roll(lo, 1, 1)
    c0 = lane_iota == 0
    p_hi = jnp.where(c0, roll(y_hi, 1, 0), y_hi)
    p_lo = jnp.where(c0, roll(y_lo, 1, 0), y_lo)
    new_run = (hi != p_hi) | (lo != p_lo) | (elem == 0)

    # next-run-start strictly after each position: inclusive suffix-min
    # of idx shifted left by one, by doubling
    idx = jnp.where(new_run, elem, chunk)

    def shift_left(x, d):
        # x flat-shifted left by d, vacated tail filled with `chunk`
        if d % _LANES == 0:
            s = roll(x, -(d // _LANES), 0)
        else:
            a = roll(x, -d, 1)  # lanes
            s = jnp.where(lane_iota < _LANES - d, a, roll(a, -1, 0))
        return jnp.where(elem < chunk - d, s, chunk)

    s = shift_left(idx, 1)
    d = 1
    while d < chunk:
        s = jnp.minimum(s, shift_left(s, d))
        d *= 2
    lengths = jnp.where(new_run, s - elem, 0)
    sent = jnp.uint32(0xFFFFFFFF)
    lengths = jnp.where((hi == sent) & (lo == sent), 0, lengths)

    out_hi_ref[:] = hi.reshape(chunk)
    out_lo_ref[:] = lo.reshape(chunk)
    len_ref[:] = lengths.reshape(chunk)


def supported(n: int, chunk: int = CHUNK) -> bool:
    # chunk must be a power of two spanning whole (8, 128) tiles
    return (chunk >= 8 * _LANES and chunk & (chunk - 1) == 0
            and n >= chunk and n % chunk == 0)


def sort_chunks_runs(hi, lo, chunk: int = CHUNK, interpret: bool = False):
    """Sort (hi, lo) within independent chunks AND detect runs in the
    same kernel: returns (shi, slo, lengths) where lengths holds each
    run's length at its start position (zeros elsewhere; sentinel runs
    zeroed). Equivalent to sort_chunks + count.runs_from_sorted_chunked
    with the intermediate HBM round-trips fused away."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = hi.shape[0]
    assert supported(n, chunk), (n, chunk)
    grid = (n // chunk,)

    kernel = functools.partial(_sort_runs_kernel, chunk=chunk,
                               interpret=interpret)
    spec = pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM)
    import jax.numpy as jnp

    out_hi, out_lo, lengths = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n,), hi.dtype),
            jax.ShapeDtypeStruct((n,), lo.dtype),
            jax.ShapeDtypeStruct((n,), jnp.int32),
        ],
        interpret=interpret,
    )(hi, lo)
    return out_hi, out_lo, lengths


def sort_chunks(hi, lo, chunk: int = CHUNK, interpret: bool = False):
    """Sort (hi, lo) uint32 key pairs within independent ``chunk``-sized
    chunks (lexicographic, ascending per chunk). n must be a multiple of
    chunk. Returns (hi, lo) with each chunk sorted."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = hi.shape[0]
    assert supported(n, chunk), (n, chunk)
    grid = (n // chunk,)

    kernel = functools.partial(_sort_kernel, chunk=chunk,
                               interpret=interpret)
    out_hi, out_lo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n,), hi.dtype),
            jax.ShapeDtypeStruct((n,), lo.dtype),
        ],
        interpret=interpret,
    )(hi, lo)
    return out_hi, out_lo

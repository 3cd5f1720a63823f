"""Pallas TPU kernel: fused sliding-window k-mer pack + canonicalize +
validity sentinel.

Replaces the XLA formulation in km_tpu.ops.count (pack_windows_device +
revcomp/canonical + window-validity cumsum), which materializes ~k
shifted full-array slices in HBM (~56 ms for a 4M-base chunk on v5e).
Here each grid block loads one code tile into VMEM once and produces the
packed canonical (hi, lo) key pair for every window that starts in the
tile — all k shifted views are VMEM lane-rolls, so HBM traffic is one
u8 read + two u32 writes per base (~40 MB per 4M chunk instead of GBs).

Layout: the base stream is reshaped to (rows, 128) lanes. The window at
flat position p = r*128 + c needs bases p..p+k-1; base p+j is
``roll(x, -j, lanes)`` with a row-carry select for lanes >= 128-j.
Each block reads its (BLOCK_ROWS, 128) tile plus a TAIL_ROWS overlap
tile so windows crossing the block edge resolve locally.

The kernel is the first compute stage of the counting pipeline
(the TPU-native replacement of ``jellyfish count``'s ingest, reference:
example/run_leucegene.sh:22); its output feeds lax.sort + run-length
reduction in km_tpu.ops.count.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 256          # windows emitted per grid step: 256*128 = 32768
TAIL_ROWS = 32            # >= ceil((k-1)/128) and >= the u8 sublane tile
SENTINEL32 = 0xFFFFFFFF


def _revcomp_split(hi, lo, k: int):
    """revcomp on split keys (mirror of km_tpu.ops.device_table
    .revcomp_split, with masks built inline so Pallas tracing sees
    literals, not captured module-level constants)."""

    def revpairs(v):
        m2 = jnp.uint32(0x33333333)
        m4 = jnp.uint32(0x0F0F0F0F)
        m8 = jnp.uint32(0x00FF00FF)
        v = ((v >> jnp.uint32(2)) & m2) | ((v & m2) << jnp.uint32(2))
        v = ((v >> jnp.uint32(4)) & m4) | ((v & m4) << jnp.uint32(4))
        v = ((v >> jnp.uint32(8)) & m8) | ((v & m8) << jnp.uint32(8))
        return (v >> jnp.uint32(16)) | (v << jnp.uint32(16))

    rhi = revpairs(~lo)
    rlo = revpairs(~hi)
    s = 64 - 2 * k
    if s == 0:
        return rhi, rlo
    if s < 32:
        sh = jnp.uint32(s)
        return rhi >> sh, (rlo >> sh) | (rhi << jnp.uint32(32 - s))
    sh = jnp.uint32(s - 32)
    return jnp.zeros_like(rhi), rhi >> sh


def _shifted(arr, j: int, lane):
    """arr flat-shifted left by j (< LANES): element [r, c] becomes
    arr_flat[r*LANES + c + j]. One lane roll + one row shift + select."""
    if j == 0:
        return arr
    a = pltpu.roll(arr, LANES - j, axis=1)      # a[r,c] = arr[r,(c+j)%128]
    a_down = jnp.concatenate([a[1:], a[:1]], axis=0)
    return jnp.where(lane < LANES - j, a, a_down)


def _pack_kernel(cur_ref, tail_ref, vcur_ref, vtail_ref, hi_ref, lo_ref,
                 *, k: int, canonical: bool):
    x = jnp.concatenate(
        [cur_ref[:].astype(jnp.int32), tail_ref[:].astype(jnp.int32)],
        axis=0).astype(jnp.uint32)
    v = jnp.concatenate(
        [vcur_ref[:].astype(jnp.int32), vtail_ref[:].astype(jnp.int32)],
        axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)

    # log-doubling pack: after the step for span s, w[p] holds bases
    # p..p+2s-1 and avs[2s][p] their joint validity — 4 shifted reads
    # to a full 16-base word instead of one per base (the per-base
    # formulation's 62 shifted reads were ~half the whole counting
    # pipeline's device time)
    lo_bases = min(k, 16)
    hi_bases = k - lo_bases
    w = x
    av = v
    avs = {1: v}
    span = 1
    while span < min(k, 16):
        w = (w << jnp.uint32(2 * span)) | _shifted(w, span, lane)
        av = av & _shifted(av, span, lane)
        span *= 2
        avs[span] = av
    # w[p] = bases p..p+span-1 packed in the top 2*span bits of 32

    if k >= 16:
        # hi = first hi_bases bases; lo = 16 bases from p+hi_bases
        hi = (w >> jnp.uint32(2 * (16 - hi_bases))) if hi_bases < 16 else w
        if hi_bases == 0:
            lo = w
        else:
            lo = _shifted(w, hi_bases, lane)
    else:
        hi = jnp.zeros_like(w)
        lo = w >> jnp.uint32(2 * (span - k))
    # validity over k bases: two overlapping pow2 spans cover any k
    # (s = largest built span <= k, and k - s <= s)
    s = min(16, 1 << (k.bit_length() - 1))
    allv = avs[s] if k == s else (avs[s] & _shifted(avs[s], k - s, lane))

    if canonical:
        rhi, rlo = _revcomp_split(hi, lo, k)
        take_rc = (rhi < hi) | ((rhi == hi) & (rlo < lo))
        hi = jnp.where(take_rc, rhi, hi)
        lo = jnp.where(take_rc, rlo, lo)

    invalid = allv == 0
    sent = jnp.uint32(SENTINEL32)
    hi = jnp.where(invalid, sent, hi)
    lo = jnp.where(invalid, sent, lo)
    hi_ref[:] = hi[:BLOCK_ROWS]
    lo_ref[:] = lo[:BLOCK_ROWS]


@functools.partial(jax.jit, static_argnames=("k", "canonical", "interpret"))
def pack_canonical_windows(codes, valid, *, k: int, canonical: bool = True,
                           interpret: bool = False):
    """codes (uint8 in 0..3, length % (BLOCK_ROWS*LANES) == 0) + validity
    mask -> (hi, lo) uint32 canonical keys for every window starting at
    each position; windows that contain an invalid base or run off the
    end are the all-ones sentinel pair."""
    n = codes.shape[0]
    rows = n // LANES
    assert rows % BLOCK_ROWS == 0 and rows * LANES == n
    assert k - 1 <= TAIL_ROWS * LANES
    grid = rows // BLOCK_ROWS

    codes2d = codes.reshape(rows, LANES)
    valid2d = valid.astype(jnp.uint8).reshape(rows, LANES)
    pad = jnp.zeros((TAIL_ROWS, LANES), jnp.uint8)
    codes2d = jnp.concatenate([codes2d, pad], axis=0)
    valid2d = jnp.concatenate([valid2d, pad], axis=0)

    tail_blocks_per_step = BLOCK_ROWS // TAIL_ROWS
    hi, lo = pl.pallas_call(
        functools.partial(_pack_kernel, k=k, canonical=canonical),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TAIL_ROWS, LANES),
                         lambda i: (tail_blocks_per_step * (i + 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TAIL_ROWS, LANES),
                         lambda i: (tail_blocks_per_step * (i + 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(codes2d, codes2d, valid2d, valid2d)
    return hi.reshape(-1), lo.reshape(-1)


def supported(n: int, k: int) -> bool:
    """Whether the Pallas path handles this (chunk length, k)."""
    return (n % (BLOCK_ROWS * LANES) == 0 and k - 1 <= TAIL_ROWS * LANES
            and k >= 2)

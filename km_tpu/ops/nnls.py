"""Batched non-negative least squares on device.

One catalog run produces hundreds of small quantification problems (a
few paths x a few hundred k-mers each — reference hot loop:
km/utils/PathQuant.py:111-149). The host spec (km_tpu.models.quant)
solves them one at a time; here ALL problems across ALL targets pad into
one [B, N, P] batch and solve in a single jitted dispatch:

- initial fit: minimum-norm least squares via batched SVD (the batched
  equivalent of np.linalg.lstsq, including rank-deficient problems —
  an alt path identical to the reference path gives a duplicate column);
- refinement: the spec's projected gradient iteration (step 0.1 x mean
  gradient, post-update clamp, stop at max|grad| <= 0.01), run under a
  while_loop with per-problem freezing — each problem stops updating the
  iteration its own gradient test passes, exactly like the sequential
  loop, while the batch keeps stepping until the last problem converges.

Padding is inert by construction: zero k-mer rows add zero residual and
zero gradient, zero path columns get zero singular values (coef 0) and
zero gradient; the mean-gradient divisor uses each problem's REAL k-mer
count. Math is float32 (TPU-native); equality of the %.3f/%.1f-rounded
report fields against the float64 host spec is asserted across the
bundled fixtures (tests/test_nnls.py) and at the pipeline level
(tests/test_batch_pipeline.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

MAX_ITERS = 200_000  # safety bound; fixtures converge in < 2k iterations


@jax.jit
def _nnls_kernel(contrib, counts, n_kmers):
    """contrib [B,N,P] f32, counts [B,N] f32, n_kmers [B] f32 (real row
    counts). Returns (coef [B,P], rvaf [B,P], iters)."""
    # --- minimum-norm least squares via SVD ---
    u, s, vt = jnp.linalg.svd(contrib, full_matrices=False)
    eps = jnp.finfo(contrib.dtype).eps
    big = jnp.maximum(n_kmers, jnp.float32(contrib.shape[2]))
    cutoff = (eps * big)[:, None] * s[:, :1]  # rcond * largest sv
    sinv = jnp.where(s > cutoff, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    utb = jnp.einsum("bnq,bn->bq", u, counts)
    coef = jnp.einsum("bqp,bq->bp", vt, sinv * utb)

    coef = jnp.maximum(coef, 0.0)

    def cond(state):
        _, done, it = state
        return (~done).any() & (it < MAX_ITERS)

    def body(state):
        coef, done, it = state
        counts_hat = jnp.einsum("bnp,bp->bn", contrib, coef)
        grad = 2.0 * jnp.einsum("bn,bnp->bp", counts - counts_hat,
                                contrib) / n_kmers[:, None]
        new_coef = coef + 0.1 * grad
        grad = jnp.where(new_coef < 0, 0.0, grad)
        new_coef = jnp.maximum(new_coef, 0.0)
        max_grad = jnp.abs(grad).max(axis=-1)
        coef = jnp.where(done[:, None], coef, new_coef)
        done = done | (max_grad <= 0.01)
        return coef, done, it + 1

    done0 = jnp.zeros(contrib.shape[0], dtype=bool)
    coef, _done, iters = jax.lax.while_loop(
        cond, body, (coef, done0, jnp.int32(0)))

    total = coef.sum(axis=-1, keepdims=True)
    all_zero = coef.max(axis=-1, keepdims=True) == 0
    rvaf = jnp.where(all_zero, coef,
                     coef / jnp.where(all_zero, 1.0, total))
    return coef, rvaf, iters


def solve_batch(problems, pad_paths: int | None = None,
                pad_kmers: int | None = None):
    """Solve many NNLS problems in one device dispatch.

    problems: list of (paths, counts) — ``paths`` a list of node-index
    paths, ``counts`` the target's node count vector (shared by all of a
    target's problems). Returns a list of (coef, rvaf) float64 arrays
    trimmed to each problem's real path count.
    """
    from ..models.quant import build_contrib

    if not problems:
        return []
    n_p = [len(paths) for paths, _ in problems]
    n_n = [len(counts) for _, counts in problems]
    P = pad_paths or int(2 ** np.ceil(np.log2(max(max(n_p), 2))))
    N = pad_kmers or int(2 ** np.ceil(np.log2(max(max(n_n), 2))))
    B = len(problems)

    contrib = np.zeros((B, N, P), dtype=np.float32)
    counts = np.zeros((B, N), dtype=np.float32)
    for b, (paths, cnt) in enumerate(problems):
        contrib[b, :n_n[b], :n_p[b]] = build_contrib(paths, n_n[b])
        counts[b, :n_n[b]] = np.asarray(cnt, dtype=np.float32)

    coef, rvaf, _iters = _nnls_kernel(
        jnp.asarray(contrib), jnp.asarray(counts),
        jnp.asarray(np.array(n_n, dtype=np.float32)))
    coef = np.asarray(coef, dtype=np.float64)
    rvaf = np.asarray(rvaf, dtype=np.float64)
    return [(coef[b, :n_p[b]], rvaf[b, :n_p[b]]) for b in range(B)]

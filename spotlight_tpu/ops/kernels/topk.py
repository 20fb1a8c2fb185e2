"""Pallas TPU kernel: fused catalog scoring + streaming top-k.

Completes the fused lookup-and-score design (SURVEY.md §7 step 6b): item
tiles stream through VMEM, are scored against the resident user batch on the
MXU, and a running top-k (scores + item ids) is maintained on-chip — the
``(batch, num_items)`` score matrix never exists, so precision@k-style
evaluation scales to catalogs far larger than HBM would allow for
materialized scores (a 1M-item catalog at batch 256 would need 1 GB per
batch materialized; this kernel needs only the 512 KB tile).

Selection is exact and reproduces ``lax.top_k`` tie order (ties broken by
ascending item id): Mosaic has no sort primitive, so per tile the kernel
extracts the k best candidates by repeated masked max (k is small), then
merges them with the running k the same way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float('-inf')


def _extract_topk(scores, ids, k):
    """Exact top-k of (B, W) scores by repeated masked max.

    Ties break by ascending id, matching lax.top_k on id-ordered input.
    Returns ((B, k) scores, (B, k) ids).
    """
    out_scores = []
    out_ids = []
    for _ in range(k):
        best = jnp.max(scores, axis=1, keepdims=True)            # (B, 1)
        # Among positions achieving the max, pick the smallest id.
        candidate_ids = jnp.where(scores == best, ids, jnp.int32(2 ** 30))
        best_id = jnp.min(candidate_ids, axis=1, keepdims=True)  # (B, 1)
        out_scores.append(best)
        out_ids.append(best_id)
        # Mask out the selected position for the next round.
        scores = jnp.where((scores == best) & (ids == best_id),
                           _NEG_INF, scores)
    return (jnp.concatenate(out_scores, axis=1),
            jnp.concatenate(out_ids, axis=1))


def _topk_kernel(users_ref, items_ref, bias_ref, out_scores_ref,
                 out_ids_ref, *, k, valid_items, tile_items):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_scores_ref[:] = jnp.full_like(out_scores_ref, _NEG_INF)
        out_ids_ref[:] = jnp.zeros_like(out_ids_ref)

    scores = jnp.dot(users_ref[:], items_ref[:].T,
                     preferred_element_type=jnp.float32)
    scores = scores + bias_ref[:]

    base = step * tile_items
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    global_ids = base + col
    scores = jnp.where(global_ids < valid_items, scores, _NEG_INF)

    tile_scores, tile_ids = _extract_topk(scores, global_ids, k)

    merged_scores = jnp.concatenate([out_scores_ref[:], tile_scores],
                                    axis=1)
    merged_ids = jnp.concatenate([out_ids_ref[:], tile_ids], axis=1)
    best_scores, best_ids = _extract_topk(merged_scores, merged_ids, k)
    out_scores_ref[:] = best_scores
    out_ids_ref[:] = best_ids


@functools.partial(jax.jit,
                   static_argnames=('k', 'tile_items', 'interpret'))
def streaming_topk(user_reprs, item_matrix, item_bias, k, tile_items=1024,
                   interpret=False):
    """Exact top-k catalog items per user without materializing scores.

    Parameters
    ----------
    user_reprs : (B, D) float32
    item_matrix : (N, D) float32; item_bias : (N,) float32
    k : int (static)

    Returns
    -------
    (scores, ids) : ((B, k), (B, k)) in descending score order, ties broken
        by ascending item id (lax.top_k parity).
    """
    batch, dim = user_reprs.shape
    num_items = item_matrix.shape[0]

    padded_items = pl.cdiv(num_items, tile_items) * tile_items
    pad = padded_items - num_items
    if pad:
        item_matrix = jnp.concatenate(
            [item_matrix, jnp.zeros((pad, dim), item_matrix.dtype)])
        item_bias = jnp.concatenate(
            [item_bias, jnp.zeros((pad,), item_bias.dtype)])

    kernel = functools.partial(_topk_kernel, k=k, valid_items=num_items,
                               tile_items=tile_items)

    scores, ids = pl.pallas_call(
        kernel,
        grid=(padded_items // tile_items,),
        in_specs=[
            pl.BlockSpec((batch, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_items, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_items), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((batch, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, k), jnp.float32),
            jax.ShapeDtypeStruct((batch, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * dim * padded_items,
            bytes_accessed=padded_items * dim * 4 + batch * dim * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(user_reprs, item_matrix, item_bias[None, :])
    return scores, ids

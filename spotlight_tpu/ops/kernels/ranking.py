"""Pallas TPU kernel: fused catalog scoring + rank counting.

The evaluation hot path (SURVEY.md §3.3) scores every user against the whole
catalog and ranks their test items.  The XLA path materializes a
``(batch, num_items)`` score matrix in HBM, sorts it, and searches it —
three passes over ``batch x num_items`` data.

This kernel fuses the whole thing into one streaming pass: item-embedding
tiles are staged through VMEM, scored against the resident user batch on the
MXU, and immediately reduced to per-target ``count(score > target_score)``
and ``count(score == target_score)`` accumulators.  HBM traffic drops from
``3 * B * N * 4`` bytes to ``N * D * 4`` (the item table read once), and the
score matrix never exists.

The counts reproduce ``scipy.stats.rankdata`` average-rank semantics:
``rank = greater + (equal + 1) / 2`` (see
`/root/reference/spotlight/evaluation.py:52`).

Replaces the per-user Python loop + full materialization for MRR-style
metrics; top-k metrics keep the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rank_count_kernel(users_ref, tscore_ref, tid_ref, items_ref, bias_ref,
                       greater_ref, equal_ref, *, valid_items, tile_items):
    """One grid step: score a tile of items against all users, accumulate
    per-target comparison counts.

    The target item itself is excluded from the counts by id (not by score
    equality), making the rank robust to 1-ulp differences between the
    separately-computed target score and the tile matmul's value.

    Refs:
        users_ref   : (B, D)      VMEM, resident across steps
        tscore_ref  : (B, T)      VMEM, target scores
        tid_ref     : (B, T)      VMEM, target item ids (int32)
        items_ref   : (TILE, D)   VMEM, this step's item tile
        bias_ref    : (1, TILE)   VMEM (2-D: 1-D operands can hit
                                  XLA/Mosaic layout tiling mismatches)
        greater_ref : (B, T)      VMEM accumulator (same block every step)
        equal_ref   : (B, T)      VMEM accumulator
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        greater_ref[:] = jnp.zeros_like(greater_ref)
        equal_ref[:] = jnp.zeros_like(equal_ref)

    # (B, TILE) scores on the MXU.
    scores = jnp.dot(users_ref[:], items_ref[:].T,
                     preferred_element_type=jnp.float32)
    scores = scores + bias_ref[:]  # (1, TILE) broadcasts over batch

    # Mask out-of-range rows of the (padded) final tile.
    base = step * tile_items
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    global_col = base + col
    in_range = global_col < valid_items

    tscores = tscore_ref[:]                        # (B, T)
    tids = tid_ref[:]                              # (B, T)
    num_targets = tscores.shape[1]
    batch = tscores.shape[0]

    # Static unroll over targets: Mosaic cannot index the lane dimension at
    # a runtime offset, but static width-1 slices lower fine.  T is a trace
    # constant (the padded per-batch target width).
    greater_cols = []
    equal_cols = []
    for t in range(num_targets):
        ts = jax.lax.slice(tscores, (0, t), (batch, t + 1))    # (B, 1)
        tid = jax.lax.slice(tids, (0, t), (batch, t + 1))      # (B, 1)
        countable = in_range & (global_col != tid)
        greater_cols.append(jnp.sum(
            jnp.where(countable & (scores > ts), 1.0, 0.0),
            axis=1, keepdims=True))
        equal_cols.append(jnp.sum(
            jnp.where(countable & (scores == ts), 1.0, 0.0),
            axis=1, keepdims=True))

    greater_ref[:] += jnp.concatenate(greater_cols, axis=1)
    equal_ref[:] += jnp.concatenate(equal_cols, axis=1)


@functools.partial(jax.jit, static_argnames=('tile_items', 'interpret'))
def rank_counts(user_reprs, item_matrix, item_bias, target_scores,
                target_ids, tile_items=512, interpret=False):
    """Streaming comparison counts of target scores against the catalog.

    Parameters
    ----------
    user_reprs : (B, D) float32
    item_matrix : (N, D) float32
    item_bias : (N,) float32
    target_scores : (B, T) float32
        Already-computed scores of the target items (cheap: T gathers+dots).
    target_ids : (B, T) int32
        The targets' item ids (excluded from their own counts).
    tile_items : int
        Item rows staged per VMEM tile.

    Returns
    -------
    (greater, equal) : (B, T) float32 counts over the catalog *excluding the
        target itself*; the average-tie rank is
        ``greater + equal / 2 + 1``.
    """
    batch, dim = user_reprs.shape
    num_items = item_matrix.shape[0]
    num_targets = target_scores.shape[1]

    padded_items = pl.cdiv(num_items, tile_items) * tile_items
    pad = padded_items - num_items
    if pad:
        item_matrix = jnp.concatenate(
            [item_matrix, jnp.zeros((pad, dim), item_matrix.dtype)])
        item_bias = jnp.concatenate(
            [item_bias, jnp.zeros((pad,), item_bias.dtype)])

    grid = (padded_items // tile_items,)
    kernel = functools.partial(_rank_count_kernel,
                               valid_items=num_items,
                               tile_items=tile_items)

    greater, equal = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, num_targets), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, num_targets), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_items, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_items), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((batch, num_targets), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, num_targets), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_targets), jnp.float32),
            jax.ShapeDtypeStruct((batch, num_targets), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * dim * padded_items +
            2 * batch * num_targets * padded_items,
            bytes_accessed=padded_items * dim * 4 + batch * dim * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(user_reprs, target_scores, target_ids.astype(jnp.int32),
      item_matrix, item_bias[None, :])

    return greater, equal


def reciprocal_ranks_streaming(user_reprs, item_matrix, item_bias,
                               targets, target_mask, tile_items=512,
                               interpret=False):
    """Mean reciprocal rank per user via the streaming kernel.

    Parameters
    ----------
    user_reprs : (B, D)
    item_matrix : (N, D); item_bias : (N,)
    targets : (B, T) int item ids (clipped-gather on pads)
    target_mask : (B, T) bool

    Returns
    -------
    (B,) mean reciprocal (average-tie) rank over each row's valid targets.
    """
    safe_targets = jnp.clip(targets, 0, item_matrix.shape[0] - 1)
    target_scores = (
        jnp.einsum('bd,btd->bt', user_reprs,
                   item_matrix[safe_targets],
                   preferred_element_type=jnp.float32)
        + item_bias[safe_targets])

    greater, equal = rank_counts(user_reprs, item_matrix, item_bias,
                                 target_scores, safe_targets,
                                 tile_items=tile_items,
                                 interpret=interpret)
    # Self excluded from counts: rank = greater + (equal_incl_self + 1) / 2
    # with equal_incl_self = equal + 1.
    ranks = greater + equal * 0.5 + 1.0
    rr = jnp.where(target_mask, 1.0 / ranks, 0.0)
    denom = jnp.maximum(target_mask.sum(axis=1), 1)
    return rr.sum(axis=1) / denom

"""Distributed full-catalog evaluation over a device mesh.

The reference evaluates user-by-user on one device
(`/root/reference/spotlight/evaluation.py:42-55`).  At catalog scales that
motivate row-sharded item tables, scoring must stay sharded too: each model
shard scores the user batch against *its own* item rows (a local MXU matmul
over the table shard it already holds — no table movement), reduces locally,
and only the tiny per-shard results cross the interconnect:

- :func:`sharded_topk` — local top-k per shard, then an ``all_gather`` of
  ``k`` candidates per shard and a final top-k over ``num_shards * k``
  entries (the tournament merge).  Communication: ``B * k * num_shards``
  scores+ids instead of ``B * N`` scores.
- :func:`sharded_rank_counts` — per-shard comparison counts + ``psum``,
  giving exact average-tie ranks for MRR with only ``(B, T)`` scalars
  communicated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P


def batch_scores(users, items, bias, mixture=None):
    """(B, N) scores of a user operand against item rows.

    ``users`` is (B, D) for dot scoring (``mixture=None``) or the stacked
    (B, 2*M*D) taste+attention matrix for mixture-of-tastes scoring — the
    batch-major analogue of the Pallas kernels' per-tile ``score_fn``
    (`ops/kernels/ranking.make_mixture_score_fn`).  Used per shard over
    local rows and for the target-score computation at the global view.
    """
    if not mixture:
        return jnp.dot(users, items.T,
                       preferred_element_type=jnp.float32) + bias
    from spotlight_tpu.ops.kernels.ranking import mixture_combine

    dim = items.shape[1]
    tastes, attns = [], []
    for m in range(mixture):
        lo = m * dim
        tastes.append(jnp.dot(users[:, lo:lo + dim], items.T,
                              preferred_element_type=jnp.float32))
        lo = (mixture + m) * dim
        attns.append(jnp.dot(users[:, lo:lo + dim], items.T,
                             preferred_element_type=jnp.float32))
    return mixture_combine(tastes, attns) + bias


def sharded_topk(mesh, user_reprs, item_matrix, item_bias, k,
                 axis='model', mixture=None):
    """Top-k items per user over a row-sharded catalog.

    Parameters
    ----------
    mesh : jax.sharding.Mesh
    user_reprs : (B, D) — replicated over the item axis (or (B, 2*M*D)
        for mixture scoring, see :func:`batch_scores`)
    item_matrix : (N, D) — sharded over ``axis`` (N divisible by axis size)
    item_bias : (N,)
    k : int
    mixture : int, optional — mixture-of-tastes component count

    Returns
    -------
    (scores, indices) : ((B, k), (B, k)) — globally best-k, descending,
        ties broken by ascending item id (matching ``lax.top_k`` on the
        unsharded matrix).
    """
    num_shards = mesh.shape[axis]
    local_rows = item_matrix.shape[0] // num_shards

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(None, axis), P(None, axis)),
        check_vma=True)
    def local_topk(users, items_local, bias_local):
        scores = batch_scores(users, items_local, bias_local, mixture)
        # A shard can hold fewer than k rows; pad its candidate list so
        # every shard contributes exactly k entries to the merge.
        local_k = min(k, local_rows)
        local_scores, local_idx = jax.lax.top_k(scores, local_k)
        shard = jax.lax.axis_index(axis)
        global_idx = local_idx + shard * local_rows
        if local_k < k:
            pad = k - local_k
            local_scores = jnp.concatenate(
                [local_scores,
                 jnp.full((scores.shape[0], pad), -jnp.inf,
                          local_scores.dtype)], axis=1)
            global_idx = jnp.concatenate(
                [global_idx,
                 jnp.full((scores.shape[0], pad), jnp.int32(2 ** 30),
                          global_idx.dtype)], axis=1)
        return local_scores, global_idx

    # Per-shard candidates concatenate along the trailing axis; the final
    # tournament merge over num_shards * k entries runs in the global view
    # (XLA moves only the B x k x num_shards candidates, never B x N).
    cand_scores, cand_idx = local_topk(user_reprs, item_matrix, item_bias)

    # Sort by (-score, idx) to reproduce lax.top_k's tie order.
    order = jnp.lexsort((cand_idx, -cand_scores), axis=1)[:, :k]
    return (jnp.take_along_axis(cand_scores, order, axis=1),
            jnp.take_along_axis(cand_idx, order, axis=1))


def sharded_rank_counts(mesh, user_reprs, item_matrix, item_bias,
                        target_scores, target_ids, axis='model',
                        mixture=None):
    """Comparison counts (greater, equal) of target scores against a
    row-sharded catalog, excluding the target item itself.

    Each shard counts over its local rows; a ``psum`` merges.  Combine as
    ``rank = greater + equal / 2 + 1`` (average-tie, rankdata parity).

    Returns
    -------
    (greater, equal) : (B, T) float arrays, replicated.
    """
    num_shards = mesh.shape[axis]
    local_rows = item_matrix.shape[0] // num_shards

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=True)
    def counts(users, items_local, bias_local, tscores, tids):
        scores = batch_scores(users, items_local, bias_local, mixture)
        shard = jax.lax.axis_index(axis)
        global_col = (jnp.arange(scores.shape[1], dtype=jnp.int32)
                      + shard * local_rows)

        # Chunk the target axis: the (B, T, N_local) comparison broadcast
        # would otherwise scale memory with the per-user target count.
        chunk = 16
        num_targets = tscores.shape[1]
        greater_parts = []
        equal_parts = []
        for start in range(0, num_targets, chunk):
            stop = min(start + chunk, num_targets)
            ts = jax.lax.slice_in_dim(tscores, start, stop, axis=1)
            ti = jax.lax.slice_in_dim(tids, start, stop, axis=1)
            not_self = global_col[None, None, :] != ti[:, :, None]
            greater_parts.append(jnp.sum(
                not_self & (scores[:, None, :] > ts[:, :, None]),
                axis=2).astype(jnp.float32))
            equal_parts.append(jnp.sum(
                not_self & (scores[:, None, :] == ts[:, :, None]),
                axis=2).astype(jnp.float32))
        greater = jnp.concatenate(greater_parts, axis=1)
        equal = jnp.concatenate(equal_parts, axis=1)
        return (jax.lax.psum(greater, axis),
                jax.lax.psum(equal, axis))

    return counts(user_reprs, item_matrix, item_bias,
                  target_scores, target_ids.astype(jnp.int32))

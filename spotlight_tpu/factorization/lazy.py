"""Row-sparse (lazy) Adam training engine for large embedding tables.

The default engine streams *dense* table-sized gradients and Adam moments
through HBM every step — optimal below ~0.5M-row tables, where the sweep
is cheaper than per-row bookkeeping (docs/performance.md "Step-cost round
2", item 2).  At larger tables the economics invert: at 500K users x 100K
items (ML-20M scale, D=64) the dense sweep + dense-gradient
materialization cost ~2.1 ms of a 4.73 ms step and grow linearly with the
table, while this engine's cost is *independent of table size*:

- gradients are taken with respect to the **gathered rows** (the gather
  happens outside ``jax.grad``), so the dense table-sized gradient tensor
  never exists;
- duplicates are summed with a sort + segment-sum (matching the
  scatter-add semantics of dense autodiff);
- Adam moments are read, updated, and written **only at the touched
  rows**.

Semantics match torch's ``SparseAdam`` (the optimizer the reference's
``sparse=True`` flag is designed for,
`/root/reference/spotlight/factorization/implicit.py:84-90`): untouched
rows' moments do not decay between the steps that touch them, and bias
correction uses the global step count.  ``l2`` applies the reference's
coupled weight decay to the touched rows (once per row per step).

The engine composes with the other performance knobs (round-3 VERDICT
items 2/3):

- ``table_dtype=bfloat16`` — rows are cast to float32 after the gather
  and moments are stored in float32, so only the table storage (and its
  gather/scatter bytes) shrink;
- ``negative_sampling='in_batch'`` — negatives are rolls of the already
  gathered positive rows, so the update touches *fewer* rows (no negative
  gather at all);
- ``mesh=`` — tables (and moments) stay row-sharded over the ``'model'``
  axis; each data shard's per-row gradients are ``all_gather``-ed over
  ``'data'`` (activation-sized, like the dense engine's psum) and every
  model shard applies :func:`sparse_adam_rows` to the rows it owns.  With
  uniform negatives the global negative stream is sampled identically on
  every device and sliced per data shard, which makes the mesh engine
  **bit-identical** to the single-device lazy engine
  (`tests/test_lazy_adam.py::test_lazy_mesh_matches_single_device`).

Selected with ``sparse=True`` on the factorization estimators (fused
table layout, psum exchange, no custom optimizer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from spotlight_tpu.ops.lazy_adam import lazy_adam_init, sparse_adam_rows
from spotlight_tpu.parallel.sharding import (alltoall_capacity_lookup,
                                             alltoall_lookup)
from spotlight_tpu.ops.losses import (adaptive_hinge_loss, bpr_loss,
                                      hinge_loss, logistic_loss,
                                      pointwise_loss, poisson_loss,
                                      regression_loss)
from spotlight_tpu.ops.sampling import (inbatch_pair_weights,
                                        sample_items_device,
                                        weighted_inbatch_elems)
from spotlight_tpu.utils.training import shuffle_and_batch

__all__ = ['build_lazy_epoch_fn', 'lazy_adam_init', 'lazy_opt_specs',
           'sparse_adam_rows']

_IMPLICIT_LOSSES = {
    'pointwise': pointwise_loss,
    'bpr': bpr_loss,
    'hinge': hinge_loss,
    'adaptive_hinge': adaptive_hinge_loss,
}
_EXPLICIT_LOSSES = {
    'regression': regression_loss,
    'poisson': poisson_loss,
    'logistic': logistic_loss,
}


def lazy_opt_specs(param_specs):
    """PartitionSpec tree for :func:`lazy_adam_init` state: moments shard
    exactly like their parameters; the step counter replicates."""
    return {'mu': param_specs, 'nu': param_specs, 't': P()}


def _fused_pair_scores(u_rows, i_rows_stacked, dim):
    """(S, B) scores from fused rows: u_rows (B, D+1), stacked item rows
    (S, B, D+1) — same arithmetic as BilinearNet.apply_with_negatives."""
    dots = (jnp.sum(u_rows[None, :, :dim] * i_rows_stacked[..., :dim],
                    axis=-1)
            + u_rows[None, :, dim] + i_rows_stacked[..., dim])
    return dots


def _sharded_gather(table, ids, axis='model'):
    """Assemble full rows from a row-sharded table inside ``shard_map``:
    gather owned rows (zeros elsewhere), psum partials — the same
    vocab-parallel exchange as `parallel.sharding.ShardedEmbedding`."""
    local_rows = table.shape[0]
    shard = jax.lax.axis_index(axis)
    start = shard * local_rows
    owned = (ids >= start) & (ids < start + local_rows)
    local_ids = jnp.where(owned, ids - start, 0)
    rows = jnp.where(owned[..., None], table[local_ids],
                     jnp.zeros((), table.dtype))
    return jax.lax.psum(rows, axis)


def _owned_row_update(table, mu, nu, ids, grad_rows, t, learning_rate, l2,
                      axis='model'):
    """Apply :func:`sparse_adam_rows` to the rows this model shard owns:
    non-owned ids route to the out-of-bounds drop sentinel."""
    local_rows = table.shape[0]
    start = jax.lax.axis_index(axis) * local_rows
    local_ids = ids - start
    local_ids = jnp.where((local_ids >= 0) & (local_ids < local_rows),
                          local_ids, local_rows)
    return sparse_adam_rows(local_ids, table, mu, nu, grad_rows, t,
                            learning_rate, l2)


def build_lazy_epoch_fn(net, loss, num_items, num_batches, batch_size,
                        learning_rate, l2, num_negatives, explicit=False,
                        negative_sampling='uniform', mesh=None,
                        param_specs=None, exchange='psum'):
    """Compile the row-sparse epoch for a fused-layout BilinearNet.

    Mirrors :func:`spotlight_tpu.utils.training.build_epoch_fn`'s
    signature contract: ``epoch_fn(params, opt_state, key, data, n_valid)``
    with ``opt_state`` from :func:`lazy_adam_init` (sharded with
    :func:`lazy_opt_specs` on a mesh).

    ``exchange`` selects the mesh lookup collective (round-4 VERDICT
    item 5; single-device engines ignore it):

    - ``'psum'`` — vocab-parallel partial-row psum; batch sharded over
      ``'data'`` only (every model shard redundantly recomputes its data
      row's loss).
    - ``'alltoall'`` — the three-phase id exchange at the same batch
      sharding.
    - ``'alltoall_cf'`` — the capacity-factored exchange with the batch
      sharded over BOTH axes: per-device forward compute and exchange
      volume drop by the model-shard count, and the update stream is
      ``all_gather``-ed over the flattened (data, model) axes in global
      batch order, so results stay **bit-identical** to the psum engine
      (same stream order into the duplicate-id segment sums; the update
      all_gather volume itself is irreducible without capacity-dropping
      gradient rows — docs/parallelism.md "Lazy x cf composition").
    """
    dim = net.embedding_dim
    loss_func = (_EXPLICIT_LOSSES if explicit else _IMPLICIT_LOSSES)[loss]
    adaptive = loss == 'adaptive_hinge'
    n_neg = num_negatives if adaptive else 1
    in_batch = (not explicit) and negative_sampling == 'in_batch'

    def stacked_scores(u_rows, i_rows, batch):
        """(loss elems, per-example weights applied) from f32 fused rows.

        ``i_rows`` is flat ``(S*B, D+1)`` with S = 1 (explicit/in-batch:
        positives only) or 1 + n_neg (uniform: positives ++ negatives).
        """
        if in_batch:
            pos_rows = i_rows.reshape((-1, dim + 1))          # (B, D+1)
            stacked = jnp.stack(
                [pos_rows] + [jnp.roll(pos_rows, s, axis=0)
                              for s in range(1, n_neg + 1)], axis=0)
            dots = _fused_pair_scores(u_rows, stacked, dim)
            positive = dots[0]
            negative = dots[1:] if adaptive else dots[1]
            elems = loss_func(positive, negative, reduce=False)
            pair_weight = inbatch_pair_weights(
                batch['negative_weight'], negative, n_neg)
            return weighted_inbatch_elems(loss, elems, negative,
                                          pair_weight)
        if explicit:
            stacked = i_rows.reshape((1, -1, dim + 1))
            predictions = _fused_pair_scores(u_rows, stacked, dim)[0]
            if loss == 'poisson':
                predictions = jnp.exp(predictions)
            return loss_func(batch['ratings'], predictions, reduce=False)
        stacked = i_rows.reshape((1 + n_neg, -1, dim + 1))
        dots = _fused_pair_scores(u_rows, stacked, dim)
        positive = dots[0]
        negative = dots[1:] if adaptive else dots[1]
        return loss_func(positive, negative, reduce=False)

    if mesh is None:
        return _build_single_device(net, loss, num_items, num_batches,
                                    batch_size, learning_rate, l2, n_neg,
                                    explicit, in_batch, stacked_scores, dim)
    return _build_distributed(net, loss, num_items, num_batches,
                              batch_size, learning_rate, l2, n_neg,
                              explicit, in_batch, stacked_scores, dim,
                              mesh, param_specs, exchange)


def _batch_item_ids(batch, batch_key, num_items, n_neg, explicit, in_batch,
                    batch_columns=None, column_offset=None):
    """(all_items, flat_items) for one step: positives alone (explicit /
    in-batch) or positives ++ sampled negatives.

    ``batch_columns``/``column_offset``: on a mesh, the negative stream is
    sampled at the *global* batch width on every device and each data
    shard slices its own columns — keeping the stream identical to the
    single-device engine's.
    """
    items = batch['item_ids']
    if explicit or in_batch:
        all_items = items[None]
    else:
        width = batch_columns or items.shape[0]
        negatives = sample_items_device(batch_key, num_items,
                                        (n_neg, width))
        if column_offset is not None:
            negatives = jax.lax.dynamic_slice_in_dim(
                negatives, column_offset, items.shape[0], axis=1)
        all_items = jnp.concatenate([items[None], negatives], axis=0)
    return all_items, all_items.reshape(-1)


def _build_single_device(net, loss, num_items, num_batches, batch_size,
                         learning_rate, l2, n_neg, explicit, in_batch,
                         stacked_scores, dim):
    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(4,))
    def epoch_fn(params, opt_state, key, data, n_valid):
        perm_key, negatives_key = jax.random.split(key)
        batched = shuffle_and_batch(perm_key, data, n_valid, num_batches,
                                    batch_size)
        batch_keys = jax.random.split(negatives_key, num_batches)

        def step(carry, batch_and_key):
            params, opt = carry
            batch, batch_key = batch_and_key
            users = batch['user_ids']
            mask = batch['mask']
            t = opt['t'] + 1

            u_table = params['user_embeddings']['weight']
            i_table = params['item_embeddings']['weight']
            _, flat_items = _batch_item_ids(batch, batch_key, num_items,
                                            n_neg, explicit, in_batch)

            # Cast after the gather (outside jax.grad): bf16 tables keep
            # bf16 gathers but score/gradient math runs in f32.
            u_rows = u_table[users].astype(jnp.float32)
            i_rows = i_table[flat_items].astype(jnp.float32)

            def batch_loss(u_rows, i_rows):
                elems = stacked_scores(u_rows, i_rows, batch)
                return (jnp.sum(elems * mask)
                        / jnp.maximum(jnp.sum(mask), 1.0))

            loss_value, (gu, gi) = jax.value_and_grad(
                batch_loss, argnums=(0, 1))(u_rows, i_rows)

            u_table, mu_u, nu_u = sparse_adam_rows(
                users, u_table, opt['mu']['user_embeddings']['weight'],
                opt['nu']['user_embeddings']['weight'], gu, t,
                learning_rate, l2)
            i_table, mu_i, nu_i = sparse_adam_rows(
                flat_items, i_table, opt['mu']['item_embeddings']['weight'],
                opt['nu']['item_embeddings']['weight'], gi, t,
                learning_rate, l2)

            params = {'user_embeddings': {'weight': u_table},
                      'item_embeddings': {'weight': i_table}}
            opt = {'mu': {'user_embeddings': {'weight': mu_u},
                          'item_embeddings': {'weight': mu_i}},
                   'nu': {'user_embeddings': {'weight': nu_u},
                          'item_embeddings': {'weight': nu_i}},
                   't': t}
            return (params, opt), loss_value

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (batched, batch_keys))
        return params, opt_state, jnp.mean(losses)

    return epoch_fn


def _build_distributed(net, loss, num_items, num_batches, batch_size,
                       learning_rate, l2, n_neg, explicit, in_batch,
                       stacked_scores, dim, mesh, param_specs,
                       exchange='psum'):
    """Mesh engine: row-sharded tables/moments + sharded batches.

    Per step each device (d, m):

    1. assembles the full fused rows for its batch slice through the
       configured exchange — the vocab-parallel gather+psum or three-phase
       all-to-all at data-axis batch sharding, or the capacity-factored
       all-to-all with the batch sharded over BOTH axes
       (``exchange='alltoall_cf'``: per-device forward work is 1/S of the
       psum mode's — no redundant loss recomputation across model
       shards);
    2. computes the loss on its local slice against the *global* mask
       denominator, so per-occurrence row cotangents are bit-identical to
       the single-device engine's;
    3. ``all_gather``s the (B, D+1) per-occurrence gradient rows over the
       batch-sharding axes — batch order is preserved (``'data'`` major,
       ``'model'`` minor in cf mode, matching the ``P(('data','model'))``
       batch layout), so duplicate-id segment sums reduce in the
       single-device order;
    4. applies :func:`sparse_adam_rows` to the rows shard ``m`` owns.

    All batch-replicas of a model shard compute identical updates, so the
    P('model') sharding of tables and moments is preserved.  In-batch
    negatives roll within the local batch slice, matching the dense mesh
    engine's semantics (cf excludes in-batch at the estimator level: the
    roll width would change with the model-shard count).
    """
    from jax import shard_map

    opt_specs = lazy_opt_specs(param_specs)
    data_shards = mesh.shape['data']
    cf = exchange == 'alltoall_cf'
    batch_shards = data_shards * (mesh.shape['model'] if cf else 1)
    batch_axes = ('data', 'model') if cf else 'data'
    local_batch = batch_size // batch_shards

    def gather_rows(table, ids):
        if exchange == 'alltoall':
            # Assembled rows are value-identical to the psum exchange's
            # (unit-verified bit-equal), but the exchange's different
            # producer graph shifts XLA's codegen of the downstream loss
            # by ~1 ulp per step (measured ~3e-6 parameter drift after an
            # epoch; an optimization_barrier does not remove it) — this
            # mode is numerically equivalent, not bit-identical.  The cf
            # and psum modes ARE bit-identical to single-device.
            return alltoall_lookup(table, ids)
        if cf:
            rows, _overflow = alltoall_capacity_lookup(table, ids)
            return rows
        return _sharded_gather(table, ids)

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(4,))
    def epoch_fn(params, opt_state, key, data, n_valid):
        perm_key, negatives_key = jax.random.split(key)
        batched = shuffle_and_batch(perm_key, data, n_valid, num_batches,
                                    batch_size)
        batch_keys = jax.random.split(negatives_key, num_batches)
        batch_specs = {name: P(batch_axes) for name in batched}

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(param_specs, opt_specs, batch_specs, P()),
            out_specs=(param_specs, opt_specs, P()),
            check_vma=False)
        def sharded_step(params, opt, batch, batch_key):
            users = batch['user_ids']
            mask = batch['mask']
            t = opt['t'] + 1

            u_table = params['user_embeddings']['weight']
            i_table = params['item_embeddings']['weight']
            if cf:
                block = (jax.lax.axis_index('data') * mesh.shape['model']
                         + jax.lax.axis_index('model'))
            else:
                block = jax.lax.axis_index('data')
            offset = block * local_batch
            all_items, flat_items = _batch_item_ids(
                batch, batch_key, num_items, n_neg, explicit, in_batch,
                batch_columns=batch_size, column_offset=offset)

            u_rows = gather_rows(u_table, users).astype(jnp.float32)
            i_rows = gather_rows(i_table, flat_items).astype(jnp.float32)

            def batch_loss(u_rows, i_rows):
                elems = stacked_scores(u_rows, i_rows, batch)
                count = jax.lax.psum(jnp.sum(mask), batch_axes)
                return jnp.sum(elems * mask) / jnp.maximum(count, 1.0)

            local_loss, (gu, gi) = jax.value_and_grad(
                batch_loss, argnums=(0, 1))(u_rows, i_rows)
            loss_value = jax.lax.psum(local_loss, batch_axes)

            all_users = jax.lax.all_gather(users, batch_axes, tiled=True)
            all_gu = jax.lax.all_gather(gu, batch_axes, tiled=True)
            # Gather item occurrences along the *batch* axis per role
            # (positives / each negative column), so the flattened global
            # order is [positives ++ negatives] exactly like the
            # single-device engine's — duplicate-id segment sums then
            # reduce in the identical order (bit-parity).
            all_item_ids = jax.lax.all_gather(
                all_items, batch_axes, axis=1, tiled=True).reshape(-1)
            gi_roles = gi.reshape(all_items.shape + (dim + 1,))
            all_gi = jax.lax.all_gather(
                gi_roles, batch_axes, axis=1, tiled=True).reshape(-1,
                                                                  dim + 1)

            u_table, mu_u, nu_u = _owned_row_update(
                u_table, opt['mu']['user_embeddings']['weight'],
                opt['nu']['user_embeddings']['weight'], all_users, all_gu,
                t, learning_rate, l2)
            i_table, mu_i, nu_i = _owned_row_update(
                i_table, opt['mu']['item_embeddings']['weight'],
                opt['nu']['item_embeddings']['weight'], all_item_ids,
                all_gi, t, learning_rate, l2)

            params = {'user_embeddings': {'weight': u_table},
                      'item_embeddings': {'weight': i_table}}
            opt = {'mu': {'user_embeddings': {'weight': mu_u},
                          'item_embeddings': {'weight': mu_i}},
                   'nu': {'user_embeddings': {'weight': nu_u},
                          'item_embeddings': {'weight': nu_i}},
                   't': t}
            return params, opt, loss_value

        def step(carry, batch_and_key):
            params, opt_state = carry
            batch, batch_key = batch_and_key
            params, opt_state, loss_value = sharded_step(
                params, opt_state, batch, batch_key)
            return (params, opt_state), loss_value

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (batched, batch_keys))
        return params, opt_state, jnp.mean(losses)

    return epoch_fn

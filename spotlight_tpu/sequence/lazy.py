"""Row-sparse (lazy) Adam engine for the sequence models.

The sequence analogue of :mod:`spotlight_tpu.factorization.lazy` (see
there for the design rationale and torch-SparseAdam semantics): the item
table's gradients are taken with respect to the gathered rows, and its
Adam moments update only at the touched rows, so the per-step table cost
is independent of the catalog size.  The dense tower (LSTM / CNN /
projection parameters) keeps a standard optax Adam — a hybrid optimizer
state ``{'table': {mu, nu}, 'tower': optax_state, 't': step}``.

This is the regime the bloom-embedding scalability study lives in
(docs/performance.md "Bloom scalability"): above ~1M items the dense
engine's whole-table Adam sweep dominates the step.  ``sparse=True``
keeps the *exact* (uncompressed) table competitive at those sizes.

Like the factorization engine it composes with ``table_dtype=bfloat16``
(bf16 storage, f32 moments/update math), ``negative_sampling='in_batch'``
(negatives are batch-axis rolls of the already-gathered rows), and
``mesh=`` (table and moments row-sharded over ``'model'``; the dense
tower replicated with a ``psum('data')`` gradient reduction; per-row
table gradients ``all_gather``-ed over ``'data'`` in role order so the
sharded update is bit-identical to the single-device one).

Selected with ``sparse=True`` on :class:`ImplicitSequenceModel` (built-in
representations with the fused layout, psum exchange, no custom
optimizer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from spotlight_tpu.factorization.lazy import (_owned_row_update,
                                              _sharded_gather)
from spotlight_tpu.ops.lazy_adam import sparse_adam_rows
from spotlight_tpu.ops.losses import (adaptive_hinge_loss, bpr_loss,
                                      hinge_loss, pointwise_loss)
from spotlight_tpu.ops.sampling import (inbatch_pair_weights,
                                        sample_items_device,
                                        weighted_inbatch_elems)
from spotlight_tpu.sequence.representations import PADDING_IDX
from spotlight_tpu.utils.training import shuffle_and_batch

_LOSSES = {
    'pointwise': pointwise_loss,
    'bpr': bpr_loss,
    'hinge': hinge_loss,
    'adaptive_hinge': adaptive_hinge_loss,
}


def _split_params(params):
    tower = {name: value for name, value in params.items()
             if name != 'item_embeddings'}
    return params['item_embeddings']['weight'], tower


def lazy_seq_adam_init(params, tower_optimizer):
    """Hybrid optimizer state: touched-rows float32 moments for the item
    table, optax state for the dense tower."""
    table, tower = _split_params(params)
    return {
        'table': {'mu': jnp.zeros(table.shape, jnp.float32),
                  'nu': jnp.zeros(table.shape, jnp.float32)},
        'tower': tower_optimizer.init(tower),
        't': jnp.zeros((), jnp.int32),
    }


def lazy_seq_opt_specs(opt_state, params, param_specs):
    """PartitionSpec tree for the hybrid state: table moments shard like
    the item table; tower state inherits the tower parameters' specs."""
    from spotlight_tpu.parallel.training import opt_specs_like

    table_spec = param_specs['item_embeddings']['weight']
    tower_params = {name: value for name, value in params.items()
                    if name != 'item_embeddings'}
    tower_specs = {name: spec for name, spec in param_specs.items()
                   if name != 'item_embeddings'}
    return {
        'table': {'mu': table_spec, 'nu': table_spec},
        'tower': opt_specs_like(opt_state['tower'], tower_params,
                                tower_specs),
        't': P(),
    }


def _masked_rows(table, ids):
    """Gather fused rows with the read-side padding semantics of
    ``_masked_gather``: id 0 contributes a zero row.

    The mask sits *outside* ``jax.grad`` (the engine differentiates with
    respect to these already-masked rows), so cotangents at PAD positions
    are generally nonzero; the epoch step keeps the table's padding row
    frozen by dropping PAD ids before :func:`sparse_adam_rows` (matching
    the dense engine, where the in-grad mask zeroes those cotangents)."""
    rows = table[ids]
    return jnp.where((ids == PADDING_IDX)[..., None],
                     jnp.zeros((), rows.dtype), rows)


def _drop_pad(ids, num_rows):
    """Route PAD ids to the out-of-bounds drop sentinel so the padding
    row stays frozen (torch padding_idx semantics)."""
    return jnp.where(ids == PADDING_IDX, num_rows, ids)


def build_lazy_epoch_fn(net, loss, num_items, num_batches, batch_size,
                        learning_rate, l2, num_negatives, tower_optimizer,
                        negative_sampling='uniform', mesh=None,
                        param_specs=None, exchange='psum'):
    """Compile the row-sparse epoch for a fused-layout sequence net.

    ``exchange`` ('psum' default, or 'alltoall') selects the mesh item-row
    lookup collective; 'alltoall_cf' is excluded for sequence models (the
    dense tower would additionally need model-axis batch replication) and
    falls back at the estimator level."""
    dim = net.embedding_dim
    loss_func = _LOSSES[loss]
    adaptive = loss == 'adaptive_hinge'
    n_neg = num_negatives if adaptive else 1
    in_batch = negative_sampling == 'in_batch'

    def step_elems(pos_rows, neg_rows, tower, batch):
        """Elementwise loss (B, T) from f32 fused rows.

        ``neg_rows`` is None for in-batch sampling (negatives are rolls
        of ``pos_rows``)."""
        reprs, _ = net._user_repr_from_emb(tower, pos_rows[..., :dim])
        positive = net._score_vectors(reprs, pos_rows[..., :dim],
                                      pos_rows[..., dim])
        if in_batch:
            negative = [
                net._score_vectors(
                    reprs,
                    jnp.roll(pos_rows[..., :dim], s, axis=0),
                    jnp.roll(pos_rows[..., dim], s, axis=0))
                for s in range(1, n_neg + 1)]
        else:
            negative = [
                net._score_vectors(reprs, neg_rows[s, ..., :dim],
                                   neg_rows[s, ..., dim])
                for s in range(n_neg)]
        negative = (jnp.stack(negative, axis=0) if adaptive
                    else negative[0])
        elems = loss_func(positive, negative, reduce=False)
        if in_batch:
            pair_weight = inbatch_pair_weights(
                batch['negative_weight'], negative, n_neg)
            elems = weighted_inbatch_elems(loss, elems, negative,
                                           pair_weight)
        return elems

    if mesh is None:
        return _build_single_device(loss, num_items, num_batches,
                                    batch_size, learning_rate, l2, n_neg,
                                    in_batch, step_elems, dim,
                                    tower_optimizer)
    return _build_distributed(loss, num_items, num_batches, batch_size,
                              learning_rate, l2, n_neg, in_batch,
                              step_elems, dim, tower_optimizer, mesh,
                              param_specs, exchange=exchange)


def _build_single_device(loss, num_items, num_batches, batch_size,
                         learning_rate, l2, n_neg, in_batch, step_elems,
                         dim, tower_optimizer):
    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(4,))
    def epoch_fn(params, opt_state, key, data, n_valid):
        perm_key, negatives_key = jax.random.split(key)
        batched = shuffle_and_batch(perm_key, data, n_valid, num_batches,
                                    batch_size)
        batch_keys = jax.random.split(negatives_key, num_batches)

        def step(carry, batch_and_key):
            params, opt = carry
            batch, batch_key = batch_and_key
            sequences = batch['sequences']                      # (B, T)
            t = opt['t'] + 1

            table, tower = _split_params(params)
            pos_rows = _masked_rows(table,
                                    sequences).astype(jnp.float32)
            if in_batch:
                negatives, neg_rows = None, None
            else:
                negatives = sample_items_device(
                    batch_key, num_items, (n_neg,) + sequences.shape)
                neg_rows = _masked_rows(
                    table, negatives).astype(jnp.float32)   # (n,B,T,D+1)

            mask = ((sequences != PADDING_IDX) &
                    (batch['mask'][:, None] > 0)).astype(jnp.float32)

            def batch_loss(pos_rows, neg_rows, tower):
                elems = step_elems(pos_rows, neg_rows, tower, batch)
                return (jnp.sum(elems * mask)
                        / jnp.maximum(jnp.sum(mask), 1.0))

            loss_value, (g_pos, g_neg, g_tower) = jax.value_and_grad(
                batch_loss, argnums=(0, 1, 2))(pos_rows, neg_rows, tower)

            if in_batch:
                ids = sequences.reshape(-1)
                grad_rows = g_pos.reshape(-1, dim + 1)
            else:
                ids = jnp.concatenate(
                    [sequences.reshape(-1), negatives.reshape(-1)])
                grad_rows = jnp.concatenate(
                    [g_pos.reshape(-1, dim + 1),
                     g_neg.reshape(-1, dim + 1)])
            ids = _drop_pad(ids, table.shape[0])
            table, mu, nu = sparse_adam_rows(
                ids, table, opt['table']['mu'], opt['table']['nu'],
                grad_rows, t, learning_rate, l2)

            updates, tower_state = tower_optimizer.update(
                g_tower, opt['tower'], tower)
            tower = optax.apply_updates(tower, updates)

            params = dict(tower)
            params['item_embeddings'] = {'weight': table}
            opt = {'table': {'mu': mu, 'nu': nu},
                   'tower': tower_state, 't': t}
            return (params, opt), loss_value

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (batched, batch_keys))
        return params, opt_state, jnp.mean(losses)

    return epoch_fn


def _build_distributed(loss, num_items, num_batches, batch_size,
                       learning_rate, l2, n_neg, in_batch, step_elems,
                       dim, tower_optimizer, mesh, param_specs,
                       exchange='psum'):
    """Mesh engine: row-sharded item table/moments, replicated tower.

    Same structure as the factorization mesh engine
    (`factorization/lazy._build_distributed`): vocab-parallel gather+psum
    for the rows, loss on the local batch slice against the global mask
    denominator, role-ordered ``all_gather('data')`` of per-occurrence
    gradient rows, per-shard :func:`sparse_adam_rows` on owned rows.  The
    tower adds one ``psum('data')`` for its (replicated) gradients.  With
    uniform negatives the stream is sampled at global width on every
    device and sliced per data shard — bit-parity with the single-device
    engine."""
    from jax import shard_map

    data_shards = mesh.shape['data']
    local_batch = batch_size // data_shards

    def opt_specs_of(opt_state, params):
        return lazy_seq_opt_specs(opt_state, params, param_specs)

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(4,))
    def epoch_fn(params, opt_state, key, data, n_valid):
        perm_key, negatives_key = jax.random.split(key)
        batched = shuffle_and_batch(perm_key, data, n_valid, num_batches,
                                    batch_size)
        batch_keys = jax.random.split(negatives_key, num_batches)
        batch_specs = {name: P('data') for name in batched}
        specs = opt_specs_of(opt_state, params)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(param_specs, specs, batch_specs, P()),
            out_specs=(param_specs, specs, P()),
            check_vma=False)
        def sharded_step(params, opt, batch, batch_key):
            sequences = batch['sequences']              # (B_local, T)
            t = opt['t'] + 1

            table, tower = _split_params(params)

            def gather(ids):
                if exchange == 'alltoall':
                    # Numerically equivalent to the psum exchange, ~1
                    # ulp/step off bit-parity (see
                    # factorization/lazy.gather_rows).
                    from spotlight_tpu.parallel.sharding import \
                        alltoall_lookup
                    rows = alltoall_lookup(table, ids)
                else:
                    rows = _sharded_gather(table, ids)
                rows = jnp.where((ids == PADDING_IDX)[..., None],
                                 jnp.zeros((), rows.dtype), rows)
                return rows.astype(jnp.float32)

            pos_rows = gather(sequences)
            if in_batch:
                negatives, neg_rows = None, None
            else:
                width = (n_neg, batch_size) + sequences.shape[1:]
                neg_global = sample_items_device(batch_key, num_items,
                                                 width)
                offset = jax.lax.axis_index('data') * local_batch
                negatives = jax.lax.dynamic_slice_in_dim(
                    neg_global, offset, sequences.shape[0], axis=1)
                neg_rows = gather(negatives)

            mask = ((sequences != PADDING_IDX) &
                    (batch['mask'][:, None] > 0)).astype(jnp.float32)

            def batch_loss(pos_rows, neg_rows, tower):
                elems = step_elems(pos_rows, neg_rows, tower, batch)
                count = jax.lax.psum(jnp.sum(mask), 'data')
                return jnp.sum(elems * mask) / jnp.maximum(count, 1.0)

            local_loss, (g_pos, g_neg, g_tower) = jax.value_and_grad(
                batch_loss, argnums=(0, 1, 2))(pos_rows, neg_rows, tower)
            loss_value = jax.lax.psum(local_loss, 'data')
            g_tower = jax.lax.psum(g_tower, 'data')

            # Role-ordered global gradient rows (see the factorization
            # engine): positives gather over the batch axis; each
            # negative column over its own batch axis.
            all_seq = jax.lax.all_gather(sequences, 'data', axis=0,
                                         tiled=True)
            all_gpos = jax.lax.all_gather(g_pos, 'data', axis=0,
                                          tiled=True)
            if in_batch:
                ids = all_seq.reshape(-1)
                grad_rows = all_gpos.reshape(-1, dim + 1)
            else:
                all_neg = jax.lax.all_gather(negatives, 'data', axis=1,
                                             tiled=True)
                all_gneg = jax.lax.all_gather(g_neg, 'data', axis=1,
                                              tiled=True)
                ids = jnp.concatenate(
                    [all_seq.reshape(-1), all_neg.reshape(-1)])
                grad_rows = jnp.concatenate(
                    [all_gpos.reshape(-1, dim + 1),
                     all_gneg.reshape(-1, dim + 1)])

            local_rows = table.shape[0]
            start = jax.lax.axis_index('model') * local_rows
            # PAD ids freeze globally; express PAD as out-of-range in
            # *global* coordinates before the owned-row shift.
            ids = jnp.where(ids == PADDING_IDX,
                            start + local_rows, ids)
            table, mu, nu = _owned_row_update(
                table, opt['table']['mu'], opt['table']['nu'], ids,
                grad_rows, t, learning_rate, l2)

            updates, tower_state = tower_optimizer.update(
                g_tower, opt['tower'], tower)
            tower = optax.apply_updates(tower, updates)

            params = dict(tower)
            params['item_embeddings'] = {'weight': table}
            opt = {'table': {'mu': mu, 'nu': nu},
                   'tower': tower_state, 't': t}
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

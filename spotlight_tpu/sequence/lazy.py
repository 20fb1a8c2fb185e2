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

Selected with ``sparse=True`` on :class:`ImplicitSequenceModel` (built-in
representations with the fused float32 layout, single device, uniform
negative sampling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from spotlight_tpu.ops.lazy_adam import sparse_adam_rows
from spotlight_tpu.ops.losses import (adaptive_hinge_loss, bpr_loss,
                                      hinge_loss, pointwise_loss)
from spotlight_tpu.ops.sampling import sample_items_device
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
    """Hybrid optimizer state: touched-rows moments for the item table,
    optax state for the dense tower."""
    table, tower = _split_params(params)
    return {
        'table': {'mu': jnp.zeros_like(table),
                  'nu': jnp.zeros_like(table)},
        'tower': tower_optimizer.init(tower),
        't': jnp.zeros((), jnp.int32),
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


def build_lazy_epoch_fn(net, loss, num_items, num_batches, batch_size,
                        learning_rate, l2, num_negatives, tower_optimizer):
    """Compile the row-sparse epoch for a fused-layout sequence net."""
    dim = net.embedding_dim
    loss_func = _LOSSES[loss]
    adaptive = loss == 'adaptive_hinge'
    n_neg = num_negatives if adaptive else 1

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
            negatives = sample_items_device(
                batch_key, num_items, (n_neg,) + sequences.shape)

            pos_rows = _masked_rows(table, sequences)           # (B, T, D+1)
            neg_rows = _masked_rows(table, negatives)       # (n, B, T, D+1)

            mask = ((sequences != PADDING_IDX) &
                    (batch['mask'][:, None] > 0)).astype(jnp.float32)

            def batch_loss(pos_rows, neg_rows, tower):
                reprs, _ = net._user_repr_from_emb(tower,
                                                   pos_rows[..., :dim])
                positive = net._score_vectors(
                    reprs, pos_rows[..., :dim], pos_rows[..., dim])
                negative = [
                    net._score_vectors(reprs, neg_rows[s, ..., :dim],
                                       neg_rows[s, ..., dim])
                    for s in range(n_neg)]
                negative = (jnp.stack(negative, axis=0) if adaptive
                            else negative[0])
                elems = loss_func(positive, negative, reduce=False)
                return (jnp.sum(elems * mask)
                        / jnp.maximum(jnp.sum(mask), 1.0))

            loss_value, (g_pos, g_neg, g_tower) = jax.value_and_grad(
                batch_loss, argnums=(0, 1, 2))(pos_rows, neg_rows, tower)

            ids = jnp.concatenate(
                [sequences.reshape(-1), negatives.reshape(-1)])
            # The padding row stays frozen (torch padding_idx semantics):
            # _masked_rows masks reads outside jax.grad, so PAD positions
            # carry nonzero cotangents — route their ids to the
            # out-of-bounds drop sentinel instead of row 0.
            ids = jnp.where(ids == PADDING_IDX, table.shape[0], ids)
            grad_rows = jnp.concatenate(
                [g_pos.reshape(-1, dim + 1),
                 g_neg.reshape(-1, dim + 1)])
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

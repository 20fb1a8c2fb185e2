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

Selected with ``sparse=True`` on the factorization estimators (fused
table layout, single-device, uniform negative sampling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spotlight_tpu.ops.losses import (adaptive_hinge_loss, bpr_loss,
                                      hinge_loss, logistic_loss,
                                      pointwise_loss, poisson_loss,
                                      regression_loss)
from spotlight_tpu.ops.lazy_adam import lazy_adam_init, sparse_adam_rows
from spotlight_tpu.ops.sampling import sample_items_device
from spotlight_tpu.utils.training import shuffle_and_batch

__all__ = ['build_lazy_epoch_fn', 'lazy_adam_init', 'sparse_adam_rows']

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


def _fused_pair_scores(u_rows, i_rows_stacked, dim):
    """(S, B) scores from fused rows: u_rows (B, D+1), stacked item rows
    (S, B, D+1) — same arithmetic as BilinearNet.apply_with_negatives."""
    dots = (jnp.sum(u_rows[None, :, :dim] * i_rows_stacked[..., :dim],
                    axis=-1)
            + u_rows[None, :, dim] + i_rows_stacked[..., dim])
    return dots


def build_lazy_epoch_fn(net, loss, num_items, num_batches, batch_size,
                        learning_rate, l2, num_negatives, explicit=False):
    """Compile the row-sparse epoch for a fused-layout BilinearNet.

    Mirrors :func:`spotlight_tpu.utils.training.build_epoch_fn`'s
    signature contract: ``epoch_fn(params, opt_state, key, data, n_valid)``
    with ``opt_state`` from :func:`lazy_adam_init`.
    """
    dim = net.embedding_dim
    loss_func = (_EXPLICIT_LOSSES if explicit else _IMPLICIT_LOSSES)[loss]
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
            users, items = batch['user_ids'], batch['item_ids']
            mask = batch['mask']
            t = opt['t'] + 1

            u_table = params['user_embeddings']['weight']
            i_table = params['item_embeddings']['weight']

            if explicit:
                all_items = items[None]
            else:
                negatives = sample_items_device(
                    batch_key, num_items, (n_neg,) + items.shape)
                all_items = jnp.concatenate([items[None], negatives],
                                            axis=0)
            flat_items = all_items.reshape(-1)

            u_rows = u_table[users]
            i_rows = i_table[flat_items]

            def batch_loss(u_rows, i_rows):
                stacked = i_rows.reshape(all_items.shape + (dim + 1,))
                dots = _fused_pair_scores(u_rows, stacked, dim)
                if explicit:
                    predictions = dots[0]
                    if loss == 'poisson':
                        predictions = jnp.exp(predictions)
                    elems = loss_func(batch['ratings'], predictions,
                                      reduce=False)
                else:
                    positive = dots[0]
                    negative = dots[1:] if adaptive else dots[1]
                    elems = loss_func(positive, negative, reduce=False)
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

"""Implicit-feedback matrix factorization with on-device negative sampling.

TPU-native equivalent of
`/root/reference/spotlight/factorization/implicit.py:22`: classic MF trained
through negative sampling with the ``pointwise`` / ``bpr`` / ``hinge`` /
``adaptive_hinge`` ranking losses.

The reference samples negatives on the host and pays a host-to-device copy
per minibatch (`implicit.py:254-262`).  Here negatives are drawn with
``jax.random.randint`` *inside* the jitted epoch scan — one key split per
batch — so sampling fuses with the gathers and the whole epoch stays on
device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from spotlight_tpu.factorization._base import _FactorizationBase
from spotlight_tpu.ops.losses import (adaptive_hinge_loss, bpr_loss,
                                      hinge_loss, pointwise_loss)
from spotlight_tpu.ops.sampling import (inbatch_pair_weights,
                                        sample_items_device,
                                        weighted_inbatch_elems)
from spotlight_tpu.utils import training

_LOSSES = {
    'pointwise': pointwise_loss,
    'bpr': bpr_loss,
    'hinge': hinge_loss,
    'adaptive_hinge': adaptive_hinge_loss,
}


class ImplicitFactorizationModel(_FactorizationBase):
    """An implicit feedback matrix factorization model.

    Parameters
    ----------
    loss : str, one of ('pointwise', 'bpr', 'hinge', 'adaptive_hinge')
    embedding_dim : int, optional
    n_iter : int, optional
    batch_size : int, optional
    l2 : float, optional
    learning_rate : float, optional
    optimizer_func : optax.GradientTransformation or callable, optional
    representation : representation object, optional
        Escape hatch (see :class:`ExplicitFactorizationModel`).
    sparse : bool
        Select the row-sparse (lazy) Adam engine — the torch
        ``SparseAdam`` analogue the reference designed this flag for:
        gradients are taken w.r.t. the gathered rows and Adam moments
        update only at the touched rows, so the per-step cost is
        independent of table size (the dense engine streams whole tables
        per step).  Faster above ~0.5M table rows; untouched rows'
        moments do not decay (documented SparseAdam semantics).  Composes
        with ``table_dtype=bfloat16`` (f32 moments/update math),
        ``negative_sampling='in_batch'``, and ``mesh=`` (psum exchange;
        sharded moments, bit-identical to the single-device engine).
        Requires the default fused BilinearNet layout and no custom
        optimizer; elsewhere it stays the reference-parity no-op (dense
        scatter-add gradients) with a RuntimeWarning.
    random_state : np.random.RandomState, optional
    mesh : jax.sharding.Mesh, optional
        Train distributed: embedding tables row-shard over the mesh's
        'model' axis, the batch shards over 'data'
        (see :mod:`spotlight_tpu.parallel`).
    exchange : str, 'psum' (default) or 'alltoall'
        Collective used for sharded table lookups (docs/parallelism.md).
    num_negative_samples : int, optional
        Number of negatives per positive for ``adaptive_hinge``.
    negative_sampling : str, 'uniform' (default) or 'in_batch'
        'uniform' draws negatives uniformly over the catalog on device
        (reference semantics, `/root/reference/spotlight/sampling.py:8`).
        'in_batch' scores each positive against other examples' positive
        items in the same batch (circular shift), so negative rows are
        never gathered or scattered separately (~1/3 fewer random HBM row
        touches; +6% measured end-to-end).  Each pair is importance-
        weighted back to the uniform objective (``adaptive_hinge`` uses
        the selected hardest negative's weight — a heuristic: a max over
        non-uniform samples has no unbiased correction) — without the correction,
        popularity-sampled negatives teach the model to demote popular
        items (measured: test MRR 0.007 vs 0.103 on a Zipf-popularity
        fixture; corrected: 0.098 — docs/performance.md
        "In-batch negatives", `ops/sampling.inbatch_importance_weights`).
    """

    def __init__(self,
                 loss='pointwise',
                 embedding_dim=32,
                 n_iter=10,
                 batch_size=256,
                 l2=0.0,
                 learning_rate=1e-2,
                 optimizer_func=None,
                 use_cuda=False,
                 representation=None,
                 sparse=False,
                 random_state=None,
                 num_negative_samples=5,
                 mesh=None,
                 exchange='psum',
                 negative_sampling='uniform'):
        assert loss in ('pointwise', 'bpr', 'hinge', 'adaptive_hinge')
        assert negative_sampling in ('uniform', 'in_batch')
        del use_cuda  # accepted for API parity; devices come from jax
        super().__init__(embedding_dim, n_iter, batch_size, l2, learning_rate,
                         optimizer_func, representation, sparse, random_state,
                         mesh=mesh, exchange=exchange)
        self._loss = loss
        self._num_negative_samples = num_negative_samples
        self._negative_sampling = negative_sampling
        self._epoch_fn_cache = {}

    def _epoch_fn(self, num_batches):
        if num_batches in self._epoch_fn_cache:
            return self._epoch_fn_cache[num_batches]

        net = self._net

        if getattr(self, '_lazy', False):
            from spotlight_tpu.factorization.lazy import build_lazy_epoch_fn
            epoch_fn = build_lazy_epoch_fn(
                net, self._loss, self._num_items, num_batches,
                self._batch_size, self._learning_rate, self._l2,
                self._num_negative_samples,
                negative_sampling=self._negative_sampling,
                mesh=self._mesh, param_specs=self._param_specs,
                exchange=self._exchange)
            self._epoch_fn_cache[num_batches] = epoch_fn
            return epoch_fn

        loss_func = _LOSSES[self._loss]
        adaptive = self._loss == 'adaptive_hinge'
        num_negatives = self._num_negative_samples
        num_items = self._num_items
        optimizer = self._optimizer
        batch_size = self._batch_size

        fused = hasattr(net, 'apply_with_negatives')
        in_batch = self._negative_sampling == 'in_batch'
        if in_batch and not hasattr(net, 'apply_with_inbatch_negatives'):
            raise ValueError(
                "negative_sampling='in_batch' needs a representation with "
                'apply_with_inbatch_negatives (BilinearNet has it).')

        def elems_fn(params, batch, key):
            users, items = batch['user_ids'], batch['item_ids']
            if in_batch:
                n_neg = num_negatives if adaptive else 1
                positive, negative = net.apply_with_inbatch_negatives(
                    params, users, items, num_negatives=n_neg)
                elems = loss_func(positive, negative, reduce=False)
                # Importance correction toward the uniform objective
                # (ops/sampling.inbatch_importance_weights).
                pair_weight = inbatch_pair_weights(
                    batch['negative_weight'], negative, n_neg)
                elems = weighted_inbatch_elems(self._loss, elems, negative,
                                               pair_weight)
                return elems, batch['mask']
            shape = ((num_negatives,) + users.shape if adaptive
                     else users.shape)
            negative_items = sample_items_device(key, num_items, shape)

            if fused:
                # One user-row gather and one concatenated item gather
                # (training is gather-latency bound; see
                # docs/performance.md).
                positive, negative = net.apply_with_negatives(
                    params, users, items, negative_items)
            else:
                positive = net.apply(params, users, items)
                if adaptive:
                    tiled_users = jnp.broadcast_to(
                        users, negative_items.shape)
                    negative = net.apply(params, tiled_users,
                                         negative_items)
                else:
                    negative = net.apply(params, users, negative_items)

            return (loss_func(positive, negative, reduce=False),
                    batch['mask'])

        epoch_fn = training.build_epoch_fn(
            elems_fn, optimizer, num_batches, batch_size,
            mesh=self._mesh, param_specs=self._param_specs,
            opt_specs=self._opt_specs, exchange=self._exchange)
        self._epoch_fn_cache[num_batches] = epoch_fn
        return epoch_fn

    def fit(self, interactions, verbose=False):
        """Fit the model.

        When called repeatedly, fitting resumes from the previous state.

        Parameters
        ----------
        interactions : :class:`~spotlight_tpu.data.interactions.Interactions`
        verbose : bool
        """
        user_ids = interactions.user_ids.astype(np.int32)
        item_ids = interactions.item_ids.astype(np.int32)

        if not self._initialized:
            self._initialize(interactions)
        self._check_input(user_ids, item_ids)

        n = len(user_ids)
        padded, num_batches = training.pad_to_batches(n, self._batch_size)
        arrays = {
            'user_ids': training.pad_array(user_ids, padded),
            'item_ids': training.pad_array(item_ids, padded),
        }
        if self._negative_sampling == 'in_batch':
            # Importance weights correcting in-batch negatives back to the
            # uniform objective.  Only the small (num_items,) table crosses
            # the host-to-device link; the per-interaction column is one
            # on-device gather.  Padding rows carry item id 0, whose table
            # weight is a real value — zero them via the row mask instead:
            # handled below by multiplying with the validity of the row
            # (pad rows were appended with item 0; their weight column is
            # zeroed explicitly).
            from spotlight_tpu.ops.sampling import (
                inbatch_importance_weight_table)
            table = inbatch_importance_weight_table(item_ids,
                                                    self._num_items)
            arrays['_weight_table'] = table

        def derive(data):
            if self._negative_sampling == 'in_batch':
                table_dev = data.pop('_weight_table')
                column = table_dev[data['item_ids']]
                # Zero the padded tail so a pad row never serves as a
                # negative.
                valid = jnp.arange(padded) < n
                data['negative_weight'] = jnp.where(valid, column, 0.0)
            return data

        # Content-hash-cached placement: repeated fits on the same bytes
        # (the resume workflow, timed benchmark reps) skip the per-fit
        # host-to-device copy.
        data = training.placed_data_cached(self, arrays, self._mesh,
                                           build=derive)

        epoch_fn = self._epoch_fn(num_batches)
        drain = training.EpochLossDrain(verbose)
        for epoch_num in range(self._n_iter):
            (self._params, self._opt_state, epoch_loss) = epoch_fn(
                self._params, self._opt_state, self._next_key(), data, n)
            drain.push(epoch_num, epoch_loss)
        drain.finish()
        # Last epoch's loss, host-side (reference parity: the
        # verbose print's value; handy for multi-process checks).
        self._last_epoch_loss = drain.last_loss

        return self

    def predict(self, user_ids, item_ids=None):
        """Predict recommendation scores (see the reference docstring,
        `factorization/implicit.py:277-311`).

        Parameters
        ----------
        user_ids : int or array
        item_ids : array, optional
            If omitted, score the full catalog.

        Returns
        -------
        np.ndarray of predicted scores
        """
        self._check_input(user_ids, item_ids, allow_items_none=True)
        return self._raw_predictions(user_ids, item_ids)

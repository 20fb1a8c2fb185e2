"""Explicit-feedback matrix factorization.

TPU-native equivalent of
`/root/reference/spotlight/factorization/explicit.py:21`: a classic MF model
(BilinearNet latent dot products) trained on observed ratings with one of the
``regression`` / ``poisson`` / ``logistic`` losses.

Differences from the reference are all execution-level: the training epoch is
one jitted ``lax.scan`` over device-resident minibatches instead of a Python
loop with per-batch host↔device copies; results (loss trajectories, learned
parameters) are statistically equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from spotlight_tpu.factorization._base import _FactorizationBase
from spotlight_tpu.ops.losses import (logistic_loss, poisson_loss,
                                      regression_loss)
from spotlight_tpu.utils import training

_LOSSES = {
    'regression': regression_loss,
    'poisson': poisson_loss,
    'logistic': logistic_loss,
}


class ExplicitFactorizationModel(_FactorizationBase):
    """An explicit feedback matrix factorization model.

    Parameters
    ----------
    loss : str, one of ('regression', 'poisson', 'logistic')
    embedding_dim : int, optional
    n_iter : int, optional
    batch_size : int, optional
    l2 : float, optional
        L2 penalty (applied as torch-Adam-style coupled weight decay).
    learning_rate : float, optional
    optimizer_func : optax.GradientTransformation or callable, optional
        Overrides l2 and learning_rate if supplied.
    representation : representation object, optional
        Escape hatch: any object with ``init(key)`` and
        ``apply(params, user_ids, item_ids)``.
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
    """

    def __init__(self,
                 loss='regression',
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
                 mesh=None,
                 exchange='psum'):
        assert loss in ('regression', 'poisson', 'logistic')
        del use_cuda  # accepted for API parity; devices come from jax
        super().__init__(embedding_dim, n_iter, batch_size, l2, learning_rate,
                         optimizer_func, representation, sparse, random_state,
                         mesh=mesh, exchange=exchange)
        self._loss = loss
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
                num_negatives=0, explicit=True,
                mesh=self._mesh, param_specs=self._param_specs,
                exchange=self._exchange)
            self._epoch_fn_cache[num_batches] = epoch_fn
            return epoch_fn

        loss_func = _LOSSES[self._loss]
        poisson = self._loss == 'poisson'
        optimizer = self._optimizer
        batch_size = self._batch_size

        def elems_fn(params, batch, key):
            del key
            predictions = net.apply(params, batch['user_ids'],
                                    batch['item_ids'])
            if poisson:
                predictions = jnp.exp(predictions)
            return (loss_func(batch['ratings'], predictions, reduce=False),
                    batch['mask'])

        epoch_fn = training.build_epoch_fn(
            elems_fn, optimizer, num_batches, batch_size,
            mesh=self._mesh, param_specs=self._param_specs,
            opt_specs=self._opt_specs, exchange=self._exchange)
        self._epoch_fn_cache[num_batches] = epoch_fn
        return epoch_fn

    def fit(self, interactions, verbose=False):
        """Fit the model.

        When called repeatedly, fitting resumes from the previous state
        (parameters and optimizer moments persist across calls).

        Parameters
        ----------
        interactions : :class:`~spotlight_tpu.data.interactions.Interactions`
            Must have ratings.
        verbose : bool
        """
        user_ids = interactions.user_ids.astype(np.int32)
        item_ids = interactions.item_ids.astype(np.int32)
        ratings = interactions.ratings.astype(np.float32)

        if not self._initialized:
            self._initialize(interactions)
        self._check_input(user_ids, item_ids)

        n = len(user_ids)
        padded, num_batches = training.pad_to_batches(n, self._batch_size)
        # Content-hash-cached placement (see factorization/implicit.py).
        data = training.placed_data_cached(self, {
            'user_ids': training.pad_array(user_ids, padded),
            'item_ids': training.pad_array(item_ids, padded),
            'ratings': training.pad_array(ratings, padded),
        }, self._mesh)

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
        """Predict recommendation scores.

        Parameters
        ----------
        user_ids : int or array
            If an int, predict scores for that user over ``item_ids`` (or the
            whole catalog).  If an array, predict for the (user, item) pairs.
        item_ids : array, optional

        Returns
        -------
        np.ndarray of predicted scores
        """
        self._check_input(user_ids, item_ids, allow_items_none=True)
        out = self._raw_predictions(user_ids, item_ids)
        if self._loss == 'poisson':
            out = np.exp(out)
        elif self._loss == 'logistic':
            out = 1.0 / (1.0 + np.exp(-out))
        return out

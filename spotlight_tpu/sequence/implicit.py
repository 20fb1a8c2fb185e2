"""Implicit-feedback sequence model.

TPU-native equivalent of `/root/reference/spotlight/sequence/implicit.py:25`:
trains a sequence representation (pooling / CNN / LSTM / mixture) by scoring
every timestep's target — the sequence itself shifted by the representation's
causal alignment — against uniformly sampled negatives of the same shape, with
the loss masked at padding positions.

Execution is TPU-first: one jitted ``lax.scan`` per epoch over
device-resident sequence minibatches, negatives drawn on device per batch,
and batched full-catalog prediction for evaluation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spotlight_tpu.ops.losses import (adaptive_hinge_loss, bpr_loss,
                                      hinge_loss, pointwise_loss)
from spotlight_tpu.ops.sampling import (inbatch_pair_weights,
                                        weighted_inbatch_elems,
                                        sample_items_device)
from spotlight_tpu.sequence.representations import (PADDING_IDX, CNNNet,
                                                    LSTMNet, MixtureLSTMNet,
                                                    PoolNet)
from spotlight_tpu.utils import training
from spotlight_tpu.utils.serialization import SerializableEstimatorMixin

_LOSSES = {
    'pointwise': pointwise_loss,
    'bpr': bpr_loss,
    'hinge': hinge_loss,
    'adaptive_hinge': adaptive_hinge_loss,
}


class ImplicitSequenceModel(SerializableEstimatorMixin):
    """Model for sequential recommendations using implicit feedback.

    During fitting, the loss is computed for every timestep of the supplied
    sequences: for a row ``[1, 2, 3]``, it aggregates the loss of predicting
    ``1`` from nothing, ``2`` from ``[1]``, and ``3`` from ``[1, 2]``.

    Parameters
    ----------
    loss : str, one of ('pointwise', 'bpr', 'hinge', 'adaptive_hinge')
    representation : str or representation instance
        One of 'pooling', 'cnn', 'lstm', 'mixture', or any object following
        the sequence-representation protocol (``init``,
        ``user_representation``, ``score``, ``score_catalog``).
    embedding_dim : int, optional
    n_iter : int, optional
    batch_size : int, optional
    l2 : float, optional
    learning_rate : float, optional
    optimizer_func : optax.GradientTransformation or callable, optional
    sparse : bool
        Select the row-sparse (lazy) Adam engine for the item table —
        the torch ``SparseAdam`` analogue: table gradients are taken
        w.r.t. the gathered rows and moments update only at touched rows,
        so the per-step table cost is independent of the catalog size
        (the dense engine streams the whole table per step; the dense
        tower keeps standard Adam).  Faster above ~1M items; see
        docs/performance.md.  Composes with ``table_dtype=bfloat16``
        (f32 moments/update math), ``negative_sampling='in_batch'``, and
        ``mesh=`` (psum exchange; sharded table moments).  Requires a
        built-in representation in the fused layout and no custom
        optimizer; elsewhere it stays the reference-parity no-op with a
        RuntimeWarning.
    random_state : np.random.RandomState, optional
    mesh : jax.sharding.Mesh, optional
        Train distributed: embedding tables row-shard over the mesh's
        'model' axis, the batch shards over 'data'
        (see :mod:`spotlight_tpu.parallel`).
    exchange : str, 'psum' (default) or 'alltoall'
        Collective used for sharded table lookups (docs/parallelism.md).
    num_negative_samples : int, optional
        Negatives per positive for ``adaptive_hinge``.
    negative_sampling : str, 'uniform' (default) or 'in_batch'
        'uniform' draws negatives uniformly over the catalog on device
        (reference semantics).  'in_batch' scores each timestep against
        the same timestep's target in other batch rows (circular shift),
        so negative rows are never gathered or scattered separately; each
        pair is importance-weighted back to the uniform objective
        (``adaptive_hinge``: the selected hardest negative's weight — a
        heuristic, max has no unbiased correction)
        (docs/performance.md "In-batch negatives").  Net throughput is a
        few percent over uniform at realistic epoch counts (a per-fit
        weight-column build amortizes across epochs).
    """

    def __init__(self,
                 loss='pointwise',
                 representation='pooling',
                 embedding_dim=32,
                 n_iter=10,
                 batch_size=256,
                 l2=0.0,
                 learning_rate=1e-2,
                 optimizer_func=None,
                 use_cuda=False,
                 sparse=False,
                 random_state=None,
                 num_negative_samples=5,
                 mesh=None,
                 exchange='psum',
                 negative_sampling='uniform'):
        assert loss in ('pointwise', 'bpr', 'hinge', 'adaptive_hinge')
        assert negative_sampling in ('uniform', 'in_batch')
        if isinstance(representation, str):
            assert representation in ('pooling', 'cnn', 'lstm', 'mixture')
        if exchange not in ('psum', 'alltoall', 'alltoall_cf'):
            # A typo here would otherwise silently run the default psum
            # gather (advisor round-4 finding).
            raise ValueError(
                "exchange must be one of 'psum', 'alltoall', 'alltoall_cf'"
                ' (got {!r})'.format(exchange))
        del use_cuda  # API parity; devices come from jax

        if mesh is not None:
            shards = mesh.shape['data']
            if exchange == 'alltoall_cf':
                # The capacity-factored exchange shards the batch over the
                # model axis too.
                shards *= mesh.shape['model']
            if batch_size % shards:
                raise ValueError(
                    'batch_size ({}) must be divisible by the batch-shard '
                    'count ({})'.format(batch_size, shards))

        self._loss = loss
        self._representation = representation
        self._embedding_dim = embedding_dim
        self._n_iter = n_iter
        self._batch_size = batch_size
        self._l2 = l2
        self._learning_rate = learning_rate
        self._optimizer_func = optimizer_func
        self._sparse = sparse
        self._random_state = random_state or np.random.RandomState()
        self._num_negative_samples = num_negative_samples
        self._negative_sampling = negative_sampling
        self._mesh = mesh
        self._exchange = exchange

        self._num_items = None
        self._net = None
        self._params = None
        self._optimizer = None
        self._opt_state = None
        self._param_specs = None
        self._opt_specs = None
        self._key = training.key_from_random_state(self._random_state)
        self._epoch_fn_cache = {}

    def __repr__(self):
        net_representation = ('[uninitialised]' if self._net is None
                              else repr(self._net))
        return '<{}: {}>'.format(self.__class__.__name__, net_representation)

    @property
    def _initialized(self):
        return self._params is not None

    def _next_key(self):
        self._key, subkey = jax.random.split(self._key)
        return subkey

    def _lazy_fallback_reason(self):
        """Why ``sparse=True`` cannot use the lazy engine here, or None."""
        net = self._net
        if not (hasattr(net, '_user_repr_from_emb')
                and getattr(net, '_fused', False)):
            return ('it requires a built-in representation with the fused '
                    'table layout')
        if self._optimizer_func is not None:
            return ('a custom optimizer_func is set (row-sparse lazy Adam '
                    'IS the item-table optimizer)')
        if self._mesh is not None and self._exchange == 'alltoall_cf':
            return ("mesh training uses exchange='alltoall_cf', which "
                    'shards the batch over the model axis — the sequence '
                    "tower would need model-axis replication (the 'psum' "
                    "and 'alltoall' exchanges compose with the lazy "
                    'engine)')
        return None

    def _use_lazy_engine(self):
        """``sparse=True`` selects the row-sparse (lazy) Adam engine for
        the item table (see :mod:`spotlight_tpu.sequence.lazy`).  It
        composes with ``table_dtype=bfloat16``,
        ``negative_sampling='in_batch'``, and ``mesh=`` (psum exchange);
        where a configuration cannot use it, ``sparse`` stays the
        reference-parity no-op (dense scatter-add gradients) — with a loud
        warning, never silently."""
        import warnings

        if not self._sparse:
            return False
        reason = self._lazy_fallback_reason()
        if reason is not None:
            warnings.warn(
                'sparse=True falls back to the dense engine because {} — '
                'training remains correct; above ~1M-item catalogs the '
                'lazy engine would be faster.'.format(reason),
                RuntimeWarning, stacklevel=3)
            return False
        return True

    def _initialize(self, interactions):
        self._num_items = interactions.num_items

        if self._representation == 'pooling':
            self._net = PoolNet(self._num_items, self._embedding_dim,
                                sparse=self._sparse)
        elif self._representation == 'cnn':
            self._net = CNNNet(self._num_items, self._embedding_dim,
                               sparse=self._sparse)
        elif self._representation == 'lstm':
            self._net = LSTMNet(self._num_items, self._embedding_dim,
                                sparse=self._sparse)
        elif self._representation == 'mixture':
            self._net = MixtureLSTMNet(self._num_items, self._embedding_dim,
                                       sparse=self._sparse)
        else:
            self._net = self._representation

        self._optimizer = training.make_optimizer(
            self._learning_rate, self._l2, self._optimizer_func)

        if self._mesh is not None:
            self._lazy = self._use_lazy_engine()
            from spotlight_tpu.parallel import sharding as psharding
            from spotlight_tpu.parallel import training as ptraining

            if hasattr(self._net, 'sharded'):
                self._net = self._net.sharded(
                    'model', self._mesh.shape['model'],
                    exchange=self._exchange)
            self._param_specs = self._net.param_specs()
            self._params = psharding.shard_params(
                self._net.init(self._next_key()), self._param_specs,
                self._mesh)
            if self._lazy:
                from spotlight_tpu.sequence.lazy import (lazy_seq_adam_init,
                                                         lazy_seq_opt_specs)
                self._opt_state = lazy_seq_adam_init(self._params,
                                                     self._optimizer)
                self._opt_specs = lazy_seq_opt_specs(
                    self._opt_state, self._params, self._param_specs)
            else:
                self._opt_state = self._optimizer.init(self._params)
                self._opt_specs = ptraining.opt_specs_like(
                    self._opt_state, self._params, self._param_specs)
            self._opt_state = psharding.shard_params(
                self._opt_state, self._opt_specs, self._mesh)
        else:
            self._params = self._net.init(self._next_key())
            self._lazy = self._use_lazy_engine()
            if self._lazy:
                from spotlight_tpu.sequence.lazy import lazy_seq_adam_init
                self._opt_state = lazy_seq_adam_init(self._params,
                                                     self._optimizer)
            else:
                self._opt_state = self._optimizer.init(self._params)

    def _check_input(self, item_ids):
        if not self._initialized:
            raise RuntimeError(
                'Model has not been fitted; call fit() first.')
        if isinstance(item_ids, (int, np.integer)):
            item_id_max = item_ids
        else:
            item_id_max = np.asarray(item_ids).max()
        if item_id_max >= self._num_items:
            raise ValueError('Maximum item id greater '
                             'than number of items in model.')

    def _epoch_fn(self, num_batches):
        if num_batches in self._epoch_fn_cache:
            return self._epoch_fn_cache[num_batches]

        net = self._net

        if getattr(self, '_lazy', False):
            from spotlight_tpu.sequence.lazy import build_lazy_epoch_fn
            epoch_fn = build_lazy_epoch_fn(
                net, self._loss, self._num_items, num_batches,
                self._batch_size, self._learning_rate, self._l2,
                self._num_negative_samples, self._optimizer,
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

        in_batch = self._negative_sampling == 'in_batch'
        if in_batch and not hasattr(net, 'score_inbatch_negatives'):
            raise ValueError(
                "negative_sampling='in_batch' needs a representation with "
                'score_inbatch_negatives (the built-in representations '
                'have it).')

        def elems_fn(params, batch, key):
            sequences = batch['sequences']                  # (B, T)
            user_representations, _ = net.user_representation(
                params, sequences)
            positive = net.score(params, user_representations, sequences)

            if in_batch:
                n_neg = num_negatives if adaptive else 1
                negative = net.score_inbatch_negatives(
                    params, user_representations, sequences,
                    num_negatives=n_neg)
                pair_weight = inbatch_pair_weights(
                    batch['negative_weight'], negative, n_neg)
            elif adaptive:
                negative_items = sample_items_device(
                    key, num_items,
                    (num_negatives,) + sequences.shape)
                negative = jax.vmap(
                    lambda negs: net.score(
                        params, user_representations, negs)
                )(negative_items)                           # (n, B, T)
            else:
                negative_items = sample_items_device(
                    key, num_items, sequences.shape)
                negative = net.score(params, user_representations,
                                     negative_items)

            mask = ((sequences != PADDING_IDX) &
                    (batch['mask'][:, None] > 0))
            elems = loss_func(positive, negative, reduce=False)
            if in_batch:
                elems = weighted_inbatch_elems(self._loss, elems, negative,
                                               pair_weight)
            return elems, mask

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
        interactions : :class:`~spotlight_tpu.data.interactions.SequenceInteractions`
        verbose : bool
        """
        sequences = interactions.sequences.astype(np.int32)

        if not self._initialized:
            self._initialize(interactions)
        self._check_input(sequences)

        n = len(sequences)
        padded, num_batches = training.pad_to_batches(n, self._batch_size)
        arrays = {'sequences': training.pad_array(sequences, padded)}
        if self._negative_sampling == 'in_batch':
            # Importance weights correcting in-batch negatives back to the
            # uniform objective; PAD positions (and padded rows, which are
            # all-PAD) weigh 0.  Only the (num_items,) table crosses the
            # host-to-device link; the (rows, T) column is one on-device
            # gather.
            from spotlight_tpu.ops.sampling import (
                inbatch_importance_weight_table)
            arrays['_weight_table'] = inbatch_importance_weight_table(
                sequences, self._num_items, padding_idx=PADDING_IDX)
        def derive(data):
            if self._negative_sampling == 'in_batch':
                table_dev = data.pop('_weight_table')
                data['negative_weight'] = table_dev[data['sequences']]
            return data

        # Content-hash-cached placement: repeated fits on the same bytes
        # (the resume workflow, timed benchmark reps) skip the per-fit
        # host-to-device copy (~120 ms for the 4 MB bench sequence matrix
        # through the dev tunnel).
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

    # -- prediction -----------------------------------------------------------

    @functools.cached_property
    def _catalog_fn(self):
        net = self._net

        @jax.jit
        def catalog_scores(params, sequences):
            _, final = net.user_representation(params, sequences)
            if final.ndim == 1:
                final = final[None]
            return net.score_catalog(params, final)

        return catalog_scores

    @functools.cached_property
    def _rank_factors_jit(self):
        from spotlight_tpu.sequence.representations import (CNNNet, LSTMNet,
                                                            MixtureLSTMNet,
                                                            PoolNet)

        net = self._net
        mixture = None
        if isinstance(net, MixtureLSTMNet):
            mixture = net.num_mixtures
        elif not isinstance(net, (PoolNet, LSTMNet, CNNNet)):
            return None  # custom representations: materialize-score path

        @jax.jit
        def item_factors(params):
            return net._catalog_matrix(params)

        @jax.jit
        def final_reprs(params, sequences):
            _, final = net.user_representation(params, sequences)
            if mixture is not None:
                # (B, 2M, D) taste+attention stack -> (B, 2M*D) for the
                # mixture streaming score_fn (tastes first, then attention
                # — the representation's own component order).
                final = final.reshape(final.shape[0], -1)
            return final

        return item_factors, final_reprs, mixture

    def _rank_factors_sequences(self, prefix_batch):
        """(final_reprs, item_matrix, item_bias[, mixture]) for the
        streaming rank/top-k kernels, or None for custom representations.
        The item matrix is cached per parameter version (paid once, not per
        evaluation batch)."""
        fns = self._rank_factors_jit
        if fns is None:
            return None
        item_factors, final_reprs, mixture = fns

        cache = getattr(self, '_item_factor_cache', None)
        if cache is None or cache[0] is not self._params:
            cache = (self._params, item_factors(self._params))
            self._item_factor_cache = cache
        matrix, bias = cache[1]

        prefix = np.atleast_2d(np.asarray(prefix_batch, dtype=np.int32))
        final = final_reprs(self._params, jnp.asarray(prefix))
        if mixture is None:
            return final, matrix, bias
        return final, matrix, bias, mixture

    def _score_catalog_sequences(self, sequences):
        """(B, num_items) next-item scores for a batch of sequences — the
        batched-evaluation fast path."""
        sequences = np.atleast_2d(np.asarray(sequences, dtype=np.int32))
        n = sequences.shape[0]
        bucket = max(32, 1 << (n - 1).bit_length())
        padded = training.pad_array(sequences, bucket)
        scores = self._catalog_fn(self._params, jnp.asarray(padded))
        return np.asarray(scores)[:n]

    def predict(self, sequences, item_ids=None):
        """Predict next-item scores given a sequence of interactions.

        Parameters
        ----------
        sequences : array of shape (max_sequence_length,)
            A single sequence (matching the reference contract,
            `/root/reference/spotlight/sequence/implicit.py:288-331`).  A
            2-d input is accepted only with one row; for batched scoring use
            the vectorized internal path the evaluators use
            (:meth:`_score_catalog_sequences`).
        item_ids : array, optional
            Item ids to score; all items if omitted.

        Returns
        -------
        np.ndarray of predicted scores
        """
        sequences = np.atleast_2d(np.asarray(sequences))
        if sequences.ndim != 2 or sequences.shape[0] != 1:
            raise ValueError(
                'predict() takes a single sequence (shape ({},)); got shape '
                '{}. For a batch of sequences, score them with '
                '_score_catalog_sequences(sequences).'.format(
                    sequences.shape[-1], sequences.shape))
        self._check_input(sequences)
        if item_ids is not None:
            self._check_input(item_ids)

        scores = self._score_catalog_sequences(
            sequences.astype(np.int32)).flatten()
        if item_ids is not None:
            scores = scores[np.asarray(item_ids).flatten()]
        return scores

"""Shared plumbing for the factorization estimators.

Covers what the reference spreads over
`/root/reference/spotlight/factorization/explicit.py`,
`implicit.py`, and `_components.py`: representation construction, input
validation, prediction id broadcasting, and the jitted predict paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spotlight_tpu.factorization.representations import BilinearNet
from spotlight_tpu.utils import training
from spotlight_tpu.utils.serialization import SerializableEstimatorMixin


def _repr_model(model):
    net_representation = ('[uninitialised]' if model._net is None
                          else repr(model._net))
    return '<{}: {}>'.format(model.__class__.__name__, net_representation)


class _FactorizationBase(SerializableEstimatorMixin):
    """State shared by the explicit and implicit factorization estimators."""

    def __init__(self, embedding_dim, n_iter, batch_size, l2, learning_rate,
                 optimizer_func, representation, sparse, random_state,
                 mesh=None, exchange='psum'):
        self._embedding_dim = embedding_dim
        self._n_iter = n_iter
        self._batch_size = batch_size
        self._l2 = l2
        self._learning_rate = learning_rate
        self._optimizer_func = optimizer_func
        self._representation = representation
        self._sparse = sparse
        self._random_state = random_state or np.random.RandomState()
        self._mesh = mesh
        if exchange not in ('psum', 'alltoall', 'alltoall_cf'):
            # A typo here would otherwise silently run the default psum
            # gather (advisor round-4 finding).
            raise ValueError(
                "exchange must be one of 'psum', 'alltoall', 'alltoall_cf'"
                ' (got {!r})'.format(exchange))
        self._exchange = exchange

        self._num_users = None
        self._num_items = None
        self._net = None
        self._params = None
        self._opt_state = None
        self._optimizer = None
        self._param_specs = None
        self._opt_specs = None
        self._key = training.key_from_random_state(self._random_state)

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

    def __repr__(self):
        return _repr_model(self)

    @property
    def _initialized(self):
        return self._params is not None

    def _next_key(self):
        self._key, subkey = jax.random.split(self._key)
        return subkey

    def _lazy_fallback_reason(self):
        """Why ``sparse=True`` cannot use the lazy engine here, or None."""
        if not (isinstance(self._net, BilinearNet) and self._net._fused):
            return ('it requires the default fused BilinearNet layout '
                    '(custom representations / injected embedding layers '
                    'use the dense engine)')
        if self._optimizer_func is not None:
            return ('a custom optimizer_func is set (row-sparse lazy Adam '
                    'IS the optimizer)')
        if (self._mesh is not None and self._exchange == 'alltoall_cf'
                and getattr(self, '_negative_sampling',
                            'uniform') == 'in_batch'):
            return ("exchange='alltoall_cf' shards the batch over the "
                    'model axis too, which would change the in-batch '
                    'negative roll width (use the psum/alltoall exchanges '
                    "with negative_sampling='in_batch')")
        return None

    def _use_lazy_engine(self):
        """``sparse=True`` selects the row-sparse (lazy) Adam engine —
        the torch ``SparseAdam`` analogue (see
        :mod:`spotlight_tpu.factorization.lazy`).  It composes with
        ``table_dtype=bfloat16``, ``negative_sampling='in_batch'``, and
        ``mesh=`` (psum exchange); where a configuration cannot use it
        (custom representation/optimizer, all-to-all exchanges), ``sparse``
        stays the reference-parity no-op (the dense engine's scatter-adds
        already are "sparse gradients", and below ~0.5M-row tables dense
        streaming is faster) — with a loud warning, never silently."""
        import warnings

        if not self._sparse:
            return False
        reason = self._lazy_fallback_reason()
        if reason is not None:
            warnings.warn(
                'sparse=True falls back to the dense engine because {} — '
                'training remains correct; above ~0.5M-row tables the '
                'lazy engine would be faster.'.format(reason),
                RuntimeWarning, stacklevel=3)
            return False
        return True

    def _initialize(self, interactions):
        self._num_users = interactions.num_users
        self._num_items = interactions.num_items

        if self._representation is not None:
            self._net = self._representation
        else:
            self._net = BilinearNet(self._num_users,
                                    self._num_items,
                                    self._embedding_dim,
                                    sparse=self._sparse)

        self._lazy = self._use_lazy_engine()
        self._optimizer = training.make_optimizer(
            self._learning_rate, self._l2, self._optimizer_func)

        if self._mesh is not None:
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
                from spotlight_tpu.factorization.lazy import (lazy_adam_init,
                                                              lazy_opt_specs)
                self._opt_state = lazy_adam_init(self._params)
                self._opt_specs = lazy_opt_specs(self._param_specs)
            else:
                self._opt_state = self._optimizer.init(self._params)
                self._opt_specs = ptraining.opt_specs_like(
                    self._opt_state, self._params, self._param_specs)
            self._opt_state = psharding.shard_params(
                self._opt_state, self._opt_specs, self._mesh)
        else:
            self._params = self._net.init(self._next_key())
            if self._lazy:
                from spotlight_tpu.factorization.lazy import lazy_adam_init
                self._opt_state = lazy_adam_init(self._params)
            else:
                self._opt_state = self._optimizer.init(self._params)

    def _check_input(self, user_ids, item_ids, allow_items_none=False):
        if not self._initialized:
            raise RuntimeError(
                'Model has not been fitted; call fit() first.')
        if isinstance(user_ids, (int, np.integer)):
            user_id_max = user_ids
        else:
            user_id_max = user_ids.max()
        if user_id_max >= self._num_users:
            raise ValueError('Maximum user id greater '
                             'than number of users in model.')

        if allow_items_none and item_ids is None:
            return

        if isinstance(item_ids, (int, np.integer)):
            item_id_max = item_ids
        else:
            item_id_max = item_ids.max()
        if item_id_max >= self._num_items:
            raise ValueError('Maximum item id greater '
                             'than number of items in model.')

    # -- jitted predict paths -------------------------------------------------

    @functools.cached_property
    def _predict_pairs_fn(self):
        net = self._net

        @jax.jit
        def predict_pairs(params, user_ids, item_ids):
            return net.apply(params, user_ids, item_ids)

        return predict_pairs

    @functools.cached_property
    def _score_catalog_fn(self):
        net = self._net

        @jax.jit
        def score_catalog(params, user_ids):
            if hasattr(net, 'score_catalog'):
                return net.score_catalog(params, user_ids)
            # Generic fallback for injected representations that only
            # implement pairwise scoring.
            all_items = jnp.arange(self._num_items, dtype=jnp.int32)
            return jax.vmap(
                lambda u: net.apply(
                    params, jnp.full_like(all_items, u), all_items)
            )(user_ids)

        return score_catalog

    @functools.cached_property
    def _rank_factors_jit(self):
        net = self._net
        if not isinstance(net, BilinearNet):
            return None

        @jax.jit
        def item_factors(params):
            return net.item_factors(params)

        @jax.jit
        def user_reprs(params, user_ids):
            # The per-user bias shifts every item's score equally and so
            # cannot change ranks; it is dropped from the factors.
            return net.user_factors(params, user_ids)

        return item_factors, user_reprs

    def _rank_factors_users(self, user_batch):
        """(user_reprs, item_matrix, item_bias) for the streaming rank
        kernel, or None when the representation is not a dot-product.

        The densified item matrix is cached per parameter version so
        batched evaluation pays the catalog gather once, not per batch."""
        fns = self._rank_factors_jit
        if fns is None:
            return None
        item_factors, user_reprs = fns

        cache = getattr(self, '_item_factor_cache', None)
        if cache is None or cache[0] is not self._params:
            cache = (self._params, item_factors(self._params))
            self._item_factor_cache = cache
        matrix, bias = cache[1]
        reprs = user_reprs(
            self._params, jnp.asarray(np.asarray(user_batch,
                                                 dtype=np.int32)))
        return reprs, matrix, bias

    def _raw_predictions(self, user_ids, item_ids):
        """Reference `_predict_process_ids` semantics
        (`factorization/_components.py:8-25`) on the batched device paths."""
        if item_ids is None and np.isscalar(user_ids):
            scores = self._score_catalog_fn(
                self._params, jnp.asarray([int(user_ids)], dtype=jnp.int32))
            return np.asarray(scores).flatten()

        if item_ids is None:
            item_ids = np.arange(self._num_items, dtype=np.int32)
        item_ids = np.atleast_1d(np.asarray(item_ids, dtype=np.int32)).ravel()
        if np.isscalar(user_ids):
            user_ids = np.full_like(item_ids, int(user_ids))
        else:
            user_ids = np.atleast_1d(
                np.asarray(user_ids, dtype=np.int32)).ravel()
            if len(user_ids) != len(item_ids):
                user_ids = np.broadcast_to(user_ids, item_ids.shape)

        # Pad pairs to a bucket size so jit caches a handful of shapes only.
        n = len(item_ids)
        bucket = max(256, 1 << (n - 1).bit_length())
        users = training.pad_array(user_ids, bucket)
        items = training.pad_array(item_ids, bucket)
        out = self._predict_pairs_fn(self._params,
                                     jnp.asarray(users), jnp.asarray(items))
        return np.asarray(out)[:n].flatten()

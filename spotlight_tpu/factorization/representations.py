"""Latent representations for factorization models.

TPU-native equivalent of
`/root/reference/spotlight/factorization/representations.py:11`: the
:class:`BilinearNet` scores a (user, item) pair as the dot product of their
latent vectors plus per-user and per-item biases.

The representation exposes two scoring paths:

- :meth:`apply` — elementwise pair scoring (training path),
- :meth:`score_catalog` — a batch of users against the *entire* item catalog
  as one ``(batch, dim) @ (dim, num_items)`` matmul, the MXU-friendly fast
  path behind batched evaluation (the reference instead loops user-by-user in
  Python, `evaluation.py:42-52`).

Table layout (TPU design departure): with the default dense embeddings, each
side keeps **one fused table** of width ``embedding_dim + 1`` whose last
column is the bias (:class:`~spotlight_tpu.ops.embeddings.FusedBiasEmbedding`)
instead of the reference's separate factor + bias tables
(`representations.py:49-59`).  Training throughput on TPU is bound by
random-row HBM accesses, and separate 1-wide bias tables cost as much per
touch as the 64-wide factor rows — fusing them measured +25% end-to-end
(docs/performance.md).  The semantics are identical: Adam/L2/gradients are
elementwise, so the fused layout produces the same updates as four tables.
When custom embedding layers are injected (e.g. a
:class:`~spotlight_tpu.ops.embeddings.BloomEmbedding`), the classic
four-table layout is used instead.

Any object with the same ``init/apply`` signature can be injected into the
estimators via their ``representation=`` escape hatch, mirroring the
reference's coupling rule (`factorization/implicit.py:63-67`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from spotlight_tpu.ops.embeddings import (FusedBiasEmbedding, ScaledEmbedding,
                                          ZeroEmbedding)


@dataclasses.dataclass(frozen=True)
class BilinearNet:
    """Bilinear factorization representation.

    Parameters
    ----------
    num_users : int
    num_items : int
    embedding_dim : int, optional
    user_embedding_layer : embedding layer, optional
        Custom user embedding layer (e.g. a
        :class:`~spotlight_tpu.ops.embeddings.BloomEmbedding`).  Injecting
        any custom layer selects the four-table layout.
    item_embedding_layer : embedding layer, optional
    sparse : bool
        API-parity no-op (XLA embedding gradients are scatter-adds).
    fused : bool, optional
        Force the fused-bias layout on (True) or off (False).  Default
        (None): fused exactly when no custom layers are injected.
    table_dtype : jnp dtype, optional
        Storage dtype for the fused tables (default float32).  bfloat16
        halves gather/scatter bytes (+20% measured throughput); scores are
        always computed in float32.  Only honoured by the fused layout.
    """

    num_users: int
    num_items: int
    embedding_dim: int = 32
    user_embedding_layer: Optional[object] = None
    item_embedding_layer: Optional[object] = None
    sparse: bool = False
    user_bias_layer: Optional[object] = None
    item_bias_layer: Optional[object] = None
    fused: Optional[bool] = None
    table_dtype: object = jnp.float32

    @property
    def _fused(self):
        if self.fused is not None:
            return self.fused
        return (self.user_embedding_layer is None
                and self.item_embedding_layer is None
                and self.user_bias_layer is None
                and self.item_bias_layer is None)

    def _fused_layers(self):
        """(user_layer, item_layer) for the fused layout.

        After :meth:`sharded`, the (wrapped) fused layers live in the
        ``*_embedding_layer`` fields; before that they are constructed
        fresh.
        """
        user = self.user_embedding_layer or FusedBiasEmbedding(
            self.num_users, self.embedding_dim)
        item = self.item_embedding_layer or FusedBiasEmbedding(
            self.num_items, self.embedding_dim)
        return user, item

    def _layers(self):
        user_embeddings = self.user_embedding_layer or ScaledEmbedding(
            self.num_users, self.embedding_dim)
        item_embeddings = self.item_embedding_layer or ScaledEmbedding(
            self.num_items, self.embedding_dim)
        user_biases = self.user_bias_layer or ZeroEmbedding(self.num_users, 1)
        item_biases = self.item_bias_layer or ZeroEmbedding(self.num_items, 1)
        return user_embeddings, item_embeddings, user_biases, item_biases

    def sharded(self, axis='model', num_shards=1, exchange='psum'):
        """A variant of this representation with every embedding table
        row-sharded over the given mesh axis.

        The fused layout shards its two fused tables (one collective per
        side instead of two).  Hash-compressed (bloom) layers shard their
        *compressed* tables through the same exchange
        (:class:`~spotlight_tpu.parallel.sharding.ShardedBloomEmbedding`).
        """
        from spotlight_tpu.ops.embeddings import BloomEmbedding
        from spotlight_tpu.parallel.sharding import (ShardedBloomEmbedding,
                                                     ShardedEmbedding)

        if self._fused:
            user, item = self._fused_layers()
            return dataclasses.replace(
                self,
                fused=True,
                user_embedding_layer=ShardedEmbedding(
                    user, axis=axis, num_shards=num_shards,
                    exchange=exchange),
                item_embedding_layer=ShardedEmbedding(
                    item, axis=axis, num_shards=num_shards,
                    exchange=exchange))

        def wrap(layer):
            if isinstance(layer, BloomEmbedding):
                return ShardedBloomEmbedding(
                    layer, axis=axis, num_shards=num_shards,
                    exchange=exchange)
            if layer is None or not isinstance(
                    layer, (ScaledEmbedding, ZeroEmbedding)):
                return layer
            return ShardedEmbedding(layer, axis=axis, num_shards=num_shards,
                                    exchange=exchange)

        user_emb, item_emb, user_bias, item_bias = self._layers()
        return dataclasses.replace(
            self,
            fused=False,
            user_embedding_layer=wrap(user_emb),
            item_embedding_layer=wrap(item_emb),
            user_bias_layer=wrap(user_bias),
            item_bias_layer=wrap(item_bias))

    def param_specs(self):
        """PartitionSpec tree matching :meth:`init`'s parameter tree."""
        from jax.sharding import PartitionSpec as P

        def spec(layer):
            if hasattr(layer, 'spec'):
                return layer.spec()
            return {'weight': P()}

        if self._fused:
            user, item = self._fused_layers()
            return {
                'user_embeddings': spec(user),
                'item_embeddings': spec(item),
            }

        user_emb, item_emb, user_bias, item_bias = self._layers()
        return {
            'user_embeddings': spec(user_emb),
            'item_embeddings': spec(item_emb),
            'user_biases': spec(user_bias),
            'item_biases': spec(item_bias),
        }

    def init(self, key):
        if self._fused:
            user, item = self._fused_layers()
            keys = jax.random.split(key, 2)
            return {
                'user_embeddings': user.init(keys[0],
                                             dtype=self.table_dtype),
                'item_embeddings': item.init(keys[1],
                                             dtype=self.table_dtype),
            }

        user_emb, item_emb, user_bias, item_bias = self._layers()
        keys = jax.random.split(key, 4)
        return {
            'user_embeddings': user_emb.init(keys[0]),
            'item_embeddings': item_emb.init(keys[1]),
            'user_biases': user_bias.init(keys[2]),
            'item_biases': item_bias.init(keys[3]),
        }

    def _fused_rows(self, params, user_ids=None, item_ids=None):
        """Gather fused (factors ++ bias) rows in float32."""
        user, item = self._fused_layers()
        out = []
        if user_ids is not None:
            out.append(user.apply(params['user_embeddings'],
                                  user_ids).astype(jnp.float32))
        if item_ids is not None:
            out.append(item.apply(params['item_embeddings'],
                                  item_ids).astype(jnp.float32))
        return out[0] if len(out) == 1 else out

    def apply(self, params, user_ids, item_ids):
        """Score (user, item) pairs elementwise.

        ``user_ids`` and ``item_ids`` have the same shape; the result has
        that shape too.
        """
        if self._fused:
            dim = self.embedding_dim
            u, i = self._fused_rows(params, user_ids, item_ids)
            return (jnp.sum(u[..., :dim] * i[..., :dim], axis=-1)
                    + u[..., dim] + i[..., dim])

        user_emb, item_emb, user_bias, item_bias = self._layers()

        users = user_emb.apply(params['user_embeddings'], user_ids)
        items = item_emb.apply(params['item_embeddings'], item_ids)
        u_bias = user_bias.apply(params['user_biases'], user_ids)[..., 0]
        i_bias = item_bias.apply(params['item_biases'], item_ids)[..., 0]

        dot = jnp.sum(users * items, axis=-1)
        return dot + u_bias + i_bias

    def apply_with_negatives(self, params, user_ids, item_ids,
                             negative_item_ids):
        """Score positives and sampled negatives with fused gathers.

        Training throughput on TPU is bound by random-row HBM access
        latency (docs/performance.md), so the win is touching fewer rows:
        user vectors are gathered once (not once per positive + once per
        negative/tile), and positive + negative item ids go through a
        single concatenated gather.  With the fused layout the whole step
        is two gathers: one user-row, one stacked item-row.

        Parameters
        ----------
        user_ids, item_ids : (B,) int
        negative_item_ids : (B,) or (n, B) int

        Returns
        -------
        (positive_scores, negative_scores) with shapes (B,) and
        negative_item_ids.shape.
        """
        stacked = negative_item_ids.ndim == item_ids.ndim + 1
        negatives = (negative_item_ids if stacked
                     else negative_item_ids[None])
        all_items = jnp.concatenate([item_ids[None], negatives], axis=0)

        if self._fused:
            dim = self.embedding_dim
            u, iv = self._fused_rows(params, user_ids, all_items)
            dots = (jnp.sum(u[None, ..., :dim] * iv[..., :dim], axis=-1)
                    + u[None, ..., dim] + iv[..., dim])
            positive = dots[0]
            negative = dots[1:] if stacked else dots[1]
            return positive, negative

        user_emb, item_emb, user_bias, item_bias = self._layers()

        users = user_emb.apply(params['user_embeddings'], user_ids)
        u_bias = user_bias.apply(params['user_biases'], user_ids)[..., 0]

        vectors = item_emb.apply(params['item_embeddings'], all_items)
        biases = item_bias.apply(params['item_biases'], all_items)[..., 0]

        dots = jnp.sum(users[None] * vectors, axis=-1) + biases + u_bias
        positive = dots[0]
        negative = dots[1:] if stacked else dots[1]
        return positive, negative

    def apply_with_inbatch_negatives(self, params, user_ids, item_ids,
                                     num_negatives=1):
        """Score positives against *in-batch* negatives.

        The negatives for example ``b`` are the positive items of other
        examples in the same batch (a circular shift by 1..n), so their
        embedding rows are the rows already gathered for the positives —
        no negative gather in the forward pass and no separate negative
        scatter-add in the backward (the rolled rows' cotangents fold into
        the positive rows' scatter).  Negatives are therefore drawn from
        the *empirical item popularity* distribution rather than uniformly
        — the classic in-batch sampling trade-off (see
        ``ImplicitFactorizationModel(negative_sampling='in_batch')``).

        Returns
        -------
        (positive, negative) : (B,) and ((B,) if ``num_negatives == 1``
            else (num_negatives, B)) scores.
        """
        if self._fused:
            dim = self.embedding_dim
            u, iv = self._fused_rows(params, user_ids, item_ids)
            uf, ub = u[..., :dim], u[..., dim]
            positive = jnp.sum(uf * iv[..., :dim], axis=-1) + ub + iv[..., dim]
            negatives = []
            for shift in range(1, num_negatives + 1):
                nv = jnp.roll(iv, shift, axis=0)
                negatives.append(
                    jnp.sum(uf * nv[..., :dim], axis=-1) + ub + nv[..., dim])
        else:
            user_emb, item_emb, user_bias, item_bias = self._layers()
            users = user_emb.apply(params['user_embeddings'], user_ids)
            u_bias = user_bias.apply(params['user_biases'], user_ids)[..., 0]
            items = item_emb.apply(params['item_embeddings'], item_ids)
            i_bias = item_bias.apply(params['item_biases'], item_ids)[..., 0]
            positive = jnp.sum(users * items, axis=-1) + u_bias + i_bias
            negatives = []
            for shift in range(1, num_negatives + 1):
                nv = jnp.roll(items, shift, axis=0)
                nb = jnp.roll(i_bias, shift, axis=0)
                negatives.append(jnp.sum(users * nv, axis=-1) + u_bias + nb)
        if num_negatives == 1:
            return positive, negatives[0]
        return positive, jnp.stack(negatives, axis=0)

    def item_factors(self, params):
        """Dense ``(num_items, dim)`` factor matrix and ``(num_items,)``
        bias vector — the inputs to catalog scoring / streaming ranking."""
        all_items = jnp.arange(self.num_items, dtype=jnp.int32)
        if self._fused:
            dim = self.embedding_dim
            # No f32 upcast of the factor matrix: a bf16 table streams
            # bf16 through the eval kernels (half the HBM bytes per
            # catalog pass; the in-tile upcast is value-exact, so ranks
            # are bit-identical — ops/kernels/ranking._dot_scores).
            # ShardedEmbedding.apply already returns the storage dtype;
            # FusedBiasEmbedding needs its raw (uncast) gather.
            _user, item = self._fused_layers()
            raw = getattr(item, 'apply_raw', item.apply)
            rows = raw(params['item_embeddings'], all_items)
            return rows[:, :dim], rows[:, dim].astype(jnp.float32)

        _user_emb, item_emb, _user_bias, item_bias = self._layers()
        matrix = item_emb.apply(params['item_embeddings'], all_items)
        bias = item_bias.apply(params['item_biases'], all_items)[..., 0]
        return matrix, bias

    def user_factors(self, params, user_ids):
        """``user_ids.shape + (dim,)`` user factor vectors (bias excluded —
        a per-user constant shift that cannot change item ranks)."""
        if self._fused:
            return self._fused_rows(
                params, user_ids=user_ids)[..., :self.embedding_dim]
        user_emb, *_rest = self._layers()
        return user_emb.apply(params['user_embeddings'], user_ids)

    def score_catalog(self, params, user_ids, item_matrix=None,
                      item_bias_vector=None):
        """Score a batch of users against the whole catalog on the MXU.

        Parameters
        ----------
        user_ids : int array (batch,)
        item_matrix : optional precomputed (num_items, dim) dense item table
            (pass when the item embedding layer is hash-compressed and you
            want to amortize the densification across calls).

        Returns
        -------
        (batch, num_items) float array
        """
        if item_matrix is None:
            item_matrix, item_bias_vector = self.item_factors(params)

        if self._fused:
            dim = self.embedding_dim
            rows = self._fused_rows(params, user_ids=user_ids)
            users, u_bias = rows[..., :dim], rows[..., dim]
        else:
            user_emb, _item_emb, user_bias, _item_bias = self._layers()
            users = user_emb.apply(params['user_embeddings'], user_ids)
            u_bias = user_bias.apply(params['user_biases'], user_ids)[..., 0]

        scores = jnp.dot(users, item_matrix.T,
                         preferred_element_type=jnp.float32)
        return scores + u_bias[:, None] + item_bias_vector[None, :]

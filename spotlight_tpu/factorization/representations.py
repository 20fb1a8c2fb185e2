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

Any object with the same ``init/apply`` signature can be injected into the
estimators via their ``representation=`` escape hatch, mirroring the
reference's coupling rule (`factorization/implicit.py:63-67`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from spotlight_tpu.ops.embeddings import ScaledEmbedding, ZeroEmbedding


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
        :class:`~spotlight_tpu.ops.embeddings.BloomEmbedding`).
    item_embedding_layer : embedding layer, optional
    sparse : bool
        API-parity no-op (XLA embedding gradients are scatter-adds).
    """

    num_users: int
    num_items: int
    embedding_dim: int = 32
    user_embedding_layer: Optional[object] = None
    item_embedding_layer: Optional[object] = None
    sparse: bool = False
    user_bias_layer: Optional[object] = None
    item_bias_layer: Optional[object] = None

    def _layers(self):
        user_embeddings = self.user_embedding_layer or ScaledEmbedding(
            self.num_users, self.embedding_dim)
        item_embeddings = self.item_embedding_layer or ScaledEmbedding(
            self.num_items, self.embedding_dim)
        user_biases = self.user_bias_layer or ZeroEmbedding(self.num_users, 1)
        item_biases = self.item_bias_layer or ZeroEmbedding(self.num_items, 1)
        return user_embeddings, item_embeddings, user_biases, item_biases

    def sharded(self, axis='model', num_shards=1, exchange='psum'):
        """A variant of this representation with every dense embedding table
        row-sharded over the given mesh axis.

        Hash-compressed (bloom) layers are left unwrapped — they are small by
        construction and stay replicated.
        """
        from spotlight_tpu.parallel.sharding import ShardedEmbedding

        def wrap(layer):
            if layer is None or not isinstance(
                    layer, (ScaledEmbedding, ZeroEmbedding)):
                return layer
            return ShardedEmbedding(layer, axis=axis, num_shards=num_shards,
                                    exchange=exchange)

        user_emb, item_emb, user_bias, item_bias = self._layers()
        return dataclasses.replace(
            self,
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

        user_emb, item_emb, user_bias, item_bias = self._layers()
        return {
            'user_embeddings': spec(user_emb),
            'item_embeddings': spec(item_emb),
            'user_biases': spec(user_bias),
            'item_biases': spec(item_bias),
        }

    def init(self, key):
        user_emb, item_emb, user_bias, item_bias = self._layers()
        keys = jax.random.split(key, 4)
        return {
            'user_embeddings': user_emb.init(keys[0]),
            'item_embeddings': item_emb.init(keys[1]),
            'user_biases': user_bias.init(keys[2]),
            'item_biases': item_bias.init(keys[3]),
        }

    def apply(self, params, user_ids, item_ids):
        """Score (user, item) pairs elementwise.

        ``user_ids`` and ``item_ids`` have the same shape; the result has
        that shape too.
        """
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
        single concatenated gather.

        Parameters
        ----------
        user_ids, item_ids : (B,) int
        negative_item_ids : (B,) or (n, B) int

        Returns
        -------
        (positive_scores, negative_scores) with shapes (B,) and
        negative_item_ids.shape.
        """
        user_emb, item_emb, user_bias, item_bias = self._layers()

        users = user_emb.apply(params['user_embeddings'], user_ids)
        u_bias = user_bias.apply(params['user_biases'], user_ids)[..., 0]

        stacked = negative_item_ids.ndim == item_ids.ndim + 1
        negatives = (negative_item_ids if stacked
                     else negative_item_ids[None])

        all_items = jnp.concatenate([item_ids[None], negatives], axis=0)
        vectors = item_emb.apply(params['item_embeddings'], all_items)
        biases = item_bias.apply(params['item_biases'], all_items)[..., 0]

        dots = jnp.sum(users[None] * vectors, axis=-1) + biases + u_bias
        positive = dots[0]
        negative = dots[1:] if stacked else dots[1]
        return positive, negative

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
        user_emb, item_emb, user_bias, item_bias = self._layers()

        if item_matrix is None:
            all_items = jnp.arange(self.num_items, dtype=jnp.int32)
            item_matrix = item_emb.apply(params['item_embeddings'], all_items)
            item_bias_vector = item_bias.apply(
                params['item_biases'], all_items)[..., 0]

        users = user_emb.apply(params['user_embeddings'], user_ids)
        u_bias = user_bias.apply(params['user_biases'], user_ids)[..., 0]

        scores = jnp.dot(users, item_matrix.T,
                         preferred_element_type=jnp.float32)
        return scores + u_bias[:, None] + item_bias_vector[None, :]

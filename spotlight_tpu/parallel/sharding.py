"""Row-sharded embedding tables and parameter placement.

The distributed design the reference lacks (SURVEY.md §2.2): embedding tables
are **block-row-sharded** across the ``'model'`` mesh axis — shard ``s`` owns
the contiguous row range ``[s * rows_per_shard, (s+1) * rows_per_shard)``.
A lookup inside ``shard_map`` gathers locally-owned rows (non-owned positions
contribute zeros) and combines partial results with a single
``psum('model')`` — the Megatron vocab-parallel-embedding pattern.  The
``psum`` transposes to an identity under reverse-mode AD, so gradients land
only on the owning shard's rows as local scatter-adds: no gradient traffic
for the tables beyond the activation-sized collective.

Block (rather than ``mod``) sharding is chosen deliberately: it makes the
globally-sharded array layout identical to the dense single-device layout
(no reorder on placement, orbax-checkpoint friendly) at the cost of
theoretical imbalance only when id popularity correlates with id *ranges* —
not the case for hash-assigned or chronologically-assigned catalogs.

:class:`ShardedEmbedding` wraps a dense embedding layer.  The same parameter
pytree serves both execution contexts, disambiguated by the (static) leading
dimension of the table at trace time:

- inside ``shard_map`` the table arrives as a local ``(rows_per_shard, dim)``
  shard → collective lookup;
- outside (jit global view, e.g. evaluation) it is the full
  ``(num_shards * rows_per_shard, dim)`` array → plain gather, and XLA
  inserts the communication implied by the array's sharding.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def rows_per_shard(num_rows, num_shards):
    return -(-num_rows // num_shards)


@dataclasses.dataclass(frozen=True)
class ShardedEmbedding:
    """A row-sharded wrapper around a dense embedding layer.

    Parameters
    ----------
    inner : ScaledEmbedding or ZeroEmbedding
        The wrapped layer (supplies init distribution, padding semantics,
        embedding_dim).  Bloom-compressed tables should *not* be sharded —
        they are small by construction; replicate them instead.
    axis : str
        Mesh axis name over which rows are sharded.
    num_shards : int
        Size of that mesh axis (static, fixed at construction).
    """

    inner: object
    axis: str = 'model'
    num_shards: int = 1

    @property
    def num_embeddings(self):
        return self.inner.num_embeddings

    @property
    def embedding_dim(self):
        return self.inner.embedding_dim

    @property
    def padded_rows(self):
        return rows_per_shard(self.inner.num_embeddings,
                              self.num_shards) * self.num_shards

    def init(self, key, dtype=jnp.float32):
        params = self.inner.init(key, dtype=dtype)
        weight = params['weight']
        pad = self.padded_rows - weight.shape[0]
        if pad:
            weight = jnp.concatenate(
                [weight, jnp.zeros((pad, weight.shape[1]), dtype=dtype)])
        return {'weight': weight}

    def spec(self):
        """PartitionSpec for this layer's parameters."""
        return {'weight': P(self.axis, None)}

    def apply(self, params, ids):
        weight = params['weight']
        local_rows = self.padded_rows // self.num_shards

        if weight.shape[0] == self.padded_rows:
            # Global view (jit outside shard_map): plain gather; XLA derives
            # any communication from the array's sharding.
            return self._masked(weight[ids], ids)

        if weight.shape[0] != local_rows:
            raise ValueError(
                'ShardedEmbedding saw table with {} rows; expected global '
                '{} or per-shard {}'.format(
                    weight.shape[0], self.padded_rows, local_rows))

        # Local view (inside shard_map): gather owned rows, psum partials.
        shard = jax.lax.axis_index(self.axis)
        start = shard * local_rows
        owned = (ids >= start) & (ids < start + local_rows)
        local_ids = jnp.where(owned, ids - start, 0)
        vectors = weight[local_ids]
        vectors = jnp.where(owned[..., None], vectors,
                            jnp.zeros((), dtype=vectors.dtype))
        vectors = jax.lax.psum(vectors, self.axis)
        return self._masked(vectors, ids)

    def _masked(self, vectors, ids):
        padding_idx = getattr(self.inner, 'padding_idx', None)
        if padding_idx is not None:
            vectors = jnp.where((ids == padding_idx)[..., None],
                                jnp.zeros((), dtype=vectors.dtype), vectors)
        return vectors


def shard_params(params, specs, mesh):
    """Place a parameter pytree on a mesh according to a matching spec tree.

    Leaves of ``specs`` are ``PartitionSpec``s (``P()`` replicates).
    """
    def place(value, spec):
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params, specs)


def replicated_like(params):
    """A spec tree replicating every leaf."""
    return jax.tree_util.tree_map(lambda _: P(), params)

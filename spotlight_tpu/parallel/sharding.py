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
    exchange : str, 'psum' (default) or 'alltoall'
        Collective used by the local-view lookup: the vocab-parallel
        partial-rows ``psum`` (vma-safe, used by the default training
        engine) or the explicit three-phase all-to-all id exchange
        (:func:`alltoall_lookup`; requires the vma-off engine variant —
        see ``parallel.training``).
    """

    inner: object
    axis: str = 'model'
    num_shards: int = 1
    exchange: str = 'psum'

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

        vectors = _exchange_gather(weight, ids, self.axis, self.exchange)
        return self._masked(vectors, ids)

    def _masked(self, vectors, ids):
        padding_idx = getattr(self.inner, 'padding_idx', None)
        if padding_idx is not None:
            vectors = jnp.where((ids == padding_idx)[..., None],
                                jnp.zeros((), dtype=vectors.dtype), vectors)
        return vectors


def _exchange_gather(weight_local, ids, axis, exchange):
    """Row gather from a block-row-sharded table inside ``shard_map``,
    via the configured collective exchange (shared by
    :class:`ShardedEmbedding` and :class:`ShardedBloomEmbedding`)."""
    if exchange == 'alltoall':
        return alltoall_lookup(weight_local, ids, axis=axis)
    if exchange == 'alltoall_cf':
        # Capacity-factored: ids are this device's own batch slice
        # (the engine shards the batch over the model axis too).
        vectors, _overflow = alltoall_capacity_lookup(weight_local, ids,
                                                      axis=axis)
        return vectors

    # Vocab-parallel default: gather owned rows, psum partials.
    local_rows = weight_local.shape[0]
    shard = jax.lax.axis_index(axis)
    start = shard * local_rows
    owned = (ids >= start) & (ids < start + local_rows)
    local_ids = jnp.where(owned, ids - start, 0)
    vectors = weight_local[local_ids]
    vectors = jnp.where(owned[..., None], vectors,
                        jnp.zeros((), dtype=vectors.dtype))
    return jax.lax.psum(vectors, axis)


@dataclasses.dataclass(frozen=True)
class ShardedBloomEmbedding:
    """A bloom-compressed embedding table row-sharded over a mesh axis.

    The compressed table is a plain table of hashed rows, so it
    block-shards like any other (round-3 VERDICT item 6; cf. the
    reference's replicated compressed table,
    `/root/reference/spotlight/layers.py:178-244`): the on-the-fly
    murmurhash produces ``k`` row indices per id, and each hashed index
    routes through the same collective exchange as
    :class:`ShardedEmbedding` before the ``k`` partial rows sum.  Row 0
    (the frozen padding/collision row) lives on shard 0; the zero-mask is
    applied to the assembled rows, so non-owners contribute nothing and
    no gradient ever reaches it.

    Exact parity with the replicated layer: the gather+psum assembles
    bit-identical rows (exactly one shard owns each index; adding zeros
    is exact), and the sum over the ``k`` hashes keeps the replicated
    order.
    """

    inner: object           # a BloomEmbedding
    axis: str = 'model'
    num_shards: int = 1
    exchange: str = 'psum'

    @property
    def num_embeddings(self):
        return self.inner.num_embeddings

    @property
    def embedding_dim(self):
        return self.inner.embedding_dim

    @property
    def padding_idx(self):
        return self.inner.padding_idx

    @property
    def padded_rows(self):
        return rows_per_shard(self.inner.compressed_num_embeddings,
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
        return {'weight': P(self.axis, None)}

    def apply(self, params, ids):
        weight = params['weight']
        local_rows = self.padded_rows // self.num_shards
        rows = self.inner.hashed_rows(ids)     # ids.shape + (k,)

        if weight.shape[0] == self.padded_rows:
            # Global view: plain gather; XLA derives communication from
            # the array's sharding.
            vectors = weight[rows]
        elif weight.shape[0] != local_rows:
            raise ValueError(
                'ShardedBloomEmbedding saw table with {} rows; expected '
                'global {} or per-shard {}'.format(
                    weight.shape[0], self.padded_rows, local_rows))
        else:
            vectors = _exchange_gather(weight, rows, self.axis,
                                       self.exchange)
        if self.inner.padding_idx is not None:
            # Row 0 is the frozen padding row: zero contribution, no grad.
            vectors = jnp.where((rows == 0)[..., None],
                                jnp.zeros((), dtype=vectors.dtype), vectors)
        return vectors.sum(axis=-2)


def alltoall_lookup(weight_local, ids, axis='model'):
    """Row-sharded lookup via explicit all-to-all id exchange.

    The classic three-phase exchange (BASELINE.json north star): send each
    id to its owning shard, gather locally there, return the rows.  Must be
    called inside ``shard_map``; ``weight_local`` is this shard's
    ``(rows_per_shard, dim)`` block and ``ids`` are global row indices
    (replicated across the axis).

    Phases, per device:

    1. build per-destination request buckets ``(num_shards, n)`` (ids not
       owned by the destination carry a ``-1`` sentinel) and exchange them
       with ``all_to_all``;
    2. serve received requests from the local block (non-owned sentinel
       rows contribute zeros);
    3. ``all_to_all`` the served rows back and sum over sources (each id
       is owned by exactly one shard).

    Gradients flow through the reversed all-to-alls back to the owning
    shard's rows.  Note the result is *numerically* replicated across the
    axis but typed as device-varying by the vma checker — the psum-based
    :meth:`ShardedEmbedding.apply` (whose output is provably invariant) is
    the default used in training; this primitive is exercised and tested
    as the exchange-based alternative, and is the building block for a
    capacity-factored variant where the batch is also sharded over the
    table axis (see docs/parallelism.md).

    Parameters
    ----------
    weight_local : (rows_per_shard, dim)
    ids : int array, any shape
    axis : mesh axis name

    Returns
    -------
    ``ids.shape + (dim,)`` embedding rows.
    """
    num_shards = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    local_rows = weight_local.shape[0]

    flat = ids.reshape(-1).astype(jnp.int32)
    owner = flat // local_rows

    dest = jax.lax.broadcasted_iota(jnp.int32, (num_shards, flat.shape[0]),
                                    0)
    requests = jnp.where(owner[None, :] == dest, flat[None, :], -1)

    # Phase 1: requests[s] travels to shard s.
    received = jax.lax.all_to_all(requests, axis, split_axis=0,
                                  concat_axis=0)

    # Phase 2: serve from the local block.
    owned = (received >= me * local_rows) & (received <
                                             (me + 1) * local_rows)
    local_idx = jnp.where(owned, received - me * local_rows, 0)
    served = jnp.where(owned[..., None], weight_local[local_idx], 0.0)

    # Phase 3: served[s'] returns to requester s'; sum over owners.
    returned = jax.lax.all_to_all(served, axis, split_axis=0,
                                  concat_axis=0)
    vectors = returned.sum(axis=0)
    return vectors.reshape(ids.shape + (weight_local.shape[1],))


def alltoall_capacity_lookup(weight_local, ids, axis='model', capacity=None):
    """Capacity-factored row-sharded lookup for model-sharded batches.

    The refinement over :func:`alltoall_lookup` (ROADMAP item 5 /
    round-1 VERDICT item 6): when the *batch is itself sharded over the
    table axis* (each of the ``S`` shards holds ``n`` distinct ids instead
    of replicating all ``S * n``), requests are packed into per-owner
    buckets of ``capacity`` slots before the exchange.  Per-device
    exchange volume drops from ``S * n_replicated`` ids (the replicated
    mode) to ``S * capacity ≈ n`` — a factor of ``S²`` when combined with
    the batch sharding — and the redundant per-shard loss recomputation
    disappears with it.

    Phases, per device (cf. the expert-parallel dispatch pattern):

    1. stable-sort local ids by owning shard; pack each owner's ids into
       its bucket row (slot = rank within owner group, ``-1`` pads);
    2. ``all_to_all`` the ``(S, capacity)`` request buckets; serve from
       the local block; ``all_to_all`` the row payloads back;
    3. unscatter bucket rows back to the original id order.

    With ``capacity = n`` (the default) no id can overflow and the result
    is exact for any input.  A smaller capacity (e.g. ``2 * n / S``)
    trades worst-case imbalance for bandwidth the way expert-parallel
    capacity factors do; ids beyond an owner's capacity would contribute
    zero vectors, so the function also returns the number of overflowed
    ids — callers that opt into reduced capacity must check it (the
    training engine keeps the exact default).

    Must run inside ``shard_map`` with ``check_vma=False`` (like
    :func:`alltoall_lookup`); gradients flow through the transposed
    all-to-alls onto the owning shard's rows.

    Parameters
    ----------
    weight_local : (rows_per_shard, dim)
    ids : int array, any shape — this shard's OWN batch slice (distinct
        from other shards', unlike :func:`alltoall_lookup`'s replicated
        input)
    capacity : int, optional
        Bucket slots per destination shard (default ``ids.size``: exact).

    Returns
    -------
    (vectors, overflow) : ``ids.shape + (dim,)`` rows; scalar int32 count
        of ids that exceeded their owner bucket (0 under the default).
    """
    num_shards = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    local_rows = weight_local.shape[0]

    flat = ids.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    if capacity is None:
        capacity = n
    owner = flat // local_rows

    # Stable sort by owner; rank-within-owner = position - group start.
    order = jnp.argsort(owner, stable=True)
    sorted_owner = owner[order]
    sorted_ids = flat[order]
    positions = jnp.arange(n, dtype=jnp.int32)
    group_start = jnp.searchsorted(sorted_owner, sorted_owner, side='left')
    rank = positions - group_start.astype(jnp.int32)

    fits = rank < capacity
    overflow = jnp.sum(~fits).astype(jnp.int32)
    # Overflowed entries get an out-of-bounds slot so the scatter drops
    # them (an in-bounds sentinel would collide with a real request).
    slot = jnp.where(fits, sorted_owner * capacity + rank,
                     num_shards * capacity)

    requests = jnp.full((num_shards * capacity,), -1, jnp.int32)
    requests = requests.at[slot].set(sorted_ids, mode='drop')
    requests = requests.reshape(num_shards, capacity)

    # Exchange requests; serve from the local block; return payloads.
    received = jax.lax.all_to_all(requests, axis, split_axis=0,
                                  concat_axis=0)
    owned = (received >= me * local_rows) & (received <
                                             (me + 1) * local_rows)
    local_idx = jnp.where(owned, received - me * local_rows, 0)
    served = jnp.where(owned[..., None], weight_local[local_idx], 0.0)
    returned = jax.lax.all_to_all(served, axis, split_axis=0,
                                  concat_axis=0)

    # Unscatter: sorted position i reads its bucket slot, then invert the
    # sort permutation.
    payload = returned.reshape(num_shards * capacity, -1)
    sorted_vectors = jnp.where(
        fits[:, None],
        payload[slot],
        jnp.zeros((), dtype=payload.dtype))
    vectors = jnp.zeros_like(sorted_vectors).at[order].set(sorted_vectors)
    return (vectors.reshape(ids.shape + (weight_local.shape[1],)),
            overflow)


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

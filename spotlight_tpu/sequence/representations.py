"""Sequence representations: users as functions of their interaction history.

TPU-native equivalents of
`/root/reference/spotlight/sequence/representations.py:27,147,261,456`:

- :class:`PoolNet` — causal cumulative mean of item embeddings,
- :class:`LSTMNet` — single-layer LSTM over the sequence,
- :class:`CNNNet` — stacked causal (atrous) convolutions,
- :class:`MixtureLSTMNet` — LSTM projected to mixture-of-tastes vectors.

Shared contract (the reference's two-method protocol,
`sequence/implicit.py:230-235`):

``user_representation(params, sequences)`` returns ``(per_step, final)``
where ``per_step[:, t]`` encodes items *before* position ``t`` (step -1 —
nothing seen — through step T-1), and ``final`` encodes the whole sequence.
The causal alignment is achieved by left-padding the embedded sequence with
one zero step and dropping the last output step, exactly mirroring the
reference's pad-then-drop trick (`representations.py:100-114`).

``score(params, per_step, targets)`` scores target items against each step's
representation; ``score_catalog(params, final)`` scores the final
representation against the whole catalog in one MXU matmul (the evaluation
fast path).

Layout departures from the reference, for TPU:

- activations are ``(batch, time, features)`` (features-last maps to TPU
  lanes) instead of torch's channels-first ``(batch, channels, time)``;
- the LSTM precomputes input projections for *all* timesteps in one large
  matmul (MXU-friendly), leaving only the ``h @ W_hh`` recurrence inside
  ``lax.scan``;
- convolutions use ``lax.conv_general_dilated`` with explicit causal left
  padding;
- with the default dense embeddings, the item bias lives in column ``D`` of
  **one fused** ``(num_items, D + 1)`` table
  (:class:`~spotlight_tpu.ops.embeddings.FusedBiasEmbedding`) instead of the
  reference's separate factor + 1-wide bias tables.  Sequence training is
  bound by random HBM row touches, and a 1-wide bias row costs the same
  touch as a 65-wide factor row; fusing them removes the positive- and
  negative-target bias gathers (and their backward scatter-adds) from every
  step.  Semantics are identical (Adam/L2/gradients are elementwise).  When
  a custom ``item_embedding_layer``/``item_bias_layer`` is injected (e.g. a
  bloom-compressed table), the classic two-table layout is used instead.

Parameter initializations match torch's defaults so learning dynamics are
comparable: LSTM weights/biases ~ U(-1/sqrt(H), 1/sqrt(H)); conv weights and
biases ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from spotlight_tpu.ops.embeddings import (FusedBiasEmbedding, ScaledEmbedding,
                                          ZeroEmbedding)

PADDING_IDX = 0


def _to_tuple(val, num):
    if isinstance(val, (tuple, list)):
        return tuple(val)
    return (val,) * num


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


class _ItemRepresentationBase:
    """Common item embedding/bias plumbing shared by all representations."""

    @property
    def _fused(self):
        """Use the fused factor+bias table layout?  Forced by the ``fused``
        field when set; otherwise fused exactly when no custom layers are
        injected (see module docstring)."""
        fused = getattr(self, 'fused', None)
        if fused is not None:
            return fused
        return (self.item_embedding_layer is None
                and getattr(self, 'item_bias_layer', None) is None)

    def _fused_layer(self):
        """The fused ``(num_items, D + 1)`` item layer.  After
        :meth:`sharded`, the (wrapped) fused layer lives in
        ``item_embedding_layer``; before that it is constructed fresh."""
        return self.item_embedding_layer or FusedBiasEmbedding(
            self.num_items, self.embedding_dim, padding_idx=PADDING_IDX)

    def _item_layers(self):
        item_embeddings = self.item_embedding_layer or ScaledEmbedding(
            self.num_items, self.embedding_dim, padding_idx=PADDING_IDX)
        item_biases = getattr(self, 'item_bias_layer', None) or ZeroEmbedding(
            self.num_items, 1, padding_idx=PADDING_IDX)
        return item_embeddings, item_biases

    def sharded(self, axis='model', num_shards=1, exchange='psum'):
        """A variant with the item embedding/bias tables row-sharded over
        the given mesh axis; dense (LSTM/CNN/projection) parameters stay
        replicated.  Bloom-compressed layers shard their *compressed*
        tables through the same exchange
        (:class:`~spotlight_tpu.parallel.sharding.ShardedBloomEmbedding`)."""
        from spotlight_tpu.ops.embeddings import BloomEmbedding
        from spotlight_tpu.parallel.sharding import (ShardedBloomEmbedding,
                                                     ShardedEmbedding)

        if self._fused:
            return dataclasses.replace(
                self,
                fused=True,
                item_embedding_layer=ShardedEmbedding(
                    self._fused_layer(), axis=axis, num_shards=num_shards,
                    exchange=exchange))

        def wrap(layer):
            if isinstance(layer, BloomEmbedding):
                return ShardedBloomEmbedding(
                    layer, axis=axis, num_shards=num_shards,
                    exchange=exchange)
            if not isinstance(layer, (ScaledEmbedding, ZeroEmbedding)):
                return layer
            return ShardedEmbedding(layer, axis=axis, num_shards=num_shards,
                                    exchange=exchange)

        item_emb, item_bias = self._item_layers()
        return dataclasses.replace(
            self,
            fused=False,
            item_embedding_layer=wrap(item_emb),
            item_bias_layer=wrap(item_bias))

    def param_specs(self):
        """PartitionSpec tree matching :meth:`init`'s parameter tree:
        sharded specs for wrapped tables, replicated for everything else."""
        from jax.sharding import PartitionSpec as P

        shapes = jax.eval_shape(self.init, jax.random.PRNGKey(0))
        specs = jax.tree_util.tree_map(lambda _: P(), shapes)
        if self._fused:
            layer = self._fused_layer()
            if hasattr(layer, 'spec'):
                specs['item_embeddings'] = layer.spec()
            return specs
        item_emb, item_bias = self._item_layers()
        if hasattr(item_emb, 'spec'):
            specs['item_embeddings'] = item_emb.spec()
        if hasattr(item_bias, 'spec'):
            specs['item_biases'] = item_bias.spec()
        return specs

    def _init_item_params(self, key):
        # The factor draw uses the same key in both layouts, so fused and
        # classic initializations share identical factor values.
        k_emb, k_bias = jax.random.split(key)
        if self._fused:
            return {'item_embeddings': self._fused_layer().init(
                k_emb, dtype=getattr(self, 'table_dtype', jnp.float32))}
        item_emb, item_bias = self._item_layers()
        return {
            'item_embeddings': item_emb.init(k_emb),
            'item_biases': item_bias.init(k_bias),
        }

    def _fused_rows(self, params, ids):
        """Gather fused (factors ++ bias) rows in float32 (the sharded
        wrapper returns the table dtype unchanged)."""
        rows = self._fused_layer().apply(params['item_embeddings'], ids)
        return rows.astype(jnp.float32)

    def _embed(self, params, sequences):
        if self._fused:
            return self._fused_rows(params,
                                    sequences)[..., :self.embedding_dim]
        item_emb, _ = self._item_layers()
        return item_emb.apply(params['item_embeddings'], sequences)

    def user_representation(self, params, sequences):
        """(per_step, final) representations; see the module docstring.

        Split as embed + tower so engines that manage the item-table
        gather themselves (the row-sparse engine) can call
        :meth:`_user_repr_from_emb` on pre-gathered rows."""
        return self._user_repr_from_emb(params,
                                        self._embed(params, sequences))

    def _target_rows(self, params, targets):
        """(vectors, bias) for target item ids: one fused-row gather, or a
        factor gather + bias gather in the classic layout.  In the fused
        layout a positive-target gather is the *same expression* as the
        input-embedding gather of the identical ids, so XLA CSE folds the
        two into one."""
        if self._fused:
            rows = self._fused_rows(params, targets)
            return (rows[..., :self.embedding_dim],
                    rows[..., self.embedding_dim])
        item_emb, item_bias = self._item_layers()
        vectors = item_emb.apply(params['item_embeddings'], targets)
        bias = item_bias.apply(params['item_biases'], targets)[..., 0]
        return vectors, bias

    @staticmethod
    def _causal_shift(emb):
        """Left-pad the embedded sequence by one zero step: output step t
        sees items strictly before t (the reference's pad-then-drop trick,
        `representations.py:100-106`)."""
        zeros = jnp.zeros_like(emb[:, :1])
        return jnp.concatenate([zeros, emb], axis=1)  # (B, T+1, D)

    def score(self, params, user_representations, targets):
        """Predictions for target items at every timestep.

        Parameters
        ----------
        user_representations : (B, T, D) — per-step representations
        targets : (B, T) int — item ids

        Returns
        -------
        (B, T) float scores
        """
        target_embedding, target_bias = self._target_rows(params, targets)
        return self._score_vectors(user_representations, target_embedding,
                                   target_bias)

    def _score_vectors(self, user_representations, vectors, bias):
        """Score already-gathered target rows (vectors (B, T, D), bias
        (B, T)) against per-step representations."""
        dot = jnp.sum(user_representations * vectors, axis=-1)
        return dot + bias

    def score_inbatch_negatives(self, params, user_representations, targets,
                                num_negatives=1):
        """Scores of *in-batch* negatives: the target rows of other batch
        rows (circular shift by 1..n along the batch axis), reusing the
        rows already gathered for the positives — no negative gather, and
        the rolled rows' backward cotangents fold into the positive rows'
        scatter-add.  Negatives follow the batch's empirical item
        distribution (see ``ImplicitSequenceModel(negative_sampling=
        'in_batch')``); a rolled padding position contributes the frozen
        zero row.

        Returns (B, T) scores for ``num_negatives == 1``, else
        (num_negatives, B, T).
        """
        vectors, bias = self._target_rows(params, targets)
        outs = []
        for shift in range(1, num_negatives + 1):
            rolled = jnp.roll(vectors, shift, axis=0)
            rolled_bias = jnp.roll(bias, shift, axis=0)
            outs.append(self._score_vectors(user_representations, rolled,
                                            rolled_bias))
        if num_negatives == 1:
            return outs[0]
        return jnp.stack(outs, axis=0)

    def _catalog_matrix(self, params):
        """Densified (num_items, dim) item matrix and (num_items,) bias —
        works for plain, fused, bloom-compressed, and row-sharded layers.

        The factor matrix keeps the table's storage dtype (no f32 upcast):
        a ``table_dtype=bfloat16`` catalog streams bf16 through the eval
        kernels — half the HBM bytes per pass — and the in-tile upcast is
        value-exact, so ranks match the f32-upcast path bit-for-bit
        (`ops/kernels/ranking._dot_scores`)."""
        all_items = jnp.arange(self.num_items, dtype=jnp.int32)
        if self._fused:
            layer = self._fused_layer()
            raw = getattr(layer, 'apply_raw', layer.apply)
            rows = raw(params['item_embeddings'], all_items)
            return (rows[..., :self.embedding_dim],
                    rows[..., self.embedding_dim].astype(jnp.float32))
        return self._target_rows(params, all_items)

    def score_catalog(self, params, final_representations):
        """Score final representations against the whole catalog.

        Parameters
        ----------
        final_representations : (B, D)

        Returns
        -------
        (B, num_items) float scores
        """
        weight, bias = self._catalog_matrix(params)
        scores = jnp.dot(final_representations, weight.T,
                         preferred_element_type=jnp.float32)
        return scores + bias[None, :]


@dataclasses.dataclass(frozen=True)
class PoolNet(_ItemRepresentationBase):
    """Average pooling representation (reference `representations.py:27`).

    Represents a user at step t as the running mean of the embeddings of
    items seen before t.  Matches the reference's cumulative-sum formulation,
    including its count-plus-one smoothing denominator
    (`representations.py:104-112`: the running nonzero count per channel,
    plus one).
    """

    num_items: int
    embedding_dim: int = 32
    item_embedding_layer: Optional[object] = None
    sparse: bool = False
    item_bias_layer: Optional[object] = None
    fused: Optional[bool] = None
    table_dtype: object = jnp.float32

    def init(self, key):
        return self._init_item_params(key)

    def _user_repr_from_emb(self, params, emb):
        shifted = self._causal_shift(emb)  # (B, T+1, D)
        sums = jnp.cumsum(shifted, axis=1)
        counts = jnp.cumsum((shifted != 0.0).astype(shifted.dtype), axis=1)
        representations = sums / (counts + 1.0)
        return representations[:, :-1], representations[:, -1]


@dataclasses.dataclass(frozen=True)
class LSTMNet(_ItemRepresentationBase):
    """LSTM representation (reference `representations.py:147`).

    A single-layer LSTM over the (shifted) embedded sequence; the hidden
    state at each step is the user representation.  The input projection for
    all timesteps is computed as one batched matmul before the scan, so the
    sequential part is only the ``h @ W_hh`` recurrence.
    """

    num_items: int
    embedding_dim: int = 32
    item_embedding_layer: Optional[object] = None
    sparse: bool = False
    item_bias_layer: Optional[object] = None
    fused: Optional[bool] = None
    table_dtype: object = jnp.float32

    def init(self, key):
        item_key, *keys = jax.random.split(key, 5)
        params = self._init_item_params(item_key)
        dim = self.embedding_dim
        bound = 1.0 / jnp.sqrt(dim)
        params['lstm'] = {
            # Gate order (i, f, g, o), matching torch's packing.
            'w_ih': _uniform(keys[0], (dim, 4 * dim), bound),
            'w_hh': _uniform(keys[1], (dim, 4 * dim), bound),
            'b_ih': _uniform(keys[2], (4 * dim,), bound),
            'b_hh': _uniform(keys[3], (4 * dim,), bound),
        }
        return params

    def _run_lstm(self, params, inputs):
        """inputs: (B, T1, D) -> hidden states (B, T1, D)."""
        lstm = params['lstm']
        dim = self.embedding_dim
        # One large MXU matmul for every step's input projection.
        x_proj = (jnp.einsum('btd,dg->btg', inputs, lstm['w_ih'],
                             preferred_element_type=jnp.float32)
                  + lstm['b_ih'] + lstm['b_hh'])

        def step(carry, x_t):
            h, c = carry
            gates = x_t + jnp.dot(h, lstm['w_hh'],
                                  preferred_element_type=jnp.float32)
            i = jax.nn.sigmoid(gates[:, :dim])
            f = jax.nn.sigmoid(gates[:, dim:2 * dim])
            g = jnp.tanh(gates[:, 2 * dim:3 * dim])
            o = jax.nn.sigmoid(gates[:, 3 * dim:])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        # Derive the zero carry from the inputs so it inherits their
        # device-variance type under vma-aware shard_map (a plain
        # jnp.zeros would be axis-invariant and fail the scan carry check).
        zero_state = x_proj[:, 0, :dim] * 0.0
        init = (zero_state, zero_state)
        _, hidden = jax.lax.scan(step, init,
                                 jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(hidden, 0, 1)

    def _user_repr_from_emb(self, params, emb):
        shifted = self._causal_shift(emb)
        hidden = self._run_lstm(params, shifted)
        return hidden[:, :-1], hidden[:, -1]


@dataclasses.dataclass(frozen=True)
class CNNNet(_ItemRepresentationBase):
    """Stacked causal atrous CNN representation (reference
    `representations.py:261`; WaveNet/ByteNet style).

    Causality comes from explicit left padding: the first layer pads by the
    full receptive-field width (shifting outputs one step into the future —
    the reference's alignment trick, `representations.py:394-399`), later
    layers pad by ``receptive_field - 1`` (length-preserving).

    Parameters
    ----------
    kernel_width, dilation : int or tuple per layer
    num_layers : int
    nonlinearity : 'tanh' or 'relu'
    residual_connections : bool
    """

    num_items: int
    embedding_dim: int = 32
    kernel_width: Union[int, Tuple[int, ...]] = 3
    dilation: Union[int, Tuple[int, ...]] = 1
    num_layers: int = 1
    nonlinearity: str = 'tanh'
    residual_connections: bool = True
    sparse: bool = False
    benchmark: bool = True  # API parity no-op (cudnn flag in the reference)
    item_embedding_layer: Optional[object] = None
    item_bias_layer: Optional[object] = None
    fused: Optional[bool] = None
    table_dtype: object = jnp.float32

    def __post_init__(self):
        if self.nonlinearity not in ('tanh', 'relu'):
            raise ValueError('Nonlinearity must be one of (tanh, relu)')

    @property
    def _kernel_widths(self):
        return _to_tuple(self.kernel_width, self.num_layers)

    @property
    def _dilations(self):
        return _to_tuple(self.dilation, self.num_layers)

    def _nonlinearity(self, x):
        return jnp.tanh(x) if self.nonlinearity == 'tanh' else jax.nn.relu(x)

    def init(self, key):
        item_key, key = jax.random.split(key)
        params = self._init_item_params(item_key)
        dim = self.embedding_dim
        layers = []
        for kw in self._kernel_widths:
            k_w, k_b, key = jax.random.split(key, 3)
            bound = 1.0 / jnp.sqrt(dim * kw)
            layers.append({
                'weight': _uniform(k_w, (kw, dim, dim), bound),  # (W, I, O)
                'bias': _uniform(k_b, (dim,), bound),
            })
        params['cnn_layers'] = layers
        return params

    def _conv(self, x, layer, dilation, left_pad):
        """Causal 1-D convolution: (B, T, D) -> (B, T', D)."""
        x = jnp.pad(x, ((0, 0), (left_pad, 0), (0, 0)))
        out = jax.lax.conv_general_dilated(
            x, layer['weight'],
            window_strides=(1,),
            padding='VALID',
            rhs_dilation=(dilation,),
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            preferred_element_type=jnp.float32)
        return out + layer['bias']

    def _user_repr_from_emb(self, params, emb):
        # emb: (B, T, D)
        kernel_widths = self._kernel_widths
        dilations = self._dilations
        layers = params['cnn_layers']

        # First layer: pad by the full receptive field, producing T+1 steps
        # (step 0 = nothing seen).
        receptive_field = (kernel_widths[0] +
                           (kernel_widths[0] - 1) * (dilations[0] - 1))
        x = self._nonlinearity(
            self._conv(emb, layers[0], dilations[0], receptive_field))

        if self.residual_connections:
            residual = jnp.pad(emb, ((0, 0), (1, 0), (0, 0)))
            x = x + residual

        for layer, kw, dilation in zip(layers[1:], kernel_widths[1:],
                                       dilations[1:]):
            receptive_field = kw + (kw - 1) * (dilation - 1)
            residual = x
            x = self._nonlinearity(
                self._conv(x, layer, dilation, receptive_field - 1))
            if self.residual_connections:
                x = x + residual

        return x[:, :-1], x[:, -1]


@dataclasses.dataclass(frozen=True)
class MixtureLSTMNet(_ItemRepresentationBase):
    """Mixture-of-tastes LSTM representation (reference
    `representations.py:456`; Kula, "Mixture-of-tastes Models", 2017).

    An LSTM hidden state is projected (1x1 conv = per-step dense layer) to
    ``num_mixtures`` taste vectors plus ``num_mixtures`` attention vectors;
    a target item is scored against the softmax-weighted mixture of tastes,
    with attention weights given by the item's affinity to each attention
    vector.

    Representation shapes: per-step ``(B, T, 2*num_mixtures, D)``, final
    ``(B, 2*num_mixtures, D)``.
    """

    num_items: int
    embedding_dim: int = 32
    num_mixtures: int = 4
    item_embedding_layer: Optional[object] = None
    sparse: bool = False
    item_bias_layer: Optional[object] = None
    fused: Optional[bool] = None
    table_dtype: object = jnp.float32

    def init(self, key):
        item_key, *keys = jax.random.split(key, 7)
        params = self._init_item_params(item_key)
        dim = self.embedding_dim
        bound = 1.0 / jnp.sqrt(dim)
        params['lstm'] = {
            'w_ih': _uniform(keys[0], (dim, 4 * dim), bound),
            'w_hh': _uniform(keys[1], (dim, 4 * dim), bound),
            'b_ih': _uniform(keys[2], (4 * dim,), bound),
            'b_hh': _uniform(keys[3], (4 * dim,), bound),
        }
        out_dim = dim * self.num_mixtures * 2
        params['projection'] = {
            'weight': _uniform(keys[4], (dim, out_dim), bound),
            'bias': _uniform(keys[5], (out_dim,), bound),
        }
        return params

    def _user_repr_from_emb(self, params, emb):
        shifted = self._causal_shift(emb)
        hidden = LSTMNet._run_lstm(self, params, shifted)  # (B, T+1, D)
        projected = (jnp.einsum('btd,do->bto', hidden,
                                params['projection']['weight'],
                                preferred_element_type=jnp.float32)
                     + params['projection']['bias'])
        batch, t1 = projected.shape[:2]
        projected = projected.reshape(
            batch, t1, 2 * self.num_mixtures, self.embedding_dim)
        return projected[:, :-1], projected[:, -1]

    def score(self, params, user_representations, targets):
        """user_representations: (B, T, 2M, D); targets: (B, T)."""
        target_embedding, target_bias = self._target_rows(
            params, targets)                                # (B, T, D)
        return self._score_vectors(user_representations, target_embedding,
                                   target_bias)

    def _score_vectors(self, user_representations, vectors, bias):
        m = self.num_mixtures
        components = user_representations[..., :m, :]       # (B, T, M, D)
        mixture_vectors = user_representations[..., m:, :]  # (B, T, M, D)

        attention = jnp.einsum('btmd,btd->btm', mixture_vectors, vectors,
                               preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(attention, axis=-1)
        weighted = jnp.einsum('btm,btmd->btd', weights, components,
                              preferred_element_type=jnp.float32)
        dot = jnp.sum(weighted * vectors, axis=-1)
        return dot + bias

    def score_catalog(self, params, final_representations):
        """final_representations: (B, 2M, D) -> (B, num_items)."""
        m = self.num_mixtures
        components = final_representations[:, :m, :]       # (B, M, D)
        mixture_vectors = final_representations[:, m:, :]  # (B, M, D)

        weight, bias = self._catalog_matrix(params)        # (N, D), (N,)

        taste_scores = jnp.einsum('bmd,nd->bmn', components, weight,
                                  preferred_element_type=jnp.float32)
        attention = jnp.einsum('bmd,nd->bmn', mixture_vectors, weight,
                               preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(attention, axis=1)
        scores = jnp.sum(weights * taste_scores, axis=1)
        return scores + bias[None, :]

"""Negative item sampling.

The reference samples negatives on the host with numpy once per minibatch and
copies them to the device (`/root/reference/spotlight/sampling.py:8`,
`/root/reference/spotlight/factorization/implicit.py:254-262`) — a per-batch
host-to-device round trip.  The TPU-native training loops instead sample
negatives *on device* with ``jax.random`` inside the jitted epoch step, one key
split per minibatch, so sampling fuses into the training computation and never
touches the host.

The host-side ``sample_items`` is kept for API parity and host-side workflows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_items(num_items, shape, random_state=None):
    """Uniformly sample item ids on the host (API parity helper).

    Parameters
    ----------
    num_items : int
        Sampled ids are drawn from ``[0, num_items)``.
    shape : int or tuple of int
    random_state : np.random.RandomState, optional

    Returns
    -------
    np.ndarray of int64
    """
    if random_state is None:
        random_state = np.random.RandomState()
    return random_state.randint(0, num_items, shape, dtype=np.int64)


def sample_items_device(key, num_items, shape):
    """Uniformly sample item ids on device (traceable).

    Parameters
    ----------
    key : jax.random key
    num_items : int (static)
    shape : tuple of int (static)

    Returns
    -------
    jnp.ndarray of int32
    """
    return jax.random.randint(key, shape, 0, num_items, dtype=jnp.int32)


def inbatch_importance_weights(item_ids, num_items, padding_idx=None):
    """Per-interaction importance weights for in-batch negatives.

    In-batch negatives are drawn from the empirical item distribution
    ``q(j) = count(j) / n``; left uncorrected, ranking losses then learn
    to *demote* popular items — catastrophic on popularity-skewed data
    (measured: test MRR 0.007 vs 0.103 on the Zipf-popularity Amazon-like
    fixture, `scripts/inbatch_negatives_study.py`).  Weighting each pair
    by ``uniform(j) / q(j)`` makes the expected gradient equal the
    uniform-negative objective's (importance sampling; cf. the logQ
    correction of sampled-softmax systems), while the negatives keep
    costing zero extra HBM row touches.

    Weights are normalized so ``E_{j~q}[w] = 1`` (the effective learning
    rate is unchanged): ``w(j) = n_distinct_denominator / count(j)`` with
    the denominator chosen over the items that actually occur.

    Parameters
    ----------
    item_ids : int array (any shape) — the training items (the in-batch
        negative pool); entries equal to ``padding_idx`` get weight 0
        (a padding row must not act as a negative).
    num_items : int

    Returns
    -------
    float32 array shaped like ``item_ids``.
    """
    weights = inbatch_importance_weight_table(item_ids, num_items,
                                              padding_idx=padding_idx)
    flat = np.asarray(item_ids).reshape(-1)
    out = weights[flat]
    return out.reshape(np.asarray(item_ids).shape).astype(np.float32)


def inbatch_importance_weight_table(item_ids, num_items, padding_idx=None):
    """The per-item weight table behind
    :func:`inbatch_importance_weights`: ``w(j) = n / (distinct * count(j))``
    for items occurring in ``item_ids``, 0 otherwise (and 0 at
    ``padding_idx``).  The estimators ship this small ``(num_items,)``
    table to the device and derive the per-interaction column with one
    on-device gather — the column itself never crosses the host-to-device
    link.
    """
    flat = np.asarray(item_ids).reshape(-1)
    valid = np.ones(flat.shape, dtype=bool)
    if padding_idx is not None:
        valid = flat != padding_idx
    counts = np.bincount(flat[valid], minlength=num_items)
    if padding_idx is not None:
        counts[padding_idx] = 0
    distinct = int((counts > 0).sum())
    n = int(valid.sum())
    weights = np.zeros(num_items, dtype=np.float32)
    occupied = counts > 0
    weights[occupied] = n / (max(distinct, 1) * counts[occupied])
    return weights


def weighted_inbatch_elems(loss, elems, negative_scores, pair_weight):
    """Apply the in-batch importance weight to elementwise loss values.

    For the pairwise losses (``bpr``, ``hinge``, ``adaptive_hinge``) the
    whole per-pair term depends on the sampled negative, so the full
    elementwise loss is weighted.  For ``pointwise`` only the negative
    term ``sigmoid(neg)`` is drawn from the in-batch distribution; the
    positive term ``1 - sigmoid(pos)`` must not carry the neighbour's
    weight (weighting it stays unbiased — ``E_q[w] = 1`` and the weight is
    independent of the positive — but adds variance; this is the exact
    correction).

    Parameters
    ----------
    loss : str — the loss name
    elems : elementwise loss values from the loss function
    negative_scores : the negative predictions the loss consumed (only
        consulted for ``pointwise``; for ``adaptive_hinge`` pass the
        already-selected hardest negative or rely on the pairwise branch)
    pair_weight : per-element weights from :func:`inbatch_pair_weights`
    """
    import jax

    if loss == 'pointwise':
        neg_elems = jax.nn.sigmoid(negative_scores)
        return (elems - neg_elems) + pair_weight * neg_elems
    return elems * pair_weight


def inbatch_pair_weights(weight, negative_scores, num_negatives):
    """Importance weight of each in-batch pair (shared by both implicit
    estimators).

    For a single rolled negative (``num_negatives == 1``) this is simply
    the weight rolled by one.  For ``adaptive_hinge`` the hardest (max-
    scoring) negative is selected per entry, so the pair is weighted by
    the *selected* negative's weight — a WARP-style heuristic: a max over
    non-uniform samples has no unbiased importance correction
    (docs/performance.md "In-batch negatives").

    Parameters
    ----------
    weight : per-example weights, shape matching one negative's scores
    negative_scores : stacked ``(num_negatives,) + weight.shape`` scores
        (only consulted when ``num_negatives > 1``)
    """
    import jax.numpy as jnp

    if num_negatives == 1:
        return jnp.roll(weight, 1, axis=0)
    stack = jnp.stack([jnp.roll(weight, s, axis=0)
                       for s in range(1, num_negatives + 1)], axis=0)
    hardest = jnp.argmax(negative_scores, axis=0)
    return jnp.take_along_axis(stack, hardest[None], axis=0)[0]

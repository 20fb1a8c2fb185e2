"""Synthetic datasets with known properties, for model testing.

Sequential data: an n-th order Markov chain over items with a
doubly-stochastic transition matrix sampled from a Dirichlet distribution,
matching the reference generator's statistics
(`/root/reference/spotlight/datasets/synthetic.py:12,37,67`): low
``concentration_parameter`` values give highly predictable chains (a sequence
model should reach high MRR), large values give near-uniform chains (MRR should
stay near chance).  This is the main offline test fixture — no network needed.

Factorization data: a low-rank latent-factor interaction sampler
(:func:`generate_factorization`) giving implicit/explicit datasets with known
learnable structure, standing in for MovieLens in network-free CI.

The Markov walk is vectorized over users where possible; the sequential scan
itself runs in numpy (host-side data prep, outside the training hot path).
"""

from __future__ import annotations

import numpy as np

from spotlight_tpu.data.interactions import Interactions


def _build_transition_matrix(num_items, concentration_parameter, random_state,
                             atol=0.001):
    def _is_doubly_stochastic(matrix):
        return (np.all(np.abs(1.0 - matrix.sum(axis=0)) < atol) and
                np.all(np.abs(1.0 - matrix.sum(axis=1)) < atol))

    transition_matrix = random_state.dirichlet(
        np.repeat(concentration_parameter, num_items), num_items)

    # Sinkhorn-style alternating normalization to doubly stochastic.
    for _ in range(100):
        if _is_doubly_stochastic(transition_matrix):
            break
        transition_matrix /= transition_matrix.sum(axis=0)
        transition_matrix /= transition_matrix.sum(axis=1)[:, np.newaxis]

    return transition_matrix


def _generate_sequences(num_steps, transition_matrix, order, random_state):
    num_states = transition_matrix.shape[0]
    cumulative = np.cumsum(transition_matrix, axis=1)

    rvs = random_state.rand(num_steps)
    state = random_state.randint(num_states, size=order, dtype=np.int64)

    # Fast path: native C++ walk (bit-identical to the loop below — same
    # operation order in the mean-CDF evaluation and searchsorted
    # semantics), ~1000x faster via on-demand CDF probing.
    from spotlight_tpu import native

    elements = native.markov_walk(cumulative, rvs, state)
    if elements is not None:
        return elements

    elements = np.empty(num_steps, dtype=np.int32)
    for step, rv in enumerate(rvs):
        row = cumulative[state].mean(axis=0)
        new_state = min(num_states - 1, int(np.searchsorted(row, rv)))
        state[:-1] = state[1:]
        state[-1] = new_state
        elements[step] = new_state

    return elements


def generate_sequential(num_users=100,
                        num_items=1000,
                        num_interactions=10000,
                        concentration_parameter=0.1,
                        order=3,
                        random_state=None):
    """Generate a dataset of interactions where sequential information matters.

    Interactions follow an ``order``-th order Markov chain with a uniform
    stationary distribution; transition probabilities for higher orders are
    the mean of the last ``order`` states' rows.  ``concentration_parameter``
    closer to zero gives more predictable sequences.

    Returns
    -------
    :class:`~spotlight_tpu.data.interactions.Interactions`
    """
    if random_state is None:
        random_state = np.random.RandomState()

    transition_matrix = _build_transition_matrix(
        num_items - 1, concentration_parameter, random_state)

    user_ids = np.sort(random_state.randint(
        0, num_users, num_interactions, dtype=np.int32))
    # Shift items by one: id 0 is reserved as the sequence padding value.
    item_ids = _generate_sequences(num_interactions, transition_matrix,
                                   order, random_state) + 1
    timestamps = np.arange(len(user_ids), dtype=np.int32)
    ratings = np.ones(len(user_ids), dtype=np.float32)

    return Interactions(user_ids,
                        item_ids,
                        ratings=ratings,
                        timestamps=timestamps,
                        num_users=num_users,
                        num_items=num_items)


def generate_factorization(num_users=1000,
                           num_items=1000,
                           num_interactions=30000,
                           rank=8,
                           noise=0.1,
                           explicit=False,
                           random_state=None):
    """Generate a low-rank interaction dataset with learnable structure.

    Users and items get latent factors of dimension ``rank``; each user
    interacts preferentially with high-affinity items via a softmax over
    noisy latent scores.  A matrix-factorization model should recover the
    structure (MRR well above the ~1/num_items chance level), while a random
    scorer cannot — the network-free stand-in for the reference's
    MovieLens-based statistical CI gates
    (`/root/reference/tests/factorization/test_implicit.py:37-57`).

    Parameters
    ----------
    explicit : bool
        If True, also attach ratings in [1, 5] derived from latent affinity.

    Returns
    -------
    :class:`~spotlight_tpu.data.interactions.Interactions`
    """
    if random_state is None:
        random_state = np.random.RandomState()

    user_factors = random_state.randn(num_users, rank) / np.sqrt(rank)
    item_factors = random_state.randn(num_items, rank) / np.sqrt(rank)

    user_ids = random_state.randint(
        0, num_users, num_interactions).astype(np.int32)

    scores = user_factors[user_ids] @ item_factors.T  # (n, num_items)
    scores += noise * random_state.randn(*scores.shape)
    # Gumbel-max trick: one softmax sample per interaction, vectorized.
    gumbel = -np.log(-np.log(random_state.rand(*scores.shape)))
    item_ids = np.argmax(scores / max(noise, 1e-3) + gumbel,
                         axis=1).astype(np.int32)

    timestamps = np.arange(num_interactions, dtype=np.int32)

    if explicit:
        affinity = np.einsum('nd,nd->n',
                             user_factors[user_ids], item_factors[item_ids])
        affinity += noise * random_state.randn(num_interactions)
        ranks = affinity.argsort().argsort() / max(num_interactions - 1, 1)
        ratings = np.floor(ranks * 5).clip(0, 4).astype(np.float32) + 1.0
    else:
        ratings = np.ones(num_interactions, dtype=np.float32)

    return Interactions(user_ids,
                        item_ids,
                        ratings=ratings,
                        timestamps=timestamps,
                        num_users=num_users,
                        num_items=num_items)

"""Memoized synthetic datasets shared across test modules.

The Markov-chain generator is a host-side Python loop; caching each
configuration once per test session keeps the suite fast."""

import functools

import numpy as np

from spotlight_tpu.data.synthetic import (generate_factorization,
                                          generate_sequential)


@functools.lru_cache(maxsize=None)
def sequential_dataset(num_users=100, num_items=1000, num_interactions=10000,
                       concentration_parameter=0.0001, order=3, seed=42):
    return generate_sequential(
        num_users=num_users,
        num_items=num_items,
        num_interactions=num_interactions,
        concentration_parameter=concentration_parameter,
        order=order,
        random_state=np.random.RandomState(seed))


@functools.lru_cache(maxsize=None)
def factorization_dataset(num_users=1000, num_items=1000,
                          num_interactions=30000, rank=8, noise=0.1,
                          explicit=False, seed=42):
    return generate_factorization(
        num_users=num_users,
        num_items=num_items,
        num_interactions=num_interactions,
        rank=rank,
        noise=noise,
        explicit=explicit,
        random_state=np.random.RandomState(seed))

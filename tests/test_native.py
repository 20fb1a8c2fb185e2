"""Native C++ components: build, bit-parity with Python fallbacks, and
graceful degradation."""

import numpy as np

from spotlight_tpu import native
from spotlight_tpu.data import synthetic


def test_markov_walk_bit_identical_to_python(random_state):
    lib = native.load()
    if lib is None:
        import pytest
        pytest.skip('native toolchain unavailable')

    transition = synthetic._build_transition_matrix(
        200, 0.05, random_state)
    cumulative = np.cumsum(transition, axis=1)
    rvs = np.random.RandomState(1).rand(5000)
    state0 = np.random.RandomState(2).randint(200, size=3).astype(np.int64)

    native_out = native.markov_walk(cumulative, rvs, state0.copy())

    state = state0.copy()
    python_out = np.empty(len(rvs), dtype=np.int32)
    for i, rv in enumerate(rvs):
        row = cumulative[state].mean(axis=0)
        new_state = min(199, int(np.searchsorted(row, rv)))
        state[:-1] = state[1:]
        state[-1] = new_state
        python_out[i] = new_state

    np.testing.assert_array_equal(native_out, python_out)


def test_generator_uses_same_rng_stream_either_way(random_state):
    """generate_sequential output is identical whether or not the native
    path is active (same RandomState consumption order)."""
    a = synthetic.generate_sequential(
        num_users=20, num_items=50, num_interactions=500,
        random_state=np.random.RandomState(5))

    # Force the Python fallback.
    original = native.markov_walk
    try:
        native.markov_walk = lambda *args, **kwargs: None
        b = synthetic.generate_sequential(
            num_users=20, num_items=50, num_interactions=500,
            random_state=np.random.RandomState(5))
    finally:
        native.markov_walk = original

    np.testing.assert_array_equal(a.item_ids, b.item_ids)
    np.testing.assert_array_equal(a.user_ids, b.user_ids)

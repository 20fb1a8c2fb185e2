"""Distributed top-k / rank-count evaluation must match the unsharded
computation exactly (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spotlight_tpu.parallel import make_mesh
from spotlight_tpu.parallel.evaluation import (sharded_rank_counts,
                                               sharded_topk)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices')


@pytest.fixture
def problem(random_state):
    B, D, N = 16, 32, 512  # N divisible by the 4-shard model axis
    users = jnp.asarray(random_state.randn(B, D), dtype=jnp.float32)
    items = jnp.asarray(random_state.randn(N, D), dtype=jnp.float32)
    bias = jnp.asarray(random_state.randn(N), dtype=jnp.float32)
    return users, items, bias


def test_sharded_topk_matches_dense(problem):
    users, items, bias = problem
    mesh = make_mesh(data=2, model=4)

    scores = users @ items.T + bias[None, :]
    ref_scores, ref_idx = jax.lax.top_k(scores, 10)

    got_scores, got_idx = sharded_topk(mesh, users, items, bias, k=10)
    np.testing.assert_allclose(np.asarray(got_scores),
                               np.asarray(ref_scores), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))


def test_sharded_topk_tie_order():
    mesh = make_mesh(data=2, model=4)
    users = jnp.ones((2, 4), dtype=jnp.float32)
    items = jnp.zeros((512, 4), dtype=jnp.float32)  # all scores tie
    bias = jnp.zeros((512,), dtype=jnp.float32)

    _, idx = sharded_topk(mesh, users, items, bias, k=5)
    # Ties break by ascending item id, like lax.top_k on the dense matrix.
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.tile(np.arange(5), (2, 1)))


def test_sharded_rank_counts_match_dense(problem, random_state):
    users, items, bias = problem
    mesh = make_mesh(data=2, model=4)

    T = 4
    tids = jnp.asarray(
        random_state.randint(0, items.shape[0], (users.shape[0], T)),
        dtype=jnp.int32)
    scores = users @ items.T + bias[None, :]
    tscores = jnp.take_along_axis(scores, tids, axis=1)

    greater, equal = sharded_rank_counts(mesh, users, items, bias,
                                         tscores, tids)
    ref_greater = (scores[:, None, :] > tscores[:, :, None]).sum(-1)
    # Kernel excludes the target itself from the equal count.
    ref_equal = (scores[:, None, :] == tscores[:, :, None]).sum(-1) - 1

    np.testing.assert_array_equal(np.asarray(greater),
                                  np.asarray(ref_greater))
    np.testing.assert_array_equal(np.asarray(equal), np.asarray(ref_equal))

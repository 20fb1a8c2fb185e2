"""Deterministic oracles for the sequence representations.

SURVEY.md flags the causal left-pad-then-drop-last alignment
(`/root/reference/spotlight/sequence/representations.py:100-114`) as the
subtlest parity hazard: every representation must agree that step t's
representation sees only items *before* t.  These tests check that property
exactly, plus a hand-computed PoolNet example.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spotlight_tpu.sequence import (CNNNet, LSTMNet, MixtureLSTMNet, PoolNet)

REPRESENTATIONS = [
    PoolNet(num_items=20, embedding_dim=8),
    LSTMNet(num_items=20, embedding_dim=8),
    CNNNet(num_items=20, embedding_dim=8, kernel_width=3, num_layers=1),
    CNNNet(num_items=20, embedding_dim=8, kernel_width=3,
           dilation=(1, 2), num_layers=2),
    CNNNet(num_items=20, embedding_dim=8, kernel_width=3, num_layers=2,
           residual_connections=False, nonlinearity='relu'),
    MixtureLSTMNet(num_items=20, embedding_dim=8, num_mixtures=2),
]


@pytest.mark.parametrize('net', REPRESENTATIONS,
                         ids=lambda n: type(n).__name__ + str(
                             getattr(n, 'num_layers', '')))
def test_causality(net):
    """per_step[:, t] must not depend on sequence items at positions >= t."""
    params = net.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    seq = jnp.asarray(rs.randint(1, 20, (3, 6)), dtype=jnp.int32)

    per_step, _ = net.user_representation(params, seq)

    for t in range(6):
        perturbed = seq.at[:, t].set((seq[:, t] % 19) + 1)
        per_step_p, _ = net.user_representation(params, perturbed)
        # Representations up to and including step t unchanged.
        np.testing.assert_allclose(
            np.asarray(per_step[:, :t + 1]),
            np.asarray(per_step_p[:, :t + 1]),
            rtol=1e-5, atol=1e-6,
            err_msg='step {} leaked future information'.format(t))
        # Later representations must actually change (model is not
        # degenerate).
        assert not np.allclose(np.asarray(per_step[:, t + 1:]),
                               np.asarray(per_step_p[:, t + 1:])) or t == 5


@pytest.mark.parametrize('net', REPRESENTATIONS,
                         ids=lambda n: type(n).__name__ + str(
                             getattr(n, 'num_layers', '')))
def test_final_state_alignment(net):
    """final == the per-step representation one step past the end."""
    params = net.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    seq = jnp.asarray(rs.randint(1, 20, (2, 5)), dtype=jnp.int32)

    _, final = net.user_representation(params, seq)
    # Extend with an arbitrary item: the extended per-step repr at the new
    # position sees exactly the original full sequence.
    extended = jnp.concatenate(
        [seq, jnp.full((2, 1), 7, dtype=jnp.int32)], axis=1)
    per_step_ext, _ = net.user_representation(params, extended)
    np.testing.assert_allclose(np.asarray(final),
                               np.asarray(per_step_ext[:, 5]),
                               rtol=1e-5, atol=1e-6)


def test_poolnet_hand_computed():
    """PoolNet against the hand-computed 1x2 example: running sums divided
    by (running nonzero count + 1), shifted causally."""
    net = PoolNet(num_items=5, embedding_dim=4)
    params = net.init(jax.random.PRNGKey(0))
    weight = np.asarray(params['item_embeddings']['weight'])

    seq = jnp.asarray([[2, 3]], dtype=jnp.int32)
    per_step, final = net.user_representation(params, seq)

    e2, e3 = weight[2], weight[3]
    np.testing.assert_allclose(np.asarray(per_step[0, 0]),
                               np.zeros(4), atol=1e-7)
    np.testing.assert_allclose(np.asarray(per_step[0, 1]), e2 / 2,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(final).ravel(), (e2 + e3) / 3,
                               rtol=1e-5)


def test_padding_sensitivity_matches_reference():
    """Left-padding semantics per representation, as in the reference:
    PoolNet is padding-neutral (zero embeddings add nothing to the running
    mean), while the LSTM *is* padding-sensitive — its biased gates run
    over the zero-embedded pad steps, exactly like torch's ``nn.LSTM`` in
    the reference (verified: reference drift ~0.02 on the same shapes)."""
    short = jnp.asarray([[3, 4, 5]], dtype=jnp.int32)
    padded = jnp.asarray([[0, 0, 3, 4, 5]], dtype=jnp.int32)

    pool = PoolNet(num_items=20, embedding_dim=8)
    params = pool.init(jax.random.PRNGKey(0))
    _, final_short = pool.user_representation(params, short)
    _, final_padded = pool.user_representation(params, padded)
    np.testing.assert_allclose(np.asarray(final_short),
                               np.asarray(final_padded),
                               rtol=1e-5, atol=1e-6)

    lstm = LSTMNet(num_items=20, embedding_dim=8)
    params = lstm.init(jax.random.PRNGKey(0))
    _, final_short = lstm.user_representation(params, short)
    _, final_padded = lstm.user_representation(params, padded)
    drift = np.abs(np.asarray(final_short) -
                   np.asarray(final_padded)).max()
    assert 0 < drift < 0.2  # sensitive, but bounded (like the reference)


def test_score_matches_catalog_column():
    """score() on targets must equal the matching score_catalog column."""
    for net in REPRESENTATIONS:
        params = net.init(jax.random.PRNGKey(3))
        seq = jnp.asarray([[1, 2, 3, 4]], dtype=jnp.int32)
        per_step, final = net.user_representation(params, seq)
        catalog = net.score_catalog(
            params, final if final.ndim > 1 else final[None])

        # Score item 7 using the final representation via score():
        # use the last per-step of the extended sequence trick.
        extended = jnp.asarray([[1, 2, 3, 4, 7]], dtype=jnp.int32)
        per_step_ext, _ = net.user_representation(params, extended)
        pointwise = net.score(params, per_step_ext,
                              jnp.asarray([[0, 0, 0, 0, 7]],
                                          dtype=jnp.int32))
        np.testing.assert_allclose(float(pointwise[0, -1]),
                                   float(catalog[0, 7]),
                                   rtol=1e-5, atol=1e-5)

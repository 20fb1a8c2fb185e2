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
    # Fused layout: columns [:D] are the factors, column D the bias.
    weight = np.asarray(params['item_embeddings']['weight'])[:, :4]

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


@pytest.mark.parametrize('net', REPRESENTATIONS,
                         ids=lambda n: type(n).__name__ + str(
                             getattr(n, 'num_layers', '')))
def test_fused_layout_matches_classic(net):
    """The fused factor+bias table layout (TPU row-touch optimization) is
    numerically equivalent to the reference-style separate-table layout:
    same factor initialization (shared key), same forward scores, same
    catalog matrix, and the same gradients reach the factor/bias entries."""
    import dataclasses

    fused_net = dataclasses.replace(net, fused=True)
    classic_net = dataclasses.replace(net, fused=False)

    key = jax.random.PRNGKey(3)
    fused_params = fused_net.init(key)
    classic_params = classic_net.init(key)

    dim = net.embedding_dim
    fused_w = np.asarray(fused_params['item_embeddings']['weight'])
    np.testing.assert_array_equal(
        fused_w[:, :dim],
        np.asarray(classic_params['item_embeddings']['weight']))
    np.testing.assert_array_equal(
        fused_w[:, dim:],
        np.asarray(classic_params['item_biases']['weight']))

    rs = np.random.RandomState(7)
    seq = jnp.asarray(rs.randint(1, 20, (4, 6)), dtype=jnp.int32)
    targets = jnp.asarray(rs.randint(1, 20, (4, 6)), dtype=jnp.int32)

    # Give the bias column nonzero values so it participates in scores.
    bias = rs.randn(20).astype(np.float32)
    bias[0] = 0.0
    fused_params['item_embeddings']['weight'] = (
        fused_params['item_embeddings']['weight'].at[:, dim].set(bias))
    classic_params['item_biases']['weight'] = jnp.asarray(bias[:, None])

    def fused_scores(params):
        reprs, final = fused_net.user_representation(params, seq)
        return (fused_net.score(params, reprs, targets),
                fused_net.score_catalog(params, final))

    def classic_scores(params):
        reprs, final = classic_net.user_representation(params, seq)
        return (classic_net.score(params, reprs, targets),
                classic_net.score_catalog(params, final))

    f_step, f_cat = fused_scores(fused_params)
    c_step, c_cat = classic_scores(classic_params)
    np.testing.assert_allclose(np.asarray(f_step), np.asarray(c_step),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_cat), np.asarray(c_cat),
                               rtol=1e-6, atol=1e-6)

    # Gradient equivalence on the item table entries.
    f_grads = jax.grad(lambda p: fused_scores(p)[0].sum())(fused_params)
    c_grads = jax.grad(lambda p: classic_scores(p)[0].sum())(classic_params)
    f_gw = np.asarray(f_grads['item_embeddings']['weight'])
    np.testing.assert_allclose(
        f_gw[:, :dim],
        np.asarray(c_grads['item_embeddings']['weight']),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        f_gw[:, dim],
        np.asarray(c_grads['item_biases']['weight'])[:, 0],
        rtol=1e-6, atol=1e-6)

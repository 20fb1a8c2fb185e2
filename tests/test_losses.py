"""Loss-function semantics tests, including exact parity with the reference's
torch implementations (torch-cpu is available in the test environment, so we
check numerics directly against `/root/reference/spotlight/losses.py`)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from spotlight_tpu.ops import (adaptive_hinge_loss, bpr_loss, hinge_loss,
                               logistic_loss, pointwise_loss, poisson_loss,
                               regression_loss)


def _torch_losses():
    import torch.nn.functional as F

    def t_pointwise(pos, neg, mask=None):
        loss = (1.0 - torch.sigmoid(pos)) + torch.sigmoid(neg)
        if mask is not None:
            mask = mask.float()
            return (loss * mask).sum() / mask.sum()
        return loss.mean()

    def t_bpr(pos, neg, mask=None):
        loss = 1.0 - torch.sigmoid(pos - neg)
        if mask is not None:
            mask = mask.float()
            return (loss * mask).sum() / mask.sum()
        return loss.mean()

    def t_hinge(pos, neg, mask=None):
        loss = torch.clamp(neg - pos + 1.0, 0.0)
        if mask is not None:
            mask = mask.float()
            return (loss * mask).sum() / mask.sum()
        return loss.mean()

    def t_adaptive(pos, negs, mask=None):
        highest, _ = torch.max(negs, 0)
        return t_hinge(pos, highest, mask=mask)

    def t_regression(obs, pred):
        return ((obs - pred) ** 2).mean()

    def t_poisson(obs, pred):
        return (pred - obs * torch.log(pred)).mean()

    def t_logistic(obs, pred):
        return F.binary_cross_entropy_with_logits(
            pred, torch.clamp(obs, 0, 1))

    return (t_pointwise, t_bpr, t_hinge, t_adaptive,
            t_regression, t_poisson, t_logistic)


@pytest.mark.parametrize('use_mask', [False, True])
def test_implicit_losses_match_torch(random_state, use_mask):
    (t_pointwise, t_bpr, t_hinge, t_adaptive, *_rest) = _torch_losses()

    pos = random_state.randn(64, 10).astype(np.float32)
    neg = random_state.randn(64, 10).astype(np.float32)
    negs = random_state.randn(5, 64, 10).astype(np.float32)
    mask = (random_state.rand(64, 10) > 0.3) if use_mask else None

    pairs = [
        (pointwise_loss, t_pointwise, (pos, neg)),
        (bpr_loss, t_bpr, (pos, neg)),
        (hinge_loss, t_hinge, (pos, neg)),
        (adaptive_hinge_loss, t_adaptive, (pos, negs)),
    ]
    for ours_fn, torch_fn, args in pairs:
        ours = float(ours_fn(*[jnp.asarray(a) for a in args],
                             mask=None if mask is None else jnp.asarray(mask)))
        theirs = float(torch_fn(
            *[torch.from_numpy(a) for a in args],
            mask=None if mask is None else torch.from_numpy(
                mask.astype(np.float32))))
        assert abs(ours - theirs) < 1e-5, ours_fn.__name__


def test_explicit_losses_match_torch(random_state):
    (*_implicit, t_regression, t_poisson, t_logistic) = _torch_losses()

    obs = random_state.randn(256).astype(np.float32)
    pred = random_state.randn(256).astype(np.float32)
    pos_pred = np.abs(pred) + 0.1
    counts = random_state.poisson(3.0, 256).astype(np.float32)
    signs = np.sign(random_state.randn(256)).astype(np.float32)

    assert abs(float(regression_loss(jnp.asarray(obs), jnp.asarray(pred))) -
               float(t_regression(torch.from_numpy(obs),
                                  torch.from_numpy(pred)))) < 1e-5
    assert abs(float(poisson_loss(jnp.asarray(counts),
                                  jnp.asarray(pos_pred))) -
               float(t_poisson(torch.from_numpy(counts),
                               torch.from_numpy(pos_pred)))) < 1e-5
    assert abs(float(logistic_loss(jnp.asarray(signs), jnp.asarray(pred))) -
               float(t_logistic(torch.from_numpy(signs),
                                torch.from_numpy(pred)))) < 1e-5


def test_adaptive_hinge_selects_hardest_negative():
    pos = jnp.zeros((4,))
    negs = jnp.stack([jnp.full((4,), -10.0),
                      jnp.array([5.0, -10.0, 0.0, -10.0])])
    # hardest negatives: [5, -10, 0, -10] -> hinge: [6, 0, 1, 0] -> mean 1.75
    assert abs(float(adaptive_hinge_loss(pos, negs)) - 1.75) < 1e-6

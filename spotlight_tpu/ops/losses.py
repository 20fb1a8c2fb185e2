"""Loss functions for recommender models.

TPU-native equivalents of `/root/reference/spotlight/losses.py:18,53,93,127,
169,193,217`, with identical semantics:

- implicit (negative-sampling) losses: ``pointwise``, ``bpr``, ``hinge``,
  ``adaptive_hinge``; each takes positive and negative prediction tensors and
  an optional binary ``mask``, returning ``sum(loss * mask) / sum(mask)`` when
  masked and the plain mean otherwise.
- explicit losses: ``regression`` (MSE), ``poisson``, ``logistic`` (BCE with
  logits on +-1 targets).

All are pure jnp functions — elementwise ops that XLA fuses into the
surrounding training step.  ``adaptive_hinge_loss`` takes a
``(num_negatives, ...)``-shaped stack of negative predictions and reduces with
a max over the leading axis, approximating WARP sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(loss, mask, reduce=True):
    """Reference mask semantics: ``sum(loss * mask) / sum(mask)``.

    With ``reduce=False`` the raw elementwise loss is returned (mask is
    ignored); the distributed training engine reduces it itself so the mean's
    denominator can be summed across data shards with a ``psum``.
    """
    if not reduce:
        return loss
    if mask is not None:
        mask = mask.astype(loss.dtype)
        return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(loss)


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def pointwise_loss(positive_predictions, negative_predictions, mask=None,
                   reduce=True):
    """Logistic pointwise loss.

    ``(1 - sigmoid(pos)) + sigmoid(neg)``, averaged (mask-aware).
    """
    positives_loss = 1.0 - _sigmoid(positive_predictions)
    negatives_loss = _sigmoid(negative_predictions)
    return _masked_mean(positives_loss + negatives_loss, mask, reduce)


def bpr_loss(positive_predictions, negative_predictions, mask=None,
             reduce=True):
    """Bayesian Personalised Ranking pairwise loss (Rendle et al., 2009).

    ``1 - sigmoid(pos - neg)``, averaged (mask-aware).
    """
    loss = 1.0 - _sigmoid(positive_predictions - negative_predictions)
    return _masked_mean(loss, mask, reduce)


def hinge_loss(positive_predictions, negative_predictions, mask=None,
               reduce=True):
    """Hinge pairwise loss: ``max(neg - pos + 1, 0)``, averaged (mask-aware)."""
    loss = jnp.clip(negative_predictions - positive_predictions + 1.0,
                    min=0.0)
    return _masked_mean(loss, mask, reduce)


def adaptive_hinge_loss(positive_predictions, negative_predictions,
                        mask=None, reduce=True):
    """Adaptive hinge loss (WARP approximation, Weston et al., 2011).

    ``negative_predictions`` has shape ``(num_negatives,) + pos.shape``; the
    hardest (highest-scoring) negative per entry is selected before applying
    the hinge loss.
    """
    highest_negative_predictions = jnp.max(negative_predictions, axis=0)
    return hinge_loss(positive_predictions, highest_negative_predictions,
                      mask=mask, reduce=reduce)


def regression_loss(observed_ratings, predicted_ratings, mask=None,
                    reduce=True):
    """Mean squared error regression loss.

    ``mask`` is an extension over the reference signature, used internally to
    exclude batch-padding entries; omitted, semantics match the reference.
    """
    return _masked_mean((observed_ratings - predicted_ratings) ** 2, mask,
                        reduce)


def poisson_loss(observed_ratings, predicted_ratings, mask=None,
                 reduce=True):
    """Poisson loss: ``mean(pred - observed * log(pred))``.

    ``predicted_ratings`` must already be positive (the estimators apply
    ``exp`` to raw scores before calling this, matching the reference's
    `explicit.py:225-226`).
    """
    return _masked_mean(predicted_ratings -
                        observed_ratings * jnp.log(predicted_ratings), mask,
                        reduce)


def logistic_loss(observed_ratings, predicted_ratings, mask=None,
                  reduce=True):
    """Binary cross-entropy with logits on (-1, 1) targets.

    Targets are clamped from (-1, 1) to (0, 1) as in the reference
    (`losses.py:239-244`).  Uses the numerically stable log-sum-exp form.
    """
    targets = jnp.clip(observed_ratings, 0.0, 1.0)
    x = predicted_ratings
    # max(x, 0) - x * t + log(1 + exp(-|x|))
    loss = (jnp.clip(x, min=0.0) - x * targets +
            jnp.log1p(jnp.exp(-jnp.abs(x))))
    return _masked_mean(loss, mask, reduce)

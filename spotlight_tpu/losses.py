"""Alias module mirroring the reference's ``spotlight.losses`` import path."""

from spotlight_tpu.ops.losses import (  # noqa: F401
    adaptive_hinge_loss,
    bpr_loss,
    hinge_loss,
    logistic_loss,
    pointwise_loss,
    poisson_loss,
    regression_loss,
)

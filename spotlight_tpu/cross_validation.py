"""Alias module mirroring the reference's ``spotlight.cross_validation``."""

from spotlight_tpu.data.cross_validation import (  # noqa: F401
    random_train_test_split,
    shuffle_interactions,
    user_based_train_test_split,
)

"""Data containers, dataset fetchers, splits, and synthetic generators."""

from spotlight_tpu.data.interactions import (  # noqa: F401
    Interactions,
    SequenceInteractions,
    PADDING_IDX,
)
from spotlight_tpu.data.cross_validation import (  # noqa: F401
    random_train_test_split,
    shuffle_interactions,
    user_based_train_test_split,
)

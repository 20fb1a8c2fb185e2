"""Sequence models (implicit feedback over item sequences)."""

from spotlight_tpu.sequence.implicit import ImplicitSequenceModel  # noqa: F401
from spotlight_tpu.sequence.representations import (  # noqa: F401
    PADDING_IDX,
    CNNNet,
    LSTMNet,
    MixtureLSTMNet,
    PoolNet,
)

"""Alias module mirroring the reference's ``spotlight.interactions`` path."""

from spotlight_tpu.data.interactions import (  # noqa: F401
    Interactions,
    PADDING_IDX,
    SequenceInteractions,
)

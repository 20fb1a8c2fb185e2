"""Alias module mirroring the reference's ``spotlight.layers`` import path."""

from spotlight_tpu.ops.embeddings import (  # noqa: F401
    BloomEmbedding,
    PADDING_IDX,
    ScaledEmbedding,
    ScaledEmbeddingBag,
    ZeroEmbedding,
)
from spotlight_tpu.ops.hashing import SEEDS  # noqa: F401
